#!/usr/bin/env python
"""Probe 2: why do the sky-fallback quad gathers cost ~12.5 ns/word
in-frame when the same-shape standalone gather runs 40-150x faster
(r9_gatherprobe)?

Hypothesis: in-frame XLA fuses the gather into a kLoop fusion together
with its index computation / byte decode, hitting a serial per-index
path; standalone it takes the fast gather emitter. Reproduce in-frame
conditions (gather inside a fori_loop, indices computed from float
directions, full quad decode consumed) and A/B an optimization_barrier
that forces the gather to stand alone.

Timing: device-bound fori_loop of 16 repetitions inside ONE jit call,
operands as jit args, pipelined over 8 calls.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytpu.ops.sky import _bilinear_coords, face_st  # noqa: E402

H = W = 2048
N = 6 * H * W
REPS = 16
ITERS = 8


def quad_sample(tabs, dirs, barrier: bool):
    """Clone of sample_cubemap_u32_quad's gather+decode shape."""
    face, s, t = face_st(*dirs)
    x0c, x1c, y0c, y1c, wx, wy = _bilinear_coords(s, t, H, W)
    x_edge = jnp.floor(s * W - 0.5) < 0.0
    y_edge = jnp.floor(t * H - 0.5) < 0.0
    idx = face * (H * W) + y0c * W + x0c
    if barrier:
        idx = jax.lax.optimization_barrier(idx)
    inv = jnp.float32(1.0 / 255.0)
    out = []
    for c in range(3):
        word = jnp.take(tabs[c], idx, axis=0)
        if barrier:
            word = jax.lax.optimization_barrier(word)
        c00 = (word & 0xFF).astype(jnp.float32) * inv
        c01 = ((word >> 8) & 0xFF).astype(jnp.float32) * inv
        c10 = ((word >> 16) & 0xFF).astype(jnp.float32) * inv
        c11 = ((word >> 24) & 0xFF).astype(jnp.float32) * inv
        c01 = jnp.where(x_edge, c00, c01)
        c11 = jnp.where(x_edge, c10, c11)
        c10 = jnp.where(y_edge, c00, c10)
        c11 = jnp.where(y_edge, c01, c11)
        top = c00 * (1 - wx) + c01 * wx
        bot = c10 * (1 - wx) + c11 * wx
        out.append(top * (1 - wy) + bot * wy)
    return out


def make_fn(barrier: bool, p: int):
    @jax.jit
    def fn(t0, t1, t2, dx, dy, dz):
        def body(c, acc):
            # perturb directions per rep so the loop can't be hoisted
            e = 1e-6 * c.astype(jnp.float32)
            rgb = quad_sample((t0, t1, t2), (dx + e, dy, dz), barrier)
            return acc + rgb[0].sum() + rgb[1].sum() + rgb[2].sum()

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return fn


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS / REPS * 1e3
    print(f"{name}: {ms:.3f} ms per gather-triple", flush=True)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    t1 = base ^ jnp.uint32(0x5A5A5A5A)
    t2 = base ^ jnp.uint32(0xA5A5A5A5)
    for packets in (512, 128):
        v = rng.normal(size=(3, packets, 1024)).astype(np.float32)
        v /= np.linalg.norm(v, axis=0, keepdims=True)
        dx, dy, dz = (jnp.asarray(v[c]) for c in range(3))
        print(f"--- wave {packets}x1024 random directions ---", flush=True)
        timed("fused   (in-frame shape)", make_fn(False, packets),
              base, t1, t2, dx, dy, dz)
        timed("barrier (isolated gather)", make_fn(True, packets),
              base, t1, t2, dx, dy, dz)
    return 0


if __name__ == "__main__":
    sys.exit(main())
