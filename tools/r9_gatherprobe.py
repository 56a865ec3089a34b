#!/usr/bin/env python
"""Probe: is the sky-fallback quad gather charged per INDEX or per WORD?

The config4/config5 op traces (r9) show the tiered fallback's three
per-channel quad gathers cost a uniform ~12.5 ns per gathered u32 per
lane (18.8 ms at the 512-packet tier, 5.0 ms at 128) — issue-rate bound,
not bandwidth bound. If XLA's gather charges per index row, interleaving
the three channels' quad words into one (N, 3) table row should cut the
fallback ~3x: ONE gather with a contiguous (1, 3) slice per lane.

Layouts probed at the real shapes ((512, 1024) and (128, 1024) index
waves into a 25.2M-row table):
  planar   — three (N,) gathers (the shipped quad layout)
  int3     — one (N, 3) row gather
  int4     — one (N, 4) row gather (16-byte aligned rows)
Each consumed to a scalar; pipelined timing (enqueue ITERS, block once),
operands passed as jit arguments (CLAUDE.md timing rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = 6 * 2048 * 2048          # rows in the real quad table
ITERS = 30


def decode_sum(words3):
    # the real decode's shape: unpack 4 bytes per word, weighted sum
    inv = jnp.float32(1.0 / 255.0)
    tot = 0.0
    for word in words3:
        for sh in (0, 8, 16, 24):
            tot = tot + jnp.sum(((word >> sh) & 0xFF).astype(jnp.float32)
                                * inv)
    return tot


@jax.jit
def g_planar(t0, t1, t2, idx):
    return decode_sum([jnp.take(t, idx, axis=0) for t in (t0, t1, t2)])


@jax.jit
def g_int3(tab, idx):
    rows = jnp.take(tab, idx, axis=0)          # (..., 3)
    return decode_sum([rows[..., c] for c in range(3)])


@jax.jit
def g_int4(tab, idx):
    rows = jnp.take(tab, idx, axis=0)          # (..., 4)
    return decode_sum([rows[..., c] for c in range(3)])


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    t0 = base
    t1 = base ^ jnp.uint32(0x5A5A5A5A)
    t2 = base ^ jnp.uint32(0xA5A5A5A5)
    int3 = jnp.stack([t0, t1, t2], axis=-1)    # (N, 3)
    int4 = jnp.concatenate([int3, int3[:, :1]], axis=-1)  # (N, 4)
    for packets in (512, 128):
        idx = jnp.asarray(
            rng.integers(0, N, size=(packets, 1024), dtype=np.int32))
        print(f"--- wave {packets}x1024 random indices ---", flush=True)
        timed("planar(3 gathers)", g_planar, t0, t1, t2, idx)
        timed("int3 (1 row gather)", g_int3, int3, idx)
        timed("int4 (1 row gather)", g_int4, int4, idx)
    return 0


if __name__ == "__main__":
    sys.exit(main())
