#!/usr/bin/env python
"""Probe 3: device-time attribution for the quad-gather layouts.

Probes 1/2 timed via host perf_counter over the axon tunnel and produced
physically impossible numbers (50M random gathers in <0.5 ms beats HBM
bandwidth) — dispatch/RTT artifacts. This one wraps each variant in a
jax.profiler trace and reports the DEVICE op durations, the same
methodology as the frame traces being compared against.

Variants at the real fallback shapes:
  planar  — three (N,) gathers + quad decode (the shipped layout)
  barrier — same with optimization_barrier isolating the gathers
  int3    — one (N, 3) row gather + decode
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytpu.ops.sky import _bilinear_coords, face_st  # noqa: E402

H = W = 2048
N = 6 * H * W
OUT = "/tmp/jaxtrace_gp3"


def quad_decode(words, x_edge, y_edge, wx, wy):
    inv = jnp.float32(1.0 / 255.0)
    out = []
    for word in words:
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


def coords(dirs):
    face, s, t = face_st(*dirs)
    x0c, x1c, y0c, y1c, wx, wy = _bilinear_coords(s, t, H, W)
    x_edge = jnp.floor(s * W - 0.5) < 0.0
    y_edge = jnp.floor(t * H - 0.5) < 0.0
    idx = face * (H * W) + y0c * W + x0c
    return idx, x_edge, y_edge, wx, wy


@jax.jit
def v_planar(t0, t1, t2, dx, dy, dz):
    idx, xe, ye, wx, wy = coords((dx, dy, dz))
    words = [jnp.take(t, idx, axis=0) for t in (t0, t1, t2)]
    rgb = quad_decode(words, xe, ye, wx, wy)
    return rgb[0].sum() + rgb[1].sum() + rgb[2].sum()


@jax.jit
def v_barrier(t0, t1, t2, dx, dy, dz):
    idx, xe, ye, wx, wy = coords((dx, dy, dz))
    idx = jax.lax.optimization_barrier(idx)
    words = [jax.lax.optimization_barrier(jnp.take(t, idx, axis=0))
             for t in (t0, t1, t2)]
    rgb = quad_decode(words, xe, ye, wx, wy)
    return rgb[0].sum() + rgb[1].sum() + rgb[2].sum()


@jax.jit
def v_int3(tab, dx, dy, dz):
    idx, xe, ye, wx, wy = coords((dx, dy, dz))
    rows = jnp.take(tab, idx, axis=0)          # (..., 3)
    rgb = quad_decode([rows[..., c] for c in range(3)], xe, ye, wx, wy)
    return rgb[0].sum() + rgb[1].sum() + rgb[2].sum()


def device_ms(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    os.system(f"rm -rf {OUT}")
    with jax.profiler.trace(OUT):
        for _ in range(4):
            out = fn(*args)
        out.block_until_ready()
    files = glob.glob(f"{OUT}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    by = defaultdict(float)
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        if name.startswith(("$", "PjitFunction", "jit_")):
            continue
        args_ = e.get("args") or {}
        key = args_.get("long_name") or args_.get("hlo_op") or name
        by[str(key)[:90]] += e.get("dur", 0) / 1e3
    top = sorted(by.items(), key=lambda kv: -kv[1])[:6]
    total = sum(by.values()) / 4
    return total, top


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    t1 = base ^ jnp.uint32(0x5A5A5A5A)
    t2 = base ^ jnp.uint32(0xA5A5A5A5)
    int3 = jnp.stack([base, t1, t2], axis=-1)
    for packets in (512, 128):
        v = rng.normal(size=(3, packets, 1024)).astype(np.float32)
        v /= np.linalg.norm(v, axis=0, keepdims=True)
        dx, dy, dz = (jnp.asarray(v[c]) for c in range(3))
        print(f"--- wave {packets}x1024 ---", flush=True)
        for name, fn, args in (
            ("planar ", v_planar, (base, t1, t2, dx, dy, dz)),
            ("barrier", v_barrier, (base, t1, t2, dx, dy, dz)),
            ("int3   ", v_int3, (int3, dx, dy, dz)),
        ):
            total, top = device_ms(fn, *args)
            print(f"{name}: device {total:.3f} ms/call", flush=True)
            for k, ms in top:
                print(f"    {ms / 4:.3f} ms  {k}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
