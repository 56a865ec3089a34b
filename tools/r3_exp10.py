#!/usr/bin/env python
"""Sky `_analyze` fusion A/B (roadmap ranked item 3).

Times the pre-fusion window analysis (6 presence ``any`` + 12 separate
masked min/max reductions, inlined below as ``analyze_old``) against the
fused two-pass version now in ``raytpu.ops.sky_mxu._analyze`` (one OR
reduction + one 12-operand variadic reduce), at config4 wave scale
(p=8100 packets x 1024 lanes), and asserts the outputs are identical.

Run on an IDLE host (see tools/README.md): python tools/r3_exp10.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.ops import sky_mxu
from raytpu.ops.sky_mxu import K_SUB, K_LANE, MAX_FACES, WIN_H, WIN_W


def analyze_old(face, ylo, yhi, xlo, xhi, miss, h, w):
    """Pre-fusion implementation (verbatim semantics)."""
    p = face.shape[0]
    cnt = jnp.zeros((p,), jnp.int32)
    slot_face = [jnp.full((p,), -1, jnp.int32) for _ in range(MAX_FACES)]
    for f in range(6):
        pres = (miss & (face == f)).any(axis=1)
        for s in range(MAX_FACES):
            slot_face[s] = jnp.where(pres & (cnt == s), f, slot_face[s])
        cnt = cnt + pres.astype(jnp.int32)
    ok = cnt <= MAX_FACES

    big = jnp.int32(1 << 30)
    facew, row0d8, x0d128, y0l, rt1, ct1 = [], [], [], [], [], []
    for s in range(MAX_FACES):
        m = miss & (face == slot_face[s][:, None])
        ymin = jnp.min(jnp.where(m, ylo, big), axis=1)
        ymax = jnp.max(jnp.where(m, yhi, -1), axis=1)
        xmin = jnp.min(jnp.where(m, xlo, big), axis=1)
        xmax = jnp.max(jnp.where(m, xhi, -1), axis=1)
        y0 = jnp.clip((ymin // K_SUB) * K_SUB, 0, h - WIN_H)
        x0 = jnp.clip((xmin // K_LANE) * K_LANE, 0, w - WIN_W)
        ok = ok & (ymax - y0 < WIN_H) & (xmax - x0 < WIN_W)
        f_safe = jnp.maximum(slot_face[s], 0)
        facew.append(slot_face[s])
        row0d8.append((f_safe * h + y0) // K_SUB)
        x0d128.append(x0 // K_LANE)
        y0l.append(y0)
        rt1.append((ymax - y0 >= sky_mxu.ROW_TILE).astype(jnp.int32))
        ct1.append((xmax - x0 >= sky_mxu.COL_TILE).astype(jnp.int32))
    return (
        ok,
        jnp.minimum(cnt, MAX_FACES),
        jnp.concatenate(facew),
        jnp.concatenate(row0d8),
        jnp.concatenate(x0d128),
        jnp.concatenate(y0l),
        jnp.stack([jnp.concatenate(rt1), jnp.concatenate(ct1)]),
        slot_face[0],
        y0l[0],
        x0d128[0] * K_LANE,
    )


def main() -> int:
    print("backend:", jax.devices()[0].platform, flush=True)
    h = w = 2048
    p, k = 8100, 1024
    rng = np.random.RandomState(0)

    # realistic consensus packets: 1-2 faces each, tight windows, ~40% miss
    base_face = rng.randint(0, 6, (p, 1))
    spill = rng.rand(p, k) < 0.05           # a few lanes on a second face
    face = np.where(spill, (base_face + 1) % 6, base_face).astype(np.int32)
    y0 = rng.randint(0, h - 40, (p, 1))
    x0 = rng.randint(0, w - 40, (p, 1))
    ylo = (y0 + rng.randint(0, 32, (p, k))).astype(np.int32)
    xlo = (x0 + rng.randint(0, 32, (p, k))).astype(np.int32)
    yhi = np.minimum(ylo + 1, h - 1).astype(np.int32)
    xhi = np.minimum(xlo + 1, w - 1).astype(np.int32)
    miss = rng.rand(p, k) < 0.4

    args = tuple(jnp.asarray(a) for a in (face, ylo, yhi, xlo, xhi, miss))
    f_old = jax.jit(lambda *a: analyze_old(*a, h, w))
    f_new = jax.jit(lambda *a: sky_mxu._analyze(*a, h, w))

    r_old = jax.tree.map(np.asarray, f_old(*args))
    r_new = jax.tree.map(np.asarray, f_new(*args))
    same = all(np.array_equal(a, b) for a, b in zip(r_old, r_new))

    def timeit(f, iters=50):
        jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        out = [f(*args) for _ in range(iters)]
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    res = {
        "identical": bool(same),
        "old_ms": round(timeit(f_old), 3),
        "new_ms": round(timeit(f_new), 3),
    }
    res["speedup"] = round(res["old_ms"] / res["new_ms"], 2)
    print(json.dumps(res), flush=True)
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
