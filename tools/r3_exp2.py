#!/usr/bin/env python
"""Round-3 TPU experiment batch 2.

A. Granular prepass breakdown: _block_stats alone vs full chunk_block_hits
   vs an XLA-pure stats variant (where do config4's ~5.7 ms go?).
B. Careful segment-sort re-measurement (iters=100, scalar-consuming).
C. Sky stage with the lane-major kernel; shadow stage with the
   anyhit-specialized chunk set; config4 frame.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.bench import profile_stages
    from raytpu.config import RAY_TMAX, RAY_TMIN
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops.mega import _block_stats, chunk_block_hits
    from raytpu.ops.traverse_pallas import pack_rays
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    sc = load_preset_scene("config4")
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    rs = rr.render_static
    scene, static = rr.device_scene, rr.static
    cam = jnp.asarray(rr.camera.basis())
    (px, py), _, in_frame = _tiled_pixels(rs)
    spp = rs.samples_per_pixel
    px = jnp.repeat(px, spp, axis=0)
    py = jnp.repeat(py, spp, axis=0)
    in_frame = jnp.repeat(in_frame, spp, axis=0)
    s_idx = jnp.tile(jnp.arange(spp, dtype=jnp.float32),
                     (px.shape[0] // spp,))[:, None] * jnp.ones(
        (1, 1024), jnp.float32)
    o, d = primary_rays_soa((px, py), cam, s_idx, spp, rs.width, rs.height)
    p = o[0].shape[0]
    rays = pack_rays(o, d)
    win = jnp.where(in_frame, jnp.float32(RAY_TMAX), 0.0).reshape(p, 8, 128)

    # --- A: prepass breakdown ---
    stats_fn = jax.jit(lambda r, w: _block_stats(r, w, RAY_TMIN))
    full_fn = jax.jit(
        lambda r, w: chunk_block_hits(scene, static, r, w, RAY_TMIN)
    )

    def xla_stats(r, w):
        pb = p // 8
        rr_ = r.reshape(6, pb, -1)
        ww = w.reshape(pb, -1)
        live = ww > RAY_TMIN
        big = jnp.float32(3e38)
        outs = []
        for c in range(6):
            outs.append(jnp.min(jnp.where(live, rr_[c], big), axis=1))
            outs.append(jnp.max(jnp.where(live, rr_[c], -big), axis=1))
        outs.append(jnp.max(jnp.where(live, ww, 0.0), axis=1))
        for c in range(3):
            outs.append(jnp.sum(
                jnp.where(live & (rr_[3 + c] < 0), 1.0, 0.0), axis=1))
        outs.append(jnp.sum(jnp.where(live, 1.0, 0.0), axis=1))
        return jnp.stack(outs, axis=1)

    xla_fn = jax.jit(xla_stats)
    res = {
        "stats_pallas_ms": timeit(stats_fn, rays, win),
        "stats_xla_ms": timeit(xla_fn, rays, win),
        "chunk_block_hits_ms": timeit(full_fn, rays, win),
    }
    print(json.dumps({"prepass": {k: round(v, 3) for k, v in res.items()}}),
          flush=True)

    # --- B: sort re-measurement, scalar-consuming ---
    rng = np.random.RandomState(0)
    keys = jnp.asarray(
        rng.randint(0, 9, size=(1056, 8192)).astype(np.int32))
    iota = jnp.broadcast_to(
        jnp.arange(8192, dtype=jnp.int32)[None, :], (1056, 8192))

    sortsum = jax.jit(lambda k: jnp.sort(k, axis=1)[:, ::7].sum())
    kvsum = jax.jit(
        lambda k, v: jax.lax.sort_key_val(k, v, dimension=1)[1][:, ::7].sum()
    )
    micro = {
        "sort_sum_ms": timeit(sortsum, keys, iters=100),
        "sort_kv_sum_ms": timeit(kvsum, keys, iota, iters=100),
    }
    print(json.dumps({"micro2": {k: round(v, 3) for k, v in micro.items()}}),
          flush=True)

    # --- C: stages + frame after sky v3 + shadow chunk set ---
    st = profile_stages(rr, rs)
    print(json.dumps(
        {"stage_ms_config4": {k: round(v, 2) for k, v in st.items()}}),
        flush=True)

    from raytpu.integrator import render_frame

    def frame():
        return render_frame(scene, static, rs, cam)

    mean_s, _ = measure_frame(frame, warmup=1, iters=6)
    print(json.dumps({"config4_frame_ms": round(mean_s * 1e3, 2)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
