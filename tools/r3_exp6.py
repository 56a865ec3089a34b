#!/usr/bin/env python
"""Round-3 TPU experiment batch 6.

1. Live-pair statistics from the real config4 waves: popcount of the
   prepass bitmask for the j=0 closest and j=0 shadow sweeps (how many
   (entry, block) pairs the kernels actually process), plus per-pair
   cost back-computed from the measured stage times.
2. Sky grid batching (SKY_SUPER=4) A/B via the sky stage.
3. leaf_size=2 (CHUNK_TRIS 7168) vs leaf_size=4 (9216) frame A/B.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.bench import bit_identity_check, profile_stages

    t0 = time.perf_counter()
    bi = bit_identity_check()
    print(json.dumps({"bit_identity": bi,
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)
    if not bi.get("ok", False):
        return 1
    from raytpu.config import HIT_EPSILON, RAY_TMAX, RAY_TMIN
    from raytpu.integrator import _tiled_pixels, primary_rays_soa, render_frame
    from raytpu.ops import shade
    from raytpu.ops import vec3 as v3
    from raytpu.ops.mega import chunk_block_hits
    from raytpu.ops.trace import closest_hit_wave
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
    t0_ = px.shape[0] // spp
    s_idx = jnp.tile(jnp.arange(spp, dtype=jnp.float32), (t0_,))[:, None] \
        * jnp.ones((1, 1024), jnp.float32)
    o, d = primary_rays_soa((px, py), cam, s_idx, spp, rs.width, rs.height)
    p = o[0].shape[0]
    lane_tmax = jnp.where(in_frame, jnp.float32(RAY_TMAX), 0.0)

    def popcount(bits):
        b = np.ascontiguousarray(np.asarray(bits))
        return int(np.unpackbits(b.view(np.uint8)).sum())

    # j=0 closest wave
    rays = pack_rays(o, d)
    bits, octs, depth = chunk_block_hits(
        scene, static, rays, lane_tmax.reshape(p, 8, 128), RAY_TMIN)
    stats = {"closest_j0_pairs": popcount(bits),
             "entries": int(np.asarray(bits).shape[0]),
             "blocks": p // 8}

    # j=0 shadow wave (real hit data)
    hit = closest_hit_wave(scene, static, o, d, RAY_TMIN, lane_tmax,
                           group=rs.sample_group)
    n = hit.n
    hit_mask = in_frame & hit.valid
    pos = v3.add(o, v3.scale(hit.t, d))
    lit = hit_mask & (hit.mat == 0) & (v3.dot(d, n) < 0.0)
    shadow_o = v3.add(pos, v3.scale(HIT_EPSILON, n))
    to_light = tuple(scene.light_pos[c] - pos[c] for c in range(3))
    light_dist = v3.norm(to_light)
    l = v3.scale(1.0 / jnp.maximum(light_dist, 1e-30), to_light)
    sh_win = jnp.where(lit, light_dist, 0.0)
    from raytpu.ops.mega import BLOCK_PACKETS  # noqa
    sh_roots = scene.mega_sh_root
    sh_entries = static.shadow_traversal_list
    bits_s, _, _ = chunk_block_hits(
        scene, static, pack_rays(shadow_o, l),
        sh_win.reshape(p, 8, 128), RAY_TMIN,
        roots=sh_roots, entries=sh_entries)
    stats["shadow_j0_pairs"] = popcount(bits_s)
    stats["shadow_entries"] = len(sh_entries)
    stats["shadow_rays"] = int(jnp.sum(lit))
    stats["live_shadow_blocks"] = int(
        (np.asarray(sh_win.reshape(p, -1)).max(axis=1) > 0)
        .reshape(-1, 8).any(axis=1).sum())
    print(json.dumps({"pair_stats": stats}), flush=True)

    # sky stage A/B (SKY_SUPER batching now in)
    st = profile_stages(rr, rs)
    print(json.dumps({"stage_ms_config4":
                      {k: round(v, 2) for k, v in st.items()}}), flush=True)

    # frame with current code
    def frame():
        return render_frame(scene, static, rs, cam)

    mean_s, _ = measure_frame(frame, warmup=1, iters=20)
    print(json.dumps({"config4_frame_ms": round(mean_s * 1e3, 2)}),
          flush=True)

    # config5 frame (sky batching matters most there)
    sc5 = load_preset_scene("config5")
    r5 = Renderer(sc5)
    r5.set_transforms(0.0)
    cam5 = jnp.asarray(r5.camera.basis())

    def frame5():
        return render_frame(r5.device_scene, r5.static, r5.render_static,
                            cam5)

    mean_s, _ = measure_frame(frame5, warmup=1, iters=25)
    print(json.dumps({"config5_frame_ms": round(mean_s * 1e3, 2)}),
          flush=True)

    # leaf_size=2 A/B
    import raytpu.accel.chunking as ch
    old = ch.CHUNK_TRIS
    try:
        ch.CHUNK_TRIS = 7168
        sc2 = load_preset_scene("config4")
        sc2.config = sc2.config.replace(leaf_size=2)
        t0 = time.perf_counter()
        r2 = Renderer(sc2)
        build_s = time.perf_counter() - t0
        r2.set_transforms(0.0)
        cam2 = jnp.asarray(r2.camera.basis())

        def frame2():
            return render_frame(r2.device_scene, r2.static,
                                r2.render_static, cam2)

        mean_s, _ = measure_frame(frame2, warmup=1, iters=12)
        print(json.dumps({"config4_leaf2_frame_ms": round(mean_s * 1e3, 2),
                          "leaf2_build_s": round(build_s, 1)}), flush=True)
    finally:
        ch.CHUNK_TRIS = old
    return 0


if __name__ == "__main__":
    sys.exit(main())
