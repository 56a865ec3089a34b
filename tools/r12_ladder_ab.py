#!/usr/bin/env python
"""Round-5: descending wave-budget ladder A/B (VERDICT r4 item 6).

The fused compact path's late bounce iterations run one fixed ~P/4-size
wave even when a handful of packets are live; the ladder moves
phase-wise to smaller wave sizes as the live prefix shrinks
(integrator._wave_rungs). Expected to matter most on the reference
preset's 63-bounce loop.

Legs per preset, same process (distinct jit cache keys via the
RenderStatic.ladder field):
  1. bitwise equality of one frame: ladder off vs auto (must be exact —
     waves are disjoint slices of the same sorted layout);
  2. steady-state frame time off vs auto.

Also prints a per-bounce live-packet profile for the reference preset
(diagnostic for rung thresholds).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def live_profile(rr, max_j: int):
    """Per-bounce live packet/lane counts of the folded wave (replays the
    integrator's continuation logic with counters, like
    bench.count_rays_frame)."""
    import jax
    import jax.numpy as jnp

    from raytpu.config import RAY_TMAX, RAY_TMIN
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops import shade
    from raytpu.ops import vec3 as v3
    from raytpu.ops.trace import closest_hit_wave

    rs = rr.render_static
    scene, static = rr.device_scene, rr.static
    cam = jnp.asarray(rr.camera.basis())
    (px, py), _, in_frame = _tiled_pixels(rs)
    spp = rs.samples_per_pixel
    p0 = px.shape[0]
    if rs.fold_spp and spp > 1:
        px = jnp.repeat(px, spp, axis=0)
        py = jnp.repeat(py, spp, axis=0)
        in_frame = jnp.repeat(in_frame, spp, axis=0)
        s_idx = jnp.tile(jnp.arange(spp, dtype=jnp.float32), (p0,))[
            :, None] * jnp.ones((1, px.shape[1]), jnp.float32)
    else:
        s_idx = jnp.zeros_like(px)

    @jax.jit
    def prof(scene, cam):
        o, d = primary_rays_soa((px, py), cam, s_idx, spp, rs.width,
                                rs.height)
        active = in_frame
        pk = jnp.zeros((max_j + 1,), jnp.int32)
        ln = jnp.zeros((max_j + 1,), jnp.int32)

        def body(j, c):
            o, d, active, pk, ln = c
            pk = pk.at[j].set(
                jnp.sum(jnp.any(active, axis=1), dtype=jnp.int32))
            ln = ln.at[j].set(jnp.sum(active, dtype=jnp.int32))
            lane_tmax = jnp.where(active, jnp.float32(RAY_TMAX), 0.0)
            hit = closest_hit_wave(scene, static, o, d, RAY_TMIN,
                                   lane_tmax)
            hit_mask = active & hit.is_hit
            pos = v3.add(o, v3.scale(hit.t, d))
            o_m, d_m = shade.mirror_bounce_soa(d, hit.n, pos)
            o_r, d_r = shade.refract_bounce_soa(d, hit.n, pos)
            cont = hit_mask & ((hit.mat == 1) | (hit.mat == 2))
            is_m = hit_mask & (hit.mat == 1)
            o = v3.where(cont, v3.where(is_m, o_m, o_r), o)
            d = v3.where(cont, v3.where(is_m, d_m, d_r), d)
            return o, d, cont, pk, ln

        _, _, _, pk, ln = jax.lax.fori_loop(
            0, max_j + 1, body, (o, d, active, pk, ln))
        return pk, ln

    pk, ln = prof(scene, cam)
    return [int(x) for x in pk], [int(x) for x in ln]


def main() -> int:
    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print("backend:", jax.devices()[0].platform, flush=True)
    presets = os.environ.get(
        "R12_PRESETS", "reference,config4,config5").split(",")
    frames = int(os.environ.get("R12_FRAMES", "24"))

    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        if name == "reference" and os.environ.get("R12_PROFILE", "1") != "0":
            pk, ln = live_profile(rr, rr.render_static.max_bounce_count)
            print(json.dumps({"preset": name, "live_packets_per_j": pk,
                              "live_lanes_per_j": ln}), flush=True)
        out = {"preset": name}
        imgs = {}
        for mode in ("off", "auto"):
            rs = dataclasses.replace(rr.render_static, ladder=mode)

            def frame():
                return render_frame(rr.device_scene, rr.static, rs, cam)

            imgs[mode] = np.asarray(frame())
            mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
            out[f"ladder_{mode}_ms"] = round(mean_s * 1e3, 2)
        n_diff = int((imgs["off"] != imgs["auto"]).sum())
        out["n_diff"] = n_diff
        out["speedup"] = round(
            out["ladder_off_ms"] / max(out["ladder_auto_ms"], 1e-9), 3)
        print(json.dumps(out), flush=True)
        if n_diff:
            print("LADDER BIT-IDENTITY FAIL", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
