#!/usr/bin/env python
"""Round-5 diagnostic: shadow-ray occlusion fractions per preset.

Sizes the VERDICT r4 item-8 idea (spp-fold occlusion sharing): only
OCCLUDED lanes can benefit from any occluder-hint scheme — an
unoccluded lane must always prove emptiness by a full walk. Replays the
integrator's j=0 continuation logic and counts lit vs occluded shadow
rays, plus how often the spp sample copies of a pixel AGREE on
occlusion (the fold-sharing premise)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from raytpu.config import HIT_EPSILON, RAY_TMAX, RAY_TMIN
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops import vec3 as v3
    from raytpu.ops.trace import any_hit_wave, closest_hit_wave
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    print("backend:", jax.devices()[0].platform, flush=True)
    for name in os.environ.get("R15_PRESETS", "config4,reference").split(","):
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        rs = rr.render_static
        scene, static = rr.device_scene, rr.static
        cam = jnp.asarray(rr.camera.basis())
        (px, py), _, in_frame = _tiled_pixels(rs)
        spp = rs.samples_per_pixel
        p0 = px.shape[0]
        k = px.shape[1]
        pxs = jnp.repeat(px, spp, axis=0)
        pys = jnp.repeat(py, spp, axis=0)
        act = jnp.repeat(in_frame, spp, axis=0)
        s_idx = jnp.tile(jnp.arange(spp, dtype=jnp.float32), (p0,))[
            :, None] * jnp.ones((1, k), jnp.float32)

        @jax.jit
        def stats(scene, cam):
            o, d = primary_rays_soa((pxs, pys), cam, s_idx, spp, rs.width,
                                    rs.height)
            tmax = jnp.where(act, jnp.float32(RAY_TMAX), 0.0)
            hit = closest_hit_wave(scene, static, o, d, RAY_TMIN, tmax)
            hm = act & hit.is_hit
            lit = hm & (hit.mat == 0) & (v3.dot(d, hit.n) < 0.0)
            pos = v3.add(o, v3.scale(hit.t, d))
            so = v3.add(pos, v3.scale(HIT_EPSILON, hit.n))
            tol = tuple(scene.light_pos[c] - pos[c] for c in range(3))
            ld = v3.norm(tol)
            l = v3.scale(1.0 / jnp.maximum(ld, 1e-30), tol)
            win = jnp.where(lit, ld, 0.0)
            occ = any_hit_wave(scene, static, so, l, RAY_TMIN, win)
            occb = lit & occ
            # spp agreement: all samples of a (tile-lane) pixel share
            # occlusion value among the LIT samples
            occ3 = occb.reshape(p0, spp, k)
            lit3 = lit.reshape(p0, spp, k)
            n_occ_px = jnp.sum(jnp.any(occ3, axis=1))
            n_mixed = jnp.sum(
                jnp.any(occ3, axis=1) & jnp.any(lit3 & ~occ3, axis=1))
            return (jnp.sum(lit), jnp.sum(occb), n_occ_px, n_mixed)

        n_lit, n_occ, n_occ_px, n_mixed = [int(x) for x in stats(scene, cam)]
        print(json.dumps({
            "preset": name, "shadow_rays": n_lit, "occluded": n_occ,
            "occluded_frac": round(n_occ / max(n_lit, 1), 4),
            "pixels_with_occlusion": n_occ_px,
            "pixels_mixed_occlusion": n_mixed,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
