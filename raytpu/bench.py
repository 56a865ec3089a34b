"""Benchmark harness: Mrays/s per chip + FPS (the BASELINE headline metric).

The reference's only benchmark is an FPS print with vsync off
(``src/main.cpp:65-81,1214-1218``); BASELINE.json sets the north star at
≥500 Mrays/s per chip and ≥30 FPS @1080p on the armadillo-class scene with
3-bounce Whitted. Ray counting is exact: an instrumented render variant
accumulates the number of *active* closest-hit lanes per bounce plus shadow
rays — the same definition a GPU ray counter would report (each
``traceRayEXT`` invocation counts once, ``src/shader.rgen:86,111``).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from raytpu.config import RAY_TMAX, RAY_TMIN
from raytpu.device_scene import DeviceScene, SceneStatic
from raytpu.integrator import RenderStatic, primary_rays, render_frame
from raytpu.presets import load_preset_scene
from raytpu.render import Renderer
from raytpu.utils import measure_frame


def count_rays_frame(
    scene: DeviceScene, static: SceneStatic, rs: RenderStatic, camera
) -> int:
    """Exact traced-ray count for one frame (closest-hit + shadow rays),
    replaying the integrator's packet control flow with counters instead of
    shading. Small (runs once per benchmark config, off the hot path)."""
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops import shade
    from raytpu.ops import vec3 as v3
    from raytpu.ops.trace import closest_hit_wave

    (px, py), flat_idx, real_lane = _tiled_pixels(rs)
    camera = jnp.asarray(camera)

    @jax.jit
    def count(scene, camera):
        total = jnp.zeros((), jnp.int32)

        def sample_body(i, total):
            o, d = primary_rays_soa((px, py), camera, i, rs.samples_per_pixel,
                                    rs.width, rs.height)
            active = real_lane

            def cond(state):
                j, _, _, _, active = state
                return (j <= rs.max_bounce_count) & jnp.any(active)

            def body(state):
                j, o, d, total, active = state
                total = total + jnp.sum(active, dtype=jnp.int32)  # closest traces
                lane_tmax = jnp.where(active, jnp.float32(RAY_TMAX), 0.0)
                hit = closest_hit_wave(scene, static, o, d, RAY_TMIN, lane_tmax)
                hit_mask = active & hit.is_hit
                n = hit.n
                mat = hit.mat
                is_diffuse = hit_mask & (mat == 0)
                front = v3.dot(d, n) < 0.0
                total = total + jnp.sum(is_diffuse & front, dtype=jnp.int32)  # shadow
                pos = v3.add(o, v3.scale(hit.t, d))

                o_m, d_m = shade.mirror_bounce_soa(d, n, pos)
                o_r, d_r = shade.refract_bounce_soa(d, n, pos)
                cont = hit_mask & ((mat == 1) | (mat == 2))
                is_mirror = hit_mask & (mat == 1)
                o = v3.where(cont, v3.where(is_mirror, o_m, o_r), o)
                d = v3.where(cont, v3.where(is_mirror, d_m, d_r), d)
                return j + 1, o, d, total, cont

            _, _, _, total, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), o, d, total, active)
            )
            return total

        return jax.lax.fori_loop(0, rs.samples_per_pixel, sample_body, total)

    return int(count(scene, camera))


def run_benchmark(
    preset="config4",
    frames: int = 8,
    highpoly_depth: int = 7,
    spp: Optional[int] = None,
) -> Dict:
    """Benchmark a preset name or a fully-specified RenderConfig: honest
    steady-state frame time (compile excluded, device-blocked), exact
    Mrays/s, FPS."""
    scene = load_preset_scene(preset, highpoly_depth=highpoly_depth)
    if spp is not None:
        scene.config = scene.config.replace(samples_per_pixel=spp)
    renderer = Renderer(scene)
    renderer.set_transforms(0.0)
    rs = renderer.render_static
    cam = renderer.camera.basis()

    backend = jax.devices()[0].platform

    t0 = time.perf_counter()
    rays = count_rays_frame(renderer.device_scene, renderer.static, rs, cam)
    count_s = time.perf_counter() - t0

    def frame():
        return render_frame(renderer.device_scene, renderer.static, rs,
                            jnp.asarray(cam))

    mean_s, times = measure_frame(frame, warmup=1, iters=frames)

    mrays = rays / mean_s / 1e6
    return {
        "preset": preset if isinstance(preset, str) else "custom",
        "backend": backend,
        "width": rs.width,
        "height": rs.height,
        "spp": rs.samples_per_pixel,
        "max_bounces": rs.max_bounce_count,
        "rays_per_frame": rays,
        "frame_ms": mean_s * 1e3,
        "fps": 1.0 / mean_s,
        "mrays_per_s": mrays,
        "count_overhead_s": count_s,
        "frame_times_ms": [t * 1e3 for t in times],
    }
