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


_REPO_ROOT = __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))
)
RAYCOUNT_SIDECAR = __import__("os").path.join(_REPO_ROOT, "raycounts.json")


def _raycount_key(preset: str, rs: RenderStatic, highpoly_depth: int,
                  backend: str) -> str:
    """Sidecar key: everything the exact per-frame ray count depends on.
    Frames are deterministic (hash RNG seeded by pixel coords + sample
    index; camera from ``set_transforms(0.0)``), so the count for a
    (preset, shapes, backend) tuple never changes between runs — the
    sidecar makes ``count_rays_frame``'s full second compile (minutes over
    the dev tunnel) a one-time cost instead of a per-driver-run cost
    (VERDICT r3 item 3). Backend is in the key because traversal uses
    strict f32 comparisons whose fusion differs across platforms."""
    return (f"{preset}:{rs.width}x{rs.height}:spp{rs.samples_per_pixel}"
            f":b{rs.max_bounce_count}:d{highpoly_depth}:{backend}")


def _raycount_lookup(key: str) -> Optional[int]:
    import json
    import os

    if not os.path.exists(RAYCOUNT_SIDECAR):
        return None
    try:
        with open(RAYCOUNT_SIDECAR) as f:
            return json.load(f).get(key)
    except (OSError, ValueError):
        return None


def _raycount_store(key: str, rays: int) -> None:
    import json
    import os

    data = {}
    if os.path.exists(RAYCOUNT_SIDECAR):
        try:
            with open(RAYCOUNT_SIDECAR) as f:
                data = json.load(f)
        except (OSError, ValueError):
            data = {}
    data[key] = rays
    try:
        with open(RAYCOUNT_SIDECAR, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: sidecar stays a cache, never a failure


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


class _StageDeadline(Exception):
    """Raised inside profile_stages when the measurement deadline passes;
    profiling returns the stages measured so far."""


def profile_stages(
    renderer: Renderer, rs: RenderStatic, frames: int = 25,
    deadline: Optional[float] = None,
) -> Dict[str, float]:
    """Per-stage device timings (ms) for one frame's hot pieces, each
    measured as its own jitted call bracketed by ``block_until_ready``
    (``utils/timing.py`` brackets; SURVEY.md §5 prescribes per-stage
    trace/shade/compact timers — under jit the stages fuse, so each is
    re-run standalone here).

    ``deadline``: absolute ``time.perf_counter()`` cutoff — stages still
    unmeasured when it passes are skipped (the dict keeps what IS
    measured), so a driver-budgeted run degrades to a partial stage table
    instead of an absent one (VERDICT r3 item 3)."""
    times: Dict[str, float] = {}
    try:
        _profile_stages_body(renderer, rs, frames, deadline, times)
    except _StageDeadline:
        times["_deadline_hit"] = 1.0
    return times


def _profile_stages_body(
    renderer: Renderer, rs: RenderStatic, frames: int,
    deadline: Optional[float], times: Dict[str, float],
) -> None:
    import functools

    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops.trace import _use_mega
    from raytpu.ops.traverse_pallas import (
        PACKET_K,
        ST_T,
        make_trace_state,
        pack_rays,
    )

    scene, static = renderer.device_scene, renderer.static
    cam = jnp.asarray(renderer.camera.basis())
    (px, py), _, in_frame = _tiled_pixels(rs)
    spp = rs.samples_per_pixel
    p0 = px.shape[0]
    if rs.fold_spp and spp > 1:
        px = jnp.repeat(px, spp, axis=0)
        py = jnp.repeat(py, spp, axis=0)
        in_frame = jnp.repeat(in_frame, spp, axis=0)
        s_idx = jnp.tile(jnp.arange(spp, dtype=jnp.float32), (p0,))[
            :, None
        ] * jnp.ones((1, PACKET_K), jnp.float32)
    else:
        s_idx = jnp.zeros_like(px)
    o, d = primary_rays_soa((px, py), cam, s_idx, spp, rs.width, rs.height)
    p = o[0].shape[0]
    lane_tmax = jnp.where(in_frame, jnp.float32(RAY_TMAX), 0.0)

    def timed(name, fn, *args):
        """Pipelined stage timing (see utils.timing.measure_frame: blocking
        per call measures tunnel dispatch latency, not device time).
        The iteration count must stay high: the host→device dispatch fixed
        cost over the dev tunnel is ~25 ms and is amortized 1/frames into
        every reported number (round-3 measured a 6.35 ms "prepass" at
        frames=5 whose true device cost was 1.2 ms).

        Past the deadline the stage's COMPILE is skipped too (it is the
        expensive part over the dev tunnel) — profiling aborts, keeping
        what is already measured."""
        import time as _t

        if deadline is not None and _t.perf_counter() > deadline:
            raise _StageDeadline()
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = _t.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        jax.block_until_ready(out)
        times[name] = (_t.perf_counter() - t0) / frames * 1e3
        return out

    from raytpu.ops.trace import _use_perlane

    use_pl = _use_perlane(static, p, PACKET_K, tier="loop")
    if use_pl or _use_mega(static, p, PACKET_K):
        from raytpu.config import HIT_EPSILON
        from raytpu.ops import shade
        from raytpu.ops import vec3 as v3
        from raytpu.ops.mega import (
            chunk_block_hits,
            mega_anyhit_sweep,
            mega_closest_sweep,
        )
        from raytpu.ops.traverse_pallas import unpack_state

        rays = pack_rays(o, d)
        group = rs.sample_group
        # the device scene is a jit ARGUMENT everywhere below: closing
        # over it inlines the BVH/treelet tables as HLO constants, and the
        # axon remote-compile request then exceeds the tunnel's body-size
        # limit (HTTP 413) on big scenes — the same closed-over-constants
        # trap CLAUDE.md documents for timing
        prepass = jax.jit(
            lambda sc, r, w: chunk_block_hits(sc, static, r, w, RAY_TMIN)
        )
        timed("prepass", prepass, scene, rays,
              lane_tmax.reshape(p, 8, 128))
        if use_pl:
            # profile the tier the frame actually dispatches to
            from raytpu.ops.perlane import (
                perlane_anyhit_sweep,
                perlane_closest_sweep,
            )

            sweep = jax.jit(
                lambda sc, rays, state: perlane_closest_sweep(
                    sc, static, rays, RAY_TMIN, state)
            )

            def anyhit(sc, rays, tmax_reg, occ):
                return perlane_anyhit_sweep(
                    sc, static, rays, RAY_TMIN, tmax_reg, occ,
                    order=rs.shadow_order)

            anyhit = jax.jit(anyhit)
        else:
            sweep = jax.jit(
                lambda sc, rays, state: mega_closest_sweep(
                    sc, static, rays=rays, state=state, tmin=RAY_TMIN,
                    group=group)
            )
            anyhit = jax.jit(
                lambda sc, rays, tmax_reg, occ: mega_anyhit_sweep(
                    sc, static, rays=rays, tmax_reg=tmax_reg, occ=occ,
                    tmin=RAY_TMIN, group=group, order=rs.shadow_order)
            )
        state1 = timed(
            "closest_sweep",
            lambda sc, r: sweep(sc, rays=r, state=make_trace_state(
                lane_tmax)),
            scene,
            rays,
        )
        # --- derive the j=0 continuations exactly as the integrator does,
        # so the shadow / bounce stages see the REAL sparse-lane shapes ---
        t, valid, mat, inst, n, u, v = unpack_state(state1, p, PACKET_K)
        n = v3.normalize(n)
        hit_mask = in_frame & valid
        pos = v3.add(o, v3.scale(t, d))
        lit = hit_mask & (mat == 0) & (v3.dot(d, n) < 0.0)
        shadow_o = v3.add(pos, v3.scale(HIT_EPSILON, n))
        to_light = tuple(scene.light_pos[c] - pos[c] for c in range(3))
        light_dist = v3.norm(to_light)
        l = v3.scale(1.0 / jnp.maximum(light_dist, 1e-30), to_light)
        shadow_rays = pack_rays(shadow_o, l)
        shadow_win = jnp.where(lit, light_dist, 0.0).reshape(p, 8, 128)
        timed(
            "shadow_anyhit",
            lambda sc, r, w: anyhit(
                sc, rays=r, tmax_reg=w,
                occ=jnp.zeros((p, 8, 128), jnp.int32)
            ),
            scene,
            shadow_rays,
            shadow_win,
        )
        o_m, d_m = shade.mirror_bounce_soa(d, n, pos)
        o_r, d_r = shade.refract_bounce_soa(d, n, pos)
        is_mirror = hit_mask & (mat == 1)
        cont = is_mirror | (hit_mask & (mat == 2))
        o_b = v3.where(cont, v3.where(is_mirror, o_m, o_r), o)
        d_b = v3.where(cont, v3.where(is_mirror, d_m, d_r), d)
        bounce_tmax = jnp.where(cont, jnp.float32(RAY_TMAX), 0.0)
        state2 = timed(
            "bounce_sweep",
            lambda sc, r, w: sweep(sc, rays=r, state=make_trace_state(w)),
            scene,
            pack_rays(o_b, d_b),
            bounce_tmax,
        )
        # j=1 shadow: the reflected-diffuse shadow sweep (the largest
        # single j>=1 bucket on config4) at its REAL scattered shapes
        t2, valid2, mat2, _, n2, _, _ = unpack_state(state2, p, PACKET_K)
        n2 = v3.normalize(n2)
        hit2 = cont & valid2
        pos2 = v3.add(o_b, v3.scale(t2, d_b))
        lit2 = hit2 & (mat2 == 0) & (v3.dot(d_b, n2) < 0.0)
        sh2_o = v3.add(pos2, v3.scale(HIT_EPSILON, n2))
        to_l2 = tuple(scene.light_pos[c] - pos2[c] for c in range(3))
        ld2 = v3.norm(to_l2)
        l2 = v3.scale(1.0 / jnp.maximum(ld2, 1e-30), to_l2)
        timed(
            "bounce_shadow",
            lambda sc, r, w: anyhit(
                sc, rays=r, tmax_reg=w,
                occ=jnp.zeros((p, 8, 128), jnp.int32)
            ),
            scene,
            pack_rays(sh2_o, l2),
            jnp.where(lit2, ld2, 0.0).reshape(p, 8, 128),
        )
    # deferred sky fetch at full wave width
    from raytpu.ops import sky_mxu
    from raytpu.ops.sky import sample_cubemap_u32

    if static.sky_hw != (0, 0):
        sky_h, sky_w = static.sky_hw
        if rs.skybox_filter == "bilinear" and sky_mxu.mxu_supported(
            sky_h, sky_w, PACKET_K
        ) and jax.default_backend() == "tpu":
            sky_fn = jax.jit(
                lambda tex, dd: sky_mxu.sample_cubemap_u32_mxu(
                    tex, sky_h, sky_w, dd, in_frame
                )
            )
        else:
            sky_fn = jax.jit(
                lambda tex, dd: sample_cubemap_u32(
                    tex, sky_h, sky_w, dd
                )
            )
        timed("sky", sky_fn, scene.skybox_u32,
              (d[0], d[1], jnp.negative(d[2])))


def tie_scene_config(width: int = 128, height: int = 96):
    """A deliberately TIE-PRONE scene: two instances of the same cube at
    the identity transform — every triangle exactly coincident across two
    instances AND two chunk sets — with DIFFERENT materials (mirror vs
    diffuse), so any tie-break-order difference between traversal paths
    becomes a visible pixel difference. Exercises the documented
    bit-identity caveat (ops/mega.py) instead of leaving it an untested
    claim (VERDICT r3 item 5)."""
    import os

    from raytpu.config import MaterialType, ObjectConfig, RenderConfig

    res = "/root/reference/resources"
    if not os.path.isdir(res):
        raise FileNotFoundError(res)
    return RenderConfig(
        objects=(
            ObjectConfig(f"{res}/cube.obj", MaterialType.MIRROR, "static"),
            ObjectConfig(f"{res}/cube.obj", MaterialType.DIFFUSE,
                         "static"),
        ),
        skybox_dir=f"{res}/skybox_texture_test",
        width=width, height=height,
        samples_per_pixel=2, max_bounce_count=2,
    )


def bit_identity_check(
    preset="config2",
    width: int = 128,
    height: int = 96,
    highpoly_depth: int = 5,
) -> Dict:
    """TPU-only validation gate: render one low-res frame with the
    megakernel (``traversal='mega'``) AND the two-level per-lane tier
    (``traversal='perlane'``) against the chained per-chunk Pallas kernels
    (``traversal='pallas'``, the reference implementation) and compare
    EXACT bits — the CLAUDE.md invariant, automated (the analog of the
    reference's always-on validation layers, ``src/main.cpp:813-848``).

    Returns ``{"ok": bool, "n_diff": int, "max_abs_diff": float, ...}``
    (ok = every compared path matched); ``{"skipped": ...}`` off-TPU
    (the mega/perlane paths only exist compiled).

    Known caveat: on geometry with exactly coincident triangles visible
    through different instances/chunks, the paths' different visit orders
    (octant near-first + depth-sorted entries vs build order) may break
    strict-`<` ties differently. Since round 4 this is TESTED, not just
    documented: pass ``preset=tie_scene_config()`` (two coincident cube
    instances with different materials) to measure it — the driver bench
    records the result as ``tie_check``.
    """
    import dataclasses

    import numpy as np

    if jax.default_backend() != "tpu":
        return {"skipped": "mega path is TPU-only"}
    scene = load_preset_scene(preset, highpoly_depth=highpoly_depth)
    scene.config = scene.config.replace(width=width, height=height,
                                        traversal="perlane")
    renderer = Renderer(scene)
    renderer.set_transforms(0.0)
    rs = renderer.render_static
    cam = jnp.asarray(renderer.camera.basis())
    modes = ["pallas", "mega"]
    if renderer.static.perlane_layout is not None:
        modes.append("perlane")
    imgs = {}
    for mode in modes:
        static = dataclasses.replace(renderer.static, traversal=mode)
        imgs[mode] = np.asarray(
            render_frame(renderer.device_scene, static, rs, cam)
        )
    out = {
        "preset": preset if isinstance(preset, str) else "tie_scene",
        "width": width, "height": height,
    }
    ok = True
    for mode in modes[1:]:
        diff = imgs[mode] != imgs["pallas"]
        n_diff = int(diff.sum())
        out[f"n_diff_{mode}"] = n_diff
        out[f"max_abs_diff_{mode}"] = float(
            np.abs(imgs[mode] - imgs["pallas"]).max()
        )
        ok = ok and n_diff == 0
    out["ok"] = ok
    out["n_diff"] = sum(out[f"n_diff_{m}"] for m in modes[1:])
    return out


# Any full frame implying more than this many Mrays/s of PRIMARY rays
# alone is physically impossible on this hardware class (the north star
# is 500; round 4's corrupted artifact row implied ~9,100): the harness
# re-measures unpipelined and flags the row instead of recording it
# clean (VERDICT r4 item 2 — "a benchmark harness that can print an
# impossible number into the official artifact is itself a defect").
PLAUSIBLE_MRAYS = 2000.0


def _plausibility_guard(out: Dict, frame, frames: int) -> None:
    """Guard a measured frame time against dispatch artifacts: if the
    PRIMARY rays alone (width*height*spp — a hard lower bound on traced
    rays, every in-frame pixel traces at j=0) imply an impossible
    throughput, re-measure with ``pipelined=False`` (strict call-return:
    the device must actually finish each frame before the next timestamp)
    and record BOTH numbers with ``suspect: true``. The unpipelined
    number includes ~25 ms of tunnel dispatch latency per frame, but any
    frame fast enough to trip the bound is sub-ms, where a conservative
    over-estimate is the honest direction."""
    min_rays = out["width"] * out["height"] * out["spp"]
    implied_mrays = min_rays / max(out["frame_ms"], 1e-9) / 1e3
    if implied_mrays <= PLAUSIBLE_MRAYS:
        return
    mean2, _ = measure_frame(
        frame, warmup=0, iters=max(4, frames // 4), pipelined=False
    )
    out["suspect"] = True
    out["suspect_pipelined_ms"] = out["frame_ms"]
    out["suspect_implied_mrays"] = implied_mrays
    out["frame_ms"] = mean2 * 1e3
    out["fps"] = 1.0 / mean2
    if out.get("mrays_per_s"):
        out["mrays_per_s"] = out["rays_per_frame"] / mean2 / 1e6


def build_preset_renderer(preset, highpoly_depth: int = 7,
                          spp: Optional[int] = None) -> Renderer:
    """Build (scene + BVH + device upload) a preset's Renderer once, so a
    driver bench can reuse it across the matrix / headline / stage phases
    instead of re-generating the armadillo stand-in and re-building the
    SAH tree per phase (round-4 budget lesson)."""
    scene = load_preset_scene(preset, highpoly_depth=highpoly_depth)
    if spp is not None:
        scene.config = scene.config.replace(samples_per_pixel=spp)
    renderer = Renderer(scene)
    renderer.set_transforms(0.0)
    return renderer


def run_benchmark(
    preset="config4",
    frames: int = 24,
    highpoly_depth: int = 7,
    spp: Optional[int] = None,
    stages: bool = False,
    count: bool = True,
    devices: int = 1,
    renderer: Optional[Renderer] = None,
) -> Dict:
    """Benchmark a preset name or a fully-specified RenderConfig: honest
    steady-state frame time (compile excluded, device-blocked), exact
    Mrays/s, FPS. ``count=False`` skips the exact traced-ray count (it
    compiles a second full program — minutes over the dev tunnel); FPS and
    frame time are still exact.

    ``devices > 1`` benches the SHARDED path (``parallel.render_sharded``
    over a 1-D mesh of that many devices) — the day-one measurement entry
    for a multi-chip environment (env flag ``RAYTPU_BENCH_DEVICES`` in
    ``bench.py``); per-frame semantics are bit-identical to single-device
    (``tests/test_parallel.py``).

    ``renderer``: a pre-built Renderer (``build_preset_renderer``) to
    reuse — in-process jit caching then makes a second measurement of the
    same preset nearly free."""
    if renderer is None:
        renderer = build_preset_renderer(preset, highpoly_depth, spp)
    rs = renderer.render_static
    cam = renderer.camera.basis()

    backend = jax.devices()[0].platform

    t0 = time.perf_counter()
    rays = None
    key = None
    if count and isinstance(preset, str) and spp is None:
        key = _raycount_key(preset, rs, highpoly_depth, backend)
        rays = _raycount_lookup(key)
    if rays is None:
        rays = (
            count_rays_frame(renderer.device_scene, renderer.static, rs,
                             cam)
            if count else 0
        )
        if count and key is not None:
            _raycount_store(key, rays)
    count_s = time.perf_counter() - t0

    if devices > 1:
        from raytpu.parallel.dist import make_mesh, render_sharded

        mesh = make_mesh(devices)

        def frame():
            return render_sharded(renderer.device_scene, renderer.static,
                                  rs, jnp.asarray(cam), mesh=mesh)
    else:
        def frame():
            return render_frame(renderer.device_scene, renderer.static, rs,
                                jnp.asarray(cam))

    mean_s, times = measure_frame(frame, warmup=1, iters=frames)
    # fast frames need more pipelined iterations for an honest mean: the
    # ~25 ms host->device dispatch fixed cost is amortized 1/iters into
    # every number (config1 read 3.4 ms at 12 frames vs ~1.2 at 30+).
    # Re-measure so the fixed cost is <~10% of the reported frame time;
    # extra wall cost is bounded (fast frames by definition).
    if mean_s * 1e3 < 20.0 and frames < 96:
        iters2 = min(96, max(2 * frames, int(0.25 / max(mean_s, 1e-4))))
        mean_s, times = measure_frame(frame, warmup=0, iters=iters2)

    mrays = rays / mean_s / 1e6 if count else None
    out = {
        "preset": preset if isinstance(preset, str) else "custom",
        "backend": backend,
        **({"devices": devices} if devices > 1 else {}),
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
    _plausibility_guard(out, frame, frames)
    if stages:
        try:
            out["stage_ms"] = profile_stages(renderer, rs)
        except Exception as e:  # stages are diagnostics, never fail the bench
            out["stage_error"] = repr(e)
    return out


_MATRIX_KEYS = ("width", "height", "spp", "max_bounces",
                "frame_ms", "fps", "mrays_per_s",
                "suspect", "suspect_pipelined_ms")


def run_matrix(
    presets=("config1", "config2", "config3", "config4", "config5",
             "reference"),
    frames: int = 4,
    highpoly_depth: int = 7,
    budget_s: float = 600.0,
    renderers: Optional[Dict] = None,
) -> Dict[str, Dict]:
    """Benchmark every BASELINE config (+ the reference 63-bounce default)
    in one process, bounded by a wall-clock budget so a driver-invoked run
    cannot blow its timeout. Returns {preset: summary-or-skip-reason}.

    Budget shaping (VERDICT r4 item 1): each preset is admitted only if
    the REMAINING budget exceeds an estimate of its cost — the cost of
    the most recent completed preset (compile-dominated under a cold
    cache, so recent history is the best predictor available) with a
    60 s floor. Skipped rows say which it was: over budget entirely, or
    remaining-budget-below-estimate (the round-4 artifact said only
    "budget exhausted" for four different rows, all actually starved by
    one cold headline compile). ``renderers``: optional {name: Renderer}
    cache shared with the caller — presets already built (e.g. the
    headline) are reused, and newly built ones are added for later
    phases (stage profiling)."""
    t0 = time.perf_counter()
    out: Dict[str, Dict] = {}
    last_cost = 60.0  # optimistic floor: a warm-cache preset takes <60 s
    for name in presets:
        elapsed = time.perf_counter() - t0
        remaining = budget_s - elapsed
        if remaining <= 0:
            out[name] = {"skipped": f"budget exhausted ({elapsed:.0f}s)"}
            continue
        if remaining < min(last_cost, 300.0) * 0.8:
            out[name] = {
                "skipped": f"remaining budget {remaining:.0f}s below "
                           f"estimate {last_cost:.0f}s"
            }
            continue
        t_preset = time.perf_counter()
        try:
            rr = renderers.get(name) if renderers is not None else None
            if rr is None:
                rr = build_preset_renderer(name, highpoly_depth)
                if renderers is not None:
                    renderers[name] = rr
            # count=False: exact FPS/frame-time without the second compiled
            # ray-count program — lets more configs fit the wall budget
            # (FPS is the BASELINE target for configs 1/5 anyway)
            r = run_benchmark(
                preset=name, frames=frames, highpoly_depth=highpoly_depth,
                count=False, renderer=rr,
            )
            out[name] = {
                k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in r.items()
                if v is not None and k in _MATRIX_KEYS
            }
        except Exception as e:
            out[name] = {"error": repr(e)}
        last_cost = time.perf_counter() - t_preset
    return out


def matrix_complete(configs: Dict[str, Dict], need: int = 5) -> bool:
    """Did the matrix produce at least ``need`` numeric (non-skipped,
    non-error, non-suspect) rows? The driver artifact records the
    negation as ``artifact_incomplete`` so a starved run can never look
    like a complete one (VERDICT r4 item 1iii)."""
    numeric = [
        r for r in configs.values()
        if isinstance(r, dict) and "frame_ms" in r and not r.get("suspect")
    ]
    return len(numeric) >= need
