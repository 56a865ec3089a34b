#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Headline metric (BASELINE.json): traced Mrays/s per chip on the
armadillo-class 1080p 3-bounce Whitted scene (config 4).
``vs_baseline`` is measured against the 500 Mrays/s/chip north star.

Runs on the default platform (the real TPU chip under axon); set
RAYTPU_BENCH_PRESET / RAYTPU_BENCH_FRAMES / RAYTPU_HIGHPOLY_DEPTH to vary.

``python bench.py --selftest`` runs ONLY the traversal bit-identity gate
(megakernel AND per-lane tier vs the chained-Pallas low-res frame, exact
equality — the CLAUDE.md invariant) and exits 0/1 on match/mismatch.
"""

import json
import os
import sys

NORTH_STAR_MRAYS = 500.0


def main() -> int:
    preset = os.environ.get("RAYTPU_BENCH_PRESET", "config4")
    # 24+ pipelined frames: the ~25 ms host->device dispatch fixed cost
    # over the dev tunnel is amortized 1/frames into every frame time
    # (8 frames biased every config by +3 ms in rounds 1-2)
    frames = int(os.environ.get("RAYTPU_BENCH_FRAMES", "24"))
    depth = int(os.environ.get("RAYTPU_HIGHPOLY_DEPTH", "7"))
    matrix = os.environ.get("RAYTPU_BENCH_MATRIX", "1") != "0"
    budget = float(os.environ.get("RAYTPU_BENCH_BUDGET_S", "900"))
    # multi-chip bench entry: RAYTPU_BENCH_DEVICES=N shards the headline
    # preset over a 1-D mesh of N devices (parallel.render_sharded, bit-
    # identical to single-device) — nothing to run today on the one-chip
    # environment, but a multi-chip slice is measurable on day one
    devices = int(os.environ.get("RAYTPU_BENCH_DEVICES", "1"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import time as _time

    from raytpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()

    def cache_entries():
        try:
            return len(os.listdir(cache_dir)) if cache_dir else -1
        except OSError:
            return -1

    entries_before = cache_entries()

    from raytpu.bench import bit_identity_check, run_benchmark, run_matrix

    if "--selftest" in sys.argv[1:]:
        from raytpu.bench import tie_scene_config

        r = bit_identity_check()
        # tie-prone coincident-geometry scene: exercises the documented
        # caveat (exactly-coincident triangles across instances/chunks)
        r["tie_check"] = bit_identity_check(preset=tie_scene_config())
        print(json.dumps(r))
        ok = r.get("ok", False) or "skipped" in r
        tie_ok = r["tie_check"].get("ok", False) or "skipped" in r["tie_check"]
        return 0 if (ok and tie_ok) else 1

    from raytpu.bench import build_preset_renderer, matrix_complete

    t0 = _time.perf_counter()
    # renderer cache shared across the headline / matrix / stage phases:
    # scene generation + BVH build + in-process jit caching happen once
    # per preset instead of once per phase (round-4 budget lesson)
    renderers = {}
    renderers[preset] = build_preset_renderer(preset, depth)
    r = run_benchmark(preset=preset, frames=frames, highpoly_depth=depth,
                      devices=devices, renderer=renderers[preset])
    out = {
        "metric": f"traced Mrays/s per chip ({preset}: {r['width']}x{r['height']}, "
                  f"{r['spp']}spp, {r['max_bounces']}-bounce, "
                  f"{r['rays_per_frame']/1e6:.1f}M rays/frame, "
                  f"{r['fps']:.1f} FPS, backend={r['backend']})",
        "value": round(r["mrays_per_s"], 2),
        "unit": "Mrays/s",
        "vs_baseline": round(r["mrays_per_s"] / NORTH_STAR_MRAYS, 4),
    }
    if r.get("suspect"):
        out["suspect"] = True
    if matrix:
        # the full BASELINE matrix including the reference 63-bounce default
        # preset runs BEFORE any budget-gated diagnostics, so the driver
        # record always captures every config (VERDICT r2 item 6)
        # the reference 63-bounce default runs FIRST so a tight budget can
        # never drop the preset that defines the reference workload
        others = [p for p in
                  ("reference", "config1", "config2", "config3", "config5")
                  if p != preset]
        left = budget - (_time.perf_counter() - t0)
        out["configs"] = run_matrix(
            presets=others, frames=max(2, frames // 2),
            highpoly_depth=depth, budget_s=max(0.0, left),
            renderers=renderers,
        )
        out["configs"][preset] = {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in r.items()
            if k in ("width", "height", "spp", "max_bounces",
                     "rays_per_frame", "frame_ms", "fps", "mrays_per_s",
                     "suspect", "suspect_pipelined_ms")
        }
        # completeness assert (VERDICT r4 item 1iii): a starved or
        # suspect-ridden matrix must say so in the artifact itself
        if not matrix_complete(out["configs"], need=5):
            out["artifact_incomplete"] = True
    # megakernel bit-identity gate (cheap low-res check; the validation-
    # layer analog) — recorded in the driver artifact every TPU bench
    if _time.perf_counter() - t0 < budget * 0.75:
        try:
            bi = bit_identity_check()
            if "ok" in bi:
                out["bit_identical"] = bi["ok"]
                if not bi["ok"]:
                    out["bit_identity_detail"] = bi
        except Exception as e:
            out["bit_identity_error"] = repr(e)
        # the tie-prone coincident-geometry scene (documented caveat),
        # recorded alongside the preset gate
        try:
            from raytpu.bench import tie_scene_config

            tie = bit_identity_check(preset=tie_scene_config())
            if "ok" in tie:
                out["tie_check"] = {
                    k: v for k, v in tie.items() if k != "preset"
                }
        except Exception as e:
            out["tie_check_error"] = repr(e)
    # per-stage profiling is diagnostics; it runs LAST under the remaining
    # budget so it can never crowd out the benchmark matrix. The entry gate
    # is generous (0.9) because profile_stages now takes a hard DEADLINE
    # and degrades to a partial stage table instead of overshooting — with
    # a warm compilation cache + the ray-count sidecar the whole bench fits
    # with room to spare (VERDICT r3 item 3).
    if _time.perf_counter() - t0 < budget * 0.9:
        from raytpu.bench import profile_stages as _ps

        try:
            # reuses the headline renderer built above — stage profiling
            # no longer re-generates the scene + BVH (round-4 budget
            # lesson: every phase that rebuilds state is a phase that can
            # starve the artifact)
            rr = renderers[preset]
            out["stage_ms"] = {
                k: round(v, 2)
                for k, v in _ps(
                    rr, rr.render_static,
                    deadline=t0 + budget * 0.98,
                ).items()
            }
        except Exception as e:
            out["stage_error"] = repr(e)
    # compilation-cache effectiveness is recorded in-artifact so a cold
    # cache (and thus a budget-starved run) is diagnosable from the JSON
    out["cache"] = {
        "dir": cache_dir,
        "entries_before": entries_before,
        "entries_after": cache_entries(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
