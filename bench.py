#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Headline metric (BASELINE.json): traced Mrays/s per chip on the
armadillo-class 1080p 3-bounce Whitted scene (config 4).
``vs_baseline`` is measured against the 500 Mrays/s/chip north star.

Runs on the default platform (the real TPU chip under axon); set
RAYTPU_BENCH_PRESET / RAYTPU_BENCH_FRAMES / RAYTPU_HIGHPOLY_DEPTH to vary.
"""

import json
import os
import sys

NORTH_STAR_MRAYS = 500.0


def main() -> int:
    preset = os.environ.get("RAYTPU_BENCH_PRESET", "config4")
    frames = int(os.environ.get("RAYTPU_BENCH_FRAMES", "8"))
    depth = int(os.environ.get("RAYTPU_HIGHPOLY_DEPTH", "7"))
    matrix = os.environ.get("RAYTPU_BENCH_MATRIX", "1") != "0"
    budget = float(os.environ.get("RAYTPU_BENCH_BUDGET_S", "900"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import time as _time

    from raytpu.bench import run_benchmark, run_matrix

    t0 = _time.perf_counter()
    r = run_benchmark(preset=preset, frames=frames, highpoly_depth=depth)
    # optional extras, each gated on remaining wall budget so the headline
    # line always lands well inside any driver timeout (compiles over the
    # dev tunnel can take minutes each)
    if _time.perf_counter() - t0 < budget * 0.62:
        from raytpu.bench import profile_stages as _ps
        from raytpu.presets import load_preset_scene as _lps
        from raytpu.render import Renderer as _R

        try:
            sc = _lps(preset, highpoly_depth=depth)
            rr = _R(sc)
            rr.set_transforms(0.0)
            r["stage_ms"] = _ps(rr, rr.render_static)
        except Exception as e:
            r["stage_error"] = repr(e)
    out = {
        "metric": f"traced Mrays/s per chip ({preset}: {r['width']}x{r['height']}, "
                  f"{r['spp']}spp, {r['max_bounces']}-bounce, "
                  f"{r['rays_per_frame']/1e6:.1f}M rays/frame, "
                  f"{r['fps']:.1f} FPS, backend={r['backend']})",
        "value": round(r["mrays_per_s"], 2),
        "unit": "Mrays/s",
        "vs_baseline": round(r["mrays_per_s"] / NORTH_STAR_MRAYS, 4),
    }
    if "stage_ms" in r:
        out["stage_ms"] = {k: round(v, 2) for k, v in r["stage_ms"].items()}
    if matrix:
        # the full BASELINE matrix (VERDICT round-1 item 4) under the
        # REMAINING wall budget; the headline metric above always lands
        others = [p for p in
                  ("config1", "config2", "config3", "config5", "reference")
                  if p != preset]
        left = budget - (_time.perf_counter() - t0)
        out["configs"] = run_matrix(
            presets=others, frames=max(2, frames // 2),
            highpoly_depth=depth, budget_s=max(0.0, left),
        )
        out["configs"][preset] = {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in r.items()
            if k in ("width", "height", "spp", "max_bounces",
                     "rays_per_frame", "frame_ms", "fps", "mrays_per_s")
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
