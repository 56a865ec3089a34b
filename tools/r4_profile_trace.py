#!/usr/bin/env python
"""Op-level frame profile: jax.profiler trace of preset frames, then parse
the perfetto trace JSON for the top device ops by self time. Finds where
the unexplained per-bounce-iteration cost actually goes."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/jaxtrace"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    preset = os.environ.get("TRACE_PRESET", "config5")
    mb = os.environ.get("TRACE_MB", "")  # max_bounce_count override
    sc = load_preset_scene(preset)
    if mb:
        sc.config = sc.config.replace(max_bounce_count=int(mb))
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())

    def frame():
        return render_frame(rr.device_scene, rr.static, rr.render_static,
                            cam)

    # warm (compile) outside the trace
    frame().block_until_ready()
    frame().block_until_ready()

    os.system(f"rm -rf {OUT}")
    with jax.profiler.trace(OUT):
        for _ in range(3):
            out = frame()
        out.block_until_ready()
    print("trace written", flush=True)

    files = glob.glob(f"{OUT}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return 1
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    evs = tr.get("traceEvents", [])
    # keep device-lane complete events with durations
    by_name = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in evs:
        if e.get("ph") != "X":
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        args = e.get("args") or {}
        # prefer the HLO op name when present
        key = args.get("long_name") or args.get("hlo_op") or name
        if isinstance(key, str) and len(key) > 120:
            key = key[:120]
        by_name[key] += dur
        cnt[key] += 1
        total += dur
    # NOTE: durations are summed over the 3 traced frames — report
    # PER-FRAME numbers (the raw totals misled round 3c: a ~0.55 ms/frame
    # fusion was read as a 19 ms "gather fallback")
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:45]
    print(json.dumps({"preset": preset, "mb": mb or "default",
                      "sum_ms_per_frame_all_events": round(total / 3, 1)}))
    for k, v in top:
        print(json.dumps({"op": k, "ms_per_frame": round(v / 3, 2),
                          "n": cnt[k]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
