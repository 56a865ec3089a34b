#!/usr/bin/env python
"""Round-3 TPU experiment batch 5.

1. Bounce-depth frame sweep on config4 and config5: frames at
   max_bounce_count = 0..3 — the deltas decompose the frame into exact
   per-iteration costs (including j>=1 shadow sweeps the stage profiler
   does not cover).
2. LBVH vs SAH on config4 (VERDICT r2 item 10): build time + frame time.
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

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    for preset in ("config4", "config5"):
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {}
        for mb in (0, 1, 2, 3):
            t0 = time.perf_counter()
            rs = dataclasses.replace(rr.render_static, max_bounce_count=mb)

            def frame(rs=rs):
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=15)
            out[f"mb{mb}"] = round(mean_s * 1e3, 2)
            out[f"mb{mb}_t"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({preset + "_by_depth": out}), flush=True)

    res = {}
    for builder in ("sah", "lbvh"):
        sc = load_preset_scene("config4")
        sc.config = sc.config.replace(bvh_builder=builder)
        t0 = time.perf_counter()
        rr = Renderer(sc)
        res[builder + "_build_s"] = round(time.perf_counter() - t0, 2)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame(rr=rr, cam=cam):
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        t0 = time.perf_counter()
        mean_s, _ = measure_frame(frame, warmup=1, iters=12)
        res[builder + "_frame_ms"] = round(mean_s * 1e3, 2)
        res[builder + "_t"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({builder: {k: v for k, v in res.items()
                                    if k.startswith(builder)}}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
