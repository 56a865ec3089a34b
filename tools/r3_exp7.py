#!/usr/bin/env python
"""Round-3 TPU experiment batch 7: lockstep-W walks + split retest.

Lockstep interleaving (W = 4/group packet walks share one loop) changes
the sub-tile split calculus: the 4 quarter-tile walks of a tile now cost
one group-walk's per-iteration work instead of 4 sequential loops.

1. config4 frame: divergence off (lockstep W=1 — expect ~185 baseline),
   "split" (quarter-tile lockstep quads for shadow+bounce),
   "split_all" (quarter-tile for the primary sweep too).
2. config5 frame (spp=1: lockstep W=4 applies everywhere on its own).
3. config2 frame off/split.
4. stage_ms config4 (sky SKY_SUPER batching validation on healthy chip).
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

    from raytpu.bench import profile_stages
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    def bench(rr, rs, iters=25):
        cam = jnp.asarray(rr.camera.basis())

        def frame():
            return render_frame(rr.device_scene, rr.static, rs, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=iters)
        return round(mean_s * 1e3, 2)

    sc = load_preset_scene("config4")
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    for mode in ("off", "split", "split_all"):
        t0 = time.perf_counter()
        rs = dataclasses.replace(rr.render_static, divergence=mode)
        ms = bench(rr, rs)
        print(json.dumps({"config4_" + mode: ms,
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)

    sc5 = load_preset_scene("config5")
    r5 = Renderer(sc5)
    r5.set_transforms(0.0)
    t0 = time.perf_counter()
    print(json.dumps({"config5_off": bench(r5, r5.render_static, iters=30),
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)

    sc2 = load_preset_scene("config2")
    r2 = Renderer(sc2)
    r2.set_transforms(0.0)
    for mode in ("off", "split"):
        t0 = time.perf_counter()
        rs = dataclasses.replace(r2.render_static, divergence=mode)
        print(json.dumps({"config2_" + mode: bench(r2, rs, iters=30),
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)

    st = profile_stages(rr, rr.render_static)
    print(json.dumps({"stage_ms_config4":
                      {k: round(v, 2) for k, v in st.items()}}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
