#!/usr/bin/env python
"""Probe the MXU sky sampler's compacted-gather fallback budget on TPU.

Hypothesis (from tools/r4_profile_trace.py): on bounce frames the per-wave
bad-packet count nbad exceeds budget = p//8, so the nested cond falls to
the FULL per-lane gather over the whole wave (~19 ms of config5's 33 ms).
The compacted tier's cost is proportional to the STATIC budget, so the
right budget compacts that to ~nbad/p of the full-gather cost.

Per preset: one debug leg printing the actual nbad (jax.debug.print, not
timed), then timed legs across FALLBACK_DIV values.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu import presets
    from raytpu.integrator import render_frame
    from raytpu.ops import sky_mxu
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    cfgs = sys.argv[1:] or ["config5", "config4"]
    for preset in cfgs:
        # --- debug leg: recover nbad from the frame (untimed) ---
        sky_mxu.DEBUG_NBAD = True
        sky_mxu.FALLBACK_DIV = 8
        sc = load_preset_scene(preset)
        sc.config = sc.config.replace(sky_rebin="off")
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        frame_dbg = render_frame(rr.device_scene, rr.static,
                                 rr.render_static, cam)
        nbad = int(float(frame_dbg.max()))
        print(json.dumps({preset + "_nbad": nbad}), flush=True)
        sky_mxu.DEBUG_NBAD = False

        out = {}
        for div in (8, 4, 2):
            sky_mxu.FALLBACK_DIV = div
            t0 = time.perf_counter()
            sc = load_preset_scene(preset)
            sc.config = sc.config.replace(sky_rebin="off")
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            out[f"div{div}"] = round(mean_s * 1e3, 2)
            out[f"div{div}_t"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({preset: out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
