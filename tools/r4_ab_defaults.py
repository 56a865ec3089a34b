#!/usr/bin/env python
"""Round-4 session entry A/B: mega("auto") vs perlane across every preset.

The per-lane tier is opt-in; this run decides the on-TPU default per
preset (frames, pipelined, steady-state) and records the reference-preset
number the round-3 log never captured for perlane. Also decomposes
config5/config4 by bounce depth under PERLANE to locate the j>=1 wall.
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

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    presets = ("config2", "config3", "config4", "config5", "reference")
    for preset in presets:
        out = {}
        for trav in ("auto", "perlane"):
            sc = load_preset_scene(preset)
            sc.config = sc.config.replace(traversal=trav)
            t0 = time.perf_counter()
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=24)
            out[trav] = round(mean_s * 1e3, 2)
            out[trav + "_t"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({preset: out}), flush=True)

    # bounce-depth decomposition under perlane (config5 is the 60 FPS
    # target; config4 the headline)
    for preset in ("config5", "config4"):
        sc = load_preset_scene(preset)
        sc.config = sc.config.replace(traversal="perlane")
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {}
        for mb in (0, 1, 2, 3):
            rs = dataclasses.replace(rr.render_static, max_bounce_count=mb)

            def frame(rs=rs):
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=15)
            out[f"mb{mb}"] = round(mean_s * 1e3, 2)
        print(json.dumps({preset + "_perlane_by_depth": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
