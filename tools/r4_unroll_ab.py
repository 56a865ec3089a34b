#!/usr/bin/env python
"""A/B the statically-unrolled bounce loop vs lax.while_loop on TPU.

Stage sums (tools/r4_stage_probe.py) explain only ~2/3 of the by-depth
marginal cost of each bounce iteration on both config4 and config5; the
remainder is structural (while-loop carried-buffer copies / lost fusion
across the loop boundary). Unrolling keeps the math identical (CPU
bit-identity asserted in-repo) and lets XLA fuse across iterations."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    presets = sys.argv[1:] or ["config5", "config4", "config2"]
    for preset in presets:
        out = {}
        imgs = {}
        for unroll in (True, False):
            sc = load_preset_scene(preset)
            sc.config = sc.config.replace(bounce_unroll=unroll)
            t0 = time.perf_counter()
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            key = "unroll" if unroll else "while"
            out[key] = round(mean_s * 1e3, 2)
            out[key + "_t"] = round(time.perf_counter() - t0, 1)
            if preset == presets[0]:
                imgs[key] = np.asarray(frame())
            print(json.dumps({preset: out}), flush=True)
        if imgs:
            nd = int((imgs["unroll"] != imgs["while"]).sum())
            print(json.dumps({f"{preset}_n_diff": nd}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
