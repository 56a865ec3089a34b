#!/usr/bin/env python
"""Measure the batched-window-DMA sky kernel on TPU.

Baseline (same session methodology, pre-change, from r4_skyrebin_ab.py's
rebin-off legs): config5 31.11 ms, config4 166.55, reference 89.74.
Hypothesis: the serialized per-window start();wait() pairs made the MXU
sky kernel DMA-latency-bound on divergent (bounce) waves — batching all
SKY_SUPER*MAX_FACES window copies per grid step should recover most of
the ~13 ms the DEBUG_NBAD leg isolated on config5.

Also asserts the on-chip sampler contract (mxu-vs-gather frame diff
<= 1.5/255) since the kernel restructure touches the hot DMA path.
"""

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

    presets = sys.argv[1:] or ["config5", "config4", "reference"]
    for preset in presets:
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame(rr=rr, cam=cam):
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=20)
        print(json.dumps({preset: round(mean_s * 1e3, 2),
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)

    # on-chip sampler contract at frame level (first preset)
    imgs = {}
    for mode in ("mxu", "gather"):
        sc = load_preset_scene(presets[0])
        sc.config = sc.config.replace(sky_sampler=mode)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        imgs[mode] = np.asarray(render_frame(
            rr.device_scene, rr.static, rr.render_static, cam))
    err = float(np.abs(imgs["mxu"] - imgs["gather"]).max())
    print(json.dumps({f"{presets[0]}_mxu_vs_gather_max_abs": err,
                      "ok": err <= 1.5 / 255.0 + 1e-6}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
