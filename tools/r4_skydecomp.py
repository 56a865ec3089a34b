#!/usr/bin/env python
"""Direct decomposition of config5's frame: sampler-mode and bounce-depth
legs, full-frame pipelined timings (the only trustworthy methodology).

Questions this answers (after three failed hypotheses about the ~19 ms
the DEBUG_NBAD leg isolated: full-gather overflow — no, nbad=128 fits
the budget; sub-wave rebin — displaced nothing; window-DMA latency —
batching moved only ~2.5 ms on config4/reference):

- mxu vs gather vs 1-tap legs split the sampler cost into kernel-ish vs
  per-tap-gather-ish parts (gather = 4 taps/lane, nearest = 1 tap,
  bilinear2x = 1 tap into the 4x-larger prefiltered map).
- mb=0..3 legs give true per-bounce marginals under the current tree.
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

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    preset = sys.argv[1] if len(sys.argv) > 1 else "config5"
    legs = [
        ("mxu", {}),
        ("gather", {"sky_sampler": "gather"}),
        ("near1tap", {"skybox_filter": "nearest"}),
        ("b2x1tap", {"skybox_filter": "bilinear2x"}),
        ("mb0", {"max_bounce_count": 0}),
        ("mb1", {"max_bounce_count": 1}),
        ("mb2", {"max_bounce_count": 2}),
    ]
    out = {}
    for name, over in legs:
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        if over:
            sc.config = sc.config.replace(**over)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame(rr=rr, cam=cam):
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=20)
        out[name] = round(mean_s * 1e3, 2)
        out[name + "_t"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({preset: out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
