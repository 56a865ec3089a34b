#!/usr/bin/env python
"""A/B the 'hybrid' tier (primary sweeps per-lane, bounce sweeps mega)
against pure mega and pure perlane on the presets where each pure mode
wins a different bucket. Run AFTER tools/r4_newperlane.py validates."""

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

    presets = sys.argv[1:] or ["config2", "config3", "config4", "config5",
                               "reference"]
    for preset in presets:
        out = {}
        for trav in ("hybrid", "auto"):
            sc = load_preset_scene(preset)
            sc.config = sc.config.replace(traversal=trav)
            t0 = time.perf_counter()
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            out[trav] = round(mean_s * 1e3, 2)
            out[trav + "_t"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({preset: out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
