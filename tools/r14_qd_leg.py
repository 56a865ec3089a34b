#!/usr/bin/env python
"""One leg of the deferred-leaf queue-depth sweep (RAYTPU_QD, read at
import — one process per value; cross-process legs carry the documented
±1-2 ms session variance, so only >2 ms differences are meaningful).
Prints one JSON line with frame times for the requested presets."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from raytpu.integrator import render_frame
    from raytpu.ops.perlane import QD
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    presets = os.environ.get("R14_PRESETS", "config4,config5").split(",")
    frames = int(os.environ.get("R14_FRAMES", "24"))
    out = {"qd": QD, "backend": jax.devices()[0].platform,
           "quad": os.environ.get("RAYTPU_PERLANE_QUAD", "0")}
    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame():
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
        out[name] = round(mean_s * 1e3, 2)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
