#!/usr/bin/env python
"""Round-4: time the fused path under the current RAYTPU_EPI_* env knobs.

One process per leg (the knobs are trace-time constants read at import);
the shell driver `r6_epiknobs_ab.sh` sweeps the combos. Prints one JSON
line per preset: {"preset", "env", "fused_ms"}.
"""

import dataclasses
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
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    env = {k: v for k, v in os.environ.items() if k.startswith("RAYTPU_EPI")}
    print("backend:", jax.devices()[0].platform, "env:", env, flush=True)
    presets = os.environ.get("EPI_PRESETS", "config4,config5").split(",")
    frames = int(os.environ.get("EPI_FRAMES", "24"))

    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        rs = dataclasses.replace(rr.render_static, fused="auto")

        def frame():
            return render_frame(rr.device_scene, rr.static, rs, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
        print(json.dumps({"preset": name, "env": env,
                          "fused_ms": round(mean_s * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
