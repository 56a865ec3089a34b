#!/usr/bin/env python
"""Round-4 exp 2: light-centric shadow entry ordering A/B.

All shadow rays converge on the single point light (src/shader.rgen:107-112);
``shadow_order="light"`` sorts each anyhit sweep's entries by
distance-from-the-light so the occluders that shadow the most lanes test
first and the early-exit fires sooner. Bit-identical by construction
(occlusion is an order-independent OR) — asserted here anyway at low res,
then same-session steady-state frame timings per preset.
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
    import numpy as np

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print("backend:", jax.devices()[0].platform, flush=True)
    presets = os.environ.get(
        "SHADOW_AB_PRESETS", "config4,config5,reference"
    ).split(",")
    frames = int(os.environ.get("SHADOW_AB_FRAMES", "24"))

    # exactness gate at low res
    sc = load_preset_scene("config2")
    sc.config = sc.config.replace(width=256, height=192)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    imgs = {}
    for order in ("origin", "light"):
        rs = dataclasses.replace(rr.render_static, shadow_order=order)
        imgs[order] = np.asarray(
            render_frame(rr.device_scene, rr.static, rs, cam))
    nd = int((imgs["light"] != imgs["origin"]).sum())
    print(json.dumps({"check": "order bit-identity config2 256x192",
                      "n_diff": nd}), flush=True)
    if nd:
        print("BIT-IDENTITY FAIL — aborting timings", flush=True)
        return 1

    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {"preset": name}
        for order in ("origin", "light"):
            rs = dataclasses.replace(rr.render_static, shadow_order=order)

            def frame():
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
            out[f"{order}_ms"] = round(mean_s * 1e3, 2)
        out["speedup"] = round(out["origin_ms"] / max(out["light_ms"],
                                                      1e-9), 3)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
