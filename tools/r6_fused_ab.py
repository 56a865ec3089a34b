#!/usr/bin/env python
"""Round-4 exp 1: fused Pallas bounce epilogue (ops/epilogue.py) A/B.

Same-session A/B via the RenderStatic.fused static field (proper jit cache
keys — no env monkeypatching): for each preset, a low-res correctness
check (fused vs XLA body, f32 tolerance) then steady-state pipelined frame
timings for fused="off" (the XLA body, wavefront=compact default) vs
fused="auto" (the kernels).
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
        "FUSED_AB_PRESETS", "config4,config5,reference,config2"
    ).split(",")
    frames = int(os.environ.get("FUSED_AB_FRAMES", "24"))

    # correctness first at low res (fast compiles): fused vs XLA body
    sc = load_preset_scene("config2")
    sc.config = sc.config.replace(width=256, height=192)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    ref = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rr.render_static, fused="off"), cam))
    img = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rr.render_static, fused="auto"), cam))
    dmax = float(np.abs(img - ref).max())
    print(json.dumps({"check": "fused-vs-xla config2 256x192",
                      "max_abs_diff": dmax,
                      "n_diff": int((img != ref).sum())}), flush=True)
    if dmax > 1e-4:
        print("CORRECTNESS FAIL — aborting timings", flush=True)
        return 1

    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {"preset": name}
        for mode in ("off", "auto"):
            rs = dataclasses.replace(rr.render_static, fused=mode)

            def frame():
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
            out[f"fused_{mode}_ms"] = round(mean_s * 1e3, 2)
        out["speedup"] = round(
            out["fused_off_ms"] / max(out["fused_auto_ms"], 1e-9), 3
        )
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
