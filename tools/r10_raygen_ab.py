#!/usr/bin/env python
"""Round-4 (session 4) exp: fused Pallas raygen (ops/raygen.py).

A/B: RenderStatic.raygen = "off" (XLA primary_rays_soa + pack_rays) vs
"auto" (the packed-ABI kernel), same process, distinct jit cache keys.
The kernel's jitter differs from the XLA path by FMA-contraction ulps
amplified through the chaotic shader hash (see tests/test_raygen.py), so
cross-LEG frames are NOT comparable bitwise — correctness is covered by
the cross-tier bit-identity gate run first WITH the kernel engaged (all
tiers share one raygen buffer by construction).
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

    from raytpu.bench import bit_identity_check
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print("backend:", jax.devices()[0].platform, flush=True)
    presets = os.environ.get(
        "RAYGEN_AB_PRESETS", "config4,config5,reference,config2"
    ).split(",")
    frames = int(os.environ.get("RAYGEN_AB_FRAMES", "24"))

    # cross-tier identity WITH the kernel engaged (the gate invariant)
    gate = bit_identity_check()
    print(json.dumps({"gate": gate}), flush=True)
    if not gate.get("ok", False):
        print("BIT-IDENTITY FAIL — aborting timings", flush=True)
        return 1

    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {"preset": name}
        for mode in ("off", "auto"):
            rs = dataclasses.replace(rr.render_static, raygen=mode)

            def frame():
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
            out[f"rg_{mode}_ms"] = round(mean_s * 1e3, 2)
        out["speedup"] = round(
            out["rg_off_ms"] / max(out["rg_auto_ms"], 1e-9), 3
        )
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
