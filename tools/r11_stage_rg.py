#!/usr/bin/env python
"""Round-5 opener (VERDICT r4 items 3 + 5):

1. Gates first (cross-tier bit-identity + tie scene).
2. Stage table of the CURRENT defaults (the 81 ms state was never
   stage-profiled — last table is from 98.9 ms) for config4 / config5 /
   reference.
3. Raygen A/B at the SHIPPED shape (RG_BP=8 — the round-4 A/B was
   measured at the pre-fix bp=16): off vs auto, same process, distinct
   jit cache keys.
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

    from raytpu.bench import bit_identity_check, profile_stages, tie_scene_config
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print("backend:", jax.devices()[0].platform, flush=True)
    assert os.environ.get("RAYTPU_RG_BP", "8") == "8", "shipped shape only"

    gate = bit_identity_check()
    print(json.dumps({"gate": gate}), flush=True)
    if not gate.get("ok", False):
        print("BIT-IDENTITY FAIL - aborting", flush=True)
        return 1
    tie = bit_identity_check(preset=tie_scene_config())
    print(json.dumps({"tie": {k: v for k, v in tie.items() if k != "preset"}}),
          flush=True)

    presets = os.environ.get(
        "R11_PRESETS", "config4,config5,reference").split(",")
    frames = int(os.environ.get("R11_FRAMES", "24"))

    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {"preset": name}
        # raygen A/B at the shipped RG_BP=8 (VERDICT r4 weak #4)
        for mode in ("off", "auto"):
            rs = dataclasses.replace(rr.render_static, raygen=mode)

            def frame():
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
            out[f"rg_{mode}_ms"] = round(mean_s * 1e3, 2)
        out["speedup"] = round(
            out["rg_off_ms"] / max(out["rg_auto_ms"], 1e-9), 3)
        print(json.dumps(out), flush=True)
        # stage table at current defaults (VERDICT r4 item 3)
        stages = profile_stages(rr, rr.render_static, frames=25)
        print(json.dumps({"preset": name, "stage_ms": {
            k: round(v, 2) for k, v in stages.items()}}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
