#!/usr/bin/env python
"""Round-5: quad-test treelet walk A/B (VERDICT r4 item 4 — the
branching-factor axis).

Same-session legs: for each preset, build TWO renderers — pair format
(the shipped default) and quad format (``perlane.QUAD_DEFAULT``
monkeypatched before attach_bvh; the formats produce different
SceneStatic layouts, so jit cache keys cannot alias) — then:

  1. cross-tier bit-identity gate WITH the quad walk engaged
     (bit_identity_check under the patched default);
  2. one frame per leg, bitwise-compared (expected n_diff=0: both walks
     test supersets of the winning candidates, only exact-tie order can
     differ and no preset has coincident in-chunk geometry);
  3. steady-state frame time per leg.
"""

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

    from raytpu.bench import bit_identity_check
    from raytpu.integrator import render_frame
    from raytpu.ops import perlane
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print("backend:", jax.devices()[0].platform, flush=True)
    presets = os.environ.get(
        "R13_PRESETS", "config4,config5,reference").split(",")
    frames = int(os.environ.get("R13_FRAMES", "24"))

    # gate with the quad walk engaged (bit_identity_check forces
    # traversal='perlane'; the patched default routes its pack to quad)
    perlane.QUAD_DEFAULT = True
    gate = bit_identity_check()
    print(json.dumps({"gate_quad": gate}), flush=True)
    if not gate.get("ok", False):
        print("QUAD BIT-IDENTITY FAIL - aborting", flush=True)
        return 1
    tie = bit_identity_check(
        preset=__import__("raytpu.bench", fromlist=["tie_scene_config"]
                          ).tie_scene_config())
    print(json.dumps({"tie_quad": {k: v for k, v in tie.items()
                                   if k != "preset"}}), flush=True)
    perlane.QUAD_DEFAULT = False

    for name in presets:
        out = {"preset": name}
        imgs = {}
        for fmt in ("pair", "quad"):
            perlane.QUAD_DEFAULT = fmt == "quad"
            try:
                sc = load_preset_scene(name)
                rr = Renderer(sc)
                rr.set_transforms(0.0)
                cam = jnp.asarray(rr.camera.basis())

                def frame():
                    return render_frame(rr.device_scene, rr.static,
                                        rr.render_static, cam)

                imgs[fmt] = np.asarray(frame())
                mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
                out[f"{fmt}_ms"] = round(mean_s * 1e3, 2)
            finally:
                perlane.QUAD_DEFAULT = False
        out["n_diff"] = int((imgs["pair"] != imgs["quad"]).sum())
        out["speedup"] = round(
            out["pair_ms"] / max(out["quad_ms"], 1e-9), 3)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
