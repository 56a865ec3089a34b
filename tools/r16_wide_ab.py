#!/usr/bin/env python
"""Round-5: wide-node CONSENSUS threading A/B (mega.widen_octant_links
— VERDICT r4 item 4 applied to the consensus walk itself; the treelet
branching factor was swept separately in r13).

Same-session legs per preset: the widened link tables have identical
shapes to the binary ones, so BOTH legs share one compiled executable —
only the link DATA differs (the tables are jit operands). Gate first
with the wide threading engaged, then per preset: bitwise frame compare
+ steady-state timings.
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
    from raytpu.ops import mega
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print("backend:", jax.devices()[0].platform, flush=True)
    presets = os.environ.get(
        "R16_PRESETS", "config2,config3,config4").split(",")
    frames = int(os.environ.get("R16_FRAMES", "24"))

    mega.MEGA_WIDE = True
    try:
        gate = bit_identity_check()
    finally:
        mega.MEGA_WIDE = False
    print(json.dumps({"gate_wide": gate}), flush=True)
    if not gate.get("ok", False):
        print("WIDE BIT-IDENTITY FAIL - aborting", flush=True)
        return 1

    for name in presets:
        out = {"preset": name}
        imgs = {}
        for mode in ("bin", "wide"):
            mega.MEGA_WIDE = mode == "wide"
            try:
                sc = load_preset_scene(name)
                rr = Renderer(sc)
                rr.set_transforms(0.0)
                cam = jnp.asarray(rr.camera.basis())

                def frame():
                    return render_frame(rr.device_scene, rr.static,
                                        rr.render_static, cam)

                imgs[mode] = np.asarray(frame())
                mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
                out[f"{mode}_ms"] = round(mean_s * 1e3, 2)
            finally:
                mega.MEGA_WIDE = False
        out["n_diff"] = int((imgs["bin"] != imgs["wide"]).sum())
        out["speedup"] = round(out["bin_ms"] / max(out["wide_ms"], 1e-9), 3)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
