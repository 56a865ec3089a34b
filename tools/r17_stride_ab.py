#!/usr/bin/env python
"""Round-5: wide-consensus STRIDE sweep (mega.widen_octant_links) —
stride 2 (BVH4, the shipped default) vs 3 (BVH8) vs 4. Links-only,
shapes unchanged: all legs share one compiled executable per preset."""

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
    from raytpu.ops import mega
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print("backend:", jax.devices()[0].platform, flush=True)
    presets = os.environ.get("R17_PRESETS", "config3,config2").split(",")
    strides = [int(s) for s in
               os.environ.get("R17_STRIDES", "2,3,4").split(",")]
    frames = int(os.environ.get("R17_FRAMES", "24"))

    for name in presets:
        out = {"preset": name}
        base_img = None
        for st in strides:
            mega.MEGA_WIDE_STRIDE = st
            try:
                sc = load_preset_scene(name)
                rr = Renderer(sc)
                rr.set_transforms(0.0)
                cam = jnp.asarray(rr.camera.basis())

                def frame():
                    return render_frame(rr.device_scene, rr.static,
                                        rr.render_static, cam)

                img = np.asarray(frame())
                if base_img is None:
                    base_img = img
                    out["n_diff"] = 0
                else:
                    out["n_diff"] = max(out["n_diff"],
                                        int((img != base_img).sum()))
                mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
                out[f"s{st}_ms"] = round(mean_s * 1e3, 2)
            finally:
                mega.MEGA_WIDE_STRIDE = 2
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
