#!/usr/bin/env python
"""Round-3 TPU experiment batch 8: compact wavefront A/B.

1. TPU bit identity: wavefront="compact" (mega) vs chained pallas (full).
2. Frame A/B on config4 / config5 / config2 / reference.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    # --- bit identity at low res ---
    t0 = time.perf_counter()
    sc = load_preset_scene("config2")
    sc.config = sc.config.replace(width=256, height=192)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    rs_full = rr.render_static
    rs_comp = dataclasses.replace(rs_full, wavefront="compact")
    st_pallas = dataclasses.replace(rr.static, traversal="pallas")
    a = np.asarray(render_frame(rr.device_scene, st_pallas, rs_full, cam))
    b = np.asarray(render_frame(rr.device_scene, rr.static, rs_comp, cam))
    ok = bool((a == b).all())
    print(json.dumps({"compact_bit_identity":
                      {"ok": ok, "n_diff": int((a != b).sum())},
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)
    if not ok:
        return 1

    for preset in ("config4", "config5", "config2", "reference"):
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {}
        for mode in ("full", "compact"):
            t0 = time.perf_counter()
            rs = dataclasses.replace(rr.render_static, wavefront=mode)

            def frame(rs=rs):
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            out[mode] = round(mean_s * 1e3, 2)
            out[mode + "_t"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({preset: out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
