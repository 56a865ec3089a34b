#!/usr/bin/env python
"""Round-3 TPU experiment batch 4: PAIR_W=1 revert + sub-tile split A/B.

1. Bit identity of divergence="split" (mega) vs chained pallas (off) at
   low res — split must not change any ray's result.
2. config4 frame: divergence off vs "split".
3. config2 frame: off vs split (800×600 4spp mirror — bounce-heavy).
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

    from raytpu.integrator import RenderStatic, render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    # --- 1: split bit identity at low res (config2) ---
    t0 = time.perf_counter()
    sc = load_preset_scene("config2")
    sc.config = sc.config.replace(width=128, height=96)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    rs_off = rr.render_static
    rs_split = dataclasses.replace(rs_off, divergence="split")
    st_pallas = dataclasses.replace(rr.static, traversal="pallas")
    img_ref = np.asarray(
        render_frame(rr.device_scene, st_pallas, rs_off, cam))
    img_split = np.asarray(
        render_frame(rr.device_scene, rr.static, rs_split, cam))
    n_diff = int((img_ref != img_split).sum())
    print(json.dumps({"split_bit_identity": {"ok": n_diff == 0,
                                             "n_diff": n_diff},
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)

    # --- 2/3: frame A/B ---
    for preset in ("config4", "config2"):
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {}
        for mode in ("off", "split"):
            t0 = time.perf_counter()
            rs = dataclasses.replace(rr.render_static, divergence=mode)

            def frame(rs=rs):
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            out[mode] = round(mean_s * 1e3, 2)
            out[mode + "_t"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({preset + "_frame_ms": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
