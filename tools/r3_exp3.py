#!/usr/bin/env python
"""Round-3 TPU experiment batch 3: paired walks (PAIR_W=2) validation.

1. Bit identity (mega with interleaved walks vs chained pallas).
2. config4 stages (dispatch-amortized, frames=25) + frame.
3. config5 + config1 frames.
4. Optional: rebin_sparse=True config4 frame (measured cost of the
   sort-based re-binner, for the roadmap record).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.bench import bit_identity_check, profile_stages
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    t0 = time.perf_counter()
    bi = bit_identity_check()
    print(json.dumps({"bit_identity": bi,
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)
    if not bi.get("ok", False):
        print(json.dumps({"abort": "bit identity failed"}), flush=True)
        return 1

    results = {}
    for preset in ("config4", "config5", "config1"):
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame():
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=10)
        results[preset] = round(mean_s * 1e3, 2)
        print(json.dumps({preset + "_frame_ms": results[preset],
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)
        if preset == "config4":
            st = profile_stages(rr, rr.render_static)
            print(json.dumps({"stage_ms_config4":
                              {k: round(v, 2) for k, v in st.items()}}),
                  flush=True)

    # rebin cost datapoint (config4, knob on)
    t0 = time.perf_counter()
    sc = load_preset_scene("config4")
    sc.config = sc.config.replace(rebin_sparse=True)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())

    def frame_rb():
        return render_frame(rr.device_scene, rr.static, rr.render_static,
                            cam)

    mean_s, _ = measure_frame(frame_rb, warmup=1, iters=6)
    print(json.dumps({"config4_rebin_frame_ms": round(mean_s * 1e3, 2),
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
