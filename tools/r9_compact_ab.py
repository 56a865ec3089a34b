#!/usr/bin/env python
"""Round-4 (session 3) exp: sort-once compacted waves on the FUSED path.

The fused bounce loop (integrator._trace_sample_fused) now composes with
``wavefront="compact"``: after the peeled j=0, packets sort live-first
ONCE and the j>=1 iterations run only over the live prefix in
budget-sized waves (liveness is monotone, so one sort suffices — unlike
the XLA body's per-iteration resort). This measures full vs compact on
the fused path, same session, same scene build (so the interleaved
skybox-quad layout change is held constant across legs).

Also prints the absolute frame times — compare against the r9 op trace
(config4 97.68 ms at the committed planar-gather layout) for the
interleaved-layout win.
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
        "COMPACT_AB_PRESETS", "config4,config5,reference,config2"
    ).split(",")
    frames = int(os.environ.get("COMPACT_AB_FRAMES", "24"))

    # correctness first at low res: compact vs full on the fused path
    # must be BIT-identical (per-lane math is permutation-invariant and
    # the waves are disjoint slices of the sorted layout)
    sc = load_preset_scene("config2")
    sc.config = sc.config.replace(width=256, height=192)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    ref = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rr.render_static, wavefront="full"), cam))
    img = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rr.render_static, wavefront="compact"), cam))
    n_diff = int((img != ref).sum())
    print(json.dumps({"check": "compact-vs-full config2 256x192 (fused)",
                      "max_abs_diff": float(np.abs(img - ref).max()),
                      "n_diff": n_diff}), flush=True)
    if n_diff:
        print("BIT-IDENTITY FAIL — aborting timings", flush=True)
        return 1

    for name in presets:
        sc = load_preset_scene(name)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        out = {"preset": name}
        for mode in ("full", "compact"):
            rs = dataclasses.replace(rr.render_static, wavefront=mode)

            def frame():
                return render_frame(rr.device_scene, rr.static, rs, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=frames)
            out[f"wf_{mode}_ms"] = round(mean_s * 1e3, 2)
        out["speedup"] = round(
            out["wf_full_ms"] / max(out["wf_compact_ms"], 1e-9), 3
        )
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
