#!/usr/bin/env python
"""Per-stage TPU profiles for the presets on their (new) default tiers,
plus a by-depth frame decomposition for config5 — locates the j>=1 cost
the iteration-count model cannot explain (tools/r4_perlane_sim.py's
config5 j1 sweep counts predict ~5 ms of walk work; the by-depth A/B
charges j1 ~20 ms)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.bench import profile_stages
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    for preset in ("config5", "config4"):
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        t0 = time.perf_counter()
        st = profile_stages(rr, rr.render_static)
        print(json.dumps({f"{preset}_stages": {
            k: round(v, 2) for k, v in st.items()},
            "tier": rr.static.auto_tier,
            "t": round(time.perf_counter() - t0, 1)}), flush=True)

    # config5 frame by max_bounce_count (marginal cost per depth)
    for mb in (0, 1, 2, 3):
        sc = load_preset_scene("config5")
        sc.config = sc.config.replace(max_bounce_count=mb)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame(rr=rr, cam=cam):
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        t0 = time.perf_counter()
        mean_s, _ = measure_frame(frame, warmup=1, iters=20)
        print(json.dumps({f"config5_mb{mb}": round(mean_s * 1e3, 2),
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
