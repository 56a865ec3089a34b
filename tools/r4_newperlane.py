#!/usr/bin/env python
"""Validate + measure the packed-bank per-lane kernel (round-4 rev B):
links in ONE word, conservative bf16 box words (4 gathers/step instead
of 9), per-lane stall scheduling.

1. three-way bit-identity gate (pallas vs mega vs perlane, low-res).
2. full-frame bit check perlane vs mega at full config2 resolution.
3. frames: config4 / config5 / config2 / reference under perlane.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.bench import bit_identity_check
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    t0 = time.perf_counter()
    r = bit_identity_check()
    r["t"] = round(time.perf_counter() - t0, 1)
    print(json.dumps({"gate": r}), flush=True)
    if not r.get("ok", False):
        return 1

    # full-res frame equality on config2 (mirror bounces, real skybox)
    sc = load_preset_scene("config2")
    sc.config = sc.config.replace(traversal="perlane")
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    imgs = {}
    for mode in ("mega", "perlane"):
        st = dataclasses.replace(rr.static, traversal=mode)
        imgs[mode] = np.asarray(
            render_frame(rr.device_scene, st, rr.render_static, cam))
    nd = int((imgs["mega"] != imgs["perlane"]).sum())
    print(json.dumps({"fullres_config2_n_diff": nd}), flush=True)

    for preset in ("config4", "config5", "config2", "reference"):
        sc = load_preset_scene(preset)
        sc.config = sc.config.replace(traversal="perlane")
        t0 = time.perf_counter()
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame(rr=rr, cam=cam):
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=24)
        print(json.dumps({
            preset + "_perlane_ms": round(mean_s * 1e3, 2),
            "t": round(time.perf_counter() - t0, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
