#!/usr/bin/env python
"""Populate the committed ray-count sidecar (raycounts.json) on TPU for
every BASELINE preset, so driver benches never pay the count program's
compile again (VERDICT r3 item 3). Counts are deterministic per
(preset, shapes, backend) — see raytpu.bench._raycount_key."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from raytpu.bench import (
        _raycount_key,
        _raycount_lookup,
        _raycount_store,
        count_rays_frame,
    )
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    backend = jax.devices()[0].platform
    print("backend:", backend, flush=True)
    depth = int(os.environ.get("RAYTPU_HIGHPOLY_DEPTH", "7"))
    for name in ("config4", "reference", "config1", "config2", "config3",
                 "config5"):
        scene = load_preset_scene(name, highpoly_depth=depth)
        rr = Renderer(scene)
        rr.set_transforms(0.0)
        key = _raycount_key(name, rr.render_static, depth, backend)
        if _raycount_lookup(key) is not None:
            print(json.dumps({"preset": name, "cached": True}), flush=True)
            continue
        t0 = time.perf_counter()
        rays = count_rays_frame(rr.device_scene, rr.static,
                                rr.render_static, rr.camera.basis())
        _raycount_store(key, rays)
        print(json.dumps({"preset": name, "rays": rays,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
