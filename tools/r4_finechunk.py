#!/usr/bin/env python
"""Probe: finer chunk partitions for SMALL scenes under the per-lane tier.

Hypothesis: for meshes far below the SMEM budget, splitting into ~CHUNK
sized chunks makes each chunk 1-2 treelets, so the per-lane tier becomes
effectively single-level (per-lane from the entry root on) — divergent
j>=1 sweeps stop paying the top-tree consensus union. The prepass +
per-(entry, block) overheads multiply in exchange.

Sweeps config5/config2 frames over forced chunk sizes. Run on TPU.
"""

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

    import raytpu.accel.chunking as ch
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    orig_needs = ch.needs_chunking
    orig_tris = ch.CHUNK_TRIS

    presets = sys.argv[1:] or ["config5", "config2"]
    for preset in presets:
        out = {}
        for tris in (0, 2048, 1024, 512):
            if tris:
                ch.CHUNK_TRIS = tris
                ch.needs_chunking = lambda t, leaf_size=4: t > tris
            else:
                ch.CHUNK_TRIS = orig_tris
                ch.needs_chunking = orig_needs
            sc = load_preset_scene(preset)
            sc.config = sc.config.replace(traversal="perlane")
            t0 = time.perf_counter()
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            key = f"tris{tris or orig_tris}"
            out[key] = round(mean_s * 1e3, 2)
            out[key + "_entries"] = len(rr.static.traversal_list)
            out[key + "_t"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({preset: out}), flush=True)
        ch.CHUNK_TRIS = orig_tris
        ch.needs_chunking = orig_needs
    return 0


if __name__ == "__main__":
    sys.exit(main())
