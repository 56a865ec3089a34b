#!/usr/bin/env python
"""Validate the traversal="auto" tier resolution + per-preset tuning on
TPU: bit-identity gate, auto-vs-expected timings, config5 chunk_tris,
config1 tiny-scene alternatives."""

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

    from raytpu.bench import bit_identity_check
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    # the standing invariant, on the new dispatch code
    gate = bit_identity_check()
    print(json.dumps({"gate": gate}), flush=True)
    if not gate.get("ok"):
        return 1

    def time_frame(preset, iters=20, **cfg_over):
        sc = load_preset_scene(preset)
        if cfg_over:
            sc.config = sc.config.replace(**cfg_over)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame(rr=rr, cam=cam):
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        t0 = time.perf_counter()
        mean_s, _ = measure_frame(frame, warmup=1, iters=iters)
        return (round(mean_s * 1e3, 2), round(time.perf_counter() - t0, 1),
                rr.static.auto_tier, len(rr.static.traversal_list))

    # auto now resolves per-scene: config4/reference/config5 -> perlane
    for preset in ("config4", "reference", "config5"):
        ms, t, tier, ent = time_frame(preset)
        print(json.dumps({preset: {"auto_ms": ms, "tier": tier,
                                   "t": t}}), flush=True)

    # config5 candidate: finer chunks under the per-lane tier
    ms, t, tier, ent = time_frame("config5", chunk_tris=2048)
    print(json.dumps({"config5_ct2048": {"auto_ms": ms, "tier": tier,
                                         "entries": ent, "t": t}}),
          flush=True)
    # identity across partitions (low-res full-pipeline check)
    import numpy as np
    sc_a = load_preset_scene("config5")
    sc_a.config = sc_a.config.replace(width=256, height=192)
    sc_b = load_preset_scene("config5")
    sc_b.config = sc_b.config.replace(width=256, height=192,
                                      chunk_tris=2048)
    imgs = []
    for sc in (sc_a, sc_b):
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        imgs.append(np.asarray(render_frame(
            rr.device_scene, rr.static, rr.render_static, cam)))
    nd = int((imgs[0] != imgs[1]).sum())
    print(json.dumps({"config5_ct2048_vs_default_n_diff": nd,
                      "max_abs": float(np.abs(imgs[0] - imgs[1]).max())}),
          flush=True)

    # config1 floor: the 12-tri cube through mega vs xla brute-ish paths
    for trav in ("auto", "xla"):
        ms, t, tier, ent = time_frame("config1", iters=30, traversal=trav)
        print(json.dumps({f"config1_{trav}": {"ms": ms, "t": t,
                                              "tier": tier}}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
