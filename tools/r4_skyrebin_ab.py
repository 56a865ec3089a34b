#!/usr/bin/env python
"""A/B the tile-sorted deferred sky fetch (sky_rebin) on TPU: frame times
with rebin on vs off per preset, plus the traversal bit-identity gate and
a full-res sampler-contract check (rebin vs gather <= 1 u8 LSB)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
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

    gate = bit_identity_check()
    print(json.dumps({"gate": gate}), flush=True)
    if not gate.get("ok"):
        return 1

    presets = sys.argv[1:] or ["config5", "config4", "reference", "config2"]
    for preset in presets:
        out = {}
        for rebin in ("auto", "off"):
            sc = load_preset_scene(preset)
            sc.config = sc.config.replace(sky_rebin=rebin)
            t0 = time.perf_counter()
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            out[rebin] = round(mean_s * 1e3, 2)
            out[rebin + "_t"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({preset: out}), flush=True)
        # sampler contract at frame level: rebin vs gather-forced frames
        if preset == presets[0]:
            imgs = {}
            for mode, over in (("rebin", {"sky_rebin": "on"}),
                               ("gather", {"sky_sampler": "gather"})):
                sc = load_preset_scene(preset)
                sc.config = sc.config.replace(**over)
                rr = Renderer(sc)
                rr.set_transforms(0.0)
                cam = jnp.asarray(rr.camera.basis())
                imgs[mode] = np.asarray(render_frame(
                    rr.device_scene, rr.static, rr.render_static, cam))
            err = float(np.abs(imgs["rebin"] - imgs["gather"]).max())
            print(json.dumps({f"{preset}_rebin_vs_gather_max_abs": err,
                              "ok": err <= 1.5 / 255.0 + 1e-6}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
