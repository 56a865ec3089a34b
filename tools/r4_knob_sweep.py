#!/usr/bin/env python
"""Sweep one module-constant knob per process on TPU (monkeypatch trap:
module constants are read at trace time, so each combo needs a fresh
process — see tools/README.md).

Usage: r4_knob_sweep.py MODULE CONST VALUE preset [preset...]
e.g.   r4_knob_sweep.py raytpu.ops.perlane QD 2 config4
"""

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    modname, const, value = sys.argv[1], sys.argv[2], int(sys.argv[3])
    presets = sys.argv[4:] or ["config4"]

    import jax
    import jax.numpy as jnp

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mod = importlib.import_module(modname)
    setattr(mod, const, value)
    print(json.dumps({"knob": f"{modname}.{const}={value}",
                      "backend": jax.devices()[0].platform}), flush=True)

    from raytpu.bench import bit_identity_check
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    for preset in presets:
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())

        def frame(rr=rr, cam=cam):
            return render_frame(rr.device_scene, rr.static,
                                rr.render_static, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=20)
        print(json.dumps({preset: round(mean_s * 1e3, 2),
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)

    gate = bit_identity_check()
    print(json.dumps({"gate_ok": gate.get("ok"),
                      "n_diff": gate.get("n_diff")}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
