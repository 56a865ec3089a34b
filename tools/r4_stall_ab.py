#!/usr/bin/env python
"""A/B the treelet-walk queue scheduling (perlane.STALL_SCHED):
per-lane stall vs drain-when-any-full, config4 + config5 frames."""

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

    import raytpu.ops.perlane as pl_mod
    from raytpu.bench import bit_identity_check
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    # drain-when-any-full must render identically (each lane's queue fills
    # and pops in its own walk order under either schedule)
    pl_mod.STALL_SCHED = False
    render_frame.clear_cache()
    gate = bit_identity_check()
    print(json.dumps({"gate_stall_false": gate}), flush=True)
    if not gate.get("ok"):
        return 1
    pl_mod.STALL_SCHED = True
    render_frame.clear_cache()

    for preset in ("config4", "config5"):
        sc = load_preset_scene(preset)
        sc.config = sc.config.replace(traversal="perlane")
        out = {}
        for stall in (True, False):
            pl_mod.STALL_SCHED = stall
            render_frame.clear_cache()
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            t0 = time.perf_counter()
            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            out[f"stall_{stall}"] = round(mean_s * 1e3, 2)
            out[f"stall_{stall}_t"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({preset: out}), flush=True)
        pl_mod.STALL_SCHED = True
    return 0


if __name__ == "__main__":
    sys.exit(main())
