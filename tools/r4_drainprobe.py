#!/usr/bin/env python
"""Probe: share of the per-lane closest walk spent in drain-commit
normal interpolation (36 gathers per commit). Renders config4 with the
real kernel vs a timing-only variant whose ``_interp_bank`` is stubbed
to constants (WRONG normals — never ship; isolates interp cost).
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

    import raytpu.ops.perlane as pl_mod
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    real_interp = pl_mod._interp_bank

    def stub_interp(mt_ref, site, k, qn, u, v):
        return (u, v, u + v)  # no gathers, dependence kept on u/v

    for preset in ("config4",):
        sc = load_preset_scene(preset)
        sc.config = sc.config.replace(traversal="perlane")
        out = {}
        for name, fn in (("real", real_interp), ("stub", stub_interp)):
            pl_mod._interp_bank = fn
            # render_frame's jit cache keys on (static, shapes) which are
            # IDENTICAL across variants — drop it so the stub retraces
            render_frame.clear_cache()
            rr = Renderer(sc)
            rr.set_transforms(0.0)
            cam = jnp.asarray(rr.camera.basis())

            def frame(rr=rr, cam=cam):
                return render_frame(rr.device_scene, rr.static,
                                    rr.render_static, cam)

            t0 = time.perf_counter()
            mean_s, _ = measure_frame(frame, warmup=1, iters=20)
            out[name] = round(mean_s * 1e3, 2)
            out[name + "_t"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({preset: out}), flush=True)
        pl_mod._interp_bank = real_interp
    return 0


if __name__ == "__main__":
    sys.exit(main())
