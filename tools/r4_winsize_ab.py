#!/usr/bin/env python
"""Probe MXU sky window sizes on TPU: one (WIN_H, WIN_W) combo per
process (module constants are read at trace time; changing them inside
one process would silently reuse the jit cache — the monkeypatch trap
recorded in tools/README.md).

Usage: r4_winsize_ab.py WIN_H WIN_W preset [preset...]
Prints the wave's bad-packet count under the widened analysis (DEBUG
leg) and pipelined frame times.

Motivation: the compacted fallback's 4-tap gather costs a constant
~8.8 ms/tap on config4 whether it gathers 524k or 1M lanes (tier
halving bought ~nothing), while config5's 131k-lane taps cost 1-2 ms —
the lever is FEWER bad packets, and doubling the window area only adds
~1-2 ms of window DMA per wave (64KB -> 128-256KB per window at HBM
bandwidth).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    win_h, win_w = int(sys.argv[1]), int(sys.argv[2])
    presets = sys.argv[3:] or ["config4"]

    import jax
    import jax.numpy as jnp

    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from raytpu.ops import sky_mxu

    sky_mxu.WIN_H = win_h
    sky_mxu.WIN_W = win_w
    print(json.dumps({"win": [win_h, win_w],
                      "backend": jax.devices()[0].platform}), flush=True)

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    for preset in presets:
        sky_mxu.DEBUG_NBAD = True
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        f = render_frame(rr.device_scene, rr.static, rr.render_static, cam)
        nbad = int(float(f.max()))
        print(json.dumps({f"{preset}_nbad": nbad}), flush=True)
        sky_mxu.DEBUG_NBAD = False
        jax.clear_caches()  # the DEBUG trace must not be reused for timing

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
    return 0


if __name__ == "__main__":
    sys.exit(main())
