#!/usr/bin/env python
"""Round-3f on-chip A/B: wavefront="compact" vs "full" at current tiers.

`tools/r5_entry.py` (pre-pair-walk) measured compact WINNING on all three
perlane presets (config4 145.7 -> 144.5, config5 20.2 -> 18.6, reference
81.3 -> 78.1) — the round-3b "measured neutral" verdict predates the
per-lane tier and the round-3e sky/shadow cuts, which shrank exactly the
sweep costs that used to mask the elementwise-width saving. This re-runs
the A/B on top of the pair-test walk and adds config2 (mega tier, spp=4
shallow) to check the flip is safe for the non-perlane presets too.

Run: python tools/r5_compact_ab.py  (real chip; compile-cached)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> int:
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print(json.dumps({"backend": jax.devices()[0].platform}), flush=True)
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "needs the real chip"}), flush=True)
        return 1

    def frame_ms(preset, wavefront, frames=24):
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        sc.config = sc.config.replace(wavefront=wavefront)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        rs = rr.render_static
        cam = jnp.asarray(rr.camera.basis())

        def f():
            return render_frame(rr.device_scene, rr.static, rs, cam)

        mean_s, _ = measure_frame(f, warmup=1, iters=frames)
        if mean_s * 1e3 < 20.0 and frames < 96:
            it2 = min(96, max(2 * frames, int(0.25 / max(mean_s, 1e-4))))
            mean_s, _ = measure_frame(f, warmup=0, iters=it2)
        return mean_s * 1e3, time.perf_counter() - t0

    results = {}
    for preset in ("config5", "config2", "config4", "reference"):
        for wf in ("full", "compact"):
            key = f"{preset}/{wf}"
            ms, wall = frame_ms(preset, wf)
            results[key] = round(ms, 2)
            print(json.dumps({"leg": key, "frame_ms": round(ms, 2),
                              "wall_s": round(wall)}), flush=True)

    print(json.dumps({"summary": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
