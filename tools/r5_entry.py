#!/usr/bin/env python
"""Round-3f entry probe: fresh baselines + stage decomposition.

Re-establishes the on-chip state after the round-3e wins (tiered sky
fallback, quad-packed tables, unconditional shallow shadow sweep):

* steady-state frames for config4 / config5 / reference at defaults;
* ``wavefront="compact"`` A/B at the CURRENT default tiers (it measured
  ~neutral in round-3b when sweeps dominated; the sweep mix has since
  shifted — re-check whether packet compaction now pays);
* per-stage profile (prepass / closest / shadow / bounce / sky) for
  config4 and config5 on the tiers the frame actually dispatches to.

Run: python tools/r5_entry.py  (real chip; ~30-40 min, compile-cached)
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

    def frame_ms(preset, frames=24, **cfg):
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        if cfg:
            sc.config = sc.config.replace(**cfg)
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
        return mean_s * 1e3, time.perf_counter() - t0, rr, rs

    results = {}
    for preset in ("config4", "config5", "reference"):
        ms, wall, rr, rs = frame_ms(preset)
        results[preset] = round(ms, 1)
        print(json.dumps({"leg": f"{preset}/default", "frame_ms": round(ms, 2),
                          "wall_s": round(wall)}), flush=True)
        ms_c, wall, _, _ = frame_ms(preset, wavefront="compact")
        results[f"{preset}_compact"] = round(ms_c, 1)
        print(json.dumps({"leg": f"{preset}/compact", "frame_ms": round(ms_c, 2),
                          "wall_s": round(wall)}), flush=True)

    # stage profiles on the default tiers
    from raytpu.bench import profile_stages

    for preset in ("config4", "config5"):
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        try:
            st = profile_stages(rr, rr.render_static)
            print(json.dumps({"stages": preset,
                              **{k: round(v, 2) for k, v in st.items()}}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"stages": preset, "error": repr(e)}), flush=True)

    print(json.dumps({"summary": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
