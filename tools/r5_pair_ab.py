#!/usr/bin/env python
"""Round-3f on-chip A/B: pair-test treelet walk vs visit-step walk.

For each preset the frame is measured steady-state (pipelined, one
session for both legs — the only comparison the tunnel variance allows)
with the per-lane tier's treelet walk in BOTH formats:

* ``old``  — visit-step walk (one gather round per VISITED node);
* ``pair`` — entered-node steps testing BOTH children's boxes (leaf
  children enqueue at the parent, failed children never get a step);
  the CPU sim (`tools/r5_pairwalk_sim.py`) measured 1.69-1.82x fewer
  treelet steps with exactly equal results.

Also runs the full traversal bit-identity gate with the pair format
(perlane-vs-pallas on the real kernels) before timing.

Run: python tools/r5_pair_ab.py  (real chip; compile-cached)
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
    import raytpu.ops.perlane as perlane
    from raytpu.bench import bit_identity_check
    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.utils import measure_frame

    print(json.dumps({"backend": jax.devices()[0].platform}), flush=True)
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "needs the real chip"}), flush=True)
        return 1

    # correctness first: the real kernels, pair format, vs chained pallas
    t0 = time.perf_counter()
    gate = bit_identity_check()
    print(json.dumps({"gate_pair": gate,
                      "wall_s": round(time.perf_counter() - t0)}),
          flush=True)
    if not gate.get("ok"):
        return 1

    def frame_ms(preset, pair, frames=24):
        perlane.PAIR_DEFAULT = pair
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
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
    for preset in ("config5", "config4", "reference"):
        for pair in (False, True):
            key = f"{preset}/{'pair' if pair else 'old'}"
            ms, wall = frame_ms(preset, pair)
            results[key] = round(ms, 2)
            print(json.dumps({"leg": key, "frame_ms": round(ms, 2),
                              "wall_s": round(wall)}), flush=True)

    print(json.dumps({"summary": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
