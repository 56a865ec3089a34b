#!/usr/bin/env python
"""Round-3f on-chip A/B: 8-bit vs 16-bit pair-format child boxes.

The pair-test treelet walk (tools/r5_pair_ab.py) gathers 7 words per
step at qbits=16 (two box words per axis + the link word); the 8-bit
packed format carries BOTH children's conservative bounds in one word
per axis (loA | hiA<<8 | loB<<16 | hiB<<24 on the 255-step treelet
grid) — 4 gathers per step, at the cost of fatter boxes (the CPU sim
measured ~18% more queue pushes on config5, results exactly equal).

Both legs run in ONE session (the only comparison tunnel variance
allows); the planes shapes differ (3 vs 6 words) so the jit caches
cannot collide. The full traversal bit-identity gate runs first in the
8-bit format (the conservative-quantization argument: wider boxes may
only ADD node visits, never change committed hits).

Run: python tools/r5_qbits_ab.py  (real chip; compile-cached)
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

    # correctness first: the real kernels at qbits=8 vs chained pallas
    perlane.PAIR_QBITS = 8
    t0 = time.perf_counter()
    gate = bit_identity_check()
    print(json.dumps({"gate_qbits8": gate,
                      "wall_s": round(time.perf_counter() - t0)}),
          flush=True)
    if not gate.get("ok"):
        return 1

    def frame_ms(preset, qbits, frames=24):
        perlane.PAIR_QBITS = qbits
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
        for qbits in (16, 8):
            key = f"{preset}/q{qbits}"
            ms, wall = frame_ms(preset, qbits)
            results[key] = round(ms, 2)
            print(json.dumps({"leg": key, "frame_ms": round(ms, 2),
                              "wall_s": round(wall)}), flush=True)

    print(json.dumps({"summary": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
