#!/usr/bin/env python
"""Round-3 TPU baseline: bit-identity gate + config4 stage decomposition.

Run on the real chip (default axon platform):
    python tools/r3_baseline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.bench import bit_identity_check, profile_stages, run_benchmark
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    t0 = time.perf_counter()
    bi = bit_identity_check()
    print(json.dumps({"bit_identity": bi,
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)

    t0 = time.perf_counter()
    r = run_benchmark(preset="config4", frames=6, count=False)
    r.pop("frame_times_ms", None)
    print(json.dumps({"config4": r,
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)

    t0 = time.perf_counter()
    sc = load_preset_scene("config4")
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    st = profile_stages(rr, rr.render_static)
    print(json.dumps({"stage_ms": {k: round(v, 2) for k, v in st.items()},
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
