#!/usr/bin/env python
"""Round-4 state snapshot: current-default frame timings + stage tables.

One TPU process: bit-identity gate, then for config4 and config5 the
pipelined steady-state frame time and the per-stage decomposition under
whatever the CURRENT defaults are (fused epilogue BP=16, shadow_order=
light, wavefront=compact, traversal=auto→perlane pair walk). The output
tells the round where the remaining milliseconds live.

    python tools/r7_state.py            # on the chip (axon default)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from raytpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.bench import bit_identity_check, profile_stages, run_benchmark
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    if os.environ.get("R7_SELFTEST", "1") != "0":
        t0 = time.perf_counter()
        bi = bit_identity_check()
        print(json.dumps({"bit_identity": bi,
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)

    presets = os.environ.get("R7_PRESETS", "config4,config5").split(",")
    frames = int(os.environ.get("R7_FRAMES", "24"))
    for preset in presets:
        if os.environ.get("R7_FRAMES_SKIP", "0") != "1":
            t0 = time.perf_counter()
            r = run_benchmark(preset=preset, frames=frames, count=False)
            r.pop("frame_times_ms", None)
            print(json.dumps({preset: r,
                              "t": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        if os.environ.get("R7_STAGES", "1") == "0":
            continue
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        st = profile_stages(rr, rr.render_static)
        print(json.dumps(
            {preset + "_stage_ms": {k: round(v, 3) for k, v in st.items()},
             "t": round(time.perf_counter() - t0, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
