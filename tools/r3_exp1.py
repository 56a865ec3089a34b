#!/usr/bin/env python
"""Round-3 TPU experiment batch 1.

1. Micro: XLA segment-sort + cumsum cost on (1056, 8192) i32 — feasibility
   of within-block lane re-binning between sweeps.
2. A/B after the STATS_SUPER prepass batching + MXU sky axis-swap/tiling:
   stage_ms + frame times for config4 / config5 / config1 + bit identity.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.devices()[0].platform, flush=True)

    # --- micro: segment sort / cumsum on block-shaped arrays ---
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 9, size=(1056, 8192)).astype(np.int32))
    vals = jnp.broadcast_to(
        jnp.arange(8192, dtype=jnp.int32)[None, :], (1056, 8192)
    )
    plane = jnp.asarray(rng.rand(1056, 8192).astype(np.float32))

    sort1 = jax.jit(lambda k: jnp.sort(k, axis=1))
    sortkv = jax.jit(
        lambda k, v: jax.lax.sort_key_val(k, v, dimension=1)[1]
    )
    csum = jax.jit(lambda k: jnp.cumsum(k, axis=1))
    gath = jax.jit(
        lambda x, i: jnp.take_along_axis(x, i, axis=1)
    )
    micro = {
        "sort_i32_ms": timeit(sort1, keys),
        "sort_key_val_ms": timeit(sortkv, keys, vals),
        "cumsum_ms": timeit(csum, keys),
        "gather_plane_ms": timeit(gath, plane, vals),
    }
    print(json.dumps({"micro": {k: round(v, 3) for k, v in micro.items()}}),
          flush=True)

    # --- A/B: stage profile + frames after prepass/sky changes ---
    from raytpu.bench import bit_identity_check, profile_stages, run_benchmark
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    for preset in ("config4", "config5", "config1"):
        t0 = time.perf_counter()
        r = run_benchmark(preset=preset, frames=6, count=False)
        out = {k: round(v, 2) for k, v in r.items()
               if isinstance(v, (int, float)) and k in
               ("frame_ms", "fps")}
        out["preset"] = preset
        print(json.dumps({"bench": out,
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)

    t0 = time.perf_counter()
    sc = load_preset_scene("config4")
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    st = profile_stages(rr, rr.render_static)
    print(json.dumps({"stage_ms_config4":
                      {k: round(v, 2) for k, v in st.items()},
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)

    t0 = time.perf_counter()
    bi = bit_identity_check()
    print(json.dumps({"bit_identity": bi,
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
