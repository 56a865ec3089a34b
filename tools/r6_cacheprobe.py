#!/usr/bin/env python
"""Compilation-cache hit probe (VERDICT r3 item 3 / weak #3).

Times the FIRST execution (compile + run) of a small preset frame in this
process and reports the persistent-cache state before/after. Run twice in
two processes: if the cache works under driver-like conditions, the second
process's compile wall time collapses and the entry count is stable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cache_entries(d):
    try:
        return len(os.listdir(d))
    except OSError:
        return -1


def main() -> int:
    from raytpu.utils.cache import enable_compilation_cache

    d = enable_compilation_cache()
    before = cache_entries(d) if d else -1

    import jax
    import jax.numpy as jnp

    from raytpu.integrator import render_frame
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    sc = load_preset_scene("config2")
    sc.config = sc.config.replace(width=256, height=192)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())

    t0 = time.perf_counter()
    render_frame(rr.device_scene, rr.static, rr.render_static,
                 cam).block_until_ready()
    first_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    render_frame(rr.device_scene, rr.static, rr.render_static,
                 cam).block_until_ready()
    second_s = time.perf_counter() - t0

    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "cache_dir": d,
        "entries_before": before,
        "entries_after": cache_entries(d) if d else -1,
        "first_exec_s": round(first_s, 2),
        "steady_exec_s": round(second_s, 4),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
