#!/usr/bin/env python
"""config5 chunk_tris re-sweep at leaf_size=7 (one process, same session).

The config5 preset pins chunk_tris=2048 — tuned at leaf_size 4
(tools/r4_finechunk.py: 9216 -> 2048 was -2.5 ms). Leaf 7 changes the
node:tri ratio and walk depth, so the optimum may have moved. Different
chunk counts produce different table shapes (fresh executables), so one
process per sweep is safe AND same-session comparable.

    python tools/r7_c5chunk.py        # C5_CHUNKS=1024,3072,4096 C5_FRAMES=24
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

    from raytpu.bench import run_benchmark
    from raytpu.presets import PRESETS

    frames = int(os.environ.get("C5_FRAMES", "24"))
    chunks = [int(x) for x in
              os.environ.get("C5_CHUNKS", "1024,3072,4096").split(",")]
    preset = os.environ.get("C5_PRESET", "config5")
    for ct in chunks:
        cfg = PRESETS[preset]().replace(chunk_tris=ct)
        t0 = time.perf_counter()
        r = run_benchmark(cfg, frames=frames, count=False)
        print(json.dumps({
            "chunk_tris": ct,
            "frame_ms": round(r["frame_ms"], 3),
            "fps": round(r["fps"], 2),
            "t": round(time.perf_counter() - t0, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
