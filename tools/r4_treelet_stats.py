#!/usr/bin/env python
"""Treelet-partition shape stats for the per-lane tier (CPU, fast).

Prints, per preset and per chunk set (closest / anyhit-specialized): the
number of treelets per chunk, the max (→ static pad for the VMEM bank
arrays), node-span and leaf-count distributions, and top-tree sizes.
Sizes the per-chunk VMEM bank budget before the kernel is built.

Run: JAX_PLATFORMS=cpu python tools/r4_treelet_stats.py [presets...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from tools.r4_perlane_sim import treelet_partition

    presets = sys.argv[1:] or ["config4", "config5", "config2"]
    for preset in presets:
        t0 = time.perf_counter()
        sc = load_preset_scene(preset)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        dev, static = rr.device_scene, rr.static
        print(f"# {preset} built in {time.perf_counter() - t0:.0f}s",
              flush=True)

        def one_set(name, node_ranges, first_a, count_a, miss_a):
            rows = []
            for (ns, nc) in node_ranges:
                first = first_a[ns:ns + nc]
                count = count_a[ns:ns + nc]
                miss = miss_a[ns:ns + nc]
                tid, nt = treelet_partition(first, count, miss)
                spans = np.bincount(tid[tid < nt], minlength=nt)
                leaves = np.bincount(
                    tid[(tid < nt) & (first >= 0)], minlength=nt)
                rows.append({
                    "nodes": int(nc),
                    "treelets": int(nt),
                    "top_nodes": int((tid == nt).sum()),
                    "span_max": int(spans.max()) if nt else 0,
                    "span_mean": round(float(spans.mean()), 1) if nt else 0,
                    "leaves_max": int(leaves.max()) if nt else 0,
                })
            agg = {
                "chunks": len(rows),
                "treelets_max": max((r["treelets"] for r in rows),
                                    default=0),
                "top_nodes_max": max((r["top_nodes"] for r in rows),
                                     default=0),
                "leaves_max": max((r["leaves_max"] for r in rows),
                                  default=0),
                "rows": rows,
            }
            print(json.dumps({f"{preset}.{name}": agg}), flush=True)

        first_a = np.asarray(dev.bvh_tri_first)
        count_a = np.asarray(dev.bvh_tri_count)
        miss_a = np.asarray(dev.bvh_miss)
        one_set("closest", static.mesh_node_ranges, first_a, count_a,
                miss_a)

        if static.mega_shadow_layout is not None:
            # the anyhit chunk set's node arrays live only in the packed
            # tables; recover per-chunk first/count/miss from mega_sh_i32
            spad_n, spad_t, sf32_len, si32_len = static.mega_shadow_layout
            i32 = np.asarray(dev.mega_sh_i32).reshape(-1, si32_len)
            ranges = []
            firsts, counts, misses = [], [], []
            acc = 0
            for ci in range(i32.shape[0]):
                n = int(i32[ci, si32_len - 1])
                ranges.append((acc, n))
                firsts.append(i32[ci, :n])
                counts.append(i32[ci, spad_n:spad_n + n])
                misses.append(i32[ci, 2 * spad_n:2 * spad_n + n])
                acc += n
            one_set("anyhit", ranges, np.concatenate(firsts),
                    np.concatenate(counts), np.concatenate(misses))
    return 0


if __name__ == "__main__":
    sys.exit(main())
