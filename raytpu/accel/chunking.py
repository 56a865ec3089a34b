"""Chunked BLAS: split big meshes into SMEM-resident spatial chunks.

The Pallas traversal kernel keeps one BVH fully resident in SMEM
(~768 KB, ``raytpu/ops/traverse_pallas.py``). Armadillo-class meshes
(~330k triangles) exceed that, so the scene build splits them into
Morton-ordered spatial chunks, each with its own threaded BVH — the same
two-level idea as the reference's TLAS-over-BLAS (``src/main.cpp:538-793``)
taken one level further: instance → chunk → triangles. The scene-level
tracer simply iterates (instance, chunk) pairs; a packet that misses a
chunk's root AABB parks after one box test, so the added cost per
non-overlapping chunk is a single consensus step.

Morton ordering makes chunks spatially compact (tight roots → cheap
rejection); chunk triangle budgets are derived from the SMEM budget.
"""

from __future__ import annotations

from typing import List, Tuple

import os

import numpy as np

from raytpu.ops.traverse_pallas import fits_smem

# triangles per chunk: tables carry 18 f32 per triangle (corners +
# shading normals) + 36B per node → ~81B/tri at leaf 12 (nodes ≈ T/4).
# Sized so even node-heavy SAH trees stay under the SMEM budget (model
# cap ~12.1k at leaf 12); fewer chunks directly cut the
# per-(packet,chunk) grid-step floor (~0.5µs each). 9216 was the leaf-4
# value; the leaf-12 re-sweep (tools/r8_c4chunk.sh, same session) is
# monotone up: config4 6144/9216/11264 → 103.2/100.8/98.8 ms. 11264
# ships (the last ~800 tris to the model cap are headroom against
# node-heavy trees).
CHUNK_TRIS = int(os.environ.get("RAYTPU_CHUNK_TRIS", "11264"))

# anyhit-specialized chunks drop the 9 normal planes (~45B/tri incl.
# nodes at leaf 12), so occlusion sweeps fit more triangles per SMEM
# chunk — fewer entries (root parks) and table DMAs per shadow sweep.
CHUNK_TRIS_SHADOW = int(os.environ.get("RAYTPU_CHUNK_TRIS_SHADOW", "13824"))


def morton_codes(centroids: np.ndarray) -> np.ndarray:
    """30-bit Morton codes of centroids normalized to their AABB."""
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    ext = np.maximum(hi - lo, 1e-30)
    q = np.clip(((centroids - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def chunk_order(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, chunk_tris: int = None
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Morton-sort triangles and partition into chunks.

    Returns (order, ranges): ``order`` permutes the mesh's local triangle
    indices into Morton order; ``ranges`` is a list of (start, count) into
    the permuted order, one per chunk.
    """
    if chunk_tris is None:
        chunk_tris = CHUNK_TRIS  # read at call time (tests monkeypatch it)
    t = v0.shape[0]
    cent = v0 + (e1 + e2) / 3.0
    order = np.argsort(morton_codes(cent.astype(np.float64)), kind="stable")
    n_chunks = -(-t // chunk_tris)
    # balance chunk sizes (avoid a tiny tail chunk)
    bounds = np.linspace(0, t, n_chunks + 1).astype(np.int64)
    ranges = [
        (int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(n_chunks)
    ]
    return order.astype(np.int64), ranges


def needs_chunking(num_tris: int, leaf_size: int = 4) -> bool:
    """Heuristic pre-check: would a monolithic BVH exceed SMEM residency?
    Uses a conservative node estimate (real SAH trees make ~0.65·T nodes)."""
    est_nodes = max(1, (2 * num_tris) // leaf_size)
    return not fits_smem(est_nodes, num_tris)
