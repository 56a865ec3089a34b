"""CPU walk-semantics regression for the per-lane tier (ADVICE r3):
the two-push pair-step queue flow, exit-chain traversal, and pair8 slab
decode were previously exercised only by the manual lockstep sim
(``tools/r4_pack_check.py``) and the TPU-gated bit-identity gate — a
CPU-visible walk regression would not be caught by ``pytest tests/``.

This test imports the sim's ``twolevel_walk`` (the exact kernel algorithm
replayed in numpy on the PACKED tables) and compares every walk variant
(visit-step, pair16, pair8) against the brute single-level reference walk
on the raw chunk arrays — closest (t, u, v, hit) exactly and anyhit
occlusion exactly."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
)
from r4_pack_check import ref_walk, twolevel_walk  # noqa: E402

from raytpu.ops.mega import octant_links  # noqa: E402
from raytpu.ops.perlane import pack_perlane_tables  # noqa: E402
from tests.test_perlane import _random_chunk  # noqa: E402


def _walk_arrays(chunk, pair, qbits):
    flat, lay = pack_perlane_tables([chunk], normals=True, pair=pair,
                                    qbits=qbits)
    pad_nodes, t_pad, box_len, tid_len, rows, qsc_len, pair_bits = lay
    arrays = {
        "box": flat["box"].reshape(1, box_len),
        "tid": flat["tid"].reshape(1, tid_len),
        "qsc": flat["qsc"],
        "planes": flat["planes"],
        "links": flat["links"],
        "mt": flat["mt"],
    }
    return arrays, lay


def _rays(chunk, n, seed):
    rng = np.random.RandomState(seed)
    lo = chunk["aabb_min"].min(axis=0)
    hi = chunk["aabb_max"].max(axis=0)
    ctr = (lo + hi) / 2
    ext = (hi - lo).max() + 1e-3
    o3 = (ctr[:, None] + rng.randn(3, n) * ext * 1.2).astype(np.float32)
    d3 = rng.randn(3, n).astype(np.float32)
    d3 /= np.linalg.norm(d3, axis=0, keepdims=True)
    return o3, d3.astype(np.float32)


@pytest.mark.parametrize(
    "pair,qbits", [(False, 16), (True, 16), (True, 8)],
    ids=["visit", "pair16", "pair8"],
)
def test_packed_walk_matches_reference(pair, qbits):
    chunk = _random_chunk(n_tris=700, seed=3)
    arrays, lay = _walk_arrays(chunk, pair, qbits)
    pad_nodes = lay[0]
    n = chunk["aabb_min"].shape[0]
    succ, skip = octant_links(chunk["aabb_min"], chunk["aabb_max"],
                              chunk["first"], chunk["miss"])
    oct_tab = np.zeros((8, 2 * pad_nodes), np.int64)
    oct_tab[:, :n] = succ
    oct_tab[:, pad_nodes:pad_nodes + n] = skip

    o3, d3 = _rays(chunk, 1024, seed=11)
    for oct_id in (0, 5):
        bt_ref = np.full(o3.shape[1], 1e4, np.float32)
        bt_r, bu_r, bv_r, hit_r = ref_walk(
            chunk, oct_id, o3, d3, bt_ref.copy(), False
        )
        bt_t, bu_t, bv_t, hit_t, _ = twolevel_walk(
            0, arrays, lay, oct_tab, oct_id, o3, d3,
            np.full(o3.shape[1], 1e4, np.float32), False, normals=True,
        )
        np.testing.assert_array_equal(hit_r, hit_t)
        np.testing.assert_array_equal(bt_r, bt_t)
        np.testing.assert_array_equal(bu_r, bu_t)
        np.testing.assert_array_equal(bv_r, bv_t)

        win = np.full(o3.shape[1], 3.0, np.float32)
        occ_r = ref_walk(chunk, oct_id, o3, d3,
                         np.full(o3.shape[1], 1e4, np.float32), True,
                         win=win)
        occ_t = twolevel_walk(0, arrays, lay, oct_tab, oct_id, o3, d3,
                              np.full(o3.shape[1], 1e4, np.float32), True,
                              win=win)
        np.testing.assert_array_equal(occ_r != 0, occ_t != 0)
