"""Two-level per-lane traversal tier: consensus top tree + treelet walks.

The persistent megakernel's consensus walk (``ops/mega.py``) shares ONE
node pointer across a 4096-lane group, so it visits the UNION of the
lanes' per-ray BVH paths — measured at ~5.6x the per-ray ideal and the
source of its ~160-190 Mrays/s ceiling (docs/roadmap.md item 13). This
module replaces the walk below a cut line with PER-LANE traversal:

* each chunk's BVH is partitioned into **treelets** of <=127 nodes
  (:func:`treelet_partition`); node/link/triangle tables of the resident
  chunk's treelets live in VMEM as 128-entry *banks* that
  ``jnp.take_along_axis`` (Mosaic → ``tpu.dynamic_gather``) can index
  per lane in one op (measured exact + ~300 ns/iteration at 4x(8,128)
  interleaved lanes, ``tools/r4_mech_probe.py``);
* the **top tree** (nodes above the cut, ~1-2% of iterations) is walked
  consensus-style against the SMEM box planes exactly as before; a
  treelet root is a *site*: when any lane's box test passes, every lane
  walks the treelet with ITS OWN pointer — iterations cost
  max-per-lane path length instead of the union (measured 2.1-2.4x
  shorter on the real config4 j0 sweeps, ``tools/r4_perlane_sim.py``);
* leaf intersections are **deferred**: a lane reaching a leaf pushes the
  node id onto a 4-deep register queue and walks on; queues drain
  through node-indexed Moller-Trumbore tables (4 tri slots per leaf
  node id — one gather per operand) when its own queue fills (lanes
  with full queues STALL while others walk on; the treelet drains when
  no lane can advance) and at treelet exit. Deferral is bit-exact: a
  test the eager walk would have performed with a tighter ``best_t``
  can only reject candidates that lose anyway (strict ``t < best_t``
  ordering over the same per-lane DFS test sequence).

The interior step is gather-bound (~8 ns per 128-entry bank lookup), so
the tables are packed to minimize lookups per step — 4 instead of 9:

* **links**: succ | skip<<7 | cnt<<14 in ONE i32 word (ids <= 127 by
  NODE_CAP, counts <= LEAF_UNROLL) — 1 gather + 3 cheap unpack ops;
* **box planes**: per axis ONE i32 word = q_hi<<16 | q_lo, 16-bit
  quantized on the TREELET ROOT box grid (per-site scalars (origin,
  scale) dequantize as ``origin + q * scale``; q_lo floor-rounded,
  q_hi ceil-rounded, host-verified conservative under both mul+add and
  fma orderings). The widened slab can only ADD node visits / leaf
  tests, never lose a true hit, and the slack is ~2^-16 of the treelet
  extent — measured-negligible extra visits. (A bf16-packed variant was
  measured FIRST and REJECTED: bf16's absolute ulp at armadillo-scale
  coordinates widened leaf-size boxes by ~60% linear, inflating visits
  enough to regress config4 163.7 -> 168.2 ms despite 4-vs-9 gathers.)
  Leaf Moller-Trumbore corners stay f32, so accepted hits are
  bit-identical; the only divergence class a widened box can introduce
  is a leaf test the exact slab would have culled whose triangle still
  intersects within float rounding of the slab arithmetic — not
  observed on any preset (TPU bit-identity gate).

Semantics match the chained reference kernels (``ops/traverse_pallas.py``)
with the same caveats as ``ops/mega.py`` (tie order on coincident
geometry) plus one of its own: a lane only tests triangles of leaves its
OWN box path reaches, while consensus walks test every lane against every
union-visited leaf — for a triangle exactly on a node boundary the two
can disagree within float rounding of slab-vs-MT arithmetic. No preset
geometry does; the TPU bit-identity gate (``raytpu.bench``) enforces it.

Replaces per-thread ``traceRayEXT`` scheduling (``src/shader.rgen:84-87``)
one level deeper than the megakernel: the per-lane pointer IS the
per-thread traversal stack the RT hardware gives each GPU thread.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.ops.intersect import LEAF_UNROLL
from raytpu.ops.mega import (
    BLOCK_PACKETS,
    OCTANTS,
    _align,
    _inv,
    _read_w2o,
    _scan_bitmask,
    _slab_tab,
    _xform_rays,
    chunk_block_hits,
    octant_links,
)
from raytpu.ops.traverse_pallas import (
    K_LANE,
    K_SUB,
    ST_INST,
    ST_MAT,
    ST_NX,
    ST_NY,
    ST_NZ,
    ST_T,
    ST_U,
    ST_V,
    ST_VALID,
)

# treelet size cap: local node ids fit one 128-entry gather bank with
# id 127 reserved as the walk-done sentinel (links at 127 self-loop)
NODE_CAP = 127
DONE = 127

# deferred-leaf register queue depth per lane. Env-tunable; deeper
# queues mean fewer drain phases / fewer full-queue stalls per treelet
# at the price of QD extra loop-carried vregs per walk slice — the
# register-spill hazard that killed the first per-lane kernel cut
# (docs/roadmap.md round-3b lesson a) bounds it. Round-5 sweep (one
# process per leg, tools/r14_qd_leg.py): config4 78.8 / 76.8 / 76.6 /
# 78.1 ms at QD 4 / 6 / 8 / 12 — monotone to 8, spills past it; 8 also
# wins reference (40.4 -> 39.5). Default 8.
QD = int(os.environ.get("RAYTPU_QD", "8"))

# ---- pair-test walk (the default treelet walk since round 3f) ----
# The original treelet step costs one gather round per VISITED node
# (test own box, follow succ/skip). The pair-test step instead sits at an
# ENTERED node and gathers BOTH children's boxes (2 words/axis, packed by
# the PARENT's id so the dependent id→gather→slab→select chain stays one
# gather deep) plus one link word: hit LEAF children are enqueued directly
# at the parent step and failed children never get a step, so leaves and
# box-fails stop consuming walk iterations. Exit chains are threaded PAST
# leaf siblings at pack time (they were enqueued at the parent). Step
# counts on the real sweeps (tools/r5_pairwalk_sim.py): 1.69-1.9× fewer
# treelet steps, results exactly equal. On-chip frames
# (tools/r5_pair_ab.py, one session per pair of legs): config4
# 145.6 → 137.6 ms, config5 20.1 → 18.9, reference 81.1 → 75.4 — the
# step-count cut lands ~6% at frame level because each pair step gathers
# 7 words vs the visit-step's 4 (the walk is partly gather-throughput-
# bound, not purely latency-bound).
#
# Bit-identity argument: a child's box is tested at the parent step with
# the THEN-current best_t — never smaller than at the child's own later
# step in the old order — so the entered/enqueued sets are supersets of
# exact-walk requirements and subsets of what conservative slabs allow;
# every extra Möller–Trumbore test sits outside the [tmin, best_t) window
# by the box-containment argument and cannot win. Only tie ORDER among
# exactly-coincident triangles can differ (the documented mega caveat).
#
# Link word: near | far<<7 | pexit<<14 | int_near<<21 | int_far<<22 |
# cnt<<23 (4 bits) | swap<<27. near/far are octant-ordered child ids; pexit is the
# leaf-skipping exit target; int_* flag interior children; cnt is the
# node's OWN triangle count (drains gather it from the queued leaf's own
# word); swap says the octant-near child is the build-order SECOND child
# (the planes banks are octant-independent in build order — 8× fewer
# words than per-octant boxes — and the step swaps the two slab results).
PAIR_DEFAULT = os.environ.get("RAYTPU_PERLANE_PAIR", "1") != "0"
# child-box quantization of the pair format: 16 (two words/axis) or 8
# (both children in one word/axis: 4 gathers per step instead of 7)
PAIR_QBITS = int(os.environ.get("RAYTPU_PERLANE_QBITS", "16"))

# ---- quad-test walk (round-5 branching-factor probe, VERDICT r4 #4) ----
# The pair step tests an entered node's TWO children; the quad step tests
# FOUR (the node's grandchildren, with leaf children passed through), so
# only alternate binary levels are ever entered: ~half the pair walk's
# steps at ~2x the gathers per step (12 box + 2 link words vs 6 + 1) —
# the branching-factor axis of the wide-BVH trade, swept on-chip.
#
# Layout (pair_bits token QUAD_BITS):
# * planes (C, t_pad, 12, 8, 128): axis a, BUILD-order slot s at word
#   4a+s — slot 0/1 = left child's expansion (its two children if it is
#   interior, else itself + invalid), slot 2/3 = right child's. 16-bit
#   q_hi<<16|q_lo words on the treelet grid (quantize_axis), absent
#   slots FULL_SLAB (never consumed: masked by the valid bits).
# * links (C*8, t_pad, 2, 8, 128): TWO words per (octant, node).
#   word1: byte j = octant-ordered child local id (7b) | interior<<7.
#   word2: pexit(0-6) | valid(7-10, per ordered position) |
#   slotmap(11-18, 2b per ordered position = BUILD slot index) |
#   cnt_self(19-22, the node's OWN triangle count — drains gather it
#   from the queued child's word2).
# * queue entries are PARENT-id | hit-leaf-mask<<7 (one push per step
#   regardless of how many leaf children hit — queue pressure stays at
#   the visit-walk level); drains unpack word1 and run the MT rows of
#   each masked child.
# Bit-identity: same argument as the pair walk (children tested at the
# grandparent step with a then-current best_t that is never tighter than
# at their own later step — the entered/enqueued sets are supersets of
# the exact walk's, and extra Möller–Trumbore tests cannot win), so only
# tie ORDER among exactly-coincident triangles can differ.
QUAD_DEFAULT = os.environ.get("RAYTPU_PERLANE_QUAD", "0") == "1"
QUAD_BITS = 416   # token: 4 children x 16-bit quantization
# q_lo=65535, q_hi=0: an INVERTED interval. The kernel slab test min/maxes
# the decoded plane pair, so this normalizes to the FULL treelet slab (an
# always-hit word, NOT a miss) — it is safe as the leaf slot-B / padding
# fill only because leaf link words guard slot B with int_f=1 / far=DONE
# (see the pack docstring), never because the slab itself rejects.
FULL_SLAB_WORD = np.int32(0x0000FFFF)

# packets per per-lane walk: 4 slices of (8,128) interleave the dependent
# gather chain (measured: 4 slices cost the same per iteration as 1).
# Env-tunable for re-sweeps when neighboring knobs move (r3e sweep: 2 and
# 8 both lost at the then-defaults; re-checked at QD=8 in round 5).
W_PK = int(os.environ.get("RAYTPU_W_PK", "4"))

# scheduling of full leaf queues inside a treelet walk (A/B knob):
# True  — a lane with a full queue STALLS while others walk on; drains
#         happen when no lane can advance (1 reduction per step)
# False — the walk pauses and drains when ANY lane's queue fills
#         (2 reductions per step, lanes never idle-stall)
STALL_SCHED = os.environ.get("RAYTPU_STALL_SCHED", "1") != "0"

# compact MT-table rows: LEAF_UNROLL slots x 9 tri coords (+ as many
# normal coords for the closest set), padded to a sublane multiple
# (leaf 4: 36 tri → 80/40 rows; leaf 7: 63 tri → 128/64 rows)
ROWS_TRI = LEAF_UNROLL * 9
ROWS_CLOSEST = -(-2 * ROWS_TRI // 8) * 8
ROWS_ANYHIT = -(-ROWS_TRI // 8) * 8
OFF_NRM_ROW = ROWS_TRI


def treelet_partition(
    first: np.ndarray, count: np.ndarray, miss: np.ndarray,
    node_cap: int = NODE_CAP,
) -> Tuple[np.ndarray, int]:
    """Greedy DFS cut of one flat skip-link BVH into <=node_cap subtrees.

    Build-order skip links mean the subtree of node ``i`` spans
    ``[i, miss[i])`` in the DFS layout. Returns ``(tid, n_treelets)``:
    ``tid[i]`` = treelet id, or ``n_treelets`` for top-tree nodes. Octant
    rethreading (:func:`raytpu.ops.mega.octant_links`) permutes only
    WITHIN subtrees, so the partition is octant-independent.
    """
    n = first.shape[0]
    span = miss - np.arange(n)
    tid = np.full(n, -1, np.int64)
    nt = 0
    i = 0
    while i < n:
        if span[i] <= node_cap:
            tid[i : miss[i]] = nt
            nt += 1
            i = miss[i]
        else:
            i += 1            # too big: top node, descend
    top = tid < 0
    tid[top] = nt
    # every leaf fits a treelet by itself, so the top tree has no leaves
    assert not (top & (first >= 0)).any(), "leaf in top tree"
    return tid, nt


def _dequant_both(q: np.ndarray, org: np.float32, scale: np.float32):
    """The two f32 roundings the kernel's ``org + q*scale`` may compile
    to: separate mul+add, and fused multiply-add (q*scale is exact in
    f64 for 16x24-bit operands, so f64-accumulate-then-round == fma)."""
    qf = q.astype(np.float32)
    mul_add = (qf * np.float32(scale)).astype(np.float32) + np.float32(org)
    fma = (
        q.astype(np.float64) * np.float64(scale) + np.float64(org)
    ).astype(np.float32)
    return mul_add.astype(np.float32), fma


def quantize_axis(
    lo: np.ndarray, hi: np.ndarray, org: float, ext: float,
    levels: int = 65535,
) -> Tuple[np.ndarray, np.ndarray, np.float32]:
    """Conservative ``levels``-step quantization of node slab planes onto
    the treelet-root grid ``org + q * scale``: dequantized lo never
    exceeds the true lo, dequantized hi never undercuts the true hi,
    under BOTH kernel rounding orders. Slack is <= ~2 grid steps =
    2/levels of the treelet extent (16-bit default; the packed pair
    format uses 8-bit, levels=255)."""
    org = np.float32(org)
    scale = np.float32(np.float32(ext) / np.float32(levels))
    if not np.isfinite(scale) or scale <= 0.0:
        scale = np.float32(0.0)
        n = lo.shape[0]
        return (np.zeros(n, np.int64), np.zeros(n, np.int64), scale)
    inv = 1.0 / np.float64(scale)
    q_lo = np.clip(np.floor((lo.astype(np.float64) - np.float64(org))
                            * inv), 0, levels).astype(np.int64)
    q_hi = np.clip(np.ceil((hi.astype(np.float64) - np.float64(org))
                           * inv), 0, levels).astype(np.int64)
    for _ in range(4):  # fix-up: conservatism under both roundings
        a, b = _dequant_both(q_lo, org, scale)
        bad = (a > lo) | (b > lo)
        if not bad.any():
            break
        q_lo = np.where(bad & (q_lo > 0), q_lo - 1, q_lo)
    a, b = _dequant_both(q_lo, org, scale)
    assert ((a <= lo) & (b <= lo)).all(), "lo quantization not conservative"
    for _ in range(8):
        a, b = _dequant_both(q_hi, org, scale)
        bad = (a < hi) | (b < hi)
        if not bad.any():
            break
        if (bad & (q_hi >= levels)).any():
            # grid top cannot reach hi (rounding): stretch the grid a notch
            scale = np.float32(np.nextafter(scale, np.float32(np.inf)))
            continue
        q_hi = np.where(bad, q_hi + 1, q_hi)
    a, b = _dequant_both(q_hi, org, scale)
    assert ((a >= hi) & (b >= hi)).all(), "hi quantization not conservative"
    # scale may have stretched: re-verify lo side (dequant only grew for
    # positive q... not guaranteed for negative org — just re-fix)
    for _ in range(4):
        a, b = _dequant_both(q_lo, org, scale)
        bad = (a > lo) | (b > lo)
        if not bad.any():
            break
        q_lo = np.where(bad & (q_lo > 0), q_lo - 1, q_lo)
    a, b = _dequant_both(q_lo, org, scale)
    assert ((a <= lo) & (b <= lo)).all()
    return q_lo, q_hi, scale


def pack_link_word(
    succ: np.ndarray, skip: np.ndarray, cnt: np.ndarray
) -> np.ndarray:
    """One i32 link word: succ | skip<<7 | cnt<<14."""
    return (
        succ.astype(np.int32)
        | (skip.astype(np.int32) << 7)
        | (cnt.astype(np.int32) << 14)
    )


def _fill_quad_treelet(planes, links, ci, t, rt, g, wlist, c, leaf, par,
                       droot, succ):
    """Quad-format planes + link words for ONE treelet (see the
    QUAD_DEFAULT note for the layout). ``g``: global ids of the
    treelet's members in ascending DFS order (= local-id order)."""
    span = g.size
    lf = leaf[g]                       # local leaf flags
    mloc = c["miss"][g] - rt           # local skip target (may exit)
    lidx = np.arange(span)
    lc = lidx + 1                      # local left child (interiors)
    rc = np.where(~lf, mloc[np.minimum(lc, span - 1)], 0)
    dl = droot[g]
    entered = (~lf & (dl % 2 == 0)) | (lf & (lidx == 0))
    ex = lidx[entered]
    if ex.size == 0:
        return
    if span == 1:
        # single-leaf treelet root: one slot = itself
        slots = np.zeros((1, 4), np.int64)
        svalid = np.asarray([[1, 0, 0, 0]], np.int64)
        iA = iB = np.zeros(1, bool)
    else:
        A = lc[ex]
        B = rc[ex]
        iA = ~lf[A]
        iB = ~lf[B]
        s0 = np.where(iA, A + 1, A)
        s1 = np.where(iA, mloc[np.minimum(A + 1, span - 1)], 0)
        s2 = np.where(iB, B + 1, B)
        s3 = np.where(iB, mloc[np.minimum(B + 1, span - 1)], 0)
        slots = np.stack([s0, s1, s2, s3], axis=1)
        svalid = np.stack(
            [np.ones(ex.size, np.int64), iA.astype(np.int64),
             np.ones(ex.size, np.int64), iB.astype(np.int64)], axis=1)
    vmask = svalid.astype(bool)
    assert (slots[vmask] >= 0).all() and (slots[vmask] < span).all()
    for a in range(3):
        w = wlist[a]
        for s in range(4):
            val = vmask[:, s]
            if val.any():
                planes[ci, t, 4 * a + s, :, ex[val]] = (
                    w[slots[val, s]][:, None])
    cnt_all = np.where(lf, np.maximum(c["count"][g], 0), 0).astype(
        np.int64)
    assert cnt_all.max(initial=0) <= 15, "quad cnt field overflow"
    sl_leaf = vmask & lf[np.minimum(slots, span - 1)]
    sl_int = (vmask & ~sl_leaf).astype(np.int64)
    w1_default = int(DONE | (DONE << 8) | (DONE << 16) | (DONE << 24))
    for o in range(OCTANTS):
        so = succ[o][g].astype(np.int64) - rt   # local near child
        if span == 1:
            perm = np.asarray([[0, 1, 2, 3]], np.int64)
        else:
            swap_top = so[ex] == rc[ex]
            swapA = np.where(
                iA, so[np.minimum(A, span - 1)]
                == mloc[np.minimum(A + 1, span - 1)], False)
            swapB = np.where(
                iB, so[np.minimum(B, span - 1)]
                == mloc[np.minimum(B + 1, span - 1)], False)
            pa0 = np.where(swapA, 1, 0)
            pa1 = np.where(swapA, 0, 1)
            pb0 = np.where(swapB, 3, 2)
            pb1 = np.where(swapB, 2, 3)
            perm = np.where(
                swap_top[:, None],
                np.stack([pb0, pb1, pa0, pa1], axis=1),
                np.stack([pa0, pa1, pb0, pb1], axis=1),
            )
        take = np.take_along_axis
        oid = take(slots, perm, axis=1)         # octant-ordered child ids
        oval = take(svalid, perm, axis=1)
        oint = take(sl_int, perm, axis=1)
        w1 = np.zeros(ex.size, np.int64)
        for j in range(4):
            idj = np.where(oval[:, j] == 1, oid[:, j], DONE)
            w1 |= (idj | (oint[:, j] << 7)) << (8 * j)
        # pexit: next octant-ordered INTERIOR sibling within the parent-
        # entered node, else that parent's pexit; treelet root -> DONE.
        parent_e = np.full(span, -1, np.int64)
        nxt = np.full(span, -1, np.int64)
        for row in range(ex.size):
            ints = [j for j in range(4) if oint[row, j] == 1]
            for a_i, j in enumerate(ints):
                ch = oid[row, j]
                parent_e[ch] = ex[row]
                nxt[ch] = (oid[row, ints[a_i + 1]]
                           if a_i + 1 < len(ints) else -1)
        pex = np.full(span, DONE, np.int64)
        for x in ex:                             # ascending: parents first
            if parent_e[x] >= 0:
                pex[x] = nxt[x] if nxt[x] >= 0 else pex[parent_e[x]]
        vbits = ((oval[:, 0]) | (oval[:, 1] << 1) | (oval[:, 2] << 2)
                 | (oval[:, 3] << 3))
        smap = (perm[:, 0] | (perm[:, 1] << 2) | (perm[:, 2] << 4)
                | (perm[:, 3] << 6))
        w1_all = np.full(span, w1_default, np.int64)
        w1_all[ex] = w1
        w2_all = np.full(span, DONE, np.int64) | (cnt_all << 19)
        w2_all[ex] = (pex[ex] | (vbits << 7) | (smap << 11)
                      | (cnt_all[ex] << 19))
        links[ci, o, t, 0, :, :span] = (
            (w1_all & 0xFFFFFFFF).astype(np.uint32).view(np.int32)[None, :]
        )
        links[ci, o, t, 1, :, :span] = w2_all.astype(np.int32)[None, :]


def pack_perlane_tables(
    chunks, normals: bool = True, pair: bool = False, qbits: int = 16,
    quad: bool = False,
) -> Tuple[Dict[str, np.ndarray], Tuple[int, int, int, int, int, int, int]]:
    """Pack per-chunk two-level tables for the per-lane sweeps.

    ``chunks``: the same per-chunk dicts ``ops/mega.py`` packs (aabb_min/
    aabb_max (n,3), first/count/miss (n,), v0/e1/e2 (t,3), n_soa (9,t)).

    Returns ``(arrays, layout)`` with ``layout = (pad_nodes, t_pad,
    box_len, tid_len, rows_mt)`` and arrays:

    * ``box``  (C, box_len) f32 — SMEM box planes (6 x pad_nodes), the
      top walk's slab tables (same layout as the mega f32 table's box
      prefix, minus the tri/normal planes it never reads);
    * ``tid``  (C, tid_len) i32 — per-node site map: treelet id at each
      treelet ROOT, -1 elsewhere; last slot = node count (walk end);
    * ``planes`` (C, t_pad, 3, 8, 128) i32 — per-treelet gather banks of
      PACKED box words by local node id (row-replicated across sublanes):
      axis word = q_hi<<16 | q_lo, 16-bit conservative quantization on
      the treelet-root grid (:func:`quantize_axis`);
    * ``qsc`` (C, qsc_len) f32 — per-site dequantization scalars, laid
      out ``site*8 + 2*axis`` = grid origin, ``+1`` = grid scale (SMEM);
    * ``links`` (C*8, t_pad, 8, 128) i32 — per (chunk, octant): ONE
      packed word succ | skip<<7 | cnt<<14 (localized, ``DONE`` on
      exit; :func:`pack_link_word`);
    * ``mt``   (C, t_pad, rows_mt, 128) f32 — compact node-indexed
      Moller-Trumbore rows: slot k, coord c at row ``k*9+c`` (v0/e1/e2
      xyz), then normal rows at ``OFF_NRM_ROW + k*9 + c`` (closest set).

    ``pair=True`` packs the pair-test format instead (see the PAIR_DEFAULT
    note above). At ``qbits=16``, ``planes`` becomes (C, t_pad, 6, 8, 128)
    — axis slot ``2a`` = build-order FIRST child's word, ``2a+1`` =
    SECOND child's. At ``qbits=8`` it stays (C, t_pad, 3, 8, 128) with
    BOTH children's 8-bit bounds in one word per axis
    (``loA | hiA<<8 | loB<<16 | hiB<<24``, conservative on a 255-step
    treelet grid): a pair step costs 4 gathers instead of 7. ``links``
    carries the pair word ``near | far<<7 | pexit<<14 | int_n<<21 |
    int_f<<22 | cnt<<23 | swap<<26`` per octant; leaf nodes (stepped only
    as single-leaf treelet roots) encode ``near = self, int_f = 1,
    far = DONE`` so the step pushes the leaf once and exits (an
    "always-miss" B slab cannot exist — the slab test min/maxes the
    plane pair, so an inverted interval normalizes to a full one). The
    kernels dispatch on layout[6] (``pair_bits``: 0 / 16 / 8).
    """
    assert qbits in (8, 16)
    assert not (pair and quad)
    pad_nodes = max(c["aabb_min"].shape[0] for c in chunks)
    box_len = _align(6 * pad_nodes)
    tid_len = _align(pad_nodes + 1)
    rows_mt = ROWS_CLOSEST if normals else ROWS_ANYHIT

    parts = []
    t_pad = 1
    for c in chunks:
        tid, nt = treelet_partition(c["first"], c["count"], c["miss"])
        parts.append((tid, nt))
        t_pad = max(t_pad, nt)

    cN = len(chunks)
    qsc_len = _align(t_pad * 8)
    box = np.zeros((cN, box_len), np.float32)
    tidm = np.full((cN, tid_len), -1, np.int32)
    qsc = np.zeros((cN, qsc_len), np.float32)
    if quad:
        pw = 12
    else:
        pw = 6 if (pair and qbits == 16) else 3
    planes = np.full((cN, t_pad, pw, 8, 128),
                     int(FULL_SLAB_WORD) if (quad or (pair and qbits == 16))
                     else 0,
                     np.int32)
    # default link word: self-loop at DONE, never pushes, cnt=0
    default_word = (
        int(DONE | (DONE << 7) | (DONE << 14)) if pair
        else int(pack_link_word(np.int32(DONE), np.int32(DONE),
                                np.int32(0)))
    )
    if quad:
        # word1: every position id=DONE int=0; word2: pexit=DONE,
        # valid=0, slotmap=0, cnt=0
        links = np.zeros((cN, OCTANTS, t_pad, 2, 8, 128), np.int32)
        links[:, :, :, 0] = int(DONE | (DONE << 8) | (DONE << 16)
                                | (DONE << 24))
        links[:, :, :, 1] = DONE
    else:
        links = np.full((cN, OCTANTS, t_pad, 8, 128), default_word,
                        np.int32)
    mt = np.zeros((cN, t_pad, rows_mt, 128), np.float32)

    for ci, c in enumerate(chunks):
        n = c["aabb_min"].shape[0]
        tid, nt = parts[ci]
        ids = np.arange(n)
        # treelet roots: first node of each DFS-contiguous treelet span
        root = np.zeros(nt, np.int64)
        in_t = tid < nt
        first_of = np.ones(n, bool)
        first_of[1:] = tid[1:] != tid[:-1]
        r_mask = in_t & first_of
        root[tid[r_mask]] = ids[r_mask]

        for a in range(3):
            box[ci, a * pad_nodes : a * pad_nodes + n] = c["aabb_min"][:, a]
            box[ci, (3 + a) * pad_nodes : (3 + a) * pad_nodes + n] = (
                c["aabb_max"][:, a]
            )
        site = np.full(n, -1, np.int64)
        site[root] = np.arange(nt)
        tidm[ci, :n] = site
        tidm[ci, tid_len - 1] = n

        tl = tid[in_t]
        ll = ids[in_t] - root[tl]
        assert ll.max(initial=0) <= NODE_CAP - 1
        leaf = c["first"] >= 0
        if quad:
            # chunk-global structures the quad fill needs: octant near
            # children, parent pointers, depth-within-treelet (DFS order
            # guarantees parent < child, so one forward pass suffices)
            succ_q, _ = octant_links(
                c["aabb_min"], c["aabb_max"], c["first"], c["miss"]
            )
            par_q = np.full(n, -1, np.int64)
            ii_q = ids[~leaf]
            if ii_q.size:
                par_q[ii_q + 1] = ii_q
                par_q[c["miss"][ii_q + 1]] = ii_q
            droot_q = np.zeros(n, np.int64)
            for i in range(n):
                p_ = par_q[i]
                if p_ >= 0 and tid[p_] == tid[i]:
                    droot_q[i] = droot_q[p_] + 1
        for t in range(nt):
            sel = tid == t
            rt = root[t]
            llt = ids[sel] - rt
            span = int(llt.size)
            g = ids[sel]
            ws_q = []
            for a in range(3):
                org = float(c["aabb_min"][rt, a])
                ext = float(
                    np.float64(c["aabb_max"][rt, a]) - np.float64(org)
                )
                q_lo, q_hi, scale = quantize_axis(
                    c["aabb_min"][sel, a], c["aabb_max"][sel, a], org, ext,
                    levels=255 if (pair and qbits == 8) else 65535,
                )
                w = ((q_hi.astype(np.int64) << 16)
                     | q_lo.astype(np.int64)).astype(np.uint32).view(
                         np.int32)
                if quad:
                    ws_q.append(w)
                elif pair:
                    # parent-indexed child slots, BUILD order; leaves get
                    # their own box in slot A (slot B is never consumed:
                    # leaf link words route the far side to DONE)
                    li = leaf[g]
                    c1 = np.minimum(llt + 1, span - 1)
                    c2 = np.minimum(
                        c["miss"][np.minimum(g + 1, n - 1)] - rt, span - 1
                    )
                    if qbits == 8:
                        c2c = np.maximum(c2, 0)
                        loA = np.where(li, q_lo[llt], q_lo[c1])
                        hiA = np.where(li, q_hi[llt], q_hi[c1])
                        loB = np.where(li, 255, q_lo[c2c])
                        hiB = np.where(li, 0, q_hi[c2c])
                        w8 = (loA | (hiA << 8) | (loB << 16)
                              | (hiB << 24)).astype(np.uint32).view(
                                  np.int32)
                        planes[ci, t, a, :, llt] = w8[:, None]
                    else:
                        s0 = np.where(li, w[llt], w[c1])
                        s1 = np.where(li, FULL_SLAB_WORD,
                                      w[np.maximum(c2, 0)])
                        planes[ci, t, 2 * a, :, llt] = s0[:, None]
                        planes[ci, t, 2 * a + 1, :, llt] = s1[:, None]
                else:
                    # indexed target is (len, 8) (advanced dims first):
                    # broadcast the words across the 8 sublanes
                    planes[ci, t, a, :, llt] = w[:, None]
                qsc[ci, t * 8 + 2 * a] = np.float32(org)
                qsc[ci, t * 8 + 2 * a + 1] = scale
            if quad:
                _fill_quad_treelet(planes, links, ci, t, rt, g, ws_q, c,
                                   leaf, par_q, droot_q, succ_q)

        succ, skip = octant_links(
            c["aabb_min"], c["aabb_max"], c["first"], c["miss"]
        )

        def localize(lk):
            # global link -> local id within the node's treelet, DONE on
            # exit (membership = same treelet id at the target)
            tgt = lk[:, in_t]                         # (8, Nt)
            lo = tgt - root[tl][None, :]
            tgt_c = np.clip(tgt, 0, n - 1)
            inside = (tgt < n) & (tid[tgt_c] == tl[None, :]) & (lo >= 0)
            return np.where(inside, lo, DONE)

        if quad:
            pass      # quad links written per treelet (_fill_quad_treelet)
        elif pair:
            cnt_self = np.maximum(c["count"][in_t], 0) * leaf[in_t]
            # cnt has 4 bits (23-26) before swap at bit 27: a leaf
            # count > 15 would silently corrupt swap. Bounded upstream by
            # leaf_size <= LEAF_UNROLL (accel/__init__.py), but fail
            # LOUDLY here if a future leaf-size bump violates it. Note
            # builders never emit count==0 leaves (asserted at the MT
            # pack below) — _pair_step enqueues leaf children without a
            # cnt>0 gate, so an empty leaf would burn queue slots.
            assert cnt_self.max(initial=0) <= 15, (
                f"pair link word cnt field overflow: leaf count "
                f"{cnt_self.max()} > 15 corrupts the swap bit"
            )
            c1g = np.minimum(ids + 1, n - 1)
            c2g = np.minimum(c["miss"][c1g], n - 1)
            for o in range(OCTANTS):
                so, ko = succ[o], skip[o]
                near_g = np.where(leaf, ids, so)
                swap = (~leaf) & (near_g == c2g)
                far_g = np.where(leaf, ids, np.where(swap, c1g, c2g))
                # exit chain: skip threaded PAST same-treelet leaf
                # siblings (their MT tests happen at the parent step)
                pe = ko.copy()
                for _ in range(n):
                    t_ = np.minimum(pe, n - 1)
                    redo = (pe < n) & leaf[t_] & (tid[t_] == tid) & in_t
                    if not redo.any():
                        break
                    pe = np.where(redo, ko[t_], pe)
                nl = localize(near_g[None])[0]
                fl = localize(far_g[None])[0]
                pl_ = localize(pe[None])[0]
                int_n = np.where(leaf[in_t], 0,
                                 (~leaf[np.minimum(near_g[in_t], n - 1)])
                                 .astype(np.int64))
                # leaves are stepped only as single-leaf treelet roots:
                # near = self (one push), int_f = 1 + far = DONE so the
                # far side neither pushes nor re-enters (slot B's slab
                # cannot encode a miss — inverted intervals normalize
                # under the min/max slab test), pexit = DONE
                int_f = np.where(leaf[in_t], 1,
                                 (~leaf[np.minimum(far_g[in_t], n - 1)])
                                 .astype(np.int64))
                nl = np.where(leaf[in_t], ll, nl)
                pl_ = np.where(leaf[in_t], DONE, pl_)
                word = (
                    nl.astype(np.int64)
                    | (np.where(leaf[in_t], DONE,
                                fl).astype(np.int64) << 7)
                    | (pl_.astype(np.int64) << 14)
                    | (int_n << 21)
                    | (int_f << 22)
                    | (cnt_self.astype(np.int64) << 23)
                    | (swap[in_t].astype(np.int64) << 27)
                ).astype(np.int32)
                links[ci, o, tl, :, ll] = word[:, None]
        else:
            sl = localize(succ)
            kl = localize(skip)
            cnt = np.maximum(c["count"][in_t], 0) * (c["first"][in_t] >= 0)
            for o in range(OCTANTS):
                links[ci, o, tl, :, ll] = pack_link_word(sl[o], kl[o],
                                                         cnt)[:, None]

        leaf = in_t & (c["first"] >= 0)
        # builders never emit zero-triangle leaves (the _pair_step walk
        # relies on this: it enqueues box-hit leaf children unconditionally)
        assert (c["count"][leaf] > 0).all(), "builder emitted an empty leaf"
        tlf = tid[leaf]
        llf = ids[leaf] - root[tlf]
        fr = c["first"][leaf]
        cn = c["count"][leaf]
        tmax_i = c["v0"].shape[0] - 1
        for k in range(LEAF_UNROLL):
            val = cn > k
            s = np.minimum(fr + k, tmax_i)
            tv, lv, sv = tlf[val], llf[val], s[val]
            for a in range(3):
                mt[ci, tv, k * 9 + a, lv] = c["v0"][sv, a]
                mt[ci, tv, k * 9 + 3 + a, lv] = c["e1"][sv, a]
                mt[ci, tv, k * 9 + 6 + a, lv] = c["e2"][sv, a]
            if normals:
                for p9 in range(9):
                    mt[ci, tv, OFF_NRM_ROW + k * 9 + p9, lv] = (
                        c["n_soa"][p9][sv]
                    )

    arrays = {
        # SMEM-destined tables stay flat 1-D: Mosaic rejects 1-D-tile
        # DMAs whose source is a row slice of a 2-D array (tiling
        # mismatch); the kernels slice these with pl.ds like ops/mega.py
        "box": box.reshape(-1),
        "tid": tidm.reshape(-1),
        "qsc": qsc.reshape(-1),
        "planes": planes,
        "links": (links.reshape(cN * OCTANTS, t_pad, 2, 8, 128) if quad
                  else links.reshape(cN * OCTANTS, t_pad, 8, 128)),
        "mt": mt,
    }
    return arrays, (pad_nodes, t_pad, box_len, tid_len, rows_mt, qsc_len,
                    QUAD_BITS if quad else (qbits if pair else 0))


# ---------------------------------------------------------------------------
# kernel walk pieces
# ---------------------------------------------------------------------------


def _look(bank, idx):
    """128-entry per-lane bank lookup (Mosaic: tpu.dynamic_gather)."""
    return jnp.take_along_axis(bank, idx, axis=1)


def _row(mt_ref, site, row):
    """Compact MT row -> row-replicated (8,128) gather bank."""
    return jnp.broadcast_to(mt_ref[site, row].reshape(1, 128), (8, 128))


def _tl_slab(pln_ref, qs6, site, nd, o, d_inv, tmin, tfar):
    """Per-lane treelet slab test against the PACKED quantized box words
    — formula matches mega._slab_tab on the (conservatively widened)
    dequantized planes ``origin + q * scale`` (``qs6`` = the site's 3x
    (origin, scale) scalars)."""
    tns, tfs = [], []
    for a in range(3):
        w = _look(pln_ref[site, a], nd)
        q_lo = (w & jnp.int32(0xFFFF)).astype(jnp.float32)
        q_hi = ((w >> 16) & jnp.int32(0xFFFF)).astype(jnp.float32)
        lo = qs6[2 * a] + q_lo * qs6[2 * a + 1]
        hi = qs6[2 * a] + q_hi * qs6[2 * a + 1]
        t0 = (lo - o[a]) * d_inv[a]
        t1 = (hi - o[a]) * d_inv[a]
        tns.append(jnp.minimum(t0, t1))
        tfs.append(jnp.maximum(t0, t1))
    t_near = jnp.maximum(jnp.maximum(tns[0], tns[1]),
                         jnp.maximum(tns[2], tmin))
    t_far = jnp.minimum(jnp.minimum(tfs[0], tfs[1]),
                        jnp.minimum(tfs[2], tfar))
    return t_near <= t_far


def _mt_bank(mt_ref, site, k, qn, o, d, tmin, best_t):
    """Node-indexed Moller-Trumbore slot k — formula matches mega._mt_tab."""
    base = k * 9
    v0 = [_look(_row(mt_ref, site, base + a), qn) for a in range(3)]
    e1 = [_look(_row(mt_ref, site, base + 3 + a), qn) for a in range(3)]
    e2 = [_look(_row(mt_ref, site, base + 6 + a), qn) for a in range(3)]
    px = d[1] * e2[2] - d[2] * e2[1]
    py = d[2] * e2[0] - d[0] * e2[2]
    pz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tvx, tvy, tvz = o[0] - v0[0], o[1] - v0[1], o[2] - v0[2]
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1[2] - tvz * e1[1]
    qy = tvz * e1[0] - tvx * e1[2]
    qz = tvx * e1[1] - tvy * e1[0]
    v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-9)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < best_t)
    )
    return t, u, v, hit


def _interp_bank(mt_ref, site, k, qn, u, v):
    """Barycentric normal interpolation from the node-indexed normal rows."""
    base = OFF_NRM_ROW + k * 9
    w_ = 1.0 - u - v
    out = []
    for a in range(3):
        n0 = _look(_row(mt_ref, site, base + a), qn)
        n1 = _look(_row(mt_ref, site, base + 3 + a), qn)
        n2 = _look(_row(mt_ref, site, base + 6 + a), qn)
        out.append(w_ * n0 + u * n1 + v * n2)
    return tuple(out)


def _queue_push(qs, qc, push, nd):
    qs = tuple(
        jnp.where(push & (qc == j), nd, qs[j]) for j in range(QD)
    )
    return qs, qc + jnp.where(push, 1, 0)


def _any_or(masks):
    """OR a list of lane masks first so the while-loop condition costs ONE
    vector->scalar reduction (measured: each reduce in a loop cond is a
    scalar-pipeline sync; the first kernel cut paid ~8 per iteration)."""
    c = masks[0]
    for m_ in masks[1:]:
        c = c | m_
    return jnp.any(c)


# od scratch plane layout: transformed ray origins / directions / inverse
# directions, written ONCE per (entry, block) and re-read by every walk
# iteration — keeping them OUT of the while-loop carries (the first
# kernel cut carried ~36 extra vregs of o/d/inv per 4-slice walk and
# register spills ate the per-lane iteration win)
OD_O, OD_D, OD_INV = 0, 3, 6


def _tl_step(pln_ref, lnk_ref, qs6, site, lnode, bt, qs, qc, o, d_inv,
             tmin, act):
    """One per-lane interior step: slab + leaf push + link follow.

    ``act`` gates the push and the pointer move: lanes whose queue is
    full (or that finished) STALL — they keep gathering (harmless, the
    vector op runs regardless) but neither push nor advance."""
    word = _look(lnk_ref[site], lnode)
    succ = word & jnp.int32(127)
    skip = (word >> 7) & jnp.int32(127)
    cnt = word >> 14
    box = _tl_slab(pln_ref, qs6, site, lnode, o, d_inv, tmin, bt)
    leaf = cnt > 0
    push = act & box & leaf
    qs, qc = _queue_push(qs, qc, push, lnode)
    lnode = jnp.where(act, jnp.where(box & ~leaf, succ, skip), lnode)
    return lnode, qs, qc


def _slab_slot(pln_ref, qs6, site, nd, slot, o, d_inv, tmin, tfar,
               width: int = 2):
    """Pair/quad-format slab test against child slot ``slot`` of node
    ``nd`` (the box words are indexed by the PARENT id so the dependent
    chain stays one gather deep; same dequantized-slab formula as
    :func:`_tl_slab`). ``width``: slots per axis (2 = pair, 4 = quad)."""
    tns, tfs = [], []
    for a in range(3):
        w = _look(pln_ref[site, width * a + slot], nd)
        q_lo = (w & jnp.int32(0xFFFF)).astype(jnp.float32)
        q_hi = ((w >> 16) & jnp.int32(0xFFFF)).astype(jnp.float32)
        lo = qs6[2 * a] + q_lo * qs6[2 * a + 1]
        hi = qs6[2 * a] + q_hi * qs6[2 * a + 1]
        t0 = (lo - o[a]) * d_inv[a]
        t1 = (hi - o[a]) * d_inv[a]
        tns.append(jnp.minimum(t0, t1))
        tfs.append(jnp.maximum(t0, t1))
    t_near = jnp.maximum(jnp.maximum(tns[0], tns[1]),
                         jnp.maximum(tns[2], tmin))
    t_far = jnp.minimum(jnp.minimum(tfs[0], tfs[1]),
                        jnp.minimum(tfs[2], tfar))
    return t_near <= t_far


def _slab_pair8(pln_ref, qs6, site, nd, o, d_inv, tmin, tfar):
    """8-bit pair-format slab tests: ONE gather per axis carries BOTH
    children's conservative bounds (``loA | hiA<<8 | loB<<16 | hiB<<24``
    on the 255-step treelet grid) — a pair step costs 3 box gathers + 1
    link gather, the same traffic as the visit-step walk, at 1.7x fewer
    steps. Returns (hitA, hitB)."""
    tn = [[], []]
    tf = [[], []]
    for a in range(3):
        w = _look(pln_ref[site, a], nd)
        for s, sh in ((0, 0), (1, 16)):
            q_lo = ((w >> sh) & jnp.int32(0xFF)).astype(jnp.float32)
            q_hi = ((w >> (sh + 8)) & jnp.int32(0xFF)).astype(jnp.float32)
            lo = qs6[2 * a] + q_lo * qs6[2 * a + 1]
            hi = qs6[2 * a] + q_hi * qs6[2 * a + 1]
            t0 = (lo - o[a]) * d_inv[a]
            t1 = (hi - o[a]) * d_inv[a]
            tn[s].append(jnp.minimum(t0, t1))
            tf[s].append(jnp.maximum(t0, t1))
    hits = []
    for s in range(2):
        t_near = jnp.maximum(jnp.maximum(tn[s][0], tn[s][1]),
                             jnp.maximum(tn[s][2], tmin))
        t_far = jnp.minimum(jnp.minimum(tf[s][0], tf[s][1]),
                            jnp.minimum(tf[s][2], tfar))
        hits.append(t_near <= t_far)
    return hits[0], hits[1]


def _pair_step(pln_ref, lnk_ref, qs6, site, lnode, bt, qs, qc, o, d_inv,
               tmin, act, bits):
    """One pair-test step at an ENTERED node: test BOTH children's boxes,
    enqueue hit leaf children (near first — preserves the old walk's MT
    order up to the documented tie caveat), descend to the near interior
    hit child, else the far one, else follow the leaf-skipping exit
    chain. Up to TWO queue pushes per step (callers stall at QD-1)."""
    word = _look(lnk_ref[site], lnode)
    near = word & jnp.int32(127)
    far = (word >> 7) & jnp.int32(127)
    pexit = (word >> 14) & jnp.int32(127)
    int_n = ((word >> 21) & 1) != 0
    int_f = ((word >> 22) & 1) != 0
    swap = ((word >> 27) & 1) != 0
    if bits == 8:
        box_a, box_b = _slab_pair8(pln_ref, qs6, site, lnode, o, d_inv,
                                   tmin, bt)
    else:
        box_a = _slab_slot(pln_ref, qs6, site, lnode, 0, o, d_inv,
                           tmin, bt)
        box_b = _slab_slot(pln_ref, qs6, site, lnode, 1, o, d_inv,
                           tmin, bt)
    # mask logic, not where(bool, bool, bool): Mosaic can't lower the
    # i8→i1 truncation a boolean-payload select materializes
    boxn = (box_b & swap) | (box_a & ~swap)
    boxf = (box_a & swap) | (box_b & ~swap)
    qs, qc = _queue_push(qs, qc, act & boxn & ~int_n, near)
    qs, qc = _queue_push(qs, qc, act & boxf & ~int_f, far)
    go_n = boxn & int_n
    go_f = boxf & int_f & ~go_n
    lnode = jnp.where(
        act, jnp.where(go_n, near, jnp.where(go_f, far, pexit)), lnode
    )
    return lnode, qs, qc


def _quad_step(pln_ref, lnk_ref, qs6, site, lnode, bt, qs, qc, o, d_inv,
               tmin, act):
    """One quad-test step at an ENTERED node: test FOUR child slots
    (the node's grandchildren, leaf children passed through — see the
    QUAD_DEFAULT layout note), push ONE queue entry carrying the node id
    plus the hit-LEAF-child mask, and descend to the first octant-ordered
    hit interior child, else follow the exit chain. All selects are
    int-mask logic (no boolean payloads — the Mosaic i1 legalization
    trap documented at _pair_step)."""
    w1 = _look(lnk_ref[site, 0], lnode)
    w2 = _look(lnk_ref[site, 1], lnode)
    pexit = w2 & jnp.int32(127)
    valid = (w2 >> 7) & jnp.int32(15)
    smap = (w2 >> 11) & jnp.int32(255)
    one = jnp.int32(1)
    zero = jnp.zeros_like(lnode)
    # build-slot hits as 0/1 int planes (12 box gathers)
    hs = []
    for s in range(4):
        b = _slab_slot(pln_ref, qs6, site, lnode, s, o, d_inv, tmin, bt,
                       width=4)
        hs.append(jnp.where(b, one, zero))
    mask = zero
    target = pexit
    taken = zero
    for j in range(4):
        cj = (w1 >> (8 * j)) & jnp.int32(127)
        ij = (w1 >> (8 * j + 7)) & one
        vj = (valid >> j) & one
        sj = (smap >> (2 * j)) & jnp.int32(3)
        # ordered position j's slot hit, selected by the 2-bit slot map
        bj = (jnp.where(sj == 0, hs[0], zero)
              | jnp.where(sj == 1, hs[1], zero)
              | jnp.where(sj == 2, hs[2], zero)
              | jnp.where(sj == 3, hs[3], zero))
        hit = bj & vj
        mask = mask | ((hit & (one - ij)) << j)
        goj = hit & ij & (one - taken)
        target = jnp.where(goj != 0, cj, target)
        taken = taken | goj
    push = act & (mask != 0)
    qs, qc = _queue_push(qs, qc, push, lnode | (mask << 7))
    lnode = jnp.where(act, target, lnode)
    return lnode, qs, qc


# win_ref scratch plane layout: per-lane winner bookkeeping accumulated
# across a treelet site's drains — the expensive normal interpolation +
# state commit runs ONCE per improved site (at treelet exit), not once
# per improved drain (sites average several drains; the interp is 36
# gathers + the world transform per slice)
WIN_Q, WIN_K, WIN_U, WIN_V, WIN_IMP = 0, 1, 2, 3, 4


def _walk_closest_perlane(
    boxf, tidm, tabo, qsc_ref, pln_ref, lnk_ref, mt_ref, od_ref, win_ref,
    st_buf, slot, pks, m, matid, instid, pn, tid_len, tmin, pair_bits,
):
    """Two-level closest walk of ``len(pks)`` single-packet slices.

    Top-tree consensus against the SMEM box planes; treelets per-lane via
    the VMEM gather banks with deferred-leaf drains. Only the per-lane
    ``best_t`` lives in the loop carries: rays come from the ``od_ref``
    scratch planes, drains park winners (leaf node id, slot, u, v) in the
    ``win_ref`` scratch planes, and each treelet exit commits its site's
    winners (interpolated object normal -> instance inverse-transpose ->
    state buffer, ``src/shader.rchit:93-94``) under a ``pl.when`` — the
    merge phase of the consensus kernel happens incrementally here.
    """
    end = tidm[tid_len - 1]
    ns = len(pks)
    # pair_bits: 0 = visit-step walk, 16/8 = pair-test walk at that box
    # quantization (see PAIR_DEFAULT), QUAD_BITS = quad-test walk
    quad = pair_bits == QUAD_BITS
    pair = pair_bits > 0 and not quad
    if quad:
        step_fn = _quad_step
        q_room = QD            # quad steps push ONE masked parent entry
    elif pair:
        step_fn = functools.partial(_pair_step, bits=pair_bits)
        q_room = QD - 1        # pair steps push up to 2 leaves
    else:
        step_fn = _tl_step
        q_room = QD
    cshift = 23 if pair else 14       # cnt bits in the link word

    def o_of(i):
        return [od_ref[OD_O + a, pks[i]] for a in range(3)]

    def d_of(i):
        return [od_ref[OD_D + a, pks[i]] for a in range(3)]

    def inv_of(i):
        return [od_ref[OD_INV + a, pks[i]] for a in range(3)]

    bt0 = tuple(st_buf[slot, ST_T, pks[i]] for i in range(ns))
    any_live = _any_or([b > tmin for b in bt0])
    tnode0 = jnp.where(any_live, jnp.int32(0), end)

    def f32bits(x):
        return pltpu.bitcast(x, jnp.float32)

    def i32bits(x):
        return pltpu.bitcast(x, jnp.int32)

    def drain_all(site, qss, qcs, bt4):
        """Drain every slice's leaf queue jointly; the queue-slot loop is
        a while over ``j`` bounded by the ACTUAL max queue depth — most
        drains (treelet exits) hold 1-2 entries, and the full-QD unroll
        was ~2.3 us per phase regardless."""
        shape = bt4[0].shape
        z = jnp.zeros(shape, jnp.float32)
        zi = jnp.zeros(shape, jnp.int32)
        # `improved` is carried as i32 — Mosaic cannot loop-carry i1
        # vectors through scf.while (failed to legalize scf.yield)
        init = (jnp.int32(0), tuple(bt4),
                tuple((zi, zi, z, z, zi) for _ in range(ns)))

        def cond(c):
            j = c[0]
            return (j < QD) & _any_or([qc > j for qc in qcs])

        def body(c):
            j, bt4, accs = c
            out_b, out_a = [], []
            for i in range(ns):
                o = o_of(i)
                d = d_of(i)
                bt = bt4[i]
                win_q, win_k, ju, jv, improved = accs[i]
                qn = qss[i][0]
                for j2 in range(1, QD):
                    qn = jnp.where(j == j2, qss[i][j2], qn)
                occm = qcs[i] > j
                if quad:
                    # queue entry = parent id | hit-leaf mask<<7: run the
                    # MT rows of each masked child (ids from the parent's
                    # word1, counts from the child's own word2); children
                    # no lane needs are skipped whole (lax.cond)
                    pid = qn & jnp.int32(127)
                    qmask = (qn >> 7) & jnp.int32(15)
                    w1p = _look(lnk_ref[site, 0], pid)
                    carry = (bt, win_q, win_k, ju, jv, improved)
                    for ci4 in range(4):
                        cid = (w1p >> (8 * ci4)) & jnp.int32(127)
                        okci = occm & (((qmask >> ci4) & 1) != 0)

                        def do_child(carry, cid=cid, okci=okci, o=o, d=d):
                            bt, win_q, win_k, ju, jv, improved = carry
                            cntc = (_look(lnk_ref[site, 1], cid)
                                    >> 19) & 15
                            for k in range(LEAF_UNROLL):
                                t, u, v, hit = _mt_bank(
                                    mt_ref, site, k, cid, o, d, tmin, bt)
                                hit = hit & okci & (cntc > k)
                                bt = jnp.where(hit, t, bt)
                                ju = jnp.where(hit, u, ju)
                                jv = jnp.where(hit, v, jv)
                                win_q = jnp.where(hit, cid, win_q)
                                win_k = jnp.where(hit, k, win_k)
                                improved = improved | hit.astype(jnp.int32)
                            return (bt, win_q, win_k, ju, jv, improved)

                        carry = jax.lax.cond(jnp.any(okci), do_child,
                                             lambda c_: c_, carry)
                    bt, win_q, win_k, ju, jv, improved = carry
                else:
                    cntq = (_look(lnk_ref[site], qn) >> cshift) & 15
                    for k in range(LEAF_UNROLL):
                        t, u, v, hit = _mt_bank(mt_ref, site, k, qn, o, d,
                                                tmin, bt)
                        hit = hit & occm & (cntq > k)
                        bt = jnp.where(hit, t, bt)
                        ju = jnp.where(hit, u, ju)
                        jv = jnp.where(hit, v, jv)
                        win_q = jnp.where(hit, qn, win_q)
                        win_k = jnp.where(hit, k, win_k)
                        improved = improved | hit.astype(jnp.int32)
                out_b.append(bt)
                out_a.append((win_q, win_k, ju, jv, improved))
            return j + 1, tuple(out_b), tuple(out_a)

        _, bt4, accs = jax.lax.while_loop(cond, body, init)
        for i in range(ns):
            _park_win(i, accs[i])
        return bt4

    def _park_win(i, acc):
        """Merge one drain's winners into the win scratch planes (cheap:
        5 read-select-writes) — the interp/commit waits for site exit."""
        win_q, win_k, ju, jv, improved_i = acc
        improved = improved_i != 0
        pk = pks[i]

        @pl.when(jnp.any(improved))
        def _():
            win_ref[WIN_Q, pk] = f32bits(
                jnp.where(improved, win_q, i32bits(win_ref[WIN_Q, pk]))
            )
            win_ref[WIN_K, pk] = f32bits(
                jnp.where(improved, win_k, i32bits(win_ref[WIN_K, pk]))
            )
            win_ref[WIN_U, pk] = jnp.where(improved, ju,
                                           win_ref[WIN_U, pk])
            win_ref[WIN_V, pk] = jnp.where(improved, jv,
                                           win_ref[WIN_V, pk])
            win_ref[WIN_IMP, pk] = f32bits(
                i32bits(win_ref[WIN_IMP, pk]) | improved_i
            )

    def _commit_site(site, i, bt):
        """Commit a site's accumulated winners: one interpolation for the
        site's final winner per lane (object space), the instance
        inverse-transpose into world space (src/shader.rchit:93-94), and
        the state write. Runs once per (site, slice) with any winner."""
        pk = pks[i]
        improved = i32bits(win_ref[WIN_IMP, pk]) != 0

        @pl.when(jnp.any(improved))
        def _():
            # non-improved lanes carry unwritten scratch: clamp the bank
            # index into range (their interp results are masked out)
            win_q = i32bits(win_ref[WIN_Q, pk]) & jnp.int32(127)
            win_k = i32bits(win_ref[WIN_K, pk])
            ju = win_ref[WIN_U, pk]
            jv = win_ref[WIN_V, pk]
            vals = [
                _interp_bank(mt_ref, site, k, win_q, ju, jv)
                for k in range(LEAF_UNROLL)
            ]
            bn = []
            for a in range(3):
                n_a = vals[0][a]
                for k in range(1, LEAF_UNROLL):
                    n_a = jnp.where(win_k == k, vals[k][a], n_a)
                bn.append(n_a)
            nwx = m[0] * bn[0] + m[4] * bn[1] + m[8] * bn[2]
            nwy = m[1] * bn[0] + m[5] * bn[1] + m[9] * bn[2]
            nwz = m[2] * bn[0] + m[6] * bn[1] + m[10] * bn[2]
            st_buf[slot, ST_VALID, pk] = f32bits(
                jnp.where(improved, 1,
                          i32bits(st_buf[slot, ST_VALID, pk]))
            )
            st_buf[slot, ST_MAT, pk] = f32bits(
                jnp.where(improved, matid,
                          i32bits(st_buf[slot, ST_MAT, pk]))
            )
            st_buf[slot, ST_INST, pk] = f32bits(
                jnp.where(improved, instid,
                          i32bits(st_buf[slot, ST_INST, pk]))
            )
            st_buf[slot, ST_NX, pk] = jnp.where(
                improved, nwx, st_buf[slot, ST_NX, pk])
            st_buf[slot, ST_NY, pk] = jnp.where(
                improved, nwy, st_buf[slot, ST_NY, pk])
            st_buf[slot, ST_NZ, pk] = jnp.where(
                improved, nwz, st_buf[slot, ST_NZ, pk])
            st_buf[slot, ST_U, pk] = jnp.where(
                improved, ju, st_buf[slot, ST_U, pk])
            st_buf[slot, ST_V, pk] = jnp.where(
                improved, jv, st_buf[slot, ST_V, pk])
            st_buf[slot, ST_T, pk] = bt
            win_ref[WIN_IMP, pk] = f32bits(jnp.zeros_like(win_q))

    def treelet_walk(site, enter4, bt4):
        qs6 = [qsc_ref[site * 8 + i] for i in range(6)]
        lnodes = tuple(
            jnp.where(enter4[i], jnp.int32(0), DONE) for i in range(ns)
        )
        z = jnp.zeros(lnodes[0].shape, jnp.int32)
        qss = tuple(tuple(z for _ in range(QD)) for _ in range(ns))
        qcs = tuple(z for _ in range(ns))

        def phase_cond(c):
            lnodes, qss, qcs, bt4 = c
            return _any_or([
                (lnodes[i] != DONE) | (qcs[i] > 0) for i in range(ns)
            ])

        def phase_body(c):
            lnodes, qss, qcs, bt4 = c

            def step_cond(c2):
                lnodes, qss, qcs = c2
                if STALL_SCHED:
                    # ONE vector->scalar sync: a lane advances while it
                    # has queue room; full-queue lanes stall instead of
                    # pausing the whole walk
                    return _any_or([
                        (lnodes[i] != DONE) & (qcs[i] < q_room)
                        for i in range(ns)
                    ])
                act = _any_or([ln != DONE for ln in lnodes])
                full = _any_or([qc >= q_room for qc in qcs])
                return act & ~full

            def step_body(c2):
                lnodes, qss, qcs = c2
                out_l, out_qs, out_qc = [], [], []
                for i in range(ns):
                    act = lnodes[i] != DONE
                    if STALL_SCHED:
                        act = act & (qcs[i] < q_room)
                    ln, qs, qc = step_fn(
                        pln_ref, lnk_ref, qs6, site, lnodes[i], bt4[i],
                        qss[i], qcs[i], o_of(i), inv_of(i), tmin, act,
                    )
                    out_l.append(ln)
                    out_qs.append(qs)
                    out_qc.append(qc)
                return tuple(out_l), tuple(out_qs), tuple(out_qc)

            lnodes, qss, qcs = jax.lax.while_loop(
                step_cond, step_body, (lnodes, qss, qcs)
            )
            bt4 = drain_all(site, qss, qcs, bt4)
            z = jnp.zeros(lnodes[0].shape, jnp.int32)
            qcs = tuple(z for _ in range(ns))
            return lnodes, qss, qcs, bt4

        _, _, _, bt4 = jax.lax.while_loop(
            phase_cond, phase_body, (lnodes, qss, qcs, bt4)
        )
        for i in range(ns):
            _commit_site(site, i, bt4[i])
        return bt4

    def top_cond(c):
        return c[0] != end

    def top_body(c):
        tnode, bt4 = c
        site = tidm[tnode]
        box4 = [
            _slab_tab(boxf, pn, o_of(i), inv_of(i), tnode, tmin, bt4[i])
            for i in range(ns)
        ]
        any_box = _any_or(box4)
        is_site = site >= 0
        enter = is_site & any_box
        bt4 = treelet_walk(site, [enter & b for b in box4], bt4)
        nxt = jnp.where((~is_site) & any_box, tabo[tnode],
                        tabo[pn + tnode])
        return nxt, bt4

    jax.lax.while_loop(top_cond, top_body, (tnode0, bt0))


def _walk_anyhit_perlane(
    boxf, tidm, tabo, qsc_ref, pln_ref, lnk_ref, mt_ref, od_ref,
    pks, tmaxs, occ0s, pn, tid_len, tmin, pair_bits,
):
    """Two-level occlusion walk; returns the occlusion mask per slice."""
    end = tidm[tid_len - 1]
    ns = len(pks)
    quad = pair_bits == QUAD_BITS
    pair = pair_bits > 0 and not quad
    if quad:
        step_fn = _quad_step
        q_room = QD
    elif pair:
        step_fn = functools.partial(_pair_step, bits=pair_bits)
        q_room = QD - 1
    else:
        step_fn = _tl_step
        q_room = QD
    cshift = 23 if pair else 14
    live0s = [t > tmin for t in tmaxs]

    def o_of(i):
        return [od_ref[OD_O + a, pks[i]] for a in range(3)]

    def d_of(i):
        return [od_ref[OD_D + a, pks[i]] for a in range(3)]

    def inv_of(i):
        return [od_ref[OD_INV + a, pks[i]] for a in range(3)]

    any_live = _any_or([
        live0s[i] & (occ0s[i] == 0) for i in range(ns)
    ])
    tnode0 = jnp.where(any_live, jnp.int32(0), end)

    def pending_t(i, occ):
        return jnp.where(live0s[i] & (occ == 0), tmaxs[i], 0.0)

    def drain_all(site, qss, qcs, occs):
        # the shadow WINDOW bounds hits (t < tmax: geometry beyond the
        # light must not occlude, src/shader.rgen:111-112); frozen at
        # drain entry — extra tests on lanes occluded mid-drain are
        # absorbed by the OR. The queue-slot loop is a while over ``j``
        # bounded by the actual max queue depth.
        wns = tuple(pending_t(i, occs[i]) for i in range(ns))

        def cond(c):
            j = c[0]
            return (j < QD) & _any_or([qc > j for qc in qcs])

        def body(c):
            j, occs = c
            out = []
            for i in range(ns):
                o = o_of(i)
                d = d_of(i)
                occ = occs[i]
                qn = qss[i][0]
                for j2 in range(1, QD):
                    qn = jnp.where(j == j2, qss[i][j2], qn)
                occm = qcs[i] > j
                if quad:
                    pid = qn & jnp.int32(127)
                    qmask = (qn >> 7) & jnp.int32(15)
                    w1p = _look(lnk_ref[site, 0], pid)
                    for ci4 in range(4):
                        cid = (w1p >> (8 * ci4)) & jnp.int32(127)
                        okci = occm & (((qmask >> ci4) & 1) != 0)

                        def do_child(occ, cid=cid, okci=okci, o=o, d=d,
                                     i=i):
                            cntc = (_look(lnk_ref[site, 1], cid)
                                    >> 19) & 15
                            for k in range(LEAF_UNROLL):
                                _, _, _, hit = _mt_bank(
                                    mt_ref, site, k, cid, o, d, tmin,
                                    wns[i])
                                occ = occ | (hit & okci
                                             & (cntc > k)).astype(
                                                 jnp.int32)
                            return occ

                        occ = jax.lax.cond(jnp.any(okci), do_child,
                                           lambda x: x, occ)
                else:
                    cntq = (_look(lnk_ref[site], qn) >> cshift) & 15
                    for k in range(LEAF_UNROLL):
                        _, _, _, hit = _mt_bank(mt_ref, site, k, qn, o, d,
                                                tmin, wns[i])
                        occ = occ | (hit & occm
                                     & (cntq > k)).astype(jnp.int32)
                out.append(occ)
            return j + 1, tuple(out)

        _, occs = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), tuple(occs)))
        return occs

    def treelet_walk(site, enter4, occs):
        qs6 = [qsc_ref[site * 8 + i] for i in range(6)]
        lnodes = tuple(
            jnp.where(enter4[i], jnp.int32(0), DONE) for i in range(ns)
        )
        z = jnp.zeros(lnodes[0].shape, jnp.int32)
        qss = tuple(tuple(z for _ in range(QD)) for _ in range(ns))
        qcs = tuple(z for _ in range(ns))

        def phase_cond(c):
            lnodes, qss, qcs, occs = c
            return _any_or([
                (lnodes[i] != DONE) | (qcs[i] > 0) for i in range(ns)
            ])

        def phase_body(c):
            lnodes, qss, qcs, occs = c

            def step_cond(c2):
                lnodes, qss, qcs = c2
                if STALL_SCHED:
                    return _any_or([
                        (lnodes[i] != DONE) & (qcs[i] < q_room)
                        for i in range(ns)
                    ])
                act = _any_or([ln != DONE for ln in lnodes])
                full = _any_or([qc >= q_room for qc in qcs])
                return act & ~full

            def step_body(c2):
                lnodes, qss, qcs = c2
                out_l, out_qs, out_qc = [], [], []
                for i in range(ns):
                    act = lnodes[i] != DONE
                    if STALL_SCHED:
                        act = act & (qcs[i] < q_room)
                    ln, qs, qc = step_fn(
                        pln_ref, lnk_ref, qs6, site, lnodes[i],
                        pending_t(i, occs[i]), qss[i], qcs[i],
                        o_of(i), inv_of(i), tmin, act,
                    )
                    out_l.append(ln)
                    out_qs.append(qs)
                    out_qc.append(qc)
                return tuple(out_l), tuple(out_qs), tuple(out_qc)

            lnodes, qss, qcs = jax.lax.while_loop(
                step_cond, step_body, (lnodes, qss, qcs)
            )
            occs = drain_all(site, qss, qcs, occs)
            # newly occluded lanes stop walking
            lnodes = tuple(
                jnp.where(occs[i] != 0, DONE, lnodes[i])
                for i in range(ns)
            )
            z = jnp.zeros(lnodes[0].shape, jnp.int32)
            qcs = tuple(z for _ in range(ns))
            return lnodes, qss, qcs, occs

        _, _, _, occs = jax.lax.while_loop(
            phase_cond, phase_body, (lnodes, qss, qcs, occs)
        )
        return occs

    def top_cond(c):
        return c[0] != end

    def top_body(c):
        tnode, occs = c
        site = tidm[tnode]
        box4 = [
            _slab_tab(boxf, pn, o_of(i), inv_of(i), tnode, tmin,
                      pending_t(i, occs[i]))
            for i in range(ns)
        ]
        any_box = _any_or(box4)
        is_site = site >= 0
        enter = is_site & any_box
        occs = treelet_walk(site, [enter & b for b in box4], occs)
        done = ~_any_or([
            live0s[i] & (occs[i] == 0) for i in range(ns)
        ])
        nxt = jnp.where((~is_site) & any_box, tabo[tnode],
                        tabo[pn + tnode])
        nxt = jnp.where(done, end, nxt)
        return nxt, occs

    _, occs = jax.lax.while_loop(top_cond, top_body, (tnode0, occ0s))
    return list(occs)


# ---------------------------------------------------------------------------
# sweep kernels (DMA scaffolding mirrors ops/mega.py)
# ---------------------------------------------------------------------------


def _perlane_closest_kernel(
    bits_ref, octs_ref,
    meshof_ref, w2o_ref, matid_ref, instid_ref,
    box_hbm, tid_hbm, qsc_hbm, oct_hbm, pln_hbm, lnk_hbm, mt_hbm,
    rays_hbm, st_hbm,
    st_out,
    boxf, tidm, qscm, tabo, cur_mesh, pend_blk,
    pln_v, lnk_v, mt_v, ray_buf, st_buf, od_buf, win_buf,
    sem_tab, sem_oct, sem_in, sem_out,
    *,
    tmin: float, pn: int, box_len: int, tid_len: int, qsc_len: int,
    oct_len: int, num_blocks: int, pair_bits: int,
):
    e = pl.program_id(0)
    num_e = pl.num_programs(0)
    bp = BLOCK_PACKETS

    @pl.when(e == 0)
    def _():
        cur_mesh[0] = -1
        cur_mesh[1] = -1
        pend_blk[0] = -1
        pend_blk[1] = -1

    mesh = meshof_ref[e]
    m = _read_w2o(w2o_ref, e)
    matid = matid_ref[e]
    instid = instid_ref[e]

    def process_block(b, slot):
        @pl.when(cur_mesh[0] != mesh)
        def _():
            cur_mesh[0] = mesh
            dmas = [
                pltpu.make_async_copy(
                    box_hbm.at[pl.ds(mesh * box_len, box_len)], boxf,
                    sem_tab.at[0]),
                pltpu.make_async_copy(
                    tid_hbm.at[pl.ds(mesh * tid_len, tid_len)], tidm,
                    sem_tab.at[1]),
                pltpu.make_async_copy(
                    qsc_hbm.at[pl.ds(mesh * qsc_len, qsc_len)], qscm,
                    sem_tab.at[4]),
                pltpu.make_async_copy(pln_hbm.at[mesh], pln_v,
                                      sem_tab.at[2]),
                pltpu.make_async_copy(mt_hbm.at[mesh], mt_v,
                                      sem_tab.at[3]),
            ]
            for dma in dmas:
                dma.start()
            for dma in dmas:
                dma.wait()

        okey = mesh * 8 + octs_ref[b]

        @pl.when(cur_mesh[1] != okey)
        def _():
            cur_mesh[1] = okey
            d0 = pltpu.make_async_copy(
                oct_hbm.at[pl.ds(okey * oct_len, oct_len)], tabo,
                sem_oct.at[0],
            )
            d1 = pltpu.make_async_copy(lnk_hbm.at[okey], lnk_v,
                                       sem_oct.at[1])
            d0.start()
            d1.start()
            d0.wait()
            d1.wait()

        for s in range(2):
            @pl.when(pend_blk[s] == b)
            def _():
                pltpu.make_async_copy(
                    st_buf.at[s],
                    st_out.at[:, pl.ds(pend_blk[s] * bp, bp)],
                    sem_out.at[s],
                ).wait()
                pend_blk[s] = -1

        @pl.when(pend_blk[slot] >= 0)
        def _():
            pltpu.make_async_copy(
                st_buf.at[slot],
                st_out.at[:, pl.ds(pend_blk[slot] * bp, bp)],
                sem_out.at[slot],
            ).wait()
            pend_blk[slot] = -1

        din = pltpu.make_async_copy(
            rays_hbm.at[:, pl.ds(b * bp, bp)], ray_buf.at[slot],
            sem_in.at[slot, 0],
        )
        dst = pltpu.make_async_copy(
            st_out.at[:, pl.ds(b * bp, bp)], st_buf.at[slot],
            sem_in.at[slot, 1],
        )
        din.start()
        dst.start()
        din.wait()
        dst.wait()

        # transformed rays -> od scratch once per (entry, block); winner
        # flags cleared (the other win planes are lazily initialized —
        # reads are gated per lane by the flag)
        for pk in range(bp):
            ow = [ray_buf[slot, c, pk] for c in range(3)]
            dw = [ray_buf[slot, 3 + c, pk] for c in range(3)]
            o, dd = _xform_rays(m, ow, dw)
            iv = _inv(dd)
            for a in range(3):
                od_buf[OD_O + a, pk] = o[a]
                od_buf[OD_D + a, pk] = dd[a]
                od_buf[OD_INV + a, pk] = iv[a]
            win_buf[WIN_IMP, pk] = jnp.zeros((K_SUB, K_LANE), jnp.float32)

        for g0 in range(0, bp, W_PK):
            _walk_closest_perlane(
                boxf, tidm, tabo, qscm, pln_v, lnk_v, mt_v, od_buf,
                win_buf, st_buf, slot, list(range(g0, g0 + W_PK)), m,
                matid, instid, pn, tid_len, tmin, pair_bits,
            )

        pltpu.make_async_copy(
            st_buf.at[slot], st_out.at[:, pl.ds(b * bp, bp)],
            sem_out.at[slot],
        ).start()
        pend_blk[slot] = b

    _scan_bitmask(bits_ref, e, num_blocks, process_block)

    @pl.when(e == num_e - 1)
    def _():
        for s in range(2):
            @pl.when(pend_blk[s] >= 0)
            def _():
                pltpu.make_async_copy(
                    st_buf.at[s],
                    st_out.at[:, pl.ds(pend_blk[s] * bp, bp)],
                    sem_out.at[s],
                ).wait()
                pend_blk[s] = -1


def perlane_closest_sweep(
    scene, static,
    rays: jnp.ndarray,     # (6, P, 8, 128) packed world rays
    tmin: float,
    state: jnp.ndarray,    # (9, P, 8, 128) packed trace state
) -> jnp.ndarray:
    """One full closest-hit sweep via the two-level per-lane kernel."""
    p = rays.shape[1]
    assert p % BLOCK_PACKETS == 0
    (pn, t_pad, box_len, tid_len, rows_mt, qsc_len,
     pair_bits) = static.perlane_layout
    oct_len = _align(2 * pn)
    num_blocks = p // BLOCK_PACKETS

    bits, octs, depth = chunk_block_hits(scene, static, rays, state[ST_T],
                                         tmin)
    entries = static.traversal_list
    e_n = len(entries)
    meshof = jnp.asarray([mm for _, mm in entries], jnp.int32)
    instid = jnp.asarray([i for i, _ in entries], jnp.int32)
    perm = jnp.argsort(depth)
    bits = jnp.take(bits, perm, axis=0)
    meshof = jnp.take(meshof, perm)
    instid = jnp.take(instid, perm)
    w2o = scene.w2o[instid].reshape(e_n, 12)
    matid = scene.materials[instid].astype(jnp.int32)

    pw = scene.pl_planes.shape[2]   # 3 (visit/pair8), 6 (pair16), 12 (quad)
    lnk_shape = ((t_pad, 2, K_SUB, K_LANE) if pair_bits == QUAD_BITS
                 else (t_pad, K_SUB, K_LANE))
    kernel = functools.partial(
        _perlane_closest_kernel,
        tmin=float(tmin), pn=pn, box_len=box_len, tid_len=tid_len,
        qsc_len=qsc_len, oct_len=oct_len, num_blocks=num_blocks,
        pair_bits=pair_bits,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meshof
            pl.BlockSpec(memory_space=pltpu.SMEM),   # w2o
            pl.BlockSpec(memory_space=pltpu.SMEM),   # matid
            pl.BlockSpec(memory_space=pltpu.SMEM),   # instid
            pl.BlockSpec(memory_space=pl.ANY),       # box
            pl.BlockSpec(memory_space=pl.ANY),       # tid
            pl.BlockSpec(memory_space=pl.ANY),       # qsc
            pl.BlockSpec(memory_space=pl.ANY),       # oct
            pl.BlockSpec(memory_space=pl.ANY),       # planes
            pl.BlockSpec(memory_space=pl.ANY),       # links
            pl.BlockSpec(memory_space=pl.ANY),       # mt
            pl.BlockSpec(memory_space=pl.ANY),       # rays
            pl.BlockSpec(memory_space=pl.ANY),       # state (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((box_len,), jnp.float32),
            pltpu.SMEM((tid_len,), jnp.int32),
            pltpu.SMEM((qsc_len,), jnp.float32),
            pltpu.SMEM((oct_len,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((t_pad, pw, K_SUB, K_LANE), jnp.int32),
            pltpu.VMEM(lnk_shape, jnp.int32),
            pltpu.VMEM((t_pad, rows_mt, K_LANE), jnp.float32),
            pltpu.VMEM((2, 6, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((2, 9, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((9, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((5, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((9, p, K_SUB, K_LANE), jnp.float32),
        input_output_aliases={14: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bits, octs, meshof, w2o, matid, instid,
      scene.pl_box, scene.pl_tid, scene.pl_qsc, scene.mega_oct,
      scene.pl_planes, scene.pl_links, scene.pl_mt, rays, state)
    return out


def _perlane_anyhit_kernel(
    bits_ref, octs_ref,
    meshof_ref, w2o_ref,
    box_hbm, tid_hbm, qsc_hbm, oct_hbm, pln_hbm, lnk_hbm, mt_hbm,
    rays_hbm, tmax_hbm, occ_in_hbm,
    occ_out,
    boxf, tidm, qscm, tabo, cur_mesh, pend_blk,
    pln_v, lnk_v, mt_v, ray_buf, tmax_buf, occ_buf, od_buf,
    sem_tab, sem_oct, sem_in, sem_out,
    *,
    tmin: float, pn: int, box_len: int, tid_len: int, qsc_len: int,
    oct_len: int, num_blocks: int, pair_bits: int,
):
    e = pl.program_id(0)
    num_e = pl.num_programs(0)
    bp = BLOCK_PACKETS

    @pl.when(e == 0)
    def _():
        cur_mesh[0] = -1
        cur_mesh[1] = -1
        pend_blk[0] = -1
        pend_blk[1] = -1

    mesh = meshof_ref[e]
    m = _read_w2o(w2o_ref, e)

    def process_block(b, slot):
        @pl.when(cur_mesh[0] != mesh)
        def _():
            cur_mesh[0] = mesh
            dmas = [
                pltpu.make_async_copy(
                    box_hbm.at[pl.ds(mesh * box_len, box_len)], boxf,
                    sem_tab.at[0]),
                pltpu.make_async_copy(
                    tid_hbm.at[pl.ds(mesh * tid_len, tid_len)], tidm,
                    sem_tab.at[1]),
                pltpu.make_async_copy(
                    qsc_hbm.at[pl.ds(mesh * qsc_len, qsc_len)], qscm,
                    sem_tab.at[4]),
                pltpu.make_async_copy(pln_hbm.at[mesh], pln_v,
                                      sem_tab.at[2]),
                pltpu.make_async_copy(mt_hbm.at[mesh], mt_v,
                                      sem_tab.at[3]),
            ]
            for dma in dmas:
                dma.start()
            for dma in dmas:
                dma.wait()

        okey = mesh * 8 + octs_ref[b]

        @pl.when(cur_mesh[1] != okey)
        def _():
            cur_mesh[1] = okey
            d0 = pltpu.make_async_copy(
                oct_hbm.at[pl.ds(okey * oct_len, oct_len)], tabo,
                sem_oct.at[0],
            )
            d1 = pltpu.make_async_copy(lnk_hbm.at[okey], lnk_v,
                                       sem_oct.at[1])
            d0.start()
            d1.start()
            d0.wait()
            d1.wait()

        for s in range(2):
            @pl.when(pend_blk[s] == b)
            def _():
                pltpu.make_async_copy(
                    occ_buf.at[s],
                    occ_out.at[pl.ds(pend_blk[s] * bp, bp)],
                    sem_out.at[s],
                ).wait()
                pend_blk[s] = -1

        @pl.when(pend_blk[slot] >= 0)
        def _():
            pltpu.make_async_copy(
                occ_buf.at[slot],
                occ_out.at[pl.ds(pend_blk[slot] * bp, bp)],
                sem_out.at[slot],
            ).wait()
            pend_blk[slot] = -1

        d0 = pltpu.make_async_copy(
            rays_hbm.at[:, pl.ds(b * bp, bp)], ray_buf.at[slot],
            sem_in.at[slot, 0])
        d1 = pltpu.make_async_copy(
            tmax_hbm.at[pl.ds(b * bp, bp)], tmax_buf.at[slot],
            sem_in.at[slot, 1])
        d2 = pltpu.make_async_copy(
            occ_out.at[pl.ds(b * bp, bp)], occ_buf.at[slot],
            sem_in.at[slot, 2])
        d0.start(); d1.start(); d2.start()
        d0.wait(); d1.wait(); d2.wait()

        for pk in range(bp):
            ow = [ray_buf[slot, c, pk] for c in range(3)]
            dw = [ray_buf[slot, 3 + c, pk] for c in range(3)]
            o, dd = _xform_rays(m, ow, dw)
            iv = _inv(dd)
            for a in range(3):
                od_buf[OD_O + a, pk] = o[a]
                od_buf[OD_D + a, pk] = dd[a]
                od_buf[OD_INV + a, pk] = iv[a]

        for g0 in range(0, bp, W_PK):
            pks = list(range(g0, g0 + W_PK))
            tmaxs = [tmax_buf[slot, pk] for pk in pks]
            occ0s = tuple(occ_buf[slot, pk] for pk in pks)
            res = _walk_anyhit_perlane(
                boxf, tidm, tabo, qscm, pln_v, lnk_v, mt_v, od_buf,
                pks, tmaxs, occ0s, pn, tid_len, tmin, pair_bits,
            )
            for i, pk in enumerate(pks):
                @pl.when(jnp.any((tmaxs[i] > tmin) & (occ0s[i] == 0)))
                def _(i=i, pk=pk):
                    occ_buf[slot, pk] = res[i]

        pltpu.make_async_copy(
            occ_buf.at[slot], occ_out.at[pl.ds(b * bp, bp)],
            sem_out.at[slot],
        ).start()
        pend_blk[slot] = b

    _scan_bitmask(bits_ref, e, num_blocks, process_block)

    @pl.when(e == num_e - 1)
    def _():
        for s in range(2):
            @pl.when(pend_blk[s] >= 0)
            def _():
                pltpu.make_async_copy(
                    occ_buf.at[s],
                    occ_out.at[pl.ds(pend_blk[s] * bp, bp)],
                    sem_out.at[s],
                ).wait()
                pend_blk[s] = -1


def perlane_anyhit_sweep(
    scene, static,
    rays: jnp.ndarray,       # (6, P, 8, 128)
    tmin: float,
    tmax_reg: jnp.ndarray,   # (P, 8, 128)
    occ: jnp.ndarray,        # (P, 8, 128) int32 (donated)
    order: str = "origin",   # entry order (mega.entry_perm; "light" =
                             # nearest-the-light occluders first)
) -> jnp.ndarray:
    p = rays.shape[1]
    assert p % BLOCK_PACKETS == 0
    if static.perlane_shadow_layout is not None:
        (pn, t_pad, box_len, tid_len, rows_mt, qsc_len,
         pair_bits) = static.perlane_shadow_layout
        entries = static.shadow_traversal_list
        tabs = (scene.pl_sh_box, scene.pl_sh_tid, scene.pl_sh_qsc,
                scene.mega_sh_oct, scene.pl_sh_planes, scene.pl_sh_links,
                scene.pl_sh_mt)
        roots = scene.mega_sh_root
    else:
        (pn, t_pad, box_len, tid_len, rows_mt, qsc_len,
         pair_bits) = static.perlane_layout
        entries = static.traversal_list
        tabs = (scene.pl_box, scene.pl_tid, scene.pl_qsc, scene.mega_oct,
                scene.pl_planes, scene.pl_links, scene.pl_mt)
        roots = None
    oct_len = _align(2 * pn)
    num_blocks = p // BLOCK_PACKETS

    bits, octs, depth = chunk_block_hits(scene, static, rays, tmax_reg,
                                         tmin, roots=roots,
                                         entries=entries)
    e_n = len(entries)
    meshof = jnp.asarray([mm for _, mm in entries], jnp.int32)
    instid = jnp.asarray([i for i, _ in entries], jnp.int32)
    from raytpu.ops.mega import entry_perm

    perm = entry_perm(scene, static, depth, roots, entries, order)
    bits = jnp.take(bits, perm, axis=0)
    meshof = jnp.take(meshof, perm)
    instid = jnp.take(instid, perm)
    w2o = scene.w2o[instid].reshape(e_n, 12)

    pw = tabs[4].shape[2]   # planes words: 3 (visit/pair8), 6, 12 (quad)
    lnk_shape = ((t_pad, 2, K_SUB, K_LANE) if pair_bits == QUAD_BITS
                 else (t_pad, K_SUB, K_LANE))
    kernel = functools.partial(
        _perlane_anyhit_kernel,
        tmin=float(tmin), pn=pn, box_len=box_len, tid_len=tid_len,
        qsc_len=qsc_len, oct_len=oct_len, num_blocks=num_blocks,
        pair_bits=pair_bits,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meshof
            pl.BlockSpec(memory_space=pltpu.SMEM),   # w2o
            pl.BlockSpec(memory_space=pl.ANY),       # box
            pl.BlockSpec(memory_space=pl.ANY),       # tid
            pl.BlockSpec(memory_space=pl.ANY),       # qsc
            pl.BlockSpec(memory_space=pl.ANY),       # oct
            pl.BlockSpec(memory_space=pl.ANY),       # planes
            pl.BlockSpec(memory_space=pl.ANY),       # links
            pl.BlockSpec(memory_space=pl.ANY),       # mt
            pl.BlockSpec(memory_space=pl.ANY),       # rays
            pl.BlockSpec(memory_space=pl.ANY),       # tmax
            pl.BlockSpec(memory_space=pl.ANY),       # occ (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((box_len,), jnp.float32),
            pltpu.SMEM((tid_len,), jnp.int32),
            pltpu.SMEM((qsc_len,), jnp.float32),
            pltpu.SMEM((oct_len,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((t_pad, pw, K_SUB, K_LANE), jnp.int32),
            pltpu.VMEM(lnk_shape, jnp.int32),
            pltpu.VMEM((t_pad, rows_mt, K_LANE), jnp.float32),
            pltpu.VMEM((2, 6, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((2, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((2, BLOCK_PACKETS, K_SUB, K_LANE), jnp.int32),
            pltpu.VMEM((9, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.int32),
        input_output_aliases={13: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bits, octs, meshof, w2o, *tabs, rays, tmax_reg, occ)
    return out
