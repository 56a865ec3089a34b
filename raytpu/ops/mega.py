"""Persistent chunk-sweep megakernel: ONE pallas_call per trace sweep.

Round-1 profiling showed the per-``pallas_call`` fixed cost (~2.5 ms,
dominated by delivering ~900 KB of BVH tables into SMEM) times 37 chunks
times ~10 sweeps WAS the config4 frame time. This module restructures the
whole (instance x chunk) loop of ``ops/trace.py`` into a single persistent
kernel per sweep (the TPU analog of one ``vkCmdTraceRaysKHR`` dispatch,
``src/main.cpp:2620-2624``):

* **grid = (num_entries,)** — one grid step per (instance, chunk) pair;
  chunk tables are DMA'd HBM->SMEM *once per chunk* (~80 us at the measured
  ~10 GB/s SMEM fill bandwidth) instead of being re-delivered per call;
* **an XLA prepass** (`chunk_block_hits`) computes a conservative
  per-(entry, packet-block) hit bitmask with interval arithmetic
  (block ray bounds vs chunk world AABB). The kernel scans the bitmask and
  touches ONLY live blocks: rays and trace state for culled blocks never
  leave HBM (round 1 re-streamed 24 full-frame planes per chunk — ~29 GB
  per sweep);
* **manual DMA** of live ray/state blocks HBM->VMEM->HBM with hazard
  tracking (state blocks are revisited across entries);
* **spp-grouped consensus walks**: the integrator folds all spp sample
  waves of a tile into adjacent packets; the kernel walks a whole group
  with ONE skip-link pointer, so the 4-spp fold costs ~1x (not 4x) node
  visits on coherent waves.

Replaces ``traceRayEXT`` scheduling (``src/shader.rgen:84-87,111-112``);
semantics (and bits) are identical to the chained per-chunk kernels in
``ops/traverse_pallas.py`` — the chain path remains the CPU/interpret
reference implementation (the mega path is TPU-only: interpret mode does
not model aliased block revisits). Enforced on TPU by
``raytpu.bench.bit_identity_check`` (run inside every driver bench and by
``tests/test_mega.py::test_mega_bit_identity``).

Bit-identity tie-order note: octant-ordered walks + depth-sorted entries
visit triangles/entries in a different order than the chained path, and
hits merge with strict ``t < best_t``, so EXACTLY-tied hits (coincident
coplanar triangles across chunks or instances) could in principle resolve
first-wins differently. Since round 4 this boundary is MEASURED, not just
documented: the driver bench renders a deliberately tie-prone scene (two
coincident cube instances with different materials,
``raytpu.bench.tie_scene_config``) through all tiers — result ``n_diff=0``
(recorded as ``tie_check`` in the bench artifact). Why they agree: entry
depth-sorting uses a STABLE argsort, so exactly-tied entry depths preserve
build order — every tier then visits the tied instances in the same order
and strict-< keeps the first. A scene engineered to give tied triangles
different entry depths per tier could still diverge; none is known.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.ops.intersect import LEAF_UNROLL
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

# packets per DMA block (the culling / transfer granule). 8 packets = 8192
# rays = two 32x32 tiles at 4 spp (one tile per group of 4 sample packets).
BLOCK_PACKETS = 8

# frame pipelines pad packet counts to this granule so the between-sweep
# lane re-binner (ops/rebin.py) gets whole 8-block sort segments
SEG_PACKETS = BLOCK_PACKETS * 8

# DMA offsets into 1-D f32/i32 arrays must be 1024-aligned (Mosaic tiles
# 1-D memrefs at 1024 elements)
DMA_ALIGN = 1024


def _align(n: int) -> int:
    return -(-n // DMA_ALIGN) * DMA_ALIGN


# ---------------------------------------------------------------------------
# build-time table packing (host, numpy)
# ---------------------------------------------------------------------------

class MegaLayout:
    """Static layout constants of the packed per-chunk tables.

    ``normals=False`` builds the anyhit-specialized layout: occlusion walks
    never read shading normals, so dropping the 9 normal planes fits ~55%
    more triangles per SMEM-resident chunk (fewer entries per shadow sweep,
    fewer table DMAs). Occlusion is an order-independent OR over triangles,
    so a different chunk partition is bit-identical by construction."""

    def __init__(self, pad_nodes: int, pad_tris: int, normals: bool = True):
        self.pad_nodes = pad_nodes
        self.pad_tris = pad_tris + LEAF_UNROLL   # leaf blocks stay in-bounds
        self.normals = normals
        # f32 table: 6 box planes | 9 tri corner planes | [9 normal planes]
        self.off_box = 0
        self.off_tri = 6 * self.pad_nodes
        self.off_nrm = self.off_tri + 9 * self.pad_tris
        self.f32_len = _align(
            self.off_nrm + (9 * self.pad_tris if normals else 0)
        )
        # i32 table: first | count | miss | node-count sentinel (last slot)
        self.i32_len = _align(3 * self.pad_nodes + 1)
        # per-(chunk, octant) ordering table: succ | skip
        self.oct_len = _align(2 * self.pad_nodes)

    def key(self) -> Tuple[int, int]:
        return (self.pad_nodes, self.pad_tris)


OCTANTS = 8


def octant_links(
    aabb_min: np.ndarray, aabb_max: np.ndarray,
    first: np.ndarray, miss: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-octant near-child-first threaded orderings of one flat DFS BVH.

    The skip-link layout walks nodes in build order (hit → ``node+1``), so
    rays visit children in an arbitrary order and the per-lane ``best_t``
    window shrinks late. These links rethread the SAME nodes for each of the
    8 ray-direction sign octants so the walk descends into the NEARER child
    first (front-to-back) — the stackless analog of ordered BVH traversal —
    which tightens ``best_t`` early and lets the slab test cull far
    subtrees. (Replaces the traversal-order heuristics GPU RT hardware
    applies inside ``traceRayEXT``, ``src/shader.rgen:86``.)

    Returns ``(succ, skip)``: (8, M) int32 — for octant ``o``, a consensus
    hit on interior ``n`` continues at ``succ[o, n]`` (its near child); a
    miss (or a finished leaf) continues at ``skip[o, n]``; value M
    terminates. Node ids (and therefore box/leaf tables) are unchanged.
    """
    m = first.shape[0]
    interior = first < 0
    octs = np.arange(OCTANTS)
    if m == 1 or not interior.any():
        succ = np.tile(miss.astype(np.int64), (OCTANTS, 1))
        return succ.astype(np.int32), succ.astype(np.int32).copy()

    ids = np.arange(m)
    left = ids + 1                       # DFS: left child follows parent
    # right child = left child's skip link (its next sibling)
    right = np.where(interior, miss[np.clip(left, 0, m - 1)], 0)
    center = (aabb_min.astype(np.float64) + aabb_max) * 0.5
    ii = ids[interior]
    l, r = left[ii], right[ii]
    delta = center[r] - center[l]                      # (I, 3)
    axis = np.argmax(np.abs(delta), axis=1)
    left_lower = (
        np.take_along_axis(delta, axis[:, None], axis=1)[:, 0] >= 0
    )
    # octant bit for the split axis: 1 = ray direction negative along it
    neg = ((octs[:, None] >> axis[None, :]) & 1).astype(bool)  # (8, I)
    pick_l = left_lower[None, :] ^ neg
    near = np.where(pick_l, l[None, :], r[None, :])    # (8, I)
    far = np.where(pick_l, r[None, :], l[None, :])

    # skip recurrence: skip[near(i)] = far(i); skip[far(i)] = skip[i];
    # skip[root] = M. far-chains resolved by pointer doubling.
    skip = np.full((OCTANTS, m), -1, np.int64)
    skip[:, 0] = m
    skip[octs[:, None], near] = far
    rf = np.zeros((OCTANTS, m), np.int64)   # resolve-from (far → parent)
    pend = np.zeros((OCTANTS, m), bool)
    rf[octs[:, None], far] = ii[None, :]
    pend[octs[:, None], far] = True
    for _ in range(2 * int(np.ceil(np.log2(m))) + 2):
        if not pend.any():
            break
        val = np.take_along_axis(skip, rf, axis=1)
        src_pend = np.take_along_axis(pend, rf, axis=1)
        newly = pend & ~src_pend
        skip = np.where(newly, val, skip)
        pend = pend & src_pend
        rf = np.take_along_axis(rf, rf, axis=1)
    assert not pend.any() and (skip >= 0).all()

    succ = skip.copy()                     # leaves: succ == skip
    succ[:, ii] = near
    return succ.astype(np.int32), skip.astype(np.int32)


def widen_octant_links(
    succ: np.ndarray, skip: np.ndarray,
    first: np.ndarray, miss: np.ndarray,
    keep_extra: np.ndarray = None,
    stride: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Wide-node rethreading of the consensus walk (round-5 probe,
    VERDICT r4 item 4 applied to the walk the item literally names):
    drop every ODD-depth interior from the per-octant threading, so a
    hit at a retained interior descends directly to its grandchild
    level — the stackless equivalent of a BVH4's 4-wide node, at
    UNCHANGED per-visit cost (the kernel is untouched; only the link
    tables change). Hit-corridor walks visit ~2/3 the nodes; miss-heavy
    regions lose the middle level's cull and test both its children
    instead. Correctness: every LEAF keeps its own box test, so the
    Möller–Trumbore candidate set only grows by candidates an ancestor
    test would have culled — supersets under strict-< merging find the
    same minimum (the ops/perlane.py pair-walk argument); only exact-tie
    order can differ.

    ``keep_extra``: node mask that must stay threaded regardless of
    depth — the per-lane tier's treelet ROOTS (its top walk shares these
    tables and must still visit every site).

    Returns widened (succ, skip); non-retained nodes keep terminator
    links (they are unreachable)."""
    n = first.shape[0]
    leaf = first >= 0
    par = np.full(n, -1, np.int64)
    ii = np.flatnonzero(~leaf)
    if ii.size:
        par[ii + 1] = ii
        par[np.minimum(miss[ii + 1], n - 1)] = ii
    depth = np.zeros(n, np.int64)
    for i in range(1, n):
        if par[i] >= 0:
            depth[i] = depth[par[i]] + 1
    # stride 2 retains every other interior level (stackless BVH4);
    # stride 3 every third (BVH8) — weaker mid-level culling for fewer
    # corridor visits, swept on-chip (tools/r17_stride_ab.py)
    retained = leaf | (depth % stride == 0)
    if keep_extra is not None:
        retained |= keep_extra
    pref = np.concatenate([[0], np.cumsum(retained)])
    out_succ = np.full_like(succ, n)
    out_skip = np.full_like(skip, n)
    for o in range(OCTANTS):
        # octant preorder = the always-hit walk (succ on interior, skip
        # on leaf) — visits every node exactly once (pinned by
        # tests/test_mega.py)
        order = np.empty(n, np.int64)
        x = 0
        for k in range(n):
            order[k] = x
            x = skip[o, x] if leaf[x] else succ[o, x]
        assert x == n
        filt = order[retained[order]]
        pos_in_subtree_cnt = pref[miss[filt]] - pref[filt]
        nxt = np.append(filt[1:], n)
        for idx in range(filt.size):
            v = filt[idx]
            j = idx + pos_in_subtree_cnt[idx]
            tgt_skip = filt[j] if j < filt.size else n
            out_skip[o, v] = tgt_skip
            # interior subtrees always contain retained leaves, so the
            # next preorder-retained node is inside the subtree
            out_succ[o, v] = tgt_skip if leaf[v] else nxt[idx]
    return out_succ.astype(np.int32), out_skip.astype(np.int32)


# wide-node consensus threading (see widen_octant_links). DEFAULT ON
# since round 5 — same-session A/B with the gate green and n_diff=0
# everywhere (tools/r16_wide_ab.py): config2 13.05 -> 12.47 (+4.7%),
# config3 24.27 -> 22.22 (+9.2% — the consensus-tier presets), config4
# 76.98 -> 76.20 (+1%, the per-lane tier's shared top walk). The link
# tables keep their shapes, so flipping this knob never recompiles.
MEGA_WIDE = __import__("os").environ.get("RAYTPU_MEGA_WIDE", "1") == "1"
MEGA_WIDE_STRIDE = int(
    __import__("os").environ.get("RAYTPU_MEGA_WIDE_STRIDE", "2"))


def pack_mega_tables(chunks, normals: bool = True) -> Tuple[
        np.ndarray, np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]:
    """Pack per-chunk BVH tables into flat DMA-able arrays.

    ``chunks``: list of dicts with keys aabb_min/aabb_max (n,3), first,
    count, miss (n,), v0/e1/e2 (t,3), n_soa (9,t) (n_soa ignored with
    ``normals=False`` — the anyhit-specialized layout).

    Returns (f32tab (C*F,), i32tab (C*I,), octtab (C*8*O,), roots (C, 6),
    (pad_nodes, pad_tris)) where pad_tris INCLUDES the LEAF_UNROLL guard.
    """
    pad_nodes = max(c["aabb_min"].shape[0] for c in chunks)
    pad_tris = max(c["v0"].shape[0] for c in chunks)
    lay = MegaLayout(pad_nodes, pad_tris, normals=normals)
    cN = len(chunks)
    f32 = np.zeros((cN, lay.f32_len), np.float32)
    i32 = np.zeros((cN, lay.i32_len), np.int32)
    oct_t = np.zeros((cN, OCTANTS, lay.oct_len), np.int32)
    roots = np.zeros((cN, 6), np.float32)
    for ci, c in enumerate(chunks):
        n = c["aabb_min"].shape[0]
        t = c["v0"].shape[0]
        succ, skip = octant_links(
            c["aabb_min"], c["aabb_max"], c["first"], c["miss"]
        )
        if MEGA_WIDE:
            # treelet roots must stay threaded: the per-lane tier's top
            # walk shares this table and enters treelets at their roots
            from raytpu.ops.perlane import treelet_partition

            tid, nt = treelet_partition(c["first"], c["count"], c["miss"])
            ids = np.arange(n)
            first_of = np.ones(n, bool)
            first_of[1:] = tid[1:] != tid[:-1]
            sites = (tid < nt) & first_of
            succ, skip = widen_octant_links(
                succ, skip, c["first"], c["miss"], keep_extra=sites,
                stride=MEGA_WIDE_STRIDE,
            )
        oct_t[ci, :, :n] = succ
        oct_t[ci, :, lay.pad_nodes : lay.pad_nodes + n] = skip
        for a in range(3):
            f32[ci, a * lay.pad_nodes : a * lay.pad_nodes + n] = (
                c["aabb_min"][:, a]
            )
            f32[ci, (3 + a) * lay.pad_nodes : (3 + a) * lay.pad_nodes + n] = (
                c["aabb_max"][:, a]
            )
        base = lay.off_tri
        for p, arr in enumerate((c["v0"], c["e1"], c["e2"])):
            for a in range(3):
                o = base + (p * 3 + a) * lay.pad_tris
                f32[ci, o : o + t] = arr[:, a]
        if normals:
            base = lay.off_nrm
            for p in range(9):
                o = base + p * lay.pad_tris
                f32[ci, o : o + t] = c["n_soa"][p]
        i32[ci, :n] = c["first"]
        i32[ci, lay.pad_nodes : lay.pad_nodes + n] = c["count"]
        i32[ci, 2 * lay.pad_nodes : 2 * lay.pad_nodes + n] = c["miss"]
        i32[ci, lay.i32_len - 1] = n   # walk-termination sentinel
        roots[ci, :3] = c["aabb_min"][0]
        roots[ci, 3:] = c["aabb_max"][0]
    return (f32.reshape(-1), i32.reshape(-1), oct_t.reshape(-1), roots,
            lay.key())


# ---------------------------------------------------------------------------
# prepass: conservative per-(entry, block) culling
# ---------------------------------------------------------------------------

# per-block stats row: o_lo(3) o_hi(3) d_lo(3) d_hi(3) t_hi neg(3) n_live
STATS_W = 17

# DMA blocks reduced per stats grid step. One-block steps are grid-step-
# latency bound (~6 us each — 6+ ms of prepass at 1080p x 4spp); batching
# amortizes the fixed cost while the per-block reductions stay vectorized.
STATS_SUPER = 16


def _block_stats_kernel(rays_ref, win_ref, out_ref, *, tmin, num_blocks):
    """One fused pass per STATS_SUPER blocks: masked ray bounds + window
    max + per-axis negative-direction counts per DMA block. Replaces ~16
    separate XLA reduction passes over the frame (each re-reading
    rays/window from HBM) with a single windowed read. ``out_ref`` is the
    WHOLE (PB, STATS_W) SMEM array (blocked small outputs are not
    lowerable); each grid step writes its own rows."""
    i = pl.program_id(0)
    big = jnp.float32(3e38)
    for s in range(STATS_SUPER):
        b = i * STATS_SUPER + s
        sl = slice(s * BLOCK_PACKETS, (s + 1) * BLOCK_PACKETS)

        @pl.when(b < num_blocks)
        def _(b=b, sl=sl):
            win = win_ref[sl]
            live = win > tmin
            vals = []
            for c in range(6):
                x = rays_ref[c, sl]
                vals.append(jnp.min(jnp.where(live, x, big)))
                vals.append(jnp.max(jnp.where(live, x, -big)))
            o_lo = vals[0::2][:3]
            o_hi = vals[1::2][:3]
            d_lo = vals[0::2][3:]
            d_hi = vals[1::2][3:]
            t_hi = jnp.max(jnp.where(live, win, 0.0))
            neg = [
                jnp.sum(
                    jnp.where(live & (rays_ref[3 + c, sl] < 0), 1.0, 0.0)
                )
                for c in range(3)
            ]
            n_live = jnp.sum(jnp.where(live, 1.0, 0.0))
            row = o_lo + o_hi + d_lo + d_hi + [t_hi] + neg + [n_live]
            for j, v in enumerate(row):
                out_ref[b, j] = v


def _block_stats(rays: jnp.ndarray, window: jnp.ndarray, tmin: float):
    """(PB, STATS_W) per-block ray statistics via one Pallas pass
    (interpreted off-TPU — the array is tiny, the win is HBM traffic)."""
    import functools as _ft

    p = rays.shape[1]
    pb = p // BLOCK_PACKETS
    interpret = jax.default_backend() != "tpu"
    bp = BLOCK_PACKETS
    return pl.pallas_call(
        _ft.partial(
            _block_stats_kernel, tmin=float(tmin), num_blocks=pb
        ),
        grid=(-(-pb // STATS_SUPER),),
        in_specs=[
            pl.BlockSpec(
                (6, STATS_SUPER * bp, 8, 128), lambda i: (0, i, 0, 0)
            ),
            pl.BlockSpec((STATS_SUPER * bp, 8, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((pb, STATS_W), jnp.float32),
        interpret=interpret,
    )(rays, window)

def _world_root_boxes(scene, static, roots=None, entries=None):
    """Per traversal entry: chunk root AABB transformed to world space.

    AABB transform by affine M via the |linear| trick (exact for
    AABB -> enclosing AABB).
    Returns (lo, hi): two (E, 3) arrays.
    """
    if roots is None:
        roots = scene.mega_root                # (Cmesh, 6)
    if entries is None:
        entries = static.traversal_list
    mesh_ids = jnp.asarray([m for _, m in entries], jnp.int32)
    inst_ids = jnp.asarray([i for i, _ in entries], jnp.int32)
    r = jnp.take(roots, mesh_ids, axis=0)      # (E, 6)
    lo, hi = r[:, :3], r[:, 3:]
    c = (lo + hi) * 0.5
    h = (hi - lo) * 0.5
    m = jnp.take(scene.o2w, inst_ids, axis=0)  # (E, 3, 4)
    lin = m[:, :, :3]
    tr = m[:, :, 3]
    cw = jnp.einsum("eij,ej->ei", lin, c) + tr
    hw = jnp.einsum("eij,ej->ei", jnp.abs(lin), h)
    return cw - hw, cw + hw


def chunk_block_hits(
    scene,
    static,
    rays: jnp.ndarray,        # (6, P, 8, 128) packed world rays
    window: jnp.ndarray,      # (P, 8, 128) per-lane trace window (<=0 dead)
    tmin: float,
    roots=None,               # (E_set, 6) chunk roots (default: main set)
    entries=None,             # ((inst, chunk), ...) (default: main set)
) -> jnp.ndarray:
    """Conservative (entry, block) culling + block octants + entry depths.

    Returns ``(bits, octs, depth)``:

    * ``bits`` (E, ceil(PB/32)) uint32 — interval-arithmetic slab test of
      each block's ray bounds against each entry's world root AABB, never
      false-negative (sign-spanning direction intervals widen to
      (-inf, inf));
    * ``octs`` (PB,) int32 — each block's majority ray-direction sign
      octant, selecting the near-first ordering table
      (:func:`octant_links`) the kernel walks that block with;
    * ``depth`` (E,) float32 — mean conservative entry distance over the
      entry's live blocks. Sorting the sweep's entry axis by it makes the
      carried per-lane ``best_t`` tighten before far chunks are visited, so
      an occluded chunk's walk parks at its root box test (the chunk-level
      front-to-back analog of ordered traversal)."""
    if entries is None:
        entries = static.traversal_list
    p = rays.shape[1]
    pb = p // BLOCK_PACKETS
    big = jnp.float32(3e38)

    stats = _block_stats(rays, window, tmin)           # (PB, STATS_W)
    o_lo, o_hi = stats[:, 0:3], stats[:, 3:6]
    d_lo, d_hi = stats[:, 6:9], stats[:, 9:12]
    t_hi = stats[:, 12]                                # (PB,)
    n_live = stats[:, 16]
    any_live = n_live > 0
    neg_maj = (stats[:, 13:16] * 2 > n_live[:, None]).astype(jnp.int32)
    octs = neg_maj[:, 0] | (neg_maj[:, 1] << 1) | (neg_maj[:, 2] << 2)

    box_lo, box_hi = _world_root_boxes(scene, static, roots, entries)

    # interval reciprocal of [d_lo, d_hi]: sign-spanning -> (-inf, inf)
    spans = (d_lo <= 0.0) & (d_hi >= 0.0)              # (PB, 3)
    inv_a = jnp.where(spans, -big, 1.0 / jnp.where(spans, 1.0, d_lo))
    inv_b = jnp.where(spans, big, 1.0 / jnp.where(spans, 1.0, d_hi))
    inv_lo = jnp.minimum(inv_a, inv_b)
    inv_hi = jnp.maximum(inv_a, inv_b)

    def axis_t(bound, e_axis):                          # (E, PB) intervals
        # (bound - o) * inv, intervals: products of interval endpoints
        num_lo = bound[:, None] - o_hi[None, :, e_axis]
        num_hi = bound[:, None] - o_lo[None, :, e_axis]
        il = inv_lo[None, :, e_axis]
        ih = inv_hi[None, :, e_axis]
        cands = [num_lo * il, num_lo * ih, num_hi * il, num_hi * ih]
        t_lo = functools.reduce(jnp.minimum, cands)
        t_hi_ = functools.reduce(jnp.maximum, cands)
        return t_lo, t_hi_

    enter_lo = jnp.full((len(entries), pb), float(tmin))
    exit_hi = jnp.broadcast_to(t_hi[None, :], (len(entries), pb))
    for a in range(3):
        lo_l, lo_h = axis_t(box_lo[:, a], a)
        hi_l, hi_h = axis_t(box_hi[:, a], a)
        # slab interval = [min(lo, hi), max(lo, hi)] endpoints, widened
        s_lo = jnp.minimum(lo_l, hi_l)
        s_hi = jnp.maximum(lo_h, hi_h)
        enter_lo = jnp.maximum(enter_lo, s_lo)
        exit_hi = jnp.minimum(exit_hi, s_hi)
    hit = (enter_lo <= exit_hi) & any_live[None, :]     # (E, PB)

    n_hit = jnp.sum(hit, axis=1, dtype=jnp.float32)
    depth = jnp.sum(
        jnp.where(hit, jnp.maximum(enter_lo, 0.0), 0.0), axis=1
    ) / jnp.maximum(n_hit, 1.0)

    pad = (-pb) % 32
    if pad:
        hit = jnp.pad(hit, ((0, 0), (0, pad)))
    h = hit.reshape(hit.shape[0], -1, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bits = jnp.sum(h * weights[None, None, :], axis=2, dtype=jnp.uint32)
    return bits, octs, depth


def entry_perm(scene, static, depth, roots=None, entries=None,
               order: str = "origin") -> jnp.ndarray:
    """Sweep entry permutation.

    * ``"origin"`` — ascending conservative entry distance from the ray
      origins (the closest-hit default: carried ``best_t`` tightens before
      far chunks, parking occluded walks at their root test).
    * ``"light"`` — ascending distance from the POINT LIGHT to the entry's
      world root box. Shadow rays all converge on one light
      (``src/shader.rgen:107-112``); occluders near the light subtend the
      largest solid angle of the shadow cone, so testing them first fires
      the any-hit early-exit for the most lanes. Occlusion is an
      order-independent OR, so this is bit-identical by construction.
    """
    if order == "light":
        lo, hi = _world_root_boxes(scene, static, roots, entries)
        lp = scene.light_pos[None, :]
        cl = jnp.clip(lp, lo, hi)
        return jnp.argsort(jnp.sum((cl - lp) ** 2, axis=1))
    return jnp.argsort(depth)


# ---------------------------------------------------------------------------
# the megakernel
# ---------------------------------------------------------------------------

def _read_w2o(w2o_ref, e):
    return [w2o_ref[e, i] for i in range(12)]


def _xform_rays(m, ow, dw):
    o = [
        m[0] * ow[0] + m[1] * ow[1] + m[2] * ow[2] + m[3],
        m[4] * ow[0] + m[5] * ow[1] + m[6] * ow[2] + m[7],
        m[8] * ow[0] + m[9] * ow[1] + m[10] * ow[2] + m[11],
    ]
    d = [
        m[0] * dw[0] + m[1] * dw[1] + m[2] * dw[2],
        m[4] * dw[0] + m[5] * dw[1] + m[6] * dw[2],
        m[8] * dw[0] + m[9] * dw[1] + m[10] * dw[2],
    ]
    return o, d


def _inv(d):
    return [
        jnp.where(x != 0.0, 1.0 / x, jnp.where(x >= 0, jnp.inf, -jnp.inf))
        for x in d
    ]


def _slab_tab(tabf, pn, o, d_inv, n, tmin, tfar):
    tns, tfs = [], []
    for a in range(3):
        lo = (tabf[a * pn + n] - o[a]) * d_inv[a]
        hi = (tabf[(3 + a) * pn + n] - o[a]) * d_inv[a]
        tns.append(jnp.minimum(lo, hi))
        tfs.append(jnp.maximum(lo, hi))
    t_near = jnp.maximum(jnp.maximum(tns[0], tns[1]),
                         jnp.maximum(tns[2], tmin))
    t_far = jnp.minimum(jnp.minimum(tfs[0], tfs[1]),
                        jnp.minimum(tfs[2], tfar))
    return t_near <= t_far


def _mt_tab(tabf, off_tri, pt, o, d, s, tmin, best_t):
    v0 = [tabf[off_tri + a * pt + s] for a in range(3)]
    e1 = [tabf[off_tri + (3 + a) * pt + s] for a in range(3)]
    e2 = [tabf[off_tri + (6 + a) * pt + s] for a in range(3)]
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


# packets-in-flight per interleaved walk loop. The lockstep width is
# LOCKSTEP_PACKETS // group: narrow groups walk several slices in ONE
# while loop (same register/ALU footprint as one group-wide walk — W
# walks of (g,8,128) state vs one of (W·g,8,128)) while each slice keeps
# ITS OWN pointer, so a slice stops paying slab cost the moment its own
# node set is exhausted instead of following the union. MEASURED: pairing
# two FULL group=4 walks (8 packets in flight) regressed the closest
# sweep 48 -> 66 ms (spilled state + max-length waste) — the ceiling
# below keeps the in-flight state at today's group-walk size.
LOCKSTEP_PACKETS = 4


def _lockstep_w(group: int) -> int:
    return max(1, LOCKSTEP_PACKETS // group)


def _walk_closest_multi(tabf, tabi, tabo, pn, pt, off_tri, off_nrm, end,
                        walks, tmin):
    """Interleaved consensus linked walks of ``len(walks)`` independent ray
    GROUPS (g, 8, 128) against the SMEM-resident chunk tables, in the
    block's octant's near-first order (``tabo``: succ | skip).

    ``walks``: list of (o, d, bt0); returns a list of merged best
    (t, slot, u, v, n) per walk. A finished (or dead-from-start) walk
    parks at ``end``; its per-iteration table reads stay in-bounds (the
    padded tables cover index ``end``) and its merges are gated off."""
    d_invs = [_inv(d) for (_, d, _) in walks]

    def init_one(o, d, bt0):
        shape = o[0].shape
        zeros = jnp.zeros(shape, jnp.float32)
        node0 = jnp.where(jnp.any(bt0 > tmin), jnp.int32(0), end)
        return (node0, bt0, jnp.full(shape, -1, jnp.int32), zeros, zeros,
                (zeros, zeros, zeros))

    init = tuple(init_one(*w) for w in walks)

    def cond(states):
        alive = states[0][0] != end
        for s in states[1:]:
            alive = alive | (s[0] != end)
        return alive

    def body(states):
        out = []
        for w, (o, d, _) in enumerate(walks):
            node, bt, bs, bu, bv, bn = states[w]
            alive = node != end
            first = tabi[node]
            is_leaf = first >= 0
            box_hit = _slab_tab(tabf, pn, o, d_invs[w], node, tmin, bt)
            any_box = jnp.any(box_hit)

            def leaf_case(carry, node=node, first=first, o=o, d=d):
                bt, bs, bu, bv, bn = carry
                count = tabi[pn + node]
                for k in range(LEAF_UNROLL):
                    sidx = first + k
                    t, u, v, hit = _mt_tab(tabf, off_tri, pt, o, d, sidx,
                                           tmin, bt)
                    hit = hit & (k < count)

                    def interp(bn, hit=hit, u=u, v=v, sidx=sidx):
                        w_ = 1.0 - u - v
                        return tuple(
                            jnp.where(
                                hit,
                                w_ * tabf[off_nrm + c * pt + sidx]
                                + u * tabf[off_nrm + (3 + c) * pt + sidx]
                                + v * tabf[off_nrm + (6 + c) * pt + sidx],
                                bn[c],
                            )
                            for c in range(3)
                        )

                    bn = jax.lax.cond(jnp.any(hit), interp, lambda b: b, bn)
                    bs = jnp.where(hit, sidx, bs)
                    bu = jnp.where(hit, u, bu)
                    bv = jnp.where(hit, v, bv)
                    bt = jnp.where(hit, t, bt)
                return bt, bs, bu, bv, bn

            bt, bs, bu, bv, bn = jax.lax.cond(
                alive & is_leaf & any_box, leaf_case, lambda c: c,
                (bt, bs, bu, bv, bn)
            )
            nxt = jnp.where(is_leaf | ~any_box, tabo[pn + node], tabo[node])
            nxt = jnp.where(alive, nxt, end)
            out.append((nxt, bt, bs, bu, bv, bn))
        return tuple(out)

    final = jax.lax.while_loop(cond, body, init)
    return [s[1:] for s in final]


def _mega_closest_kernel(
    # scalar-prefetch
    bits_ref,      # (E, W) uint32 live-block bitmask words
    octs_ref,      # (PB,) i32 per-block traversal octant
    # SMEM operands
    meshof_ref,    # (E,) i32
    w2o_ref,       # (E, 12) f32
    matid_ref,     # (E,) i32
    instid_ref,    # (E,) i32
    # HBM (ANY) operands
    tabf_hbm,      # (Cmesh * F,) f32
    tabi_hbm,      # (Cmesh * I,) i32
    tabo_hbm,      # (Cmesh * 8 * O,) i32 octant orderings
    rays_hbm,      # (6, P, 8, 128) f32
    st_hbm,        # aliased in (unused; st_out is the same buffer)
    # output (aliased to st_hbm)
    st_out,        # (9, P, 8, 128) f32
    # scratch
    tabf, tabi,    # SMEM chunk tables
    tabo,          # SMEM (oct_len,) current (chunk, octant) ordering
    cur_mesh,      # SMEM (2,) i32: current mesh | current (mesh, oct) key
    pend_blk,      # SMEM (2,) i32: HBM block of in-flight out-DMA, -1 none
    ray_buf,       # VMEM (2, 6, BP, 8, 128)
    st_buf,        # VMEM (2, 9, BP, 8, 128)
    sem_tab,       # DMA sem (3,)
    sem_in,        # DMA sem (2, 2)
    sem_out,       # DMA sem (2,)
    *,
    tmin: float,
    group: int,
    pn: int,
    pt: int,
    f32_len: int,
    i32_len: int,
    oct_len: int,
    num_blocks: int,
):
    e = pl.program_id(0)
    num_e = pl.num_programs(0)
    bp = BLOCK_PACKETS
    off_tri = 6 * pn
    off_nrm = off_tri + 9 * pt

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
        """DMA block b in, walk all groups, DMA state back."""
        # ---- chunk tables: DMA lazily, once per chunk transition ----
        # (inside process_block so an entry with NO live blocks never pays
        # the ~80 us table transfer — later bounce sweeps are mostly dead)
        @pl.when(cur_mesh[0] != mesh)
        def _():
            cur_mesh[0] = mesh
            dma_f = pltpu.make_async_copy(
                tabf_hbm.at[pl.ds(mesh * f32_len, f32_len)], tabf,
                sem_tab.at[0],
            )
            dma_i = pltpu.make_async_copy(
                tabi_hbm.at[pl.ds(mesh * i32_len, i32_len)], tabi,
                sem_tab.at[1],
            )
            dma_f.start()
            dma_i.start()
            dma_f.wait()
            dma_i.wait()

        # ---- octant ordering table: DMA per (chunk, octant) change ----
        okey = mesh * 8 + octs_ref[b]
        @pl.when(cur_mesh[1] != okey)
        def _():
            cur_mesh[1] = okey
            dma_o = pltpu.make_async_copy(
                tabo_hbm.at[pl.ds(okey * oct_len, oct_len)], tabo,
                sem_tab.at[2],
            )
            dma_o.start()
            dma_o.wait()

        # walk termination = the chunk's real node count (sentinel slot)
        end = tabi[i32_len - 1]

        # hazard: an in-flight out-DMA to the SAME HBM block must land
        # before we re-read it
        for s in range(2):
            @pl.when(pend_blk[s] == b)
            def _():
                pltpu.make_async_copy(
                    st_buf.at[s], st_out.at[:, pl.ds(pend_blk[s] * bp, bp)],
                    sem_out.at[s],
                ).wait()
                pend_blk[s] = -1

        # wait any pending out on THIS slot before overwriting its buffer
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

        def group_inputs(gs):
            ow = [ray_buf[slot, c, gs] for c in range(3)]
            dw = [ray_buf[slot, 3 + c, gs] for c in range(3)]
            o, d = _xform_rays(m, ow, dw)
            return o, d, st_buf[slot, ST_T, gs]

        def merge(gs, res):
            bt, bs, bu, bv, bn = res
            improved = bs >= 0
            nwx = m[0] * bn[0] + m[4] * bn[1] + m[8] * bn[2]
            nwy = m[1] * bn[0] + m[5] * bn[1] + m[9] * bn[2]
            nwz = m[2] * bn[0] + m[6] * bn[1] + m[10] * bn[2]

            def f32bits(x):
                return pltpu.bitcast(x, jnp.float32)

            def i32bits(x):
                return pltpu.bitcast(x, jnp.int32)

            st_buf[slot, ST_T, gs] = bt
            st_buf[slot, ST_VALID, gs] = f32bits(
                jnp.where(improved, 1, i32bits(st_buf[slot, ST_VALID, gs]))
            )
            st_buf[slot, ST_MAT, gs] = f32bits(
                jnp.where(improved, matid, i32bits(st_buf[slot, ST_MAT, gs]))
            )
            st_buf[slot, ST_INST, gs] = f32bits(
                jnp.where(improved, instid,
                          i32bits(st_buf[slot, ST_INST, gs]))
            )
            st_buf[slot, ST_NX, gs] = jnp.where(
                improved, nwx, st_buf[slot, ST_NX, gs])
            st_buf[slot, ST_NY, gs] = jnp.where(
                improved, nwy, st_buf[slot, ST_NY, gs])
            st_buf[slot, ST_NZ, gs] = jnp.where(
                improved, nwz, st_buf[slot, ST_NZ, gs])
            st_buf[slot, ST_U, gs] = jnp.where(
                improved, bu, st_buf[slot, ST_U, gs])
            st_buf[slot, ST_V, gs] = jnp.where(
                improved, bv, st_buf[slot, ST_V, gs])

        # lockstep-W groups walk per interleaved loop; dead groups
        # (scattered live lanes in bounce sweeps) park at `end` in one
        # iteration and skip their merge entirely
        w = _lockstep_w(group)
        gslices = [pl.ds(g0, group) for g0 in range(0, bp, group)]
        for i in range(0, len(gslices), w):
            part = gslices[i : i + w]
            walks = [group_inputs(gs) for gs in part]
            res = _walk_closest_multi(
                tabf, tabi, tabo, pn, pt, off_tri, off_nrm, end, walks,
                tmin,
            )
            for gs, wk, r in zip(part, walks, res):
                @pl.when(jnp.any(wk[2] > tmin))
                def _(gs=gs, r=r):
                    merge(gs, r)

        pltpu.make_async_copy(
            st_buf.at[slot], st_out.at[:, pl.ds(b * bp, bp)],
            sem_out.at[slot],
        ).start()
        pend_blk[slot] = b

    # ---- scan the bitmask row; process live blocks. The scan skips 32
    # blocks per all-zero word, so a dead sweep costs ~num_blocks/32 scalar
    # iterations instead of num_blocks ----
    _scan_bitmask(bits_ref, e, num_blocks, process_block)

    # ---- final step: flush pending out-DMAs ----
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


def _scan_bitmask(bits_ref, e, num_blocks, process_block):
    """Word-skipping scan of one bitmask row: for each set bit, call
    ``process_block(block_id, slot)`` with the alternating DMA slot."""
    num_words = -(-num_blocks // 32)

    def word_body(wi, slot):
        word = bits_ref[e, wi]

        def scan_word(slot):
            def bit_body(j, slot):
                b = wi * 32 + j
                bit = (word >> j) & jnp.uint32(1)

                def do(s):
                    process_block(b, s)
                    return (s + 1) % 2

                return jax.lax.cond(bit != 0, do, lambda s: s, slot)

            return jax.lax.fori_loop(0, 32, bit_body, slot, unroll=False)

        return jax.lax.cond(word != jnp.uint32(0), scan_word,
                            lambda s: s, slot)

    jax.lax.fori_loop(0, num_words, word_body, jnp.int32(0), unroll=False)


def mega_closest_sweep(
    scene, static,
    rays: jnp.ndarray,     # (6, P, 8, 128) packed world rays
    tmin: float,
    state: jnp.ndarray,    # (9, P, 8, 128) packed trace state
    group: int,
) -> jnp.ndarray:
    """One full closest-hit sweep (every traversal entry) in ONE kernel."""
    p = rays.shape[1]
    assert p % BLOCK_PACKETS == 0
    pn, pt, f32_len, i32_len = static.mega_layout
    oct_len = _align(2 * pn)
    num_blocks = p // BLOCK_PACKETS

    bits, octs, depth = chunk_block_hits(scene, static, rays, state[ST_T],
                                         tmin)
    entries = static.traversal_list
    e_n = len(entries)
    meshof = jnp.asarray([m for _, m in entries], jnp.int32)
    instid = jnp.asarray([i for i, _ in entries], jnp.int32)
    # near-to-far entry order: carried best_t parks far chunks at their
    # root test (chunk-level front-to-back; costs extra table DMAs when it
    # splits a mesh's chunk run — net win on overlapping-chunk scenes)
    perm = jnp.argsort(depth)
    bits = jnp.take(bits, perm, axis=0)
    meshof = jnp.take(meshof, perm)
    instid = jnp.take(instid, perm)
    w2o = scene.w2o[instid].reshape(e_n, 12)
    matid = scene.materials[instid].astype(jnp.int32)

    kernel = functools.partial(
        _mega_closest_kernel,
        tmin=float(tmin), group=group, pn=pn, pt=pt,
        f32_len=f32_len, i32_len=i32_len, oct_len=oct_len,
        num_blocks=num_blocks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meshof
            pl.BlockSpec(memory_space=pltpu.SMEM),   # w2o
            pl.BlockSpec(memory_space=pltpu.SMEM),   # matid
            pl.BlockSpec(memory_space=pltpu.SMEM),   # instid
            pl.BlockSpec(memory_space=pl.ANY),       # tabf
            pl.BlockSpec(memory_space=pl.ANY),       # tabi
            pl.BlockSpec(memory_space=pl.ANY),       # tabo
            pl.BlockSpec(memory_space=pl.ANY),       # rays
            pl.BlockSpec(memory_space=pl.ANY),       # state (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((f32_len,), jnp.float32),
            pltpu.SMEM((i32_len,), jnp.int32),
            pltpu.SMEM((oct_len,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((2, 6, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((2, 9, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((9, p, K_SUB, K_LANE), jnp.float32),
        input_output_aliases={10: 0},  # state (after 2 prefetch + 8 ins)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bits, octs, meshof, w2o, matid, instid,
      scene.mega_f32, scene.mega_i32, scene.mega_oct, rays, state)
    return out


# ---------------------------------------------------------------------------
# any-hit (occlusion) megakernel
# ---------------------------------------------------------------------------

def _walk_anyhit_multi(tabf, tabi, tabo, pn, pt, off_tri, end, walks,
                       tmin):
    """Interleaved occlusion walks (see :func:`_walk_closest_multi`).

    ``walks``: list of (o, d, tmax, occ0); returns occluded per walk.
    Each walk early-exits (parks at ``end``) as soon as every live lane
    is occluded."""
    d_invs = [_inv(d) for (_, d, _, _) in walks]
    live0s = [tmax > tmin for (_, _, tmax, _) in walks]

    def init_one(i):
        _, _, _, occ0 = walks[i]
        pending = live0s[i] & (occ0 == 0)
        node0 = jnp.where(jnp.any(pending), jnp.int32(0), end)
        return (node0, occ0)

    init = tuple(init_one(i) for i in range(len(walks)))

    def cond(states):
        alive = states[0][0] != end
        for s in states[1:]:
            alive = alive | (s[0] != end)
        return alive

    def body(states):
        out = []
        for w, (o, d, tmax, _) in enumerate(walks):
            node, occluded = states[w]
            alive = node != end
            first = tabi[node]
            is_leaf = first >= 0
            pending_t = jnp.where(live0s[w] & (occluded == 0), tmax, 0.0)
            box_hit = _slab_tab(tabf, pn, o, d_invs[w], node, tmin,
                                pending_t)
            any_box = jnp.any(box_hit)

            def leaf_case(occ, node=node, first=first, o=o, d=d,
                          pending_t=pending_t):
                count = tabi[pn + node]
                for k in range(LEAF_UNROLL):
                    _, _, _, hit = _mt_tab(tabf, off_tri, pt, o, d,
                                           first + k, tmin, pending_t)
                    occ = occ | (hit & (k < count)).astype(jnp.int32)
                return occ

            occluded = jax.lax.cond(alive & is_leaf & any_box, leaf_case,
                                    lambda c: c, occluded)
            done = ~jnp.any(live0s[w] & (occluded == 0))
            nxt = jnp.where(is_leaf | ~any_box, tabo[pn + node], tabo[node])
            nxt = jnp.where(done | ~alive, end, nxt)
            out.append((nxt, occluded))
        return tuple(out)

    final = jax.lax.while_loop(cond, body, init)
    return [occ for (_, occ) in final]


def _mega_anyhit_kernel(
    bits_ref, octs_ref,
    meshof_ref, w2o_ref,
    tabf_hbm, tabi_hbm, tabo_hbm, rays_hbm, tmax_hbm, occ_in_hbm,
    occ_out,
    tabf, tabi, tabo, cur_mesh, pend_blk, ray_buf, tmax_buf, occ_buf,
    sem_tab, sem_in, sem_out,
    *,
    tmin: float, group: int, pn: int, pt: int,
    f32_len: int, i32_len: int, oct_len: int, num_blocks: int,
):
    e = pl.program_id(0)
    num_e = pl.num_programs(0)
    bp = BLOCK_PACKETS
    off_tri = 6 * pn

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
            dma_f = pltpu.make_async_copy(
                tabf_hbm.at[pl.ds(mesh * f32_len, f32_len)], tabf,
                sem_tab.at[0],
            )
            dma_i = pltpu.make_async_copy(
                tabi_hbm.at[pl.ds(mesh * i32_len, i32_len)], tabi,
                sem_tab.at[1],
            )
            dma_f.start()
            dma_i.start()
            dma_f.wait()
            dma_i.wait()

        okey = mesh * 8 + octs_ref[b]
        @pl.when(cur_mesh[1] != okey)
        def _():
            cur_mesh[1] = okey
            dma_o = pltpu.make_async_copy(
                tabo_hbm.at[pl.ds(okey * oct_len, oct_len)], tabo,
                sem_tab.at[2],
            )
            dma_o.start()
            dma_o.wait()

        end = tabi[i32_len - 1]

        for s in range(2):
            @pl.when(pend_blk[s] == b)
            def _():
                pltpu.make_async_copy(
                    occ_buf.at[s], occ_out.at[pl.ds(pend_blk[s] * bp, bp)],
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

        def group_inputs(gs):
            ow = [ray_buf[slot, c, gs] for c in range(3)]
            dw = [ray_buf[slot, 3 + c, gs] for c in range(3)]
            o, d = _xform_rays(m, ow, dw)
            return o, d, tmax_buf[slot, gs], occ_buf[slot, gs]

        w = _lockstep_w(group)
        gslices = [pl.ds(g0, group) for g0 in range(0, bp, group)]
        for i in range(0, len(gslices), w):
            part = gslices[i : i + w]
            walks = [group_inputs(gs) for gs in part]
            res = _walk_anyhit_multi(
                tabf, tabi, tabo, pn, pt, off_tri, end, walks, tmin
            )
            for gs, wk, occ in zip(part, walks, res):
                @pl.when(jnp.any((wk[2] > tmin) & (wk[3] == 0)))
                def _(gs=gs, occ=occ):
                    occ_buf[slot, gs] = occ

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


def mega_anyhit_sweep(
    scene, static,
    rays: jnp.ndarray,       # (6, P, 8, 128)
    tmin: float,
    tmax_reg: jnp.ndarray,   # (P, 8, 128) per-lane shadow window
    occ: jnp.ndarray,        # (P, 8, 128) int32, consumed (donated)
    group: int,
    order: str = "origin",   # entry order (entry_perm)
) -> jnp.ndarray:
    p = rays.shape[1]
    assert p % BLOCK_PACKETS == 0
    # anyhit-specialized chunk set (no normal planes → ~55% more tris per
    # chunk → fewer entries + fewer table DMAs per shadow sweep); bit-
    # identical: occlusion is an order-independent OR over triangles
    if static.mega_shadow_layout is not None:
        pn, pt, f32_len, i32_len = static.mega_shadow_layout
        entries = static.shadow_traversal_list
        tab_f32, tab_i32, tab_oct = (
            scene.mega_sh_f32, scene.mega_sh_i32, scene.mega_sh_oct
        )
        roots = scene.mega_sh_root
    else:
        pn, pt, f32_len, i32_len = static.mega_layout
        entries = static.traversal_list
        tab_f32, tab_i32, tab_oct = (
            scene.mega_f32, scene.mega_i32, scene.mega_oct
        )
        roots = None
    oct_len = _align(2 * pn)
    num_blocks = p // BLOCK_PACKETS

    bits, octs, depth = chunk_block_hits(scene, static, rays, tmax_reg,
                                         tmin, roots=roots, entries=entries)
    e_n = len(entries)
    meshof = jnp.asarray([m for _, m in entries], jnp.int32)
    instid = jnp.asarray([i for i, _ in entries], jnp.int32)
    # near-first entries: occluded lanes drop out of later chunk walks
    perm = entry_perm(scene, static, depth, roots, entries, order)
    bits = jnp.take(bits, perm, axis=0)
    meshof = jnp.take(meshof, perm)
    instid = jnp.take(instid, perm)
    w2o = scene.w2o[instid].reshape(e_n, 12)

    kernel = functools.partial(
        _mega_anyhit_kernel,
        tmin=float(tmin), group=group, pn=pn, pt=pt,
        f32_len=f32_len, i32_len=i32_len, oct_len=oct_len,
        num_blocks=num_blocks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((f32_len,), jnp.float32),
            pltpu.SMEM((i32_len,), jnp.int32),
            pltpu.SMEM((oct_len,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((2, 6, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((2, BLOCK_PACKETS, K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((2, BLOCK_PACKETS, K_SUB, K_LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.int32),
        input_output_aliases={9: 0},   # occ (after 2 prefetch + 8 ins)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bits, octs, meshof, w2o,
      tab_f32, tab_i32, tab_oct, rays, tmax_reg, occ)
    return out
