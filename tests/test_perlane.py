"""Per-lane tier components testable off-TPU: the treelet partition, the
packed two-level tables (site map, localized octant links, node-indexed
MT rows), and dispatch gating.

The compiled kernels are TPU-only (like the megakernel: manual DMA +
gather semantics); on TPU their bit-equality against the chained
reference path is enforced by ``tests/test_mega.py``-style gates and the
CPU replay ``tools/r4_pack_check.py`` validates the exact walk algorithm
on these tables against a reference walk.
"""

import numpy as np
import pytest

from raytpu.accel.bvh import build_bvh
from raytpu.ops.mega import octant_links
from raytpu.ops.perlane import (
    DONE,
    NODE_CAP,
    OFF_NRM_ROW,
    ROWS_ANYHIT,
    ROWS_CLOSEST,
    pack_perlane_tables,
    treelet_partition,
)


def _random_chunk(n_tris=700, seed=0):
    rng = np.random.RandomState(seed)
    v0 = rng.randn(n_tris, 3).astype(np.float32)
    e1 = rng.randn(n_tris, 3).astype(np.float32) * 0.1
    e2 = rng.randn(n_tris, 3).astype(np.float32) * 0.1
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    order = bvh.tri_order.astype(np.int64)
    return {
        "aabb_min": bvh.aabb_min, "aabb_max": bvh.aabb_max,
        "first": bvh.tri_first, "count": bvh.tri_count, "miss": bvh.miss,
        "v0": v0[order], "e1": e1[order], "e2": e2[order],
        "n_soa": rng.randn(9, n_tris).astype(np.float32),
    }


@pytest.fixture(scope="module")
def chunk():
    return _random_chunk()


def test_partition_invariants(chunk):
    first, count, miss = chunk["first"], chunk["count"], chunk["miss"]
    n = first.shape[0]
    tid, nt = treelet_partition(first, count, miss)
    assert nt >= 1
    # every node assigned; treelets are DFS-contiguous subtree spans
    assert ((tid >= 0) & (tid <= nt)).all()
    for t in range(nt):
        ids = np.flatnonzero(tid == t)
        assert ids.size <= NODE_CAP
        assert (np.diff(ids) == 1).all(), "treelet not DFS-contiguous"
        root = ids[0]
        assert miss[root] == ids[-1] + 1, "treelet is not a full subtree"
    # the top tree never contains leaves (every leaf fits a treelet)
    assert (first[tid == nt] < 0).all()
    # every leaf is in a treelet
    assert (tid[first >= 0] < nt).all()


def test_packed_tables(chunk):
    arrays, lay = pack_perlane_tables([chunk], normals=True)
    pad_nodes, t_pad, box_len, tid_len, rows, qsc_len, pair_bits = lay
    assert pair_bits == 0
    assert rows == ROWS_CLOSEST
    n = chunk["first"].shape[0]
    tid, nt = treelet_partition(chunk["first"], chunk["count"],
                                chunk["miss"])
    # site map: treelet id exactly at roots, -1 at top-interior nodes;
    # sentinel = node count (box/tid arrays are flat 1-D for SMEM DMA)
    tid_flat = arrays["tid"].reshape(1, tid_len)
    sites = tid_flat[0, :n]
    assert tid_flat[0, tid_len - 1] == n
    roots = {}
    for t in range(nt):
        roots[t] = int(np.flatnonzero(tid == t)[0])
        assert sites[roots[t]] == t
    assert (sites[tid == nt] == -1).all()

    succ, skip = octant_links(chunk["aabb_min"], chunk["aabb_max"],
                              chunk["first"], chunk["miss"])
    planes = arrays["planes"][0]
    links = arrays["links"].reshape(1, 8, t_pad, 8, 128)[0]
    mt = arrays["mt"][0]
    ids = np.arange(n)
    in_t = tid < nt

    qsc = arrays["qsc"].reshape(1, qsc_len)[0]

    def unpack_pln(w, t, a):
        u = np.int64(w) & 0xFFFFFFFF
        q_lo = np.float32(u & 0xFFFF)
        q_hi = np.float32((u >> 16) & 0xFFFF)
        org = qsc[t * 8 + 2 * a]
        sc = qsc[t * 8 + 2 * a + 1]
        return float(org + q_lo * sc), float(org + q_hi * sc), float(sc)

    for g in np.flatnonzero(in_t)[:: max(1, n // 64)]:
        t = tid[g]
        ll = g - roots[t]
        # packed planes replicated across sublanes; dequantized bounds
        # are conservative (lo <= aabb_min, hi >= aabb_max) within a few
        # 2^-16 grid steps of the treelet extent
        for a in range(3):
            w0 = planes[t, a, 0, ll]
            assert (planes[t, a, :, ll] == w0).all()
            lo, hi, sc = unpack_pln(w0, t, a)
            fmin = float(chunk["aabb_min"][g, a])
            fmax = float(chunk["aabb_max"][g, a])
            assert lo <= fmin and hi >= fmax
            assert fmin - lo <= 3.0 * max(sc, 1e-30)
            assert hi - fmax <= 3.0 * max(sc, 1e-30)
        # localized links in ONE packed word: same-treelet targets keep
        # DFS offsets, exits become the DONE sentinel
        cnt = chunk["count"][g] if chunk["first"][g] >= 0 else 0
        for o in (0, 3, 7):
            word = int(links[o, t, 0, ll])
            for shift, lk in ((0, succ), (7, skip)):
                tgt = lk[o, g]
                want = (tgt - roots[t]
                        if tgt < n and tid[min(tgt, n - 1)] == t
                        and tgt >= roots[t] else DONE)
                assert (word >> shift) & 127 == want
            assert word >> 14 == cnt
            assert (links[o, t, :, ll] == word).all()
        # node-indexed MT rows carry the leaf's triangles
        if chunk["first"][g] >= 0:
            f = chunk["first"][g]
            for k in range(int(cnt)):
                for a in range(3):
                    assert mt[t, k * 9 + a, ll] == chunk["v0"][f + k, a]
                    assert mt[t, k * 9 + 3 + a, ll] == (
                        chunk["e1"][f + k, a])
                    assert mt[t, k * 9 + 6 + a, ll] == (
                        chunk["e2"][f + k, a])
                for p9 in range(9):
                    assert mt[t, OFF_NRM_ROW + k * 9 + p9, ll] == (
                        chunk["n_soa"][p9][f + k])


def test_packed_tables_pair(chunk):
    """Pair-test format (``pair=True``): per-parent child box slots in
    build order, link word carrying (near, far, pexit, int flags, own
    count, swap), exit chains threaded past same-treelet leaf siblings."""
    arrays, lay = pack_perlane_tables([chunk], normals=True, pair=True)
    _, t_pad, _, tid_len, _, qsc_len, pair_bits = lay
    assert pair_bits == 16
    n = chunk["first"].shape[0]
    first, count, miss = chunk["first"], chunk["count"], chunk["miss"]
    tid, nt = treelet_partition(first, count, miss)
    leaf = first >= 0
    planes = arrays["planes"][0]
    assert planes.shape[1] == 6
    links = arrays["links"].reshape(1, 8, t_pad, 8, 128)[0]
    qsc = arrays["qsc"].reshape(1, qsc_len)[0]
    succ, skip = octant_links(chunk["aabb_min"], chunk["aabb_max"],
                              first, miss)
    roots = {t: int(np.flatnonzero(tid == t)[0]) for t in range(nt)}
    ids = np.arange(n)
    in_t = tid < nt

    def deq(w, t, a):
        u = np.int64(w) & 0xFFFFFFFF
        org = qsc[t * 8 + 2 * a]
        sc = qsc[t * 8 + 2 * a + 1]
        return (float(org + np.float32(u & 0xFFFF) * sc),
                float(org + np.float32((u >> 16) & 0xFFFF) * sc))

    for g in np.flatnonzero(in_t)[:: max(1, n // 96)]:
        t = tid[g]
        rt = roots[t]
        ll = g - rt
        word = int(links[0, t, 0, ll])
        near = word & 127
        far = (word >> 7) & 127
        pexit = (word >> 14) & 127
        int_n = (word >> 21) & 1
        int_f = (word >> 22) & 1
        cnt = (word >> 23) & 15
        swap = (word >> 27) & 1
        if leaf[g]:
            # leaf (stepped only as a single-leaf treelet root): near =
            # self pushed once, far routed to DONE with int_f=1 (slot B's
            # slab cannot miss — inverted intervals normalize under the
            # min/max slab test), cnt = own triangle count, slot 0 = the
            # OWN box
            assert near == ll and far == DONE and int_f == 1
            assert pexit == DONE
            assert cnt == count[g]
            for a in range(3):
                lo, hi = deq(planes[t, 2 * a, 0, ll], t, a)
                assert lo <= chunk["aabb_min"][g, a]
                assert hi >= chunk["aabb_max"][g, a]
        else:
            assert cnt == 0
            c1 = g + 1                       # build-order first child
            c2 = min(int(miss[c1]), n - 1)   # its skip = second child
            # octant-0 near child is succ; far is the sibling
            gnear = succ[0, g]
            gfar = c2 if gnear == c1 else c1
            assert near == gnear - rt and far == gfar - rt
            assert swap == (1 if gnear == c2 else 0)
            assert int_n == (0 if leaf[gnear] else 1)
            assert int_f == (0 if leaf[gfar] else 1)
            # box slots carry the BUILD-order children's boxes
            for slot, gc in ((0, c1), (1, c2)):
                for a in range(3):
                    lo, hi = deq(planes[t, 2 * a + slot, 0, ll], t, a)
                    assert lo <= chunk["aabb_min"][gc, a]
                    assert hi >= chunk["aabb_max"][gc, a]
            # exit chain: follows skip, threaded past same-treelet leaves
            pe = int(skip[0, g])
            for _ in range(n):
                if pe >= n or not leaf[pe] or tid[pe] != t:
                    break
                pe = int(skip[0, pe])
            want = pe - rt if pe < n and tid[min(pe, n - 1)] == t \
                and pe >= rt else DONE
            assert pexit == want


def test_packed_tables_pair8(chunk):
    """8-bit pair format (``qbits=8``): one word per axis carries BOTH
    children's conservative bounds (loA | hiA<<8 | loB<<16 | hiB<<24 on
    the 255-step treelet grid); links identical to pair16."""
    arrays, lay = pack_perlane_tables([chunk], normals=True, pair=True,
                                      qbits=8)
    a16, l16 = pack_perlane_tables([chunk], normals=True, pair=True)
    _, t_pad, _, tid_len, _, qsc_len, pair_bits = lay
    assert pair_bits == 8
    planes = arrays["planes"][0]
    assert planes.shape[1] == 3
    np.testing.assert_array_equal(arrays["links"], a16["links"])
    np.testing.assert_array_equal(arrays["tid"], a16["tid"])
    qsc = arrays["qsc"].reshape(1, qsc_len)[0]
    n = chunk["first"].shape[0]
    first, count, miss = chunk["first"], chunk["count"], chunk["miss"]
    tid, nt = treelet_partition(first, count, miss)
    leaf = first >= 0
    roots = {t: int(np.flatnonzero(tid == t)[0]) for t in range(nt)}
    in_t = tid < nt

    def deq8(w, t, a, sh):
        u = np.int64(w) & 0xFFFFFFFF
        org = qsc[t * 8 + 2 * a]
        sc = qsc[t * 8 + 2 * a + 1]
        return (float(org + np.float32((u >> sh) & 0xFF) * sc),
                float(org + np.float32((u >> (sh + 8)) & 0xFF) * sc))

    for g in np.flatnonzero(in_t)[:: max(1, n // 96)]:
        t = tid[g]
        ll = g - roots[t]
        if leaf[g]:
            for a in range(3):
                lo, hi = deq8(planes[t, a, 0, ll], t, a, 0)
                assert lo <= chunk["aabb_min"][g, a]
                assert hi >= chunk["aabb_max"][g, a]
        else:
            c1 = g + 1
            c2 = min(int(miss[c1]), n - 1)
            for sh, gc in ((0, c1), (16, c2)):
                for a in range(3):
                    lo, hi = deq8(planes[t, a, 0, ll], t, a, sh)
                    assert lo <= chunk["aabb_min"][gc, a], (g, gc, a)
                    assert hi >= chunk["aabb_max"][gc, a], (g, gc, a)


def test_quantize_axis_conservative():
    """16-bit treelet-grid plane quantization: dequantized lo never
    exceeds the true lo and dequantized hi never undercuts the true hi
    under BOTH kernel rounding orders (mul+add and fma), and the slack
    stays within ~2 grid steps of the treelet extent."""
    from raytpu.ops.perlane import _dequant_both, quantize_axis

    rng = np.random.RandomState(7)
    for trial in range(20):
        org = np.float32(rng.randn() * 10.0 ** rng.randint(-3, 4))
        ext = abs(rng.randn()) * 10.0 ** rng.randint(-3, 4)
        lo = (org + ext * rng.rand(257)).astype(np.float32)
        hi = (lo + ext * rng.rand(257) * 0.2).astype(np.float32)
        hi = np.minimum(hi, np.float32(np.float64(org) + ext))
        lo = np.minimum(lo, hi)
        q_lo, q_hi, scale = quantize_axis(lo, hi, float(org), float(ext))
        for q, bound, side in ((q_lo, lo, "lo"), (q_hi, hi, "hi")):
            a, b = _dequant_both(q, org, scale)
            if side == "lo":
                assert (a <= bound).all() and (b <= bound).all()
                assert (bound - a <= 3.0 * max(scale, 1e-30)).all()
            else:
                assert (a >= bound).all() and (b >= bound).all()
                assert (a - bound <= 3.0 * max(scale, 1e-30)).all()
    # degenerate extent: dequant collapses to the origin exactly
    q_lo, q_hi, scale = quantize_axis(
        np.float32([2.5, 2.5]), np.float32([2.5, 2.5]), 2.5, 0.0
    )
    assert scale == 0.0 and (q_lo == 0).all() and (q_hi == 0).all()


def test_packed_anyhit_layout(chunk):
    arrays, lay = pack_perlane_tables([chunk], normals=False)
    assert lay[4] == ROWS_ANYHIT
    assert arrays["mt"].shape[2] == ROWS_ANYHIT


def test_dispatch_gating_off_tpu():
    import jax

    from raytpu.device_scene import SceneStatic
    from raytpu.ops.trace import _use_perlane

    static = SceneStatic(
        mesh_prim_ranges=((0, 12),), instance_mesh=(0,),
        mesh_node_ranges=((0, 3),), traversal="perlane",
        perlane_layout=(8, 1, 1024, 1024, 80, 1024, 16),
    )
    use = _use_perlane(static, 8, 1024)
    assert use == (jax.default_backend() == "tpu")
    import dataclasses

    # "auto" follows the scene-build tier resolution (default mega)
    static2 = dataclasses.replace(static, traversal="auto")
    assert not _use_perlane(static2, 8, 1024)
    static3 = dataclasses.replace(static2, auto_tier="perlane")
    assert _use_perlane(static3, 8, 1024) == (
        jax.default_backend() == "tpu")


def test_auto_tier_measured_table():
    """resolve_auto_tier encodes the measured preset A/B outcomes: big
    meshes and spp=1 bounce scenes route per-lane, small coherent spp>1
    scenes stay on the megakernel."""
    from raytpu.accel import resolve_auto_tier

    assert resolve_auto_tier(333_000, 4, 3) == "perlane"   # config4
    assert resolve_auto_tier(333_000, 4, 63) == "perlane"  # reference
    assert resolve_auto_tier(6_332, 1, 3) == "perlane"     # config5
    assert resolve_auto_tier(6_320, 4, 2) == "mega"        # config2
    assert resolve_auto_tier(36, 4, 3) == "mega"           # config3
    assert resolve_auto_tier(12, 1, 0) == "mega"           # config1


# ---------------------------------------------------------------------------
# quad-test format (round-5 branching-factor probe)
# ---------------------------------------------------------------------------


def _mt_np(v0, e1, e2, o, d, tmin, tmax):
    """Möller–Trumbore in float32 numpy — same formula as the kernels'
    _mt_tab/_mt_bank (and the sim below), vectorized over triangles."""
    f = np.float32
    px = d[1] * e2[:, 2] - d[2] * e2[:, 1]
    py = d[2] * e2[:, 0] - d[0] * e2[:, 2]
    pz = d[0] * e2[:, 1] - d[1] * e2[:, 0]
    det = e1[:, 0] * px + e1[:, 1] * py + e1[:, 2] * pz
    inv_det = np.where(np.abs(det) > f(1e-9), f(1.0) / det, f(0.0))
    tvx, tvy, tvz = o[0] - v0[:, 0], o[1] - v0[:, 1], o[2] - v0[:, 2]
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1[:, 2] - tvz * e1[:, 1]
    qy = tvz * e1[:, 0] - tvx * e1[:, 2]
    qz = tvx * e1[:, 1] - tvy * e1[:, 0]
    v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
    t = (e2[:, 0] * qx + e2[:, 1] * qy + e2[:, 2] * qz) * inv_det
    hit = ((np.abs(det) > f(1e-9)) & (u >= 0) & (v >= 0) & (u + v <= 1)
           & (t > tmin) & (t < tmax))
    return t, hit


def _sim_quad_walk(chunk, arrays, lay, o, d, tmin, tmax):
    """Host replay of the packed quad walk (top tree + quad steps +
    masked-parent drains) straight off the packed arrays — validates
    every field of the format against brute force."""
    from raytpu.ops.perlane import QUAD_BITS

    pn, t_pad, box_len, tid_len, rows_mt, qsc_len, pb = lay
    assert pb == QUAD_BITS
    f = np.float32
    box = arrays["box"]
    tidm = arrays["tid"]
    qsc = arrays["qsc"]
    planes = arrays["planes"][0]        # (t_pad, 12, 8, 128)
    links = arrays["links"]             # (8, t_pad, 2, 8, 128)
    mt = arrays["mt"][0]
    n = int(tidm[tid_len - 1])
    succ, skip = octant_links(chunk["aabb_min"], chunk["aabb_max"],
                              chunk["first"], chunk["miss"])
    oc = int((d[0] < 0) | ((d[1] < 0) << 1) | ((d[2] < 0) << 2))
    d_inv = np.where(d != 0, f(1.0) / d,
                     np.where(d >= 0, np.float32(np.inf),
                              np.float32(-np.inf))).astype(f)
    best = f(tmax)

    def deq(t, a, w):
        u = np.int64(w) & 0xFFFFFFFF
        org = qsc[t * 8 + 2 * a]
        sc = qsc[t * 8 + 2 * a + 1]
        return (f(org + f(u & 0xFFFF) * sc),
                f(org + f((u >> 16) & 0xFFFF) * sc))

    def mt_slot(site, k, cid, tfar):
        v0 = np.asarray([mt[site, k * 9 + a, cid] for a in range(3)], f)
        e1 = np.asarray([mt[site, k * 9 + 3 + a, cid] for a in range(3)], f)
        e2 = np.asarray([mt[site, k * 9 + 6 + a, cid] for a in range(3)], f)
        t, hit = _mt_np(v0[None, :], e1[None, :], e2[None, :], o, d,
                        tmin, tfar)
        return (f(t[0]), bool(hit[0]))

    def qslab(site, sj, lnode, tfar):
        """Quantized slab test of build slot sj at parent lnode — the
        kernel's _slab_slot(width=4) semantics."""
        tns, tfs = [], []
        for a in range(3):
            lo, hi = deq(site, a, planes[site, 4 * a + sj, 0, lnode])
            t0 = (lo - o[a]) * d_inv[a]
            t1 = (hi - o[a]) * d_inv[a]
            tns.append(min(t0, t1))
            tfs.append(max(t0, t1))
        return max(max(tns), tmin) <= min(min(tfs), tfar)

    def treelet_walk(site):
        nonlocal best
        lnode = 0
        queue = []
        steps = 0
        while lnode != DONE or queue:
            steps += 1
            assert steps < 10_000, "quad walk does not terminate"
            if lnode != DONE:
                w1 = int(links[oc, site, 0, 0, lnode]) & 0xFFFFFFFF
                w2 = int(links[oc, site, 1, 0, lnode])
                pexit = w2 & 127
                valid = (w2 >> 7) & 15
                smap = (w2 >> 11) & 255
                target = pexit
                taken = False
                mask = 0
                for j in range(4):
                    cj = (w1 >> (8 * j)) & 127
                    ij = (w1 >> (8 * j + 7)) & 1
                    if not ((valid >> j) & 1):
                        continue
                    sj = (smap >> (2 * j)) & 3
                    if not qslab(site, sj, lnode, best):
                        continue
                    if ij:
                        if not taken:
                            target = cj
                            taken = True
                    else:
                        mask |= 1 << j
                if mask:
                    queue.append((lnode, mask))
                lnode = target
            else:
                pid, mask = queue.pop(0)
                w1 = int(links[oc, site, 0, 0, pid]) & 0xFFFFFFFF
                for ci in range(4):
                    if not ((mask >> ci) & 1):
                        continue
                    cid = (w1 >> (8 * ci)) & 127
                    cnt = (int(links[oc, site, 1, 0, cid]) >> 19) & 15
                    assert cnt > 0, "masked child with zero count"
                    for k in range(cnt):
                        t, hit = mt_slot(site, k, cid, best)
                        if hit:
                            best = t

    # top-tree walk (consensus analog, one lane): SMEM box planes + the
    # mega octant links (recomputed here — the kernel DMAs scene.mega_oct)
    tnode = 0
    while tnode != n:
        site = int(tidm[tnode])
        tns, tfs = [], []
        for a in range(3):
            lo = box[a * pn + tnode]
            hi = box[(3 + a) * pn + tnode]
            t0 = (lo - o[a]) * d_inv[a]
            t1 = (hi - o[a]) * d_inv[a]
            tns.append(min(t0, t1))
            tfs.append(max(t0, t1))
        bhit = max(max(tns), tmin) <= min(min(tfs), best)
        if site >= 0:
            if bhit:
                treelet_walk(site)
            tnode = int(skip[oc, tnode])
        else:
            tnode = int(succ[oc, tnode]) if bhit else int(skip[oc, tnode])
    return best


def test_packed_tables_quad(chunk):
    """Quad format (``quad=True``): host replay of the packed quad walk
    (word fields, slot map, per-octant order, pexit chains, masked-parent
    drains) must find the SAME closest hit as brute force over all
    triangles, for random rays in every direction octant."""
    from raytpu.ops.perlane import QUAD_BITS

    arrays, lay = pack_perlane_tables([chunk], normals=True, quad=True)
    assert lay[6] == QUAD_BITS
    assert arrays["planes"].shape[2] == 12
    assert arrays["links"].shape[2:] == (2, 8, 128)

    rng = np.random.RandomState(5)
    tmin, tmax = np.float32(1e-3), np.float32(1e30)
    n_hits = 0
    for i in range(160):
        o = (rng.randn(3) * 2.5).astype(np.float32)
        if i % 2 == 0:
            # aim at a random triangle's centroid so most rays HIT
            ti = rng.randint(chunk["v0"].shape[0])
            c = (chunk["v0"][ti] + chunk["e1"][ti] / 3
                 + chunk["e2"][ti] / 3)
            d = (c - o).astype(np.float32)
        else:
            d = rng.randn(3).astype(np.float32)
        d = (d / np.linalg.norm(d)).astype(np.float32)
        t_brute, hit = _mt_np(chunk["v0"], chunk["e1"], chunk["e2"],
                              o, d, tmin, tmax)
        ref = float(t_brute[hit].min()) if hit.any() else float(tmax)
        got = float(_sim_quad_walk(chunk, arrays, lay, o, d, tmin, tmax))
        assert got == ref, (i, got, ref)
        n_hits += int(hit.any())
    assert n_hits > 40  # the rays actually exercise the geometry
