#!/usr/bin/env python
"""CPU validation of the per-lane tier's packed tables + walk algorithm.

Replays the EXACT two-level kernel algorithm (top consensus walk over the
SMEM tables, per-lane treelet walks via the packed gather banks, 4-deep
deferred-leaf queues drained through the node-indexed MT rows) in numpy,
using ONLY the arrays ``pack_perlane_tables`` produces — and compares
closest-hit (t, u, v) and occlusion results against a direct
single-level reference walk on the raw chunk arrays. Catches builder
bugs (localized links, bank contents, site maps) and algorithm bugs
(queue ordering, drain windows) before any TPU compile.

Run: JAX_PLATFORMS=cpu python tools/r4_pack_check.py [preset]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

QD = 4
DONE = 127


def ref_walk(c, oct_id, o3, d3, bt, anyhit, win=None):
    """Single-level per-lane reference walk on raw chunk arrays (octant
    links, eager MT) — mirrors the chained kernel's per-lane semantics."""
    from raytpu.ops.mega import octant_links

    succ, skip = octant_links(c["aabb_min"], c["aabb_max"], c["first"],
                              c["miss"])
    succ, skip = succ[oct_id], skip[oct_id]
    n = c["aabb_min"].shape[0]
    L = o3.shape[1]
    with np.errstate(divide="ignore"):
        inv3 = np.where(d3 != 0, 1.0 / np.where(d3 == 0, 1, d3),
                        np.where(d3 >= 0, np.inf, -np.inf))
    tmin = 1e-3
    node = np.zeros(L, np.int64)
    occ = np.zeros(L, np.int64)
    bu = np.zeros(L, np.float32)
    bv = np.zeros(L, np.float32)
    hit_any = np.zeros(L, bool)
    live = (win if anyhit else bt) > tmin
    node[~live] = n
    while (node < n).any():
        act = node < n
        nc = np.minimum(node, n - 1)
        lo = c["aabb_min"][nc].T
        hi = c["aabb_max"][nc].T
        eff = np.where(occ == 0, win, 0.0) if anyhit else bt
        with np.errstate(invalid="ignore"):
            tn = np.full(L, tmin, np.float32)
            tf = eff.copy().astype(np.float32)
            for a in range(3):
                t0 = (lo[a] - o3[a]) * inv3[a]
                t1 = (hi[a] - o3[a]) * inv3[a]
                tn = np.maximum(tn, np.minimum(t0, t1))
                tf = np.minimum(tf, np.maximum(t0, t1))
        box = (tn <= tf) & act
        fi = c["first"][nc]
        leaf = fi >= 0
        do_leaf = box & leaf
        if do_leaf.any():
            for k in range(4):
                s = np.minimum(np.where(leaf, fi, 0) + k,
                               c["v0"].shape[0] - 1)
                vk = do_leaf & (k < c["count"][nc])
                t, u, v, h = mt_np(c, s, o3, d3, tmin,
                                   np.where(occ == 0, win, 0.0)
                                   if anyhit else bt)
                h = h & vk
                if anyhit:
                    occ |= h.astype(np.int64)
                else:
                    bt[h] = t[h]
                    bu[h] = u[h]
                    bv[h] = v[h]
                    hit_any |= h
        nxt = np.where(leaf | ~box, skip[nc], succ[nc])
        if anyhit:
            nxt = np.where(occ != 0, n, nxt)
        node = np.where(act, nxt, n)
    if anyhit:
        return occ
    return bt, bu, bv, hit_any


def mt_np(c, s, o3, d3, tmin, bt):
    v0 = c["v0"][s].T
    e1 = c["e1"][s].T
    e2 = c["e2"][s].T
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        px = d3[1] * e2[2] - d3[2] * e2[1]
        py = d3[2] * e2[0] - d3[0] * e2[2]
        pz = d3[0] * e2[1] - d3[1] * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        inv_det = np.where(np.abs(det) > 1e-9,
                           1.0 / np.where(det == 0, 1, det), 0.0)
        tvx, tvy, tvz = o3[0] - v0[0], o3[1] - v0[1], o3[2] - v0[2]
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1[2] - tvz * e1[1]
        qy = tvz * e1[0] - tvx * e1[2]
        qz = tvx * e1[1] - tvy * e1[0]
        v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
        t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        h = ((np.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1)
             & (t > tmin) & (t < bt))
    return t, u, v, h


def mt_banks(mt, tlid, k, qn, o3, d3, tmin, bt):
    """Node-indexed MT from the packed compact rows."""
    base = k * 9
    v0 = [mt[tlid, base + a, qn] for a in range(3)]
    e1 = [mt[tlid, base + 3 + a, qn] for a in range(3)]
    e2 = [mt[tlid, base + 6 + a, qn] for a in range(3)]
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        px = d3[1] * e2[2] - d3[2] * e2[1]
        py = d3[2] * e2[0] - d3[0] * e2[2]
        pz = d3[0] * e2[1] - d3[1] * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        inv_det = np.where(np.abs(det) > 1e-9,
                           1.0 / np.where(det == 0, 1, det), 0.0)
        tvx, tvy, tvz = o3[0] - v0[0], o3[1] - v0[1], o3[2] - v0[2]
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1[2] - tvz * e1[1]
        qy = tvz * e1[0] - tvx * e1[2]
        qz = tvx * e1[1] - tvy * e1[0]
        v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
        t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        h = ((np.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1)
             & (t > tmin) & (t < bt))
    return t, u, v, h


def _unpack_pln(w, org, sc):
    """Packed quantized box word -> (lo, hi) f32, as the kernel
    dequantizes (mul+add f32 order)."""
    u = w.astype(np.int64) & 0xFFFFFFFF
    q_lo = (u & 0xFFFF).astype(np.float32)
    q_hi = ((u >> 16) & 0xFFFF).astype(np.float32)
    lo = (q_lo * np.float32(sc)).astype(np.float32) + np.float32(org)
    hi = (q_hi * np.float32(sc)).astype(np.float32) + np.float32(org)
    return lo.astype(np.float32), hi.astype(np.float32)


def _unpack_lnk(w):
    """Packed link word -> (succ, skip, cnt)."""
    return w & 127, (w >> 7) & 127, w >> 14


def _unpack_pln8(w, org, sc, sh):
    """8-bit pair box word -> (lo, hi) f32 for the child at byte shift
    ``sh`` (0 = build-first, 16 = build-second)."""
    u = w.astype(np.int64) & 0xFFFFFFFF
    q_lo = ((u >> sh) & 0xFF).astype(np.float32)
    q_hi = ((u >> (sh + 8)) & 0xFF).astype(np.float32)
    lo = (q_lo * np.float32(sc)).astype(np.float32) + np.float32(org)
    hi = (q_hi * np.float32(sc)).astype(np.float32) + np.float32(org)
    return lo.astype(np.float32), hi.astype(np.float32)


def _unpack_pair_lnk(w):
    """Pair link word -> (near, far, pexit, int_n, int_f, cnt, swap)."""
    return (w & 127, (w >> 7) & 127, (w >> 14) & 127,
            (w >> 21) & 1, (w >> 22) & 1, (w >> 23) & 15, (w >> 27) & 1)


def twolevel_walk(ci, arrays, lay, oct_tab, oct_id, o3, d3, bt,
                  anyhit, win=None, normals=False):
    """The kernel algorithm on the PACKED tables (numpy lockstep)."""
    pad_nodes, t_pad, box_len, tid_len, rows, qsc_len, pair_bits = lay
    tmin = 1e-3
    box = arrays["box"][ci]
    tidm = arrays["tid"][ci]
    qsc = arrays["qsc"].reshape(-1, qsc_len)[ci]
    pln = arrays["planes"][ci, :, :, 0]          # (T, 3|6, 128) words
    pair = pair_bits > 0                         # pair-test format
    lnk = arrays["links"].reshape(-1, 8, t_pad, 8, 128)[
        ci, oct_id, :, 0]                        # (T, 128) packed words
    mt = arrays["mt"][ci]                        # (T, rows, 128)
    end = tidm[tid_len - 1]
    L = o3.shape[1]
    with np.errstate(divide="ignore"):
        inv3 = np.where(d3 != 0, 1.0 / np.where(d3 == 0, 1, d3),
                        np.where(d3 >= 0, np.inf, -np.inf))
    occ = np.zeros(L, np.int64)
    bu = np.zeros(L, np.float32)
    bv = np.zeros(L, np.float32)
    bn = np.zeros((3, L), np.float32)
    hit_any = np.zeros(L, bool)

    def top_slab(nd, eff):
        with np.errstate(invalid="ignore"):
            tn = np.full(L, tmin, np.float32)
            tf = eff.copy().astype(np.float32)
            for a in range(3):
                t0 = (box[a * pad_nodes + nd] - o3[a]) * inv3[a]
                t1 = (box[(3 + a) * pad_nodes + nd] - o3[a]) * inv3[a]
                tn = np.maximum(tn, np.minimum(t0, t1))
                tf = np.minimum(tf, np.maximum(t0, t1))
        return tn <= tf

    def drain(site, qs, qc, eff_win):
        nonlocal occ, bu, bv, hit_any, bn
        for j in range(QD):
            qn = qs[j]
            occm = qc > j
            cntq = (_unpack_pair_lnk(lnk[site, qn])[5] if pair
                    else _unpack_lnk(lnk[site, qn])[2])
            improved = np.zeros(L, bool)
            ju = np.zeros(L, np.float32)
            jv = np.zeros(L, np.float32)
            jk = np.zeros(L, np.int64)
            for k in range(4):
                if anyhit:
                    _, _, _, h = mt_banks(mt, site, k, qn, o3, d3, tmin,
                                          eff_win)
                    occ |= (h & occm & (cntq > k)).astype(np.int64)
                else:
                    t, u, v, h = mt_banks(mt, site, k, qn, o3, d3, tmin,
                                          bt)
                    h = h & occm & (cntq > k)
                    bt[h] = t[h]
                    ju[h] = u[h]
                    jv[h] = v[h]
                    jk[h] = k
                    improved |= h
            if not anyhit and improved.any():
                if normals:
                    for a in range(3):
                        for k in range(4):
                            sel = improved & (jk == k)
                            base = 36 + k * 9
                            w_ = 1.0 - ju[sel] - jv[sel]
                            bn[a][sel] = (
                                w_ * mt[site, base + a, qn[sel]]
                                + ju[sel] * mt[site, base + 3 + a, qn[sel]]
                                + jv[sel] * mt[site, base + 6 + a, qn[sel]]
                            )
                bu[improved] = ju[improved]
                bv[improved] = jv[improved]
                hit_any |= improved

    live0 = (win if anyhit else bt) > tmin
    tnode = 0 if live0.any() else end
    while tnode != end:
        site = tidm[tnode]
        eff = np.where(live0 & (occ == 0), win, 0.0) if anyhit else bt
        b4 = top_slab(tnode, eff)
        anyb = b4.any()
        if site >= 0 and anyb:
            lnode = np.where(b4 & ((bt > tmin) if not anyhit else True),
                             0, DONE).astype(np.int64)
            qs = [np.zeros(L, np.int64) for _ in range(QD)]
            qc = np.zeros(L, np.int64)
            q_room = QD - 1 if pair else QD

            def tl_slab(word_idx, nd, eff, sh8=None):
                with np.errstate(invalid="ignore"):
                    tn = np.full(L, tmin, np.float32)
                    tf = eff.copy().astype(np.float32)
                    for a in range(3):
                        if sh8 is None:
                            lo, hi = _unpack_pln(
                                pln[site, word_idx(a), nd],
                                qsc[site * 8 + 2 * a],
                                qsc[site * 8 + 2 * a + 1],
                            )
                        else:
                            lo, hi = _unpack_pln8(
                                pln[site, word_idx(a), nd],
                                qsc[site * 8 + 2 * a],
                                qsc[site * 8 + 2 * a + 1], sh8,
                            )
                        t0 = (lo - o3[a]) * inv3[a]
                        t1 = (hi - o3[a]) * inv3[a]
                        tn = np.maximum(tn, np.minimum(t0, t1))
                        tf = np.minimum(tf, np.maximum(t0, t1))
                return tn <= tf

            def qpush(qs, qc, push, nd):
                for j in range(QD):
                    qs[j] = np.where(push & (qc == j), nd, qs[j])
                return qs, qc + push

            while (lnode != DONE).any() or (qc > 0).any():
                while ((lnode != DONE) & (qc < q_room)).any():
                    # per-lane stall scheduling: full-queue lanes hold
                    act = (lnode != DONE) & (qc < q_room)
                    nd = lnode
                    eff = (np.where(live0 & (occ == 0), win, 0.0)
                           if anyhit else bt)
                    if pair:
                        near, far, pexit, int_n, int_f, _, swap = (
                            _unpack_pair_lnk(lnk[site, nd]))
                        if pair_bits == 8:
                            bx_a = tl_slab(lambda a: a, nd, eff, sh8=0)
                            bx_b = tl_slab(lambda a: a, nd, eff, sh8=16)
                        else:
                            bx_a = tl_slab(lambda a: 2 * a, nd, eff)
                            bx_b = tl_slab(lambda a: 2 * a + 1, nd, eff)
                        bxn = np.where(swap != 0, bx_b, bx_a)
                        bxf = np.where(swap != 0, bx_a, bx_b)
                        qs, qc = qpush(qs, qc,
                                       act & bxn & (int_n == 0), near)
                        qs, qc = qpush(qs, qc,
                                       act & bxf & (int_f == 0), far)
                        go_n = bxn & (int_n != 0)
                        go_f = bxf & (int_f != 0) & ~go_n
                        lnode = np.where(
                            act, np.where(go_n, near,
                                          np.where(go_f, far, pexit)),
                            lnode)
                    else:
                        sc, sk, cnt = _unpack_lnk(lnk[site, nd])
                        bx = tl_slab(lambda a: a, nd, eff)
                        leaf = cnt > 0
                        qs, qc = qpush(qs, qc, act & bx & leaf, nd)
                        lnode = np.where(
                            act, np.where(bx & ~leaf, sc, sk), lnode)
                eff_win = (np.where(live0 & (occ == 0), win, 0.0)
                           if anyhit else None)
                drain(site, qs, qc, eff_win)
                if anyhit:
                    lnode = np.where(occ != 0, DONE, lnode)
                qc[:] = 0
        if anyhit and not (live0 & (occ == 0)).any():
            break
        # succ at oct_tab[oct, node], skip at oct_tab[oct, pn + node]
        if site < 0 and anyb:
            tnode = int(oct_tab[oct_id, tnode])
        else:
            tnode = int(oct_tab[oct_id, pad_nodes + tnode])
    if anyhit:
        return occ
    return bt, bu, bv, hit_any, bn


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from raytpu.ops.mega import octant_links
    from raytpu.ops.perlane import pack_perlane_tables
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    preset = sys.argv[1] if len(sys.argv) > 1 else "config2"
    sc = load_preset_scene(preset)
    sc.config = sc.config.replace(traversal="perlane")
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    dev, static = rr.device_scene, rr.static

    # rebuild chunk dicts from the attached arrays (sim pattern)
    chunks = []
    aabb_min = np.asarray(dev.bvh_aabb_min)
    aabb_max = np.asarray(dev.bvh_aabb_max)
    tri_first = np.asarray(dev.bvh_tri_first)
    tri_count = np.asarray(dev.bvh_tri_count)
    miss = np.asarray(dev.bvh_miss)
    v0a = np.asarray(dev.bvh_tri_v0)
    e1a = np.asarray(dev.bvh_tri_e1)
    e2a = np.asarray(dev.bvh_tri_e2)
    n_soa = np.asarray(dev.bvh_tri_n_soa)
    for (ns, nc), (ts, tc) in zip(static.mesh_node_ranges,
                                  static.mesh_bvh_tri_ranges):
        chunks.append({
            "aabb_min": aabb_min[ns:ns + nc],
            "aabb_max": aabb_max[ns:ns + nc],
            "first": tri_first[ns:ns + nc], "count": tri_count[ns:ns + nc],
            "miss": miss[ns:ns + nc],
            "v0": v0a[ts:ts + tc], "e1": e1a[ts:ts + tc],
            "e2": e2a[ts:ts + tc], "n_soa": n_soa[:, ts:ts + tc],
        })

    lay = static.perlane_layout
    arrays = {
        "box": np.asarray(dev.pl_box).reshape(len(chunks), lay[2]),
        "tid": np.asarray(dev.pl_tid).reshape(len(chunks), lay[3]),
        "qsc": np.asarray(dev.pl_qsc),
        "planes": np.asarray(dev.pl_planes),
        "links": np.asarray(dev.pl_links),
        "mt": np.asarray(dev.pl_mt),
    }
    pad_nodes = lay[0]

    rng = np.random.RandomState(1)
    L = 4096
    fails = 0
    for ci, c in enumerate(chunks):
        lo = c["aabb_min"].min(axis=0)
        hi = c["aabb_max"].max(axis=0)
        ctr = (lo + hi) / 2
        ext = (hi - lo).max() + 1e-3
        o3 = (ctr[:, None]
              + rng.randn(3, L).astype(np.float32) * ext * 1.2)
        d3 = rng.randn(3, L).astype(np.float32)
        d3 /= np.linalg.norm(d3, axis=0, keepdims=True)
        d3 = d3.astype(np.float32)
        o3 = o3.astype(np.float32)
        succ, skip = octant_links(c["aabb_min"], c["aabb_max"],
                                  c["first"], c["miss"])
        n = c["aabb_min"].shape[0]
        oct_tab = np.zeros((8, 2 * pad_nodes), np.int64)
        oct_tab[:, :n] = succ
        oct_tab[:, pad_nodes:pad_nodes + n] = skip
        # end sentinel: links==n means done; map to "end" = node count
        for oct_id in (0, 5):
            bt_ref = np.full(L, 1e4, np.float32)
            r = ref_walk(c, oct_id, o3, d3, bt_ref.copy(), False)
            bt_r, bu_r, bv_r, hit_r = r

            bt2 = np.full(L, 1e4, np.float32)
            # adapt: top walk terminates at end = n (tid sentinel)
            res = twolevel_walk(ci, arrays, lay, oct_tab, oct_id, o3, d3,
                                bt2, False, normals=True)
            bt_t, bu_t, bv_t, hit_t, bn_t = res
            ok = (np.array_equal(bt_r, bt_t)
                  and np.array_equal(hit_r, hit_t)
                  and np.array_equal(bu_r, bu_t)
                  and np.array_equal(bv_r, bv_t))
            if not ok:
                nd = int((bt_r != bt_t).sum())
                print(json.dumps({
                    "chunk": ci, "oct": oct_id, "closest_mismatch": nd,
                    "hit_mismatch": int((hit_r != hit_t).sum()),
                }))
                fails += 1

            win = np.full(L, 3.0, np.float32)
            occ_r = ref_walk(c, oct_id, o3, d3,
                             np.full(L, 1e4, np.float32), True, win=win)
            occ_t = twolevel_walk(ci, arrays, lay, oct_tab, oct_id, o3,
                                  d3, np.full(L, 1e4, np.float32), True,
                                  win=win)
            if not np.array_equal(occ_r != 0, occ_t != 0):
                print(json.dumps({
                    "chunk": ci, "oct": oct_id,
                    "anyhit_mismatch":
                        int(((occ_r != 0) != (occ_t != 0)).sum()),
                }))
                fails += 1
        print(f"chunk {ci}: checked", flush=True)
        if ci >= 3:
            break
    print(json.dumps({"pack_check_fails": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
