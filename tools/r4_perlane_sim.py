#!/usr/bin/env python
"""Round-4 frontier sim: consensus-union vs per-lane walk lengths (CPU).

The consensus walk visits the UNION of its 4096 lanes' per-ray paths
(~5.6x a per-ray walk, docs/roadmap.md item 13). A per-lane walk (every
lane advances its OWN pointer via tpu.dynamic_gather table lookups, see
tools/r4_gather_probe.py) instead costs max-per-lane iterations — but
needs its node/tri tables in <=128/<=256-entry gatherable banks, i.e. the
chunk BVH split into TREELETS with a consensus-visited top tree.

This sim replays the real config4 j=0 closest and shadow sweeps in numpy
with kernel-exact traversal semantics (octant links, carried best_t,
depth-sorted entries, prepass culling) and reports, per sweep:

* consensus iterations (the current kernel's cost driver);
* per-lane walk lengths: mean / per-walk max (a single-level per-lane
  walk over the whole chunk — needs multi-bank lookups);
* treelet decomposition (cap 128 nodes / 256 tris): per-(walk, treelet)
  max-lane iterations + visited-treelet counts (table-reload overhead)
  + top-tree consensus iterations — the two-level kernel's cost drivers.

Combined with r4_gather_probe's measured ns/iteration these decide
whether the per-lane tier clears the consensus ceiling.

Run: python tools/r4_perlane_sim.py  (CPU; ~minutes)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NODE_CAP = int(os.environ.get("SIM_NODE_CAP", "128"))
TRI_CAP = int(os.environ.get("SIM_TRI_CAP", str(4 * NODE_CAP)))
PRESET = os.environ.get("SIM_PRESET", "config4")


def treelet_partition(first, count, miss):
    """Greedy DFS cut into subtrees with <=NODE_CAP nodes, <=TRI_CAP tris.

    Uses the BUILD-order skip links (subtree of i spans [i, miss[i]) in the
    DFS layout). Returns (tid, n_treelets): tid[i] = treelet id, or
    n_treelets for top-tree nodes. Octant rethreading preserves subtree
    membership, so the partition is octant-independent.
    """
    n = first.shape[0]
    span = miss - np.arange(n)          # subtree node count
    # subtree tri counts via prefix sums over the DFS layout
    pref = np.concatenate([[0], np.cumsum(np.maximum(count, 0))])
    sub_tris = pref[miss] - pref[np.arange(n)]

    tid = np.full(n, -1, np.int64)
    nt = 0
    # iterate nodes in DFS order (they are laid out in DFS order already)
    i = 0
    while i < n:
        if tid[i] >= 0:
            i += 1
            continue
        if span[i] <= NODE_CAP and sub_tris[i] <= TRI_CAP:
            tid[i:miss[i]] = nt
            nt += 1
            i = miss[i]
        else:
            # top node; descend
            i += 1
    top = tid < 0
    tid[top] = nt
    return tid, nt


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("backend:", jax.devices()[0].platform, flush=True)

    from raytpu.config import HIT_EPSILON, RAY_TMAX, RAY_TMIN
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops.mega import (BLOCK_PACKETS, chunk_block_hits,
                                 octant_links)
    from raytpu.ops.traverse_pallas import pack_rays
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    t0 = time.perf_counter()
    sc = load_preset_scene(PRESET)
    wh = os.environ.get("SIM_WH", "")
    if wh:
        w_, h_ = (int(x) for x in wh.split("x"))
        sc.config = sc.config.replace(width=w_, height=h_)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    rs = rr.render_static
    scene, static = rr.device_scene, rr.static
    cam = jnp.asarray(rr.camera.basis())
    print(f"scene built in {time.perf_counter() - t0:.0f}s", flush=True)

    (px, py), _, in_frame = _tiled_pixels(rs)
    spp = rs.samples_per_pixel
    px = jnp.repeat(px, spp, axis=0)
    py = jnp.repeat(py, spp, axis=0)
    in_frame = np.asarray(jnp.repeat(in_frame, spp, axis=0))
    t0_ = px.shape[0] // spp
    s_idx = jnp.tile(jnp.arange(spp, dtype=jnp.float32), (t0_,))[:, None] \
        * jnp.ones((1, 1024), jnp.float32)
    o, d = primary_rays_soa((px, py), cam, s_idx, spp, rs.width, rs.height)
    p = o[0].shape[0]
    group = rs.sample_group
    onp = np.asarray(jnp.stack(o)).reshape(3, p, 1024)
    dnp = np.asarray(jnp.stack(d)).reshape(3, p, 1024)
    inf_np = in_frame.reshape(p, 1024)

    # ---- per-chunk tables (chunk-local) + octant links + treelets ----
    dev = scene
    aabb_min = np.asarray(dev.bvh_aabb_min)
    aabb_max = np.asarray(dev.bvh_aabb_max)
    tri_first = np.asarray(dev.bvh_tri_first)
    tri_count = np.asarray(dev.bvh_tri_count)
    miss = np.asarray(dev.bvh_miss)
    v0a = np.asarray(dev.bvh_tri_v0)
    e1a = np.asarray(dev.bvh_tri_e1)
    e2a = np.asarray(dev.bvh_tri_e2)
    w2o = np.asarray(dev.w2o)
    light_pos = np.asarray(dev.light_pos)
    mats = np.asarray(dev.materials)
    n_soa = np.asarray(dev.bvh_tri_n_soa)

    chunks = []
    for (ns, nc), (ts, tc) in zip(static.mesh_node_ranges,
                                  static.mesh_bvh_tri_ranges):
        c = {
            "lo": aabb_min[ns:ns + nc], "hi": aabb_max[ns:ns + nc],
            "first": tri_first[ns:ns + nc], "count": tri_count[ns:ns + nc],
            "miss": miss[ns:ns + nc],
            "v0": v0a[ts:ts + tc], "e1": e1a[ts:ts + tc],
            "e2": e2a[ts:ts + tc],
            "n_soa": n_soa[:, ts:ts + tc],
        }
        c["succ"], c["skip"] = octant_links(c["lo"], c["hi"], c["first"],
                                            c["miss"])
        c["tid"], c["n_treelets"] = treelet_partition(
            c["first"], c["count"], c["miss"])
        chunks.append(c)
    print(json.dumps({
        "chunks": len(chunks),
        "nodes_per_chunk": [int(c["lo"].shape[0]) for c in chunks],
        "treelets_per_chunk": [int(c["n_treelets"]) for c in chunks],
        "top_nodes_per_chunk": [int((c["tid"] == c["n_treelets"]).sum())
                                for c in chunks],
    }), flush=True)

    # ---------------------------------------------------------------
    def slab(lo3, hi3, o3, inv3, tmin, bt):
        with np.errstate(invalid="ignore"):
            tn = np.full(bt.shape, tmin, np.float32)
            tf = bt.copy()
            for a in range(3):
                t0 = (lo3[a] - o3[a]) * inv3[a]
                t1 = (hi3[a] - o3[a]) * inv3[a]
                tn = np.maximum(tn, np.minimum(t0, t1))
                tf = np.minimum(tf, np.maximum(t0, t1))
        return tn <= tf

    def mt(c, s, o3, d3, tmin, bt):
        v0 = c["v0"][s].T
        e1 = c["e1"][s].T
        e2 = c["e2"][s].T
        with np.errstate(invalid="ignore", divide="ignore",
                         over="ignore"):
            px = d3[1] * e2[2] - d3[2] * e2[1]
            py = d3[2] * e2[0] - d3[0] * e2[2]
            pz = d3[0] * e2[1] - d3[1] * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            inv_det = np.where(np.abs(det) > 1e-9, 1.0 / np.where(
                det == 0, 1.0, det), 0.0)
            tvx = o3[0] - v0[0]
            tvy = o3[1] - v0[1]
            tvz = o3[2] - v0[2]
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1[2] - tvz * e1[1]
            qy = tvz * e1[0] - tvx * e1[2]
            qz = tvx * e1[1] - tvy * e1[0]
            v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
            hit = ((np.abs(det) > 1e-9) & (u >= 0) & (v >= 0)
                   & (u + v <= 1) & (t > tmin) & (t < bt))
        return t, u, v, hit

    def xform(m, ow, dw):
        o3 = m[:, :3] @ ow + m[:, 3:4]
        d3 = m[:, :3] @ dw
        return o3, d3

    LEAF_UNROLL = 4

    def perlane_walk(c, oct_id, o3, d3, win, bt, state, anyhit=False):
        """Per-lane walk; returns stats + updates bt/state in place.

        state: dict with slot/u/v/entry arrays (closest) or occ (anyhit).
        """
        n = c["lo"].shape[0]
        succ = c["succ"][oct_id]
        skip = c["skip"][oct_id]
        lo = c["lo"].T
        hi = c["hi"].T
        with np.errstate(divide="ignore"):
            inv3 = np.where(d3 != 0, 1.0 / np.where(d3 == 0, 1, d3),
                            np.where(d3 >= 0, np.inf, -np.inf))
        L = o3.shape[1]
        end = n
        if anyhit:
            live = (win > RAY_TMIN) & (state["occ"] == 0)
        else:
            live = win > RAY_TMIN
        node = np.where(live, 0, end)
        visits = np.zeros(L, np.int64)
        leaf_visits = np.zeros(L, np.int64)
        tid_counts = np.zeros((c["n_treelets"] + 1) * L, np.int64)
        tid_leaf_counts = np.zeros((c["n_treelets"] + 1) * L, np.int64)
        lane_idx = np.arange(L)
        iters = 0
        while True:
            active = node < end
            if not active.any():
                break
            iters += 1
            nc = np.minimum(node, n - 1)
            visits += active
            tids = c["tid"][nc]
            np.add.at(tid_counts, tids[active] * L + lane_idx[active], 1)
            fi = c["first"][nc]
            is_leaf = fi >= 0
            eff_bt = bt if not anyhit else np.where(
                live & (state["occ"] == 0), win, 0.0)
            box = slab((lo[0][nc], lo[1][nc], lo[2][nc]),
                       (hi[0][nc], hi[1][nc], hi[2][nc]),
                       o3, inv3, RAY_TMIN, eff_bt) & active
            do_leaf = box & is_leaf
            leaf_visits += do_leaf
            if do_leaf.any():
                np.add.at(tid_leaf_counts,
                          tids[do_leaf] * L + lane_idx[do_leaf], 1)
                for k in range(LEAF_UNROLL):
                    s = np.where(is_leaf, fi, 0) + k
                    s = np.minimum(s, c["v0"].shape[0] - 1)
                    valid_k = do_leaf & (k < c["count"][nc])
                    if anyhit:
                        _, _, _, h = mt(c, s, o3, d3, RAY_TMIN, eff_bt)
                        state["occ"] |= (h & valid_k).astype(np.int32)
                    else:
                        t, u, v, h = mt(c, s, o3, d3, RAY_TMIN, bt)
                        h = h & valid_k
                        bt[h] = t[h]
                        state["slot"][h] = s[h]
                        state["u"][h] = u[h]
                        state["v"][h] = v[h]
                        state["hit_here"][h] = True
            nxt = np.where(is_leaf | ~box, skip[nc], succ[nc])
            if anyhit:
                done = state["occ"] != 0
                nxt = np.where(done, end, nxt)
            node = np.where(active, nxt, end)
        # per-(treelet) max-lane counts
        tc = tid_counts.reshape(c["n_treelets"] + 1, L)
        t_max = tc[:-1].max(axis=1)
        visited_treelets = int((t_max > 0).sum())
        treelet_iter_sum = int(t_max.sum())
        top_max = int(tc[-1].max())
        tlc = tid_leaf_counts.reshape(c["n_treelets"] + 1, L)
        mt_phase_sum = int(tlc[:-1].max(axis=1).sum())
        return {
            "iters": iters,
            "visit_sum": int(visits.sum()),
            "visit_max": int(visits.max()),
            "leaf_visit_max": int(leaf_visits.max()),
            "leaf_visit_sum": int(leaf_visits.sum()),
            "treelet_iter_sum": treelet_iter_sum,
            "visited_treelets": visited_treelets,
            "top_max": top_max,
            "mt_phase_sum": mt_phase_sum,
        }

    def consensus_walk(c, oct_id, o3, d3, win, bt, state, anyhit=False):
        n = c["lo"].shape[0]
        succ = c["succ"][oct_id]
        skip = c["skip"][oct_id]
        lo = c["lo"].T
        hi = c["hi"].T
        with np.errstate(divide="ignore"):
            inv3 = np.where(d3 != 0, 1.0 / np.where(d3 == 0, 1, d3),
                            np.where(d3 >= 0, np.inf, -np.inf))
        end = n
        if anyhit:
            pending0 = (win > RAY_TMIN) & (state["occ"] == 0)
            node = 0 if pending0.any() else end
        else:
            node = 0 if (win > RAY_TMIN).any() else end
        iters = 0
        while node != end:
            iters += 1
            fi = c["first"][node]
            is_leaf = fi >= 0
            if anyhit:
                eff_bt = np.where((win > RAY_TMIN) & (state["occ"] == 0),
                                  win, 0.0)
            else:
                eff_bt = bt
            box = slab((lo[0][node], lo[1][node], lo[2][node]),
                       (hi[0][node], hi[1][node], hi[2][node]),
                       o3, inv3, RAY_TMIN, eff_bt)
            any_box = box.any()
            if is_leaf and any_box:
                for k in range(LEAF_UNROLL):
                    s = min(fi + k, c["v0"].shape[0] - 1)
                    valid_k = k < c["count"][node]
                    if not valid_k:
                        continue
                    sv = np.full(o3.shape[1], s)
                    if anyhit:
                        _, _, _, h = mt(c, sv, o3, d3, RAY_TMIN, eff_bt)
                        state["occ"] |= h.astype(np.int32)
                    else:
                        t, u, v, h = mt(c, sv, o3, d3, RAY_TMIN, bt)
                        bt[h] = t[h]
                        state["slot"][h] = s
                        state["u"][h] = u[h]
                        state["v"][h] = v[h]
                        state["hit_here"][h] = True
            if anyhit and not ((win > RAY_TMIN) & (state["occ"] == 0)).any():
                break
            node = skip[node] if (is_leaf or not any_box) else succ[node]
        return iters

    # ---------------------------------------------------------------
    def run_sweep(entries_list, rays_o, rays_d, window, anyhit, roots,
                  entries_static, label):
        rays = pack_rays(
            tuple(jnp.asarray(rays_o[i].reshape(p, 8, 128)) for i in range(3)),
            tuple(jnp.asarray(rays_d[i].reshape(p, 8, 128)) for i in range(3)),
        )
        bits, octs, depth = chunk_block_hits(
            scene, static, rays, jnp.asarray(window.reshape(p, 8, 128)),
            RAY_TMIN, roots=roots, entries=entries_static)
        bits = np.asarray(bits)
        octs = np.asarray(octs)
        depth = np.asarray(depth)
        order = np.argsort(depth, kind="stable")
        pb = p // BLOCK_PACKETS

        bt = window.reshape(-1).astype(np.float32).copy()
        L = group * 1024
        state_full = {
            "slot": np.full(p * 1024, -1, np.int64),
            "u": np.zeros(p * 1024, np.float32),
            "v": np.zeros(p * 1024, np.float32),
            "entry": np.full(p * 1024, -1, np.int64),
            "occ": np.zeros(p * 1024, np.int32),
        }
        # consensus state copies
        bt_c = bt.copy()
        occ_c = state_full["occ"].copy()

        agg = {"pairs": 0, "walks": 0, "cons_iters": 0, "pl_iters": 0,
               "pl_visit_sum": 0, "pl_visit_max_sum": 0,
               "pl_leaf_max_sum": 0, "pl_leaf_sum": 0,
               "treelet_iter_sum": 0, "visited_treelets": 0,
               "top_max_sum": 0, "mt_phase_sum": 0}
        t_start = time.perf_counter()
        for rank, e in enumerate(order):
            inst, chunk = entries_static[e]
            c = chunks[chunk]
            m = w2o[inst]
            row = bits[e]
            live_blocks = [
                b for b in range(pb)
                if (row[b // 32] >> (b % 32)) & 1
            ]
            agg["pairs"] += len(live_blocks)
            for b in live_blocks:
                for g0 in range(0, BLOCK_PACKETS, group):
                    pk0 = b * BLOCK_PACKETS + g0
                    sl = slice(pk0 * 1024, (pk0 + group) * 1024)
                    ow = rays_o[:, pk0:pk0 + group].reshape(3, -1)
                    dw = rays_d[:, pk0:pk0 + group].reshape(3, -1)
                    o3, d3 = xform(m, ow, dw)
                    win = window.reshape(-1)[sl]
                    st = {k: v[sl] for k, v in state_full.items()}
                    st["hit_here"] = np.zeros(L, bool)
                    stats = perlane_walk(c, octs[b], o3, d3, win, bt[sl],
                                         st, anyhit=anyhit)
                    if not anyhit:
                        st["entry"][st["hit_here"]] = e
                    for k in ("slot", "u", "v", "entry", "occ"):
                        state_full[k][sl] = st[k]
                    agg["walks"] += 1
                    agg["pl_iters"] += stats["iters"]
                    agg["pl_visit_sum"] += stats["visit_sum"]
                    agg["pl_visit_max_sum"] += stats["visit_max"]
                    agg["pl_leaf_max_sum"] += stats["leaf_visit_max"]
                    agg["pl_leaf_sum"] += stats["leaf_visit_sum"]
                    agg["treelet_iter_sum"] += stats["treelet_iter_sum"]
                    agg["visited_treelets"] += stats["visited_treelets"]
                    agg["top_max_sum"] += stats["top_max"]
                    agg["mt_phase_sum"] += stats["mt_phase_sum"]
                    # consensus twin
                    st_c = {"occ": occ_c[sl],
                            "slot": np.full(L, -1, np.int64),
                            "u": np.zeros(L, np.float32),
                            "v": np.zeros(L, np.float32),
                            "hit_here": np.zeros(L, bool)}
                    ci = consensus_walk(c, octs[b], o3, d3, win, bt_c[sl],
                                        st_c, anyhit=anyhit)
                    occ_c[sl] = st_c["occ"]
                    agg["cons_iters"] += ci
            if rank % 8 == 0:
                print(f"  [{label}] entry {rank + 1}/{len(order)} "
                      f"({time.perf_counter() - t_start:.0f}s)", flush=True)
        if anyhit:
            mismatch = int((state_full["occ"] != occ_c).sum())
        else:
            mismatch = int((bt != bt_c).sum())
        agg["perlane_vs_consensus_result_mismatch"] = mismatch
        print(json.dumps({label: agg}), flush=True)
        return agg, state_full, bt

    inst_of_entry = np.asarray([i for i, _ in static.traversal_list])

    def hit_attribs(st, bt, of, df):
        """Hit position, interpolated world normal (normalized), material
        per lane from a closest sweep's winner state."""
        valid = st["slot"] >= 0
        pos = of + bt[None, :] * df
        nrm = np.zeros((3, p * 1024), np.float32)
        for e, (inst, chunk) in enumerate(static.traversal_list):
            m_ = (st["entry"] == e)
            if not m_.any():
                continue
            c = chunks[chunk]
            # slot indexes this chunk's local tri arrays
            s = st["slot"][m_]
            u = st["u"][m_]
            v = st["v"][m_]
            w_ = 1.0 - u - v
            nl = [w_ * c["n_soa"][a][s] + u * c["n_soa"][3 + a][s]
                  + v * c["n_soa"][6 + a][s] for a in range(3)]
            mtx = w2o[inst]
            nw = [mtx[0, a_] * nl[0] + mtx[1, a_] * nl[1]
                  + mtx[2, a_] * nl[2] for a_ in range(3)]
            nlen = np.sqrt(nw[0] ** 2 + nw[1] ** 2 + nw[2] ** 2)
            for a in range(3):
                nrm[a][m_] = nw[a] / np.maximum(nlen, 1e-30)
        mat_lane = np.where(valid, mats[inst_of_entry[
            np.maximum(st["entry"], 0)]], -1)
        return valid, pos, nrm, mat_lane

    # ---- bounce loop: closest_j / shadow_j sweep stats per depth ----
    bounces = int(os.environ.get("SIM_BOUNCES", "0"))
    ior = 1.52  # INDEX_OF_REFRACTION (include/config.h)
    o_cur = onp.reshape(3, -1).astype(np.float32)
    d_cur = dnp.reshape(3, -1).astype(np.float32)
    active = inf_np.reshape(-1).copy()
    summary = {}
    for j in range(bounces + 1):
        window = np.where(active, np.float32(RAY_TMAX), 0.0).astype(
            np.float32)
        agg_c, st, bt = run_sweep(
            None, o_cur.reshape(3, p, 1024), d_cur.reshape(3, p, 1024),
            window, False, None, static.traversal_list, f"closest_j{j}")
        valid, pos, nrm, mat_lane = hit_attribs(st, bt, o_cur, d_cur)
        hitm = active & valid
        ddotn = (d_cur * nrm).sum(axis=0)
        lit = hitm & (mat_lane == 0) & (ddotn < 0)
        sh_o = pos + HIT_EPSILON * nrm
        to_l = light_pos[:, None] - pos
        ldist = np.sqrt((to_l ** 2).sum(axis=0))
        ldir = (to_l / np.maximum(ldist, 1e-30)).astype(np.float32)
        sh_win = np.where(lit, ldist, 0.0).astype(np.float32)
        print(json.dumps({f"rays_j{j}": {
            "traced": int(active.sum()), "hits": int(hitm.sum()),
            "shadow": int(lit.sum())}}), flush=True)
        # shadow chunk set uses the shadow tables; this reuses the SAME
        # per-mesh chunks (main set) for walk statistics — the anyhit-
        # specialized partition differs only in chunk size (13824), close
        # enough for iteration-count ratios.
        agg_s, _, _ = run_sweep(
            None, sh_o.reshape(3, p, 1024).astype(np.float32),
            ldir.reshape(3, p, 1024), sh_win, True, None,
            static.traversal_list, f"shadow_j{j}")
        for name, agg in (("closest", agg_c), ("shadow", agg_s)):
            summary[f"{name}_j{j}"] = {
                "union_iters": agg["cons_iters"],
                "perlane_max_iters": agg["pl_iters"],
                "treelet_iters": agg["treelet_iter_sum"],
                "visited_treelets": agg["visited_treelets"],
                "top_iters": agg["top_max_sum"],
                "walks": agg["walks"],
            }
        # continuations (src/shader.rgen:132-177 semantics)
        is_m = hitm & (mat_lane == 1)
        is_r = hitm & (mat_lane == 2)
        cont = is_m | is_r
        if j == bounces or not cont.any():
            break
        # mirror: o = pos + eps*n, d = reflect(d, n)
        dn = 2.0 * ddotn
        d_m = d_cur - dn[None] * nrm
        o_m = pos + HIT_EPSILON * nrm
        # refract: Snell + TIR with flipped normal when exiting
        outw = ddotn > 0.0
        n_f = np.where(outw[None], -nrm, nrm)
        ndoti_f = np.where(outw, -ddotn, ddotn)
        ratio = np.where(outw, ior, 1.0 / ior).astype(np.float32)
        kk = 1.0 - ratio * ratio * (1.0 - ndoti_f * ndoti_f)
        tir = kk < 0.0
        d_tir = d_cur - (2.0 * (d_cur * n_f).sum(0))[None] * n_f
        coeff = ratio * ndoti_f + np.sqrt(np.maximum(kk, 0.0))
        r_d = ratio[None] * d_cur - coeff[None] * n_f
        r_d = r_d / np.maximum(
            np.sqrt((r_d ** 2).sum(0))[None], 1e-30)
        d_r = np.where(tir[None], d_tir, r_d)
        o_r = np.where(tir[None], pos + HIT_EPSILON * n_f,
                       pos - HIT_EPSILON * n_f)
        o_cur = np.where(is_m[None], o_m,
                         np.where(is_r[None], o_r, o_cur)).astype(
                             np.float32)
        d_cur = np.where(is_m[None], d_m,
                         np.where(is_r[None], d_r, d_cur)).astype(
                             np.float32)
        active = cont

    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
