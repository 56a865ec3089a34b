#!/usr/bin/env python
"""Leaf-size sweep sim for the per-lane pair walk: 4 vs 6 vs 7 tris/leaf.

VERDICT r3 item 8 asks for ONE structurally new idea against the
closest-sweep ceiling: make divergent leaf work DENSE. The pair link word
already carries 3 cnt bits (<=7), and a drain's Moller-Trumbore slots are
contiguous MT rows gathered per queued leaf — so a bigger SAH leaf packs
more candidate triangles into each drained row set, trading interior pair
steps (gather-latency-bound, ~300 ns each) for wider MT unrolls inside
the SAME drain invocation (throughput work the VPU overlaps).

This sim rebuilds every chunk BVH at leaf_size in {4, 6, 7} (same SAH
builder the scene uses, ``accel/bvh.py``), replays the real config4/5
sweep sequence (kernel-exact octant links, carried best_t, depth-sorted
entries, prepass culling — structure cloned from r5_pairwalk_sim) under
PAIR semantics, and reports per-variant the kernel cost drivers:

* pair steps (sum over (site, walk) of max-lane entered steps),
* site entries (x ~1.1 us fixed overhead each),
* queue pushes (max-lane per site — drain iterations; each drain
  iteration costs ~9*leaf_size MT gathers instead of 9*4).

Hit results must be EQUAL across variants (same geometry, same
closest-hit winner up to coincident-tie order — none in the presets).

Run: python tools/r7_leafsize_sim.py    (CPU; SIM_PRESET=config4,
SIM_BOUNCES=N, SIM_LEAVES=4,6,7)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESET = os.environ.get("SIM_PRESET", "config4")
LEAVES = [int(x) for x in os.environ.get("SIM_LEAVES", "4,7").split(",")]
NODE_CAP = 127


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytpu.accel.bvh import build_bvh
    from raytpu.config import HIT_EPSILON, RAY_TMAX, RAY_TMIN
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops.mega import BLOCK_PACKETS, chunk_block_hits, octant_links
    from raytpu.ops.perlane import treelet_partition
    from raytpu.ops.traverse_pallas import pack_rays
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer

    t0 = time.perf_counter()
    sc = load_preset_scene(PRESET)
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

    dev = scene
    v0a = np.asarray(dev.bvh_tri_v0)
    e1a = np.asarray(dev.bvh_tri_e1)
    e2a = np.asarray(dev.bvh_tri_e2)
    w2o = np.asarray(dev.w2o)
    light_pos = np.asarray(dev.light_pos)
    mats = np.asarray(dev.materials)
    n_soa = np.asarray(dev.bvh_tri_n_soa)

    # ---- rebuild every chunk's BVH at each leaf size -------------------
    def make_chunk(v0, e1, e2, nso, leaf_size):
        b = build_bvh(v0, e1, e2, leaf_size=leaf_size)
        c = {
            "lo": b.aabb_min, "hi": b.aabb_max,
            "first": b.tri_first, "count": b.tri_count, "miss": b.miss,
            "v0": v0[b.tri_order], "e1": e1[b.tri_order],
            "e2": e2[b.tri_order], "n_soa": nso[:, b.tri_order],
            "leaf_size": leaf_size,
        }
        n = c["lo"].shape[0]
        c["succ"], c["skip"] = octant_links(c["lo"], c["hi"], c["first"],
                                            c["miss"])
        c["tid"], c["n_treelets"] = treelet_partition(
            c["first"], c["count"], c["miss"])
        leaf = c["first"] >= 0
        miss = c["miss"]
        tid = c["tid"]
        nt = c["n_treelets"]
        far = np.zeros_like(c["succ"])
        pex = np.zeros_like(c["skip"])
        ids = np.arange(n)
        c1 = ids + 1
        c2 = np.minimum(miss[np.minimum(c1, n - 1)], n - 1)
        for oc in range(8):
            so = c["succ"][oc]
            far[oc] = np.where(leaf, so, np.where(so == c1, c2, c1))
            pe = c["skip"][oc].copy()
            for _ in range(96):
                t_ = np.minimum(pe, n - 1)
                redo = (pe < n) & leaf[t_] & (tid[t_] == tid) & (tid < nt)
                if not redo.any():
                    break
                pe = np.where(redo, c["skip"][oc][t_], pe)
            pex[oc] = pe
        c["far"] = far
        c["pex"] = pex
        return c

    variants = {}
    for ls in LEAVES:
        t1 = time.perf_counter()
        chs = []
        for (ns, nc_), (ts, tc) in zip(static.mesh_node_ranges,
                                       static.mesh_bvh_tri_ranges):
            chs.append(make_chunk(v0a[ts:ts + tc], e1a[ts:ts + tc],
                                  e2a[ts:ts + tc], n_soa[:, ts:ts + tc],
                                  ls))
        variants[ls] = chs
        print(json.dumps({
            "leaf_size": ls,
            "nodes": [int(c["lo"].shape[0]) for c in chs],
            "treelets": [int(c["n_treelets"]) for c in chs],
            "mean_tris_per_leaf": round(float(np.mean([
                c["count"][c["count"] > 0].mean() for c in chs])), 2),
            "t": round(time.perf_counter() - t1, 1),
        }), flush=True)

    # ---- pair walk with parametrized leaf unroll -----------------------
    def slab_idx(c, nc, o3, inv3, tmin, bt):
        lo = c["lo"].T
        hi = c["hi"].T
        with np.errstate(invalid="ignore"):
            tn = np.full(bt.shape, tmin, np.float32)
            tf = bt.copy()
            for a in range(3):
                t0 = (lo[a][nc] - o3[a]) * inv3[a]
                t1 = (hi[a][nc] - o3[a]) * inv3[a]
                tn = np.maximum(tn, np.minimum(t0, t1))
                tf = np.minimum(tf, np.maximum(t0, t1))
        return tn <= tf

    def mt(c, s, o3, d3, tmin, bt):
        v0 = c["v0"][s].T
        e1 = c["e1"][s].T
        e2 = c["e2"][s].T
        with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
            px_ = d3[1] * e2[2] - d3[2] * e2[1]
            py_ = d3[2] * e2[0] - d3[0] * e2[2]
            pz_ = d3[0] * e2[1] - d3[1] * e2[0]
            det = e1[0] * px_ + e1[1] * py_ + e1[2] * pz_
            inv_det = np.where(np.abs(det) > 1e-9, 1.0 / np.where(
                det == 0, 1.0, det), 0.0)
            tvx = o3[0] - v0[0]
            tvy = o3[1] - v0[1]
            tvz = o3[2] - v0[2]
            u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv_det
            qx = tvy * e1[2] - tvz * e1[1]
            qy = tvz * e1[0] - tvx * e1[2]
            qz = tvx * e1[1] - tvy * e1[0]
            v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
            hit = ((np.abs(det) > 1e-9) & (u >= 0) & (v >= 0)
                   & (u + v <= 1) & (t > tmin) & (t < bt))
        return t, u, v, hit

    def xform(m, ow, dw):
        return m[:, :3] @ ow + m[:, 3:4], m[:, :3] @ dw

    def leaf_mt(c, nc, mask, o3, d3, bt, state, anyhit, eff_bt):
        if not mask.any():
            return
        fi = c["first"][nc]
        for k in range(c["leaf_size"]):
            s = np.where(fi >= 0, fi, 0) + k
            s = np.minimum(s, c["v0"].shape[0] - 1)
            valid_k = mask & (k < c["count"][nc])
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

    def walk(c, oct_id, o3, d3, win, bt, state, anyhit):
        n = c["lo"].shape[0]
        nt = c["n_treelets"]
        tid = c["tid"]
        leaf = c["first"] >= 0
        succ = c["succ"][oct_id]
        skip = c["skip"][oct_id]
        far = c["far"][oct_id]
        pex = c["pex"][oct_id]
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
        tsteps = np.zeros((nt + 1) * L, np.int64)
        qpush = np.zeros((nt + 1) * L, np.int64)
        lane_idx = np.arange(L)
        while True:
            active = node < end
            if not active.any():
                break
            nc = np.minimum(node, n - 1)
            tids = tid[nc]
            in_t = active & (tids < nt)
            eff_bt = bt if not anyhit else np.where(
                live & (state["occ"] == 0), win, 0.0)
            is_root = in_t & (
                (nc == 0) | (tid[np.maximum(nc - 1, 0)] != tids)
            )
            is_top = active & (tids >= nt)
            box_self = slab_idx(c, nc, o3, inv3, RAY_TMIN, eff_bt)
            root_leaf = is_root & leaf[nc] & box_self
            leaf_mt(c, nc, root_leaf, o3, d3, bt, state, anyhit, eff_bt)
            entered = in_t & ~leaf[nc] & (~is_root | box_self)
            tsteps[tids[entered] * L + lane_idx[entered]] += 1
            cn = np.minimum(succ[nc], n - 1)
            cf = np.minimum(far[nc], n - 1)
            boxn = slab_idx(c, cn, o3, inv3, RAY_TMIN, eff_bt) & entered
            boxf = slab_idx(c, cf, o3, inv3, RAY_TMIN, eff_bt) & entered
            leaf_mt(c, cn, boxn & leaf[cn], o3, d3, bt, state, anyhit,
                    eff_bt)
            qpush[tids[entered & boxn & leaf[cn]] * L
                  + lane_idx[entered & boxn & leaf[cn]]] += 1
            leaf_mt(c, cf, boxf & leaf[cf], o3, d3, bt, state, anyhit,
                    eff_bt)
            qpush[tids[entered & boxf & leaf[cf]] * L
                  + lane_idx[entered & boxf & leaf[cf]]] += 1
            go_n = boxn & ~leaf[cn]
            go_f = boxf & ~leaf[cf] & ~go_n
            nxt_pair = np.where(go_n, succ[nc],
                                np.where(go_f, far[nc], pex[nc]))
            nxt_top = np.where(box_self & ~leaf[nc], succ[nc], skip[nc])
            nxt = np.where(entered, nxt_pair, nxt_top)
            nxt = np.where(is_root & leaf[nc], skip[nc], nxt)
            if anyhit:
                nxt = np.where(state["occ"] != 0, end, nxt)
            node = np.where(active, nxt, end)

        ts = tsteps.reshape(nt + 1, L)
        qp = qpush.reshape(nt + 1, L)
        t_max = ts[:-1].max(axis=1)
        return {
            "treelet_step_sum": int(t_max.sum()),
            "visited_treelets": int((t_max > 0).sum()),
            "qpush_max_sum": int(qp[:-1].max(axis=1).sum()),
        }

    # prepass is tree-independent (chunk ROOT boxes only) — compute once
    inst_of_entry = np.asarray([i for i, _ in static.traversal_list])

    def run_sweep(chs, rays_o, rays_d, window, anyhit, label,
                  want_state):
        rays = pack_rays(
            tuple(jnp.asarray(rays_o[i].reshape(p, 8, 128))
                  for i in range(3)),
            tuple(jnp.asarray(rays_d[i].reshape(p, 8, 128))
                  for i in range(3)),
        )
        bits, octs, depth = chunk_block_hits(
            scene, static, rays, jnp.asarray(window.reshape(p, 8, 128)),
            RAY_TMIN, roots=None, entries=static.traversal_list)
        bits = np.asarray(bits)
        octs = np.asarray(octs)
        depth = np.asarray(depth)
        order = np.argsort(depth, kind="stable")
        pb = p // BLOCK_PACKETS

        agg = {"walks": 0, "steps": 0, "sites": 0, "qpush": 0}
        bt = window.reshape(-1).astype(np.float32).copy()
        state_full = {
            "slot": np.full(p * 1024, -1, np.int64),
            "u": np.zeros(p * 1024, np.float32),
            "v": np.zeros(p * 1024, np.float32),
            "entry": np.full(p * 1024, -1, np.int64),
            "occ": np.zeros(p * 1024, np.int32),
        }
        L = group * 1024
        t_start = time.perf_counter()
        for rank, e in enumerate(order):
            inst, chunk = static.traversal_list[e]
            c = chs[chunk]
            m = w2o[inst]
            row = bits[e]
            live_blocks = [b for b in range(pb)
                           if (row[b // 32] >> (b % 32)) & 1]
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
                    stats = walk(c, octs[b], o3, d3, win, bt[sl], st,
                                 anyhit)
                    if not anyhit:
                        st["entry"][st["hit_here"]] = e
                    for kk in ("slot", "u", "v", "entry", "occ"):
                        state_full[kk][sl] = st[kk]
                    agg["walks"] += 1
                    agg["steps"] += stats["treelet_step_sum"]
                    agg["sites"] += stats["visited_treelets"]
                    agg["qpush"] += stats["qpush_max_sum"]
            if rank % 12 == 0:
                print(f"  [{label}] entry {rank + 1}/{len(order)}"
                      f" ({time.perf_counter() - t_start:.0f}s)",
                      flush=True)
        return agg, (bt, state_full)

    def hit_attribs(chs, st, bt, of, df):
        valid = st["slot"] >= 0
        pos = of + bt[None, :] * df
        nrm = np.zeros((3, p * 1024), np.float32)
        for e, (inst, chunk) in enumerate(static.traversal_list):
            m_ = st["entry"] == e
            if not m_.any():
                continue
            c = chs[chunk]
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

    # ---- derive the sweep sequence ONCE (first variant), then replay ---
    bounces = int(os.environ.get("SIM_BOUNCES", "1"))
    ior = 1.52
    base = LEAVES[0]
    sweeps = []   # (label, o, d, window, anyhit)
    o_cur = onp.reshape(3, -1).astype(np.float32)
    d_cur = dnp.reshape(3, -1).astype(np.float32)
    active = inf_np.reshape(-1).copy()
    summary = {ls: {} for ls in LEAVES}
    bt_ref = {}
    for j in range(bounces + 1):
        window = np.where(active, np.float32(RAY_TMAX), 0.0).astype(
            np.float32)
        lbl = f"closest_j{j}"
        sweeps.append((lbl, o_cur.copy(), d_cur.copy(), window, False))
        agg_c, (bt, st) = run_sweep(
            variants[base], o_cur.reshape(3, p, 1024),
            d_cur.reshape(3, p, 1024), window, False, f"{lbl}/L{base}",
            True)
        summary[base][lbl] = agg_c
        bt_ref[lbl] = bt
        valid, pos, nrm, mat_lane = hit_attribs(variants[base], st, bt,
                                                o_cur, d_cur)
        hitm = active & valid
        ddotn = (d_cur * nrm).sum(axis=0)
        lit = hitm & (mat_lane == 0) & (ddotn < 0)
        sh_o = pos + HIT_EPSILON * nrm
        to_l = light_pos[:, None] - pos
        ldist = np.sqrt((to_l ** 2).sum(axis=0))
        ldir = (to_l / np.maximum(ldist, 1e-30)).astype(np.float32)
        sh_win = np.where(lit, ldist, 0.0).astype(np.float32)
        slbl = f"shadow_j{j}"
        sweeps.append((slbl, sh_o.astype(np.float32).copy(),
                       ldir.astype(np.float32).copy(), sh_win, True))
        agg_s, _ = run_sweep(
            variants[base], sh_o.reshape(3, p, 1024).astype(np.float32),
            ldir.reshape(3, p, 1024), sh_win, True, f"{slbl}/L{base}",
            False)
        summary[base][slbl] = agg_s
        is_m = hitm & (mat_lane == 1)
        is_r = hitm & (mat_lane == 2)
        cont = is_m | is_r
        if j == bounces or not cont.any():
            break
        dn = 2.0 * ddotn
        d_m = d_cur - dn[None] * nrm
        o_m = pos + HIT_EPSILON * nrm
        outw = ddotn > 0.0
        n_f = np.where(outw[None], -nrm, nrm)
        ndoti_f = np.where(outw, -ddotn, ddotn)
        ratio = np.where(outw, ior, 1.0 / ior).astype(np.float32)
        kk = 1.0 - ratio * ratio * (1.0 - ndoti_f * ndoti_f)
        tir = kk < 0.0
        d_tir = d_cur - (2.0 * (d_cur * n_f).sum(0))[None] * n_f
        coeff = ratio * ndoti_f + np.sqrt(np.maximum(kk, 0.0))
        r_d = ratio[None] * d_cur - coeff[None] * n_f
        r_d = r_d / np.maximum(np.sqrt((r_d ** 2).sum(0))[None], 1e-30)
        d_r = np.where(tir[None], d_tir, r_d)
        o_r = np.where(tir[None], pos + HIT_EPSILON * n_f,
                       pos - HIT_EPSILON * n_f)
        o_cur = np.where(is_m[None], o_m,
                         np.where(is_r[None], o_r, o_cur)).astype(np.float32)
        d_cur = np.where(is_m[None], d_m,
                         np.where(is_r[None], d_r, d_cur)).astype(np.float32)
        active = cont

    # replay the SAME ray sequences for the other variants + check results
    for ls in LEAVES[1:]:
        for lbl, ro, rd, win, anyhit in sweeps:
            agg, (bt, st) = run_sweep(
                variants[ls], ro.reshape(3, p, 1024),
                rd.reshape(3, p, 1024), win, anyhit, f"{lbl}/L{ls}",
                False)
            if not anyhit:
                agg["bt_mismatch"] = int((bt != bt_ref[lbl]).sum())
            summary[ls][lbl] = agg

    out = {}
    for ls in LEAVES:
        tot = {"steps": 0, "sites": 0, "qpush": 0}
        for lbl, agg in summary[ls].items():
            for k in tot:
                tot[k] += agg[k]
        out[f"L{ls}"] = {
            "per_sweep": summary[ls], "total": tot,
            # rough kernel-time model (us): 0.30us/step (gather-latency
            # chain), drains ~0.08us per MT slot-gather row (9 gathers)
            # x leaf_size per queue entry, 1.1us per site entry
            "model_us": round(
                0.30 * tot["steps"] + 0.08 * ls * tot["qpush"]
                + 1.1 * tot["sites"], 0),
        }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
