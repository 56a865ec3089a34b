#!/usr/bin/env python
"""Round-4 frontier probe: per-lane BVH traversal via tpu.dynamic_gather.

The consensus walk's measured ceiling (~160-190 Mrays/s, docs/roadmap.md
item 13) is union breadth: all 4096 lanes of a group share ONE node
pointer, so the walk visits the union of the lanes' per-ray paths (~5.6x
the per-ray ideal). Mosaic lowers ``jnp.take_along_axis`` on matching
2D (8,128) operands to ``tpu.dynamic_gather``: axis=1 permutes within
each sublane row (128-entry tables, row-replicated), axis=0 within each
lane column. NOTE a chained axis1+axis0 gather does NOT give a flat
1024-entry lookup (the second gather permutes the first's indices too —
measured wrong on hardware), so lookups are **bank-selected**: a table of
N entries is stored as ceil(N/128) row-replicated (8,128) banks; a lookup
is one lane-gather per bank + a select chain keyed on idx>>7. 1 bank =
1 op; 2 banks = 3 ops; 8 banks = 24 ops.

That sizes a per-lane-walkable treelet at <=128 nodes / <=256 triangles
(leaf_size 4): node lookups cost 1 op, triangle lookups 3. Every lane
walks its OWN pointer; iterations = max per-lane path length instead of
the union. This probe measures on real hardware:

1. correctness of the bank-select lookup (128 and 256 entries);
2. ns/iteration of a per-lane walk step at (4,8,128) group width,
   interior-only and with an unconditional (masked) 4-tri MT leaf step;
3. the same loop structure for the consensus walk step (ops/mega.py
   shape: scalar pointer, SMEM tables, jnp.any consensus, lax.cond leaf).

Per-iteration cost ratio x walk-length ratio (union vs max-per-lane,
measured by tools/r4_perlane_sim.py on the real scene) decides whether a
per-lane traversal tier can beat the consensus ceiling.

Run: python tools/r4_gather_probe.py   (TPU)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUP = int(os.environ.get("PROBE_GROUP", "4"))  # interleaved per-lane slices
N_NODE = 128       # treelet node-table entries (1 bank)
N_TRI = 256        # treelet triangle-table entries (2 banks)
ITERS = int(os.environ.get("PROBE_ITERS", "4096"))  # walk iterations per call


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.devices()[0].platform, flush=True)

    def look1(bank, idx):
        """128-entry lookup: bank (8,128) row-replicated, idx (8,128)."""
        return jnp.take_along_axis(bank, idx, axis=1)

    def look_banks(banks, idx):
        """ceil(N/128)-bank lookup via lane gathers + a select chain."""
        lane = idx & 127
        out = jnp.take_along_axis(banks[0], lane, axis=1)
        for k in range(1, len(banks)):
            g = jnp.take_along_axis(banks[k], lane, axis=1)
            out = jnp.where((idx >> 7) == k, g, out)
        return out

    # ---- 1. correctness ----
    rng = np.random.RandomState(0)

    def repl(vals):  # row-replicate a flat table into (banks, 8, 128)
        n = vals.shape[0]
        nb = -(-n // 128)
        pad = np.zeros(nb * 128, vals.dtype)
        pad[:n] = vals
        return np.broadcast_to(
            pad.reshape(nb, 1, 128), (nb, 8, 128)
        ).copy()

    tab256 = rng.randn(256).astype(np.float32)
    idx256 = rng.randint(0, 256, size=(8, 128)).astype(np.int32)
    banks256 = repl(tab256)

    def corr_kernel(b_ref, idx_ref, out_ref):
        banks = [b_ref[k] for k in range(2)]
        out_ref[...] = look_banks(banks, idx_ref[...])

    corr = pl.pallas_call(
        corr_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )
    got = np.asarray(corr(jnp.asarray(banks256), jnp.asarray(idx256)))
    ok = bool(np.array_equal(got, tab256[idx256]))
    print(json.dumps({"bank_select_gather_exact": ok}), flush=True)
    if not ok:
        return 1

    # ---- shared fake treelet tables ----
    planes = rng.randn(6, 128).astype(np.float32) * 2.0
    node_ids = np.arange(N_NODE)
    succ = np.minimum(node_ids + rng.randint(1, 3, N_NODE), N_NODE - 1)
    skip = np.minimum(node_ids + rng.randint(1, 17, N_NODE), N_NODE - 1)
    first = np.where(rng.rand(N_NODE) < 0.4,
                     rng.randint(0, N_TRI - 4, N_NODE), -1).astype(np.int32)
    tris = rng.randn(9, N_TRI).astype(np.float32)

    planes_b = np.stack([repl(planes[c])[0] for c in range(6)])   # (6,8,128)
    links_b = np.stack([repl(succ.astype(np.int32))[0],
                        repl(skip.astype(np.int32))[0],
                        repl(first)[0]])                          # (3,8,128)
    tris_b = np.stack([repl(tris[c]) for c in range(9)])          # (9,2,8,128)

    o = rng.randn(3, GROUP, 8, 128).astype(np.float32)
    d = rng.randn(3, GROUP, 8, 128).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    node0 = rng.randint(0, 32, size=(GROUP, 8, 128)).astype(np.int32)

    # ---- 2. per-lane walk step ----
    def perlane_kernel(planes_ref, links_ref, tris_ref, o_ref, d_ref,
                       n0_ref, out_ref, *, leaf: bool):
        ptab = [planes_ref[c] for c in range(6)]
        succ_t = links_ref[0]
        skip_t = links_ref[1]
        first_t = links_ref[2]
        ttab = [[tris_ref[c, k] for k in range(2)] for c in range(9)]

        def step(g, carry):
            node, bt, acc = carry
            ov = [o_ref[c, g] for c in range(3)]
            dv = [d_ref[c, g] for c in range(3)]
            inv = [jnp.where(x != 0.0, 1.0 / x,
                             jnp.where(x >= 0, jnp.inf, -jnp.inf))
                   for x in dv]
            fi = look1(first_t, node)
            tns, tfs = [], []
            for a in range(3):
                lo = look1(ptab[a], node)
                hi = look1(ptab[3 + a], node)
                t0 = (lo - ov[a]) * inv[a]
                t1 = (hi - ov[a]) * inv[a]
                tns.append(jnp.minimum(t0, t1))
                tfs.append(jnp.maximum(t0, t1))
            tn = jnp.maximum(jnp.maximum(tns[0], tns[1]),
                             jnp.maximum(tns[2], 1e-3))
            tf = jnp.minimum(jnp.minimum(tfs[0], tfs[1]),
                             jnp.minimum(tfs[2], bt))
            hit = tn <= tf
            if leaf:
                do_mt = hit & (fi >= 0)
                fc = jnp.maximum(fi, 0)
                for k in range(4):
                    sidx = jnp.minimum(fc + k, N_TRI - 1)
                    v0 = [look_banks(ttab[a], sidx) for a in range(3)]
                    e1 = [look_banks(ttab[3 + a], sidx) for a in range(3)]
                    e2 = [look_banks(ttab[6 + a], sidx) for a in range(3)]
                    px = dv[1] * e2[2] - dv[2] * e2[1]
                    py = dv[2] * e2[0] - dv[0] * e2[2]
                    pz = dv[0] * e2[1] - dv[1] * e2[0]
                    det = e1[0] * px + e1[1] * py + e1[2] * pz
                    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                    tvx = ov[0] - v0[0]
                    tvy = ov[1] - v0[1]
                    tvz = ov[2] - v0[2]
                    u = (tvx * px + tvy * py + tvz * pz) * inv_det
                    qx = tvy * e1[2] - tvz * e1[1]
                    qy = tvz * e1[0] - tvx * e1[2]
                    qz = tvx * e1[1] - tvy * e1[0]
                    v = (dv[0] * qx + dv[1] * qy + dv[2] * qz) * inv_det
                    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
                    h = (do_mt & (jnp.abs(det) > 1e-9) & (u >= 0.0)
                         & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-3)
                         & (t < bt))
                    bt = jnp.where(h, t, bt)
                    acc = acc + jnp.where(h, 1.0, 0.0)
            nxt = jnp.where(hit, look1(succ_t, node), look1(skip_t, node))
            # restart finished walks so every iteration does real work
            restart = (node * 13 + jnp.int32(7)) & 31
            node = jnp.where(nxt >= N_NODE - 1, restart, nxt)
            acc = acc + jnp.where(hit, 1.0, 0.0)
            return node, bt, acc

        def body(i, carrys):
            return tuple(step(g, carrys[g]) for g in range(GROUP))

        init = tuple(
            (n0_ref[g], jnp.full((8, 128), 1e4, jnp.float32),
             jnp.zeros((8, 128), jnp.float32))
            for g in range(GROUP)
        )
        final = jax.lax.fori_loop(0, ITERS, body, init)
        for g in range(GROUP):
            node, bt, acc = final[g]
            out_ref[g] = acc + bt + node.astype(jnp.float32)

    def build_perlane(leaf):
        return pl.pallas_call(
            functools.partial(perlane_kernel, leaf=leaf),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GROUP, 8, 128), jnp.float32),
            interpret=interpret,
        )

    f_int = jax.jit(lambda *a: build_perlane(False)(*a))
    f_leaf = jax.jit(lambda *a: build_perlane(True)(*a))

    # ---- 3. consensus walk step baseline (ops/mega.py shape) ----
    pn = N_NODE
    tabf = np.zeros((6 * pn + 9 * N_TRI,), np.float32)
    for c in range(6):
        tabf[c * pn:(c + 1) * pn] = planes[c]
    for c in range(9):
        tabf[6 * pn + c * N_TRI: 6 * pn + (c + 1) * N_TRI] = tris[c]
    tabi = np.concatenate([first, np.full(pn, 4, np.int32)]).astype(np.int32)
    tabo = np.concatenate([succ, skip]).astype(np.int32)

    def consensus_kernel(tabf_ref, tabi_ref, tabo_ref, o_ref, d_ref,
                         out_ref, *, leaf: bool):
        ov = [o_ref[c] for c in range(3)]
        dv = [d_ref[c] for c in range(3)]
        inv = [jnp.where(x != 0.0, 1.0 / x,
                         jnp.where(x >= 0, jnp.inf, -jnp.inf)) for x in dv]

        def body(i, carry):
            node, bt, acc = carry
            fi = tabi_ref[node]
            tns, tfs = [], []
            for a in range(3):
                t0 = (tabf_ref[a * pn + node] - ov[a]) * inv[a]
                t1 = (tabf_ref[(3 + a) * pn + node] - ov[a]) * inv[a]
                tns.append(jnp.minimum(t0, t1))
                tfs.append(jnp.maximum(t0, t1))
            tn = jnp.maximum(jnp.maximum(tns[0], tns[1]),
                             jnp.maximum(tns[2], 1e-3))
            tf = jnp.minimum(jnp.minimum(tfs[0], tfs[1]),
                             jnp.minimum(tfs[2], bt))
            hit = tn <= tf
            any_hit = jnp.any(hit)
            is_leaf = fi >= 0

            if leaf:
                def leaf_case(carry):
                    bt, acc = carry
                    for k in range(4):
                        s = fi + k
                        v0 = [tabf_ref[6 * pn + a * N_TRI + s]
                              for a in range(3)]
                        e1 = [tabf_ref[6 * pn + (3 + a) * N_TRI + s]
                              for a in range(3)]
                        e2 = [tabf_ref[6 * pn + (6 + a) * N_TRI + s]
                              for a in range(3)]
                        px = dv[1] * e2[2] - dv[2] * e2[1]
                        py = dv[2] * e2[0] - dv[0] * e2[2]
                        pz = dv[0] * e2[1] - dv[1] * e2[0]
                        det = e1[0] * px + e1[1] * py + e1[2] * pz
                        inv_det = jnp.where(jnp.abs(det) > 1e-9,
                                            1.0 / det, 0.0)
                        tvx = ov[0] - v0[0]
                        tvy = ov[1] - v0[1]
                        tvz = ov[2] - v0[2]
                        u = (tvx * px + tvy * py + tvz * pz) * inv_det
                        qx = tvy * e1[2] - tvz * e1[1]
                        qy = tvz * e1[0] - tvx * e1[2]
                        qz = tvx * e1[1] - tvy * e1[0]
                        v = (dv[0] * qx + dv[1] * qy + dv[2] * qz) * inv_det
                        t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
                        h = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                             & (u + v <= 1.0) & (t > 1e-3) & (t < bt))
                        bt = jnp.where(h, t, bt)
                        acc = acc + jnp.where(h, 1.0, 0.0)
                    return bt, acc

                bt, acc = jax.lax.cond(any_hit & is_leaf, leaf_case,
                                       lambda c: c, (bt, acc))
            nxt = jnp.where(is_leaf | ~any_hit, tabo_ref[pn + node],
                            tabo_ref[node])
            node = jnp.where(nxt >= pn - 1, (i * 7) % 32, nxt)
            acc = acc + jnp.where(hit, 1.0, 0.0)
            return node, bt, acc

        init = (jnp.int32(0),
                jnp.full((GROUP, 8, 128), 1e4, jnp.float32),
                jnp.zeros((GROUP, 8, 128), jnp.float32))
        node, bt, acc = jax.lax.fori_loop(0, ITERS, body, init)
        out_ref[...] = acc + bt + node.astype(jnp.float32)

    def build_cons(leaf):
        return pl.pallas_call(
            functools.partial(consensus_kernel, leaf=leaf),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GROUP, 8, 128), jnp.float32),
            interpret=interpret,
        )

    c_int = jax.jit(lambda *a: build_cons(False)(*a))
    c_leaf = jax.jit(lambda *a: build_cons(True)(*a))

    pj = jnp.asarray(planes_b)
    lj = jnp.asarray(links_b)
    tj = jnp.asarray(tris_b)
    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    nj = jnp.asarray(node0)
    tfj = jnp.asarray(tabf)
    tij = jnp.asarray(tabi)
    toj = jnp.asarray(tabo)

    def timeit(f, *args, iters=50):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # ---- 4. raw gather latency: serial dependent lookup chain ----
    def chain_kernel(links_ref, n0_ref, out_ref, *, par: int):
        succ_t = links_ref[0]

        def body(i, nodes):
            return tuple(look1(succ_t, nd) for nd in nodes)

        init = tuple(n0_ref[g] for g in range(par))
        final = jax.lax.fori_loop(0, ITERS, body, init)
        acc = final[0]
        for g in range(1, par):
            acc = acc + final[g]
        out_ref[...] = acc

    def build_chain(par):
        return pl.pallas_call(
            functools.partial(chain_kernel, par=par),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            interpret=interpret,
        )

    ch1 = jax.jit(lambda *a: build_chain(1)(*a))
    ch4 = jax.jit(lambda *a: build_chain(4)(*a))

    # ---- 5. MT-phase step with NODE-INDEXED tri tables (1 gather per
    # lookup: tables t[k][c] indexed by the lane's leaf-node id) ----
    tris_ni = rng.randn(4, 9, 128).astype(np.float32)
    nrm_ni = rng.randn(4, 9, 128).astype(np.float32)
    tris_nib = np.stack([np.stack([repl(tris_ni[k, c])[0]
                                   for c in range(9)])
                         for k in range(4)])            # (4,9,8,128)
    nrm_nib = np.stack([np.stack([repl(nrm_ni[k, c])[0]
                                  for c in range(9)])
                        for k in range(4)])             # (4,9,8,128)

    def mtphase_kernel(tris_ref, nrm_ref, links_ref, o_ref, d_ref, n0_ref,
                       out_ref, *, interp: bool):
        count_t = links_ref[2]   # reuse "first" bank as a count-ish table

        def phase(g, carry):
            node, bt, acc = carry
            ov = [o_ref[c, g] for c in range(3)]
            dv = [d_ref[c, g] for c in range(3)]
            cnt = look1(count_t, node)
            improved = jnp.zeros(node.shape, jnp.bool_)
            bu = jnp.zeros(node.shape, jnp.float32)
            bv = jnp.zeros(node.shape, jnp.float32)
            bk = jnp.zeros(node.shape, jnp.int32)
            for k in range(4):
                v0 = [look1(tris_ref[k, a], node) for a in range(3)]
                e1 = [look1(tris_ref[k, 3 + a], node) for a in range(3)]
                e2 = [look1(tris_ref[k, 6 + a], node) for a in range(3)]
                px = dv[1] * e2[2] - dv[2] * e2[1]
                py = dv[2] * e2[0] - dv[0] * e2[2]
                pz = dv[0] * e2[1] - dv[1] * e2[0]
                det = e1[0] * px + e1[1] * py + e1[2] * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                tvx = ov[0] - v0[0]
                tvy = ov[1] - v0[1]
                tvz = ov[2] - v0[2]
                u = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1[2] - tvz * e1[1]
                qy = tvz * e1[0] - tvx * e1[2]
                qz = tvx * e1[1] - tvy * e1[0]
                v = (dv[0] * qx + dv[1] * qy + dv[2] * qz) * inv_det
                t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
                h = ((cnt > k - 100) & (jnp.abs(det) > 1e-9) & (u >= 0.0)
                     & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-3) & (t < bt))
                bt = jnp.where(h, t, bt)
                bu = jnp.where(h, u, bu)
                bv = jnp.where(h, v, bv)
                bk = jnp.where(h, k, bk)
                improved = improved | h
            if interp:
                wgt = 1.0 - bu - bv
                for a in range(3):
                    n_a = jnp.zeros(node.shape, jnp.float32)
                    for k in range(4):
                        sel = bk == k
                        n0 = look1(nrm_ref[k, a], node)
                        n1 = look1(nrm_ref[k, 3 + a], node)
                        n2 = look1(nrm_ref[k, 6 + a], node)
                        n_a = jnp.where(sel, wgt * n0 + bu * n1 + bv * n2,
                                        n_a)
                    acc = acc + jnp.where(improved, n_a, 0.0)
            node = (node * 13 + 7) & 127
            acc = acc + jnp.where(improved, 1.0, 0.0)
            return node, bt, acc

        def body(i, carrys):
            return tuple(phase(g, carrys[g]) for g in range(GROUP))

        init = tuple(
            (n0_ref[g], jnp.full((8, 128), 1e4, jnp.float32),
             jnp.zeros((8, 128), jnp.float32))
            for g in range(GROUP)
        )
        final = jax.lax.fori_loop(0, ITERS, body, init)
        for g in range(GROUP):
            node, bt, acc = final[g]
            out_ref[g] = acc + bt + node.astype(jnp.float32)

    def build_mtphase(interp):
        return pl.pallas_call(
            functools.partial(mtphase_kernel, interp=interp),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GROUP, 8, 128), jnp.float32),
            interpret=interpret,
        )

    mtp = jax.jit(lambda *a: build_mtphase(False)(*a))
    mtpi = jax.jit(lambda *a: build_mtphase(True)(*a))
    tnij = jnp.asarray(tris_nib)
    nnij = jnp.asarray(nrm_nib)

    res = {}
    for name, f, args in (
        ("gather_chain_par1", ch1, (lj, nj)),
        ("gather_chain_par4", ch4, (lj, nj)),
        ("mtphase_nodeidx", mtp, (tnij, nnij, lj, oj, dj, nj)),
        ("mtphase_nodeidx_interp", mtpi, (tnij, nnij, lj, oj, dj, nj)),
        ("perlane_interior", f_int, (pj, lj, tj, oj, dj, nj)),
        ("perlane_leafmix", f_leaf, (pj, lj, tj, oj, dj, nj)),
        ("consensus_interior", c_int, (tfj, tij, toj, oj, dj)),
        ("consensus_leafmix", c_leaf, (tfj, tij, toj, oj, dj)),
    ):
        t = timeit(f, *args)
        res[name + "_ns_per_iter"] = round(t / ITERS * 1e9, 1)
    print(json.dumps({"walk_step": res, "group": GROUP, "iters": ITERS}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
