#!/usr/bin/env python
"""Round-4 mechanics probe for the two-level per-lane traversal tier.

tools/r4_gather_probe.py established the per-lane walk *step* cost;
tools/r4_perlane_sim.py the walk-length ratios. Before building the real
kernel, this probe pins down the remaining kernel-mechanics unknowns on
hardware:

1. **bank layout**: treelet tables as 8x-replicated (T, rows, 8, 128)
   banks vs COMPACT (T, rows, 128) rows read with a static row index and
   sublane-broadcast to (8, 128). Compact is 6-8x less VMEM (and DMA) if
   the broadcast is cheap.
2. **dynamic treelet indexing**: all bank reads go through a traced
   leading-dim index (the current treelet id, a scalar) — correctness +
   cost vs a static index.
3. **realistic interior step**: the closest-walk carry is 13 vregs per
   (8,128) slice x 4 interleaved slices (node, best t/slot/u/v, normal
   x3, leaf-queue x4, queue count) — measures the step WITH the full
   carry + queue push, so register spills show up here, not in the
   final kernel (the PAIR_W=2 lesson).
4. **drain step**: Q=4 deferred-leaf drain via node-indexed MT tables
   (4 slots x 9 coords), with and without normal interpolation on hit.
5. **per-site overhead**: outer loop over treelet sites, each a
   lax.cond(enter) wrapping an inner while loop — the two-level
   structure's fixed cost per visited treelet (sim: ~3.1k sites/sweep).

Run: python tools/r4_mech_probe.py   (TPU)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUP = int(os.environ.get("PROBE_GROUP", "4"))
T = int(os.environ.get("PROBE_T", "8"))        # fake treelets resident
N_NODE = 128
ITERS = int(os.environ.get("PROBE_ITERS", "4096"))
QD = 4                                          # leaf-queue depth


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)

    # ---- fake treelet tables ----
    # compact f32 rows per treelet: 0-5 box planes, 6.. = 4*9 tri rows,
    # then 4*9 normal rows → 6 + 36 + 36 = 78 rows (pad 80)
    ROWS_F = 80
    OFF_TRI = 6
    OFF_NRM = 6 + 36
    # compact i32 rows: 0 succ, 1 skip, 2 count
    ROWS_I = 8

    f32c = rng.randn(T, ROWS_F, 128).astype(np.float32)
    node_ids = np.arange(N_NODE)
    succ = np.minimum(node_ids + rng.randint(1, 3, N_NODE), N_NODE - 1)
    skip = np.minimum(node_ids + rng.randint(1, 17, N_NODE), N_NODE - 1)
    count = np.where(rng.rand(N_NODE) < 0.4,
                     rng.randint(1, 5, N_NODE), 0).astype(np.int32)
    i32c = np.zeros((T, ROWS_I, 128), np.int32)
    i32c[:, 0] = succ
    i32c[:, 1] = skip
    i32c[:, 2] = count

    # replicated variants
    f32r = np.broadcast_to(f32c[:, :, None, :], (T, ROWS_F, 8, 128)).copy()
    i32r = np.broadcast_to(i32c[:, :, None, :], (T, ROWS_I, 8, 128)).copy()

    o = rng.randn(3, GROUP, 8, 128).astype(np.float32)
    d = rng.randn(3, GROUP, 8, 128).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    node0 = rng.randint(0, 32, size=(GROUP, 8, 128)).astype(np.int32)
    tid0 = np.zeros((1,), np.int32)

    def look(bank, idx):
        return jnp.take_along_axis(bank, idx, axis=1)

    # ---- 1+2. correctness: dynamic-tid compact read + broadcast ----
    def corr_kernel(tid_ref, f32c_ref, idx_ref, out_ref):
        tid = tid_ref[0]
        rowv = f32c_ref[tid, 3]                       # (128,)
        bank = jnp.broadcast_to(rowv.reshape(1, 128), (8, 128))
        out_ref[...] = look(bank, idx_ref[...])

    idx = rng.randint(0, 128, size=(8, 128)).astype(np.int32)
    for tv in (0, T - 1):
        got = pl.pallas_call(
            corr_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret,
        )(jnp.asarray([tv], jnp.int32), jnp.asarray(f32c),
          jnp.asarray(idx))
        ok = bool(np.array_equal(np.asarray(got), f32c[tv, 3][idx]))
        print(json.dumps({f"compact_dyn_tid_{tv}_exact": ok}), flush=True)
        if not ok:
            return 1

    # ---- helpers for the walk steps ----
    def read_row_c(ref, tid, row):
        return jnp.broadcast_to(ref[tid, row].reshape(1, 128), (8, 128))

    def read_row_r(ref, tid, row):
        return ref[tid, row]

    def slab_gather(read, fref, tid, node, ov, inv, bt, tmin=1e-3):
        tns, tfs = [], []
        for a in range(3):
            lo = look(read(fref, tid, a), node)
            hi = look(read(fref, tid, 3 + a), node)
            t0 = (lo - ov[a]) * inv[a]
            t1 = (hi - ov[a]) * inv[a]
            tns.append(jnp.minimum(t0, t1))
            tfs.append(jnp.maximum(t0, t1))
        tn = jnp.maximum(jnp.maximum(tns[0], tns[1]),
                         jnp.maximum(tns[2], tmin))
        tf = jnp.minimum(jnp.minimum(tfs[0], tfs[1]),
                         jnp.minimum(tfs[2], bt))
        return tn <= tf

    # ---- 3. interior step with full closest carry + queue push ----
    def interior_kernel(tid_ref, fref, iref, o_ref, d_ref, n0_ref, out_ref,
                        *, compact: bool):
        read = read_row_c if compact else read_row_r
        tid = tid_ref[0]

        def step(g, carry):
            (node, bt, bs, bu, bv, bn0, bn1, bn2, q0, q1, q2, q3,
             qc) = carry
            ov = [o_ref[c, g] for c in range(3)]
            dv = [d_ref[c, g] for c in range(3)]
            inv = [jnp.where(x != 0.0, 1.0 / x,
                             jnp.where(x >= 0, jnp.inf, -jnp.inf))
                   for x in dv]
            box = slab_gather(read, fref, tid, node, ov, inv, bt)
            cnt = look(read(iref, tid, 2), node)
            is_leaf = cnt > 0
            push = box & is_leaf
            q0 = jnp.where(push & (qc == 0), node, q0)
            q1 = jnp.where(push & (qc == 1), node, q1)
            q2 = jnp.where(push & (qc == 2), node, q2)
            q3 = jnp.where(push & (qc == 3), node, q3)
            qc = qc + jnp.where(push, 1, 0)
            nxt = jnp.where(box & ~is_leaf,
                            look(read(iref, tid, 0), node),
                            look(read(iref, tid, 1), node))
            restart = (node * 13 + jnp.int32(7)) & 31
            node = jnp.where(nxt >= N_NODE - 1, restart, nxt)
            qc = jnp.where(qc >= QD, 0, qc)   # fake-drain reset
            bt = bt - 1e-7                     # keep carry live
            return (node, bt, bs, bu, bv, bn0, bn1, bn2, q0, q1, q2,
                    q3, qc)

        def body(i, carrys):
            return tuple(step(g, carrys[g]) for g in range(GROUP))

        z = jnp.zeros((8, 128), jnp.float32)
        zi = jnp.zeros((8, 128), jnp.int32)
        init = tuple(
            (n0_ref[g], jnp.full((8, 128), 1e4, jnp.float32),
             jnp.full((8, 128), -1, jnp.int32), z, z, z, z, z,
             zi, zi, zi, zi, zi)
            for g in range(GROUP)
        )
        final = jax.lax.fori_loop(0, ITERS, body, init)
        for g in range(GROUP):
            c = final[g]
            out_ref[g] = (c[1] + c[0].astype(jnp.float32)
                          + c[12].astype(jnp.float32))

    def build(kern, n_in, **kw):
        return jax.jit(lambda *a: pl.pallas_call(
            functools.partial(kern, **kw),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_in - 1),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GROUP, 8, 128), jnp.float32),
            interpret=interpret,
        )(*a))

    int_c = build(interior_kernel, 6, compact=True)
    int_r = build(interior_kernel, 6, compact=False)

    # ---- 4. drain step: Q=4 node-indexed MT, +/- interp ----
    def drain_kernel(tid_ref, fref, iref, o_ref, d_ref, n0_ref, out_ref,
                     *, compact: bool, interp: bool):
        read = read_row_c if compact else read_row_r
        tid = tid_ref[0]

        def drain(g, carry):
            node, bt, bn0, bn1, bn2, acc = carry
            ov = [o_ref[c, g] for c in range(3)]
            dv = [d_ref[c, g] for c in range(3)]
            cnt = look(read(iref, tid, 2), node)
            # 4 queue slots, each the same fake node perturbed (static
            # unroll like the real drain; masked by qslot < qc ~ cnt)
            for j in range(QD):
                qn = (node + j) & 127
                qm = cnt > j          # stand-in queue-occupancy mask
                improved = jnp.zeros(node.shape, jnp.bool_)
                bu = jnp.zeros(node.shape, jnp.float32)
                bv = jnp.zeros(node.shape, jnp.float32)
                bk = jnp.zeros(node.shape, jnp.int32)
                for k in range(4):
                    base = OFF_TRI + k * 9
                    v0 = [look(read(fref, tid, base + a), qn)
                          for a in range(3)]
                    e1 = [look(read(fref, tid, base + 3 + a), qn)
                          for a in range(3)]
                    e2 = [look(read(fref, tid, base + 6 + a), qn)
                          for a in range(3)]
                    px = dv[1] * e2[2] - dv[2] * e2[1]
                    py = dv[2] * e2[0] - dv[0] * e2[2]
                    pz = dv[0] * e2[1] - dv[1] * e2[0]
                    det = e1[0] * px + e1[1] * py + e1[2] * pz
                    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det,
                                        0.0)
                    tvx = ov[0] - v0[0]
                    tvy = ov[1] - v0[1]
                    tvz = ov[2] - v0[2]
                    u = (tvx * px + tvy * py + tvz * pz) * inv_det
                    qx = tvy * e1[2] - tvz * e1[1]
                    qy = tvz * e1[0] - tvx * e1[2]
                    qz = tvx * e1[1] - tvy * e1[0]
                    v = (dv[0] * qx + dv[1] * qy + dv[2] * qz) * inv_det
                    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
                    h = (qm & (jnp.abs(det) > 1e-9) & (u >= 0.0)
                         & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-3)
                         & (t < bt))
                    bt = jnp.where(h, t, bt)
                    bu = jnp.where(h, u, bu)
                    bv = jnp.where(h, v, bv)
                    bk = jnp.where(h, k, bk)
                    improved = improved | h
                if interp:
                    def interp_fn(bns, qn=qn, bu=bu, bv=bv, bk=bk,
                                  improved=improved):
                        bn0, bn1, bn2 = bns
                        w_ = 1.0 - bu - bv
                        outs = []
                        for a, bna in enumerate((bn0, bn1, bn2)):
                            n_a = jnp.zeros(qn.shape, jnp.float32)
                            for k in range(4):
                                base = OFF_NRM + k * 9
                                sel = bk == k
                                nv = [look(read(fref, tid, base + 3 * c
                                                + a), qn)
                                      for c in range(3)]
                                n_a = jnp.where(
                                    sel,
                                    w_ * nv[0] + bu * nv[1] + bv * nv[2],
                                    n_a)
                            outs.append(jnp.where(improved, n_a, bna))
                        return tuple(outs)

                    bn0, bn1, bn2 = jax.lax.cond(
                        jnp.any(improved), interp_fn, lambda b: b,
                        (bn0, bn1, bn2))
                acc = acc + jnp.where(improved, 1.0, 0.0)
            node = (node * 13 + 7) & 127
            return node, bt, bn0, bn1, bn2, acc

        def body(i, carrys):
            return tuple(drain(g, carrys[g]) for g in range(GROUP))

        z = jnp.zeros((8, 128), jnp.float32)
        init = tuple(
            (n0_ref[g], jnp.full((8, 128), 1e4, jnp.float32), z, z, z, z)
            for g in range(GROUP)
        )
        final = jax.lax.fori_loop(0, ITERS // 8, body, init)
        for g in range(GROUP):
            node, bt, bn0, bn1, bn2, acc = final[g]
            out_ref[g] = bt + acc + bn0 + node.astype(jnp.float32)

    dr_c = build(drain_kernel, 6, compact=True, interp=False)
    dr_ci = build(drain_kernel, 6, compact=True, interp=True)
    dr_r = build(drain_kernel, 6, compact=False, interp=False)

    # ---- 5. per-site overhead: cond + inner while per site ----
    INNER = int(os.environ.get("PROBE_INNER", "17"))
    SITES = max(1, ITERS // INNER)

    def site_kernel(tid_ref, fref, iref, o_ref, d_ref, n0_ref, out_ref,
                    *, use_cond: bool):
        tid = tid_ref[0]
        read = read_row_c

        def inner_walk(carry):
            def cond(c):
                i, node, bt = c
                return i < INNER

            def body(c):
                i, node, bt = c
                outs = []
                for g in range(GROUP):
                    nd = node[g]
                    ov = [o_ref[c2, g] for c2 in range(3)]
                    dv = [d_ref[c2, g] for c2 in range(3)]
                    inv = [jnp.where(x != 0.0, 1.0 / x,
                                     jnp.where(x >= 0, jnp.inf,
                                               -jnp.inf))
                           for x in dv]
                    box = slab_gather(read, fref, tid, nd, ov, inv,
                                      bt[g])
                    nxt = jnp.where(box, look(read(iref, tid, 0), nd),
                                    look(read(iref, tid, 1), nd))
                    restart = (nd * 13 + jnp.int32(7)) & 31
                    outs.append(jnp.where(nxt >= N_NODE - 1, restart,
                                          nxt))
                return (i + 1, tuple(outs),
                        tuple(b - 1e-7 for b in bt))

            _, node, bt = jax.lax.while_loop(
                cond, body, (jnp.int32(0),) + carry)
            return node, bt

        def site_body(s, carry):
            node, bt = carry
            if use_cond:
                enter = (s & 1) == 0   # half the sites enter
                node, bt = jax.lax.cond(enter, inner_walk,
                                        lambda c: c, (node, bt))
            else:
                node, bt = inner_walk((node, bt))
            return node, bt

        init = (tuple(n0_ref[g] for g in range(GROUP)),
                tuple(jnp.full((8, 128), 1e4, jnp.float32)
                      for _ in range(GROUP)))
        node, bt = jax.lax.fori_loop(0, SITES, site_body, init)
        for g in range(GROUP):
            out_ref[g] = bt[g] + node[g].astype(jnp.float32)

    site_all = build(site_kernel, 6, use_cond=False)
    site_cond = build(site_kernel, 6, use_cond=True)

    fcj = jnp.asarray(f32c)
    icj = jnp.asarray(i32c)
    frj = jnp.asarray(f32r)
    irj = jnp.asarray(i32r)
    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    nj = jnp.asarray(node0)
    tj = jnp.asarray(tid0)

    def timeit(f, *args, iters=50):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    res = {}
    for name, f, args, per in (
        ("interior_compact", int_c, (tj, fcj, icj, oj, dj, nj), ITERS),
        ("interior_repl", int_r, (tj, frj, irj, oj, dj, nj), ITERS),
        ("drain_compact", dr_c, (tj, fcj, icj, oj, dj, nj), ITERS // 8),
        ("drain_compact_interp", dr_ci, (tj, fcj, icj, oj, dj, nj),
         ITERS // 8),
        ("drain_repl", dr_r, (tj, frj, irj, oj, dj, nj), ITERS // 8),
        ("site_flat", site_all, (tj, fcj, icj, oj, dj, nj),
         SITES * INNER),
        ("site_cond_half", site_cond, (tj, fcj, icj, oj, dj, nj),
         SITES),
    ):
        t = timeit(f, *args)
        res[name + "_ns"] = round(t / per * 1e9, 1)
    res["note"] = ("interior/drain: ns per loop iteration (GROUP slices "
                   "each); site_flat: ns per inner iteration; "
                   "site_cond_half: ns per SITE (half enter INNER-iter "
                   f"walks, INNER={INNER})")
    print(json.dumps({"mech": res, "group": GROUP, "iters": ITERS}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
