#!/usr/bin/env python
"""Round-4 frontier probe: MXU-evaluated Möller–Trumbore leaf tests.

The consensus walk is ALU-bound and leaf-heavy: a 4-triangle leaf visit
costs ~560 VPU issues (~600 ns) on a (4,8,128) group. The MT numerators
are BILINEAR in the ray, so with a per-walk 16-feature vector
X = [o⊗d(9), o(3), d(3), 1] every triangle's four outputs
(det, u_num, v_num, t_num) are one row of a constant matrix K (16×16 per
4-tri leaf):

    p = d × e2;      det   = e1 · p            (linear in d)
    u_num = (o − v0) · p                       (bilinear in o, d)
    q = (o − v0) × e1;  v_num = d · q          (bilinear)
    t_num = e2 · q                             (linear in o)

so a leaf evaluation becomes K(16,16) @ X(16,L) on the MXU plus a short
VPU epilogue (divide by det, window compares). This probe measures, on
real hardware and synthetic-but-realistic data:

1. throughput: ns per 4-tri leaf for the VPU reference loop vs the MXU
   formulation, over many leaves per kernel invocation;
2. precision: hit-flip rate and max |Δt| of the MXU path (f32 operands →
   Mosaic lowers through the MXU's bf16x3 passes) vs the exact VPU f32
   chain — the data for a relaxed-precision traversal tier contract.

Run: python tools/r4_mxu_mt_probe.py   (TPU; falls back to interpret off-TPU)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 4096          # one (4, 8, 128) walk group
LEAVES = int(os.environ.get("PROBE_LEAVES", "512"))  # leaf visits per call
TRIS_PER_LEAF = 4     # LEAF_UNROLL
OUTS = 4              # det, u_num, v_num, t_num per triangle


def make_inputs(seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    o = rng.randn(3, LANES).astype(np.float32)
    d = rng.randn(3, LANES).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    t = LEAVES * TRIS_PER_LEAF
    v0 = rng.randn(t, 3).astype(np.float32)
    e1 = (rng.randn(t, 3) * 0.5).astype(np.float32)
    e2 = (rng.randn(t, 3) * 0.5).astype(np.float32)
    return o, d, v0, e1, e2


def leaf_constants(v0, e1, e2):
    """K (T, 4 outs, 16 feats) over the feature basis
    [o_i·d_k (9, o-major), o (3), d (3), 1], matching the kernel's exact
    formulation (ops/mega.py `_mt_tab`):

        p = d × e2;  det = e1·p;  u_num = (o−v0)·p
        q = (o−v0) × e1;  v_num = d·q;  t_num = e2·q
    """
    import numpy as np

    t = v0.shape[0]
    k = np.zeros((t, OUTS, 16), np.float64)
    eps = np.zeros((3, 3, 3))
    for i, j, kk, s in ((0, 1, 2, 1), (1, 2, 0, 1), (2, 0, 1, 1),
                        (0, 2, 1, -1), (1, 0, 2, -1), (2, 1, 0, -1)):
        eps[i, j, kk] = s
    # det = e1 · (d × e2) = Σ_j d_j (Σ_ik ε_ijk e1_i e2_k)
    k[:, 0, 12:15] = np.einsum("ijk,ti,tk->tj", eps, e1, e2)
    # u_num = Σ_i (o_i − v0_i) ε_ijk d_j e2_k → coef[o_i d_j] = Σ_k ε_ijk e2_k
    cu = np.einsum("ijk,tk->tij", eps, e2)          # (t, i, j=d)
    k[:, 1, 0:9] = cu.reshape(t, 9)
    k[:, 1, 12:15] = -np.einsum("ti,tij->tj", v0, cu)
    # v_num = Σ_k d_k ε_kij (o_i − v0_i) e1_j → coef[o_i d_k] = Σ_j ε_kij e1_j
    cv = np.einsum("kij,tj->tik", eps, e1)          # (t, i, k=d)
    k[:, 2, 0:9] = cv.reshape(t, 9)
    k[:, 2, 12:15] = -np.einsum("ti,tik->tk", v0, cv)
    # t_num = Σ_k e2_k ε_kij (o_i − v0_i) e1_j → coef[o_i] = Σ_kj ε_kij e2_k e1_j
    ct = np.einsum("kij,tk,tj->ti", eps, e2, e1)    # (t, i=o)
    k[:, 3, 9:12] = ct
    k[:, 3, 15] = -np.einsum("ti,ti->t", v0, ct)
    return k.astype(np.float32)


def features(o, d):
    import numpy as np

    x = np.empty((16, LANES), np.float32)
    idx = 0
    for i in range(3):
        for kk in range(3):
            x[idx] = o[i] * d[kk]
            idx += 1
    x[9:12] = o
    x[12:15] = d
    x[15] = 1.0
    return x


def exact_outputs(o, d, v0, e1, e2):
    """f64 ground truth + exact-f32 VPU-chain outputs (the current kernel
    math, vectorized) for precision comparison."""
    import numpy as np

    def mt(o64, d64, v064, e164, e264):
        p = np.cross(d64.T[:, None, :], e264[None, :, :])   # (L, T, 3)
        det = np.einsum("tj,ltj->lt", e164, p)
        tv = o64.T[:, None, :] - v064[None, :, :]
        u = np.einsum("ltj,ltj->lt", tv, p)
        q = np.cross(tv, e164[None, :, :])
        v = np.einsum("ltj,jl->lt", q, d64)
        t = np.einsum("ltj,tj->lt", q, e264)
        return det, u, v, t

    det64, u64, v64, t64 = mt(o.astype(np.float64), d.astype(np.float64),
                              v0.astype(np.float64), e1.astype(np.float64),
                              e2.astype(np.float64))
    det32, u32, v32, t32 = mt(o, d, v0, e1, e2)
    return (det64, u64, v64, t64), (det32, u32, v32, t32)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.devices()[0].platform, flush=True)

    o, d, v0, e1, e2 = make_inputs()
    kmat = leaf_constants(v0, e1, e2).reshape(LEAVES, TRIS_PER_LEAF * OUTS,
                                              16)
    x = features(o, d)

    # ---- VPU reference kernel: the current leaf math over a flat table --
    tabf = np.zeros((9 * LEAVES * TRIS_PER_LEAF,), np.float32)
    t_total = LEAVES * TRIS_PER_LEAF
    for pidx, arr in enumerate((v0, e1, e2)):
        for a in range(3):
            off = (pidx * 3 + a) * t_total
            tabf[off:off + t_total] = arr[:, a]

    def vpu_kernel(o_ref, d_ref, tab_ref, out_ref):
        ov = [o_ref[c] for c in range(3)]
        dv = [d_ref[c] for c in range(3)]
        acc = jnp.zeros_like(ov[0])

        def leaf(li, acc):
            for kk in range(TRIS_PER_LEAF):
                s = li * TRIS_PER_LEAF + kk
                v0_ = [tab_ref[a * t_total + s] for a in range(3)]
                e1_ = [tab_ref[(3 + a) * t_total + s] for a in range(3)]
                e2_ = [tab_ref[(6 + a) * t_total + s] for a in range(3)]
                px = dv[1] * e2_[2] - dv[2] * e2_[1]
                py = dv[2] * e2_[0] - dv[0] * e2_[2]
                pz = dv[0] * e2_[1] - dv[1] * e2_[0]
                det = e1_[0] * px + e1_[1] * py + e1_[2] * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                tvx, tvy, tvz = ov[0] - v0_[0], ov[1] - v0_[1], ov[2] - v0_[2]
                u = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1_[2] - tvz * e1_[1]
                qy = tvz * e1_[0] - tvx * e1_[2]
                qz = tvx * e1_[1] - tvy * e1_[0]
                v = (dv[0] * qx + dv[1] * qy + dv[2] * qz) * inv_det
                t = (e2_[0] * qx + e2_[1] * qy + e2_[2] * qz) * inv_det
                hit = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > 1e-3) & (t < 1e4))
                acc = acc + jnp.where(hit, t, 0.0)
            return acc

        acc = jax.lax.fori_loop(0, LEAVES, leaf, acc)
        out_ref[...] = acc

    vpu = pl.pallas_call(
        vpu_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
        interpret=interpret,
    )

    # ---- MXU kernel: K(16,16) @ X(16,4096) per leaf + VPU epilogue ----
    def mxu_kernel(x_ref, k_ref, out_ref):
        acc = jnp.zeros((1, LANES), jnp.float32)
        xm = x_ref[...]                       # (16, LANES)

        def leaf(li, acc):
            kk = k_ref[li]                    # (16, 16)
            outs = jax.lax.dot_general(
                kk, xm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                  # (16, LANES)
            for tri in range(TRIS_PER_LEAF):
                det = outs[OUTS * tri + 0:OUTS * tri + 1]
                un = outs[OUTS * tri + 1:OUTS * tri + 2]
                vn = outs[OUTS * tri + 2:OUTS * tri + 3]
                tn = outs[OUTS * tri + 3:OUTS * tri + 4]
                inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                u = un * inv_det
                v = vn * inv_det
                t = tn * inv_det
                hit = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > 1e-3) & (t < 1e4))
                acc = acc + jnp.where(hit, t, 0.0)
            return acc

        acc = jax.lax.fori_loop(0, LEAVES, leaf, acc)
        out_ref[...] = acc

    mxu = pl.pallas_call(
        mxu_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        interpret=interpret,
    )

    # ---- MXU v2: LB leaves per dot, output rows grouped by TYPE so the
    # epilogue runs on fully-utilized (4·LB, LANES) slabs ----
    LB = 8          # leaves per dot → K2 (16·LB, 16), outs (16·LB, LANES)
    NT = TRIS_PER_LEAF * LB

    def mxu2_kernel(x_ref, k_ref, out_ref):
        acc = jnp.zeros((1, LANES), jnp.float32)
        xm = x_ref[...]

        def block(bi, acc):
            kk = k_ref[bi]                     # (4*NT rows typed, 16)
            outs = jax.lax.dot_general(
                kk, xm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                   # (4*NT, LANES)
            det = outs[0:NT]
            un = outs[NT:2 * NT]
            vn = outs[2 * NT:3 * NT]
            tn = outs[3 * NT:4 * NT]
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
            u = un * inv_det
            v = vn * inv_det
            t = tn * inv_det
            hit = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (t > 1e-3) & (t < 1e4))
            return acc + jnp.sum(jnp.where(hit, t, 0.0), axis=0,
                                 keepdims=True)

        acc = jax.lax.fori_loop(0, LEAVES // LB, block, acc)
        out_ref[...] = acc

    mxu2 = pl.pallas_call(
        mxu2_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        interpret=interpret,
    )
    # K2: per LB-leaf block, rows [det×NT, u×NT, v×NT, t×NT]
    kraw = kmat.reshape(LEAVES * TRIS_PER_LEAF, OUTS, 16)
    k2 = (kraw.reshape(LEAVES // LB, NT, OUTS, 16)
          .transpose(0, 2, 1, 3)
          .reshape(LEAVES // LB, OUTS * NT, 16))

    o_r = jnp.asarray(o.reshape(3, 4, 8, 128))
    d_r = jnp.asarray(d.reshape(3, 4, 8, 128))
    tab = jnp.asarray(tabf)
    xj = jnp.asarray(x)
    kj = jnp.asarray(kmat)

    fv = jax.jit(lambda a, b, c: vpu(a, b, c))
    fm = jax.jit(lambda a, b: mxu(a, b))
    fm2 = jax.jit(lambda a, b: mxu2(a, b))
    k2j = jnp.asarray(k2)

    def timeit(f, *args, iters=30):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    out_v = np.asarray(fv(o_r, d_r, tab)).reshape(-1)
    out_m = np.asarray(fm(xj, kj)).reshape(-1)
    out_m2 = np.asarray(fm2(xj, k2j)).reshape(-1)
    tv = timeit(fv, o_r, d_r, tab)
    tm = timeit(fm, xj, kj)
    tm2 = timeit(fm2, xj, k2j)
    res = {
        "vpu_ns_per_leaf": round(tv / LEAVES * 1e9, 1),
        "mxu_ns_per_leaf": round(tm / LEAVES * 1e9, 1),
        "mxu_typed_ns_per_leaf": round(tm2 / LEAVES * 1e9, 1),
        "speedup": round(tv / tm, 2),
        "speedup_typed": round(tv / tm2, 2),
        "mxu_vs_mxu2_acc_max_abs": float(np.abs(out_m - out_m2).max()),
    }
    print(json.dumps({"throughput": res}), flush=True)

    # ---- precision: MXU outputs vs exact f32 chain vs f64 truth ----
    (det64, u64, v64, t64), (det32, u32, v32, t32) = exact_outputs(
        o, d, v0, e1, e2)

    def hits(det, u, v, t):
        import numpy as np

        with np.errstate(divide="ignore", invalid="ignore"):
            uu, vv, tt = u / det, v / det, t / det
        return ((np.abs(det) > 1e-9) & (uu >= 0) & (vv >= 0)
                & (uu + vv <= 1) & (tt > 1e-3) & (tt < 1e4)), tt

    # recompute MXU raw outputs head-on for the comparison
    outs = np.einsum("tof,fl->lto", kmat.reshape(-1, OUTS, 16)
                     .astype(np.float32), x)          # numpy f32 matmul
    h64, tt64 = hits(det64, u64, v64, t64)
    h32, tt32 = hits(det32, u32, v32, t32)
    hmx_np, ttmx = hits(outs[..., 0], outs[..., 1], outs[..., 2],
                        outs[..., 3])
    # and the on-device MXU (bf16x3) flip rate via the kernel accumulators:
    # out_v / out_m sum hit-t per lane — compare aggregate drift
    agg = {
        "vpu_vs_mxu_acc_max_abs": float(np.abs(out_v - out_m).max()),
        "vpu_vs_mxu_acc_rel": float(
            np.abs(out_v - out_m).max() / max(np.abs(out_v).max(), 1e-9)),
    }
    prec = {
        "f32_chain_hit_flips_vs_f64": int((h32 != h64).sum()),
        "bilinear_form_hit_flips_vs_f64": int((hmx_np != h64).sum()),
        "total_tests": int(h64.size),
        "t_rel_err_f32_chain": float(np.nanmax(
            np.abs((tt32 - tt64) / np.where(h64, tt64, np.nan)))),
        "t_rel_err_bilinear_form": float(np.nanmax(
            np.abs((ttmx - tt64) / np.where(h64, tt64, np.nan)))),
    }
    print(json.dumps({"precision": prec, "device_agg": agg}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
