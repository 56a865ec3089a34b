"""Vectorized NumPy reference tracer (the scalable test oracle).

Semantically identical to the scalar ``tests/oracle.py`` (the authoritative
transcription of ``src/shader.rgen:61-186`` + ``src/shader.rchit:50-96``)
but batched over pixels with NumPy, so golden images at 128²-256² are
tractable (the scalar oracle is O(pixels·samples·bounces·tris) pure Python
and caps out around 64²). Float64 throughout like the scalar oracle (the
jitter hash stays float32 — precision class is part of the semantics);
closest-hit tie-breaking matches the scalar oracle's first-wins iteration
order (instances then triangles, via stable argmin on the flattened order).

Independence note: this file deliberately shares no code with raytpu's
JAX implementation — it is a second implementation used to cross-check the
first (SURVEY.md §4), only vectorized unlike ``tests/oracle.py``.
"""

from __future__ import annotations

import numpy as np

from tests.oracle import EPS, IAMB, IOR, KA, KD, KS, TMAX, TMIN


def hash_random_vec(px, py, seed):
    """float32 jitter hash (matches tests/oracle.hash_random, batched)."""
    f = np.float32
    x = (
        px.astype(f) * f(12.9898)
        + py.astype(f) * f(78.233)
        + f(1113.1) * f(seed)
    )
    s = np.sin(x, dtype=np.float32)
    y = s * f(43758.5453)
    return (y - np.floor(y)).astype(np.float64)


def _mt_grid(oo, dd, va, e1, e2, tmin, tmax_col):
    """Möller–Trumbore of rays (N,3) against triangles (T,3), componentwise
    so intermediates stay (N, T) scalars. ``tmax_col``: (N, 1) upper bound.
    Returns (t (N,T) with inf on miss)."""
    d0, d1, d2 = dd[:, 0:1], dd[:, 1:2], dd[:, 2:3]         # (N,1)
    o0, o1, o2 = oo[:, 0:1], oo[:, 1:2], oo[:, 2:3]
    e1x, e1y, e1z = e1[None, :, 0], e1[None, :, 1], e1[None, :, 2]  # (1,T)
    e2x, e2y, e2z = e2[None, :, 0], e2[None, :, 1], e2[None, :, 2]
    ax, ay, az = va[None, :, 0], va[None, :, 1], va[None, :, 2]
    px = d1 * e2z - d2 * e2y
    py = d2 * e2x - d0 * e2z
    pz = d0 * e2y - d1 * e2x
    det = e1x * px + e1y * py + e1z * pz
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
    tx, ty, tz = o0 - ax, o1 - ay, o2 - az
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (d0 * qx + d1 * qy + d2 * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = (
        (np.abs(det) >= 1e-9)
        & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (t > tmin) & (t < tmax_col)
    )
    return np.where(ok, t, np.inf)


class VecScene:
    """Same instance-dict scene as tests/oracle.OracleScene, vectorized."""

    def __init__(self, instances, light_pos, light_intensity, skybox_fn):
        self.instances = instances
        self.light_pos = np.asarray(light_pos, float)
        self.light_intensity = light_intensity
        self.skybox_fn = skybox_fn  # fn(directions (N,3)) -> (N,3)
        # per-instance triangle corner/normal/edge tables, flat ids in
        # (instance, tri) order so argmin tie-breaking is first-wins like
        # the scalar oracle's loops
        self.blocks = []
        base = 0
        mats, insts = [], []
        for idx, inst in enumerate(instances):
            verts = np.asarray(inst["verts"], float)
            norms = np.asarray(inst["normals"], float)
            tris = np.asarray(inst["tris"], int)
            va = verts[tris[:, 0]]
            vb = verts[tris[:, 1]]
            vc = verts[tris[:, 2]]
            w2o = np.asarray(inst["w2o"], float)
            self.blocks.append({
                "va": va, "e1": vb - va, "e2": vc - va,
                "na": norms[tris[:, 0]], "nb": norms[tris[:, 1]],
                "nc": norms[tris[:, 2]],
                "lin": w2o[:3, :3], "trn": w2o[:3, 3],
                "base": base, "count": len(tris), "inst": idx,
            })
            mats.append(np.full(len(tris), inst["material"]))
            insts.append(np.full(len(tris), idx))
            base += len(tris)
        self.mat_of = np.concatenate(mats)
        self.inst_of = np.concatenate(insts)

    def closest(self, o, d, active, tmax=TMAX):
        """Batched closest hit → (t, flat_tri_idx); idx −1 / t = tmax on
        miss."""
        n = o.shape[0]
        t_best = np.full(n, np.inf)
        idx_best = np.full(n, -1, int)
        if active.any():
            for b in self.blocks:
                oo = o @ b["lin"].T + b["trn"]
                dd = d @ b["lin"].T
                t = _mt_grid(oo, dd, b["va"], b["e1"], b["e2"], TMIN,
                             np.where(active, tmax, TMIN)[:, None])
                t = np.where(t < t_best[:, None], t, np.inf)
                k = np.argmin(t, axis=1)             # first-wins on ties
                tb = t[np.arange(n), k]
                better = tb < t_best
                t_best = np.where(better, tb, t_best)
                idx_best = np.where(better, b["base"] + k, idx_best)
        return np.where(idx_best >= 0, t_best, tmax), idx_best

    def occluded(self, o, d, tmax, active):
        occ = np.zeros(o.shape[0], bool)
        if active.any():
            for b in self.blocks:
                oo = o @ b["lin"].T + b["trn"]
                dd = d @ b["lin"].T
                t = _mt_grid(oo, dd, b["va"], b["e1"], b["e2"], TMIN,
                             np.where(active & ~occ, tmax, TMIN)[:, None])
                occ |= np.isfinite(t).any(axis=1)
        return occ

    def hit_normal(self, tri_idx, o, d):
        """World-space interpolated shading normal per ray for flat ids
        (recomputes u, v for the chosen triangle only — (N,) work)."""
        n = tri_idx.shape[0]
        k = np.maximum(tri_idx, 0)
        out = np.zeros((n, 3))
        for b in self.blocks:
            mine = (k >= b["base"]) & (k < b["base"] + b["count"])
            if not mine.any():
                continue
            kk = k[mine] - b["base"]
            oo = o[mine] @ b["lin"].T + b["trn"]
            dd = d[mine] @ b["lin"].T
            va, e1, e2 = b["va"][kk], b["e1"][kk], b["e2"][kk]
            pvec = np.cross(dd, e2)
            det = np.einsum("nk,nk->n", e1, pvec)
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = np.where(np.abs(det) > 0, 1.0 / det, 0.0)
            tvec = oo - va
            u = np.einsum("nk,nk->n", tvec, pvec) * inv
            qvec = np.cross(tvec, e1)
            v = np.einsum("nk,nk->n", dd, qvec) * inv
            nrm = (
                (1 - u - v)[:, None] * b["na"][kk]
                + u[:, None] * b["nb"][kk]
                + v[:, None] * b["nc"][kk]
            )
            nw = nrm @ b["lin"]       # row-vector · W2O linear (:94)
            out[mine] = nw / np.maximum(
                np.linalg.norm(nw, axis=1, keepdims=True), 1e-30
            )
        return out


def render(scene, camera, width, height, spp, max_bounces,
           ray_batch=4096):
    """Batched render with the exact shader semantics of
    tests/oracle.render (jitter hash, focal 2.5, y-flip, 0.9**sample decay,
    ±0.01 offsets, backface break, Snell/TIR). ``scene``: a VecScene."""
    pos, right, up, forward = (np.asarray(v, float) for v in camera)
    ys, xs = np.mgrid[0:height, 0:width]
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    total = np.zeros((xs.size, 3))
    for i in range(spp):
        jx = hash_random_vec(xs, ys, spp + i)
        jy = hash_random_vec(xs, ys, spp + i + 0.5)
        u = (xs + jx) / width * 2 - 1
        v = -((ys + jy) / height * 2 - 1)
        d = u[:, None] * right + v[:, None] * up + 2.5 * forward
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(pos, d.shape).copy()
        for s in range(0, xs.size, ray_batch):
            sl = slice(s, min(s + ray_batch, xs.size))
            total[sl] += _trace_batch(scene, o[sl], d[sl], i, max_bounces)
    return (total / spp).reshape(height, width, 3)


def _trace_batch(scene, o, d, sample_idx, max_bounces):
    n = o.shape[0]
    tmp = np.broadcast_to(IAMB * KA, (n, 3)).copy()
    active = np.ones(n, bool)
    o = o.copy()
    d = d.copy()
    for _ in range(max_bounces + 1):
        if not active.any():
            break
        t, tri = scene.closest(o, d, active)
        hit = active & (tri >= 0)
        miss = active & (tri < 0)
        if miss.any():
            dm = d[miss]
            tmp[miss] = scene.skybox_fn(
                np.stack([dm[:, 0], dm[:, 1], -dm[:, 2]], axis=1)
            )
        active = hit.copy()
        if not hit.any():
            break
        nrm = scene.hit_normal(tri, o, d)
        p = o + t[:, None] * d
        mat = np.where(tri >= 0, scene.mat_of[np.maximum(tri, 0)], -1)
        ndoti = np.einsum("nk,nk->n", d, nrm)

        # diffuse: backface break; shadow ray + Blinn-Phong; terminate
        diff = hit & (mat == 0)
        if diff.any():
            lit = diff & (ndoti < 0)
            so = p + EPS * nrm
            tl = scene.light_pos - p
            dist = np.linalg.norm(tl, axis=1)
            l = tl / np.maximum(dist[:, None], 1e-30)
            occ = scene.occluded(so, l, dist, lit)
            shade = lit & ~occ
            if shade.any():
                view = -d
                h = l + view
                h = h / np.maximum(
                    np.linalg.norm(h, axis=1, keepdims=True), 1e-30
                )
                ndotl = np.maximum(0.0, np.einsum("nk,nk->n", nrm, l))
                ndoth = np.maximum(0.0, np.einsum("nk,nk->n", nrm, h))
                c = scene.light_intensity * (
                    KD[None] * ndotl[:, None]
                    + KS[None] * ndoth[:, None] ** 100
                )
                tmp = np.where(
                    shade[:, None], tmp + (0.9 ** sample_idx) * c, tmp
                )
            active = active & ~diff

        # mirror
        mir = hit & (mat == 1)
        if mir.any():
            dr = d - 2 * ndoti[:, None] * nrm
            o = np.where(mir[:, None], p + EPS * nrm, o)
            d = np.where(mir[:, None], dr, d)

        # refractive: Snell + TIR (src/shader.rgen:139-177)
        ref = hit & (mat == 2)
        if ref.any():
            outwards = ndoti > 0
            nn = np.where(outwards[:, None], -nrm, nrm)
            nd = np.where(outwards, -ndoti, ndoti)
            ratio = np.where(outwards, IOR, 1.0 / IOR)
            k = 1 - ratio * ratio * (1 - nd * nd)
            tir = k < 0
            ddot = np.einsum("nk,nk->n", d, nn)
            d_tir = d - 2 * ddot[:, None] * nn
            r = ratio[:, None] * d - (
                ratio * nd + np.sqrt(np.maximum(k, 0.0))
            )[:, None] * nn
            r = r / np.maximum(
                np.linalg.norm(r, axis=1, keepdims=True), 1e-30
            )
            d_new = np.where(tir[:, None], d_tir, r)
            o_new = np.where(tir[:, None], p + EPS * nn, p - EPS * nn)
            o = np.where(ref[:, None], o_new, o)
            d = np.where(ref[:, None], d_new, d)
    return tmp
