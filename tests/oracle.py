"""Independent NumPy reference tracer (the test oracle).

A deliberately scalar, per-pixel, loop-based implementation of the reference
semantics (``src/shader.rgen:61-186`` + ``src/shader.rchit:50-96``), written
WITHOUT any raytpu vectorized code so the two implementations can cross-check
each other (SURVEY.md §4). Keep resolutions tiny (≤64×64) — this is O(pixels ×
samples × bounces × triangles) pure Python.
"""

from __future__ import annotations

import math

import numpy as np

IOR = 1.52
IAMB = np.array([0.8, 0.8, 0.8])
KD = np.array([0.2, 1.0, 0.2])
KA = np.array([0.1, 0.3, 0.1])
KS = np.array([0.8, 0.8, 0.8])
EPS = 0.01
TMIN = 1e-3
TMAX = 1e4


def hash_random(px, py, seed):
    # computed in float32 like the GPU shader (and the JAX path); the
    # fract(sin·43758) construction amplifies ulp differences, so precision
    # class must match for cross-checks
    f = np.float32
    x = f(px) * f(12.9898) + f(py) * f(78.233) + f(1113.1) * f(seed)
    s = np.sin(x, dtype=np.float32)
    y = s * f(43758.5453)
    return float(y - np.floor(y))


def intersect_tri(o, d, a, b, c, tmin, tmax):
    e1, e2 = b - a, c - a
    pvec = np.cross(d, e2)
    det = e1 @ pvec
    if abs(det) < 1e-9:
        return None
    inv = 1.0 / det
    tvec = o - a
    u = (tvec @ pvec) * inv
    if u < 0 or u > 1:
        return None
    qvec = np.cross(tvec, e1)
    v = (d @ qvec) * inv
    if v < 0 or u + v > 1:
        return None
    t = (e2 @ qvec) * inv
    if t <= tmin or t >= tmax:
        return None
    return t, u, v


class OracleScene:
    """instances: list of dicts with keys
    'verts' (V,3), 'normals' (V,3), 'tris' (T,3), 'material' int,
    'o2w' 4x4, 'w2o' 4x4."""

    def __init__(self, instances, light_pos, light_intensity, skybox_fn):
        self.instances = instances
        self.light_pos = np.asarray(light_pos, float)
        self.light_intensity = light_intensity
        self.skybox_fn = skybox_fn  # fn(direction)->rgb

    def closest(self, o, d, tmin=TMIN, tmax=TMAX):
        best = None
        for idx, inst in enumerate(self.instances):
            w2o = inst["w2o"]
            oo = w2o[:3, :3] @ o + w2o[:3, 3]
            dd = w2o[:3, :3] @ d
            for ti, tri in enumerate(inst["tris"]):
                a, b, c = (inst["verts"][k] for k in tri)
                r = intersect_tri(oo, dd, a, b, c, tmin, best[0] if best else tmax)
                if r is not None:
                    t, u, v = r
                    best = (t, idx, ti, u, v)
        return best

    def occluded(self, o, d, tmax):
        for inst in self.instances:
            w2o = inst["w2o"]
            oo = w2o[:3, :3] @ o + w2o[:3, 3]
            dd = w2o[:3, :3] @ d
            for tri in inst["tris"]:
                a, b, c = (inst["verts"][k] for k in tri)
                if intersect_tri(oo, dd, a, b, c, TMIN, tmax) is not None:
                    return True
        return False

    def hit_normal(self, idx, ti, u, v):
        inst = self.instances[idx]
        tri = inst["tris"][ti]
        n = (
            (1 - u - v) * inst["normals"][tri[0]]
            + u * inst["normals"][tri[1]]
            + v * inst["normals"][tri[2]]
        )
        # inverse-transpose: n_world = n_obj @ W2O_linear (src/shader.rchit:94)
        nw = n @ inst["w2o"][:3, :3]
        return nw / max(np.linalg.norm(nw), 1e-30)


def render(scene, camera, width, height, spp, max_bounces):
    """camera: (position, right, up, forward) tuples/arrays."""
    pos, right, up, forward = (np.asarray(v, float) for v in camera)
    img = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            color = np.zeros(3)
            for i in range(spp):
                jx = hash_random(x, y, spp + i)
                jy = hash_random(x, y, spp + i + 0.5)
                u = (x + jx) / width * 2 - 1
                v = -((y + jy) / height * 2 - 1)
                d = u * right + v * up + 2.5 * forward
                d = d / np.linalg.norm(d)
                o = pos.copy()
                tmp = IAMB * KA
                for j in range(max_bounces + 1):
                    hit = scene.closest(o, d)
                    if hit is None:
                        dd = d.copy()
                        tmp = scene.skybox_fn(np.array([dd[0], dd[1], -dd[2]]))
                        break
                    t, idx, ti, hu, hv = hit
                    mat = scene.instances[idx]["material"]
                    p = o + t * d
                    n = scene.hit_normal(idx, ti, hu, hv)
                    if mat == 0:
                        if d @ n >= 0:
                            break
                        so = p + EPS * n
                        tl = scene.light_pos - p
                        dist = np.linalg.norm(tl)
                        l = tl / dist
                        if not scene.occluded(so, l, dist):
                            view = -d
                            h = l + view
                            h = h / np.linalg.norm(h)
                            ndotl = max(0.0, n @ l)
                            ndoth = max(0.0, n @ h)
                            c = scene.light_intensity * (
                                KD * ndotl + KS * ndoth**100
                            )
                            tmp = tmp + (0.9**i) * c
                        break
                    elif mat == 1:
                        o = p + EPS * n
                        d = d - 2 * (d @ n) * n
                    else:  # refractive
                        ndoti = d @ n
                        outwards = ndoti > 0
                        nn = -n if outwards else n
                        nd = -ndoti if outwards else ndoti
                        ratio = IOR if outwards else 1.0 / IOR
                        k = 1 - ratio * ratio * (1 - nd * nd)
                        if k < 0:
                            d = d - 2 * (d @ nn) * nn
                            o = p + EPS * nn
                        else:
                            r = ratio * d - (ratio * nd + math.sqrt(k)) * nn
                            d = r / np.linalg.norm(r)
                            o = p - EPS * nn
                color += tmp
            img[y, x] = color / spp
    return img
