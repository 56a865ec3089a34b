"""Intersection op tests: Möller–Trumbore + AABB vs analytic/brute cases."""

import numpy as np
import jax.numpy as jnp

from raytpu.ops.intersect import (
    BIG_T,
    brute_anyhit,
    brute_closest,
    moller_trumbore,
    ray_aabb,
    safe_inverse,
)


def _tri(a, b, c):
    a, b, c = (np.asarray(v, np.float32) for v in (a, b, c))
    return a[None], (b - a)[None], (c - a)[None]


def test_hit_center_of_triangle():
    v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, u, v, hit = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.float32(1e4))
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose([u[0], v[0]], [0.25, 0.25], rtol=1e-5)


def test_double_sided():
    # facing-cull disabled (src/main.cpp:538-551): back side must hit too
    v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.25, 0.25, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, u, v, hit = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.float32(1e4))
    assert bool(hit[0])


def test_miss_outside_and_behind():
    v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[2.0, 2.0, 1.0], [0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])  # second points away
    t, u, v, hit = moller_trumbore(
        o, d, jnp.tile(v0, (2, 1)), jnp.tile(e1, (2, 1)), jnp.tile(e2, (2, 1)),
        1e-3, jnp.float32(1e4),
    )
    assert not bool(hit[0]) and not bool(hit[1])
    assert float(t[0]) == float(jnp.float32(BIG_T))


def test_tmin_tmax_window():
    v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    # t would be 1.0 — excluded by tmax=0.5 and by tmin=2.0
    _, _, _, hit1 = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.float32(0.5))
    _, _, _, hit2 = moller_trumbore(o, d, v0, e1, e2, 2.0, jnp.float32(1e4))
    assert not bool(hit1[0]) and not bool(hit2[0])


def test_unnormalized_direction_t_in_ray_units():
    v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.25, 0.25, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -2.0]])  # length 2
    t, _, _, hit = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.float32(1e4))
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)  # o + 1.0·d hits plane


def test_brute_closest_picks_nearest(rng):
    # two parallel triangles; nearest must win regardless of array order
    tris = []
    for z in (5.0, 2.0):
        tris.append(([0, 0, z], [4, 0, z], [0, 4, z]))
    v0 = np.stack([np.asarray(t[0], np.float32) for t in tris])
    e1 = np.stack([np.asarray(t[1], np.float32) - v0[i] for i, t in enumerate(tris)])
    e2 = np.stack([np.asarray(t[2], np.float32) - v0[i] for i, t in enumerate(tris)])
    o = jnp.asarray([[1.0, 1.0, 10.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, prim, u, v = brute_closest(o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), 1e-3, 1e4)
    assert int(prim[0]) == 0  # z=5 plane is closer from z=10
    np.testing.assert_allclose(t[0], 5.0, rtol=1e-6)


def test_brute_closest_vs_numpy_random(rng):
    # 64 random triangles, 128 random rays: compare against a numpy argmin oracle
    T, R = 64, 128
    v = rng.uniform(-1, 1, (T, 3, 3)).astype(np.float32)
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    o = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t, prim, _, _ = brute_closest(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2), 1e-3, 1e4, block=16,
    )
    t, prim = np.asarray(t), np.asarray(prim)

    from tests.oracle import intersect_tri

    for r in range(R):
        best_t, best_i = 1e4, -1
        for i in range(T):
            hit = intersect_tri(
                o[r].astype(float), d[r].astype(float),
                v[i, 0].astype(float), v[i, 1].astype(float), v[i, 2].astype(float),
                1e-3, best_t,
            )
            if hit is not None:
                best_t, best_i = hit[0], i
        assert prim[r] == best_i, f"ray {r}: {prim[r]} vs {best_i}"
        if best_i >= 0:
            np.testing.assert_allclose(t[r], best_t, rtol=1e-4)


def test_brute_anyhit_matches_closest(rng):
    T, R = 32, 64
    v = rng.uniform(-1, 1, (T, 3, 3)).astype(np.float32)
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    o = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, prim, _, _ = brute_closest(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2), 1e-3, 1e4, block=8,
    )
    occ = brute_anyhit(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2), 1e-3, jnp.full((R,), 1e4, jnp.float32), block=8,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(prim) >= 0)


def test_ray_aabb_basic():
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 3.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    inv = safe_inverse(d)
    bmin = jnp.asarray([[-1.0, -1.0, -1.0]] * 2)
    bmax = jnp.asarray([[1.0, 1.0, 1.0]] * 2)
    hit = ray_aabb(o, inv, bmin, bmax, jnp.zeros(2), jnp.full((2,), 1e4))
    assert bool(hit[0]) and not bool(hit[1])


def test_ray_aabb_axis_parallel_inside_slab():
    # ray parallel to x axis, origin inside x-slab: 0·inf NaN hazard
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    inv = safe_inverse(d)
    bmin = jnp.asarray([[-1.0, -1.0, -1.0]])
    bmax = jnp.asarray([[1.0, 1.0, 1.0]])
    hit = ray_aabb(o, inv, bmin, bmax, jnp.zeros(1), jnp.full((1,), 1e4))
    assert not bool(hit[0])  # z=5 is outside the box
    o2 = jnp.asarray([[-5.0, 0.0, 0.0]])
    hit2 = ray_aabb(o2, inv, bmin, bmax, jnp.zeros(1), jnp.full((1,), 1e4))
    assert bool(hit2[0])
