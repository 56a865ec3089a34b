"""Pallas traversal kernel correctness (interpret mode on CPU).

The kernel's numerical semantics are validated against the brute-force
oracle here; its TPU performance is validated by the benchmark harness on
hardware. Interpret mode runs the identical kernel logic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytpu.accel.bvh import build_bvh
from raytpu.device_scene import DeviceScene, SceneStatic
from raytpu.ops.intersect import brute_anyhit, brute_closest
from raytpu.ops.traverse_pallas import (
    PACKET_K,
    fits_smem,
    pallas_anyhit,
    pallas_closest,
    slot_to_prim,
    smem_bytes,
)


def _setup(rng, t=300):
    v = rng.uniform(-1, 1, (t, 3, 3)).astype(np.float32)
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    order = bvh.tri_order.astype(np.int64)
    zeros3 = jnp.zeros((t, 3), jnp.float32)
    # per-corner normals = the face normal (checkable post-hit)
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-30)
    n_soa = np.concatenate([fn.T, fn.T, fn.T], axis=0).astype(np.float32)
    dev = DeviceScene(
        tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        tri_n0=zeros3, tri_n1=zeros3, tri_n2=zeros3,
        o2w=jnp.zeros((1, 3, 4)), w2o=jnp.zeros((1, 3, 4)),
        materials=jnp.zeros((1,), jnp.int32),
        light_pos=jnp.zeros(3),
        light_intensity=jnp.asarray(1.0),
        bvh_aabb_min=jnp.asarray(bvh.aabb_min),
        bvh_aabb_max=jnp.asarray(bvh.aabb_max),
        bvh_tri_first=jnp.asarray(bvh.tri_first),
        bvh_tri_count=jnp.asarray(bvh.tri_count),
        bvh_miss=jnp.asarray(bvh.miss),
        bvh_tri_v0=jnp.asarray(v0[order]),
        bvh_tri_e1=jnp.asarray(e1[order]),
        bvh_tri_e2=jnp.asarray(e2[order]),
        bvh_tri_prim=jnp.asarray(order.astype(np.int32)),
        tri_n_soa=jnp.asarray(n_soa),
        bvh_tri_n_soa=jnp.asarray(np.ascontiguousarray(n_soa[:, order])),
    )
    static = SceneStatic(
        mesh_prim_ranges=((0, t),), instance_mesh=(0,),
        mesh_node_ranges=((0, bvh.num_nodes),),
        mesh_bvh_tri_ranges=((0, t),),
        traversal="pallas", mesh_pallas_ok=(True,),
    )
    return dev, static, (v0, e1, e2)


def _packet_rays(rng, p=2):
    o = rng.uniform(-3, 3, (p, PACKET_K, 3)).astype(np.float32)
    d = rng.normal(size=(p, PACKET_K, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # SoA (Vec3) interface + the AoS originals for the brute oracle
    o3 = tuple(jnp.asarray(o[..., c]) for c in range(3))
    d3 = tuple(jnp.asarray(d[..., c]) for c in range(3))
    return o3, d3, jnp.asarray(o), jnp.asarray(d)


def test_pallas_closest_matches_brute():
    rng = np.random.default_rng(42)  # hermetic: shared fixture rng makes
    dev, static, (v0, e1, e2) = _setup(rng)  # failures order-dependent
    o3, d3, o, d = _packet_rays(rng, p=2)
    tmax = jnp.full((2, PACKET_K), 1e4, jnp.float32)

    tt, slot, ut, vt, n_obj = pallas_closest(dev, static, 0, o3, d3, 1e-3, tmax)
    pt = slot_to_prim(dev, static, 0, slot)
    tb, pb, ub, vb = brute_closest(
        o.reshape(-1, 3), d.reshape(-1, 3),
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        1e-3, jnp.full((2 * PACKET_K,), 1e4, jnp.float32),
    )
    pt = np.asarray(pt).reshape(-1)
    pb = np.asarray(pb)
    hit = pb >= 0
    # same hit/miss classification everywhere
    np.testing.assert_array_equal(pt >= 0, hit)
    # same t everywhere; prim may legitimately differ only on exact-t ties
    # (brute picks block-argmin order, traversal picks encounter order)
    # rtol loose enough for FMA-order differences on near-tmin hits
    np.testing.assert_allclose(
        np.asarray(tt).reshape(-1)[hit], np.asarray(tb)[hit],
        rtol=1e-4, atol=1e-6,
    )
    agree = pt[hit] == pb[hit]
    assert agree.mean() > 0.999, f"{(~agree).sum()} non-tie prim mismatches"
    # kernel-interpolated normals must equal the hit triangle's face normal
    # (the test scene's corner normals ARE the face normals); compare only
    # on lanes where both paths picked the same primitive (no ties)
    fn = np.cross(np.asarray(e1), np.asarray(e2))
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-30)
    got_n = np.stack([np.asarray(c).reshape(-1) for c in n_obj], axis=1)
    sel = hit.copy()
    sel[hit] = agree
    np.testing.assert_allclose(got_n[sel], fn[pt[sel]], atol=1e-4)


def test_pallas_anyhit_matches_brute():
    rng = np.random.default_rng(43)
    dev, static, (v0, e1, e2) = _setup(rng)
    o3, d3, o, d = _packet_rays(rng, p=2)
    tmax = jnp.full((2, PACKET_K), 2.0, jnp.float32)

    occ_t = pallas_anyhit(dev, static, 0, o3, d3, 1e-3, tmax)
    occ_b = brute_anyhit(
        o.reshape(-1, 3), d.reshape(-1, 3),
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        1e-3, jnp.full((2 * PACKET_K,), 2.0, jnp.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(occ_t).reshape(-1), np.asarray(occ_b)
    )


def test_pallas_dead_packet_parks():
    rng = np.random.default_rng(44)
    dev, static, _ = _setup(rng, t=50)
    o3, d3, _, _ = _packet_rays(rng, p=2)
    tmax = jnp.zeros((2, PACKET_K), jnp.float32)  # all lanes dead
    t, slot, _, _, _ = pallas_closest(dev, static, 0, o3, d3, 1e-3, tmax)
    assert (np.asarray(slot) == -1).all()


def test_pallas_per_lane_tmax_prunes():
    rng = np.random.default_rng(45)
    dev, static, (v0, e1, e2) = _setup(rng)
    o3, d3, _, _ = _packet_rays(rng, p=1)
    wide = jnp.full((1, PACKET_K), 1e4, jnp.float32)
    t_all, p_all, _, _, _ = pallas_closest(dev, static, 0, o3, d3, 1e-3, wide)
    # window just below each hit t must exclude that hit
    eps_below = jnp.where(
        p_all >= 0, t_all * 0.99, jnp.full_like(t_all, 1e4)
    )
    t2, p2, _, _, _ = pallas_closest(dev, static, 0, o3, d3, 1e-3, eps_below)
    hits = np.asarray(p_all) >= 0
    assert (np.asarray(t2)[hits] >= np.asarray(t_all)[hits] * 0.989).all()


def test_smem_budget_math():
    from raytpu.ops.intersect import LEAF_UNROLL

    assert fits_smem(1400, 2300)          # teapot class
    assert not fits_smem(210_000, 330_000)  # armadillo monolithic
    assert smem_bytes(1000, 1000) == (
        9 * 1000 * 4 + 18 * (1000 + LEAF_UNROLL) * 4
    )
