"""BVH builder invariants + traversal equivalence vs brute force.

SURVEY.md §4: parent AABB ⊇ children (via leaf-containment check), leaf
coverage (every primitive exactly once), build determinism, and
traversal == brute-force on real meshes and random soups.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytpu.accel.bvh import build_bvh, validate_bvh
from raytpu.io.obj import load_obj_numpy
from raytpu.ops.intersect import brute_anyhit, brute_closest


def _corners(mesh):
    tri = mesh.triangles.astype(np.int64)
    v0 = mesh.positions[tri[:, 0]]
    v1 = mesh.positions[tri[:, 1]]
    v2 = mesh.positions[tri[:, 2]]
    return v0.astype(np.float32), (v1 - v0).astype(np.float32), (v2 - v0).astype(np.float32)


def _random_soup(rng, t=200, scale=1.0):
    v = rng.uniform(-scale, scale, (t, 3, 3)).astype(np.float32)
    return v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]


@pytest.mark.parametrize("method", ["sah", "median"])
def test_invariants_random_soup(rng, method):
    v0, e1, e2 = _random_soup(rng, 200)
    bvh = build_bvh(v0, e1, e2, leaf_size=4, method=method)
    validate_bvh(bvh, v0, e1, e2)


def test_invariants_teapot(resources_dir):
    mesh = load_obj_numpy(f"{resources_dir}/teapot.obj")
    v0, e1, e2 = _corners(mesh)
    bvh = build_bvh(v0, e1, e2, leaf_size=4, method="sah")
    validate_bvh(bvh, v0, e1, e2)
    # sanity: SAH should produce a reasonable node count
    assert bvh.num_nodes < 2 * mesh.num_triangles


def test_build_deterministic(rng):
    v0, e1, e2 = _random_soup(rng, 150)
    a = build_bvh(v0, e1, e2)
    b = build_bvh(v0, e1, e2)
    np.testing.assert_array_equal(a.miss, b.miss)
    np.testing.assert_array_equal(a.tri_order, b.tri_order)
    np.testing.assert_array_equal(a.aabb_min, b.aabb_min)


def test_single_triangle():
    v0 = np.array([[0, 0, 0]], np.float32)
    e1 = np.array([[1, 0, 0]], np.float32)
    e2 = np.array([[0, 1, 0]], np.float32)
    bvh = build_bvh(v0, e1, e2)
    validate_bvh(bvh, v0, e1, e2)
    assert bvh.num_nodes == 1
    assert bvh.tri_count[0] == 1


def test_identical_centroids():
    # degenerate: many triangles with the same centroid must still build
    v0 = np.tile(np.array([[0, 0, 0]], np.float32), (16, 1))
    e1 = np.tile(np.array([[1, 0, 0]], np.float32), (16, 1))
    e2 = np.tile(np.array([[0, 1, 0]], np.float32), (16, 1))
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    validate_bvh(bvh, v0, e1, e2)


def _traversal_setup(v0, e1, e2, leaf_size=4, method="sah"):
    """Build a single-mesh DeviceScene/SceneStatic carrying only BVH fields."""
    from raytpu.device_scene import DeviceScene, SceneStatic

    bvh = build_bvh(v0, e1, e2, leaf_size=leaf_size, method=method)
    order = bvh.tri_order.astype(np.int64)
    t = v0.shape[0]
    zeros3 = jnp.zeros((t, 3), jnp.float32)
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
    )
    static = SceneStatic(
        mesh_prim_ranges=((0, t),),
        instance_mesh=(0,),
        mesh_node_ranges=((0, bvh.num_nodes),),
        mesh_bvh_tri_ranges=((0, t),),
    )
    return dev, static


def _rays_at(rng, r, origin_box=3.0):
    o = rng.uniform(-origin_box, origin_box, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("method", ["sah", "median"])
def test_bvh_closest_matches_brute_soup(rng, method):
    from raytpu.ops.traverse import bvh_closest

    v0, e1, e2 = _random_soup(rng, 300)
    dev, static = _traversal_setup(v0, e1, e2, method=method)
    o, d = _rays_at(rng, 256)
    tmax = jnp.full((256,), 1e4, jnp.float32)

    tb, pb, ub, vb = brute_closest(
        o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), 1e-3, tmax
    )
    tt, pt, ut, vt = bvh_closest(dev, static, 0, o, d, 1e-3, tmax)

    np.testing.assert_array_equal(np.asarray(pt), np.asarray(pb))
    hit = np.asarray(pb) >= 0
    np.testing.assert_allclose(np.asarray(tt)[hit], np.asarray(tb)[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ut)[hit], np.asarray(ub)[hit], atol=1e-5)


def test_bvh_closest_matches_brute_teapot(resources_dir, rng):
    from raytpu.ops.traverse import bvh_closest

    mesh = load_obj_numpy(f"{resources_dir}/teapot.obj")
    v0, e1, e2 = _corners(mesh)
    dev, static = _traversal_setup(v0, e1, e2)
    o, d = _rays_at(rng, 512, origin_box=6.0)
    tmax = jnp.full((512,), 1e4, jnp.float32)

    tb, pb, _, _ = brute_closest(
        o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), 1e-3, tmax
    )
    tt, pt, _, _ = bvh_closest(dev, static, 0, o, d, 1e-3, tmax)

    pb, pt = np.asarray(pb), np.asarray(pt)
    tb, tt = np.asarray(tb), np.asarray(tt)
    hit = pb >= 0
    assert (hit == (pt >= 0)).all()
    # same t everywhere (prim may differ only on exact-tie coplanar overlaps)
    np.testing.assert_allclose(tt[hit], tb[hit], rtol=1e-5)
    assert (pt[hit] == pb[hit]).mean() > 0.995


def test_bvh_anyhit_matches_brute(rng):
    from raytpu.ops.traverse import bvh_anyhit

    v0, e1, e2 = _random_soup(rng, 300)
    dev, static = _traversal_setup(v0, e1, e2)
    o, d = _rays_at(rng, 256)
    tmax = jnp.full((256,), 2.5, jnp.float32)  # finite window like shadow rays

    occ_b = brute_anyhit(
        o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), 1e-3, tmax
    )
    occ_t = bvh_anyhit(dev, static, 0, o, d, 1e-3, tmax)
    np.testing.assert_array_equal(np.asarray(occ_t), np.asarray(occ_b))


def test_bvh_inactive_lanes_park(rng):
    from raytpu.ops.traverse import bvh_closest

    v0, e1, e2 = _random_soup(rng, 64)
    dev, static = _traversal_setup(v0, e1, e2)
    o, d = _rays_at(rng, 32)
    tmax = jnp.zeros((32,), jnp.float32)  # all lanes inactive
    t, p, _, _ = bvh_closest(dev, static, 0, o, d, 1e-3, tmax)
    assert (np.asarray(p) == -1).all()
