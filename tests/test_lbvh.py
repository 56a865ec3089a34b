"""Device LBVH builder tests: invariants + traversal equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytpu.accel.bvh import validate_bvh
from raytpu.accel.lbvh import build_lbvh, morton_codes_jax
from raytpu.ops.intersect import brute_closest


def _soup(seed, t):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-1, 1, (t, 3, 3)).astype(np.float32)
    return v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]


def test_morton_orders_spatially():
    pts = jnp.asarray(
        [[0.0, 0, 0], [0.01, 0, 0], [1, 1, 1], [0.99, 1, 1]], jnp.float32
    )
    codes = np.asarray(morton_codes_jax(pts))
    order = np.argsort(codes)
    pos = {int(i): k for k, i in enumerate(order)}
    assert abs(pos[0] - pos[1]) == 1
    assert abs(pos[2] - pos[3]) == 1


@pytest.mark.parametrize("t", [2, 3, 17, 300])
@pytest.mark.parametrize("leaf_size", [1, 4])
def test_lbvh_invariants(t, leaf_size):
    v0, e1, e2 = _soup(7, t)
    bvh = build_lbvh(v0, e1, e2, leaf_size=leaf_size)
    validate_bvh(bvh, v0, e1, e2)
    leaves = bvh.tri_first >= 0
    counts = bvh.tri_count[leaves]
    assert (counts >= 1).all() and (counts <= leaf_size).all()
    assert counts.sum() == t
    # collapsing must actually shrink the node count vs 1-tri leaves
    if leaf_size > 1 and t > leaf_size:
        assert bvh.num_nodes < 2 * t - 1
    # packed leaf slot ranges tile [0, t) without overlap
    slots = np.concatenate([
        np.arange(f, f + c)
        for f, c in zip(bvh.tri_first[leaves], counts)
    ])
    assert np.array_equal(np.sort(slots), np.arange(t))


def test_lbvh_duplicate_centroids():
    # identical triangles → identical Morton codes: index disambiguation
    v0 = np.tile(np.array([[0, 0, 0]], np.float32), (16, 1))
    e1 = np.tile(np.array([[1, 0, 0]], np.float32), (16, 1))
    e2 = np.tile(np.array([[0, 1, 0]], np.float32), (16, 1))
    bvh = build_lbvh(v0, e1, e2)
    validate_bvh(bvh, v0, e1, e2)


def test_lbvh_traversal_matches_brute():
    from tests.test_bvh import _rays_at

    v0, e1, e2 = _soup(11, 400)
    bvh = build_lbvh(v0, e1, e2)
    validate_bvh(bvh, v0, e1, e2)

    # pack into a device scene and traverse with the per-ray path
    from raytpu.device_scene import DeviceScene, SceneStatic
    from raytpu.ops.traverse import bvh_closest

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
        mesh_prim_ranges=((0, t),), instance_mesh=(0,),
        mesh_node_ranges=((0, bvh.num_nodes),),
        mesh_bvh_tri_ranges=((0, t),),
    )
    rng = np.random.default_rng(3)
    o, d = _rays_at(rng, 256)
    tmax = jnp.full((256,), 1e4, jnp.float32)
    tb, pb, _, _ = brute_closest(
        o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), 1e-3, tmax
    )
    tt, pt, _, _ = bvh_closest(dev, static, 0, o, d, 1e-3, tmax)
    pb, pt = np.asarray(pb), np.asarray(pt)
    hit = pb >= 0
    assert (hit == (pt >= 0)).all()
    np.testing.assert_allclose(
        np.asarray(tt)[hit], np.asarray(tb)[hit], rtol=1e-4
    )


def test_lbvh_via_config(resources_dir):
    """End-to-end: bvh_builder='lbvh' renders the same image as SAH."""
    from raytpu.config import MaterialType, ObjectConfig, RenderConfig
    from raytpu.render import Renderer
    from raytpu.scene import load_scene
    from raytpu.io.obj import load_obj_numpy

    mesh = load_obj_numpy(f"{resources_dir}/teapot.obj")
    base = dict(
        objects=(ObjectConfig("m", MaterialType.DIFFUSE, "static"),),
        width=24, height=24, samples_per_pixel=1, max_bounce_count=1,
    )
    img_sah = Renderer(load_scene(RenderConfig(**base), meshes=[mesh])).render_np()
    img_lbvh = Renderer(
        load_scene(RenderConfig(**base, bvh_builder="lbvh"), meshes=[mesh])
    ).render_np()
    np.testing.assert_allclose(img_lbvh, img_sah, atol=1e-5)
