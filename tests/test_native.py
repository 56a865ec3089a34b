"""Native C++ backend tests: OBJ parser + SAH builder vs the Python paths.

Skipped when ``native/libraytpu_native.so`` is not built (``make -C native``).
"""

import numpy as np
import pytest

from raytpu.accel.bvh import build_bvh as py_build_bvh, validate_bvh
from raytpu.io.obj import load_obj_numpy

native_io = pytest.importorskip("raytpu.io.native")
native_accel = pytest.importorskip("raytpu.accel.native")

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built"
)


def test_native_obj_matches_python_teapot(resources_dir):
    a = load_obj_numpy(f"{resources_dir}/teapot.obj")
    b = native_io.load_obj(f"{resources_dir}/teapot.obj")
    np.testing.assert_array_equal(a.triangles, b.triangles)
    np.testing.assert_allclose(a.positions, b.positions)
    np.testing.assert_allclose(a.normals, b.normals)


def test_native_obj_matches_python_cube_scene(resources_dir):
    a = load_obj_numpy(f"{resources_dir}/cube_scene.obj")
    b = native_io.load_obj(f"{resources_dir}/cube_scene.obj")
    np.testing.assert_array_equal(a.triangles, b.triangles)
    np.testing.assert_allclose(a.positions, b.positions)
    np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)


def test_native_obj_polygon_and_negative(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    a = load_obj_numpy(str(p))
    b = native_io.load_obj(str(p))
    np.testing.assert_array_equal(a.triangles, b.triangles)


def test_native_obj_rejects_bad_index(tmp_path):
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nf 1 2 3\n")
    with pytest.raises(ValueError, match="vertex index"):
        native_io.load_obj(str(p))


def test_native_obj_missing_file():
    with pytest.raises(FileNotFoundError):
        native_io.load_obj("/nope/missing.obj")


def _soup(rng, t):
    v = rng.uniform(-1, 1, (t, 3, 3)).astype(np.float32)
    return v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]


def test_native_bvh_invariants(rng):
    v0, e1, e2 = _soup(rng, 500)
    bvh = native_accel.build_bvh(v0, e1, e2, leaf_size=4)
    validate_bvh(bvh, v0, e1, e2)


def test_native_bvh_traversal_matches_brute(rng):
    import jax.numpy as jnp

    from raytpu.ops.intersect import brute_closest
    from raytpu.ops.traverse import bvh_closest
    from tests.test_bvh import _rays_at, _traversal_setup

    v0, e1, e2 = _soup(rng, 400)
    # build via native, then pack a scene manually around it
    bvh = native_accel.build_bvh(v0, e1, e2, leaf_size=4)
    validate_bvh(bvh, v0, e1, e2)

    from raytpu.device_scene import DeviceScene, SceneStatic

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
        mesh_node_ranges=((0, bvh.num_nodes),), mesh_bvh_tri_ranges=((0, t),),
    )
    o, d = _rays_at(rng, 256)
    tmax = jnp.full((256,), 1e4, jnp.float32)
    tb, pb, _, _ = brute_closest(
        o, d, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), 1e-3, tmax
    )
    tt, pt, _, _ = bvh_closest(dev, static, 0, o, d, 1e-3, tmax)
    pb, pt = np.asarray(pb), np.asarray(pt)
    hit = pb >= 0
    assert (hit == (pt >= 0)).all()
    np.testing.assert_allclose(np.asarray(tt)[hit], np.asarray(tb)[hit], rtol=1e-5)


def test_native_bvh_speed_vs_python(rng):
    """Native must beat Python by a wide margin on a large soup."""
    import time

    v0, e1, e2 = _soup(rng, 50_000)
    t0 = time.perf_counter()
    native_accel.build_bvh(v0, e1, e2)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    py_build_bvh(v0, e1, e2)
    t_python = time.perf_counter() - t0
    assert t_native < t_python / 5, (t_native, t_python)


def test_native_jpeg_matches_pil(resources_dir):
    """Baseline JPEG decode vs PIL (IDCT rounding + chroma upsampling give
    small per-pixel differences; the images must be visually identical)."""
    from PIL import Image

    f = f"{resources_dir}/skybox_texture_sea/front.jpg"
    ours = native_io.read_jpeg(f)
    ref = np.asarray(Image.open(f).convert("RGB"))
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.mean() < 0.5
    assert (diff > 16).mean() < 1e-4


def test_native_jpeg_rejects_unsupported(tmp_path):
    p = tmp_path / "x.jpg"
    p.write_bytes(b"\xff\xd8\xff\xc2" + b"\x00" * 32)  # SOF2 progressive-ish
    with pytest.raises(ValueError):
        native_io.read_jpeg(str(p))


def test_native_jpeg_missing_soi(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"not a jpeg")
    with pytest.raises(ValueError, match="SOI"):
        native_io.read_jpeg(str(p))
