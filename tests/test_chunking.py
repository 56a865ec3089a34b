"""Chunked BLAS tests: Morton splitting + traversal equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytpu.accel.chunking import chunk_order, morton_codes, needs_chunking
from raytpu.config import MaterialType, ObjectConfig, RenderConfig
from raytpu.io.genmesh import generate_highpoly
from raytpu.render import Renderer
from raytpu.scene import load_scene


def test_morton_locality():
    pts = np.array([[0, 0, 0], [0.01, 0, 0], [1, 1, 1], [0.99, 1, 1]])
    codes = morton_codes(pts)
    order = np.argsort(codes)
    # near-identical points must be adjacent in Morton order
    pos = {int(i): k for k, i in enumerate(order)}
    assert abs(pos[0] - pos[1]) == 1
    assert abs(pos[2] - pos[3]) == 1


def test_chunk_order_partitions_exactly(rng):
    t = 10_000
    v = rng.uniform(-1, 1, (t, 3, 3)).astype(np.float32)
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    order, ranges = chunk_order(v0, e1, e2, chunk_tris=3000)
    assert np.array_equal(np.sort(order), np.arange(t))
    assert sum(c for _, c in ranges) == t
    assert len(ranges) == 4  # ceil(10000/3000)
    # balanced: no chunk more than ~1 larger than another
    sizes = [c for _, c in ranges]
    assert max(sizes) - min(sizes) <= 1


def test_needs_chunking_thresholds():
    assert not needs_chunking(2256)       # teapot
    assert needs_chunking(330_000)        # armadillo class


def test_chunked_scene_renders_same_as_monolithic_xla(resources_dir, rng):
    """Render the high-poly stand-in (depth 5 = 20k tris) twice: chunked
    (forced small chunks) vs monolithic XLA-packet; images must match."""
    import raytpu.accel.chunking as ch

    mesh = generate_highpoly(depth=5)  # 20480 tris
    cfg = RenderConfig(
        objects=(ObjectConfig("gen", MaterialType.DIFFUSE, "static"),),
        width=32, height=32, samples_per_pixel=1, max_bounce_count=1,
        traversal="xla",
    )

    # default path: 20480 tris exceeds the SMEM budget → auto-chunked
    scene = load_scene(cfg, meshes=[mesh])
    r_mono = Renderer(scene)
    r_mono.set_transforms(0.0)
    default_chunks = len(r_mono.static.traversal_list)
    assert default_chunks >= 1
    img_mono = r_mono.render_np()

    old = ch.CHUNK_TRIS
    ch.CHUNK_TRIS = 2048
    orig_needs = ch.needs_chunking
    ch.needs_chunking = lambda n, leaf_size=4: n > 2048
    try:
        scene2 = load_scene(cfg, meshes=[mesh])
        r_chunk = Renderer(scene2)
        r_chunk.set_transforms(0.0)
        assert len(r_chunk.static.traversal_list) == 10  # 20480/2048
        assert len(r_chunk.static.traversal_list) != default_chunks
        img_chunk = r_chunk.render_np()
    finally:
        ch.CHUNK_TRIS = old
        ch.needs_chunking = orig_needs

    np.testing.assert_allclose(img_chunk, img_mono, atol=1e-5)


def test_chunked_prim_ids_are_global(rng):
    """bvh_tri_prim must map back through the Morton selection to the
    original global primitive ids."""
    import raytpu.accel.chunking as ch

    mesh = generate_highpoly(depth=4)  # 5120 tris
    cfg = RenderConfig(
        objects=(ObjectConfig("gen", MaterialType.DIFFUSE, "static"),),
        width=8, height=8,
    )
    old_needs = ch.needs_chunking
    old_chunk = ch.CHUNK_TRIS
    ch.needs_chunking = lambda n, leaf_size=4: n > 1024
    ch.CHUNK_TRIS = 1024
    try:
        scene = load_scene(cfg, meshes=[mesh])
        r = Renderer(scene)
    finally:
        ch.needs_chunking = old_needs
        ch.CHUNK_TRIS = old_chunk

    prim = np.asarray(r.device_scene.bvh_tri_prim)
    assert np.array_equal(np.sort(prim), np.arange(mesh.num_triangles))
    # spot-check: the reordered tri data matches the original at mapped ids
    v0 = np.asarray(r.device_scene.tri_v0)
    bv0 = np.asarray(r.device_scene.bvh_tri_v0)
    np.testing.assert_allclose(bv0, v0[prim])


def test_chunk_tris_config_knob(rng):
    """RenderConfig.chunk_tris forces a finer main-set partition (the
    config5 tuning surface) and renders identically to the default."""
    mesh = generate_highpoly(depth=5)  # 20480 tris
    base = RenderConfig(
        objects=(ObjectConfig("gen", MaterialType.DIFFUSE, "static"),),
        width=32, height=32, samples_per_pixel=1, max_bounce_count=1,
        traversal="xla",
    )
    r_def = Renderer(load_scene(base, meshes=[mesh]))
    r_def.set_transforms(0.0)

    cfg = base.replace(chunk_tris=2048)
    r_fine = Renderer(load_scene(cfg, meshes=[mesh]))
    r_fine.set_transforms(0.0)
    assert len(r_fine.static.traversal_list) == 10  # ceil(20480/2048)
    assert len(r_fine.static.traversal_list) > len(
        r_def.static.traversal_list)
    np.testing.assert_allclose(r_fine.render_np(), r_def.render_np(),
                               atol=1e-5)
