"""Cubemap sampler tests (GL major-axis semantics, src/main.cpp:2376-2412)."""

import numpy as np
import jax.numpy as jnp

from raytpu.ops.sky import cube_face_st, sample_cubemap


def _distinct_faces(size=8):
    """Each face a distinct constant color."""
    colors = np.eye(3, dtype=np.float32)
    colors = np.concatenate([colors, 1 - colors], axis=0)  # 6 distinct rgb
    sky = np.zeros((6, size, size, 3), np.float32)
    for f in range(6):
        sky[f] = colors[f]
    return jnp.asarray(sky), colors


def test_major_axis_face_selection():
    dirs = jnp.asarray(
        [
            [1, 0.1, 0.1],   # +X
            [-1, 0.1, 0.1],  # -X
            [0.1, 1, 0.1],   # +Y
            [0.1, -1, 0.1],  # -Y
            [0.1, 0.1, 1],   # +Z
            [0.1, 0.1, -1],  # -Z
        ],
        jnp.float32,
    )
    face, s, t = cube_face_st(dirs)
    np.testing.assert_array_equal(np.asarray(face), [0, 1, 2, 3, 4, 5])
    assert np.all((np.asarray(s) >= 0) & (np.asarray(s) <= 1))
    assert np.all((np.asarray(t) >= 0) & (np.asarray(t) <= 1))


def test_face_centers_map_to_center_texel():
    dirs = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    _, s, t = cube_face_st(dirs)
    np.testing.assert_allclose(np.asarray(s), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.5, atol=1e-6)


def test_sample_constant_faces():
    sky, colors = _distinct_faces()
    dirs = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    out = np.asarray(sample_cubemap(sky, dirs))
    np.testing.assert_allclose(out, colors, atol=1e-6)


def test_st_orientation_plus_x():
    # GL table: +X face has sc=-z, tc=-y. Direction (1, -0.5, -0.5):
    # sc = 0.5 → s = 0.75; tc = 0.5 → t = 0.75 (right of center, below center)
    face, s, t = cube_face_st(jnp.asarray([[1.0, -0.5, -0.5]]))
    assert int(face[0]) == 0
    np.testing.assert_allclose(float(s[0]), 0.75, atol=1e-6)
    np.testing.assert_allclose(float(t[0]), 0.75, atol=1e-6)


def test_bilinear_interpolates():
    # 2×2 face: +Z face gradient; sample between texels
    sky = np.zeros((6, 2, 2, 3), np.float32)
    sky[4, 0, 0] = [0, 0, 0]
    sky[4, 0, 1] = [1, 1, 1]
    sky[4, 1, 0] = [1, 1, 1]
    sky[4, 1, 1] = [0, 0, 0]
    out = np.asarray(sample_cubemap(jnp.asarray(sky), jnp.asarray([[0.0, 0.0, 1.0]])))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.5], atol=1e-6)


def test_clamp_to_edge_at_corners():
    sky, colors = _distinct_faces(size=4)
    # direction pointing at the very corner of the +X face: must not wrap/NaN
    out = np.asarray(
        sample_cubemap(sky, jnp.asarray([[1.0, 0.999, 0.999], [1.0, -0.999, -0.999]]))
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, [colors[0], colors[0]], atol=1e-5)


def test_scale_invariance():
    sky, _ = _distinct_faces()
    d = jnp.asarray([[0.3, 0.2, 0.9]])
    a = np.asarray(sample_cubemap(sky, d))
    b = np.asarray(sample_cubemap(sky, d * 7.5))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_bilinear2x_close_to_bilinear(rng):
    """Single-tap into the 2x-prefiltered map ~ true bilinear (quarter-texel
    max error) on a smooth cube map."""
    import jax.numpy as jnp
    from raytpu.device_scene import build_device_scene
    from raytpu.config import MaterialType, ObjectConfig, RenderConfig
    from raytpu.io.obj import Mesh
    from raytpu.scene import load_scene
    from raytpu.ops.sky import sample_cubemap_u32, sample_cubemap_u32_nearest

    size = 32
    g = np.linspace(0, 1, size, dtype=np.float32)
    face = np.stack(list(np.meshgrid(g, g, indexing="ij")) + [np.full((size, size), 0.5, np.float32)], -1)
    sky = np.stack([face] * 6, 0).astype(np.float32)

    tri = Mesh(
        positions=np.zeros((3, 3), np.float32),
        normals=np.zeros((3, 3), np.float32),
        triangles=np.array([[0, 1, 2]], np.int32), name="t",
    )
    cfg = RenderConfig(objects=(ObjectConfig("t", MaterialType.DIFFUSE),))
    dev, _ = build_device_scene(load_scene(cfg, meshes=[tri], skybox=sky))

    d = rng.normal(size=(4096, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = tuple(jnp.asarray(d[:, c]) for c in range(3))
    exact = sample_cubemap_u32(dev.skybox_u32, size, size, dirs)
    fast = sample_cubemap_u32_nearest(dev.skybox_u32_2x, 2 * size, 2 * size, dirs)
    for c in range(3):
        err = np.abs(np.asarray(exact[c]) - np.asarray(fast[c]))
        # quarter-texel of a smooth gradient + 8-bit quantization
        assert err.max() < 0.02, err.max()


def test_quad_pack_bit_identical_to_four_tap():
    """The per-channel quad-packed sampler (3 gathers) must be BIT-IDENTICAL
    to sample_cubemap_u32 (4 taps): same texel bytes, same unpack constants,
    same weight-combine order — including the low-edge clamp where both
    taps collapse onto texel/row 0 (the quad word's +1 slots must be
    overridden there, not just down-weighted)."""
    from raytpu.ops.sky import sample_cubemap_u32, sample_cubemap_u32_quad

    h = w = 16
    rng = np.random.RandomState(3)
    tex = rng.randint(0, 256, size=(6, h, w, 3)).astype(np.uint32)
    packed = jnp.asarray(
        (tex[..., 0] | (tex[..., 1] << 8) | (tex[..., 2] << 16)).reshape(-1)
    )
    quad = np.empty((3, 6, h, w), np.uint32)
    for c in range(3):
        ch = tex[..., c]
        chx = np.concatenate([ch[:, :, 1:], ch[:, :, -1:]], axis=2)
        chy = np.concatenate([ch[:, 1:, :], ch[:, -1:, :]], axis=1)
        chxy = np.concatenate([chx[:, 1:, :], chx[:, -1:, :]], axis=1)
        quad[c] = ch | (chx << 8) | (chy << 16) | (chxy << 24)
    quad = jnp.asarray(quad.reshape(3, -1))

    # random directions plus edge-hugging ones (s/t near 0 and 1 exercise
    # the low/high clamp paths on every face)
    d = rng.normal(size=(8192, 3)).astype(np.float32)
    edge = []
    for f in range(6):
        ax = f // 2
        sgn = 1.0 - 2.0 * (f % 2)
        for su in (-0.999, -0.97, 0.0, 0.97, 0.999):
            for tv in (-0.999, -0.97, 0.0, 0.97, 0.999):
                v = np.zeros(3, np.float32)
                v[ax] = sgn
                v[(ax + 1) % 3] = su
                v[(ax + 2) % 3] = tv
                edge.append(v)
    d = np.concatenate([d, np.asarray(edge, np.float32)])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = tuple(jnp.asarray(d[:, c]) for c in range(3))

    want = sample_cubemap_u32(packed, h, w, dirs)
    got = sample_cubemap_u32_quad(quad, h, w, dirs)
    for c in range(3):
        assert np.array_equal(np.asarray(got[c]), np.asarray(want[c])), c

    # the sampler accepts four quad-table layouts (interleaved — the
    # build default — / stacked / flat / tuple); all bit-identical
    got_flat = sample_cubemap_u32_quad(quad.reshape(-1), h, w, dirs)
    got_tup = sample_cubemap_u32_quad(
        tuple(quad[c] for c in range(3)), h, w, dirs)
    got_il = sample_cubemap_u32_quad(quad.T, h, w, dirs)
    for c in range(3):
        assert np.array_equal(np.asarray(got_flat[c]), np.asarray(want[c]))
        assert np.array_equal(np.asarray(got_tup[c]), np.asarray(want[c]))
        assert np.array_equal(np.asarray(got_il[c]), np.asarray(want[c]))


def test_device_scene_quad_table_matches_packed():
    """build_device_scene's quad table agrees with the packed map texels."""
    from raytpu.device_scene import build_device_scene
    from raytpu.config import MaterialType, ObjectConfig, RenderConfig
    from raytpu.io.obj import Mesh
    from raytpu.scene import load_scene

    size = 8
    rng = np.random.RandomState(5)
    sky = rng.rand(6, size, size, 3).astype(np.float32)
    tri = Mesh(
        positions=np.zeros((3, 3), np.float32),
        normals=np.zeros((3, 3), np.float32),
        triangles=np.array([[0, 1, 2]], np.int32), name="t",
    )
    cfg = RenderConfig(objects=(ObjectConfig("t", MaterialType.DIFFUSE),))
    dev, _ = build_device_scene(load_scene(cfg, meshes=[tri], skybox=sky))
    packed = np.asarray(dev.skybox_u32).reshape(6, size, size)
    # interleaved (6HW, 3) layout — channel-major view for the checks
    quadt = np.asarray(dev.skybox_quad).T.reshape(3, 6, size, size)
    for c, sh in enumerate((0, 8, 16)):
        ch = (packed >> sh) & 0xFF
        assert np.array_equal(quadt[c] & 0xFF, ch)
        assert np.array_equal(
            (quadt[c] >> 8) & 0xFF,
            np.concatenate([ch[:, :, 1:], ch[:, :, -1:]], axis=2),
        )
        assert np.array_equal(
            (quadt[c] >> 16) & 0xFF,
            np.concatenate([ch[:, 1:, :], ch[:, -1:, :]], axis=1),
        )
