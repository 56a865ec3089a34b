"""Multi-device tile-sharded rendering on the 8-device CPU mesh.

The "multi-node without a real cluster" test (SURVEY.md §4): conftest forces
8 virtual CPU devices; sharded output must equal the single-device render.
"""

import jax
import numpy as np
import pytest

from raytpu.config import MaterialType, ObjectConfig, RenderConfig
from raytpu.integrator import RenderStatic, render_frame
from raytpu.io.obj import load_obj_numpy
from raytpu.parallel import make_mesh, render_sharded
from raytpu.render import Renderer
from raytpu.scene import load_scene


@pytest.fixture(scope="module")
def small_scene(request):
    res = "/root/reference/resources"
    import os

    if not os.path.isdir(res):
        pytest.skip("reference resources not mounted")
    sky = np.zeros((6, 4, 4, 3), np.float32)
    sky[:] = np.asarray([0.3, 0.5, 0.7], np.float32)
    cfg = RenderConfig(
        objects=(
            ObjectConfig(f"{res}/cube.obj", MaterialType.MIRROR, "static"),
            ObjectConfig(f"{res}/cube.obj", MaterialType.DIFFUSE, "orbit"),
        ),
        width=32,
        height=24,
        samples_per_pixel=2,
        max_bounce_count=3,
    )
    meshes = [load_obj_numpy(o.path) for o in cfg.objects]
    scene = load_scene(cfg, meshes=meshes, skybox=sky)
    r = Renderer(scene)
    r.set_transforms(0.25)
    return r


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(small_scene):
    r = small_scene
    img_single = np.asarray(
        render_frame(r.device_scene, r.static, r.render_static, r.camera.basis())
    )
    mesh = make_mesh(8)
    img_sharded = np.asarray(
        render_sharded(r.device_scene, r.static, r.render_static,
                       r.camera.basis(), mesh)
    )
    assert img_sharded.shape == img_single.shape
    # the sharded path runs the SAME tile-major packet pipeline per shard,
    # so the output is bit-identical, not just close
    np.testing.assert_array_equal(img_sharded, img_single)


def test_sharded_hits_pallas_when_forced(small_scene):
    """Forcing traversal='pallas' (interpret mode off-TPU) must keep the
    sharded path on the kernel hot path — packets reach the Pallas chain
    with the kernel's native width, not a fallback."""
    import dataclasses

    from raytpu.ops.trace import _all_pallas
    from raytpu.ops.traverse_pallas import PACKET_K

    r = small_scene
    static_forced = dataclasses.replace(r.static, traversal="pallas")
    assert _all_pallas(static_forced, PACKET_K)
    mesh = make_mesh(2)
    img = np.asarray(
        render_sharded(r.device_scene, static_forced, r.render_static,
                       r.camera.basis(), mesh)
    )
    img_single = np.asarray(
        render_frame(r.device_scene, static_forced, r.render_static,
                     r.camera.basis())
    )
    np.testing.assert_array_equal(img, img_single)


def test_sharded_nondivisible_rows(small_scene):
    # height 24 with 5 devices → padding path
    r = small_scene
    mesh = make_mesh(4)
    img = np.asarray(
        render_sharded(r.device_scene, r.static, r.render_static,
                       r.camera.basis(), mesh)
    )
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()


def test_sharded_output_actually_distributed(small_scene):
    r = small_scene
    mesh = make_mesh(8)
    img = render_sharded(
        r.device_scene, r.static, r.render_static, r.camera.basis(), mesh
    )
    # the device buffer should be sharded across all 8 devices
    assert len(img.sharding.device_set) == 8


def test_sharded_config2_class_resolution():
    """Config2-class sharded render (teapot mirror + skybox, 256×192, 4spp,
    2-bounce) — realistic tile-row padding / BLOCK_PACKETS interactions
    (height 192 = 6 tile rows over 8 devices → non-divisible shard heights),
    asserting bit-identity vs single device (VERDICT r2 item 9)."""
    res = "/root/reference/resources"
    import os

    if not os.path.isdir(res):
        pytest.skip("reference resources not mounted")
    from raytpu.io.image import load_skybox

    cfg = RenderConfig(
        objects=(
            ObjectConfig(f"{res}/teapot.obj", MaterialType.MIRROR, "spin"),
        ),
        width=256,
        height=192,
        samples_per_pixel=4,
        max_bounce_count=2,
        skybox_dir=f"{res}/skybox_texture_sea",
    )
    meshes = [load_obj_numpy(o.path) for o in cfg.objects]
    sky = load_skybox(cfg.skybox_dir)
    scene = load_scene(cfg, meshes=meshes, skybox=sky)
    r = Renderer(scene)
    r.set_transforms(0.5)
    img_single = np.asarray(
        render_frame(r.device_scene, r.static, r.render_static,
                     r.camera.basis())
    )
    mesh = make_mesh(8)
    img_sharded = np.asarray(
        render_sharded(r.device_scene, r.static, r.render_static,
                       r.camera.basis(), mesh)
    )
    assert img_sharded.shape == (192, 256, 3)
    np.testing.assert_array_equal(img_sharded, img_single)


def test_renderer_devices_config(small_scene):
    """config.devices>1 routes Renderer.render through the sharded path and
    matches the single-device image."""
    from raytpu.render import Renderer

    r1 = small_scene
    img_single = r1.render_np()
    scene2 = r1.scene
    scene2.config = scene2.config.replace(devices=8)
    r8 = Renderer(scene2)
    r8.set_transforms(0.25)
    img_multi = r8.render_np()
    np.testing.assert_allclose(img_multi, img_single, atol=1e-6)
    scene2.config = scene2.config.replace(devices=1)


def test_sharded_raygen_bit_identity_on_tpu():
    """TPU-gated (ADVICE r4): the sharded==single-device bit-identity
    invariant with the fused Pallas raygen kernel ENGAGED. On the CPU
    mesh 'auto' disables the kernel, so the other tests here only cover
    the XLA raygen; this one runs the real kernel on the chip.

    Two layers: (a) kernel-level — raygen_packed on a full wave vs the
    same wave in BLOCK_PACKETS-sized slices (the sharded path's padded
    local waves) must be BITWISE equal on TPU (one uniform RG_BP codegen
    regardless of grid count — the ops/raygen.py invariant); (b) frame-
    level — render_sharded over the available mesh vs render_frame,
    bitwise (on the one-chip environment that is a 1-device mesh, which
    still exercises dist.py's padding + per-shard raygen path)."""
    if jax.default_backend() != "tpu":
        pytest.skip("raygen kernel is TPU-only under 'auto'")
    import os

    import jax.numpy as jnp

    from raytpu.io.image import load_skybox
    from raytpu.ops import raygen
    from raytpu.ops.mega import BLOCK_PACKETS
    from raytpu.ops.traverse_pallas import PACKET_K

    # (a) kernel-level wave-size bitwise independence on real hardware
    k = PACKET_K
    p = BLOCK_PACKETS * 4
    rng = np.random.default_rng(11)
    px = jnp.asarray(rng.integers(0, 640, size=(p, k)).astype(np.float32))
    py = jnp.asarray(rng.integers(0, 480, size=(p, k)).astype(np.float32))
    camera = jnp.asarray(
        [[1.0, 2.0, 3.0], [0.8, 0.0, 0.6], [0.0, 1.0, 0.0],
         [-0.6, 0.0, 0.8]], jnp.float32)
    s_row = jnp.asarray(rng.integers(0, 4, size=(p,)).astype(np.float32))
    full = np.asarray(raygen.raygen_packed(camera, s_row, px, py, 4, 640, 480))
    bp = BLOCK_PACKETS
    slices = [
        np.asarray(raygen.raygen_packed(
            camera, s_row[i:i + bp], px[i:i + bp], py[i:i + bp], 4, 640, 480))
        for i in range(0, p, bp)
    ]
    np.testing.assert_array_equal(full, np.concatenate(slices, axis=1))

    # (b) frame-level sharded-vs-single bitwise with the kernel engaged
    res = "/root/reference/resources"
    if not os.path.isdir(res):
        pytest.skip("reference resources not mounted")
    cfg = RenderConfig(
        objects=(
            ObjectConfig(f"{res}/teapot.obj", MaterialType.MIRROR, "spin"),
        ),
        width=256, height=192, samples_per_pixel=4, max_bounce_count=2,
        skybox_dir=f"{res}/skybox_texture_sea",
    )
    meshes = [load_obj_numpy(o.path) for o in cfg.objects]
    scene = load_scene(cfg, meshes=meshes, skybox=load_skybox(cfg.skybox_dir))
    r = Renderer(scene)
    r.set_transforms(0.5)
    from raytpu.integrator import _tiled_pixels

    (px_f, _), _, _ = _tiled_pixels(r.render_static)
    assert raygen.use_raygen_kernel(
        r.render_static.raygen,
        px_f.shape[0] * r.render_static.samples_per_pixel, PACKET_K)
    img_single = np.asarray(
        render_frame(r.device_scene, r.static, r.render_static,
                     jnp.asarray(r.camera.basis())))
    mesh = make_mesh(len(jax.devices()))
    img_sharded = np.asarray(
        render_sharded(r.device_scene, r.static, r.render_static,
                       r.camera.basis(), mesh))
    np.testing.assert_array_equal(img_sharded, img_single)


def test_sharded_bench_mode():
    """The multi-chip bench entry (`run_benchmark(devices=N)` behind
    `RAYTPU_BENCH_DEVICES`) runs on a CPU mesh: shards the frame over all
    8 virtual devices and reports sane timings (VERDICT r3 item 7)."""
    res = "/root/reference/resources"
    import os

    if not os.path.isdir(res):
        pytest.skip("reference resources not mounted")
    from raytpu.bench import run_benchmark

    cfg = RenderConfig(
        objects=(
            ObjectConfig(f"{res}/cube.obj", MaterialType.MIRROR, "static"),
        ),
        skybox_dir=f"{res}/skybox_texture_test",
        width=64, height=64, samples_per_pixel=1, max_bounce_count=1,
    )
    r = run_benchmark(preset=cfg, frames=2, count=False, devices=8)
    assert r["devices"] == 8
    assert r["frame_ms"] > 0 and r["fps"] > 0
