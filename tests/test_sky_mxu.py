"""MXU texture-unit sky sampler (ops/sky_mxu.py) vs the gather path.

The contract is BIT-IDENTITY with ``sample_cubemap_u32_nearest`` on miss
lanes, through all three tiers: MXU window kernel (coherent packets),
packet-compacted gather (divergent packets), and the full-gather overflow
cond. Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.ops.sky import sample_cubemap_u32, sample_cubemap_u32_nearest
from raytpu.ops.sky_mxu import (
    PACKET_K,
    mxu_supported,
    sample_cubemap_u32_mxu,
    sample_cubemap_u32_nearest_mxu,
)

H, W = 128, 256  # smallest supported map (h>=128, h%8==0, w>=256, w%128==0)


def _sky(seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.randint(0, 1 << 24, size=(6 * H * W,)).astype(np.uint32)
    )


def _coherent_dirs(rng, p, spread=0.02):
    """Per-packet direction clusters (one tight cone per packet)."""
    centers = rng.normal(size=(p, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    d = centers[:, None, :] + spread * rng.normal(size=(p, PACKET_K, 3))
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    return tuple(jnp.asarray(d[..., c], jnp.float32) for c in range(3))


def _divergent_dirs(rng, p):
    d = rng.normal(size=(p, PACKET_K, 3))
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    return tuple(jnp.asarray(d[..., c], jnp.float32) for c in range(3))


def _check_exact(dirs, miss):
    got = sample_cubemap_u32_nearest_mxu(_sky(), H, W, dirs, miss)
    want = sample_cubemap_u32_nearest(_sky(), H, W, dirs)
    m = np.asarray(miss)
    for c in range(3):
        g, w_ = np.asarray(got[c]), np.asarray(want[c])
        assert np.array_equal(g[m], w_[m]), f"channel {c} mismatch"


def test_supported_gate():
    assert mxu_supported(H, W, PACKET_K)
    assert not mxu_supported(64, W, PACKET_K)       # too short
    assert not mxu_supported(H, 128, PACKET_K)      # too narrow
    assert not mxu_supported(130, W, PACKET_K)      # h % 8 != 0
    assert not mxu_supported(H, W, 256)             # wrong packet width


def test_coherent_packets_exact():
    rng = np.random.RandomState(1)
    dirs = _coherent_dirs(rng, p=6)
    miss = jnp.asarray(rng.rand(6, PACKET_K) < 0.8)
    _check_exact(dirs, miss)


def test_face_straddle_packets():
    """Clusters centered on face edges and the (1,1,1) corner (3 faces)."""
    rng = np.random.RandomState(2)
    centers = np.array(
        [
            [1.0, 1.0, 0.0],    # +X/+Y edge
            [0.0, -1.0, 1.0],   # -Y/+Z edge
            [1.0, 1.0, 1.0],    # 3-face corner
            [-1.0, -1.0, -1.0],
        ]
    )
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    d = centers[:, None, :] + 0.03 * rng.normal(size=(4, PACKET_K, 3))
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    dirs = tuple(jnp.asarray(d[..., c], jnp.float32) for c in range(3))
    miss = jnp.ones((4, PACKET_K), bool)
    _check_exact(dirs, miss)


def test_divergent_fallback_exact():
    """Random-sphere packets blow the window budget → compacted gather."""
    rng = np.random.RandomState(3)
    p = 8
    dirs = _divergent_dirs(rng, p)
    miss = jnp.ones((p, PACKET_K), bool)
    _check_exact(dirs, miss)


def test_mixed_coherent_and_divergent():
    rng = np.random.RandomState(4)
    c = _coherent_dirs(rng, 4)
    v = _divergent_dirs(rng, 4)
    dirs = tuple(jnp.concatenate([a, b]) for a, b in zip(c, v))
    miss = jnp.asarray(rng.rand(8, PACKET_K) < 0.7)
    _check_exact(dirs, miss)


def test_overflow_full_gather_cond():
    """More divergent packets than the compaction budget → full sweep."""
    rng = np.random.RandomState(5)
    p = 40  # budget = max(32, 40 // 8) = 32 < 40 bad packets
    dirs = _divergent_dirs(rng, p)
    miss = jnp.ones((p, PACKET_K), bool)
    _check_exact(dirs, miss)


def test_bilinear_coherent_close():
    """Tent-weight MXU bilinear vs the 4-tap gather: bf16 weight
    quantization only (≤1 u8 LSB)."""
    rng = np.random.RandomState(8)
    dirs = _coherent_dirs(rng, 5)
    miss = jnp.asarray(rng.rand(5, PACKET_K) < 0.9)
    got = sample_cubemap_u32_mxu(_sky(), H, W, dirs, miss)
    want = sample_cubemap_u32(_sky(), H, W, dirs)
    m = np.asarray(miss)
    for c in range(3):
        err = np.abs(np.asarray(got[c])[m] - np.asarray(want[c])[m])
        assert err.max() <= 1.5 / 255.0, f"channel {c}: {err.max()}"


def test_bilinear_divergent_fallback_exact():
    """Fallback packets use the 4-tap gather — agreement to 1 f32 ulp
    (XLA may contract the filter arithmetic into FMAs differently)."""
    rng = np.random.RandomState(9)
    dirs = _divergent_dirs(rng, 6)
    miss = jnp.ones((6, PACKET_K), bool)
    got = sample_cubemap_u32_mxu(_sky(), H, W, dirs, miss)
    want = sample_cubemap_u32(_sky(), H, W, dirs)
    for c in range(3):
        err = np.abs(np.asarray(got[c]) - np.asarray(want[c])).max()
        assert err <= 1e-6, err


def test_no_miss_lanes():
    """Packets without misses must not crash; values are don't-care."""
    rng = np.random.RandomState(6)
    dirs = _coherent_dirs(rng, 3)
    miss = jnp.zeros((3, PACKET_K), bool)
    got = sample_cubemap_u32_nearest_mxu(_sky(), H, W, dirs, miss)
    for c in range(3):
        assert np.all(np.isfinite(np.asarray(got[c])))


@pytest.mark.parametrize("filt,exact", [("bilinear2x", True), ("bilinear", False)])
def test_integrator_end_to_end_matches_gather(filt, exact):
    """Full frame: sky_sampler='mxu' vs 'gather' agree (bit-identical for
    the one-hot 2x path, ≤1 u8 LSB for tent-weight bilinear)."""
    from raytpu.config import MaterialType, ObjectConfig, RenderConfig
    from raytpu.scene import load_scene
    from raytpu.render import Renderer

    rng = np.random.RandomState(7)
    sky = rng.rand(6, 64, 128, 3).astype(np.float32)  # 2x map: 128×256
    from raytpu.io.obj import Mesh

    tri = Mesh(
        positions=np.array(
            [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]], np.float32
        ),
        normals=np.tile(np.array([[0, 0, 1]], np.float32), (3, 1)),
        triangles=np.array([[0, 1, 2]], np.int32),
    )
    frames = {}
    for sampler in ("gather", "mxu"):
        cfg = RenderConfig(
            objects=(ObjectConfig("tri", MaterialType.MIRROR, "static"),),
            width=64, height=64, samples_per_pixel=1, max_bounce_count=2,
            sky_sampler=sampler, skybox_filter=filt,
        )
        scene = load_scene(cfg, meshes=[tri], skybox=sky)
        frames[sampler] = np.asarray(Renderer(scene).step(0.0))
    if exact:
        assert np.array_equal(frames["gather"], frames["mxu"])
    else:
        err = np.abs(frames["gather"] - frames["mxu"]).max()
        assert err <= 1.5 / 255.0, err


def test_rebin_subwave_bilinear_within_weight_quant():
    """The window-cell-sorted fallback sub-wave holds the SAME contract
    as the unsorted sampler: ≤1 u8 LSB from the 4-tap gather reference on
    miss lanes (sorting shifts which lanes ride the bf16-weight MXU path
    vs the exact gather fallback, so rebin-vs-unrebinned is not bitwise —
    both are pinned to the gather reference instead)."""
    rng = np.random.RandomState(7)
    p = 16
    # mixed wave: coherent packets + scattered secondary-miss packets
    # (the divergent half forces the compacted fallback; budget =
    # min(p, max(32, p//8)) = p covers it → rebin path taken)
    coh = _coherent_dirs(rng, p // 2)
    div = _divergent_dirs(rng, p // 2)
    dirs = tuple(jnp.concatenate([a, b]) for a, b in zip(coh, div))
    miss = jnp.asarray(rng.rand(p, PACKET_K) < 0.6)
    want = sample_cubemap_u32(_sky(), H, W, dirs)
    m = np.asarray(miss)
    for rebin in (True, False):
        got = sample_cubemap_u32_mxu(_sky(), H, W, dirs, miss, rebin=rebin)
        for c in range(3):
            err = np.abs(np.asarray(got[c])[m] - np.asarray(want[c])[m])
            assert err.max() <= 1.5 / 255.0, \
                f"rebin={rebin} channel {c}: {err.max()}"


def test_rebin_subwave_nearest_exact():
    """Nearest mode stays BIT-IDENTICAL through the re-binned fallback
    (one-hot MXU taps and gather taps are both exact)."""
    rng = np.random.RandomState(11)
    p = 16
    coh = _coherent_dirs(rng, p // 2)
    div = _divergent_dirs(rng, p // 2)
    dirs = tuple(jnp.concatenate([a, b]) for a, b in zip(coh, div))
    miss = jnp.asarray(rng.rand(p, PACKET_K) < 0.6)
    got = sample_cubemap_u32_nearest_mxu(_sky(), H, W, dirs, miss,
                                         rebin=True)
    want = sample_cubemap_u32_nearest(_sky(), H, W, dirs)
    m = np.asarray(miss)
    for c in range(3):
        g, w_ = np.asarray(got[c]), np.asarray(want[c])
        assert np.array_equal(g[m], w_[m]), f"channel {c} mismatch"


def test_quad_fallback_matches_four_tap_fallback():
    """_sample_mxu with the quad table matches the 4-tap fallback to 1 f32
    ulp (the quad sampler is bit-identical to sample_cubemap_u32 op-for-op
    — test_sky.py asserts that un-jitted — but XLA contracts the filter
    arithmetic into FMAs differently in the two fusion contexts, the same
    1e-6 bound as test_bilinear_divergent_fallback_exact)."""
    rng = np.random.RandomState(13)
    p = 16
    coh = _coherent_dirs(rng, p // 2)
    div = _divergent_dirs(rng, p // 2)
    dirs = tuple(jnp.concatenate([a, b]) for a, b in zip(coh, div))
    miss = jnp.asarray(rng.rand(p, PACKET_K) < 0.6)
    sky = np.asarray(_sky()).reshape(6, H, W)
    quad = np.empty((3, 6, H, W), np.uint32)
    for c, sh in enumerate((0, 8, 16)):
        ch = (sky >> sh) & 0xFF
        chx = np.concatenate([ch[:, :, 1:], ch[:, :, -1:]], axis=2)
        chy = np.concatenate([ch[:, 1:, :], ch[:, -1:, :]], axis=1)
        chxy = np.concatenate([chx[:, 1:, :], chx[:, -1:, :]], axis=1)
        quad[c] = ch | (chx << 8) | (chy << 16) | (chxy << 24)
    quad = jnp.asarray(quad.reshape(3, -1))
    a = sample_cubemap_u32_mxu(_sky(), H, W, dirs, miss)
    b = sample_cubemap_u32_mxu(_sky(), H, W, dirs, miss, quad=quad)
    m = np.asarray(miss)
    for c in range(3):
        err = np.abs(np.asarray(a[c])[m] - np.asarray(b[c])[m]).max()
        assert err <= 1e-6, (c, err)


def test_sky_sampler_contract_on_tpu():
    """TPU-only: a real-asset frame with the MXU sampler (windows + tiered
    quad-gather fallback on the actual compiled path, not interpret mode)
    must match the gather-forced frame to <=1.5/255 — the sampler-contract
    analog of test_mega_bit_identity. Skipped off-TPU (interpret-mode
    coverage above already pins the kernel math there)."""
    if jax.default_backend() != "tpu":
        pytest.skip("exercises the compiled MXU sampler path")
    from raytpu.presets import load_preset_scene
    from raytpu.render import Renderer
    from raytpu.integrator import render_frame

    imgs = {}
    for sampler in ("mxu", "gather"):
        sc = load_preset_scene("config2")
        sc.config = sc.config.replace(width=256, height=192,
                                      sky_sampler=sampler)
        rr = Renderer(sc)
        rr.set_transforms(0.0)
        cam = jnp.asarray(rr.camera.basis())
        imgs[sampler] = np.asarray(render_frame(
            rr.device_scene, rr.static, rr.render_static, cam))
    err = float(np.abs(imgs["mxu"] - imgs["gather"]).max())
    assert err <= 1.5 / 255.0 + 1e-6, err
