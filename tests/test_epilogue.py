"""Fused bounce-epilogue semantics (ops/epilogue.py): the fused Pallas
body must render the same frame as the XLA ``bounce_core`` body.

Runs on CPU via interpret-mode kernels (``RenderStatic.fused="on"``)
against the default XLA body on the chained-Pallas traversal tier — all
three materials + sky misses exercised. Tolerance is a few f32 ulps (the
kernels may associate FMAs differently from XLA fusions); the on-TPU
cross-TIER exactness of the fused frame is enforced by
``bench.py --selftest`` (every tier shares the same epilogue kernels).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from raytpu import MaterialType, ObjectConfig, RenderConfig, load_scene
from raytpu.integrator import render_frame
from raytpu.render import Renderer

RES = "/root/reference/resources"


@pytest.fixture(scope="module")
def rig():
    cfg = RenderConfig(
        objects=(
            ObjectConfig(f"{RES}/cube.obj", MaterialType.MIRROR, "spin"),
            ObjectConfig(f"{RES}/cube.obj", MaterialType.DIFFUSE,
                         "static"),
            ObjectConfig(f"{RES}/cube.obj", MaterialType.REFRACTIVE,
                         "orbit"),
        ),
        skybox_dir=f"{RES}/skybox_texture_test",
        width=32, height=32, samples_per_pixel=2, max_bounce_count=2,
        traversal="pallas",
    )
    scene = load_scene(cfg)
    rr = Renderer(scene)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    return rr, cam


def _render(rr, cam, **knobs):
    rs = dataclasses.replace(rr.render_static, **knobs)
    return np.asarray(
        render_frame(rr.device_scene, rr.static, rs, cam)
    )


def test_fused_epilogue_matches_xla_body(rig):
    rr, cam = rig
    ref = _render(rr, cam, fused="off", wavefront="full")
    img = _render(rr, cam, fused="on")
    np.testing.assert_allclose(img, ref, atol=2e-6)
    # the frame must actually contain every material path + sky misses
    assert ref.std() > 0.01


def test_fused_compact_waves(rig):
    """The fused path's sort-once compacted waves (integrator.
    _trace_sample_fused, ``wavefront="compact"``): BIT-identical to the
    fused full-width loop, and a few ulps from the XLA body. The frame
    is sized so compaction actually ENGAGES — 512x130 spp=1 gives 65
    packets padded to p=128, budget 64 (two waves, the second nearly
    dead); the default 32x32 rig pads to p=64 where _wave_budget
    returns 0 and compact silently equals full."""
    rr, cam = rig
    rs0 = dataclasses.replace(
        rr.render_static, width=512, height=130, samples_per_pixel=1,
        max_bounce_count=3,
    )
    full = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rs0, fused="on", wavefront="full"), cam
    ))
    compact = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rs0, fused="on", wavefront="compact"), cam
    ))
    assert np.array_equal(compact, full)     # disjoint sorted waves
    xla = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rs0, fused="off", wavefront="full"), cam
    ))
    np.testing.assert_allclose(compact, xla, atol=2e-6)


def test_wave_rungs_properties():
    """The descending wave-budget ladder (integrator._wave_rungs): every
    rung divides P (disjoint exact tiling — the non-divisor clamped-tail
    double-bounce hazard), is a SEG_PACKETS multiple (sweep/epilogue
    granule), and each is <= a quarter of the previous."""
    from raytpu.integrator import _wave_budget, _wave_rungs
    from raytpu.ops.mega import SEG_PACKETS

    for p in (128, 512, 1024, 2048, 8192, 2048 + 64):
        b = _wave_budget(p)
        if not b:
            continue
        rungs = _wave_rungs(p, b)
        assert rungs[0] == b
        prev = None
        for r in rungs:
            assert p % r == 0
            assert r % SEG_PACKETS == 0
            if prev is not None:
                assert r * 4 <= prev
            prev = r
    # reference-preset shape: 2048 packets -> [512, 128]
    assert _wave_rungs(2048, _wave_budget(2048)) == [512, 128]
    # config4 shape: 8192 packets -> [2048, 512, 128] (max_rungs=3)
    assert _wave_rungs(8192, _wave_budget(8192)) == [2048, 512, 128]


@pytest.mark.slow
def test_fused_ladder_phases(rig, monkeypatch):
    """The multi-rung phase machinery must be BIT-identical to the
    single-budget compact loop. The real rung generator needs P >= 1024
    to produce a second rung (too slow for interpret mode), so the rung
    table is patched to [budget, 16] — the phase-transition logic
    (threshold cond, smaller-wave while loop) runs for real; rung-table
    properties are pinned by test_wave_rungs_properties, and the on-chip
    A/B (tools/r12) asserts frame equality at the real preset scale."""
    from raytpu import integrator

    monkeypatch.setattr(
        integrator, "_wave_rungs",
        lambda p, b, max_rungs=3: [b, 16],
    )
    rr, cam = rig
    # distinct height vs test_fused_compact_waves: a shared RenderStatic
    # key would hit the jit cache compiled BEFORE the monkeypatch
    rs0 = dataclasses.replace(
        rr.render_static, width=512, height=194, samples_per_pixel=1,
        max_bounce_count=3,
    )
    single = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rs0, fused="on", wavefront="compact",
                            ladder="off"), cam
    ))
    ladder = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rs0, fused="on", wavefront="compact",
                            ladder="auto"), cam
    ))
    assert np.array_equal(ladder, single)


def test_fused_spp1_deep_loop(rig):
    """The spp=1 + deep-bounce shape (config5/reference-like): exercises
    the lax.cond shadow skip branch of the fused body."""
    rr, cam = rig
    rs0 = dataclasses.replace(
        rr.render_static, samples_per_pixel=1, max_bounce_count=6
    )
    ref = np.asarray(render_frame(
        rr.device_scene, rr.static,
        dataclasses.replace(rs0, fused="off", wavefront="full"), cam
    ))
    img = np.asarray(render_frame(
        rr.device_scene, rr.static, dataclasses.replace(rs0, fused="on"),
        cam
    ))
    np.testing.assert_allclose(img, ref, atol=2e-6)
