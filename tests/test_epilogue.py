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
