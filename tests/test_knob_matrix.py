"""Knob-matrix render regression (VERDICT r3 item 6): every live
rejected-experiment knob must still RENDER CORRECTLY, not just import.

Renders one tiny frame per knob setting and asserts exact equality to the
default path. The knobs were each measured-and-rejected (or defaulted) on
chip with the claim "bit-identical either way" — this pins that claim so a
knob that silently rots fails in `pytest tests/` instead of in a future
perf round.

Design note: each distinct knob combination is a separate jit executable
(~25-90 s CPU compile), so the default set is one-axis-at-a-time over every
non-default knob value plus two interaction combos (~8 renders); the full
cross product (64 renders, >1 h) runs under ``RAYTPU_KNOB_MATRIX=full``.
Knobs here are integrator-level (traversal-tier independent); the tier
cross-checks live in test_mega/test_pallas/bench --selftest.
"""

import dataclasses
import itertools
import os

import jax.numpy as jnp
import numpy as np
import pytest

from raytpu import MaterialType, ObjectConfig, RenderConfig, load_scene
from raytpu.integrator import render_frame
from raytpu.render import Renderer

# each knob combination is its own jit executable (~25-90 s CPU compile):
# the file dominates the full suite's runtime, so it lives in the slow
# tier — `pytest -m "not slow"` skips it (documented in CLAUDE.md)
pytestmark = pytest.mark.slow

RES = "/root/reference/resources"


@pytest.fixture(scope="module")
def base():
    cfg = RenderConfig(
        objects=(
            ObjectConfig(f"{RES}/cube.obj", MaterialType.MIRROR, "spin"),
            ObjectConfig(f"{RES}/cube.obj", MaterialType.DIFFUSE,
                         "static"),
        ),
        skybox_dir=f"{RES}/skybox_texture_test",
        width=32, height=32, samples_per_pixel=2, max_bounce_count=2,
        traversal="xla",
    )
    scene = load_scene(cfg)
    rr = Renderer(scene)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    ref = np.asarray(
        render_frame(rr.device_scene, rr.static, rr.render_static, cam)
    )
    return rr, cam, ref


# one-axis-at-a-time: every live knob's non-default values, plus two
# interaction combos (the compaction+sort pair and the everything-on case)
OAT = (
    [{"divergence": d} for d in ("split", "split_all", "sort")]
    + [{"wavefront": "full"}]
    + [{"sky_rebin": "on"}]
    + [{"bounce_unroll": True}]
    + [{"shadow_order": "origin"}]  # non-default since round 4 (the TPU
    # mega/perlane entry orders are covered by the on-chip identity gate;
    # this pins the knob's plumbing on the CPU tiers)
    + [
        {"divergence": "sort", "wavefront": "full"},
        {"divergence": "split", "wavefront": "full", "sky_rebin": "on",
         "bounce_unroll": True},
    ]
)

if os.environ.get("RAYTPU_KNOB_MATRIX") == "full":
    OAT = [
        dict(zip(("divergence", "wavefront", "sky_rebin", "bounce_unroll"),
                 k))
        for k in itertools.product(
            ("off", "split", "split_all", "sort"),
            ("full", "compact"),
            ("auto", "on"),
            (False, True),
        )
    ]


@pytest.mark.parametrize(
    "knobs", OAT,
    ids=["-".join(f"{k}={v}" for k, v in kn.items()) for kn in OAT],
)
def test_knob_combo_matches_default(base, knobs):
    rr, cam, ref = base
    rs = dataclasses.replace(rr.render_static, **knobs)
    img = np.asarray(render_frame(rr.device_scene, rr.static, rs, cam))
    if knobs.get("bounce_unroll") and knobs.get("wavefront") == "full":
        # the engaged unroll knob (it only engages without packet
        # compaction) carries a DOCUMENTED 1-ulp drift: XLA contracts
        # FMAs differently inside a while-loop body computation than in
        # the same ops inlined (integrator.py); rot still fails this
        np.testing.assert_allclose(img, ref, atol=1.5e-8)
    else:
        np.testing.assert_array_equal(img, ref)
