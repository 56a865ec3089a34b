"""Benchmark-harness guard rails (VERDICT r4 items 1-2).

Round 4's driver artifact recorded a physically impossible 0.21 ms
full-frame row (implying ~9,100 Mrays/s — 18x the north star) with no
flag, and four presets starved by one cold compile all said only "budget
exhausted". These tests pin the harness behaviors that make that
recurrence impossible: the plausibility guard, the completeness check,
and the per-preset budget admission.
"""

import jax.numpy as jnp
import numpy as np

from raytpu.bench import (
    PLAUSIBLE_MRAYS,
    _plausibility_guard,
    matrix_complete,
    run_matrix,
)


def _fake_frame():
    # stands in for a jitted frame: something with block_until_ready
    return jnp.zeros((4, 4, 3), jnp.float32)


def test_plausibility_guard_flags_impossible_rows():
    # 1920x1080x4spp at 0.21 ms implies ~39,500 Mrays/s of primary rays
    # alone — the guard must re-measure unpipelined and flag the row
    out = {
        "width": 1920, "height": 1080, "spp": 4,
        "frame_ms": 0.21, "fps": 4761.9, "mrays_per_s": None,
    }
    _plausibility_guard(out, _fake_frame, frames=8)
    assert out["suspect"] is True
    assert out["suspect_pipelined_ms"] == 0.21
    assert out["suspect_implied_mrays"] > PLAUSIBLE_MRAYS
    # the recorded frame time is the unpipelined re-measure (nonzero wall
    # time of real calls), and fps is derived from it
    assert out["frame_ms"] > 0
    np.testing.assert_allclose(out["fps"], 1e3 / out["frame_ms"])


def test_plausibility_guard_leaves_sane_rows_alone():
    out = {
        "width": 1920, "height": 1080, "spp": 4,
        "frame_ms": 81.0, "fps": 12.3, "mrays_per_s": 108.4,
        "rays_per_frame": 8769529,
    }
    before = dict(out)
    _plausibility_guard(out, _fake_frame, frames=8)
    assert out == before  # untouched, no suspect key


def test_plausibility_guard_rescales_mrays():
    out = {
        "width": 800, "height": 600, "spp": 4,
        "frame_ms": 0.2, "fps": 5000.0,
        "mrays_per_s": 9000.0, "rays_per_frame": 1800000,
    }
    _plausibility_guard(out, _fake_frame, frames=8)
    assert out["suspect"] is True
    np.testing.assert_allclose(
        out["mrays_per_s"], out["rays_per_frame"] / out["frame_ms"] / 1e3
    )


def test_matrix_complete():
    ok_row = {"frame_ms": 10.0, "fps": 100.0}
    configs = {f"c{i}": dict(ok_row) for i in range(5)}
    assert matrix_complete(configs, need=5)
    configs["c4"] = {"skipped": "budget exhausted (10s)"}
    assert not matrix_complete(configs, need=5)
    configs["c4"] = {"error": "RuntimeError('x')"}
    assert not matrix_complete(configs, need=5)
    # a suspect row does not count as numeric coverage
    configs["c4"] = {**ok_row, "suspect": True}
    assert not matrix_complete(configs, need=5)
    assert matrix_complete(configs, need=4)


def test_run_matrix_budget_admission():
    """With a zero budget every preset is skipped WITH a reason — and no
    renderer is ever built (instant)."""
    out = run_matrix(presets=("config1", "config2"), budget_s=0.0,
                     renderers={})
    assert set(out) == {"config1", "config2"}
    for row in out.values():
        assert "skipped" in row
