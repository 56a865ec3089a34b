"""Frontend + preset + utils tests."""

import os

import numpy as np
import pytest

from raytpu.config import MaterialType, ObjectConfig, RenderConfig
from raytpu.presets import PRESETS, load_preset_scene
from raytpu.utils import FpsCounter, ssim, psnr, mrays_per_sec


def _tiny_cfg(resources_dir, **kw):
    base = dict(
        objects=(
            ObjectConfig(f"{resources_dir}/cube.obj", MaterialType.MIRROR, "spin"),
            ObjectConfig(f"{resources_dir}/cube.obj", MaterialType.DIFFUSE, "orbit"),
        ),
        width=24,
        height=16,
        samples_per_pixel=1,
        max_bounce_count=2,
    )
    base.update(kw)
    return RenderConfig(**base)


def test_all_presets_materialize():
    for name, fn in PRESETS.items():
        cfg = fn()
        assert cfg.width > 0 and cfg.height > 0
        assert len(cfg.objects) >= 1


def test_load_preset_scene_generated_mesh():
    scene = load_preset_scene("config4", highpoly_depth=3)  # tiny standin
    assert scene.meshes[1].num_triangles == 20 * 4**3
    assert scene.geometry.num_meshes == 2


def test_flythrough_deterministic(resources_dir):
    from raytpu.frontend.flythrough import Flythrough, ScriptSegment
    from raytpu.scene import load_scene

    cfg = _tiny_cfg(resources_dir)
    script = [ScriptSegment(0.1, "w", mouse_dx=50.0)]

    def run():
        scene = load_preset_scene(cfg)
        fly = Flythrough(scene, script=script, fps=30)
        return [img for _, img in fly.frames()]

    a, b = run(), run()
    assert len(a) == 3  # 0.1s at 30fps
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_flythrough_camera_actually_moves(resources_dir):
    from raytpu.frontend.flythrough import Flythrough, ScriptSegment

    cfg = _tiny_cfg(resources_dir)
    scene = load_preset_scene(cfg)
    fly = Flythrough(scene, script=[ScriptSegment(0.5, "w")], fps=30)
    start = fly.renderer.camera.position.copy()
    for _ in fly.frames():
        pass
    moved = np.linalg.norm(fly.renderer.camera.position - start)
    # 0.5s * timeParam-scale 0.1 * speed 50 = 2.5 units
    assert abs(moved - 2.5) < 0.1


def test_render_still_writes_file(tmp_path, resources_dir):
    from raytpu.frontend.headless import render_still

    out = str(tmp_path / "x.png")
    img = render_still(_tiny_cfg(resources_dir), out)
    assert os.path.exists(out)
    assert img.shape == (16, 24, 3)


def test_cli_render(tmp_path, resources_dir):
    from raytpu.cli import main

    out = str(tmp_path / "cli.png")
    rc = main(
        [
            "render",
            "--mesh", f"{resources_dir}/cube.obj:mirror:spin",
            "--width", "16", "--height", "12",
            "--samples-per-pixel", "1", "--max-bounce-count", "1",
            "-o", out,
        ]
    )
    assert rc == 0 and os.path.exists(out)


def test_cli_rejects_bad_material(resources_dir):
    from raytpu.cli import main

    with pytest.raises(SystemExit):
        main(["render", "--mesh", f"{resources_dir}/cube.obj:shiny", "-o", "x.png"])


def test_ssim_identity_and_sensitivity(rng):
    a = rng.uniform(0, 1, (64, 64, 3))
    assert ssim(a, a) == pytest.approx(1.0)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    s = ssim(a, b)
    assert 0.0 < s < 0.99
    assert psnr(a, a) == float("inf")


def test_fps_counter_window(monkeypatch):
    times = iter([0.0, 0.3, 0.6, 1.2])
    import raytpu.utils.timing as timing

    monkeypatch.setattr(timing.time, "perf_counter", lambda: next(times))
    printed = []
    c = FpsCounter(print_fn=printed.append)
    assert c.frame() is None  # t=0.0 opens the window
    assert c.frame() is None  # t=0.3
    assert c.frame() is None  # t=0.6
    fps = c.frame()           # t=1.2 closes the 1s window
    assert fps is not None and printed  # 4 frames in 1.2s
    assert fps == pytest.approx(4 / 1.2)


def test_mrays():
    assert mrays_per_sec(2_000_000, 2.0) == pytest.approx(1.0)


def test_graft_entry_small():
    import importlib.util, sys

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = fn(*args)
    assert out.shape == (48, 64, 3)
    mod.dryrun_multichip(4)


def test_validation_mode(resources_dir):
    """config.validation=True: scene checks at load + frame checks at render
    (the Vulkan validation-layer analog)."""
    from raytpu.render import Renderer
    from raytpu.scene import load_scene

    cfg = _tiny_cfg(resources_dir, validation=True)
    r = Renderer(load_scene(cfg))
    img = r.step(0.0)  # must pass checks silently
    assert np.isfinite(img).all()

    # corrupt the scene -> fail fast with a clear error
    from raytpu.utils.log import RaytpuError
    from raytpu.utils.validation import check_scene

    bad = r.device_scene._replace(
        light_pos=r.device_scene.light_pos * np.nan
    )
    with pytest.raises(RaytpuError, match="light_pos"):
        check_scene(bad, r.static)

    from raytpu.utils.validation import check_frame

    with pytest.raises(RaytpuError, match="non-finite"):
        check_frame(np.full((4, 4, 3), np.nan))


def test_mouse_look_offsets_reference_convention():
    """src/main.cpp:2863-2877: mouseDifference = previous - current; camera
    gets (-mouseDifferenceX, mouseDifferenceY) * sensitivity. Dragging
    right (+dx) must yaw right (+xoffset); dragging down (+dy) must pitch
    DOWN (negative yoffset)."""
    from raytpu.frontend.interactive import mouse_look_offsets

    sens = 0.25
    xo, yo = mouse_look_offsets(8.0, 0.0, sens)     # drag right
    assert xo == 8.0 * sens and yo == 0.0
    xo, yo = mouse_look_offsets(0.0, 6.0, sens)     # drag down
    assert xo == 0.0 and yo == -6.0 * sens
    # applied to the camera: pitch decreases on a downward drag
    from raytpu.camera import Camera

    cam = Camera()
    p0 = cam.pitch
    cam.process_mouse_movement(*mouse_look_offsets(0.0, 10.0, sens))
    assert cam.pitch < p0


def test_held_keys_chords():
    """HeldKeys keeps recent keycodes active so OS key-repeat alternating
    between held keys yields chords (reference key-state array analog,
    src/main.cpp:28,83-93)."""
    from raytpu.frontend.interactive import HeldKeys

    hk = HeldKeys(hold_frames=3)
    w, d = ord("w"), ord("d")
    assert hk.poll(w) == {w}
    assert hk.poll(d) == {w, d}       # both held
    assert hk.poll(-1) == {w, d}      # no event: still held
    assert hk.poll(-1) == {d}         # w expires first, d outlives it
    assert hk.poll(-1) == set()       # all expired


def test_measure_frame_pipelined(monkeypatch):
    """measure_frame must enqueue all iterations before blocking (device
    throughput), and pipelined=False must block every call."""
    import raytpu.utils.timing as timing

    calls = {"fn": 0, "block": 0}

    class Out:
        def block_until_ready(self):
            calls["block"] += 1
            return self

    def fn():
        calls["fn"] += 1
        return Out()

    mean, times = timing.measure_frame(fn, warmup=1, iters=5)
    assert calls["fn"] == 6                 # 1 warmup + 5 timed
    assert calls["block"] == 2              # warmup + one final barrier
    assert mean >= 0 and len(times) == 1

    calls["fn"] = calls["block"] = 0
    mean, times = timing.measure_frame(fn, warmup=1, iters=3,
                                       pipelined=False)
    assert calls["fn"] == 4 and calls["block"] == 4
    assert len(times) == 3
