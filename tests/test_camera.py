"""Camera math tests (reference semantics: src/camera.cpp:8-143)."""

import math

import numpy as np
import pytest

from raytpu.camera import Camera, MoveDirection, PITCH_LIMIT


def test_default_pose_matches_reference():
    # include/camera.h:25 + src/camera.cpp:8-14: pos (0,0,20), yaw=-pi/2.
    cam = Camera()
    np.testing.assert_allclose(cam.position, [0, 0, 20])
    np.testing.assert_allclose(cam.front, [0, 0, -1], atol=1e-12)
    np.testing.assert_allclose(cam.right, [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-12)


def test_basis_orthonormal_after_arbitrary_look():
    cam = Camera()
    cam.process_mouse_movement(0.73, -0.41)
    for v in (cam.front, cam.right, cam.up):
        assert abs(np.linalg.norm(v) - 1) < 1e-9
    assert abs(np.dot(cam.front, cam.right)) < 1e-9
    assert abs(np.dot(cam.front, cam.up)) < 1e-9
    assert abs(np.dot(cam.right, cam.up)) < 1e-9
    # right has no Y component by construction (src/camera.cpp:23)
    assert cam.right[1] == 0.0


def test_update_vectors_formula():
    # front = (cos(yaw)cos(pitch), sin(pitch), sin(yaw)cos(pitch))
    cam = Camera()
    cam.yaw, cam.pitch = 0.3, 0.2
    cam._update_vectors()
    cp = math.cos(0.2)
    np.testing.assert_allclose(
        cam.front, [math.cos(0.3) * cp, math.sin(0.2), math.sin(0.3) * cp]
    )


def test_pitch_clamped():
    cam = Camera()
    cam.process_mouse_movement(0.0, 10.0)
    assert cam.pitch == PITCH_LIMIT
    cam.process_mouse_movement(0.0, -30.0)
    assert cam.pitch == -PITCH_LIMIT


def test_move_all_directions():
    cam = Camera()
    cam.move(MoveDirection.FORWARD, 2.0)
    np.testing.assert_allclose(cam.position, [0, 0, 18], atol=1e-12)
    cam.move(MoveDirection.BACKWARD, 2.0)
    cam.move(MoveDirection.RIGHT, 3.0)
    np.testing.assert_allclose(cam.position, [3, 0, 20], atol=1e-12)
    cam.move(MoveDirection.LEFT, 3.0)
    cam.move(MoveDirection.UP, 1.5)
    np.testing.assert_allclose(cam.position, [0, 1.5, 20], atol=1e-12)
    cam.move(MoveDirection.DOWN, 1.5)
    np.testing.assert_allclose(cam.position, [0, 0, 20], atol=1e-12)


def test_look_presets():
    # src/camera.cpp:108-143
    cam = Camera()
    cam.look(MoveDirection.UP)
    np.testing.assert_allclose(cam.front, [0, 1, 0])
    np.testing.assert_allclose(cam.up, [0, 0, 1])
    np.testing.assert_allclose(cam.right, [1, 0, 0])
    cam.look(MoveDirection.BACKWARD)
    np.testing.assert_allclose(cam.front, [0, 0, 1])
    np.testing.assert_allclose(cam.right, [-1, 0, 0])


def test_basis_pack_layout():
    cam = Camera((1, 2, 3))
    b = cam.basis()
    assert b.shape == (4, 3) and b.dtype == np.float32
    np.testing.assert_allclose(b[0], [1, 2, 3])
    np.testing.assert_allclose(b[1], cam.right.astype(np.float32))
    np.testing.assert_allclose(b[2], cam.up.astype(np.float32))
    np.testing.assert_allclose(b[3], cam.front.astype(np.float32))


def test_view_matrix_places_target_on_minus_z():
    cam = Camera((0, 0, 20))
    m = cam.view_matrix()
    p = m @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, -20], atol=1e-12)


def test_camera_checkpoint_roundtrip(tmp_path):
    cam = Camera((1, 2, 3))
    cam.process_mouse_movement(0.4, -0.2)
    p = str(tmp_path / "cam.json")
    cam.save(p)
    back = Camera.load(p)
    np.testing.assert_allclose(back.position, cam.position)
    np.testing.assert_allclose(back.front, cam.front)
    np.testing.assert_allclose(back.basis(), cam.basis())
