"""Scene assembly + animation tests (src/main.cpp:1805-1825,2836-2844)."""

import math

import numpy as np

from raytpu.config import MaterialType, ObjectConfig, RenderConfig
from raytpu.io.obj import Mesh
from raytpu.scene import (
    AnimationState,
    Instance,
    invert_affine,
    load_scene,
    mat_identity,
    mat_rotate_y,
    mat_translate,
)


def _unit_tri(name="t"):
    return Mesh(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.array([[0, 0, 1]] * 3, np.float32),
        triangles=np.array([[0, 1, 2]], np.int32),
        name=name,
    )


def test_initial_transforms_match_reference():
    # src/main.cpp:1805-1807: identity for center, T(0,0,5) for orbiting.
    cfg = RenderConfig(
        objects=(
            ObjectConfig("a.obj", MaterialType.MIRROR, "spin"),
            ObjectConfig("b.obj", MaterialType.DIFFUSE, "orbit"),
        )
    )
    scene = load_scene(cfg, meshes=[_unit_tri("a"), _unit_tri("b")])
    np.testing.assert_allclose(scene.instances[0].transform, np.eye(4))
    np.testing.assert_allclose(
        scene.instances[1].transform, mat_translate((0, 0, 5))
    )
    np.testing.assert_array_equal(scene.material_types, [1, 0])


def test_orbit_is_pure_function_of_time():
    inst = Instance(0, MaterialType.DIFFUSE, "orbit", mat_translate((0, 0, 5)))
    anim = AnimationState([inst])
    t = 0.37
    expected = (
        mat_translate((0, 0, -5)) @ mat_rotate_y(t * math.pi) @ mat_translate((0, 0, 10))
    )
    got = anim.step(t)
    np.testing.assert_allclose(got[0], expected[:3, :4], atol=1e-6)
    # orbit radius 10 about (0,0,-5): check the instance origin
    origin = got[0] @ np.array([0, 0, 0, 1.0])
    center = np.array([0, 0, -5.0])
    assert abs(np.linalg.norm(origin - center) - 10.0) < 1e-5
    # t=0 reproduces the initial pose T(0,0,5)
    anim2 = AnimationState([inst])
    got0 = anim2.step(0.0)
    np.testing.assert_allclose(got0[0], mat_translate((0, 0, 5))[:3, :4], atol=1e-7)


def test_spin_accumulates_per_frame():
    inst = Instance(0, MaterialType.MIRROR, "spin", mat_identity())
    anim = AnimationState([inst])
    t = 100.0
    anim.step(t)
    anim.step(t)
    expected = mat_rotate_y(t * math.pi * 1e-4) @ mat_rotate_y(t * math.pi * 1e-4)
    np.testing.assert_allclose(anim.matrices[0], expected, atol=1e-9)


def test_invert_affine_roundtrip():
    m = mat_translate((1, 2, 3)) @ mat_rotate_y(0.7)
    inv = invert_affine(m)
    m4 = np.eye(4)
    m4[:3] = inv
    np.testing.assert_allclose(m4 @ m, np.eye(4), atol=1e-12)


def test_inverse_transforms_shape():
    insts = [
        Instance(0, MaterialType.DIFFUSE, "static", mat_rotate_y(0.5)),
        Instance(1, MaterialType.MIRROR, "static", mat_translate((3, 0, 0))),
    ]
    anim = AnimationState(insts)
    fwd = anim.transforms_3x4()
    inv = anim.inverse_transforms_3x4()
    assert fwd.shape == (2, 3, 4) and inv.shape == (2, 3, 4)
    p = np.array([1.0, 1.0, 1.0])
    world = fwd[1] @ np.append(p, 1.0)
    back = inv[1] @ np.append(world, 1.0)
    np.testing.assert_allclose(back, p, atol=1e-6)
