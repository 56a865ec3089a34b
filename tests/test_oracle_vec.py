"""The vectorized oracle must reproduce the scalar oracle exactly.

``tests/oracle.py`` is the authoritative transcription of the reference
shader semantics; ``tests/oracle_vec.py`` scales it to golden-image sizes.
This test pins the two to each other at a size the scalar oracle can still
handle, across every material class, so the vectorized rewrite cannot
silently drift.
"""

import numpy as np
import pytest

from raytpu.config import MaterialType, ObjectConfig

from tests import oracle, oracle_vec
from tests.test_integrator import _camera_tuple, _scene_and_oracle


def _vec_scene(osc):
    """VecScene sharing the scalar oracle's instance dicts + a batched
    wrapper of its skybox function."""
    scalar_fn = osc.skybox_fn

    def batched(dirs):
        return np.stack([scalar_fn(d) for d in np.asarray(dirs)])

    return oracle_vec.VecScene(
        osc.instances, osc.light_pos, osc.light_intensity, batched
    )


@pytest.mark.parametrize(
    "materials,bounces,spp",
    [
        ((MaterialType.DIFFUSE,), 0, 1),
        ((MaterialType.MIRROR,), 2, 1),
        ((MaterialType.REFRACTIVE,), 3, 1),
        ((MaterialType.MIRROR, MaterialType.DIFFUSE), 3, 2),
    ],
)
def test_vec_oracle_matches_scalar(resources_dir, materials, bounces, spp):
    objs = [
        ObjectConfig(f"{resources_dir}/cube.obj", m,
                     "orbit" if i else "static")
        for i, m in enumerate(materials)
    ]
    renderer, osc, cfg = _scene_and_oracle(
        resources_dir, objs, spp=spp, max_bounces=bounces, size=24
    )
    cam = _camera_tuple(renderer)
    ref = np.asarray(oracle.render(osc, cam, 24, 24, spp, bounces))
    vec = oracle_vec.render(_vec_scene(osc), cam, 24, 24, spp, bounces)
    np.testing.assert_allclose(vec, ref, rtol=1e-9, atol=1e-9)


def test_vec_oracle_batch_invariance(resources_dir):
    """Splitting the ray stream into batches must not change output."""
    objs = [ObjectConfig(f"{resources_dir}/cube.obj",
                         MaterialType.REFRACTIVE, "static")]
    renderer, osc, cfg = _scene_and_oracle(
        resources_dir, objs, spp=1, max_bounces=3, size=16
    )
    cam = _camera_tuple(renderer)
    vs = _vec_scene(osc)
    a = oracle_vec.render(vs, cam, 16, 16, 1, 3, ray_batch=256)
    b = oracle_vec.render(vs, cam, 16, 16, 1, 3, ray_batch=37)
    np.testing.assert_array_equal(a, b)
