"""SSIM fidelity harness over the BASELINE configs (SURVEY.md §4/§6).

The BASELINE fidelity metric: "pixel output matches the Vulkan reference
semantics within SSIM tolerance". The independent scalar oracle
(``tests/oracle.py``) plays the reference's role at CPU-checkable sizes;
``raytpu.utils.ssim`` is the comparison harness.
"""

import numpy as np
import pytest

from raytpu.config import MaterialType, ObjectConfig
from raytpu.utils import ssim

from tests import oracle
from tests.test_integrator import _camera_tuple, _scene_and_oracle


@pytest.mark.parametrize(
    "materials,bounces",
    [
        ((MaterialType.DIFFUSE,), 0),                       # config1 class
        ((MaterialType.MIRROR,), 2),                        # config2 class
        ((MaterialType.REFRACTIVE,), 3),                    # config3 class
        ((MaterialType.MIRROR, MaterialType.DIFFUSE), 3),   # config4/5 class
    ],
)
def test_ssim_vs_oracle(resources_dir, materials, bounces):
    objs = [
        ObjectConfig(f"{resources_dir}/cube.obj", m,
                     "orbit" if i else "static")
        for i, m in enumerate(materials)
    ]
    renderer, osc, cfg = _scene_and_oracle(
        resources_dir, objs, spp=1, max_bounces=bounces, size=32
    )
    img = renderer.render_np()
    ref = oracle.render(osc, _camera_tuple(renderer), 32, 32, 1, bounces)
    s = ssim(img, np.asarray(ref, np.float32), win=8)
    assert s > 0.98, f"SSIM {s:.4f} below tolerance for {materials}"


def test_ssim_detects_wrong_semantics(resources_dir):
    """Sanity: the harness actually fails when semantics change (light moved)."""
    objs = [ObjectConfig(f"{resources_dir}/cube.obj", MaterialType.DIFFUSE, "static")]
    renderer, osc, cfg = _scene_and_oracle(
        resources_dir, objs, spp=1, max_bounces=0, size=32
    )
    img = renderer.render_np()
    ref_ok = oracle.render(osc, _camera_tuple(renderer), 32, 32, 1, 0)
    s_ok = ssim(img, np.asarray(ref_ok, np.float32), win=8)
    osc.light_pos = np.array([-5.0, -5.0, 5.0])  # wrong light
    osc.light_intensity = 3.0                    # wrong intensity
    ref_bad = oracle.render(osc, _camera_tuple(renderer), 32, 32, 1, 0)
    s_bad = ssim(img, np.asarray(ref_bad, np.float32), win=8)
    assert s_bad < s_ok, (s_bad, s_ok)
