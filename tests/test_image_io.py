"""Image I/O round-trip + skybox loading tests (C13/C21 analogs)."""

import numpy as np
import pytest

from raytpu.io.image import (
    SKYBOX_FACE_FILES,
    constant_skybox,
    load_skybox,
    read_png,
    write_png,
    write_ppm,
)


def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_accepts_float(tmp_path):
    img = np.linspace(0, 1, 12, dtype=np.float32).reshape(2, 2, 3)
    p = str(tmp_path / "f.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(
        back, (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    )


def test_ppm_write(tmp_path):
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    p = str(tmp_path / "x.ppm")
    write_ppm(p, img)
    blob = open(p, "rb").read()
    assert blob.startswith(b"P6\n3 2\n255\n")
    assert blob[-18:-15] == b"\xff\x00\x00"[:3] or blob[11:14] == b"\xff\x00\x00"


def test_constant_skybox_shape():
    sky = constant_skybox((0.25, 0.5, 0.75), size=8)
    assert sky.shape == (6, 8, 8, 3)
    np.testing.assert_allclose(sky[3, 4, 4], [0.25, 0.5, 0.75])


def test_load_reference_skybox(resources_dir):
    sky = load_skybox(f"{resources_dir}/skybox_texture_sea")
    assert sky.shape == (6, 2048, 2048, 3)
    assert sky.dtype == np.float32
    assert 0.0 <= sky.min() and sky.max() <= 1.0
    assert len(SKYBOX_FACE_FILES) == 6
