"""Scene presets: the reference default + the five BASELINE benchmark configs.

BASELINE.json / BASELINE.md define the benchmark matrix; each preset returns
a fully-specified :class:`RenderConfig` (and loads stand-in assets where the
reference blob is missing).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

from raytpu.config import MaterialType, ObjectConfig, RenderConfig
from raytpu.io.obj import Mesh, load_obj
from raytpu.scene import Scene, load_scene

REFERENCE_RESOURCES = "/root/reference/resources"


def _res(resource_dir: Optional[str]) -> str:
    return resource_dir or REFERENCE_RESOURCES


def config1_cube(resource_dir: Optional[str] = None) -> RenderConfig:
    """BASELINE config 1: cube.obj, primary rays + hard shadows, static
    camera, 512×512 (CPU-checkable golden)."""
    r = _res(resource_dir)
    return RenderConfig(
        objects=(ObjectConfig(f"{r}/cube.obj", MaterialType.DIFFUSE, "static"),),
        skybox_dir=None,
        width=512,
        height=512,
        samples_per_pixel=1,
        max_bounce_count=0,  # primary + shadow only
    )


def config2_teapot_mirror(resource_dir: Optional[str] = None) -> RenderConfig:
    """BASELINE config 2: teapot mirror + sea skybox, 2-bounce, 800×600."""
    r = _res(resource_dir)
    return RenderConfig(
        objects=(ObjectConfig(f"{r}/teapot.obj", MaterialType.MIRROR, "static"),),
        skybox_dir=f"{r}/skybox_texture_sea",
        width=800,
        height=600,
        samples_per_pixel=4,
        max_bounce_count=2,
    )


def config3_refract(resource_dir: Optional[str] = None) -> RenderConfig:
    """BASELINE config 3: cube_scene.obj refractive glass (Snell + TIR),
    3-bounce, 1280×720."""
    r = _res(resource_dir)
    return RenderConfig(
        objects=(
            ObjectConfig(f"{r}/cube_scene.obj", MaterialType.REFRACTIVE, "static"),
        ),
        skybox_dir=f"{r}/skybox_texture_sea",
        width=1280,
        height=720,
        samples_per_pixel=4,
        max_bounce_count=3,
    )


def config4_highpoly(resource_dir: Optional[str] = None) -> RenderConfig:
    """BASELINE config 4: armadillo-class high-poly mesh — BVH build quality
    + divergent traversal stress, 3-bounce, 1920×1080.

    ``armadillo.obj`` is a missing blob; the generated stand-in is used
    (``raytpu/io/genmesh.py``). The mirror teapot stays as the center mesh
    like the reference default (``include/config.h:6-16``)."""
    r = _res(resource_dir)
    return RenderConfig(
        objects=(
            ObjectConfig(f"{r}/teapot.obj", MaterialType.MIRROR, "spin"),
            ObjectConfig("generated://armadillo", MaterialType.DIFFUSE, "orbit"),
        ),
        skybox_dir=f"{r}/skybox_texture_sea",
        width=1920,
        height=1080,
        samples_per_pixel=4,
        max_bounce_count=3,
    )


def config5_flythrough(resource_dir: Optional[str] = None) -> RenderConfig:
    """BASELINE config 5: interactive flythrough — mixed reflect/refract
    scene, per-frame re-trace, 60 FPS target, 1920×1080."""
    r = _res(resource_dir)
    return RenderConfig(
        objects=(
            ObjectConfig(f"{r}/teapot.obj", MaterialType.MIRROR, "spin"),
            ObjectConfig(f"{r}/cube.obj", MaterialType.REFRACTIVE, "orbit"),
        ),
        skybox_dir=f"{r}/skybox_texture_sea",
        width=1920,
        height=1080,
        samples_per_pixel=1,
        max_bounce_count=3,
        # chunk_tris was pinned to 2048 in the leaf_size-4 era (fine
        # chunks shortened the divergent spp=1 bounce walks: 36.6 -> 34.1
        # same-session, tools/r4_finechunk). At leaf_size 7 the optimum
        # flipped back to unchunked small meshes (tools/r7_c5chunk, same
        # session: 1024 -> 17.67, 2048 -> 17.50, >=3072 i.e. one chunk
        # per mesh -> 17.19 ms), so the pin is gone.
    )


PRESETS = {
    "config1": config1_cube,
    "config2": config2_teapot_mirror,
    "config3": config3_refract,
    "config4": config4_highpoly,
    "config5": config5_flythrough,
    "reference": None,  # filled below
}


def reference_scene(resource_dir: Optional[str] = None) -> RenderConfig:
    """The reference's shipped compile-time default (``include/config.h``):
    mirror teapot center + diffuse armadillo(-standin) orbiting, sea skybox,
    800×600, 4 spp, 63 bounces."""
    r = _res(resource_dir)
    return RenderConfig(
        objects=(
            ObjectConfig(f"{r}/teapot.obj", MaterialType.MIRROR, "spin"),
            ObjectConfig("generated://armadillo", MaterialType.DIFFUSE, "orbit"),
        ),
        skybox_dir=f"{r}/skybox_texture_sea",
        width=800,
        height=600,
        samples_per_pixel=4,
        max_bounce_count=63,
    )


PRESETS["reference"] = reference_scene


def load_preset_scene(name_or_config, highpoly_depth: int = 7) -> Scene:
    """Resolve a preset name (or a RenderConfig) into a loaded Scene,
    materializing ``generated://`` meshes."""
    if isinstance(name_or_config, str):
        if name_or_config not in PRESETS:
            raise KeyError(
                f"unknown preset {name_or_config!r}; available: {sorted(PRESETS)}"
            )
        config = PRESETS[name_or_config]()
    else:
        config = name_or_config

    meshes: List[Mesh] = []
    for obj in config.objects:
        if obj.path.startswith("generated://"):
            from raytpu.io.genmesh import armadillo_standin

            meshes.append(armadillo_standin(depth=highpoly_depth))
        else:
            meshes.append(load_obj(obj.path))
    return load_scene(config, meshes=meshes)
