from raytpu.io.obj import Mesh, load_obj, load_obj_numpy, compute_smooth_normals
from raytpu.io.image import (
    load_skybox,
    constant_skybox,
    read_image,
    write_image,
    write_png,
    write_ppm,
)

__all__ = [
    "Mesh",
    "load_obj",
    "load_obj_numpy",
    "compute_smooth_normals",
    "load_skybox",
    "constant_skybox",
    "read_image",
    "write_image",
    "write_png",
    "write_ppm",
]
