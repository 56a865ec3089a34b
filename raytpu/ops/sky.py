"""Cubemap skybox sampling.

TPU-native replacement for ``texture(samplerCube, dir)`` — the reference
binds a 6-layer cube image with a LINEAR, CLAMP_TO_EDGE sampler
(``src/main.cpp:2376-2412``) and samples it on ray miss with the direction
``(d.x, d.y, -d.z)`` (``src/shader.rgen:92``; the z-flip is applied by the
*caller*, i.e. the integrator, to keep this module a faithful GL/Vulkan cube
sampler).

Face selection and (s, t) derivation follow the Vulkan/GL cube-map rules
(major-axis table), with faces indexed +X, −X, +Y, −Y, +Z, −Z — the layer
order the reference uploads (``src/main.cpp:2064-2079``). Bilinear filtering
uses half-texel centers and clamp-to-edge addressing.
"""

from __future__ import annotations

import jax.numpy as jnp


def cube_face_st(dirs: jnp.ndarray):
    """Map directions (..., 3) → (face (...,) int32, s (...,), t (...,)).

    Implements the GL cube-map major-axis table:

    ====  ========  ========
    face  sc        tc
    ====  ========  ========
    +X    -z        -y
    -X    +z        -y
    +Y    +x        +z
    -Y    +x        -z
    +Z    +x        -y
    -Z    -x        -y
    ====  ========  ========

    ``s = (sc/|ma| + 1)/2``, ``t = (tc/|ma| + 1)/2``.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    # else Z

    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-30)

    sc = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    tc = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)

    s = 0.5 * (sc / ma + 1.0)
    t = 0.5 * (tc / ma + 1.0)
    return face, s, t


def sample_cubemap(skybox: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cube-map lookup.

    ``skybox``: (6, H, W, 3) float32 in face order +X,−X,+Y,−Y,+Z,−Z;
    ``dirs``: (R, 3) directions (need not be normalized — face math is
    scale-invariant). Returns (R, 3) linear RGB.
    """
    faces, s, t = cube_face_st(dirs)
    h, w = skybox.shape[1], skybox.shape[2]

    # half-texel-centered bilinear with clamp-to-edge (sampler config
    # src/main.cpp:2393-2406)
    fx = s * w - 0.5
    fy = t * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    x0c = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1c = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1c = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    flat = skybox.reshape(-1, 3)
    base = faces * (h * w)

    def tex(yc, xc):
        return jnp.take(flat, base + yc * w + xc, axis=0)

    c00 = tex(y0c, x0c)
    c01 = tex(y0c, x1c)
    c10 = tex(y1c, x0c)
    c11 = tex(y1c, x1c)
    top = c00 * (1 - wx) + c01 * wx
    bot = c10 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy
