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


def face_st(x, y, z):
    """GL cube-map major-axis table on per-component arrays.

    Maps direction components (any matching shapes) → ``(face, s, t)``:

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

    ``s = (sc/|ma| + 1)/2``, ``t = (tc/|ma| + 1)/2``. The single source of
    the face math shared by all sampler variants below.
    """
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    # else Z

    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-30)

    sc = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    tc = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)

    s = 0.5 * (sc / ma + 1.0)
    t = 0.5 * (tc / ma + 1.0)
    return face, s, t


def cube_face_st(dirs: jnp.ndarray):
    """Map directions (..., 3) → (face (...,) int32, s (...,), t (...,))."""
    return face_st(dirs[..., 0], dirs[..., 1], dirs[..., 2])


def _bilinear_coords(s, t, h: int, w: int):
    """Half-texel-centered bilinear taps with clamp-to-edge addressing
    (sampler config ``src/main.cpp:2393-2406``).

    Returns ``(x0c, x1c, y0c, y1c, wx, wy)``.
    """
    fx = s * w - 0.5
    fy = t * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0c = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1c = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1c = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    return x0c, x1c, y0c, y1c, wx, wy


def _unpack_rgb8(word):
    """uint32 (R | G<<8 | B<<16) → float RGB tuple in [0, 1]."""
    inv = jnp.float32(1.0 / 255.0)
    return (
        (word & 0xFF).astype(jnp.float32) * inv,
        ((word >> 8) & 0xFF).astype(jnp.float32) * inv,
        ((word >> 16) & 0xFF).astype(jnp.float32) * inv,
    )


def sample_cubemap_u32_nearest(skybox_u32: jnp.ndarray, h: int, w: int, dirs):
    """Single-tap lookup into a packed RGB8 cube map: ONE gather per lane.

    With ``skybox_u32_2x`` (the 2× bilinear-prefiltered map) this equals
    bilinear filtering with weights quantized to the half-texel grid — a
    quarter-texel max error — at a quarter of the gather cost.
    """
    face, s, t = face_st(*dirs)
    xc = jnp.clip(jnp.floor(s * w).astype(jnp.int32), 0, w - 1)
    yc = jnp.clip(jnp.floor(t * h).astype(jnp.int32), 0, h - 1)
    word = jnp.take(skybox_u32, face * (h * w) + yc * w + xc, axis=0)
    return _unpack_rgb8(word)


def sample_cubemap_u32(skybox_u32: jnp.ndarray, h: int, w: int, dirs):
    """Bilinear cube-map lookup from RGB8-packed-uint32 texels.

    ONE per-lane gather per bilinear tap (4 total) instead of three —
    XLA TPU gathers cost ~7ns/lane each, so halving the tap count matters
    more than anything else in the miss path. Unpacking is cheap VPU bit
    math; sources are 8-bit JPEG faces, so packing loses nothing.

    ``skybox_u32``: (6·H·W,) uint32 (R | G<<8 | B<<16); ``dirs``: Vec3.
    Returns a Vec3 of linear RGB in [0, 1].
    """
    face, s, t = face_st(*dirs)
    x0c, x1c, y0c, y1c, wx, wy = _bilinear_coords(s, t, h, w)
    base = face * (h * w)

    def tap(yc, xc):
        return _unpack_rgb8(jnp.take(skybox_u32, base + yc * w + xc, axis=0))

    c00 = tap(y0c, x0c)
    c01 = tap(y0c, x1c)
    c10 = tap(y1c, x0c)
    c11 = tap(y1c, x1c)
    out = []
    for c in range(3):
        top = c00[c] * (1 - wx) + c01[c] * wx
        bot = c10[c] * (1 - wx) + c11[c] * wx
        out.append(top * (1 - wy) + bot * wy)
    return tuple(out)


def sample_cubemap_u32_quad(skybox_quad, h: int, w: int, dirs):
    """Bilinear lookup from the per-channel QUAD-packed map — ideally ONE
    row gather per lane (interleaved layout), else one gather per channel.

    ``skybox_quad``: the quad table, accepted in FOUR layouts
    (tools/r7_skyquad_ab.py + r9_gatherprobe3.py exercise them):
    INTERLEAVED (6·H·W, 3) — the default since round 4 — one gather of a
    contiguous 3-word row per lane; a tuple of three (6·H·W,) uint32
    arrays; one (3, 6·H·W) stacked array (sliced per channel — XLA
    re-lays-out all 3×6HW words every frame); or one FLAT (3·6·H·W,)
    array indexed at ``c·6HW + idx``. Word (c, f·H·W + y·W + x) =
    ``c[y,x] | c[y,x1]<<8 | c[y1,x]<<16 | c[y1,x1]<<24`` with clamp-to-edge
    x1/y1 (built in ``device_scene.build_device_scene``). BIT-IDENTICAL to
    :func:`sample_cubemap_u32` in every layout: same texel bytes, same
    unpack constants, same weight-combine order. The gather is charged
    per INDEX, not per word (device-time probe tools/r9_gatherprobe3.py:
    three planar gathers 18.5 ms vs one interleaved row gather 5.6 ms at
    the 512-packet tier, 4.4 vs 1.4 at 128 — a 3.3x cut), so the
    interleaved row is the fast layout; the per-channel layouts are kept
    as measured A/B surfaces.
    """
    face, s, t = face_st(*dirs)
    x0c, x1c, y0c, y1c, wx, wy = _bilinear_coords(s, t, h, w)
    del x1c, y1c  # the quad word holds the HIGH-clamped +1 taps
    # LOW-edge clamp (floor lands at -1, both taps collapse onto texel 0):
    # the quad word at the clamped origin still holds texel 1 / row 1 in
    # its +1 slots, so select the collapsed taps explicitly — keeps the
    # weight-combine arithmetic identical to sample_cubemap_u32 (which
    # blends the DUPLICATED tap with the same nonzero weight there)
    x_edge = jnp.floor(s * w - 0.5) < 0.0
    y_edge = jnp.floor(t * h - 0.5) < 0.0
    idx = face * (h * w) + y0c * w + x0c
    inv = jnp.float32(1.0 / 255.0)
    is_arr = not isinstance(skybox_quad, (tuple, list))
    flat = is_arr and skybox_quad.ndim == 1
    interleaved = (is_arr and skybox_quad.ndim == 2
                   and skybox_quad.shape[1] == 3)
    rows = jnp.take(skybox_quad, idx, axis=0) if interleaved else None
    out = []
    for c in range(3):
        if interleaved:
            word = rows[..., c]
        elif flat:
            word = jnp.take(skybox_quad, c * (6 * h * w) + idx, axis=0)
        else:
            word = jnp.take(skybox_quad[c], idx, axis=0)
        c00 = (word & 0xFF).astype(jnp.float32) * inv
        c01 = ((word >> 8) & 0xFF).astype(jnp.float32) * inv
        c10 = ((word >> 16) & 0xFF).astype(jnp.float32) * inv
        c11 = ((word >> 24) & 0xFF).astype(jnp.float32) * inv
        c01 = jnp.where(x_edge, c00, c01)
        c11 = jnp.where(x_edge, c10, c11)
        c10 = jnp.where(y_edge, c00, c10)
        c11 = jnp.where(y_edge, c01, c11)
        top = c00 * (1 - wx) + c01 * wx
        bot = c10 * (1 - wx) + c11 * wx
        out.append(top * (1 - wy) + bot * wy)
    return tuple(out)


def sample_cubemap_soa(skybox_soa: jnp.ndarray, h: int, w: int, dirs):
    """Component-SoA bilinear cube-map lookup from float channel planes.

    ``skybox_soa``: (3, 6·H·W) float32 channel planes; ``dirs``: a Vec3
    (tuple of 3 same-shape arrays). Returns a Vec3 of linear RGB. Gathers
    are per-channel from contiguous 1-D planes — the layout-friendly form
    (see ops/vec3.py). Kept for full-precision comparisons; the render path
    uses the packed-u32 variants above.
    """
    face, s, t = face_st(*dirs)
    x0c, x1c, y0c, y1c, wx, wy = _bilinear_coords(s, t, h, w)
    base = face * (h * w)

    i00 = base + y0c * w + x0c
    i01 = base + y0c * w + x1c
    i10 = base + y1c * w + x0c
    i11 = base + y1c * w + x1c

    out = []
    for c in range(3):
        plane = skybox_soa[c]
        c00 = jnp.take(plane, i00, axis=0)
        c01 = jnp.take(plane, i01, axis=0)
        c10 = jnp.take(plane, i10, axis=0)
        c11 = jnp.take(plane, i11, axis=0)
        top = c00 * (1 - wx) + c01 * wx
        bot = c10 * (1 - wx) + c11 * wx
        out.append(top * (1 - wy) + bot * wy)
    return tuple(out)


def sample_cubemap(skybox: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cube-map lookup (AoS reference form, used by the oracle/tests).

    ``skybox``: (6, H, W, 3) float32 in face order +X,−X,+Y,−Y,+Z,−Z;
    ``dirs``: (R, 3) directions (need not be normalized — face math is
    scale-invariant). Returns (R, 3) linear RGB.
    """
    faces, s, t = cube_face_st(dirs)
    h, w = skybox.shape[1], skybox.shape[2]
    x0c, x1c, y0c, y1c, wx, wy = _bilinear_coords(s, t, h, w)
    wx = wx[..., None]
    wy = wy[..., None]

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
