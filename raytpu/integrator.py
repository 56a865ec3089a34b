"""Whitted integrator: the jitted `render` step (packet-wavefront form).

TPU-native reformulation of the raygen shader (``src/shader.rgen:61-186``,
the reference's per-pixel GPU program) as a **packet wavefront** program:

* pixels are generated in **tile-major order** (16×16 tiles → packets of
  K=256 rays) so each packet is spatially coherent — the property packet
  traversal (``ops/packet.py``) converts into dense VPU work with no
  per-ray gathers;
* the reference's per-thread sample loop (``:70``) becomes a
  ``lax.fori_loop`` accumulating sample waves;
* the per-thread bounce loop (``:84``) becomes a ``lax.while_loop`` over the
  whole wave with per-lane ``active`` masks — it exits as soon as every lane
  has terminated, so typical scenes pay 2–4 traversal rounds, not 64. This
  is the reference's own iterative formulation (it sets
  ``maxPipelineRayRecursionDepth = 1`` and loops in the shader,
  ``src/main.cpp:1586``) — already the TPU-friendly shape;
* material "branches" are masked elementwise math; the shadow trace is
  skipped entirely (``lax.cond``) when no lane needs it; terminated lanes
  hand traversal a ``tmax = 0`` window so packets full of dead lanes park
  at the root.

Semantic quirks reproduced (SSIM fidelity targets, SURVEY.md §7 "hard
parts"): hash-RNG pixel jitter (``:57-59,72-73``), focal length 2.5
(``:79``), NDC y-flip (``:75``), ambient init replaced (not blended) by the
skybox on miss (``:81,92``), skybox z-flip (``:92``), backface-break for
diffuse (``:104-105``), ``0.9^sample_index`` decay (``:128``), unused
distance attenuation (``:123``), ±0.01 normal offsets (``:107,136,158,164``),
tmin/tmax 0.001/10000 (``:87``), bounce loop inclusive of ``maxBounceCount``
(``:84``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raytpu.config import (
    FOCAL_LENGTH,
    HIT_EPSILON,
    RAY_TMAX,
    RAY_TMIN,
    SAMPLE_DECAY,
    RenderConfig,
)
from raytpu.device_scene import DeviceScene, SceneStatic
from raytpu.ops import shade
from raytpu.ops.sky import sample_cubemap
from raytpu.ops.trace import any_hit_wave, closest_hit_wave


@dataclasses.dataclass(frozen=True)
class RenderStatic:
    """Hashable render parameters (static under jit)."""

    width: int
    height: int
    samples_per_pixel: int
    max_bounce_count: int
    ray_chunk: int = 0     # rays per chunk (grouped whole packets); 0 = all
    tile: int = 32         # pixel tile edge; packet size K = tile² (32² =
                           # 1024 = one native (8,128) VPU register — the
                           # Pallas kernel's packet width)

    @property
    def packet_size(self) -> int:
        return self.tile * self.tile

    @classmethod
    def from_config(cls, config: RenderConfig) -> "RenderStatic":
        return cls(
            width=config.width,
            height=config.height,
            samples_per_pixel=config.samples_per_pixel,
            max_bounce_count=config.max_bounce_count,
            ray_chunk=config.ray_chunk,
        )


def hash_random(pix: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """The reference's shader-hash RNG (``src/shader.rgen:57-59``):
    ``fract(sin(dot(uv,(12.9898,78.233)) + 1113.1·seed) · 43758.5453)``.

    ``pix``: (..., 2) float32 integer pixel coords; ``seed``: scalar.
    """
    x = jnp.sum(pix * jnp.asarray([12.9898, 78.233], pix.dtype), axis=-1)
    x = jnp.sin(x + 1113.1 * seed) * 43758.5453
    return x - jnp.floor(x)


def primary_rays(
    pix: jnp.ndarray,        # (..., 2) float32 (x, y) pixel coords
    camera: jnp.ndarray,     # (4, 3): position, right, up, forward
    sample_idx: jnp.ndarray,  # scalar — the loop index i
    spp: int,
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittered primary ray generation (``src/shader.rgen:70-79``)."""
    s = sample_idx.astype(jnp.float32)
    seed0 = jnp.float32(spp) + s          # seedOffset = samples (:69)
    jx = hash_random(pix, seed0)
    jy = hash_random(pix, seed0 + 0.5)
    uv = (pix + jnp.stack([jx, jy], axis=-1)) / jnp.asarray(
        [width, height], jnp.float32
    )
    uv = (uv * 2.0 - 1.0) * jnp.asarray([1.0, -1.0], jnp.float32)  # y-flip (:75)

    position, right, up, forward = camera[0], camera[1], camera[2], camera[3]
    d = (
        uv[..., 0:1] * right
        + uv[..., 1:2] * up
        + FOCAL_LENGTH * forward
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(position, d.shape)
    return o, d


def _interpolate_normal(
    scene: DeviceScene, prim: jnp.ndarray, inst: jnp.ndarray,
    u: jnp.ndarray, v: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric normal interpolation + world transform via the
    inverse-transpose, exactly ``src/shader.rchit:66-94``.

    Shapes: prim/inst/u/v (...,) → normal (..., 3).
    """
    p = jnp.maximum(prim, 0)
    w = (1.0 - u - v)[..., None]
    n_obj = (
        w * jnp.take(scene.tri_n0, p, axis=0)
        + u[..., None] * jnp.take(scene.tri_n1, p, axis=0)
        + v[..., None] * jnp.take(scene.tri_n2, p, axis=0)
    )
    # n_world = n_obj · W2O_linear  (row-vector × matrix = inverse-transpose
    # transform; src/shader.rchit:94)
    lin = jnp.take(scene.w2o[:, :, :3], jnp.maximum(inst, 0), axis=0)  # (...,3,3)
    n_world = jnp.einsum("...i,...ij->...j", n_obj, lin)
    return n_world / jnp.maximum(
        jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-30
    )


def _trace_sample(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    o: jnp.ndarray,          # (P, K, 3)
    d: jnp.ndarray,          # (P, K, 3)
    sample_idx: jnp.ndarray,
) -> jnp.ndarray:
    """One sample wave through the bounce loop → (P, K, 3) color."""
    p, k = o.shape[0], o.shape[1]
    tmp = jnp.broadcast_to(shade.ambient_color(), (p, k, 3))  # :81
    active = jnp.ones((p, k), bool)
    decay = SAMPLE_DECAY ** sample_idx.astype(jnp.float32)  # 0.9^i quirk :128

    def cond(state):
        j, _, _, _, active = state
        return (j <= rs.max_bounce_count) & jnp.any(active)  # inclusive :84

    def body(state):
        j, o, d, tmp, active = state
        lane_tmax = jnp.where(active, jnp.float32(RAY_TMAX), 0.0)
        hit = closest_hit_wave(scene, static, o, d, RAY_TMIN, lane_tmax)
        hit_mask = active & hit.is_hit
        miss_mask = active & ~hit.is_hit

        # --- miss → skybox replaces color (:90-94), z-flipped lookup ---
        sky = sample_cubemap(
            scene.skybox, d * jnp.asarray([1.0, 1.0, -1.0], d.dtype)
        )
        tmp = jnp.where(miss_mask[..., None], sky, tmp)

        # --- hit attributes ---
        pos = o + hit.t[..., None] * d
        n = _interpolate_normal(scene, hit.prim, hit.inst, hit.u, hit.v)
        mat = jnp.take(scene.materials, jnp.maximum(hit.inst, 0), axis=0)
        is_diffuse = hit_mask & (mat == 0)
        is_mirror = hit_mask & (mat == 1)
        is_refract = hit_mask & (mat == 2)

        # --- diffuse: backface break (:104-105), shadow ray + Blinn-Phong ---
        front_face = jnp.sum(d * n, axis=-1) < 0.0
        lit_candidate = is_diffuse & front_face
        shadow_o = pos + HIT_EPSILON * n
        to_light = scene.light_pos - pos
        light_dist = jnp.linalg.norm(to_light, axis=-1)
        l = to_light / jnp.maximum(light_dist[..., None], 1e-30)

        def do_shadow(_):
            return any_hit_wave(
                scene,
                static,
                shadow_o,
                l,
                RAY_TMIN,
                jnp.where(lit_candidate, light_dist, 0.0),
            )

        occluded = jax.lax.cond(
            jnp.any(lit_candidate),
            do_shadow,
            lambda _: jnp.zeros((p, k), bool),
            operand=None,
        )
        phong = shade.blinn_phong(n, l, -d, scene.light_intensity)
        shade_mask = lit_candidate & ~occluded
        tmp = tmp + jnp.where(shade_mask[..., None], decay * phong, 0.0)

        # --- mirror / refract continuations (:132-177) ---
        o_m, d_m = shade.mirror_bounce(d, n, pos)
        o_r, d_r = shade.refract_bounce(d, n, pos)
        cont = is_mirror | is_refract
        o = jnp.where(
            cont[..., None], jnp.where(is_mirror[..., None], o_m, o_r), o
        )
        d = jnp.where(
            cont[..., None], jnp.where(is_mirror[..., None], d_m, d_r), d
        )
        return j + 1, o, d, tmp, cont

    _, _, _, tmp, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), o, d, tmp, active)
    )
    return tmp


def render_packets(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    camera: jnp.ndarray,  # (4, 3)
    pix: jnp.ndarray,     # (P, K, 2) float32 pixel coords (tile-major)
) -> jnp.ndarray:
    """Render packets of pixels → (P, K, 3) color (sample-averaged)."""

    def sample_body(i, accum):
        o, d = primary_rays(
            pix, camera, i, rs.samples_per_pixel, rs.width, rs.height
        )
        return accum + _trace_sample(scene, static, rs, o, d, i)

    accum = jax.lax.fori_loop(
        0,
        rs.samples_per_pixel,
        sample_body,
        jnp.zeros((*pix.shape[:2], 3), jnp.float32),
    )
    return accum / rs.samples_per_pixel  # :183


# kept name for API continuity: flat (R, 2) pixel batches are reshaped into
# packets of rs.packet_size (used by the sharded path, whose row slabs are
# already coherent)
def render_pixels(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    camera: jnp.ndarray,
    pix: jnp.ndarray,  # (R, 2)
) -> jnp.ndarray:
    r = pix.shape[0]
    k = min(rs.packet_size, r)
    pad = (-r) % k
    pix_p = jnp.pad(pix, ((0, pad), (0, 0)))
    colors = render_packets(
        scene, static, rs, camera, pix_p.reshape(-1, k, 2)
    )
    return colors.reshape(-1, 3)[:r]


def _tiled_pixels(rs: RenderStatic):
    """Tile-major pixel packets + flat scatter indices.

    Returns ``pix`` (P, K, 2) float32 in (x, y) and ``flat_idx`` (P, K) int32
    = ``y*W + x`` (out-of-frame padding lanes get W*H, dropped at scatter).
    Tile-major ordering is what makes packets spatially coherent.
    """
    t = rs.tile
    w_t = -(-rs.width // t)
    h_t = -(-rs.height // t)
    ty, tx = jnp.mgrid[0:h_t, 0:w_t]           # tile grid
    iy, ix = jnp.mgrid[0:t, 0:t]               # intra-tile
    xs = (tx.reshape(-1, 1) * t + ix.reshape(1, -1)).astype(jnp.int32)  # (P, K)
    ys = (ty.reshape(-1, 1) * t + iy.reshape(1, -1)).astype(jnp.int32)
    in_frame = (xs < rs.width) & (ys < rs.height)
    flat_idx = jnp.where(
        in_frame, ys * rs.width + xs, jnp.int32(rs.width * rs.height)
    )
    pix = jnp.stack(
        [jnp.minimum(xs, rs.width - 1), jnp.minimum(ys, rs.height - 1)], axis=-1
    ).astype(jnp.float32)
    return pix, flat_idx


@functools.partial(jax.jit, static_argnums=(1, 2))
def render_frame(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    camera: jnp.ndarray,
) -> jnp.ndarray:
    """Full-frame render → (H, W, 3) float32 image.

    The jitted frame step: the analog of one recorded
    ``vkCmdTraceRaysKHR(W, H, 1)`` dispatch (``src/main.cpp:2620-2624``),
    with camera and instance transforms as plain inputs so interactive
    updates never recompile.
    """
    pix, flat_idx = _tiled_pixels(rs)
    p, k = pix.shape[0], pix.shape[1]

    chunk_packets = 0
    if rs.ray_chunk:
        chunk_packets = max(1, rs.ray_chunk // rs.packet_size)
    if chunk_packets and chunk_packets < p:
        pad = (-p) % chunk_packets
        pix_p = jnp.pad(pix, ((0, pad), (0, 0), (0, 0)))
        groups = pix_p.reshape(-1, chunk_packets, k, 2)
        colors = jax.lax.map(
            lambda g: render_packets(scene, static, rs, camera, g), groups
        )
        colors = colors.reshape(-1, k, 3)[:p]
    else:
        colors = render_packets(scene, static, rs, camera, pix)

    img_flat = jnp.zeros((rs.width * rs.height, 3), jnp.float32)
    img_flat = img_flat.at[flat_idx.reshape(-1)].set(
        colors.reshape(-1, 3), mode="drop"
    )
    return img_flat.reshape(rs.height, rs.width, 3)
