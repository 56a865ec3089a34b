"""Whitted integrator: the jitted `render` step.

TPU-native reformulation of the raygen shader (``src/shader.rgen:61-186``,
the reference's per-pixel GPU program) as a **wavefront** program over SoA
ray batches:

* the reference's per-thread sample loop (``:70``) becomes a
  ``lax.fori_loop`` accumulating sample waves;
* the per-thread bounce loop (``:84``) becomes a ``lax.while_loop`` over the
  whole wave with an ``active`` lane mask — it exits as soon as every lane
  has terminated, so typical scenes pay 2–4 traversal rounds, not 64. This is
  exactly the reference's own iterative formulation (it sets
  ``maxPipelineRayRecursionDepth = 1`` and loops in the shader,
  ``src/main.cpp:1586``) — already the TPU-friendly shape;
* material "branches" are masked elementwise math (``jnp.where``); only
  traversal is guarded, by giving terminated lanes ``tmax = 0`` so the
  (coming) BVH rejects them at the root;
* the shadow trace is skipped entirely (``lax.cond``) when no lane needs it.

Semantic quirks reproduced bit-for-bit in intent (SSIM fidelity targets, see
SURVEY.md §7 "hard parts"): hash-RNG pixel jitter (``:57-59,72-73``), focal
length 2.5 (``:79``), NDC y-flip (``:75``), ambient init replaced (not
blended) by the skybox on miss (``:81,92``), skybox z-flip (``:92``),
backface-break for diffuse (``:104-105``), ``0.9^sample_index`` decay
(``:128``), unused distance attenuation (``:123``), ±0.01 normal offsets
(``:107,136,158,164``), tmin/tmax 0.001/10000 (``:87``), bounce loop
inclusive of ``maxBounceCount`` (``:84``).
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
from raytpu.ops.trace import any_hit, closest_hit


@dataclasses.dataclass(frozen=True)
class RenderStatic:
    """Hashable render parameters (static under jit)."""

    width: int
    height: int
    samples_per_pixel: int
    max_bounce_count: int
    ray_chunk: int = 0  # rays per traversal chunk; 0 = whole frame at once

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
    pix: jnp.ndarray,        # (R, 2) float32 (x, y) pixel coords
    camera: jnp.ndarray,     # (4, 3): position, right, up, forward
    sample_idx: jnp.ndarray,  # scalar int/float — the loop index i
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
        uv[:, 0:1] * right[None, :]
        + uv[:, 1:2] * up[None, :]
        + FOCAL_LENGTH * forward[None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(position[None, :], d.shape)
    return o, d


def _interpolate_normal(
    scene: DeviceScene, prim: jnp.ndarray, inst: jnp.ndarray,
    u: jnp.ndarray, v: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric normal interpolation + world transform via the
    inverse-transpose, exactly ``src/shader.rchit:66-94``."""
    p = jnp.maximum(prim, 0)
    w = (1.0 - u - v)[:, None]
    n_obj = (
        w * jnp.take(scene.tri_n0, p, axis=0)
        + u[:, None] * jnp.take(scene.tri_n1, p, axis=0)
        + v[:, None] * jnp.take(scene.tri_n2, p, axis=0)
    )
    # n_world = n_obj · W2O_linear  (row-vector × matrix = inverse-transpose
    # transform; src/shader.rchit:94)
    lin = jnp.take(scene.w2o[:, :, :3], jnp.maximum(inst, 0), axis=0)  # (R,3,3)
    n_world = jnp.einsum("ri,rij->rj", n_obj, lin)
    return n_world / jnp.maximum(
        jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-30
    )


def _trace_sample(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    o: jnp.ndarray,
    d: jnp.ndarray,
    sample_idx: jnp.ndarray,
) -> jnp.ndarray:
    """One sample wave through the bounce loop → (R, 3) color."""
    r = o.shape[0]
    tmp = jnp.broadcast_to(shade.ambient_color(), (r, 3))  # :81
    active = jnp.ones((r,), bool)
    decay = SAMPLE_DECAY ** sample_idx.astype(jnp.float32)  # 0.9^i quirk :128

    def cond(state):
        j, _, _, _, active = state
        return (j <= rs.max_bounce_count) & jnp.any(active)  # inclusive :84

    def body(state):
        j, o, d, tmp, active = state
        lane_tmax = jnp.where(active, jnp.float32(RAY_TMAX), 0.0)
        hit = closest_hit(scene, static, o, d, RAY_TMIN, lane_tmax)
        hit_mask = active & hit.is_hit
        miss_mask = active & ~hit.is_hit

        # --- miss → skybox replaces color (:90-94), z-flipped lookup ---
        sky = sample_cubemap(
            scene.skybox, d * jnp.asarray([1.0, 1.0, -1.0], d.dtype)
        )
        tmp = jnp.where(miss_mask[:, None], sky, tmp)

        # --- hit attributes ---
        pos = o + hit.t[:, None] * d
        n = _interpolate_normal(scene, hit.prim, hit.inst, hit.u, hit.v)
        mat = jnp.take(scene.materials, jnp.maximum(hit.inst, 0), axis=0)
        is_diffuse = hit_mask & (mat == 0)
        is_mirror = hit_mask & (mat == 1)
        is_refract = hit_mask & (mat == 2)

        # --- diffuse: backface break (:104-105), shadow ray + Blinn-Phong ---
        front_face = jnp.sum(d * n, axis=-1) < 0.0
        lit_candidate = is_diffuse & front_face
        shadow_o = pos + HIT_EPSILON * n
        to_light = scene.light_pos[None, :] - pos
        light_dist = jnp.linalg.norm(to_light, axis=-1)
        l = to_light / jnp.maximum(light_dist[:, None], 1e-30)

        def do_shadow(_):
            return any_hit(
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
            lambda _: jnp.zeros((r,), bool),
            operand=None,
        )
        phong = shade.blinn_phong(n, l, -d, scene.light_intensity)
        shade_mask = lit_candidate & ~occluded
        tmp = tmp + jnp.where(shade_mask[:, None], decay * phong, 0.0)

        # --- mirror / refract continuations (:132-177) ---
        o_m, d_m = shade.mirror_bounce(d, n, pos)
        o_r, d_r = shade.refract_bounce(d, n, pos)
        cont = is_mirror | is_refract
        o = jnp.where(
            cont[:, None], jnp.where(is_mirror[:, None], o_m, o_r), o
        )
        d = jnp.where(
            cont[:, None], jnp.where(is_mirror[:, None], d_m, d_r), d
        )
        return j + 1, o, d, tmp, cont

    _, _, _, tmp, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), o, d, tmp, active)
    )
    return tmp


def render_pixels(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    camera: jnp.ndarray,  # (4, 3)
    pix: jnp.ndarray,     # (R, 2) float32 pixel coords
) -> jnp.ndarray:
    """Render a flat batch of pixels → (R, 3) color (sample-averaged)."""

    def sample_body(i, accum):
        o, d = primary_rays(
            pix, camera, i, rs.samples_per_pixel, rs.width, rs.height
        )
        return accum + _trace_sample(scene, static, rs, o, d, i)

    accum = jax.lax.fori_loop(
        0,
        rs.samples_per_pixel,
        sample_body,
        jnp.zeros((pix.shape[0], 3), jnp.float32),
    )
    return accum / rs.samples_per_pixel  # :183


def _frame_pixels(rs: RenderStatic) -> jnp.ndarray:
    """(H·W, 2) float32 (x, y) coords, row-major with row 0 at the top —
    ``gl_LaunchIDEXT.xy`` layout."""
    ys, xs = jnp.mgrid[0 : rs.height, 0 : rs.width]
    return jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32)


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
    pix = _frame_pixels(rs)
    r = pix.shape[0]
    if rs.ray_chunk and rs.ray_chunk < r:
        chunk = rs.ray_chunk
        pad = (-r) % chunk
        pix_p = jnp.pad(pix, ((0, pad), (0, 0)))
        chunks = pix_p.reshape(-1, chunk, 2)
        colors = jax.lax.map(
            lambda c: render_pixels(scene, static, rs, camera, c), chunks
        )
        colors = colors.reshape(-1, 3)[:r]
    else:
        colors = render_pixels(scene, static, rs, camera, pix)
    return colors.reshape(rs.height, rs.width, 3)
