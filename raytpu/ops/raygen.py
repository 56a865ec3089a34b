"""Fused Pallas raygen: jittered primary rays emitted directly in the
packed sweep ABI (TPU-only).

The XLA raygen path (``integrator.primary_rays_soa`` — the TPU
reformulation of ``src/shader.rgen:70-79``) materializes ~8 full-wave
(P, K) passes before the first sweep: two shader-hash ``sin`` fusions for
the jitter, the basis-combination + normalize fusion for ``d``, the
origin broadcast, and then ``pack_rays``'s 6-plane concatenate copies it
all AGAIN into the packed (6, P, 8, 128) buffer the sweep kernels read.
On a config4 wave (8160 packets × 1024 lanes) that is ~400 MB of pure
HBM round-trips for values that are cheap VPU math over two constant
coordinate planes.

This kernel computes the whole thing in one pass: pixel-coordinate
planes in (they are jit-time constants — XLA folds the tile/jitter index
arithmetic away), camera basis + per-packet sample index in SMEM,
packed rays out. Exactly the ops of ``primary_rays_soa`` in the same
order (hash RNG ``src/shader.rgen:57-59``, focal length 2.5 ``:79``,
NDC y-flip ``:75``), so every traversal tier and both bounce-loop
bodies (fused Pallas epilogue and XLA reference body) consume identical
ray values — the cross-tier bit-identity gate is unaffected by
construction. CPU/interpret runs keep the XLA raygen (the golden/oracle
reference); ``tests/test_raygen.py`` pins this kernel against it in
interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.config import FOCAL_LENGTH
from raytpu.ops.traverse_pallas import K_LANE, K_SUB, PACKET_K

# packets per grid step. NOT tunable per-wave: compiling the kernel at a
# different block shape can contract FMAs differently inside the chaotic
# shader hash (measured in interpret mode: bp=8 vs bp=16 flip ~10% of
# jitter samples), so ONE uniform block size is what keeps sharded waves
# (local p = any BLOCK_PACKETS multiple) bit-identical to the
# single-device wave. 8 = the DMA-block granule every wave divides; the
# per-step invocation floor costs ~p/8 * 0.5 us extra vs bp=16
# (~0.25 ms on config4) — acceptable for a structural invariant. The env
# knob exists for same-shape A/B probes only.
RG_BP = int(os.environ.get("RAYTPU_RG_BP", "8"))

# Hard invariant, checked at import: RG_BP must DIVIDE the sweep kernels'
# DMA-block granule (ops/mega.BLOCK_PACKETS). Every wave — including the
# distributed path's local shards, which are padded to BLOCK_PACKETS
# multiples (parallel/dist.py) — is a BLOCK_PACKETS multiple, so
# RG_BP | BLOCK_PACKETS makes `p % RG_BP == 0` true for ALL waves and the
# kernel gate backend-uniform. An RG_BP that violates this (e.g. the old
# A/B value 16) would let a sharded wave silently fall back to the XLA
# raygen while the single-device wave uses the kernel — bit-divergent
# frames with no error (ADVICE r4).
from raytpu.ops.mega import BLOCK_PACKETS  # noqa: E402

if BLOCK_PACKETS % RG_BP != 0:
    raise ValueError(
        f"RAYTPU_RG_BP={RG_BP} must divide BLOCK_PACKETS={BLOCK_PACKETS}: "
        "sharded waves are padded to BLOCK_PACKETS multiples and must take "
        "the same raygen path as the single-device wave (bit-identity)"
    )


def _raygen_kernel(
    cam_ref,             # SMEM (13,): camera rows o/right/up/fwd + spp
    srow_ref,            # SMEM (P,) f32 per-packet sample index
    px_ref,              # (bp, 8, 128) f32 pixel x coords
    py_ref,              # (bp, 8, 128) f32 pixel y coords
    rays_ref,            # out (6, bp, 8, 128) packed rays [o | d]
    *, width: int, height: int, bp: int,
):
    base = pl.program_id(0) * bp
    spp_f = cam_ref[12]
    for j in range(bp):  # sample index varies per packet (spp fold row)
        px = px_ref[j]
        py = py_ref[j]
        s = srow_ref[base + j]
        seed0 = spp_f + s               # seedOffset = samples (:69)

        def rnd(seed):
            x = jnp.sin(
                px * 12.9898 + py * 78.233 + 1113.1 * seed
            ) * 43758.5453
            return x - jnp.floor(x)

        ux = ((px + rnd(seed0)) / width) * 2.0 - 1.0
        uy = -(((py + rnd(seed0 + 0.5)) / height) * 2.0 - 1.0)  # y-flip

        d = [
            ux * cam_ref[3 + c] + uy * cam_ref[6 + c]
            + FOCAL_LENGTH * cam_ref[9 + c]
            for c in range(3)
        ]
        # v3.normalize, op-for-op
        inv = 1.0 / jnp.maximum(
            jnp.sqrt(jnp.maximum(
                d[0] * d[0] + d[1] * d[1] + d[2] * d[2], 0.0
            )),
            1e-30,
        )
        zeros = jnp.zeros((K_SUB, K_LANE), jnp.float32)
        for c in range(3):
            rays_ref[c, j] = cam_ref[c] + zeros     # o = camera position
            rays_ref[3 + c, j] = d[c] * inv


def use_raygen_kernel(mode: str, p: int, k: int) -> bool:
    """Static gate: TPU backend (or ``mode="on"`` forcing interpret mode
    for the CPU semantics test), packed-ABI wave shape, and a block-
    aligned packet count. ``mode`` is ``RenderStatic.raygen`` — a real
    jit-cache-key field so A/B legs can't alias (the ``fused`` precedent).
    Pure function of its arguments: the RAYTPU_RAYGEN env override is
    resolved ONCE into ``RenderStatic.raygen`` at construction
    (``RenderStatic.from_config``), never re-read at trace time — a
    trace-time read would alias jit cache entries compiled under a
    different env value (ADVICE r4)."""
    if mode == "off":
        return False
    # every wave (including the distributed path's local shards, padded
    # to BLOCK_PACKETS multiples) divides RG_BP: the import-time
    # RG_BP | BLOCK_PACKETS invariant above
    if k != PACKET_K or p % RG_BP != 0:
        return False
    return mode == "on" or jax.default_backend() == "tpu"


def raygen_packed(
    camera: jnp.ndarray,     # (4, 3): position, right, up, forward
    s_row: jnp.ndarray,      # (P,) per-packet sample index
    px: jnp.ndarray,         # (P, K) f32 pixel x coords
    py: jnp.ndarray,         # (P, K) f32 pixel y coords
    spp: int,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Jittered primary rays straight into the packed (6, P, 8, 128) sweep
    buffer — replaces ``primary_rays_soa`` + ``pack_rays`` on TPU."""
    p = px.shape[0]
    bp = RG_BP  # uniform block shape — see the RG_BP invariant note
    assert p % bp == 0
    cam = jnp.concatenate(
        [camera.astype(jnp.float32).reshape(12),
         jnp.asarray([float(spp)], jnp.float32)]
    )
    spec = pl.BlockSpec((bp, K_SUB, K_LANE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_raygen_kernel, width=width, height=height,
                          bp=bp),
        grid=(p // bp,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # camera + spp
            pl.BlockSpec(memory_space=pltpu.SMEM),   # s_row (whole (P,))
            spec, spec,
        ],
        out_specs=pl.BlockSpec((6, RG_BP, K_SUB, K_LANE),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, p, K_SUB, K_LANE), jnp.float32),
    )(cam, s_row.astype(jnp.float32),
      px.reshape(p, K_SUB, K_LANE), py.reshape(p, K_SUB, K_LANE))
