"""Pallas TPU traversal kernels — the flagship trace path.

The hardware-shaped formulation of ``traceRayEXT`` (``src/shader.rgen:86,111``)
for a TPU core:

* **scalar unit drives traversal**: each grid step owns one ray packet
  (K = 8×128 = 1024 rays, exactly one native VPU register per component) and
  walks the threaded (skip-link) BVH with a *scalar* node pointer in a
  ``lax.while_loop`` — node meta (first/count/miss) are scalar SMEM loads;
* **VPU does the tests**: AABB slab tests and Möller–Trumbore run on dense
  (8, 128) registers with node/triangle data entering as (1, 1) broadcast
  slices of VMEM rows — no per-lane gathers anywhere;
* **true branching**: leaf intersection work executes ONLY when the scalar
  pointer is at a leaf (``pl.when`` on a scalar) — unlike the XLA packet
  path (``ops/packet.py``) which must execute masked leaf math every step;
* scene residency: node AABBs (M, 8) f32 + triangles (T, 12) f32 live in
  VMEM, node meta (M, 3) i32 in SMEM. ``fits_vmem`` gates dispatch; larger
  meshes fall back to the XLA packet path (extension point: leaf DMA from
  HBM / chunked BLAS).

Packets are pixel tiles (32×32), so intra-packet coherence bounds the
consensus overhead; per-lane hit state (best t/slot/u/v) keeps per-ray
correctness exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_T = 3.0e38  # python float: jnp scalars would be captured consts in kernels
LEAF_UNROLL = 4
K_SUB, K_LANE = 8, 128           # packet register shape
PACKET_K = K_SUB * K_LANE        # 1024 rays per packet

# VMEM residency budget for one mesh's BVH (bytes). The chip exposes ~16MB;
# leave headroom for ray blocks, scratch and double-buffering.
VMEM_BUDGET = 8 * 1024 * 1024


def fits_vmem(num_nodes: int, num_tris: int) -> bool:
    node_bytes = num_nodes * (8 * 4 + 3 * 4)   # aabb rows + smem meta
    tri_bytes = (num_tris + LEAF_UNROLL) * 12 * 4
    return node_bytes + tri_bytes < VMEM_BUDGET


def _slab_test(o, d_inv, row, tmin, tfar_cap):
    """AABB slab test of one node row (a 1-D (8,) vector; components are
    scalar extracts, which Mosaic splats natively) against the packet.
    Returns (8, 128) bool."""
    tns, tfs = [], []
    for axis in range(3):
        lo = (row[axis] - o[axis]) * d_inv[axis]
        hi = (row[3 + axis] - o[axis]) * d_inv[axis]
        tns.append(jnp.minimum(lo, hi))
        tfs.append(jnp.maximum(lo, hi))
    t_near = jnp.maximum(jnp.maximum(tns[0], tns[1]), jnp.maximum(tns[2], tmin))
    t_far = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), jnp.minimum(tfs[2], tfar_cap))
    return t_near <= t_far


def _mt_tri(o, d, trow, tmin, best_t):
    """Möller–Trumbore of one leaf triangle (a 1-D (12,) row; components are
    scalar extracts) against the packet. Returns (t, u, v, hit), (8, 128)."""
    v0 = [trow[c] for c in range(3)]
    e1 = [trow[3 + c] for c in range(3)]
    e2 = [trow[6 + c] for c in range(3)]
    # pvec = d × e2
    px = d[1] * e2[2] - d[2] * e2[1]
    py = d[2] * e2[0] - d[0] * e2[2]
    pz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tvx = o[0] - v0[0]
    tvy = o[1] - v0[1]
    tvz = o[2] - v0[2]
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    # qvec = tvec × e1
    qx = tvy * e1[2] - tvz * e1[1]
    qy = tvz * e1[0] - tvx * e1[2]
    qz = tvx * e1[1] - tvy * e1[0]
    v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-9)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < best_t)
    )
    return t, u, v, hit


def _closest_kernel(meta_ref, aabb_ref, tri_ref, rays_ref, tmax_ref,
                    t_out, slot_out, u_out, v_out, *, end: int, tmin: float):
    """One grid step = one packet's full closest-hit traversal."""
    o = [rays_ref[0, c] for c in range(3)]        # each (8, 128)
    d = [rays_ref[0, 3 + c] for c in range(3)]
    d_inv = [
        jnp.where(x != 0.0, 1.0 / x, jnp.where(x >= 0, jnp.inf, -jnp.inf))
        for x in d
    ]
    tmax = tmax_ref[0]

    live0 = tmax > tmin
    node0 = jnp.where(jnp.any(live0), jnp.int32(0), jnp.int32(end))

    def cond(state):
        return state[0] != end

    def body(state):
        node, best_t, best_slot, best_u, best_v = state
        first = meta_ref[node, 0]
        count = meta_ref[node, 1]
        miss = meta_ref[node, 2]
        is_leaf = first >= 0

        arow = aabb_ref[node, :]                  # (8,) dynamic row
        box_hit = _slab_test(o, d_inv, arow, tmin, best_t)
        any_box = jnp.any(box_hit)

        def leaf_case(carry):
            bt, bs, bu, bv = carry
            for k in range(LEAF_UNROLL):
                trow = tri_ref[first + k, :]       # (12,) dynamic row
                t, u, v, hit = _mt_tri(o, d, trow, tmin, bt)
                hit = hit & (k < count)
                bs = jnp.where(hit, first + k, bs)
                bu = jnp.where(hit, u, bu)
                bv = jnp.where(hit, v, bv)
                bt = jnp.where(hit, t, bt)
            return bt, bs, bu, bv

        best_t, best_slot, best_u, best_v = jax.lax.cond(
            is_leaf & any_box,
            leaf_case,
            lambda c: c,
            (best_t, best_slot, best_u, best_v),
        )

        nxt = jnp.where(is_leaf | ~any_box, miss, node + 1)
        return nxt, best_t, best_slot, best_u, best_v

    init = (
        node0,
        tmax,
        jnp.full((K_SUB, K_LANE), -1, jnp.int32),
        jnp.zeros((K_SUB, K_LANE), jnp.float32),
        jnp.zeros((K_SUB, K_LANE), jnp.float32),
    )
    node, best_t, best_slot, best_u, best_v = jax.lax.while_loop(
        cond, body, init
    )
    t_out[0] = jnp.where(best_slot >= 0, best_t, jnp.float32(BIG_T))
    slot_out[0] = best_slot
    u_out[0] = best_u
    v_out[0] = best_v


def _anyhit_kernel(meta_ref, aabb_ref, tri_ref, rays_ref, tmax_ref,
                   occ_out, *, end: int, tmin: float):
    """One grid step = one packet's occlusion traversal with early exit."""
    o = [rays_ref[0, c] for c in range(3)]
    d = [rays_ref[0, 3 + c] for c in range(3)]
    d_inv = [
        jnp.where(x != 0.0, 1.0 / x, jnp.where(x >= 0, jnp.inf, -jnp.inf))
        for x in d
    ]
    tmax = tmax_ref[0]
    live0 = tmax > tmin
    node0 = jnp.where(jnp.any(live0), jnp.int32(0), jnp.int32(end))

    def cond(state):
        return state[0] != end

    def body(state):
        node, occluded = state
        first = meta_ref[node, 0]
        count = meta_ref[node, 1]
        miss = meta_ref[node, 2]
        is_leaf = first >= 0

        pending_t = jnp.where(live0 & ~occluded, tmax, 0.0)
        arow = aabb_ref[node, :]
        box_hit = _slab_test(o, d_inv, arow, tmin, pending_t)
        any_box = jnp.any(box_hit)

        def leaf_case(occ):
            for k in range(LEAF_UNROLL):
                trow = tri_ref[first + k, :]
                _, _, _, hit = _mt_tri(o, d, trow, tmin, pending_t)
                occ = occ | (hit & (k < count))
            return occ

        occluded = jax.lax.cond(is_leaf & any_box, leaf_case,
                                lambda c: c, occluded)

        done = ~jnp.any(live0 & ~occluded)
        nxt = jnp.where(is_leaf | ~any_box, miss, node + 1)
        nxt = jnp.where(done, jnp.int32(end), nxt)
        return nxt, occluded

    _, occluded = jax.lax.while_loop(
        cond, body, (node0, jnp.zeros((K_SUB, K_LANE), bool))
    )
    occ_out[0] = occluded


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pack_rays(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """(P, K, 3) ×2 → (P, 6, 8, 128) SoA register layout."""
    p = o.shape[0]
    soa = jnp.concatenate([o, d], axis=-1)                 # (P, K, 6)
    soa = soa.transpose(0, 2, 1)                           # (P, 6, K)
    return soa.reshape(p, 6, K_SUB, K_LANE)


def pallas_closest(
    scene,         # DeviceScene
    static,        # SceneStatic
    mesh_id: int,
    o: jnp.ndarray,     # (P, K, 3) object-space
    d: jnp.ndarray,     # (P, K, 3)
    tmin: float,
    tmax: jnp.ndarray,  # (P, K)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packet closest-hit via the Pallas kernel. Same contract as
    ``ops.packet.packet_closest``."""
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    tri_base, tri_count = static.mesh_bvh_tri_ranges[mesh_id]
    p, k = o.shape[0], o.shape[1]
    assert k == PACKET_K, f"pallas path needs K={PACKET_K}, got {k}"

    aabb, meta, tris = _mesh_tables(scene, static, mesh_id)

    rays = _pack_rays(o, d)
    tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (p, k)).reshape(
        p, K_SUB, K_LANE
    )

    grid = (p,)
    kernel = functools.partial(
        _closest_kernel, end=node_count, tmin=float(tmin)
    )
    t, slot, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aabb
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
            pl.BlockSpec((1, 6, K_SUB, K_LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_SUB, K_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K_SUB, K_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_SUB, K_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_SUB, K_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_SUB, K_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.float32),
            jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.int32),
            jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.float32),
            jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.float32),
        ],
    )(meta, aabb, tris, rays, tmax_r)

    t = t.reshape(p, k)
    slot = slot.reshape(p, k)
    u = u.reshape(p, k)
    v = v.reshape(p, k)
    hit = slot >= 0
    prim = jnp.where(
        hit,
        jnp.take(scene.bvh_tri_prim, tri_base + jnp.maximum(slot, 0), axis=0),
        jnp.int32(-1),
    )
    return jnp.where(hit, t, jnp.float32(BIG_T)), prim, u, v


def pallas_anyhit(
    scene, static, mesh_id: int,
    o: jnp.ndarray, d: jnp.ndarray, tmin: float, tmax: jnp.ndarray,
) -> jnp.ndarray:
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    p, k = o.shape[0], o.shape[1]
    assert k == PACKET_K, f"pallas path needs K={PACKET_K}, got {k}"

    aabb, meta, tris = _mesh_tables(scene, static, mesh_id)
    rays = _pack_rays(o, d)
    tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (p, k)).reshape(
        p, K_SUB, K_LANE
    )

    kernel = functools.partial(
        _anyhit_kernel, end=node_count, tmin=float(tmin)
    )
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, K_SUB, K_LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_SUB, K_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K_SUB, K_LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.bool_),
    )(meta, aabb, tris, rays, tmax_r)
    return occ.reshape(p, k)


def _mesh_tables(scene, static, mesh_id: int):
    """Slice + pack one mesh's BVH into kernel table layouts.

    Static slicing (mesh ranges are static) lets XLA fold these into
    constants per compilation — no per-frame repacking.
    """
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    tri_base, tri_count = static.mesh_bvh_tri_ranges[mesh_id]

    bmin = jax.lax.slice_in_dim(scene.bvh_aabb_min, node_base,
                                node_base + node_count, axis=0)
    bmax = jax.lax.slice_in_dim(scene.bvh_aabb_max, node_base,
                                node_base + node_count, axis=0)
    aabb = jnp.concatenate(
        [bmin, bmax, jnp.zeros((node_count, 2), jnp.float32)], axis=1
    )  # (M, 8)

    meta = jnp.stack(
        [
            jax.lax.slice_in_dim(scene.bvh_tri_first, node_base,
                                 node_base + node_count, axis=0),
            jax.lax.slice_in_dim(scene.bvh_tri_count, node_base,
                                 node_base + node_count, axis=0),
            jax.lax.slice_in_dim(scene.bvh_miss, node_base,
                                 node_base + node_count, axis=0),
        ],
        axis=1,
    )  # (M, 3) int32, mesh-local links

    v0 = jax.lax.slice_in_dim(scene.bvh_tri_v0, tri_base,
                              tri_base + tri_count, axis=0)
    e1 = jax.lax.slice_in_dim(scene.bvh_tri_e1, tri_base,
                              tri_base + tri_count, axis=0)
    e2 = jax.lax.slice_in_dim(scene.bvh_tri_e2, tri_base,
                              tri_base + tri_count, axis=0)
    tris = jnp.concatenate(
        [v0, e1, e2, jnp.zeros((tri_count, 3), jnp.float32)], axis=1
    )  # (T, 12)
    # pad so leaf blocks [first, first+4) are always in-bounds
    tris = jnp.concatenate(
        [tris, jnp.zeros((LEAF_UNROLL, 12), jnp.float32)], axis=0
    )
    return aabb, meta, tris
