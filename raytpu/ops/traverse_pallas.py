"""Pallas TPU traversal kernels — the flagship trace path.

The hardware-shaped formulation of ``traceRayEXT`` (``src/shader.rgen:86,111``)
for a TPU core:

* **scalar unit drives traversal**: each grid step owns one ray packet
  (K = 8×128 = 1024 rays, exactly one native VPU register per component) and
  walks the threaded (skip-link) BVH with a *scalar* node pointer in a
  ``lax.while_loop``;
* **all scene data lives in SMEM as flat 1-D arrays** (AABB components,
  node meta, triangle corner components): every per-node/per-triangle value
  is a native scalar load that splats onto the VPU. This avoids the two TPU
  poisons — per-lane gathers (XLA lowers them to serialized slices) and
  vector→scalar extracts (pipeline drains): measured ~22 ns per box step vs
  ~1 µs with VMEM-row extracts;
* **VPU does the tests**: AABB slab tests and Möller–Trumbore on dense
  (8, 128) registers;
* **true branching**: leaf intersection work executes ONLY when the scalar
  pointer is at a leaf — unlike the XLA packet path (``ops/packet.py``)
  which must execute masked leaf math every step.

SMEM is ~1 MB, so per-mesh residency caps at roughly 20k nodes + 20k
triangles (``fits_smem``); beyond that the scene build splits meshes into
spatial chunks (``raytpu.accel``) that each fit — the chunked-BLAS answer
to the reference's monolithic driver-built BLAS.

Packets are pixel tiles (32×32), so intra-packet coherence bounds the
consensus overhead; per-lane hit state (best t/slot/u/v) keeps per-ray
correctness exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.ops.intersect import BIG_T, LEAF_UNROLL

K_SUB, K_LANE = 8, 128           # packet register shape
PACKET_K = K_SUB * K_LANE        # 1024 rays per packet
PACK_N = 4                       # packets per grid step (amortizes the
                                 # per-step kernel-invocation floor)

# SMEM residency budget for one mesh's BVH (bytes); the core exposes 1MB
# exactly (compile error beyond 1048576) — leave headroom for the scalar
# operand windows
SMEM_BUDGET = 960 * 1024


def smem_bytes(num_nodes: int, num_tris: int) -> int:
    # 6 aabb f32 + 3 meta i32 per node; 9 corner + 9 normal f32 per
    # (padded) tri — normals live in SMEM so the kernel can interpolate
    # shading normals at hit time (no post-trace per-lane gathers)
    return (6 + 3) * num_nodes * 4 + 18 * (num_tris + LEAF_UNROLL) * 4


def fits_smem(num_nodes: int, num_tris: int) -> bool:
    return smem_bytes(num_nodes, num_tris) < SMEM_BUDGET


# dispatch-gate name used by accel/__init__.py
fits_vmem = fits_smem


def _slab(o, d_inv, bxs, n, tmin, tfar_cap):
    """Slab test of node ``n`` (scalar SMEM loads) vs the packet → (8,128)."""
    tns, tfs = [], []
    for axis in range(3):
        lo = (bxs[axis][n] - o[axis]) * d_inv[axis]
        hi = (bxs[3 + axis][n] - o[axis]) * d_inv[axis]
        tns.append(jnp.minimum(lo, hi))
        tfs.append(jnp.maximum(lo, hi))
    t_near = jnp.maximum(jnp.maximum(tns[0], tns[1]), jnp.maximum(tns[2], tmin))
    t_far = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), jnp.minimum(tfs[2], tfar_cap))
    return t_near <= t_far


def _mt(o, d, T, s, tmin, best_t):
    """Möller–Trumbore of triangle slot ``s`` (scalar SMEM loads) vs the
    packet. Returns (t, u, v, hit), all (8, 128)."""
    v0 = [T[c][s] for c in range(3)]
    e1 = [T[3 + c][s] for c in range(3)]
    e2 = [T[6 + c][s] for c in range(3)]
    # pvec = d × e2 (e2 components are scalars → scalar·vector VPU math)
    px = d[1] * e2[2] - d[2] * e2[1]
    py = d[2] * e2[0] - d[0] * e2[2]
    pz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tvx = o[0] - v0[0]
    tvy = o[1] - v0[1]
    tvz = o[2] - v0[2]
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
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


def _closest_kernel(*refs, tmin: float):
    """One grid step = one packet's full closest-hit traversal.

    refs: [end, bx0..bx5, first, count, miss, t0..t8, n0..n8, live,
           ox..dz, tmax, t_out, slot_out, u_out, v_out, nx_out, ny_out, nz_out]

    ``end`` (the node count) is a runtime SMEM scalar so ONE compiled kernel
    serves every BVH chunk of a scene (tables are padded to a uniform size).
    """
    end_ref = refs[0]
    bxs = refs[1:7]
    first_ref, count_ref, miss_ref = refs[7], refs[8], refs[9]
    T = refs[10:19]
    N = refs[19:28]                 # corner normal tables (SMEM scalars)
    live_ref = refs[28]
    ray_refs = refs[29:35]          # ox oy oz dx dy dz, each (1, 8, 128)
    tmax_ref = refs[35]
    (t_out, slot_out, u_out, v_out,
     nx_out, ny_out, nz_out) = refs[36:43]
    end = end_ref[0]

    o = [ray_refs[c][0] for c in range(3)]        # each (8, 128)
    d = [ray_refs[3 + c][0] for c in range(3)]
    d_inv = [
        jnp.where(x != 0.0, 1.0 / x, jnp.where(x >= 0, jnp.inf, -jnp.inf))
        for x in d
    ]
    tmax = tmax_ref[0]

    # CRITICAL: node0 must be a *pure scalar* (SMEM load), never derived
    # from vector data — a vector-derived init forces Mosaic to treat the
    # whole while state as vector-dependent (measured 100x slowdown).
    node0 = jnp.where(live_ref[pl.program_id(0)] != 0,
                      jnp.int32(0), jnp.int32(end))

    def cond(state):
        return state[0] != end

    def body(state):
        node, best_t, best_slot, best_u, best_v, best_n = state
        first = first_ref[node]
        is_leaf = first >= 0

        box_hit = _slab(o, d_inv, bxs, node, tmin, best_t)
        any_box = jnp.any(box_hit)

        def leaf_case(carry):
            bt, bs, bu, bv, bn = carry
            count = count_ref[node]
            for k in range(LEAF_UNROLL):
                sidx = first + k
                t, u, v, hit = _mt(o, d, T, sidx, tmin, bt)
                hit = hit & (k < count)
                # interpolate the shading normal HERE, from SMEM scalars —
                # kills the 9 per-lane gathers the shader ABI otherwise
                # needs after the trace (src/shader.rchit:66-91)
                w = 1.0 - u - v
                bn = tuple(
                    jnp.where(
                        hit,
                        w * N[c][sidx] + u * N[3 + c][sidx] + v * N[6 + c][sidx],
                        bn[c],
                    )
                    for c in range(3)
                )
                bs = jnp.where(hit, sidx, bs)
                bu = jnp.where(hit, u, bu)
                bv = jnp.where(hit, v, bv)
                bt = jnp.where(hit, t, bt)
            return bt, bs, bu, bv, bn

        best_t, best_slot, best_u, best_v, best_n = jax.lax.cond(
            is_leaf & any_box,
            leaf_case,
            lambda c: c,
            (best_t, best_slot, best_u, best_v, best_n),
        )

        nxt = jnp.where(is_leaf | ~any_box, miss_ref[node], node + 1)
        return nxt, best_t, best_slot, best_u, best_v, best_n

    zeros = jnp.zeros((K_SUB, K_LANE), jnp.float32)
    init = (
        node0,
        tmax,
        jnp.full((K_SUB, K_LANE), -1, jnp.int32),
        zeros,
        zeros,
        (zeros, zeros, zeros + 1.0),
    )
    node, best_t, best_slot, best_u, best_v, best_n = jax.lax.while_loop(
        cond, body, init
    )
    t_out[0] = jnp.where(best_slot >= 0, best_t, jnp.float32(BIG_T))
    slot_out[0] = best_slot
    u_out[0] = best_u
    v_out[0] = best_v
    nx_out[0] = best_n[0]
    ny_out[0] = best_n[1]
    nz_out[0] = best_n[2]


def _anyhit_kernel(*refs, tmin: float):
    """One grid step = one packet's occlusion traversal with early exit."""
    end_ref = refs[0]
    bxs = refs[1:7]
    first_ref, count_ref, miss_ref = refs[7], refs[8], refs[9]
    T = refs[10:19]
    live_ref = refs[19]
    ray_refs = refs[20:26]
    tmax_ref = refs[26]
    occ_out = refs[27]  # (anyhit needs no normal tables)
    end = end_ref[0]

    o = [ray_refs[c][0] for c in range(3)]
    d = [ray_refs[3 + c][0] for c in range(3)]
    d_inv = [
        jnp.where(x != 0.0, 1.0 / x, jnp.where(x >= 0, jnp.inf, -jnp.inf))
        for x in d
    ]
    tmax = tmax_ref[0]
    live0 = tmax > tmin
    # scalar-clean init (see _closest_kernel)
    node0 = jnp.where(live_ref[pl.program_id(0)] != 0,
                      jnp.int32(0), jnp.int32(end))

    # occlusion state is int32, not bool: Mosaic mis-lowers bool vectors
    # carried through lax.cond branches (mask-packing layout mismatch)
    def cond(state):
        return state[0] != end

    def body(state):
        node, occluded = state
        first = first_ref[node]
        is_leaf = first >= 0

        pending_t = jnp.where(live0 & (occluded == 0), tmax, 0.0)
        box_hit = _slab(o, d_inv, bxs, node, tmin, pending_t)
        any_box = jnp.any(box_hit)

        def leaf_case(occ):
            count = count_ref[node]
            for k in range(LEAF_UNROLL):
                _, _, _, hit = _mt(o, d, T, first + k, tmin, pending_t)
                occ = occ | (hit & (k < count)).astype(jnp.int32)
            return occ

        occluded = jax.lax.cond(is_leaf & any_box, leaf_case,
                                lambda c: c, occluded)

        done = ~jnp.any(live0 & (occluded == 0))
        nxt = jnp.where(is_leaf | ~any_box, miss_ref[node], node + 1)
        nxt = jnp.where(done, jnp.int32(end), nxt)
        return nxt, occluded

    _, occluded = jax.lax.while_loop(
        cond, body, (node0, jnp.zeros((K_SUB, K_LANE), jnp.int32))
    )
    occ_out[0] = occluded


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _ray_regs(o, d):
    """Vec3 components (P, K) → six (P, 8, 128) register views.

    Pure reshapes of contiguous minor dims — NO relayout (the reason the
    whole wave path is component-SoA; see ops/vec3.py).
    """
    p = o[0].shape[0]
    return [x.reshape(p, K_SUB, K_LANE) for x in (*o, *d)]


_SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)


def _uniform_sizes(static):
    """Per-scene uniform table sizes: the max node/tri counts across all
    traversal meshes. Padding every chunk's tables to these sizes means a
    SINGLE compiled kernel serves every chunk (``end`` is a runtime scalar)."""
    max_nodes = max(n for _, n in static.mesh_node_ranges)
    max_tris = max(t for _, t in static.mesh_bvh_tri_ranges)
    return max_nodes, max_tris


def _mesh_tables(scene, static, mesh_id: int):
    """Slice one mesh's BVH into flat 1-D SMEM table arrays, padded to the
    scene's uniform sizes.

    Static slicing (mesh ranges are static) lets XLA fuse these into cheap
    per-compilation transforms — no per-frame host repacking.
    """
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    tri_base, tri_count = static.mesh_bvh_tri_ranges[mesh_id]
    pad_nodes, pad_tris = _uniform_sizes(static)

    def nslice(col):
        x = jax.lax.slice_in_dim(col, node_base, node_base + node_count,
                                 axis=0)
        if node_count < pad_nodes:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_nodes - node_count,), x.dtype)], axis=0
            )
        return x

    def t1slice(col):
        x = jax.lax.slice_in_dim(col, tri_base, tri_base + tri_count, axis=0)
        # +LEAF_UNROLL: leaf blocks [first, first+LEAF_UNROLL) stay in-bounds
        return jnp.concatenate(
            [x, jnp.zeros((pad_tris - tri_count + LEAF_UNROLL,), x.dtype)],
            axis=0,
        )

    boxes = [nslice(scene.bvh_aabb_min[:, c]) for c in range(3)] + [
        nslice(scene.bvh_aabb_max[:, c]) for c in range(3)
    ]
    meta = [
        nslice(scene.bvh_tri_first),
        nslice(scene.bvh_tri_count),
        nslice(scene.bvh_miss),
    ]
    tris = (
        [t1slice(scene.bvh_tri_v0[:, c]) for c in range(3)]
        + [t1slice(scene.bvh_tri_e1[:, c]) for c in range(3)]
        + [t1slice(scene.bvh_tri_e2[:, c]) for c in range(3)]
    )
    normals = [t1slice(scene.bvh_tri_n_soa[c]) for c in range(9)]
    end = jnp.asarray([node_count], jnp.int32)
    return end, boxes, meta, tris, normals


def pallas_closest(
    scene,         # DeviceScene
    static,        # SceneStatic
    mesh_id: int,
    o,                  # Vec3 of (P, K): object-space origins
    d,                  # Vec3 of (P, K)
    tmin: float,
    tmax: jnp.ndarray,  # (P, K)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packet closest-hit via the Pallas kernel. Same contract as
    ``ops.packet.packet_closest``."""
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    tri_base, _ = static.mesh_bvh_tri_ranges[mesh_id]
    p, k = o[0].shape
    assert k == PACKET_K, f"pallas path needs K={PACKET_K}, got {k}"

    end, boxes, meta, tris, normals = _mesh_tables(scene, static, mesh_id)
    rays = _ray_regs(o, d)
    tmax_pk = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (p, k))
    live = jnp.any(tmax_pk > tmin, axis=1).astype(jnp.int32)   # (P,)
    tmax_r = tmax_pk.reshape(p, K_SUB, K_LANE)

    kernel = functools.partial(_closest_kernel, tmin=float(tmin))
    blk = lambda i: (i, 0, 0)  # noqa: E731
    ray_spec = pl.BlockSpec((1, K_SUB, K_LANE), blk, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, K_SUB, K_LANE), blk, memory_space=pltpu.VMEM)
    f32_out = jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.float32)
    t, slot, u, v, nx, ny, nz = pl.pallas_call(
        kernel,
        grid=(p,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_SMEM] * 28 + [
            _SMEM,  # live flags: full array, indexed by pl.program_id
        ] + [ray_spec] * 6 + [ray_spec],
        out_specs=[out_spec] * 7,
        out_shape=[
            f32_out,
            jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.int32),
            f32_out, f32_out, f32_out, f32_out, f32_out,
        ],
    )(end, *boxes, *meta, *tris, *normals, live, *rays, tmax_r)

    t = t.reshape(p, k)
    slot = slot.reshape(p, k)
    u = u.reshape(p, k)
    v = v.reshape(p, k)
    n_obj = (nx.reshape(p, k), ny.reshape(p, k), nz.reshape(p, k))
    hit = slot >= 0
    return (
        jnp.where(hit, t, jnp.float32(BIG_T)),
        slot,          # BVH-slot id (mesh-local); see slot_to_prim
        u, v, n_obj,
    )


def slot_to_prim(scene, static, mesh_id: int, slot: jnp.ndarray) -> jnp.ndarray:
    """Map BVH-slot hits to GLOBAL primitive ids (one per-lane gather —
    off the hot path; shading uses the kernel-interpolated normals)."""
    tri_base, _ = static.mesh_bvh_tri_ranges[mesh_id]
    return jnp.where(
        slot >= 0,
        jnp.take(scene.bvh_tri_prim, tri_base + jnp.maximum(slot, 0), axis=0),
        jnp.int32(-1),
    )


def pallas_anyhit(
    scene, static, mesh_id: int,
    o, d, tmin: float, tmax: jnp.ndarray,
) -> jnp.ndarray:
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    p, k = o[0].shape
    assert k == PACKET_K, f"pallas path needs K={PACKET_K}, got {k}"

    end, boxes, meta, tris, _normals = _mesh_tables(scene, static, mesh_id)
    rays = _ray_regs(o, d)
    tmax_pk = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (p, k))
    live = jnp.any(tmax_pk > tmin, axis=1).astype(jnp.int32)
    tmax_r = tmax_pk.reshape(p, K_SUB, K_LANE)

    kernel = functools.partial(_anyhit_kernel, tmin=float(tmin))
    blk = lambda i: (i, 0, 0)  # noqa: E731
    ray_spec = pl.BlockSpec((1, K_SUB, K_LANE), blk, memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(p,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_SMEM] * 19 + [
            _SMEM,  # live flags: full array, indexed by pl.program_id
        ] + [ray_spec] * 6 + [ray_spec],
        out_specs=pl.BlockSpec((1, K_SUB, K_LANE), blk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.int32),
    )(end, *boxes, *meta, *tris, live, *rays, tmax_r)
    return occ.reshape(p, k) != 0


# ===========================================================================
# v3 "chained" kernels: in-kernel instance transform + in-place best-hit
# merge via aliased state buffers.
#
# With chunked BLAS a frame issues (chunks × bounces) trace calls; doing the
# ray transform and hit merging in XLA costs ~10 elementwise full-wave ops
# per chunk (measured 279 ms/frame of fusion glue on config4). Here each
# chunk is ONE pallas_call: world rays go in once, the world→object
# transform happens in-register from 12 SMEM scalars, and the running best
# state (t/valid/mat/inst/normal/uv) is updated in place through
# ``input_output_aliases`` — chunks chain with zero XLA-side work. Earlier
# chunks' hits also prune later chunks' traversals (state.t is the window).
# ===========================================================================

# TraceState: ONE (9, P, 8, 128) float32 array — packed so each grid step
# moves 2 state blocks (in/out) instead of 18. Slot layout:
#   0 t | 1 valid (i32 bits) | 2 mat (i32 bits) | 3 inst (i32 bits)
#   4 nx | 5 ny | 6 nz | 7 u | 8 v
# Integer fields travel as bit patterns (pure moves; bitcast at use sites).
# Measured: 25 separate block transfers made a PARKED packet-chunk step cost
# ~480ns — 40% of a config4 sweep was pure DMA descriptor overhead.
ST_T, ST_VALID, ST_MAT, ST_INST = 0, 1, 2, 3
ST_NX, ST_NY, ST_NZ, ST_U, ST_V = 4, 5, 6, 7, 8


def make_trace_state(lane_tmax: jnp.ndarray) -> jnp.ndarray:
    """Fresh per-bounce packed state; ``lane_tmax`` (P, K) doubles as the
    per-lane trace window (0 ⇒ inactive lane)."""
    p, k = lane_tmax.shape
    return make_trace_state_reg(lane_tmax.reshape(p, K_SUB, K_LANE))


def make_trace_state_reg(win: jnp.ndarray) -> jnp.ndarray:
    """``make_trace_state`` from an already register-shaped (P, 8, 128)
    window plane (the fused bounce loop carries windows in this shape)."""
    p = win.shape[0]
    t = win.reshape(1, p, K_SUB, K_LANE)
    # single fused pass (a 9-plane concatenate costs ~7x more): plane-index
    # select over a lazily-broadcast template
    idx = jnp.arange(9, dtype=jnp.int32).reshape(9, 1, 1, 1)
    neg1 = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
    fill = jnp.where(
        idx == ST_INST, neg1, jnp.where(idx == ST_NZ, 1.0, 0.0)
    )
    return jnp.where(idx == ST_T, t, fill)


def unpack_state(state: jnp.ndarray, p: int, k: int):
    """Packed state → (t, valid_bool, mat, inst, n Vec3, u, v), (P, K)."""
    f = lambda i: state[i].reshape(p, k)  # noqa: E731
    i32 = lambda i: jax.lax.bitcast_convert_type(  # noqa: E731
        state[i], jnp.int32
    ).reshape(p, k)
    return (
        f(ST_T), i32(ST_VALID) != 0, i32(ST_MAT), i32(ST_INST),
        (f(ST_NX), f(ST_NY), f(ST_NZ)), f(ST_U), f(ST_V),
    )


def _closest_kernel3(*refs, tmin: float):
    """One grid step = one packet: world→object transform, traversal,
    in-place state merge.

    refs: [end, w2o(12), matid, instid, bx0..bx5, first, count, miss,
           t0..t8, n0..n8, live, rays(6,1,8,128), st_in(9,1,8,128),
           st_out(9,1,8,128)]
    """
    end_ref, w2o_ref, matid_ref, instid_ref = refs[0], refs[1], refs[2], refs[3]
    bxs = refs[4:10]
    first_ref, count_ref, miss_ref = refs[10], refs[11], refs[12]
    T = refs[13:22]
    N = refs[22:31]
    live_ref = refs[31]
    rays_ref = refs[32]
    st_in = refs[33]
    st_out = refs[34]
    end = end_ref[0]

    m = [w2o_ref[i] for i in range(12)]  # row-major 3x4 world→object

    # PACK_N packets per grid step: the per-step invocation floor
    # (~0.5µs) amortizes over PACK_N traversals
    for jp in range(PACK_N):
        _closest_one_packet(
            end, m, matid_ref, instid_ref, bxs,
            first_ref, count_ref, miss_ref, T, N,
            live_ref, rays_ref, st_in, st_out, jp, tmin,
        )


def _closest_one_packet(end, m, matid_ref, instid_ref, bxs,
                        first_ref, count_ref, miss_ref, T, N,
                        live_ref, rays_ref, st_in, st_out, jp, tmin):
    ow = [rays_ref[c, jp] for c in range(3)]
    dw = [rays_ref[3 + c, jp] for c in range(3)]
    # world→object, in registers (t stays world-parameterized)
    o = [
        m[0] * ow[0] + m[1] * ow[1] + m[2] * ow[2] + m[3],
        m[4] * ow[0] + m[5] * ow[1] + m[6] * ow[2] + m[7],
        m[8] * ow[0] + m[9] * ow[1] + m[10] * ow[2] + m[11],
    ]
    d = [
        m[0] * dw[0] + m[1] * dw[1] + m[2] * dw[2],
        m[4] * dw[0] + m[5] * dw[1] + m[6] * dw[2],
        m[8] * dw[0] + m[9] * dw[1] + m[10] * dw[2],
    ]
    d_inv = [
        jnp.where(x != 0.0, 1.0 / x, jnp.where(x >= 0, jnp.inf, -jnp.inf))
        for x in d
    ]

    bt0 = st_in[ST_T, jp]  # running best t (doubles as the prune window)

    node0 = jnp.where(live_ref[pl.program_id(0) * PACK_N + jp] != 0,
                      jnp.int32(0), jnp.int32(end))

    def cond(state):
        return state[0] != end

    def body(state):
        node, bt, bs, bu, bv, bn = state
        first = first_ref[node]
        is_leaf = first >= 0

        box_hit = _slab(o, d_inv, bxs, node, tmin, bt)
        any_box = jnp.any(box_hit)

        def leaf_case(carry):
            bt, bs, bu, bv, bn = carry
            count = count_ref[node]
            for k in range(LEAF_UNROLL):
                sidx = first + k
                t, u, v, hit = _mt(o, d, T, sidx, tmin, bt)
                hit = hit & (k < count)

                def interp(bn):
                    # normal interpolation only when some lane hit this
                    # triangle — most leaf triangles miss every lane, and
                    # the 9 scalar loads + blends are the leaf hot cost
                    w = 1.0 - u - v
                    return tuple(
                        jnp.where(
                            hit,
                            w * N[c][sidx] + u * N[3 + c][sidx]
                            + v * N[6 + c][sidx],
                            bn[c],
                        )
                        for c in range(3)
                    )

                bn = jax.lax.cond(jnp.any(hit), interp, lambda b: b, bn)
                bs = jnp.where(hit, sidx, bs)
                bu = jnp.where(hit, u, bu)
                bv = jnp.where(hit, v, bv)
                bt = jnp.where(hit, t, bt)
            return bt, bs, bu, bv, bn

        bt, bs, bu, bv, bn = jax.lax.cond(
            is_leaf & any_box, leaf_case, lambda c: c, (bt, bs, bu, bv, bn)
        )
        nxt = jnp.where(is_leaf | ~any_box, miss_ref[node], node + 1)
        return nxt, bt, bs, bu, bv, bn

    zeros = jnp.zeros((K_SUB, K_LANE), jnp.float32)
    init = (
        node0, bt0,
        jnp.full((K_SUB, K_LANE), -1, jnp.int32),
        zeros, zeros, (zeros, zeros, zeros),
    )
    _, bt, bs, bu, bv, bn = jax.lax.while_loop(cond, body, init)

    improved = bs >= 0
    # object→world normal: row-vector · W2O linear = inverse-transpose
    # (src/shader.rchit:94), from the same 12 SMEM scalars
    nwx = m[0] * bn[0] + m[4] * bn[1] + m[8] * bn[2]
    nwy = m[1] * bn[0] + m[5] * bn[1] + m[9] * bn[2]
    nwz = m[2] * bn[0] + m[6] * bn[1] + m[10] * bn[2]

    def as_f32_bits(x):
        return pltpu.bitcast(x, jnp.float32)

    def as_i32_bits(x):
        return pltpu.bitcast(x, jnp.int32)

    st_out[ST_T, jp] = bt
    st_out[ST_VALID, jp] = as_f32_bits(
        jnp.where(improved, 1, as_i32_bits(st_in[ST_VALID, jp]))
    )
    st_out[ST_MAT, jp] = as_f32_bits(
        jnp.where(improved, matid_ref[0], as_i32_bits(st_in[ST_MAT, jp]))
    )
    st_out[ST_INST, jp] = as_f32_bits(
        jnp.where(improved, instid_ref[0], as_i32_bits(st_in[ST_INST, jp]))
    )
    st_out[ST_NX, jp] = jnp.where(improved, nwx, st_in[ST_NX, jp])
    st_out[ST_NY, jp] = jnp.where(improved, nwy, st_in[ST_NY, jp])
    st_out[ST_NZ, jp] = jnp.where(improved, nwz, st_in[ST_NZ, jp])
    st_out[ST_U, jp] = jnp.where(improved, bu, st_in[ST_U, jp])
    st_out[ST_V, jp] = jnp.where(improved, bv, st_in[ST_V, jp])


def pack_rays(o_world, d_world) -> jnp.ndarray:
    """Vec3 components (P, K) ×2 → ONE (6, P, 8, 128) buffer via
    leading-axis concat (contiguous copies, no relayout). Build once per
    bounce; every chunk call reuses it."""
    p = o_world[0].shape[0]
    return jnp.concatenate(
        [x.reshape(1, p, K_SUB, K_LANE) for x in (*o_world, *d_world)],
        axis=0,
    )


def pallas_closest_chain(
    scene, static, mesh_id: int, inst_id: int,
    rays: jnp.ndarray,      # (6, P, 8, 128) packed world rays (pack_rays)
    tmin: float,
    live: jnp.ndarray,      # (P,) int32 per-packet liveness (per bounce)
    state: jnp.ndarray,     # (9, P, 8, 128) packed state (make_trace_state)
) -> jnp.ndarray:
    """One chunk's closest-hit, merged in place into the packed ``state``."""
    p = rays.shape[1]

    end, boxes, meta, tris, normals = _mesh_tables(scene, static, mesh_id)
    w2o12 = scene.w2o[inst_id].reshape(12)
    matid = scene.materials[inst_id].reshape(1)
    instid = jnp.asarray([inst_id], jnp.int32)

    assert p % PACK_N == 0, f"packet count {p} must be a multiple of {PACK_N}"
    kernel = functools.partial(_closest_kernel3, tmin=float(tmin))
    ray_spec = pl.BlockSpec((6, PACK_N, K_SUB, K_LANE), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((9, PACK_N, K_SUB, K_LANE), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)

    n_inputs_before_state = 4 + 27 + 1 + 1  # scalars + tables + live + rays
    out = pl.pallas_call(
        kernel,
        grid=(p // PACK_N,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_SMEM] * 4 + [_SMEM] * 27 + [_SMEM, ray_spec, st_spec],
        out_specs=st_spec,
        out_shape=jax.ShapeDtypeStruct((9, p, K_SUB, K_LANE), jnp.float32),
        input_output_aliases={n_inputs_before_state: 0},
    )(end, w2o12, matid, instid, *boxes, *meta, *tris, *normals, live,
      rays, state)
    return out


def _anyhit_kernel3(*refs, tmin: float):
    """Chained occlusion: refs = [end, w2o(12), bx.., meta.., t0..t8, live,
    rays(6,PACK_N,8,128), tmax, occ_in, occ_out]."""
    end_ref, w2o_ref = refs[0], refs[1]
    bxs = refs[2:8]
    first_ref, count_ref, miss_ref = refs[8], refs[9], refs[10]
    T = refs[11:20]
    live_ref = refs[20]
    rays_ref = refs[21]
    tmax_ref = refs[22]
    occ_in = refs[23]
    occ_out = refs[24]
    end = end_ref[0]

    m = [w2o_ref[i] for i in range(12)]
    for jp in range(PACK_N):
        _anyhit_one_packet(end, m, bxs, first_ref, count_ref, miss_ref, T,
                           live_ref, rays_ref, tmax_ref, occ_in, occ_out,
                           jp, tmin)


def _anyhit_one_packet(end, m, bxs, first_ref, count_ref, miss_ref, T,
                       live_ref, rays_ref, tmax_ref, occ_in, occ_out,
                       jp, tmin):
    ow = [rays_ref[c, jp] for c in range(3)]
    dw = [rays_ref[3 + c, jp] for c in range(3)]
    o = [
        m[0] * ow[0] + m[1] * ow[1] + m[2] * ow[2] + m[3],
        m[4] * ow[0] + m[5] * ow[1] + m[6] * ow[2] + m[7],
        m[8] * ow[0] + m[9] * ow[1] + m[10] * ow[2] + m[11],
    ]
    d = [
        m[0] * dw[0] + m[1] * dw[1] + m[2] * dw[2],
        m[4] * dw[0] + m[5] * dw[1] + m[6] * dw[2],
        m[8] * dw[0] + m[9] * dw[1] + m[10] * dw[2],
    ]
    d_inv = [
        jnp.where(x != 0.0, 1.0 / x, jnp.where(x >= 0, jnp.inf, -jnp.inf))
        for x in d
    ]
    tmax = tmax_ref[jp]
    occ0 = occ_in[jp]
    live0 = tmax > tmin

    node0 = jnp.where(live_ref[pl.program_id(0) * PACK_N + jp] != 0,
                      jnp.int32(0), jnp.int32(end))

    def cond(state):
        return state[0] != end

    def body(state):
        node, occluded = state
        first = first_ref[node]
        is_leaf = first >= 0

        pending_t = jnp.where(live0 & (occluded == 0), tmax, 0.0)
        box_hit = _slab(o, d_inv, bxs, node, tmin, pending_t)
        any_box = jnp.any(box_hit)

        def leaf_case(occ):
            count = count_ref[node]
            for k in range(LEAF_UNROLL):
                _, _, _, hit = _mt(o, d, T, first + k, tmin, pending_t)
                occ = occ | (hit & (k < count)).astype(jnp.int32)
            return occ

        occluded = jax.lax.cond(is_leaf & any_box, leaf_case,
                                lambda c: c, occluded)
        done = ~jnp.any(live0 & (occluded == 0))
        nxt = jnp.where(is_leaf | ~any_box, miss_ref[node], node + 1)
        nxt = jnp.where(done, jnp.int32(end), nxt)
        return nxt, occluded

    _, occluded = jax.lax.while_loop(cond, body, (node0, occ0))
    occ_out[jp] = occluded


def pallas_anyhit_chain(
    scene, static, mesh_id: int, inst_id: int,
    rays: jnp.ndarray,       # (6, P, 8, 128) packed world rays (pack_rays)
    tmin: float,
    live: jnp.ndarray,       # (P,) int32
    tmax_reg: jnp.ndarray,   # (P, 8, 128) per-lane shadow window
    occ: jnp.ndarray,        # (P, 8, 128) int32, aliased in/out
) -> jnp.ndarray:
    p = rays.shape[1]
    end, boxes, meta, tris, _normals = _mesh_tables(scene, static, mesh_id)
    w2o12 = scene.w2o[inst_id].reshape(12)

    assert p % PACK_N == 0, f"packet count {p} must be a multiple of {PACK_N}"
    kernel = functools.partial(_anyhit_kernel3, tmin=float(tmin))
    vspec = pl.BlockSpec((PACK_N, K_SUB, K_LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((6, PACK_N, K_SUB, K_LANE), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    n_before = 2 + 18 + 1 + 1 + 1  # end/w2o + tables + live + rays + tmax
    out = pl.pallas_call(
        kernel,
        grid=(p // PACK_N,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_SMEM] * 2 + [_SMEM] * 18 + [_SMEM]
        + [ray_spec, vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((p, K_SUB, K_LANE), jnp.int32),
        input_output_aliases={n_before: 0},
    )(end, w2o12, *boxes, *meta, *tris, live, rays, tmax_reg, occ)
    return out
