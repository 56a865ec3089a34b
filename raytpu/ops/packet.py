"""Packet (consensus) BVH traversal — the TPU-native trace kernel.

Why packets: the per-ray threaded traversal (``ops/traverse.py``) needs an
(R,)-indexed gather of node records every step. XLA TPU lowers large gathers
to serialized dynamic-slices — measured ~4 orders of magnitude off the
BASELINE north star, and it can crash the TPU worker at frame scale. The
vector-machine formulation is classic SIMD **packet tracing**: group rays
into spatially-coherent packets (pixel tiles); each *packet* carries ONE
node pointer into the same threaded (skip-link) BVH layout; each step:

* gather P node records (P = a few thousand packets — tiny);
* slab-test ALL K rays of each packet against its packet's node — a dense
  (P, K) broadcast VPU op, no per-ray gather;
* consensus: descend (``node+1``) if ANY live lane hit the box, else take
  the skip link; leaves test their ≤LEAF_UNROLL triangles against the whole
  packet (again dense: the leaf's triangles are contiguous by construction).

Per-lane correctness is preserved (each lane keeps its own best hit and
t-window); packets only share the traversal ORDER, which is conservative —
a packet may visit nodes some lanes don't need, never the reverse.
Efficiency therefore depends on intra-packet coherence: primary rays are
generated in pixel-tile order (``integrator``), and secondary rays inherit
that locality.

This replaces what ``traceRayEXT`` hardware does per-thread on the GPU
(``src/shader.rgen:86,111``) with the shape a TPU actually likes: scalar-ish
control flow (P small), dense vector math (P×K big), zero per-lane gathers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from raytpu.device_scene import DeviceScene, SceneStatic
from raytpu.ops.intersect import BIG_T, moller_trumbore
from raytpu.ops.traverse import LEAF_UNROLL


def _packet_leaf_tris(scene: DeviceScene, tri_base: int, first: jnp.ndarray):
    """Gather each packet's leaf triangle block: (P, LEAF_UNROLL, 3) x3.

    Leaf triangles are contiguous (builder reorders them), so this is
    LEAF_UNROLL row-gathers of P rows — small.
    """
    slots = tri_base + jnp.maximum(first, 0)[:, None] + jnp.arange(LEAF_UNROLL)[None, :]
    slots = jnp.minimum(slots, scene.bvh_tri_v0.shape[0] - 1)  # (P, L)
    v0 = jnp.take(scene.bvh_tri_v0, slots, axis=0)  # (P, L, 3)
    e1 = jnp.take(scene.bvh_tri_e1, slots, axis=0)
    e2 = jnp.take(scene.bvh_tri_e2, slots, axis=0)
    return slots, v0, e1, e2


def packet_closest(
    scene: DeviceScene,
    static: SceneStatic,
    mesh_id: int,
    o: jnp.ndarray,     # (P, K, 3) object-space origins
    d: jnp.ndarray,     # (P, K, 3) object-space directions
    tmin: float,
    tmax: jnp.ndarray,  # (P, K) per-lane prune window
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest hit for packets of rays. Returns (t, prim, u, v) of shape
    (P, K); ``prim`` is the GLOBAL primitive id or -1."""
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    tri_base, _ = static.mesh_bvh_tri_ranges[mesh_id]
    end = node_base + node_count

    p, k = o.shape[0], o.shape[1]
    inv_d = jnp.where(d != 0.0, 1.0 / d, jnp.where(d >= 0, jnp.inf, -jnp.inf))
    tmax_pk = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (p, k))

    lane_live0 = tmax_pk > tmin
    node0 = jnp.where(
        jnp.any(lane_live0, axis=1), jnp.int32(node_base), jnp.int32(end)
    )

    def cond(state):
        node = state[0]
        return jnp.any(node != end)

    def body(state):
        node, best_t, best_slot, best_u, best_v = state
        n = jnp.minimum(node, end - 1)
        bmin = jnp.take(scene.bvh_aabb_min, n, axis=0)      # (P, 3)
        bmax = jnp.take(scene.bvh_aabb_max, n, axis=0)
        first = jnp.take(scene.bvh_tri_first, n, axis=0)    # (P,)
        count = jnp.take(scene.bvh_tri_count, n, axis=0)
        miss = jnp.take(scene.bvh_miss, n, axis=0) + node_base

        parked = node == end
        is_leaf = (first >= 0) & ~parked

        # --- leaf: dense (P, K, L) triangle tests ---
        slots, lv0, le1, le2 = _packet_leaf_tris(scene, tri_base, first)
        t, u, v, hit = moller_trumbore(
            o[:, :, None, :], d[:, :, None, :],
            lv0[:, None, :, :], le1[:, None, :, :], le2[:, None, :, :],
            tmin, best_t[:, :, None],
        )  # (P, K, L)
        valid = (
            is_leaf[:, None, None]
            & (jnp.arange(LEAF_UNROLL)[None, None, :] < count[:, None, None])
        )
        t = jnp.where(hit & valid, t, BIG_T)
        arg = jnp.argmin(t, axis=2)                       # (P, K)
        tsel = jnp.take_along_axis(t, arg[..., None], axis=2)[..., 0]
        better = tsel < best_t
        slot_sel = jnp.take_along_axis(
            jnp.broadcast_to(slots[:, None, :], t.shape), arg[..., None], axis=2
        )[..., 0]
        usel = jnp.take_along_axis(u, arg[..., None], axis=2)[..., 0]
        vsel = jnp.take_along_axis(v, arg[..., None], axis=2)[..., 0]
        best_slot = jnp.where(better, slot_sel.astype(jnp.int32), best_slot)
        best_u = jnp.where(better, usel, best_u)
        best_v = jnp.where(better, vsel, best_v)
        best_t = jnp.where(better, tsel, best_t)

        # --- inner: slab test vs this packet's ONE node (broadcast) ---
        t0 = (bmin[:, None, :] - o) * inv_d                 # (P, K, 3)
        t1 = (bmax[:, None, :] - o) * inv_d
        t_near = jnp.max(jnp.maximum(jnp.minimum(t0, t1), tmin), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        lane_hit = (t_near <= jnp.minimum(t_far, best_t))   # (P, K)
        any_hit_box = jnp.any(lane_hit & (best_t > tmin), axis=1)

        nxt = jnp.where(is_leaf | ~any_hit_box, miss, node + 1)
        node = jnp.where(parked, end, nxt)
        return node, best_t, best_slot, best_u, best_v

    init = (
        node0,
        tmax_pk,
        jnp.full((p, k), -1, jnp.int32),
        jnp.zeros((p, k), jnp.float32),
        jnp.zeros((p, k), jnp.float32),
    )
    _, best_t, best_slot, best_u, best_v = jax.lax.while_loop(cond, body, init)

    hit = best_slot >= 0
    prim = jnp.where(
        hit,
        jnp.take(scene.bvh_tri_prim, jnp.maximum(best_slot, 0), axis=0),
        jnp.int32(-1),
    )
    return jnp.where(hit, best_t, BIG_T), prim, best_u, best_v


def packet_anyhit(
    scene: DeviceScene,
    static: SceneStatic,
    mesh_id: int,
    o: jnp.ndarray,     # (P, K, 3)
    d: jnp.ndarray,
    tmin: float,
    tmax: jnp.ndarray,  # (P, K)
) -> jnp.ndarray:
    """Occlusion for packets: a packet parks when every live lane is
    occluded (or was never live)."""
    node_base, node_count = static.mesh_node_ranges[mesh_id]
    tri_base, _ = static.mesh_bvh_tri_ranges[mesh_id]
    end = node_base + node_count

    p, k = o.shape[0], o.shape[1]
    inv_d = jnp.where(d != 0.0, 1.0 / d, jnp.where(d >= 0, jnp.inf, -jnp.inf))
    tmax_pk = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (p, k))
    live0 = tmax_pk > tmin
    node0 = jnp.where(jnp.any(live0, axis=1), jnp.int32(node_base), jnp.int32(end))

    def cond(state):
        return jnp.any(state[0] != end)

    def body(state):
        node, occluded = state
        n = jnp.minimum(node, end - 1)
        bmin = jnp.take(scene.bvh_aabb_min, n, axis=0)
        bmax = jnp.take(scene.bvh_aabb_max, n, axis=0)
        first = jnp.take(scene.bvh_tri_first, n, axis=0)
        count = jnp.take(scene.bvh_tri_count, n, axis=0)
        miss = jnp.take(scene.bvh_miss, n, axis=0) + node_base

        parked = node == end
        is_leaf = (first >= 0) & ~parked
        pending = live0 & ~occluded  # lanes still needing an answer

        slots, lv0, le1, le2 = _packet_leaf_tris(scene, tri_base, first)
        _, _, _, hit = moller_trumbore(
            o[:, :, None, :], d[:, :, None, :],
            lv0[:, None, :, :], le1[:, None, :, :], le2[:, None, :, :],
            tmin, tmax_pk[:, :, None],
        )
        valid = (
            is_leaf[:, None, None]
            & (jnp.arange(LEAF_UNROLL)[None, None, :] < count[:, None, None])
        )
        occluded = occluded | jnp.any(hit & valid, axis=2)
        pending = live0 & ~occluded

        t0 = (bmin[:, None, :] - o) * inv_d
        t1 = (bmax[:, None, :] - o) * inv_d
        t_near = jnp.max(jnp.maximum(jnp.minimum(t0, t1), tmin), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        lane_hit = (t_near <= jnp.minimum(t_far, tmax_pk)) & pending
        any_hit_box = jnp.any(lane_hit, axis=1)
        all_done = ~jnp.any(pending, axis=1)

        nxt = jnp.where(is_leaf | ~any_hit_box, miss, node + 1)
        node = jnp.where(parked | all_done, end, nxt)
        return node, occluded

    _, occluded = jax.lax.while_loop(
        cond, body, (node0, jnp.zeros((p, k), bool))
    )
    return occluded
