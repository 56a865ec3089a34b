"""Between-sweep lane re-binning: pack sparse live lanes, bin by octant.

The divergence scheduler of the wavefront tracer (SURVEY.md §2
"divergent-bounce scheduling"; replaces the per-thread independence of the
reference's iterative rgen bounce loop, ``src/shader.rgen:84-177``).

Round-2 measured that PACKET-granular compaction loses (block-bitmask
culling already skips dead blocks, and packet moves scramble tile
coherence) while the remaining cost sits in WITHIN-block sparsity and
direction divergence: a block with 300 live shadow lanes spread over all
8 packets still walks every group, and a mirror-bounce block walks one
broad consensus per group. The VPU has no vector scatter, so lane moves
cannot happen in-kernel — but BETWEEN sweeps they are three cheap XLA
ops: a stable segmented ``sort_key_val`` (key = dead? 8 : direction
octant), plane gathers into sorted order, and a gather back through the
inverse permutation.

Segments span :data:`SEG_BLOCKS` DMA blocks, so sparse live lanes from 8
blocks pack into the leading packets of their segment: the sweep's
per-block liveness culling then skips the emptied blocks entirely (DMA
and walks drop ~8× on sparse sweeps), and the packed packets are
octant-coherent so consensus walks stay narrow after divergent bounces.

Per-lane trace results are permutation-invariant (each lane's hit depends
only on its own ray and the tables; consensus only widens the visited
node set), so re-binned sweeps stay bit-identical — up to the documented
coincident-geometry tie-order caveat (``ops/mega.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytpu.ops.mega import BLOCK_PACKETS, SEG_PACKETS

# DMA blocks per sort segment (64 packets = 65536 lanes): live lanes from
# 8 blocks compact into one. The frame pipeline pads packet counts to
# SEG_PACKETS (ops/mega.py) so segments tile the packet axis exactly.
SEG_BLOCKS = SEG_PACKETS // BLOCK_PACKETS


def _seg_packets(p: int) -> int:
    """Largest supported segment length dividing the packet count."""
    for seg in (SEG_PACKETS, 32, 16, BLOCK_PACKETS):
        if p % seg == 0:
            return seg
    return 0


def octant_key(d, live) -> jnp.ndarray:
    """Per-lane sort key: direction octant for live lanes, 8 for dead —
    dead lanes sink to the segment tail, live lanes bin by octant."""
    key = (
        (d[0] < 0).astype(jnp.int32)
        | ((d[1] < 0).astype(jnp.int32) << 1)
        | ((d[2] < 0).astype(jnp.int32) << 2)
    )
    return jnp.where(live, key, jnp.int32(8))


def rebin_perm(key: jnp.ndarray):
    """Stable segmented argsort of ``key`` (P, K) → (sigma, rank, seg).

    ``sigma`` gathers planes INTO binned order; ``rank`` gathers results
    back (the inverse permutation). Both are (S, L) int32 over segments of
    ``seg`` packets; ``seg == 0`` means the packet count fits no segment
    size (caller skips re-binning).
    """
    p, k = key.shape
    seg = _seg_packets(p)
    if seg == 0:
        return None, None, 0
    s = key.reshape(-1, seg * k)
    iota = jnp.broadcast_to(
        jnp.arange(seg * k, dtype=jnp.int32)[None, :], s.shape
    )
    _, sigma = jax.lax.sort_key_val(s, iota, dimension=1, is_stable=True)
    _, rank = jax.lax.sort_key_val(sigma, iota, dimension=1, is_stable=True)
    return sigma, rank, seg


def permute(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Apply a segmented lane permutation to one (P, K) plane."""
    shape = x.shape
    return jnp.take_along_axis(
        x.reshape(perm.shape), perm, axis=1
    ).reshape(shape)


def permute_vec3(v, perm):
    return tuple(permute(c, perm) for c in v)


def permute_planes(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Apply the permutation to a stacked (N, P, ...) plane array (e.g. the
    packed (9, P, 8, 128) trace state)."""
    n = x.shape[0]
    flat = x.reshape(n, perm.shape[0], perm.shape[1])
    out = jnp.take_along_axis(flat, perm[None], axis=2)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# static sub-tile regrouping ("split"): a fixed reshape/transpose, no sort
# ---------------------------------------------------------------------------
#
# The spp-folded layout makes a packet = one 32×32 tile at one sample index
# (spp adjacent packets per tile). A consensus walk over a sample GROUP
# therefore spans a full tile's worth of surface — for shadow and bounce
# waves that union cone is what keeps walks broad. Splitting each tile
# into spp sub-tiles and stacking the spp sample copies of a sub-tile into
# ONE packet keeps the 1024-lane walk granule but quarters (spp=4) the
# spatial footprint per walk — pure data movement at copy bandwidth
# (reshape + transpose, no gather, involutive pairing with tile_merge).
# Regrouped sweeps run with group=1 (the packet already holds all samples).

def can_split(p: int, k: int, spp: int) -> bool:
    return k == 1024 and spp in (2, 4) and p % spp == 0


def tile_split(x: jnp.ndarray, spp: int) -> jnp.ndarray:
    """(P, K) spp-interleaved tile packets → sub-tile×spp packets."""
    p, k = x.shape
    t = p // spp
    if spp == 4:
        # lanes iy*32+ix = (qy·16+ry)·32 + qx·16+rx → dims (qy,ry,qx,rx)
        y = x.reshape(t, 4, 2, 16, 2, 16)         # (t, s, qy, ry, qx, rx)
        return y.transpose(0, 2, 4, 1, 3, 5).reshape(p, k)
    if spp == 2:
        y = x.reshape(t, 2, 2, 16, 32)            # (t, s, qy, ry, ix)
        return y.transpose(0, 2, 1, 3, 4).reshape(p, k)
    return x


def tile_merge(x: jnp.ndarray, spp: int) -> jnp.ndarray:
    """Inverse of :func:`tile_split`."""
    p, k = x.shape
    t = p // spp
    if spp == 4:
        y = x.reshape(t, 2, 2, 4, 16, 16)         # (t, qy, qx, s, ry, rx)
        return y.transpose(0, 3, 1, 4, 2, 5).reshape(p, k)
    if spp == 2:
        y = x.reshape(t, 2, 2, 16, 32)            # (t, qy, s, ry, ix)
        return y.transpose(0, 2, 1, 3, 4).reshape(p, k)
    return x


def tile_split_vec3(v, spp):
    return tuple(tile_split(c, spp) for c in v)


def tile_split_planes(x: jnp.ndarray, spp: int, merge: bool = False):
    """Split/merge a stacked (N, P, 8, 128) plane array."""
    n, p = x.shape[0], x.shape[1]
    flat = x.reshape(n, p, 1024)
    fn = tile_merge if merge else tile_split
    out = jnp.stack([fn(flat[i], spp) for i in range(n)])
    return out.reshape(x.shape)
