"""Between-sweep lane re-binner (ops/rebin.py): permutation correctness.

The re-binned sweeps themselves are TPU-only (mega path); these tests pin
the XLA permutation machinery — stable segmented binning, exact inversion,
plane roundtrips — which is what bit-identity of re-binned sweeps rests on.
"""

import jax.numpy as jnp
import numpy as np

from raytpu.ops.mega import BLOCK_PACKETS, SEG_PACKETS
from raytpu.ops.rebin import (
    SEG_BLOCKS,
    octant_key,
    permute,
    permute_planes,
    permute_vec3,
    rebin_perm,
)

K = 1024


def _random_key(rng, p):
    return jnp.asarray(rng.randint(0, 9, size=(p, K)).astype(np.int32))


def test_constants_consistent():
    assert SEG_PACKETS == SEG_BLOCKS * BLOCK_PACKETS


def test_octant_key_values():
    d = (
        jnp.asarray([[1.0, -1.0]]),
        jnp.asarray([[-1.0, 1.0]]),
        jnp.asarray([[1.0, -1.0]]),
    )
    live = jnp.asarray([[True, False]])
    key = np.asarray(octant_key(d, live))
    assert key[0, 0] == 0b010   # y negative only
    assert key[0, 1] == 8       # dead lane sinks


def test_rebin_perm_is_permutation_and_inverse():
    rng = np.random.RandomState(0)
    p = SEG_PACKETS * 2
    key = _random_key(rng, p)
    sigma, rank, seg = rebin_perm(key)
    assert seg == SEG_PACKETS
    s, l = np.asarray(sigma).shape
    assert (s, l) == (2, SEG_PACKETS * K)
    for row in range(s):
        assert sorted(np.asarray(sigma)[row].tolist()) == list(range(l))
    # rank inverts sigma: gather(gather(x, sigma), rank) == x
    x = jnp.asarray(rng.rand(p, K).astype(np.float32))
    y = permute(permute(x, sigma), rank)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_rebin_sorts_keys_stably_per_segment():
    rng = np.random.RandomState(1)
    p = SEG_PACKETS
    key = _random_key(rng, p)
    sigma, rank, seg = rebin_perm(key)
    got = np.asarray(permute(key, sigma)).reshape(-1)
    kn = np.asarray(key).reshape(-1)
    # sorted ascending (dead=8 at the tail), and stable within equal keys
    assert (np.diff(got) >= 0).all()
    order = np.asarray(sigma)[0]
    for v in range(9):
        pos = order[kn[order] == v]
        assert (np.diff(pos) > 0).all(), f"unstable for key {v}"


def test_permute_planes_matches_per_plane():
    rng = np.random.RandomState(2)
    p = SEG_PACKETS
    key = _random_key(rng, p)
    sigma, rank, _ = rebin_perm(key)
    x = jnp.asarray(rng.rand(9, p, 8, 128).astype(np.float32))
    got = np.asarray(permute_planes(x, sigma))
    for i in range(9):
        want = np.asarray(permute(x[i].reshape(p, K), sigma)).reshape(
            p, 8, 128
        )
        np.testing.assert_array_equal(got[i], want)


def test_permute_vec3_roundtrip():
    rng = np.random.RandomState(3)
    p = SEG_PACKETS
    key = _random_key(rng, p)
    sigma, rank, _ = rebin_perm(key)
    v = tuple(jnp.asarray(rng.rand(p, K).astype(np.float32))
              for _ in range(3))
    v2 = permute_vec3(permute_vec3(v, sigma), rank)
    for a, b in zip(v, v2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tile_split_roundtrip_and_semantics():
    from raytpu.ops.rebin import can_split, tile_merge, tile_split

    for spp in (2, 4):
        t = 3
        p = t * spp
        x = jnp.arange(p * K, dtype=jnp.int32).reshape(p, K)
        y = np.asarray(tile_split(x, spp))
        # roundtrip
        np.testing.assert_array_equal(
            np.asarray(tile_merge(jnp.asarray(y), spp)), np.asarray(x)
        )
        # semantics: new packet q of tile 0 holds, for each sample s, the
        # pixels of sub-tile q — check one known lane for spp=4
        if spp == 4:
            # original lane (tile 0, sample s, iy, ix) has value
            # s*1024 + iy*32 + ix; new packet (qy=0, qx=1), sample 2,
            # ry=3, rx=5 → original iy=3, ix=16+5
            got = y[1, 2 * 256 + 3 * 16 + 5]
            assert got == 2 * 1024 + 3 * 32 + (16 + 5)
    assert can_split(8, 1024, 4)
    assert not can_split(8, 1024, 3)
    assert not can_split(8, 512, 4)
    assert not can_split(7, 1024, 2)


def test_tile_split_planes_matches_per_plane():
    from raytpu.ops.rebin import tile_split, tile_split_planes

    rng = np.random.RandomState(6)
    p = 8
    x = jnp.asarray(rng.rand(9, p, 8, 128).astype(np.float32))
    got = np.asarray(tile_split_planes(x, 4))
    for i in range(9):
        want = np.asarray(
            tile_split(x[i].reshape(p, K), 4)
        ).reshape(p, 8, 128)
        np.testing.assert_array_equal(got[i], want)
    back = tile_split_planes(jnp.asarray(got), 4, merge=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_fallback_segment_sizes():
    rng = np.random.RandomState(4)
    # 24 packets: not divisible by 64 or 32 → seg 8
    key = _random_key(rng, 24)
    sigma, rank, seg = rebin_perm(key)
    assert seg == BLOCK_PACKETS
    # 9 packets: no supported segment → rebin disabled
    key = _random_key(rng, 9)
    sigma, rank, seg = rebin_perm(key)
    assert seg == 0 and sigma is None
