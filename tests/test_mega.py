"""Megakernel components testable off-TPU: table packing, the XLA culling
prepass (conservativeness), and dispatch gating.

The compiled kernel itself is TPU-only (interpret mode does not model
aliased block revisits); on TPU its bit-equality against the chained
per-chunk reference path is enforced by :func:`test_mega_bit_identity`
below (TPU-gated) and by ``python bench.py --selftest`` /
``raytpu.bench.bit_identity_check`` (also run inside every driver bench,
emitting ``bit_identical`` into the bench JSON).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytpu.config import MaterialType, ObjectConfig, RenderConfig
from raytpu.io.obj import Mesh, compute_smooth_normals
from raytpu.scene import load_scene
from raytpu.render import Renderer
from raytpu.ops.mega import (
    BLOCK_PACKETS,
    OCTANTS,
    MegaLayout,
    chunk_block_hits,
    octant_links,
    pack_mega_tables,
)
from raytpu.ops.traverse_pallas import PACKET_K, ST_T, make_trace_state


def _box_mesh(center, half):
    c = np.asarray(center, np.float32)
    corners = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half)
         for z in (-half, half)], np.float32) + c
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
         [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
         [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return Mesh(positions=corners,
                normals=compute_smooth_normals(corners, faces),
                triangles=faces, name="box")


@pytest.fixture(scope="module")
def two_box_renderer():
    cfg = RenderConfig(
        objects=(
            ObjectConfig("a", MaterialType.MIRROR, "spin"),
            ObjectConfig("b", MaterialType.DIFFUSE, "orbit"),
        ),
        width=256, height=256, samples_per_pixel=1, max_bounce_count=2,
    )
    sky = np.linspace(0, 1, 6 * 4 * 4 * 3, np.float32).reshape(6, 4, 4, 3)
    scene = load_scene(
        cfg, meshes=[_box_mesh((0, 0, 0), 1.0), _box_mesh((0, 0, 6), 0.5)],
        skybox=sky)
    r = Renderer(scene)
    r.set_transforms(0.25)
    return r


def test_mega_tables_attached(two_box_renderer):
    r = two_box_renderer
    assert r.static.mega_layout is not None
    pn, pt, f32_len, i32_len = r.static.mega_layout
    assert f32_len % 1024 == 0 and i32_len % 1024 == 0
    cmesh = len(r.static.mesh_node_ranges)
    assert r.device_scene.mega_f32.shape == (cmesh * f32_len,)
    assert r.device_scene.mega_i32.shape == (cmesh * i32_len,)
    assert r.device_scene.mega_root.shape == (cmesh, 6)
    oct_len = -(-2 * pn // 1024) * 1024
    assert r.device_scene.mega_oct.shape == (cmesh * OCTANTS * oct_len,)


def test_shadow_tables_attached(two_box_renderer):
    """Anyhit-specialized chunk set: attached, normal-free layout, full
    triangle coverage, one entry per (instance, shadow chunk)."""
    from raytpu.ops.intersect import LEAF_UNROLL
    from raytpu.ops.mega import MegaLayout

    r = two_box_renderer
    st = r.static
    assert st.mega_shadow_layout is not None
    pn, pt, f32_len, i32_len = st.mega_shadow_layout
    lay = MegaLayout(pn, pt - LEAF_UNROLL, normals=False)
    assert lay.f32_len == f32_len          # no normal planes in the layout
    assert f32_len % 1024 == 0
    cs = max(m for _, m in st.shadow_traversal_list) + 1
    assert r.device_scene.mega_sh_f32.shape == (cs * f32_len,)
    assert r.device_scene.mega_sh_root.shape == (cs, 6)
    # every instance contributes at least one shadow entry
    insts = {i for i, _ in st.shadow_traversal_list}
    assert insts == set(range(st.num_instances))


def test_shadow_chunks_cover_all_triangles():
    """The shadow partition must contain every triangle of a chunked mesh
    exactly once (occlusion correctness depends on coverage, not order)."""
    from raytpu.accel.chunking import chunk_order

    rng = np.random.RandomState(11)
    t = 1000
    v0 = rng.randn(t, 3).astype(np.float32)
    e1 = rng.randn(t, 3).astype(np.float32) * 0.1
    e2 = rng.randn(t, 3).astype(np.float32) * 0.1
    order, ranges = chunk_order(v0, e1, e2, chunk_tris=128)
    seen = np.concatenate([order[s : s + c] for s, c in ranges])
    assert sorted(seen.tolist()) == list(range(t))


def _random_bvh_chunk(rng, t):
    """A real (small) threaded BVH over random triangles, as a mega chunk
    dict — octant link computation requires genuine DFS structure."""
    from raytpu.accel.bvh import build_bvh

    v0 = rng.randn(t, 3).astype(np.float32)
    e1 = rng.randn(t, 3).astype(np.float32) * 0.1
    e2 = rng.randn(t, 3).astype(np.float32) * 0.1
    bvh = build_bvh(v0, e1, e2, leaf_size=2)
    order = bvh.tri_order.astype(np.int64)
    return {
        "aabb_min": bvh.aabb_min, "aabb_max": bvh.aabb_max,
        "first": bvh.tri_first, "count": bvh.tri_count, "miss": bvh.miss,
        "v0": v0[order], "e1": e1[order], "e2": e2[order],
        "n_soa": rng.randn(9, t).astype(np.float32),
    }


def test_octant_links_cover_all_nodes():
    """For every octant, the always-hit walk (succ on interior, skip on
    leaf) must enumerate every node exactly once and terminate at M."""
    rng = np.random.RandomState(3)
    for t in (1, 2, 7, 33, 200):
        c = _random_bvh_chunk(rng, t)
        m = c["first"].shape[0]
        succ, skip = octant_links(
            c["aabb_min"], c["aabb_max"], c["first"], c["miss"]
        )
        assert succ.shape == (OCTANTS, m) and skip.shape == (OCTANTS, m)
        for o in range(OCTANTS):
            seen = np.zeros(m, bool)
            node, steps = 0, 0
            while node != m:
                assert 0 <= node < m and not seen[node]
                seen[node] = True
                node = int(
                    succ[o, node] if c["first"][node] < 0 else skip[o, node]
                )
                steps += 1
                assert steps <= m
            assert seen.all()


def test_octant_links_near_first():
    """In each octant, an interior node's succ is the child whose center is
    nearer along the dominant split axis for that direction sign."""
    rng = np.random.RandomState(5)
    c = _random_bvh_chunk(rng, 64)
    m = c["first"].shape[0]
    succ, _ = octant_links(
        c["aabb_min"], c["aabb_max"], c["first"], c["miss"]
    )
    center = (c["aabb_min"] + c["aabb_max"]) * 0.5
    for i in range(m):
        if c["first"][i] >= 0:
            continue
        l, r = i + 1, int(c["miss"][i + 1])
        delta = center[r] - center[l]
        axis = int(np.argmax(np.abs(delta)))
        lower, upper = (l, r) if delta[axis] >= 0 else (r, l)
        for o in range(OCTANTS):
            want = upper if (o >> axis) & 1 else lower
            assert succ[o, i] == want, (i, o)


def test_pack_layout_roundtrip():
    rng = np.random.RandomState(0)
    chunks = [_random_bvh_chunk(rng, t) for t in (7, 4)]
    f32, i32, octs, roots, (pn, pt) = pack_mega_tables(chunks)
    lay = MegaLayout(pn, pt - __import__(
        "raytpu.ops.intersect", fromlist=["LEAF_UNROLL"]).LEAF_UNROLL)
    assert lay.key() == (pn, pt)
    f32 = f32.reshape(len(chunks), -1)
    i32 = i32.reshape(len(chunks), -1)
    for ci, c in enumerate(chunks):
        n, t = c["aabb_min"].shape[0], c["v0"].shape[0]
        # box planes
        for a in range(3):
            np.testing.assert_array_equal(
                f32[ci, a * pn : a * pn + n], c["aabb_min"][:, a])
            np.testing.assert_array_equal(
                f32[ci, (3 + a) * pn : (3 + a) * pn + n], c["aabb_max"][:, a])
        # triangle corner plane 0 (v0.x)
        np.testing.assert_array_equal(
            f32[ci, 6 * pn : 6 * pn + t], c["v0"][:, 0])
        # normals plane 0
        off_nrm = 6 * pn + 9 * pt
        np.testing.assert_array_equal(
            f32[ci, off_nrm : off_nrm + t], c["n_soa"][0])
        # i32: first/count/miss + node-count sentinel
        np.testing.assert_array_equal(i32[ci, :n], c["first"])
        np.testing.assert_array_equal(i32[ci, pn : pn + n], c["count"])
        np.testing.assert_array_equal(i32[ci, 2 * pn : 2 * pn + n], c["miss"])
        assert i32[ci, -1] == n
        # root AABB
        np.testing.assert_array_equal(roots[ci, :3], c["aabb_min"][0])
        np.testing.assert_array_equal(roots[ci, 3:], c["aabb_max"][0])
        # octant ordering tables: succ | skip per (chunk, octant) —
        # widened by default since round 5 (MEGA_WIDE; treelet roots
        # stay threaded for the per-lane top walk)
        succ, skip = octant_links(
            c["aabb_min"], c["aabb_max"], c["first"], c["miss"]
        )
        from raytpu.ops.mega import MEGA_WIDE, widen_octant_links

        if MEGA_WIDE:
            from raytpu.ops.perlane import treelet_partition

            tid, nt = treelet_partition(c["first"], c["count"],
                                        c["miss"])
            first_of = np.ones(n, bool)
            first_of[1:] = tid[1:] != tid[:-1]
            succ, skip = widen_octant_links(
                succ, skip, c["first"], c["miss"],
                keep_extra=(tid < nt) & first_of,
            )
        ot = octs.reshape(len(chunks), OCTANTS, lay.oct_len)
        np.testing.assert_array_equal(ot[ci, :, :n], succ)
        np.testing.assert_array_equal(ot[ci, :, pn : pn + n], skip)


def _exact_block_hits(r, rays, window, tmin):
    """Oracle: per (entry, block), does ANY live lane's exact slab test hit
    the entry's world-space root box?"""
    from raytpu.ops.mega import _world_root_boxes

    lo, hi = _world_root_boxes(r.device_scene, r.static)
    lo, hi = np.asarray(lo), np.asarray(hi)
    rays = np.asarray(rays)
    window = np.asarray(window)
    p = rays.shape[1]
    pb = p // BLOCK_PACKETS
    o = rays[:3].reshape(3, pb, -1)
    d = rays[3:].reshape(3, pb, -1)
    w = window.reshape(pb, -1)
    hits = np.zeros((lo.shape[0], pb), bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0, 1.0 / d, np.where(d >= 0, np.inf, -np.inf))
        for e in range(lo.shape[0]):
            t0 = (lo[e][:, None, None] - o) * inv
            t1 = (hi[e][:, None, None] - o) * inv
            tn = np.minimum(t0, t1)
            tf = np.maximum(t0, t1)
            tn = np.where(np.isnan(tn), -np.inf, tn)
            tf = np.where(np.isnan(tf), np.inf, tf)
            t_near = np.maximum(tn.max(axis=0), tmin)
            t_far = np.minimum(tf.min(axis=0), w)
            hits[e] = ((t_near <= t_far) & (w > tmin)).any(axis=1)
    return hits


def test_prepass_is_conservative(two_box_renderer):
    """chunk_block_hits may overestimate but must NEVER miss a real hit."""
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops.traverse_pallas import pack_rays
    from raytpu.config import RAY_TMAX, RAY_TMIN

    r = two_box_renderer
    rs = r.render_static
    (px, py), _, in_frame = _tiled_pixels(rs)
    cam = jnp.asarray(r.camera.basis())
    o, d = primary_rays_soa((px, py), cam, jnp.float32(0), 1,
                            rs.width, rs.height)
    rays = pack_rays(o, d)
    window = jnp.where(in_frame, jnp.float32(RAY_TMAX), 0.0).reshape(
        px.shape[0], 8, 128)

    bits, octs, depth = chunk_block_hits(
        r.device_scene, r.static, rays, window, RAY_TMIN)
    bits = np.asarray(bits)
    assert np.isfinite(np.asarray(depth)).all()
    # octants: majority direction sign per block
    d = np.asarray(rays)[3:].reshape(3, -1, BLOCK_PACKETS * 1024)
    live = np.asarray(window).reshape(-1, BLOCK_PACKETS * 1024) > RAY_TMIN
    want = 0
    for c in range(3):
        neg = ((d[c] < 0) & live).sum(axis=1)
        want = want | ((neg * 2 > live.sum(axis=1)).astype(np.int32) << c)
    np.testing.assert_array_equal(np.asarray(octs), want)
    exact = _exact_block_hits(r, rays, window, RAY_TMIN)
    pb = exact.shape[1]
    got = (bits[:, np.arange(pb) // 32]
           >> (np.arange(pb) % 32).astype(np.uint32)) & 1
    # conservative: every exact hit must be flagged
    assert ((got == 1) | ~exact).all(), "prepass dropped a real root hit"
    # sanity: the prepass culls whenever the exact test says a whole block
    # misses (on this scene the frame may be a single block that hits both
    # entries, in which case there is nothing to cull)
    if (~exact).any():
        assert got.sum() < got.size


def test_prepass_dead_blocks_culled(two_box_renderer):
    from raytpu.integrator import _tiled_pixels, primary_rays_soa
    from raytpu.ops.traverse_pallas import pack_rays
    from raytpu.config import RAY_TMIN

    r = two_box_renderer
    rs = r.render_static
    (px, py), _, _ = _tiled_pixels(rs)
    cam = jnp.asarray(r.camera.basis())
    o, d = primary_rays_soa((px, py), cam, jnp.float32(0), 1,
                            rs.width, rs.height)
    rays = pack_rays(o, d)
    dead = jnp.zeros((px.shape[0], 8, 128), jnp.float32)
    bits, _, _ = chunk_block_hits(r.device_scene, r.static, rays, dead,
                                  RAY_TMIN)
    assert (np.asarray(bits) == 0).all()


def test_mega_gating_off_tpu(two_box_renderer):
    """On CPU backends the mega path must not be selected."""
    import jax
    from raytpu.ops.trace import _use_mega

    r = two_box_renderer
    if jax.default_backend() == "tpu":
        pytest.skip("gating test is for non-TPU backends")
    assert not _use_mega(r.static, BLOCK_PACKETS * 4, PACKET_K)


def test_mega_bit_identity():
    """TPU-only: the megakernel frame must be BIT-IDENTICAL to the chained
    per-chunk Pallas reference path (the CLAUDE.md invariant, automated —
    the analog of the reference's validation layers,
    ``src/main.cpp:813-848``). The same check runs inside every driver
    bench via ``bit_identity_check`` / ``bench.py --selftest``."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("mega path is TPU-only")
    from raytpu.bench import bit_identity_check

    r = bit_identity_check()
    assert r.get("ok", False), r


def test_widened_octant_links():
    """Wide-node consensus rethreading (round-5 probe,
    mega.widen_octant_links): dropping odd-depth interiors from the
    per-octant threading must (a) enumerate exactly the retained set in
    the always-hit walk, and (b) find the same closest hit as brute
    force when walked with real slab tests — the same superset-of-
    winnable-candidates argument as the treelet pair/quad walks."""
    import numpy as np

    from raytpu.accel.bvh import build_bvh
    from raytpu.ops.mega import octant_links, widen_octant_links

    rng = np.random.RandomState(3)
    n_tris = 500
    v0 = rng.randn(n_tris, 3).astype(np.float32)
    e1 = (rng.randn(n_tris, 3) * 0.15).astype(np.float32)
    e2 = (rng.randn(n_tris, 3) * 0.15).astype(np.float32)
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    order = bvh.tri_order.astype(np.int64)
    tv0, te1, te2 = v0[order], e1[order], e2[order]
    first, count, miss = bvh.tri_first, bvh.tri_count, bvh.miss
    lo, hi = bvh.aabb_min, bvh.aabb_max
    n = first.shape[0]
    leaf = first >= 0

    succ, skip = octant_links(lo, hi, first, miss)
    wsucc, wskip = widen_octant_links(succ, skip, first, miss)

    # retained set: leaves + even-depth interiors
    par = np.full(n, -1, np.int64)
    ii = np.flatnonzero(~leaf)
    par[ii + 1] = ii
    par[np.minimum(miss[ii + 1], n - 1)] = ii
    depth = np.zeros(n, np.int64)
    for i in range(1, n):
        if par[i] >= 0:
            depth[i] = depth[par[i]] + 1
    retained = leaf | (depth % 2 == 0)

    f = np.float32
    for o in range(8):
        # (a) always-hit walk visits exactly the retained nodes, once
        seen = []
        x = 0
        for _ in range(n + 1):
            if x == n:
                break
            seen.append(x)
            x = wskip[o, x] if leaf[x] else wsucc[o, x]
        assert x == n
        assert sorted(seen) == sorted(np.flatnonzero(retained).tolist())

    def mt_all(o_r, d_r, tmin, tmax, sel):
        px = d_r[1] * te2[sel, 2] - d_r[2] * te2[sel, 1]
        py = d_r[2] * te2[sel, 0] - d_r[0] * te2[sel, 2]
        pz = d_r[0] * te2[sel, 1] - d_r[1] * te2[sel, 0]
        det = te1[sel, 0] * px + te1[sel, 1] * py + te1[sel, 2] * pz
        inv = np.where(np.abs(det) > f(1e-9), f(1.0) / det, f(0.0))
        tvx = o_r[0] - tv0[sel, 0]
        tvy = o_r[1] - tv0[sel, 1]
        tvz = o_r[2] - tv0[sel, 2]
        u = (tvx * px + tvy * py + tvz * pz) * inv
        qx = tvy * te1[sel, 2] - tvz * te1[sel, 1]
        qy = tvz * te1[sel, 0] - tvx * te1[sel, 2]
        qz = tvx * te1[sel, 1] - tvy * te1[sel, 0]
        v = (d_r[0] * qx + d_r[1] * qy + d_r[2] * qz) * inv
        t = (te2[sel, 0] * qx + te2[sel, 1] * qy + te2[sel, 2] * qz) * inv
        hit = ((np.abs(det) > f(1e-9)) & (u >= 0) & (v >= 0)
               & (u + v <= 1) & (t > tmin) & (t < tmax))
        return t, hit

    tmin, tmax = f(1e-3), f(1e30)
    hits = 0
    for i in range(120):
        o_r = (rng.randn(3) * 2).astype(f)
        if i % 2 == 0:
            ti = rng.randint(n_tris)
            d_r = (tv0[ti] + te1[ti] / 3 + te2[ti] / 3 - o_r).astype(f)
        else:
            d_r = rng.randn(3).astype(f)
        d_r = (d_r / np.linalg.norm(d_r)).astype(f)
        oc = int((d_r[0] < 0) | ((d_r[1] < 0) << 1) | ((d_r[2] < 0) << 2))
        d_inv = np.where(d_r != 0, f(1.0) / d_r,
                         np.where(d_r >= 0, f(np.inf), f(-np.inf)))
        best = tmax
        x = 0
        steps = 0
        while x != n:
            steps += 1
            assert steps < 10 * n
            t0 = (lo[x] - o_r) * d_inv
            t1 = (hi[x] - o_r) * d_inv
            tn = np.minimum(t0, t1)
            tf = np.maximum(t0, t1)
            bh = max(tn.max(), tmin) <= min(tf.min(), best)
            if leaf[x] and bh:
                sel = slice(first[x], first[x] + count[x])
                t, h = mt_all(o_r, d_r, tmin, best, sel)
                if h.any():
                    best = f(t[h].min())
            x = wsucc[oc, x] if (bh and not leaf[x]) else wskip[oc, x]
        t_all, h_all = mt_all(o_r, d_r, tmin, tmax, slice(0, n_tris))
        ref = f(t_all[h_all].min()) if h_all.any() else tmax
        assert best == ref, (i, best, ref)
        hits += int(h_all.any())
    assert hits > 30
