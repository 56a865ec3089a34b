"""MXU "texture unit": cube-map sampling via windowed matmul selection.

The reference samples its skybox through dedicated texture hardware
(``texture(samplerCube, dir)`` with a LINEAR sampler, ``src/shader.rgen:92``
+ ``src/main.cpp:2393-2406``). The TPU has no texture unit and no fast
vector gather — XLA per-lane gathers cost ~7ns/lane (measured; see
``docs/architecture.md`` §7), which made the deferred skybox fetch a
double-digit share of a 1080p frame. This module builds the TPU-native
equivalent out of the two things the chip *is* good at: **async DMA** and
the **MXU**.

Design (per 1024-ray packet = one (8,128) vector register per component):

1. **Consensus window analysis** (XLA, vector ops): miss lanes of a packet
   are angularly coherent (same pixel tile), so their texels cluster. Per
   packet, find the ≤3 cube faces its miss lanes touch (a 32×32-pixel tile
   can straddle at most 3 faces — a cube corner), and a 128×256-texel
   window per face. Window origins are tile-aligned (y0 % 8 == 0,
   x0 % 128 == 0) so Mosaic can prove DMA legality; the 256-wide window
   guarantees any ≤128-texel x-span fits after alignment.
2. **Pallas kernel**: DMA each window from the packed-u32 cube map in HBM
   into VMEM, then evaluate each lane's filter with a matmul-shaped
   contraction instead of gathers: with column weights ``B[c,l]`` the MXU
   product ``M[r,l] = Σ_c T[r,c]·B[c,l]`` contracts the LONG (256-texel)
   window axis; row weights ``A[r,l]`` then reduce ``Σ_r A⊙M`` over the
   short (≤64-row) axis on the VPU. Row/column tiles outside the packet's
   consensus texel span are predicated off entirely (their weights are
   exactly zero), so weight construction and matmuls cost proportional to
   the actual span on coherent packets. One-hot weights give a bit-exact
   nearest tap; **tent weights give true separable bilinear** in the same
   contraction — filtering that costs 4 gathers/lane on the VPU is free
   on the MXU. Channel values (≤255) and one-hot weights are exact in
   bf16 (the MXU rounds f32 operands to bf16 — a single f32 matmul on
   the packed word is NOT exact; measured on v5e).
3. **Fallbacks**: divergent packets (secondary-bounce misses) are
   compacted by whole packets — contiguous 4KB-row gathers, not per-lane —
   into the smallest of a LADDER of static budgets covering the wave's
   actual bad-packet count (a taken tier always gathers its full budget,
   so tier size matters), then sampled exactly with ONE quad-packed
   gather per channel (``sample_cubemap_u32_quad`` — the whole 2×2
   bilinear footprint per word) instead of 4 taps. If even the largest
   tier overflows, a nested ``lax.cond`` falls back to the full gather
   sweep. The measured floor: the gather is latency-bound per random
   tap, and bad packets are irreducibly divergent (window widening,
   more face slots, lane re-binning, and miss-class splitting all
   measured-failed to shrink them — docs/roadmap.md round-3e).
   Nearest mode is bit-identical to
   :func:`raytpu.ops.sky.sample_cubemap_u32_nearest` on miss lanes in
   every tier; bilinear mode matches
   :func:`raytpu.ops.sky.sample_cubemap_u32` to within bf16 weight
   quantization (≤1 u8 LSB) on MXU packets and to f32-ulp level on
   gather-fallback packets.

Cost model (TPU v5e, measured): ~1.9µs marginal per packet (64KB DMA +
24 small bf16 matmuls) vs ~7ns × 1024 lanes ≈ 7µs+ for the gather path —
and packets with no miss lanes are skipped entirely via an SMEM flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.ops.sky import (
    face_st,
    sample_cubemap_u32,
    sample_cubemap_u32_nearest,
    sample_cubemap_u32_quad,
)

K_SUB = 8
K_LANE = 128
PACKET_K = K_SUB * K_LANE

WIN_H = 64    # window rows; y0 aligned to 8 (sublane tile). Taller spans
              # (rare: only strongly divergent packets) take the gather
              # fallback via the ``ok`` flag.
WIN_W = 256   # window cols; x0 aligned to 128 (lane tile) — any 128-span fits
ROW_TILE = 32   # VPU row-reduce granule (tile 1 predicated off when unused)
COL_TILE = 128  # MXU contraction granule (tile 1 predicated off when unused)
MAX_FACES = 3  # a convex pixel-tile frustum touches ≤3 cube faces (a corner)
SKY_SUPER = 4  # packets per grid step (amortizes the per-step floor over
               # skipped no-miss packets)

# LARGEST compacted-gather fallback tier = p // FALLBACK_DIV packets
# (min 32). A taken tier always gathers its full static budget, so
# _sample_mxu builds a ladder of quarter/half/full tiers and the frame
# takes the smallest one covering the wave's actual bad-packet count
# (nbad above the largest tier falls to the FULL per-lane gather).
# Module-level so probes can sweep it (tools/r4_skybudget_ab.py).
FALLBACK_DIV = 8
# When truthy, _sample_mxu returns a per-wave diagnostic count broadcast
# as the sky value instead of sampling (probe-only, never default; axon
# supports no debug callbacks, so the count rides the frame output).
# True/"nbad" = bad-packet count; "lanes" = miss-LANE count within bad
# packets (sizes a lane-compacted fallback).
DEBUG_NBAD = False

_INV255 = 1.0 / 255.0


def mxu_supported(h: int, w: int, k: int) -> bool:
    """Static eligibility: packet width and map dims fit the window scheme.

    The 128-row floor (> WIN_H) keeps tiny maps on the plain gather path,
    where they are cheap anyway."""
    return (
        k == PACKET_K
        and h >= 128
        and h % K_SUB == 0
        and w >= WIN_W
        and w % K_LANE == 0
    )


def _kernel(
    do_ref,        # (P,) SMEM i32: 1 = packet has misses and fits windows
    nw_ref,        # (P,) SMEM i32: number of windows (1..3)
    facew_ref,     # (3P,) SMEM i32: face per (slot, packet), slot-major
    row0d8_ref,    # (3P,) SMEM i32: global window row / 8
    x0d128_ref,    # (3P,) SMEM i32: window col / 128
    y0l_ref,       # (3P,) SMEM i32: face-local window row origin
    span2_ref,     # (2, 3P) SMEM i32: extra row/col tiles beyond tile 0
    yc_ref,        # (SKY_SUPER, 1, 1024) VMEM: texel row per lane
    xc_ref,        # (SKY_SUPER, 1, 1024) VMEM: texel col per lane
    facel_ref,     # (SKY_SUPER, 1, 1024) VMEM i32: face per lane
    sky_ref,       # (6h, w) HBM u32: packed RGB8 cube map
    out_ref,       # (3, SKY_SUPER, 1, 1024) VMEM f32: RGB out
    win_ref,       # (SKY_SUPER, MAX_FACES, WIN_H, WIN_W) VMEM u32 scratch
    sem,           # (SKY_SUPER, MAX_FACES) DMA semaphores
    *,
    num_packets: int,
    bilinear: bool,
):
    """Windowed filter evaluation, MXU-major, lane-major.

    ``val[l] = Σ_r Σ_c T[r,c]·a[r,l]·b[c,l]`` with ALL 1024 lanes of the
    packet along the lane axis: the LONG (column) contraction runs on the
    MXU — ``M[r,l] = Σ_c T[r,c]·b[c,l]`` per 128-column tile, (RT,CT)
    @ (CT,1024) — and the short (≤64-row) reduction on the VPU. Weights
    are built ONCE per packet window (no per-sublane loop), and row /
    column tiles outside the packet's consensus texel span are skipped
    entirely (their weights are exactly zero: tent support and one-hot
    taps lie inside [min, max] of the lane taps), so both weight
    construction and matmul work are span-proportional on coherent
    packets.
    """
    out_ref[...] = jnp.zeros((3, SKY_SUPER, 1, PACKET_K), jnp.float32)
    # phase 1: ISSUE every live window DMA of the grid step before any
    # compute — serialized start();wait() pairs paid a full HBM round
    # trip per window (up to 12 per grid step). With SKY_SUPER*MAX_FACES
    # scratch windows + a semaphore array all 12 copies are in flight
    # together (measured ~2.5 ms/frame on config4/reference).
    for sub in range(SKY_SUPER):
        _issue_one(
            sub, do_ref, nw_ref, row0d8_ref, x0d128_ref, sky_ref,
            win_ref, sem, num_packets=num_packets,
        )
    # phase 2: wait + evaluate per window
    for sub in range(SKY_SUPER):
        _kernel_one(
            sub, do_ref, nw_ref, facew_ref, row0d8_ref, x0d128_ref,
            y0l_ref, span2_ref, yc_ref, xc_ref, facel_ref, sky_ref,
            out_ref, win_ref, sem,
            num_packets=num_packets, bilinear=bilinear,
        )


def _win_copy(sky_ref, win_ref, sem, sub, wslot, row0d8, x0d128):
    """The (sub, wslot) window's async copy descriptor (built identically
    at issue and wait sites; indices are static, coords SMEM scalars)."""
    return pltpu.make_async_copy(
        # ×8 / ×128 prove sublane/lane-tile alignment to Mosaic
        sky_ref.at[pl.ds(row0d8 * 8, WIN_H),
                   pl.ds(x0d128 * K_LANE, WIN_W)],
        win_ref.at[sub, wslot],
        sem.at[sub, wslot],
    )


def _issue_one(sub, do_ref, nw_ref, row0d8_ref, x0d128_ref, sky_ref,
               win_ref, sem, *, num_packets: int):
    """Start every live window DMA for one of the step's packets."""
    raw = pl.program_id(0) * SKY_SUPER + sub
    pid = jnp.minimum(raw, num_packets - 1)

    @pl.when((raw < num_packets) & (do_ref[pid] != 0))
    def _():
        for wslot in range(MAX_FACES):
            @pl.when(wslot < nw_ref[pid])
            def _():
                si = wslot * num_packets + pid
                _win_copy(sky_ref, win_ref, sem, sub, wslot,
                          row0d8_ref[si], x0d128_ref[si]).start()


def _kernel_one(
    sub, do_ref, nw_ref, facew_ref, row0d8_ref, x0d128_ref, y0l_ref,
    span2_ref, yc_ref, xc_ref, facel_ref, sky_ref, out_ref, win_ref, sem,
    *, num_packets: int, bilinear: bool,
):
    """Evaluate one of the grid step's SKY_SUPER packets (see _kernel)."""
    raw = pl.program_id(0) * SKY_SUPER + sub
    # clamp for safe SMEM reads in the (masked-off) tail grid step
    pid = jnp.minimum(raw, num_packets - 1)

    @pl.when((raw < num_packets) & (do_ref[pid] != 0))
    def _():
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, 1), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (COL_TILE, 1), 0)
        for wslot in range(MAX_FACES):
            @pl.when(wslot < nw_ref[pid])
            def _():
                si = wslot * num_packets + pid
                fw = facew_ref[si]
                y0 = y0l_ref[si]
                x0 = x0d128_ref[si] * K_LANE  # ×128 proves lane-tile alignment
                n_rt = 1 + span2_ref[0, si]   # live row tiles
                n_ct = 1 + span2_ref[1, si]   # live col tiles
                # the copy was started in the issue phase (_issue_one)
                _win_copy(sky_ref, win_ref, sem, sub, wslot,
                          row0d8_ref[si], x0d128_ref[si]).wait()

                def chan_tile(rt, ct):       # 3 × (RT, CT) bf16
                    w32 = win_ref[sub, wslot,
                                  rt * ROW_TILE:(rt + 1) * ROW_TILE,
                                  ct * COL_TILE:(ct + 1) * COL_TILE]
                    return [
                        ((w32 >> sh) & 0xFF)
                        .astype(jnp.int32)  # no direct u32→bf16 lowering
                        .astype(jnp.float32)
                        .astype(jnp.bfloat16)
                        for sh in (0, 8, 16)
                    ]

                if bilinear:
                    # tent weights at the (clamped) sample position ARE
                    # the separable bilinear weights, clamp-to-edge incl.
                    fy = yc_ref[sub, 0:1, :] - y0.astype(jnp.float32)
                    fx = xc_ref[sub, 0:1, :] - x0.astype(jnp.float32)

                    def row_w(rt):                    # (RT, 1024) f32
                        r = (iota_r + rt * ROW_TILE).astype(jnp.float32)
                        return jnp.maximum(1.0 - jnp.abs(fy - r), 0.0)

                    def col_w(ct):                    # (CT, 1024) bf16
                        c = (iota_c + ct * COL_TILE).astype(jnp.float32)
                        return jnp.maximum(
                            1.0 - jnp.abs(fx - c), 0.0
                        ).astype(jnp.bfloat16)
                else:
                    yl = yc_ref[sub, 0:1, :] - y0     # (1, 1024) i32
                    xl = xc_ref[sub, 0:1, :] - x0

                    def row_w(rt):
                        return (
                            iota_r + rt * ROW_TILE == yl
                        ).astype(jnp.float32)

                    def col_w(ct):
                        return (
                            iota_c + ct * COL_TILE == xl
                        ).astype(jnp.bfloat16)

                sel = facel_ref[sub, 0:1, :] == fw
                inv = jnp.float32(_INV255)
                val = [jnp.zeros((1, PACKET_K), jnp.float32)] * 3
                b0 = col_w(0)
                for rt in range(WIN_H // ROW_TILE):
                    def tile_val(val, rt=rt):
                        a = row_w(rt)
                        # M[r,l] = Σ_c T[r,c]·b[c,l] per column tile;
                        # tiles past the packet's span (ct >= n_ct) are
                        # predicated off — their weights are exactly zero
                        ts = chan_tile(rt, 0)
                        ms = [
                            jax.lax.dot_general(
                                t, b0, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for t in ts
                        ]                            # (RT, 1024)
                        for ct in range(1, WIN_W // COL_TILE):
                            def add_ct(ms, ct=ct):
                                b = col_w(ct)
                                ts1 = chan_tile(rt, ct)
                                return [
                                    m + jax.lax.dot_general(
                                        t, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                    )
                                    for m, t in zip(ms, ts1)
                                ]

                            ms = jax.lax.cond(
                                n_ct > ct, add_ct, lambda ms: ms, ms
                            )
                        return [
                            v + jnp.sum(a * m, axis=0, keepdims=True)
                            for v, m in zip(val, ms)
                        ]

                    val = jax.lax.cond(
                        rt < n_rt, tile_val, lambda v: v, val
                    )
                for c in range(3):
                    cur = out_ref[c, sub, 0:1, :]
                    out_ref[c, sub, 0:1, :] = jnp.where(
                        sel, val[c] * inv, cur
                    )


def _analyze(face, ylo, yhi, xlo, xhi, miss, h: int, w: int):
    """Per-packet consensus windows over lane tap ranges [lo, hi].

    The wave-sized reductions are fused into TWO passes over the (P, K)
    arrays — one bitwise-OR reduction for per-face presence and one
    12-operand variadic ``lax.reduce`` for every slot's window min/max —
    instead of 6 ``any`` + 12 separate masked min/max reductions, each of
    which re-read the wave from HBM (measured ~2-3 ms of the sky stage at
    1080p). Pure integer min/max/or restructuring: bit-identical windows.
    """
    p = face.shape[0]
    # per-face presence bits in one OR-reduction: lane -> (1 << face)
    pbits = jax.lax.reduce(
        jnp.where(miss, jnp.int32(1) << face, 0),
        jnp.int32(0), jax.lax.bitwise_or, (1,),
    )
    cnt = jnp.zeros((p,), jnp.int32)
    slot_face = [jnp.full((p,), -1, jnp.int32) for _ in range(MAX_FACES)]
    for f in range(6):
        pres = (pbits >> f) & 1 == 1
        for s in range(MAX_FACES):
            slot_face[s] = jnp.where(pres & (cnt == s), f, slot_face[s])
        cnt = cnt + pres.astype(jnp.int32)
    ok = cnt <= MAX_FACES

    big = jnp.int32(1 << 30)
    # one variadic pass: (ymin, ymax, xmin, xmax) per slot, masked inline
    # (the where() producers fuse into the reduce inputs)
    operands, inits = [], []
    for s in range(MAX_FACES):
        m = miss & (face == slot_face[s][:, None])
        operands += [
            jnp.where(m, ylo, big), jnp.where(m, yhi, -1),
            jnp.where(m, xlo, big), jnp.where(m, xhi, -1),
        ]
        inits += [big, jnp.int32(-1), big, jnp.int32(-1)]

    def _minmax4(a, b):
        out = []
        for i in range(0, 4 * MAX_FACES, 4):
            out += [
                jnp.minimum(a[i], b[i]), jnp.maximum(a[i + 1], b[i + 1]),
                jnp.minimum(a[i + 2], b[i + 2]),
                jnp.maximum(a[i + 3], b[i + 3]),
            ]
        return tuple(out)

    red = jax.lax.reduce(tuple(operands), tuple(inits), _minmax4, (1,))

    facew, row0d8, x0d128, y0l, rt1, ct1 = [], [], [], [], [], []
    for s in range(MAX_FACES):
        ymin, ymax, xmin, xmax = red[4 * s:4 * s + 4]
        y0 = jnp.clip((ymin // K_SUB) * K_SUB, 0, h - WIN_H)
        x0 = jnp.clip((xmin // K_LANE) * K_LANE, 0, w - WIN_W)
        # empty slots have ymax = -1 < y0 + WIN_H, so they pass trivially
        ok = ok & (ymax - y0 < WIN_H) & (xmax - x0 < WIN_W)
        f_safe = jnp.maximum(slot_face[s], 0)
        facew.append(slot_face[s])
        row0d8.append((f_safe * h + y0) // K_SUB)
        x0d128.append(x0 // K_LANE)
        y0l.append(y0)
        # extra row/column tiles covering the span beyond tile 0 (the
        # kernel runs 1 + this many; empty slots: spans are negative →
        # floor-div gives -1 → zero tiles run, which writes nothing
        # since no lane selects the slot's face)
        rt1.append((ymax - y0) // ROW_TILE)
        ct1.append((xmax - x0) // COL_TILE)
    return (
        ok,
        jnp.minimum(cnt, MAX_FACES),
        jnp.concatenate(facew),
        jnp.concatenate(row0d8),
        jnp.concatenate(x0d128),
        jnp.concatenate(y0l),
        jnp.stack([jnp.concatenate(rt1), jnp.concatenate(ct1)]),
        slot_face[0],
        y0l[0],
        x0d128[0] * K_LANE,
    )


def _sample_mxu(skybox_u32, h, w, dirs, miss, *, bilinear: bool,
                rebin: bool = False, fallback_div: int | None = None,
                quad=None):
    x, y, z = dirs
    p, k = x.shape
    assert mxu_supported(h, w, k), "caller must gate on mxu_supported()"

    face, s, t = face_st(x, y, z)
    if bilinear:
        # clamped half-texel sample positions; taps floor(f) and floor(f)+1
        fx = jnp.clip(s * w - 0.5, 0.0, w - 1.0)
        fy = jnp.clip(t * h - 0.5, 0.0, h - 1.0)
        xlo = jnp.floor(fx).astype(jnp.int32)
        ylo = jnp.floor(fy).astype(jnp.int32)
        xhi = jnp.minimum(xlo + 1, w - 1)
        yhi = jnp.minimum(ylo + 1, h - 1)
        lane_y, lane_x = fy, fx
        if quad is not None:
            # 3 gathers (per-channel quad words) instead of 4 taps; the
            # fallback gather is latency-bound per tap (roadmap round-3e)
            def gather_fn(_, h_, w_, dirs_):
                return sample_cubemap_u32_quad(quad, h_, w_, dirs_)
        else:
            gather_fn = sample_cubemap_u32
    else:
        xc = jnp.clip(jnp.floor(s * w).astype(jnp.int32), 0, w - 1)
        yc = jnp.clip(jnp.floor(t * h).astype(jnp.int32), 0, h - 1)
        xlo = xhi = xc
        ylo = yhi = yc
        lane_y, lane_x = yc, xc
        gather_fn = sample_cubemap_u32_nearest

    anym = miss.any(axis=1)
    (ok, nw, facew, row0d8, x0d128, y0l, span2, f0, y00, x00) = _analyze(
        face, ylo, yhi, xlo, xhi, miss, h, w
    )
    do = (anym & ok).astype(jnp.int32)

    # non-miss lanes get slot-0 window coords: in-bounds, discarded later
    f0c = jnp.maximum(f0, 0)[:, None]
    face_k = jnp.where(miss, face, f0c)
    y_k = jnp.where(miss, lane_y, y00[:, None].astype(lane_y.dtype))
    x_k = jnp.where(miss, lane_x, x00[:, None].astype(lane_x.dtype))

    def pk(a):
        # lane-major: all 1024 packet lanes along the lane axis, so the
        # kernel builds weights once per packet (no per-sublane loop)
        return a.reshape(p, 1, PACKET_K)

    lane_spec = pl.BlockSpec(
        (SKY_SUPER, 1, PACKET_K), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    mxu = pl.pallas_call(
        functools.partial(_kernel, num_packets=p, bilinear=bilinear),
        grid=(-(-p // SKY_SUPER),),
        in_specs=[smem] * 7 + [lane_spec] * 3
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (3, SKY_SUPER, 1, PACKET_K), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, p, 1, PACKET_K), jnp.float32),
        scratch_shapes=[
            # one window buffer + DMA semaphore per (packet, slot) of the
            # grid step, so every window copy is in flight at once
            pltpu.VMEM((SKY_SUPER, MAX_FACES, WIN_H, WIN_W), jnp.uint32),
            pltpu.SemaphoreType.DMA((SKY_SUPER, MAX_FACES)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        do, nw, facew, row0d8, x0d128, y0l, span2,
        pk(y_k), pk(x_k), pk(face_k),
        skybox_u32.reshape(6 * h, w),
    )
    mxu_rgb = tuple(mxu[c].reshape(p, k) for c in range(3))

    # --- packet-compacted gather fallback for divergent packets ---
    bad = anym & ~ok
    nbad = bad.sum()
    if DEBUG_NBAD:
        # axon has no debug callbacks: smuggle the count out as the sky
        # value (every miss pixel reads nbad; probe takes frame.max())
        cnt = ((miss & bad[:, None]).sum() if DEBUG_NBAD == "lanes"
               else nbad)
        dbg = jnp.broadcast_to(cnt.astype(jnp.float32), (p, k))
        return (dbg, dbg, dbg)

    def compacted(budget: int):
        idx = jnp.nonzero(bad, size=budget, fill_value=0)[0]
        # fill rows duplicate packet 0: they recompute packet 0's true sky,
        # so duplicate scatters all write the same (correct) value
        sub = tuple(jnp.take(c, idx, axis=0) for c in dirs)
        if rebin:
            # lane-sort the sub-wave by window cell so it rides the MXU
            # kernel instead of the 4-tap gather (see _rebin_subwave) —
            # only miss lanes matter downstream, so masking dead lanes
            # into the sort's sink bucket is value-preserving
            sub_miss = jnp.take(miss, idx, axis=0)
            sub_sky = _rebin_subwave(
                skybox_u32, h, w, sub, sub_miss, bilinear=bilinear,
                quad=quad,
            )
        else:
            sub_sky = gather_fn(skybox_u32, h, w, sub)
        scat = tuple(
            jnp.zeros((p, k), jnp.float32).at[idx].set(sc) for sc in sub_sky
        )
        use_mxu = (ok | ~anym)[:, None]
        return tuple(
            jnp.where(use_mxu, mc, sc) for mc, sc in zip(mxu_rgb, scat)
        )

    # TIERED budgets: the compacted gather's cost is proportional to its
    # STATIC budget, not to nbad — one p//8-sized tier gathered 1024
    # packets for config4's measured nbad of 395 (2.6x oversized, ~34 ms
    # of frame; config5 nbad=128 vs a 256 budget). A ladder of
    # quarter/half/full budgets sizes the gather to the wave; unused
    # tiers cost nothing at runtime.
    div0 = fallback_div or FALLBACK_DIV
    budgets = sorted({
        min(p, max(32, p // (div0 * 4))),
        min(p, max(32, p // (div0 * 2))),
        min(p, max(32, p // div0)),
    })

    # nested conds, smallest tier innermost; the common all-coherent
    # wave pays no gather at all
    expr = lambda: gather_fn(skybox_u32, h, w, dirs)  # noqa: E731
    for b in sorted(budgets, reverse=True):
        expr = (lambda b=b, nxt=expr: jax.lax.cond(
            nbad <= b, lambda: compacted(b), nxt))
    return jax.lax.cond(nbad == 0, lambda: mxu_rgb, expr)


def sample_cubemap_u32_nearest_mxu(skybox_u32, h: int, w: int, dirs, miss,
                                   rebin: bool = False):  # no quad: 1 tap
    """Single-tap lookup, bit-identical to ``sample_cubemap_u32_nearest``
    ON MISS LANES (one-hot MXU taps and gather taps are both exact, with
    or without the sub-wave re-binning).

    ``skybox_u32``: (6·h·w,) packed RGB8; ``dirs``: Vec3 of (P, 1024);
    ``miss``: (P, 1024) bool — only miss lanes' values are meaningful.
    """
    return _sample_mxu(skybox_u32, h, w, dirs, miss, bilinear=False,
                       rebin=rebin)


def sample_cubemap_u32_mxu(skybox_u32, h: int, w: int, dirs, miss,
                           rebin: bool = False, quad=None):
    """True bilinear via tent-weight matmuls — the reference's LINEAR
    sampler semantics (``src/main.cpp:2393-2406``), matching
    ``sample_cubemap_u32`` on miss lanes to within bf16 weight
    quantization (≤1 u8 LSB) on MXU packets and exactly on packets that
    take the gather fallback. ``rebin`` enables window-cell lane
    re-binning of the compacted fallback sub-wave (``_rebin_subwave``)."""
    return _sample_mxu(skybox_u32, h, w, dirs, miss, bilinear=True,
                       rebin=rebin, quad=quad)


def _rebin_subwave(skybox_u32, h: int, w: int, dirs, miss, *,
                   bilinear: bool, quad=None):
    """Window-cell lane re-binning of a compacted bad-packet sub-wave.
    Measured-REJECTED on chip, kept behind ``sky_rebin="on"`` (config5
    31.1 → 35.8 ms, config4 166.6 → 209.1: the 1D sort cost scales
    superlinearly with lanes, and the fallback packets' misses are
    spread too thin for sorted packets to become window-pure — the
    nested fallback re-gathers nearly everything; docs/roadmap.md
    round-3d/3e).

    Design: scattered secondary-bounce miss directions poison the
    per-packet consensus windows — ONE divergent lane widens a packet's
    tap span past the window budget and the whole 1024-lane packet falls
    to the compacted HBM gather. Sorting the sub-wave's lanes by
    WINDOW-CELL (face, 64-row, 256-col — exactly the window quantum)
    should make sorted packets window-pure, with only
    cell-boundary-straddling packets hitting the nested gather fallback.

    Transport rides the sorts, not gathers: per-lane ``take_along_axis``
    permutes cost ~like the gather they'd replace (the v1 top-level
    rebin paid 7 of them per wave and regressed config4 166.7 → 820.9 ms
    on chip — also its raster tile-order key made sorted packets span a
    full map row at every tile-row wrap, failing EVERY window test), so
    the dirs ride the key sort as value operands and the results ride a
    second sort keyed on the carried original lane index.

    Sorting shifts which lanes ride the bf16-weight MXU path vs the
    exact-gather fallback, so bilinear holds the SAME ≤1 u8 LSB contract
    vs the 4-tap gather reference as the unsorted sampler — not bitwise
    equality with it. Nearest mode stays bit-identical (one-hot MXU taps
    and gather taps are both exact).
    """
    x, y, z = dirs
    b, k = x.shape
    face, s, t = face_st(x, y, z)
    fx = jnp.clip(s * w - 0.5, 0.0, w - 1.0)
    fy = jnp.clip(t * h - 0.5, 0.0, h - 1.0)
    cy = jnp.floor(fy).astype(jnp.int32) >> 6       # 64-row window cell
    cx = jnp.floor(fx).astype(jnp.int32) >> 8       # 256-col window cell
    key = (face * ((h + 63) >> 6) + cy) * ((w + 255) >> 8) + cx
    dead = jnp.int32(1) << 20                       # > any cell id
    key = jnp.where(miss, key, dead)                # dead lanes sink last

    n = b * k
    iota = jnp.arange(n, dtype=jnp.int32)
    key_s, iota_s, x_s, y_s, z_s = jax.lax.sort(
        (key.reshape(n), iota, x.reshape(n), y.reshape(n), z.reshape(n)),
        dimension=0, is_stable=True, num_keys=1,
    )
    miss_s = (key_s < dead).reshape(b, k)
    # nested call: no second sort level; a generous fallback budget (b//4)
    # because thin-spread misses leave cell-straddling sorted packets —
    # its compacted gather covers them while the sorted dead-lane tail
    # packets stay skipped either way
    rgb_s = _sample_mxu(
        skybox_u32, h, w,
        (x_s.reshape(b, k), y_s.reshape(b, k), z_s.reshape(b, k)),
        miss_s, bilinear=bilinear, rebin=False, fallback_div=4, quad=quad,
    )
    # restore original lane order: iota_s is a permutation, so a stable
    # sort keyed on it is the exact inverse
    _, r0, r1, r2 = jax.lax.sort(
        (iota_s,) + tuple(c.reshape(n) for c in rgb_s),
        dimension=0, is_stable=True, num_keys=1,
    )
    return (r0.reshape(b, k), r1.reshape(b, k), r2.reshape(b, k))
