"""Fused Pallas forward+backward: scene-parameter gradients in one kernel.

The jnp backward (even replay-mode) round-trips per-bounce residuals through
HBM and pays XLA's scan-transpose overhead — ~45 ms per 480k-ray sample on
v5e-1 where the Pallas forward runs in ~0.7 ms.  This kernel runs the whole
chain on-chip: forward pass stashing per-bounce states in VMEM, then a
reverse sweep over bounces computing the adjoints, with per-primitive
parameter gradients reduced inside the kernel.

Mechanics:

* One kernel call = one sample (the spp loop + MSE plumbing live in
  :func:`pallas_mse_loss_and_grad`); the pixel cotangent arrives as an
  input block, so any image loss works.
* Each bounce's smooth map ``(o, d, thr, payload) -> (o', d', thr',
  radiance-contribution)`` is differentiated with **jax.vjp inside the
  kernel trace** — the transpose is plain elementwise code that Mosaic
  lowers like the forward.  Discrete decisions (winner identity, coin,
  masks) are closed over as constants, which reproduces exactly the
  detached-sampling gradient of rt_tpu.replay.
* Payload cotangents (the winner's centre/radius/normal/material values)
  are turned into per-primitive gradients by masked tile reductions over
  the winner index — the unrolled-constant analogue of the one-hot-matmul
  transpose.
* Camera gradients flow through a vjp of the in-kernel raygen.

Same constraints as the forward megakernel: primitives baked as constants
(recompile on scene change, cached by content), moderate primitive counts.

Tile height (``rows``): the per-bounce VMEM stash grows linearly with the
tile, so the kernel is VMEM-capacity-limited — measured on v5e-1 at
800x600 @ 4 spp depth 8: rows=8 -> 244 Mrays/s, 16 -> 320, 32 -> 336
(default), 64 -> scoped-VMEM OOM (20.4 MiB > 16 MiB limit).

``lean=True`` attacks that cap: the reverse sweep needs the winner
*identity*, not the winner's values — the payload is recomputed bit-exactly
from the stashed winner index + the baked primitive constants, and the 13
decision masks pack into one int32 bitfield, shrinking the stash from 41 to
14 tile arrays per bounce so 64/128-row tiles fit.

Round-3 cost split of the mono step (v5e-1, basic.toml 800x600 @ 4spp d8 =
1.92 Mrays/step, measured with the ``dbg`` knobs; all rows from the same
session so the ratios are machine-state-independent):

    ===============================================  ========  =========
    configuration                                    ms/step   Mrays/s
    ===============================================  ========  =========
    forward-only megakernel (reference ceiling)        1.66      1156
    round-2 default (lean, acc-carry, rows=24)         3.86       497
    + acc_outside (accs out of the reverse cond)       3.55       540
    + fwd_dense (drop the forward early-out cond)      3.42       561
    + hash RNG + recompute_u (stash 14 -> 11)          3.13       614
    + acc_scratch + masked-FMA accumulate              3.12       615
    + plane-specialized _smooth + rad-only last
      bounce, rows=32                                  2.80       687
    + hand-fused reverse (_bounce_reverse_noplanes) +
      active-bit stash (round-3 default)               2.62       734
    ===============================================  ========  =========

    dbg split at the acc_outside+fwd_dense point: forward+stash+loss
    1.99 ms (``skip_reverse``), vjp transpose + payload rebuild +0.76 ms
    (``skip_prim`` minus ``skip_reverse``), per-primitive accumulation
    +0.60 ms (total minus ``skip_prim``).  The round-2 version's reverse
    was 88% accumulator cond-carry copies (1.41 of 1.60 ms) — that is
    what acc_outside/acc_scratch remove.  The fused step now costs 1.49x
    the forward-only kernel (round 2: 2.7x).

Round-4 sm (dielectric) cost split next to mg, same session (v5e-1,
800x600 @4spp d8; CH job, dbg knobs; mg = basic.toml 3 spheres, sm =
dielectric.toml 7 spheres — the two BASELINE rows the sm/mg ratio is
defined on):

    ==========================  =========  =========
    ms/step                       mg (3sph)  sm (7sph)
    ==========================  =========  =========
    forward + stash + loss         1.91       2.79
    reverse core (vjp/hand)        0.60       0.85
    per-primitive accumulation     0.50       0.62
    total                          3.02       4.25
    ==========================  =========  =========

    ratio 0.71 same-session (round 3 recorded 0.65 cross-session);
    rows=24 + scratch accumulators (now the dielectric default, CM job)
    lifts sm to 4.03 ms = ratio 0.68 in a session where the default
    measured 0.615 — net same-session gain ~10%.  The
    gap decomposes as ~0.5 ms of scene size (7 vs 3 spheres in the
    unrolled scan + accumulators) and ~0.6 ms of dielectric math +
    rows=16 tiling: sm tiles cap at rows=16 — the round-3 BR job's
    "rows 24/32" sm rows were PHANTOMS (the old tune defaults silently
    reduced explicit rows to 16 for dielectric scenes; fixed in
    _default_tune); genuinely compiling rows>=24 with the 11-array
    stash OOMs scoped VMEM (CH job: 18.5 MB > 16 MB).  Baking r0/1-over-
    IOR as payload constants was evaluated and rejected: the winner-
    select costs (+2 ops x n_prims per bounce-sample) cancel the saved
    divides.

Round-4 sm/mg CONTROLLED DECOMPOSITION (CU job, one session, interleaved
windows; the ratio-defining BASELINE rows compare DIFFERENT scenes, so the
gap was split with the 2x2 personality-x-scene matrix — mg personality on
dielectric.toml runs the same 7-sphere scan with lambert/metal physics,
mg_ray_tracer.cpp:142-152 routes every non-metal material to lambert):

    ==========================================  ========  =============
    configuration                                ms/step   vs mg_basic
    ==========================================  ========  =============
    mg on basic.toml (3 spheres)                  2.732       1.000
    mg on dielectric.toml (7 spheres)             3.222       1.180  <- scene tax
    sm on dielectric.toml (7 spheres)             4.020       1.472
    ==========================================  ========  =============

    BASELINE-row ratio sm/mg = 0.68 = 1 / (scene_tax 1.18 x diel_tax
    1.248).  The matched-scene ratio (sm vs mg on the SAME 7-sphere
    scene) is 0.80: the dielectric personality itself costs 1.25x, and
    the remaining 1.18x is the 7-vs-3-sphere linear scan + 7-vs-3
    per-primitive accumulators — the reference's own algorithm scales
    the same way (linear closest-hit, mg_ray_tracer.cpp:70-79).  Round-4
    attempts on the remaining dielectric tax, all measured same-session
    and all NEGATIVE (kept for the record): hw-PRNG forward + stashed u
    instead of hash+recompute_u (4.22 vs 4.12 ms — the hash recompute is
    cheaper than the extra stash I/O), rev_dense (4.72 ms: the reverse
    early-out cond WINS even on glass scenes — late bounces still go
    dead in enough tiles), slim_stash at rows=24 (neutral: stash I/O is
    not the dielectric bottleneck), and rows=32 via slim_stash with
    scratch OR outside accumulators (scoped-VMEM OOM in every layout —
    the dielectric reverse's live-range peak, not the stash, binds).

Round-5 verdict on the proposed CHECKPOINTED TWO-PASS REVERSE (split the
reverse at depth/2, re-run the cheap forward to the midpoint, halve the
stash so rows>=24/32 compile for sm): REJECTED on measured rows-tier
slopes (job 56, one interleaved session, windows=7):

    mg rows=16 -> 24 -> 32:   2.930 -> 2.879 -> 2.919 ms   (16->32 = 1.004x)
    sm rows= 8 -> 16:         4.787 -> 4.234 ms            ( 8->16 = 1.131x)

    The tier benefit SATURATES at rows=16: mg — which compiles every
    tier — gains 0.4% from 16->32, so the sm 16->32 gain the two-pass
    scheme would unlock is bounded by ~2%, while the scheme itself
    re-runs half the forward (~+5-7% of the step).  Net negative; the
    remaining matched-scene sm/mg = 0.80 is the dielectric physics +
    its transpose (the 1.25x tax), not a tiling artifact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_render import (
    MAX_UNROLL_PRIMS,
    _flatten_primitives,
    _hash_u01,
    _u01,
    pallas_supported,
    render_forward_pallas,
)

__all__ = ["pallas_mse_loss_and_grad", "pallas_grad_supported",
           "make_mse_step"]

_BIG = 3.0e38
_MIN_HIT = 0.001
MAX_GRAD_PRIMS = 96       # full-payload stash: masked reductions are O(S*B)
MAX_GRAD_PRIMS_LEAN = 640  # lean stash: winner-id replay, O(1)-in-S VMEM —
                           # the same cap as the unrolled forward kernel


def pallas_grad_supported(scene, lean: bool = True) -> bool:
    cap = MAX_GRAD_PRIMS_LEAN if lean else MAX_GRAD_PRIMS
    return (
        pallas_supported(scene)
        and scene.spheres.count + scene.planes.count <= cap
    )


# order of the decision bits in the packed int32 stash word (lean mode)
_BITS = ("hit", "live_h", "miss", "alive", "ispl", "root", "ldeg",
         "mabs", "refl_bit", "tir", "inside", "is_met", "is_die")


def _active_bits(has_met, has_die, has_planes, has_spheres):
    """The subset of _BITS the reverse sweep actually reads for this scene
    (class-presence specialization of the stash bitfield: packing 13 bits
    costs ~26 VPU ops per (sample, bounce) in the forward sweep — the mg
    no-plane scene needs only 7).  Bits left out are reconstructed as
    statically-known values at unpack time: ``ispl`` is hit for plane-only
    scenes / false for sphere-only scenes, everything else false (exactly
    what the specialized smooth map would have produced).  ``mabs`` is
    never read by the reverse (its effect is folded into ``alive``)."""
    bits = ["hit", "live_h", "miss", "alive", "ldeg"]
    if has_planes and has_spheres:
        bits.append("ispl")
    if has_spheres:
        bits.append("root")
    if has_met:
        bits.append("is_met")
    if has_die:
        bits += ["refl_bit", "tir", "inside", "is_die"]
    return tuple(bits)


def _make_grad_kernel(s_cols, p_cols, *, width, height, max_bounces, rows,
                      rng_mode, center_sample, lean=False, rng_impl="hw",
                      skip_reverse=False, skip_prim=False):
    """Per-sample fused fwd+bwd kernel: one sample's forward sweep (with
    stash), then the reverse sweep fed an external pixel-cotangent block.

    Shares the scan/decision/bounce-map helpers with the mono kernel, and
    the same per-bounce dead-tile early-out (``lax.cond`` keyed on
    any-lane-alive, with RNG draws hoisted above the cond so the stream is
    identical to the dense kernel).

    ``lean=True`` stashes the winner *identity* instead of its values — the
    payload is recomputed bit-exactly in the reverse sweep from the stashed
    winner index + the baked primitive constants, and the 13 decision masks
    pack into one int32 bitfield: 14 stash arrays per bounce instead of 41,
    which is what unlocks 64-128-row tiles and primitive counts past the
    payload-stash cap (MAX_GRAD_PRIMS_LEAN).

    ``skip_reverse`` / ``skip_prim`` are measurement-only knobs (cost-split
    profiling): they produce WRONG (zero) gradients for the skipped part."""
    n_spheres = s_cols.shape[1]
    n_planes = p_cols.shape[1]
    f32 = jnp.float32
    S_pad = max(n_spheres, 1)
    P_pad = max(n_planes, 1)
    scan = _make_scan(s_cols, p_cols, rows)
    # class-presence specialization (bit-exact: absent classes have
    # all-false select masks) — see _bounce_smooth
    has_met = bool((s_cols[9] == 1.0).any() or (p_cols[9] == 1.0).any())
    has_die = bool((s_cols[9] == 2.0).any() or (p_cols[9] == 2.0).any())
    _smooth = functools.partial(_bounce_smooth, has_met=has_met,
                                has_die=has_die,
                                has_planes=n_planes > 0,
                                has_spheres=n_spheres > 0)
    _decide = functools.partial(_decisions, has_met=has_met,
                                has_die=has_die)
    _fwdb = functools.partial(_bounce_forward, has_met=has_met,
                              has_die=has_die,
                              has_planes=n_planes > 0,
                              has_spheres=n_spheres > 0)
    # early-out gates: same rationale as the mono kernel (see above) —
    # cond carries must stay small or Mosaic's scoped VMEM blows up
    fwd_eo = lean
    rev_eo = lean and (n_spheres + n_planes) <= 32

    def kernel(cam_ref, seed_ref, cot_ref, sg_ref, pg_ref, cg_ref):
        tile = pl.program_id(0)
        if rng_impl == "hw":
            pltpu.prng_seed(seed_ref[0] + tile * jnp.int32(1000003))

        lane_r = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        idx = (tile * rows + lane_r) * 128 + lane_c
        px = (idx % width).astype(f32)
        py = (idx // width).astype(f32)
        in_image = (idx < width * height)

        draw_ctr = [0]

        def u01():
            if rng_impl == "hw":
                return _u01((rows, 128))
            draw_ctr[0] += 1
            return _hash_u01(idx, seed_ref[0], draw_ctr[0], (rows, 128))

        cam = [cam_ref[i] for i in range(15)]
        zero = jnp.zeros((rows, 128), f32)
        one = jnp.ones((rows, 128), f32)

        # pixel cotangent (zero outside the image)
        cot = [jnp.where(in_image, cot_ref[0, c], 0.0) for c in range(3)]

        # ---------------- raygen (as a vjp-able function) -----------------
        u = u01()
        v = u01()
        if center_sample:
            jx = jnp.full((rows, 128), f32(0.5))
            jy = jnp.full((rows, 128), f32(0.5))
        else:
            jx, jy = u, v

        def raygen(cam_v):
            cpx, cpy, cpz = cam_v[0], cam_v[1], cam_v[2]
            r = cam_v[3:12]
            tan_half, aspect, near = cam_v[12], cam_v[13], cam_v[14]
            nx_ = 2.0 * (px + jx) * f32(1.0 / width) - 1.0
            ny_ = 1.0 - 2.0 * (py + jy) * f32(1.0 / height)
            dvx = nx_ * tan_half * aspect
            dvy = ny_ * tan_half
            dwx = r[0] * dvx + r[1] * dvy - r[2]
            dwy = r[3] * dvx + r[4] * dvy - r[5]
            dwz = r[6] * dvx + r[7] * dvy - r[8]
            ox = cpx + dwx * near
            oy = cpy + dwy * near
            oz = cpz + dwz * near
            inv = jax.lax.rsqrt(dwx * dwx + dwy * dwy + dwz * dwz)
            return (ox, oy, oz, dwx * inv, dwy * inv, dwz * inv)

        rays, raygen_vjp = jax.vjp(raygen, tuple(cam))
        ox, oy, oz, dx, dy, dz = rays

        # ---------------- forward sweep with stashes ----------------------
        tr = one
        tg = one
        tb = one
        live = one
        stash = []  # per bounce: dict of everything the reverse sweep needs

        for b in range(max_bounces):
            # draws hoisted above the early-out cond (stream-identical to
            # the dense kernel; the scan consumes no draws)
            ux = u01()
            uy = u01()
            uz = u01()
            if rng_mode == "sphere":
                ux = 2.0 * ux - 1.0
                uy = 2.0 * uy - 1.0
                uz = 2.0 * uz - 1.0
            uinv = jax.lax.rsqrt(jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-30))
            ux, uy, uz = ux * uinv, uy * uinv, uz * uinv
            coin = u01()
            anyl = jnp.sum(live) > 0.0

            def fwd_body(carry, ux=ux, uy=uy, uz=uz, coin=coin):
                (ox, oy, oz, dx, dy, dz, tr, tg, tb, live) = carry
                lv = live > 0.0
                best_t, pay, bidx, bpl, broot, bcl = scan(
                    (ox, oy, oz), (dx, dy, dz))
                o_n, d_n, thr_n, _, bits = _fwdb(
                    (ox, oy, oz), (dx, dy, dz), (tr, tg, tb),
                    best_t, pay, bpl, broot, bcl, lv,
                    (ux, uy, uz), coin)
                state = (o_n[0], o_n[1], o_n[2], d_n[0], d_n[1], d_n[2],
                         thr_n[0], thr_n[1], thr_n[2],
                         bits["alive"].astype(f32))
                if lean:
                    packed = jnp.zeros((rows, 128), jnp.int32)
                    for k, name in enumerate(_BITS):
                        packed = packed | jnp.where(bits[name],
                                                    jnp.int32(1 << k),
                                                    jnp.int32(0))
                    return state + (packed, bidx)
                return (state + pay + (bidx, bpl)
                        + tuple(bits[nm] for nm in _BITS))

            def fwd_skip(carry):
                if lean:
                    return tuple(carry) + (
                        jnp.zeros((rows, 128), jnp.int32), zero)
                fbool = jnp.zeros((rows, 128), jnp.bool_)
                return (tuple(carry) + tuple([zero] * 13) + (zero, zero)
                        + tuple([fbool] * 13))

            carry = (ox, oy, oz, dx, dy, dz, tr, tg, tb, live)
            out = (fwd_body(carry) if (b == 0 or not fwd_eo) else
                   jax.lax.cond(anyl, fwd_body, fwd_skip, carry))
            o_prev = (ox, oy, oz)
            d_prev = (dx, dy, dz)
            thr_prev = (tr, tg, tb)
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, live) = out[:10]
            if lean:
                stash.append(dict(
                    o=o_prev, d=d_prev, thr=thr_prev, u=(ux, uy, uz),
                    packed=out[10], bidx=out[11], anyl=anyl))
            else:
                stash.append(dict(
                    o=o_prev, d=d_prev, thr=thr_prev,
                    pay=tuple(out[10:23]), u=(ux, uy, uz),
                    bits={nm: out[25 + i] for i, nm in enumerate(_BITS)},
                    bidx=out[23], bpl=out[24], anyl=anyl))

        # ---------------- reverse sweep -----------------------------------
        co = [zero, zero, zero]   # cotangent of o
        cd = [zero, zero, zero]   # cotangent of d
        ct = [zero, zero, zero]   # cotangent of thr
        lane0 = jnp.zeros((1, 128), f32)
        accs = [lane0] * (9 * (n_spheres + n_planes))

        def s_pos(k, si):
            return k * n_spheres + si

        def p_pos(k, pi):
            return 9 * n_spheres + k * n_planes + pi

        for b in (() if skip_reverse else reversed(range(max_bounces))):
            st = stash[b]

            def rev_body(carry, st=st):
                co = list(carry[0:3])
                cd = list(carry[3:6])
                ct = list(carry[6:9])
                accs = list(carry[9:])
                if lean:
                    packed = st["packed"]
                    rbits = {name: ((packed >> k) & 1) > 0
                             for k, name in enumerate(_BITS)}
                    hitb = rbits["hit"]
                    isplb = rbits["ispl"]
                    rcx = rcy = rcz = zero
                    rrad = one
                    rpnx = rpny = rpnz = rpdd = zero
                    rar = rag = rab = zero
                    rrf = one
                    rrg = zero
                    sph_m = hitb & ~isplb
                    for si in range(n_spheres):
                        m = sph_m & (st["bidx"] == f32(si))
                        rcx = jnp.where(m, float(s_cols[0, si]), rcx)
                        rcy = jnp.where(m, float(s_cols[1, si]), rcy)
                        rcz = jnp.where(m, float(s_cols[2, si]), rcz)
                        rrad = jnp.where(m, float(s_cols[3, si]), rrad)
                        rar = jnp.where(m, float(s_cols[4, si]), rar)
                        rag = jnp.where(m, float(s_cols[5, si]), rag)
                        rab = jnp.where(m, float(s_cols[6, si]), rab)
                        rrf = jnp.where(m, float(s_cols[7, si]), rrf)
                        rrg = jnp.where(m, float(s_cols[8, si]), rrg)
                    for pi in range(n_planes):
                        m = isplb & (st["bidx"] == f32(pi))
                        rpnx = jnp.where(m, float(p_cols[0, pi]), rpnx)
                        rpny = jnp.where(m, float(p_cols[1, pi]), rpny)
                        rpnz = jnp.where(m, float(p_cols[2, pi]), rpnz)
                        rpdd = jnp.where(m, float(p_cols[3, pi]), rpdd)
                        rar = jnp.where(m, float(p_cols[4, pi]), rar)
                        rag = jnp.where(m, float(p_cols[5, pi]), rag)
                        rab = jnp.where(m, float(p_cols[6, pi]), rab)
                        rrf = jnp.where(m, float(p_cols[7, pi]), rrf)
                        rrg = jnp.where(m, float(p_cols[8, pi]), rrg)
                    stl = dict(st, bits=rbits,
                               pay=(rcx, rcy, rcz, rrad, rpnx, rpny, rpnz,
                                    rpdd, rar, rag, rab, rrf, rrg),
                               bpl=isplb.astype(f32))
                else:
                    stl = st

                def fb(o3, d3, thr3, pay, stl=stl):
                    return _smooth(o3, d3, thr3, pay, stl["u"],
                                   stl["bits"])

                primals = (stl["o"], stl["d"], stl["thr"], stl["pay"])
                _, fvjp = jax.vjp(fb, *primals)
                cots = fvjp(((co[0], co[1], co[2]), (cd[0], cd[1], cd[2]),
                             (ct[0], ct[1], ct[2]),
                             (cot[0], cot[1], cot[2])))
                (co_p, cd_p, ct_p, pay_cot) = cots

                if not skip_prim:
                    is_sph = ~(stl["bpl"] > 0.0)
                    live_h = stl["bits"]["live_h"]
                    for si in range(n_spheres):
                        m = (stl["bidx"] == f32(si)) & is_sph & live_h
                        mf = m.astype(f32)
                        for k, cslot in enumerate((0, 1, 2, 3, 8, 9, 10, 11, 12)):
                            # rows: cx,cy,cz,r, alb_r,alb_g,alb_b, refl, rough
                            accs[s_pos(k, si)] = accs[s_pos(k, si)] + jnp.sum(
                                mf * pay_cot[cslot], axis=0, keepdims=True)
                    for pi in range(n_planes):
                        m = (stl["bidx"] == f32(pi)) & (stl["bpl"] > 0.0) & live_h
                        mf = m.astype(f32)
                        for k, cslot in enumerate((4, 5, 6, 7, 8, 9, 10, 11, 12)):
                            # rows: nx,ny,nz,d, alb_r,alb_g,alb_b, refl, rough
                            accs[p_pos(k, pi)] = accs[p_pos(k, pi)] + jnp.sum(
                                mf * pay_cot[cslot], axis=0, keepdims=True)
                return tuple(co_p) + tuple(cd_p) + tuple(ct_p) + tuple(accs)

            carry = tuple(co) + tuple(cd) + tuple(ct) + tuple(accs)
            out = (rev_body(carry) if not rev_eo else
                   jax.lax.cond(st["anyl"], rev_body,
                                lambda c: tuple(c), carry))
            co = list(out[0:3])
            cd = list(out[3:6])
            ct = list(out[6:9])
            accs = list(out[9:])

        # camera cotangent via the raygen vjp (per-tile output; summed by the
        # caller — the serial grid would otherwise need in-place accumulation,
        # which the Mosaic pipeline handles poorly)
        if skip_reverse:
            # anchor the forward state so DCE can't drop the forward sweep
            cg_ref[0, 0, 0] = jnp.sum(tr + tg + tb + ox + oy + oz
                                      + dx + dy + dz + live)
            for i in range(1, 16):
                cg_ref[0, 0, i] = f32(0.0)
        else:
            (cam_cot,) = raygen_vjp((co[0], co[1], co[2], cd[0], cd[1], cd[2]))
            for i in range(15):
                cg_ref[0, 0, i] = cam_cot[i]
            cg_ref[0, 0, 15] = f32(0.0)

        for k in range(9):
            for si in range(S_pad):
                sg_ref[0, k, si] = (jnp.sum(accs[s_pos(k, si)])
                                    if si < n_spheres else f32(0.0))
            for pi in range(P_pad):
                pg_ref[0, k, pi] = (jnp.sum(accs[p_pos(k, pi)])
                                    if pi < n_planes else f32(0.0))

    return kernel


def _bounce_smooth(o3, d3, thr3, pay, u3, bits, has_met=True, has_die=True,
                   has_planes=True, has_spheres=True):
    """The smooth per-bounce map with all discrete decisions pinned.

    Returns (o', d', thr', radiance_contribution).  Used both to advance the
    forward state and (under jax.vjp) for the reverse sweep — keeping one
    definition guarantees the adjoint matches the primal.

    ``has_met`` / ``has_die``: class-presence specialization.  The unrolled
    kernels bake the scene, so when no primitive carries a metal or
    dielectric material the corresponding scatter block is statically dead
    (its select mask is all-false) — skipping it is bit-exact and removes
    ~60 ops/bounce of Fresnel math from the primal AND its transpose.
    ``has_planes`` / ``has_spheres`` specialize the winner-t/normal chains
    the same way (a plane-less scene has ispl all-false, so the plane-t
    division chain and its transpose are statically dead, and vice versa).
    """
    f32 = jnp.float32
    ox, oy, oz = o3
    dx, dy, dz = d3
    tr, tg, tb = thr3
    (bcx, bcy, bcz, brad, bpnx, bpny, bpnz, bpdd,
     bar, bag, bab, brf, brg) = pay
    ux, uy, uz = u3

    hit = bits["hit"]
    live_h = bits["live_h"]
    miss = bits["miss"]
    alive = bits["alive"]
    ispl = bits["ispl"]
    root_lo = bits["root"]
    ldeg = bits["ldeg"]
    refl_bit = bits["refl_bit"]
    tir = bits["tir"]
    inside = bits["inside"]
    is_met = bits["is_met"]
    is_die = bits["is_die"]

    # --- differentiable t for the pinned winner ---------------------------
    if has_spheres:
        ocx, ocy, ocz = ox - bcx, oy - bcy, oz - bcz
        bq = ocx * dx + ocy * dy + ocz * dz
        c0 = ocx * ocx + ocy * ocy + ocz * ocz - brad * brad
        disc = bq * bq - c0
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        t_s = jnp.where(root_lo, -bq - sq, -bq + sq)
    if has_planes:
        ndd = bpnx * dx + bpny * dy + bpnz * dz
        safe = jnp.where(jnp.abs(ndd) > 1e-12, ndd, f32(1.0))
        t_p = -(bpnx * ox + bpny * oy + bpnz * oz + bpdd) / safe
    if has_planes and has_spheres:
        t = jnp.where(ispl, t_p, t_s)
    elif has_planes:
        t = t_p
    else:
        t = t_s
    t = jnp.where(hit, t, 0.0)

    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    if has_spheres:
        snx, sny, snz = hx - bcx, hy - bcy, hz - bcz
        sinv = jax.lax.rsqrt(
            jnp.maximum(snx * snx + sny * sny + snz * snz, 1e-30))
        s_nx, s_ny, s_nz = snx * sinv, sny * sinv, snz * sinv
    if has_planes and has_spheres:
        nx = jnp.where(ispl, bpnx, s_nx)
        ny = jnp.where(ispl, bpny, s_ny)
        nz = jnp.where(ispl, bpnz, s_nz)
    elif has_planes:
        nx, ny, nz = bpnx, bpny, bpnz
    else:
        nx, ny, nz = s_nx, s_ny, s_nz

    # --- sky contribution on miss ----------------------------------------
    ts_ = 0.5 * (dy + 1.0)
    mf = miss.astype(f32)
    rad0 = mf * tr * (1.0 - 0.5 * ts_)
    rad1 = mf * tg * (1.0 - 0.3 * ts_)
    rad2 = mf * tb

    # --- scatter (decisions pinned) --------------------------------------
    lxr, lyr, lzr = nx + ux, ny + uy, nz + uz
    ln2 = lxr * lxr + lyr * lyr + lzr * lzr
    linv = jax.lax.rsqrt(jnp.where(ldeg, 1.0, jnp.maximum(ln2, 1e-30)))
    lx = jnp.where(ldeg, nx, lxr * linv)
    ly = jnp.where(ldeg, ny, lyr * linv)
    lz = jnp.where(ldeg, nz, lzr * linv)

    ndx, ndy, ndz = lx, ly, lz
    if has_met or has_die:
        ddot = dx * nx + dy * ny + dz * nz
        rx = dx - 2.0 * ddot * nx
        ry = dy - 2.0 * ddot * ny
        rz = dz - 2.0 * ddot * nz
    if has_met:
        mx = rx + brg * ux
        my = ry + brg * uy
        mz = rz + brg * uz
        minv = jax.lax.rsqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-30))
        mx, my, mz = mx * minv, my * minv, mz * minv
        ndx = jnp.where(is_met, mx, ndx)
        ndy = jnp.where(is_met, my, ndy)
        ndz = jnp.where(is_met, mz, ndz)
    if has_die:
        sgn = jnp.where(inside, f32(-1.0), f32(1.0))
        onx, ony, onz = sgn * nx, sgn * ny, sgn * nz
        eta = jnp.where(inside, brf, 1.0 / jnp.maximum(brf, 1e-12))
        cos_i = jnp.where(inside, ddot, -ddot)
        sin2 = eta * eta * (1.0 - cos_i * cos_i)
        cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2, 1e-12)))
        cos_t = jnp.where(tir, 0.0, cos_t)
        fxx = eta * dx + (eta * cos_i - cos_t) * onx
        fyy = eta * dy + (eta * cos_i - cos_t) * ony
        fzz = eta * dz + (eta * cos_i - cos_t) * onz
        gx = jnp.where(refl_bit, rx, fxx)
        gy = jnp.where(refl_bit, ry, fyy)
        gz = jnp.where(refl_bit, rz, fzz)
        ginv = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
        gx, gy, gz = gx * ginv, gy * ginv, gz * ginv
        ndx = jnp.where(is_die, gx, ndx)
        ndy = jnp.where(is_die, gy, ndy)
        ndz = jnp.where(is_die, gz, ndz)

    af = alive.astype(f32)
    naf = 1.0 - af
    tr_n = tr * (naf + af * bar * brf)
    tg_n = tg * (naf + af * bag * brf)
    tb_n = tb * (naf + af * bab * brf)

    lh = live_h.astype(f32)
    nlh = 1.0 - lh
    o_n = (nlh * ox + lh * hx, nlh * oy + lh * hy, nlh * oz + lh * hz)
    d_n = (nlh * dx + lh * ndx, nlh * dy + lh * ndy, nlh * dz + lh * ndz)
    return o_n, d_n, (tr_n, tg_n, tb_n), (rad0, rad1, rad2)


# ---------------------------------------------------------------------------
# Mono-kernel step: the whole fwd+bwd MSE step in ONE pallas dispatch.
#
# The per-sample pipeline (above) pays for the forward TWICE: the render
# megakernel produces the image (for the MSE cotangent), then each grad
# kernel re-runs its own forward sweep because the per-bounce stash cannot
# outlive a kernel.  The key observation: the MSE cotangent is PER-PIXEL
# LOCAL (cot_p = 2 (img_p - target_p) / (3 N spp) touches no other pixel),
# so one kernel can, per ray tile: run ALL spp forward sweeps (stashing
# per-bounce state in VMEM, accumulating the tile image), form the
# cotangent tile locally against the target block, then reverse-sweep each
# sample — no image/cot HBM round trips, no separate forward kernels, no
# jnp assembly transposes, one dispatch per training step.  Measured on
# v5e-1 (800x600 @ 4 spp, depth 8): 5.69 ms -> ~3 ms class.
#
# Per-primitive gradients use WIDE accumulators when the scene is small:
# full (rows, 128) running sums per (slot, primitive), one masked select
# per bounce, reduced ONCE at the end — replacing the per-bounce full
# cross-lane reductions that dominated the per-sample kernel (in-situ
# measured 0.70 ms of 5.69 ms).
# ---------------------------------------------------------------------------


def _bounce_reverse_noplanes(o3, d3, thr3, pay, u3, bits, cot_o3, cot_d3,
                             cot_t3, cot_rad3, has_met=True, has_die=False):
    """Hand-fused transpose of the SPECIALIZED smooth map for sphere-only
    scenes (no planes): lambert/metal and optionally the full dielectric
    family — every BASELINE benchmark scene is in this class.

    Mathematically identical to ``jax.vjp(_bounce_smooth)`` at the same
    specialization (validated to float-eps in tests/test_pallas.py); wins
    by sharing the primal recompute with the transpose and emitting the
    adjoint directly instead of a generic linearize+transpose (~40% fewer
    ops than the vjp pair; 705 -> 734 Mrays/s on the headline shape).
    Max-clamp gates follow JAX's convention except at exact ties
    (measure-zero; jnp.maximum splits ties 50/50, here the >-side wins).

    Returns (cot_o, cot_d, cot_thr, pay_cot13)."""
    f32 = jnp.float32
    ox, oy, oz = o3
    dx, dy, dz = d3
    tr, tg, tb = thr3
    (bcx, bcy, bcz, brad, _pnx, _pny, _pnz, _pdd,
     bar, bag, bab, brf, brg) = pay
    ux, uy, uz = u3
    hit = bits["hit"]
    root_lo = bits["root"]
    ldeg = bits["ldeg"]
    is_met = bits["is_met"]
    mf = bits["miss"].astype(f32)
    af = bits["alive"].astype(f32)
    lh = bits["live_h"].astype(f32)
    naf = 1.0 - af
    nlh = 1.0 - lh

    # ---- shared primal recompute (the residuals) -------------------------
    ocx, ocy, ocz = ox - bcx, oy - bcy, oz - bcz
    bq = ocx * dx + ocy * dy + ocz * dz
    c0 = ocx * ocx + ocy * ocy + ocz * ocz - brad * brad
    disc = bq * bq - c0
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    t_s = jnp.where(root_lo, -bq - sq, -bq + sq)
    t = jnp.where(hit, t_s, 0.0)
    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    snx, sny, snz = hx - bcx, hy - bcy, hz - bcz
    sn2 = snx * snx + sny * sny + snz * snz
    sinv = jax.lax.rsqrt(jnp.maximum(sn2, 1e-30))
    nx, ny, nz = snx * sinv, sny * sinv, snz * sinv
    lxx, lxy, lxz = nx + ux, ny + uy, nz + uz
    ln2 = lxx * lxx + lxy * lxy + lxz * lxz
    linv = jax.lax.rsqrt(jnp.where(ldeg, 1.0, jnp.maximum(ln2, 1e-30)))
    if has_met or has_die:
        ddot = dx * nx + dy * ny + dz * nz
        rx = dx - 2.0 * ddot * nx
        ry = dy - 2.0 * ddot * ny
        rz = dz - 2.0 * ddot * nz
    if has_met:
        mx = rx + brg * ux
        my = ry + brg * uy
        mz = rz + brg * uz
        m2 = mx * mx + my * my + mz * mz
        minv = jax.lax.rsqrt(jnp.maximum(m2, 1e-30))
    if has_die:
        is_die = bits["is_die"]
        inside = bits["inside"]
        refl_bit = bits["refl_bit"]
        tir = bits["tir"]
        sgn = jnp.where(inside, f32(-1.0), f32(1.0))
        onx, ony, onz = sgn * nx, sgn * ny, sgn * nz
        mbrf = jnp.maximum(brf, 1e-12)
        eta = jnp.where(inside, brf, 1.0 / mbrf)
        cos_i = jnp.where(inside, ddot, -ddot)
        sin2 = eta * eta * (1.0 - cos_i * cos_i)
        wct = jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2, 1e-12))
        sct = jnp.sqrt(wct)
        cos_t = jnp.where(tir, 0.0, sct)
        ecc = eta * cos_i - cos_t
        fx = eta * dx + ecc * onx
        fy = eta * dy + ecc * ony
        fz = eta * dz + ecc * onz
        gx = jnp.where(refl_bit, rx, fx)
        gy = jnp.where(refl_bit, ry, fy)
        gz = jnp.where(refl_bit, rz, fz)
        g2 = gx * gx + gy * gy + gz * gz
        ginv = jax.lax.rsqrt(jnp.maximum(g2, 1e-30))
    ts_ = 0.5 * (dy + 1.0)

    # ---- transpose -------------------------------------------------------
    Cox_, Coy_, Coz_ = cot_o3
    Cdx_, Cdy_, Cdz_ = cot_d3
    Ctr_, Ctg_, Ctb_ = cot_t3
    Crr, Crg, Crb = cot_rad3

    # o' = nlh o + lh h ; d' = nlh d + lh nd
    Cox = nlh * Cox_
    Coy = nlh * Coy_
    Coz = nlh * Coz_
    Chx = lh * Cox_
    Chy = lh * Coy_
    Chz = lh * Coz_
    Cdx = nlh * Cdx_
    Cdy = nlh * Cdy_
    Cdz = nlh * Cdz_
    Cndx = lh * Cdx_
    Cndy = lh * Cdy_
    Cndz = lh * Cdz_

    # thr'_c = thr_c (naf + af bar_c brf)
    Ctr = Ctr_ * (naf + af * bar * brf)
    Ctg = Ctg_ * (naf + af * bag * brf)
    Ctb = Ctb_ * (naf + af * bab * brf)
    Cbar = Ctr_ * tr * af * brf
    Cbag = Ctg_ * tg * af * brf
    Cbab = Ctb_ * tb * af * brf
    Cbrf = af * (Ctr_ * tr * bar + Ctg_ * tg * bag + Ctb_ * tb * bab)

    # rad = (mf tr (1-.5 ts), mf tg (1-.3 ts), mf tb); dts/ddy = 0.5
    Ctr = Ctr + Crr * mf * (1.0 - 0.5 * ts_)
    Ctg = Ctg + Crg * mf * (1.0 - 0.3 * ts_)
    Ctb = Ctb + Crb * mf
    Cdy = Cdy + 0.5 * (mf * tr * (-0.5) * Crr + mf * tg * (-0.3) * Crg)

    zero_ = jnp.zeros_like(Cox)
    Crx = Cry = Crz = zero_      # cotangent of the reflect vector r
    Cddot = zero_
    Cnx = Cny = Cnz = zero_
    Cbrg = zero_

    # nd select chain: ndx = where(is_met, mm, l); ndx = where(is_die, gg, ndx)
    if has_die:
        Cggx = jnp.where(is_die, Cndx, 0.0)
        Cggy = jnp.where(is_die, Cndy, 0.0)
        Cggz = jnp.where(is_die, Cndz, 0.0)
        Cndx = jnp.where(is_die, 0.0, Cndx)
        Cndy = jnp.where(is_die, 0.0, Cndy)
        Cndz = jnp.where(is_die, 0.0, Cndz)
    if has_met:
        Cmmx = jnp.where(is_met, Cndx, 0.0)
        Cmmy = jnp.where(is_met, Cndy, 0.0)
        Cmmz = jnp.where(is_met, Cndz, 0.0)
        Clx = jnp.where(is_met, 0.0, Cndx)
        Cly = jnp.where(is_met, 0.0, Cndy)
        Clz = jnp.where(is_met, 0.0, Cndz)
    else:
        Clx, Cly, Clz = Cndx, Cndy, Cndz

    if has_die:
        # gg = g ginv, ginv = rsqrt(max(g.g, 1e-30))
        gate_g = (g2 > 1e-30).astype(f32)
        dot_gc = gx * Cggx + gy * Cggy + gz * Cggz
        k_g = gate_g * ginv * ginv * ginv * dot_gc
        Cgx = ginv * Cggx - k_g * gx
        Cgy = ginv * Cggy - k_g * gy
        Cgz = ginv * Cggz - k_g * gz
        # g = where(refl, r, f)
        Crx = Crx + jnp.where(refl_bit, Cgx, 0.0)
        Cry = Cry + jnp.where(refl_bit, Cgy, 0.0)
        Crz = Crz + jnp.where(refl_bit, Cgz, 0.0)
        Cfx = jnp.where(refl_bit, 0.0, Cgx)
        Cfy = jnp.where(refl_bit, 0.0, Cgy)
        Cfz = jnp.where(refl_bit, 0.0, Cgz)
        # f_i = eta d_i + (eta cos_i - cos_t) on_i
        dot_fd = Cfx * dx + Cfy * dy + Cfz * dz
        dot_fon = Cfx * onx + Cfy * ony + Cfz * onz
        Ceta = dot_fd + cos_i * dot_fon
        Ccos_i = eta * dot_fon
        Ccos_t = -dot_fon
        Cdx = Cdx + eta * Cfx
        Cdy = Cdy + eta * Cfy
        Cdz = Cdz + eta * Cfz
        Conx = ecc * Cfx
        Cony = ecc * Cfy
        Conz = ecc * Cfz
        # cos_t = where(tir, 0, sqrt(wct)); wct = where(tir,1,max(1-sin2,eps))
        Cs = jnp.where(tir, 0.0, Ccos_t)
        Cw = 0.5 * Cs / sct
        Csin2 = jnp.where((~tir) & ((1.0 - sin2) > 1e-12), -Cw, 0.0)
        # sin2 = eta^2 (1 - cos_i^2)
        Ceta = Ceta + 2.0 * eta * (1.0 - cos_i * cos_i) * Csin2
        Ccos_i = Ccos_i - 2.0 * eta * eta * cos_i * Csin2
        # cos_i = where(inside, ddot, -ddot)
        Cddot = Cddot + jnp.where(inside, Ccos_i, -Ccos_i)
        # eta = where(inside, brf, 1/max(brf, 1e-12))
        Cbrf = Cbrf + jnp.where(
            inside, Ceta,
            jnp.where(brf > 1e-12, -Ceta / (mbrf * mbrf), 0.0))
        # on = sgn n
        Cnx = Cnx + sgn * Conx
        Cny = Cny + sgn * Cony
        Cnz = Cnz + sgn * Conz

    if has_met:
        # mm = m minv, minv = rsqrt(max(m.m, 1e-30))
        gate_m = (m2 > 1e-30).astype(f32)
        dot_mc = mx * Cmmx + my * Cmmy + mz * Cmmz
        k_m = gate_m * minv * minv * minv * dot_mc
        Cmx = minv * Cmmx - k_m * mx
        Cmy = minv * Cmmy - k_m * my
        Cmz = minv * Cmmz - k_m * mz
        Cbrg = ux * Cmx + uy * Cmy + uz * Cmz
        # m = r + brg u
        Crx = Crx + Cmx
        Cry = Cry + Cmy
        Crz = Crz + Cmz

    if has_met or has_die:
        # r = d - 2 ddot n
        Cdx = Cdx + Crx
        Cdy = Cdy + Cry
        Cdz = Cdz + Crz
        Cddot = Cddot - 2.0 * (nx * Crx + ny * Cry + nz * Crz)
        Cnx = Cnx - 2.0 * ddot * Crx
        Cny = Cny - 2.0 * ddot * Cry
        Cnz = Cnz - 2.0 * ddot * Crz
        # ddot = d.n
        Cdx = Cdx + Cddot * nx
        Cdy = Cdy + Cddot * ny
        Cdz = Cdz + Cddot * nz
        Cnx = Cnx + Cddot * dx
        Cny = Cny + Cddot * dy
        Cnz = Cnz + Cddot * dz

    # l = where(ldeg, n, lxr linv)
    Cnx = Cnx + jnp.where(ldeg, Clx, 0.0)
    Cny = Cny + jnp.where(ldeg, Cly, 0.0)
    Cnz = Cnz + jnp.where(ldeg, Clz, 0.0)
    nld = ~ldeg
    Clxx = jnp.where(nld, linv * Clx, 0.0)
    Clxy = jnp.where(nld, linv * Cly, 0.0)
    Clxz = jnp.where(nld, linv * Clz, 0.0)
    Clinv = jnp.where(nld, lxx * Clx + lxy * Cly + lxz * Clz, 0.0)
    # linv = rsqrt(w), w = where(ldeg, 1, max(ln2, 1e-30))
    Cw2 = -0.5 * linv * linv * linv * Clinv
    Cln2 = jnp.where(nld & (ln2 > 1e-30), Cw2, 0.0)
    Clxx = Clxx + 2.0 * Cln2 * lxx
    Clxy = Clxy + 2.0 * Cln2 * lxy
    Clxz = Clxz + 2.0 * Cln2 * lxz
    # lxr = n + u
    Cnx = Cnx + Clxx
    Cny = Cny + Clxy
    Cnz = Cnz + Clxz

    # n = sn sinv
    gate_s = (sn2 > 1e-30).astype(f32)
    dot_sc = snx * Cnx + sny * Cny + snz * Cnz
    k_s = gate_s * sinv * sinv * sinv * dot_sc
    Csnx = sinv * Cnx - k_s * snx
    Csny = sinv * Cny - k_s * sny
    Csnz = sinv * Cnz - k_s * snz

    # sn = h - bc
    Chx = Chx + Csnx
    Chy = Chy + Csny
    Chz = Chz + Csnz
    Cbcx = -Csnx
    Cbcy = -Csny
    Cbcz = -Csnz

    # h = o + t d
    Cox = Cox + Chx
    Coy = Coy + Chy
    Coz = Coz + Chz
    Ct = dx * Chx + dy * Chy + dz * Chz
    Cdx = Cdx + t * Chx
    Cdy = Cdy + t * Chy
    Cdz = Cdz + t * Chz

    # t = where(hit, t_s, 0); t_s = where(root, -bq-sq, -bq+sq)
    Cts = jnp.where(hit, Ct, 0.0)
    Cbq = -Cts
    Csq = jnp.where(root_lo, -Cts, Cts)
    # sq = sqrt(max(disc, 1e-12))
    Cdisc = jnp.where(disc > 1e-12, 0.5 * Csq / sq, 0.0)
    # disc = bq^2 - c0
    Cbq = Cbq + 2.0 * bq * Cdisc
    Cc0 = -Cdisc
    # c0 = oc.oc - brad^2
    Cocx = 2.0 * Cc0 * ocx
    Cocy = 2.0 * Cc0 * ocy
    Cocz = 2.0 * Cc0 * ocz
    Cbrad = -2.0 * brad * Cc0
    # bq = oc.d
    Cocx = Cocx + Cbq * dx
    Cocy = Cocy + Cbq * dy
    Cocz = Cocz + Cbq * dz
    Cdx = Cdx + Cbq * ocx
    Cdy = Cdy + Cbq * ocy
    Cdz = Cdz + Cbq * ocz
    # oc = o - bc
    Cox = Cox + Cocx
    Coy = Coy + Cocy
    Coz = Coz + Cocz
    Cbcx = Cbcx - Cocx
    Cbcy = Cbcy - Cocy
    Cbcz = Cbcz - Cocz

    pay_cot = (Cbcx, Cbcy, Cbcz, Cbrad, zero_, zero_, zero_, zero_,
               Cbar, Cbag, Cbab, Cbrf, Cbrg)
    return ((Cox, Coy, Coz), (Cdx, Cdy, Cdz), (Ctr, Ctg, Ctb), pay_cot)


def _make_scan(s_cols, p_cols, rows):
    """Unrolled closest-hit over baked primitive constants.

    Returns ``scan(o3, d3) -> (best_t, pay, bidx, bpl, broot)`` with the
    exact select-chain semantics of the render megakernel (planes first
    with strict '<', spheres win a plane tie, mg_ray_tracer.cpp:95-102)."""
    n_spheres = s_cols.shape[1]
    n_planes = p_cols.shape[1]
    f32 = jnp.float32

    def scan(o3, d3):
        ox, oy, oz = o3
        dx, dy, dz = d3
        zero = jnp.zeros((rows, 128), f32)
        one = jnp.ones((rows, 128), f32)
        best_t = jnp.full((rows, 128), f32(_BIG))
        bcx = bcy = bcz = zero
        brad = one
        bpnx = bpny = bpnz = zero
        bpdd = zero
        bar = bag = bab = zero
        brf = one
        brg = zero
        bcl = zero
        bpl = zero
        bidx = zero
        broot = one

        for p in range(n_planes):
            pnx, pny, pnz, pdd = (float(p_cols[i, p]) for i in range(4))
            nd = pnx * dx + pny * dy + pnz * dz
            no = pnx * ox + pny * oy + pnz * oz + pdd
            safe = jnp.where(jnp.abs(nd) > 1e-12, nd, f32(1.0))
            t = -no / safe
            ok = (jnp.abs(nd) > 1e-12) & (t >= _MIN_HIT) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            bpnx = jnp.where(ok, pnx, bpnx)
            bpny = jnp.where(ok, pny, bpny)
            bpnz = jnp.where(ok, pnz, bpnz)
            bpdd = jnp.where(ok, pdd, bpdd)
            bar = jnp.where(ok, float(p_cols[4, p]), bar)
            bag = jnp.where(ok, float(p_cols[5, p]), bag)
            bab = jnp.where(ok, float(p_cols[6, p]), bab)
            brf = jnp.where(ok, float(p_cols[7, p]), brf)
            brg = jnp.where(ok, float(p_cols[8, p]), brg)
            bcl = jnp.where(ok, float(p_cols[9, p]), bcl)
            bpl = jnp.where(ok, f32(1.0), bpl)
            bidx = jnp.where(ok, f32(p), bidx)

        for si in range(n_spheres):
            cx, cy, cz, rad = (float(s_cols[i, si]) for i in range(4))
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            bq = ocx * dx + ocy * dy + ocz * dz
            c0 = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = bq * bq - c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -bq - sq
            t1 = -bq + sq
            t = jnp.where(t0 >= _MIN_HIT, t0, t1)
            ok = (disc >= 0.0) & (t >= _MIN_HIT) & (
                (t < best_t) | ((t == best_t) & (bpl > 0.0))
            )
            best_t = jnp.where(ok, t, best_t)
            bcx = jnp.where(ok, cx, bcx)
            bcy = jnp.where(ok, cy, bcy)
            bcz = jnp.where(ok, cz, bcz)
            brad = jnp.where(ok, rad, brad)
            bar = jnp.where(ok, float(s_cols[4, si]), bar)
            bag = jnp.where(ok, float(s_cols[5, si]), bag)
            bab = jnp.where(ok, float(s_cols[6, si]), bab)
            brf = jnp.where(ok, float(s_cols[7, si]), brf)
            brg = jnp.where(ok, float(s_cols[8, si]), brg)
            bcl = jnp.where(ok, float(s_cols[9, si]), bcl)
            bpl = jnp.where(ok, f32(0.0), bpl)
            bidx = jnp.where(ok, f32(si), bidx)
            broot = jnp.where(ok, (t0 >= _MIN_HIT).astype(f32), broot)

        pay = (bcx, bcy, bcz, brad, bpnx, bpny, bpnz, bpdd,
               bar, bag, bab, brf, brg)
        return best_t, pay, bidx, bpl, broot, bcl

    return scan


def _bounce_forward(o3, d3, thr3, best_t, pay, bpl, broot, bcl, lv, u3, coin,
                    has_met=True, has_die=True, has_planes=True,
                    has_spheres=True):
    """Fused forward bounce: decision bits + scatter + state update in one
    pass sharing subexpressions (the render megakernel's math) — phase-1
    twin of ``_decisions`` + ``_bounce_smooth``, ~60 fewer ops/bounce.

    Numerics: identical to the pair except the hit distance, which here is
    the scan's ``best_t`` (sqrt clamped at 0) where the smooth map recomputes
    it from the winner payload (clamped at 1e-12) — bit-identical whenever
    the winner's discriminant is >= 1e-12, i.e. any non-tangent hit.
    Returns (o', d', thr', rad, bits)."""
    f32 = jnp.float32
    ox, oy, oz = o3
    dx, dy, dz = d3
    tr, tg, tb = thr3
    (bcx, bcy, bcz, brad, bpnx, bpny, bpnz, bpdd,
     bar, bag, bab, brf, brg) = pay
    ux, uy, uz = u3
    shape = jnp.shape(ox)
    fbool = jnp.zeros(shape, jnp.bool_)

    hit = best_t < f32(1e37)
    live_h = lv & hit
    miss = lv & ~hit

    # sky on miss (mg_ray_tracer.cpp:164)
    ts_ = 0.5 * (dy + 1.0)
    mf = miss.astype(f32)
    rad = (mf * tr * (1.0 - 0.5 * ts_),
           mf * tg * (1.0 - 0.3 * ts_),
           mf * tb)

    t_safe = jnp.where(hit, best_t, 0.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz
    ispl = bpl > 0.0
    if has_spheres:
        snx, sny, snz = hx - bcx, hy - bcy, hz - bcz
        sinv = jax.lax.rsqrt(
            jnp.maximum(snx * snx + sny * sny + snz * snz, 1e-30))
        s_nx, s_ny, s_nz = snx * sinv, sny * sinv, snz * sinv
    if has_planes and has_spheres:
        nx = jnp.where(ispl, bpnx, s_nx)
        ny = jnp.where(ispl, bpny, s_ny)
        nz = jnp.where(ispl, bpnz, s_nz)
    elif has_planes:
        nx, ny, nz = bpnx, bpny, bpnz
    else:
        nx, ny, nz = s_nx, s_ny, s_nz

    # lambert (mg_ray_tracer.cpp:109-123)
    lxr, lyr, lzr = nx + ux, ny + uy, nz + uz
    ln2 = lxr * lxr + lyr * lyr + lzr * lzr
    ldeg = ln2 < 1e-16
    linv = jax.lax.rsqrt(jnp.where(ldeg, 1.0, jnp.maximum(ln2, 1e-30)))
    ndx = jnp.where(ldeg, nx, lxr * linv)
    ndy = jnp.where(ldeg, ny, lyr * linv)
    ndz = jnp.where(ldeg, nz, lzr * linv)

    mabs = fbool
    is_met = fbool
    refl_bit = fbool
    tir = fbool
    inside = fbool
    is_die = fbool
    if has_met or has_die:
        ddot = dx * nx + dy * ny + dz * nz
        rx = dx - 2.0 * ddot * nx
        ry = dy - 2.0 * ddot * ny
        rz = dz - 2.0 * ddot * nz
    if has_met:
        mx = rx + brg * ux
        my = ry + brg * uy
        mz = rz + brg * uz
        mabs = (mx * nx + my * ny + mz * nz) <= 0.0
        minv = jax.lax.rsqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-30))
        is_met = bcl == 1.0
        ndx = jnp.where(is_met, mx * minv, ndx)
        ndy = jnp.where(is_met, my * minv, ndy)
        ndz = jnp.where(is_met, mz * minv, ndz)
    if has_die:
        inside = ddot > 0.0
        sgn = jnp.where(inside, f32(-1.0), f32(1.0))
        onx, ony, onz = sgn * nx, sgn * ny, sgn * nz
        eta = jnp.where(inside, brf, 1.0 / jnp.maximum(brf, 1e-12))
        cosine = jnp.where(inside, brf * ddot, -ddot)
        cos_i = jnp.where(inside, ddot, -ddot)
        sin2 = eta * eta * (1.0 - cos_i * cos_i)
        tir = sin2 > 1.0
        cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2, 1e-12)))
        cos_t = jnp.where(tir, 0.0, cos_t)
        fxx = eta * dx + (eta * cos_i - cos_t) * onx
        fyy = eta * dy + (eta * cos_i - cos_t) * ony
        fzz = eta * dz + (eta * cos_i - cos_t) * onz
        r0_ = (1.0 - brf) / (1.0 + brf)
        r0_ = r0_ * r0_
        omc = 1.0 - cosine
        omc2 = omc * omc
        prob = jnp.where(tir, 1.0, r0_ + (1.0 - r0_) * omc2 * omc2 * omc)
        refl_bit = coin < prob
        gx = jnp.where(refl_bit, rx, fxx)
        gy = jnp.where(refl_bit, ry, fyy)
        gz = jnp.where(refl_bit, rz, fzz)
        ginv = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
        is_die = bcl == 2.0
        ndx = jnp.where(is_die, gx * ginv, ndx)
        ndy = jnp.where(is_die, gy * ginv, ndy)
        ndz = jnp.where(is_die, gz * ginv, ndz)

    alive = live_h & ~(is_met & mabs) if has_met else live_h
    af = alive.astype(f32)
    naf = 1.0 - af
    thr_n = (tr * (naf + af * bar * brf),
             tg * (naf + af * bag * brf),
             tb * (naf + af * bab * brf))

    lh = live_h.astype(f32)
    nlh = 1.0 - lh
    o_n = (nlh * ox + lh * hx, nlh * oy + lh * hy, nlh * oz + lh * hz)
    d_n = (nlh * dx + lh * ndx, nlh * dy + lh * ndy, nlh * dz + lh * ndz)

    bits = dict(hit=hit, live_h=live_h, miss=miss, alive=alive,
                ispl=ispl, root=broot > 0.0, ldeg=ldeg,
                mabs=mabs, refl_bit=refl_bit, tir=tir,
                inside=inside, is_met=is_met, is_die=is_die)
    return o_n, d_n, thr_n, rad, bits


def _decisions(best_t, pay, bpl, broot, bcl, o3, d3, lv, u3, coin,
               has_met=True, has_die=True):
    """Decision bits from the forward values — the discrete structure pinned
    for the detached-sampling vjp (same math as the render kernel).  The
    metal/dielectric decision math is skipped (bits pinned all-false) when
    the baked scene has no such materials — see _bounce_smooth."""
    f32 = jnp.float32
    ox, oy, oz = o3
    dx, dy, dz = d3
    ux, uy, uz = u3
    (bcx, bcy, bcz, brad, bpnx, bpny, bpnz, bpdd,
     bar, bag, bab, brf, brg) = pay

    hit = best_t < f32(1e37)
    live_h = lv & hit
    t_safe = jnp.where(hit, best_t, 0.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz
    snx, sny, snz = hx - bcx, hy - bcy, hz - bcz
    sinv = jax.lax.rsqrt(jnp.maximum(snx * snx + sny * sny + snz * snz, 1e-30))
    ispl = bpl > 0.0
    nx = jnp.where(ispl, bpnx, snx * sinv)
    ny = jnp.where(ispl, bpny, sny * sinv)
    nz = jnp.where(ispl, bpnz, snz * sinv)
    lxr, lyr, lzr = nx + ux, ny + uy, nz + uz
    ldeg = (lxr * lxr + lyr * lyr + lzr * lzr) < 1e-16
    fbool = jnp.zeros(jnp.shape(best_t), jnp.bool_)
    if has_met or has_die:
        ddot = dx * nx + dy * ny + dz * nz
    if has_met:
        mxr = (dx - 2.0 * ddot * nx) + brg * ux
        myr = (dy - 2.0 * ddot * ny) + brg * uy
        mzr = (dz - 2.0 * ddot * nz) + brg * uz
        mabs = (mxr * nx + myr * ny + mzr * nz) <= 0.0
        is_met = bcl == 1.0
    else:
        mabs = fbool
        is_met = fbool
    if has_die:
        inside = ddot > 0.0
        eta = jnp.where(inside, brf, 1.0 / jnp.maximum(brf, 1e-12))
        cosine = jnp.where(inside, brf * ddot, -ddot)
        cos_i = jnp.where(inside, ddot, -ddot)
        sin2 = eta * eta * (1.0 - cos_i * cos_i)
        tir = sin2 > 1.0
        r0_ = (1.0 - brf) / (1.0 + brf)
        r0_ = r0_ * r0_
        omc = 1.0 - cosine
        omc2 = omc * omc
        prob = jnp.where(tir, 1.0, r0_ + (1.0 - r0_) * omc2 * omc2 * omc)
        refl_bit = coin < prob
        is_die = bcl == 2.0
    else:
        inside = fbool
        tir = fbool
        refl_bit = fbool
        is_die = fbool

    alive = live_h & ~(is_met & mabs) if has_met else live_h
    miss = lv & ~hit

    return dict(hit=hit, live_h=live_h, miss=miss, alive=alive,
                ispl=ispl, root=broot > 0.0, ldeg=ldeg,
                mabs=mabs, refl_bit=refl_bit, tir=tir,
                inside=inside, is_met=is_met, is_die=is_die)


def _make_mono_kernel(s_cols, p_cols, *, width, height, spp, max_bounces,
                      rows, rng_mode, rng_impl, lean, residuals="recompute",
                      dbg=(), tune=(), cot_input=False, center0=True):
    """One kernel = one full MSE training step over all spp samples.

    ``residuals="eager"`` (requires ``lean=False``): take the per-bounce
    ``jax.vjp`` at *forward* time and stash the vjp closures — JAX keeps the
    smooth map's intermediate values as residuals, so the reverse sweep runs
    the transpose only, skipping the per-bounce primal recompute (~40% of
    reverse-sweep ops) at the price of a larger VMEM footprint.  The default
    stashes inputs only and lets the vjp recompute the primal (manual
    rematerialisation), which is what fits bigger tiles.

    ``dbg``: measurement-only cost-split knobs (WRONG gradients for the
    skipped part).  "skip_reverse" drops phase 3 entirely (forward sweeps +
    stash + loss only; the stash is kept alive through an anchor sum so DCE
    can't delete it), "skip_prim" keeps the reverse vjp transposes but drops
    the per-primitive accumulation.

    ``tune``: semantics-preserving layout/scheduling switches (gradients
    identical, speed differs):

    * "acc_outside" — keep the per-primitive gradient accumulators OUT of
      the reverse early-out ``lax.cond``: the cond returns the winner
      cotangents (13 arrays) + attribution masks and the masked
      accumulation runs unconditionally after it.  The round-3 cost split
      on v5e-1 (800x600 @ 4spp d8 basic) measured the accumulator carries
      as ~88% of the reverse cost (1.41 of 1.60 ms) — the cond's carry
      copies of 9*(S+P) wide running sums swamp the ~0.18 ms vjp transpose.
    * "fwd_dense" / "rev_dense" — drop the per-bounce dead-tile lax.cond
      in the forward / reverse sweep (measurement + fallback).
    * "recompute_u" (requires ``rng_impl="hash"`` + lean) — don't stash the
      3 scatter unit-vector arrays: the counter-based hash RNG is
      re-evaluable at reverse time from (pixel index, seed, static draw
      counter), shrinking the lean stash 14 -> 11 arrays per bounce.
    * "acc_scratch" — per-primitive gradient accumulators live in a VMEM
      scratch ref with read-modify-write INSIDE the reverse cond: no cond
      carries AND dead bounces skip the accumulation entirely (the
      remaining ~0.6 ms the acc_outside layout still paid)."""
    dbg_skip_reverse = "skip_reverse" in dbg
    dbg_skip_prim = "skip_prim" in dbg
    dbg_anyl_const = "anyl_const" in dbg
    assert not dbg_skip_reverse or lean, "dbg skip_reverse supports lean only"
    hand_rev = "hand_rev" in tune
    acc_scratch = "acc_scratch" in tune
    acc_outside = "acc_outside" in tune and not acc_scratch
    recompute_u = "recompute_u" in tune
    assert not recompute_u or (rng_impl == "hash" and lean), \
        "recompute_u requires the counter-based hash RNG and the lean stash"
    slim = "slim_stash" in tune
    assert not slim or lean, "slim_stash requires the lean stash"
    n_spheres = s_cols.shape[1]
    n_planes = p_cols.shape[1]
    f32 = jnp.float32
    S_pad = max(n_spheres, 1)
    P_pad = max(n_planes, 1)
    assert not (lean and residuals == "eager"), \
        "eager residuals subsume the payload stash; lean must be False"
    scan = _make_scan(s_cols, p_cols, rows)
    # class-presence specialization (bit-exact: absent classes have
    # all-false select masks) — see _bounce_smooth
    has_met = bool((s_cols[9] == 1.0).any() or (p_cols[9] == 1.0).any())
    has_die = bool((s_cols[9] == 2.0).any() or (p_cols[9] == 2.0).any())
    _smooth = functools.partial(_bounce_smooth, has_met=has_met,
                                has_die=has_die,
                                has_planes=n_planes > 0,
                                has_spheres=n_spheres > 0)
    _decide = functools.partial(_decisions, has_met=has_met,
                                has_die=has_die)
    _fwdb = functools.partial(_bounce_forward, has_met=has_met,
                              has_die=has_die,
                              has_planes=n_planes > 0,
                              has_spheres=n_spheres > 0)
    active = _active_bits(has_met, has_die, n_planes > 0, n_spheres > 0)
    assert not hand_rev or (n_planes == 0 and n_spheres > 0), \
        "hand_rev covers the spheres-only (no planes) specialization"
    # Per-bounce dead-tile early-out gates (measured on v5e-1): the lean
    # stash rides the lax.cond with only 2 extra carries and wins (mono
    # rows=16 lean: 370 -> 448 Mrays/s on the headline bench); the 41-array
    # payload stash as cond carries blows the 16 MiB scoped-VMEM limit, and
    # eager's vjp closures cannot cross a cond — both stay dense.  With
    # "acc_outside" the reverse cond no longer carries the per-primitive
    # accumulators, so its prim-count gate only guards the 13-array winner
    # cotangent output.
    fwd_eo = lean and "fwd_dense" not in tune
    rev_eo = (lean and "rev_dense" not in tune
              and (acc_outside or acc_scratch
                   or (n_spheres + n_planes) <= 32))
    # wide per-primitive accumulators: (rows,128) running sums per
    # (slot, primitive) — gate on VMEM footprint
    wide = (9 * (n_spheres + n_planes) * rows * 128 * 4) <= (2 << 20)
    inv_spp = 1.0 / spp

    def kernel(cam_ref, seed_ref, tgt_ref, loss_ref, sg_ref, pg_ref, cg_ref,
               *scratch):
        if acc_scratch:
            (acc_ref,) = scratch
        tile = pl.program_id(0)

        lane_r = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        idx = (tile * rows + lane_r) * 128 + lane_c
        px = (idx % width).astype(f32)
        py = (idx // width).astype(f32)
        maskf = (idx < width * height).astype(f32)

        cam = [cam_ref[i] for i in range(15)]
        zero = jnp.zeros((rows, 128), f32)
        one = jnp.ones((rows, 128), f32)

        draw_ctr = [0]
        seed_cur = [0]

        def u01():
            if rng_impl == "hw":
                return _u01((rows, 128))
            draw_ctr[0] += 1
            return _hash_u01(idx, seed_ref[seed_cur[0]], draw_ctr[0],
                             (rows, 128))

        # ------------- phase 1: forward sweeps, all samples ---------------
        img = [zero, zero, zero]
        sample_stash = []   # per sample: list of per-bounce dicts
        sample_o0 = []      # slim: raygen origin per sample (chain seed)
        raygen_vjps = []
        for s in range(spp):
            seed_cur[0] = s
            draw_ctr[0] = 0
            if rng_impl == "hw":
                pltpu.prng_seed(seed_ref[s] + tile * jnp.int32(1000003))
            u = u01()
            v = u01()
            if s == 0 and center0:
                # sample 0 at the pixel centre (mg_ray_tracer.cpp:189);
                # center0=False for spp-chunked pipelines whose chunk does
                # not start at the global sample 0 (draws are consumed
                # either way so the stream stays aligned)
                jx = jnp.full((rows, 128), f32(0.5))
                jy = jnp.full((rows, 128), f32(0.5))
            else:
                jx, jy = u, v

            def raygen(cam_v, jx=jx, jy=jy):
                cpx, cpy, cpz = cam_v[0], cam_v[1], cam_v[2]
                r = cam_v[3:12]
                tan_half, aspect, near = cam_v[12], cam_v[13], cam_v[14]
                nx_ = 2.0 * (px + jx) * f32(1.0 / width) - 1.0
                ny_ = 1.0 - 2.0 * (py + jy) * f32(1.0 / height)
                dvx = nx_ * tan_half * aspect
                dvy = ny_ * tan_half
                dwx = r[0] * dvx + r[1] * dvy - r[2]
                dwy = r[3] * dvx + r[4] * dvy - r[5]
                dwz = r[6] * dvx + r[7] * dvy - r[8]
                ox = cpx + dwx * near
                oy = cpy + dwy * near
                oz = cpz + dwz * near
                inv = jax.lax.rsqrt(dwx * dwx + dwy * dwy + dwz * dwz)
                return (ox, oy, oz, dwx * inv, dwy * inv, dwz * inv)

            rays, rvjp = jax.vjp(raygen, tuple(cam))
            raygen_vjps.append(rvjp)
            ox, oy, oz, dx, dy, dz = rays
            if slim:
                sample_o0.append((ox, oy, oz))

            tr = one
            tg = one
            tb = one
            live = one
            stash = []
            for b in range(max_bounces):
                # draws hoisted above the early-out cond: the RNG stream is
                # identical whether or not a bounce is skipped (the scan
                # consumes no draws, so the global order matches the dense
                # kernel and the hash-RNG counters stay aligned)
                ux = u01()
                uy = u01()
                uz = u01()
                if rng_mode == "sphere":
                    ux = 2.0 * ux - 1.0
                    uy = 2.0 * uy - 1.0
                    uz = 2.0 * uz - 1.0
                uinv = jax.lax.rsqrt(
                    jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-30))
                ux, uy, uz = ux * uinv, uy * uinv, uz * uinv
                coin = u01()
                # dead-tile early-out predicate (stashed for the reverse
                # sweep: a bounce skipped forward is skipped backward too)
                anyl = (jnp.bool_(True) if dbg_anyl_const
                        else jnp.sum(live) > 0.0)

                if residuals == "eager":
                    # vjp closures cannot cross a lax.cond boundary: the
                    # eager forward stays dense; phase 3 still early-outs
                    lv = live > 0.0
                    best_t, pay, bidx, bpl, broot, bcl = scan(
                        (ox, oy, oz), (dx, dy, dz))
                    bits = _decide(best_t, pay, bpl, broot, bcl,
                                      (ox, oy, oz), (dx, dy, dz), lv,
                                      (ux, uy, uz), coin)

                    def fb(o3, d3, thr3, pay_, u3=(ux, uy, uz), bits=bits):
                        return _smooth(o3, d3, thr3, pay_, u3, bits)

                    (o_n, d_n, thr_n, rad), fvjp = jax.vjp(
                        fb, (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), pay)
                    stash.append(dict(fvjp=fvjp, bits=bits,
                                      bidx=bidx, bpl=bpl, anyl=anyl))
                    img[0] += rad[0]
                    img[1] += rad[1]
                    img[2] += rad[2]
                    ox, oy, oz = o_n
                    dx, dy, dz = d_n
                    tr, tg, tb = thr_n
                    live = bits["alive"].astype(f32)
                    continue

                def fwd_body(carry, ux=ux, uy=uy, uz=uz, coin=coin):
                    (ox, oy, oz, dx, dy, dz, tr, tg, tb, live,
                     i0, i1, i2) = carry
                    lv = live > 0.0
                    best_t, pay, bidx, bpl, broot, bcl = scan(
                        (ox, oy, oz), (dx, dy, dz))
                    o_n, d_n, thr_n, rad, bits = _fwdb(
                        (ox, oy, oz), (dx, dy, dz), (tr, tg, tb),
                        best_t, pay, bpl, broot, bcl, lv,
                        (ux, uy, uz), coin)
                    state = (o_n[0], o_n[1], o_n[2], d_n[0], d_n[1], d_n[2],
                             thr_n[0], thr_n[1], thr_n[2],
                             bits["alive"].astype(f32),
                             i0 + rad[0], i1 + rad[1], i2 + rad[2])
                    if lean:
                        packed = jnp.zeros((rows, 128), jnp.int32)
                        for k, name in enumerate(active):
                            packed = packed | jnp.where(bits[name],
                                                        jnp.int32(1 << k),
                                                        jnp.int32(0))
                        if slim:
                            # winner index rides the bits word (<=640 prims
                            # fit bits 16..25) and the live hit distance tau
                            # replaces the 3-array origin stash: the reverse
                            # sweep REPLAYS the origin chain forward
                            # (o[b+1] = o[b] + tau[b]*d[b] from the raygen
                            # origin — bit-exact, the same adds in the same
                            # order as the forward), so the per-(bounce,
                            # sample) stash drops 11 -> 8 live arrays — the
                            # VMEM that unlocks taller dielectric tiles.
                            packed = packed | (
                                bidx.astype(jnp.int32) << jnp.int32(16))
                            tau = jnp.where(bits["live_h"], best_t, 0.0)
                            return state + (packed, tau)
                        return state + (packed, bidx)
                    return (state + pay + (bidx, bpl)
                            + tuple(bits[nm] for nm in _BITS))

                def fwd_skip(carry):
                    if lean:
                        return tuple(carry) + (
                            jnp.zeros((rows, 128), jnp.int32), zero)
                    fbool = jnp.zeros((rows, 128), jnp.bool_)
                    return (tuple(carry) + tuple([zero] * 13) + (zero, zero)
                            + tuple([fbool] * 13))

                carry = (ox, oy, oz, dx, dy, dz, tr, tg, tb, live,
                         img[0], img[1], img[2])
                out = (fwd_body(carry) if (b == 0 or not fwd_eo) else
                       jax.lax.cond(anyl, fwd_body, fwd_skip, carry))
                o_prev = (ox, oy, oz)
                d_prev = (dx, dy, dz)
                thr_prev = (tr, tg, tb)
                (ox, oy, oz, dx, dy, dz, tr, tg, tb, live,
                 img[0], img[1], img[2]) = out[:13]
                if lean and slim:
                    ent = dict(
                        d=d_prev, thr=thr_prev,
                        packed=out[13], tau=out[14], anyl=anyl)
                    if recompute_u:
                        ent["useed"] = seed_ref[s]
                        ent["uctr"] = 3 + 4 * b
                    else:
                        ent["u"] = (ux, uy, uz)
                    stash.append(ent)
                elif lean:
                    ent = dict(
                        o=o_prev, d=d_prev, thr=thr_prev,
                        packed=out[13], bidx=out[14], anyl=anyl)
                    if recompute_u:
                        # hash draws are re-evaluable: ctr layout per sample
                        # is [jitter u,v] then 4 per bounce (ux,uy,uz,coin)
                        ent["useed"] = seed_ref[s]
                        ent["uctr"] = 3 + 4 * b
                    else:
                        ent["u"] = (ux, uy, uz)
                    stash.append(ent)
                else:
                    stash.append(dict(
                        o=o_prev, d=d_prev, thr=thr_prev,
                        pay=tuple(out[13:26]), u=(ux, uy, uz),
                        bits={nm: out[28 + i] for i, nm in enumerate(_BITS)},
                        bidx=out[26], bpl=out[27], anyl=anyl))
            sample_stash.append(stash)

        # ------------- phase 2: local loss + cotangent --------------------
        if cot_input:
            # spp-chunked pipeline: the pixel cotangent (computed once from
            # the full-spp forward frame) arrives prescaled in the target
            # block slot; the chunk contributes no loss of its own
            loss_ref[0, 0, 0] = f32(0.0)
            cot = [tgt_ref[0, c] * maskf for c in range(3)]
        else:
            diff = [(img[c] * f32(inv_spp) - tgt_ref[0, c]) * maskf
                    for c in range(3)]
            loss_ref[0, 0, 0] = jnp.sum(diff[0] * diff[0] + diff[1] * diff[1]
                                        + diff[2] * diff[2])
            cot_scale = f32(2.0 / (3.0 * width * height * spp))
            cot = [d_ * cot_scale for d_ in diff]

        # ------------- phase 3: reverse sweeps ----------------------------
        # Per-(slot, primitive) accumulators live in ONE flat list so the
        # whole per-bounce reverse step (payload rebuild + vjp transpose +
        # accumulation) can ride through the early-out lax.cond as a single
        # carry.  wide -> (rows, 128) running sums; else (1, 128) lane
        # partials.  Cross-lane reduction happens once, at the write-out.
        acc0 = zero if wide else jnp.zeros((1, 128), f32)
        accs = [acc0] * (9 * (n_spheres + n_planes))
        if acc_scratch:
            for pos in range(9 * (n_spheres + n_planes)):
                acc_ref[pos, :, :] = zero

        def s_pos(k, si):
            return k * n_spheres + si

        def p_pos(k, pi):
            return 9 * n_spheres + k * n_planes + pi

        cam_tot = None

        for s in (() if dbg_skip_reverse else range(spp)):
            stash = sample_stash[s]
            co = [zero, zero, zero]
            cd = [zero, zero, zero]
            ct = [zero, zero, zero]
            if slim:
                # replay the origin chain FORWARD from the raygen origin:
                # o[b+1] = o[b] + tau[b]*d[b] is the identical fp expression
                # the forward sweep evaluated (tau = live_h ? best_t : 0
                # folds the live-select into the advance), so every o[b] is
                # BIT-EXACT — no reconstruction tolerance.  The replayed
                # origins live only through this sample's reverse sweep,
                # which is what frees the 3 origin stash arrays per
                # (bounce, sample) across the phase-1 -> phase-3 span.
                o_cur = tuple(sample_o0[s])
                o_chain = [o_cur]
                for bb in range(max_bounces - 1):
                    stb = stash[bb]
                    o_cur = (o_cur[0] + stb["tau"] * stb["d"][0],
                             o_cur[1] + stb["tau"] * stb["d"][1],
                             o_cur[2] + stb["tau"] * stb["d"][2])
                    o_chain.append(o_cur)
            for b in reversed(range(max_bounces)):
                st = stash[b]
                if slim:
                    st = dict(st)
                    st["o"] = o_chain[b]
                    st["bidx"] = ((st["packed"] >> jnp.int32(16))
                                  & jnp.int32(1023)).astype(f32)

                def rebuild_vjp(co, cd, ct, st=st, rad_only=False):
                    """Payload rebuild (lean) + smooth-map vjp transpose.
                    Returns (co', cd', ct', pay_cot, live_h_f, bidx, bplf).

                    ``rad_only``: at the LAST bounce the incoming (co, cd,
                    ct) are exactly zero, so the full transpose reduces to
                    the radiance-output chain — vjp of ``_smooth(...)[3]``
                    lets DCE drop the scatter/state chains (bit-exact:
                    the dropped terms are multiplications by exact zeros,
                    and rad touches no payload so pay_cot is exactly 0)."""
                    if lean:
                        packed = st["packed"]
                        fbool = jnp.zeros((rows, 128), jnp.bool_)
                        rbits = {name: ((packed >> k) & 1) > 0
                                 for k, name in enumerate(active)}
                        hitb = rbits["hit"]
                        if "ispl" not in rbits:
                            # single-class scenes: statically known
                            rbits["ispl"] = hitb if n_spheres == 0 else fbool
                        for name in _BITS:
                            rbits.setdefault(name, fbool)
                        isplb = rbits["ispl"]
                        rcx = rcy = rcz = zero
                        rrad = one
                        rpnx = rpny = rpnz = rpdd = zero
                        rar = rag = rab = zero
                        rrf = one
                        rrg = zero
                        sph_m = hitb & ~isplb
                        for si in range(n_spheres):
                            m = sph_m & (st["bidx"] == f32(si))
                            rcx = jnp.where(m, float(s_cols[0, si]), rcx)
                            rcy = jnp.where(m, float(s_cols[1, si]), rcy)
                            rcz = jnp.where(m, float(s_cols[2, si]), rcz)
                            rrad = jnp.where(m, float(s_cols[3, si]), rrad)
                            rar = jnp.where(m, float(s_cols[4, si]), rar)
                            rag = jnp.where(m, float(s_cols[5, si]), rag)
                            rab = jnp.where(m, float(s_cols[6, si]), rab)
                            rrf = jnp.where(m, float(s_cols[7, si]), rrf)
                            rrg = jnp.where(m, float(s_cols[8, si]), rrg)
                        for pi in range(n_planes):
                            m = isplb & (st["bidx"] == f32(pi))
                            rpnx = jnp.where(m, float(p_cols[0, pi]), rpnx)
                            rpny = jnp.where(m, float(p_cols[1, pi]), rpny)
                            rpnz = jnp.where(m, float(p_cols[2, pi]), rpnz)
                            rpdd = jnp.where(m, float(p_cols[3, pi]), rpdd)
                            rar = jnp.where(m, float(p_cols[4, pi]), rar)
                            rag = jnp.where(m, float(p_cols[5, pi]), rag)
                            rab = jnp.where(m, float(p_cols[6, pi]), rab)
                            rrf = jnp.where(m, float(p_cols[7, pi]), rrf)
                            rrg = jnp.where(m, float(p_cols[8, pi]), rrg)
                        stl = dict(st, bits=rbits,
                                   pay=(rcx, rcy, rcz, rrad, rpnx, rpny,
                                        rpnz, rpdd, rar, rag, rab, rrf, rrg),
                                   bpl=isplb.astype(f32))
                        if recompute_u:
                            # bit-exact replay of the forward's draws +
                            # transform + normalize (same expressions)
                            ru = [_hash_u01(idx, st["useed"], st["uctr"] + i,
                                            (rows, 128)) for i in range(3)]
                            if rng_mode == "sphere":
                                ru = [2.0 * x - 1.0 for x in ru]
                            ruinv = jax.lax.rsqrt(jnp.maximum(
                                ru[0] * ru[0] + ru[1] * ru[1]
                                + ru[2] * ru[2], 1e-30))
                            stl["u"] = (ru[0] * ruinv, ru[1] * ruinv,
                                        ru[2] * ruinv)
                    else:
                        stl = st

                    if residuals == "eager":
                        fvjp = stl["fvjp"]
                        cots = fvjp(((co[0], co[1], co[2]),
                                     (cd[0], cd[1], cd[2]),
                                     (ct[0], ct[1], ct[2]),
                                     (cot[0], cot[1], cot[2])))
                    elif rad_only:
                        def fb_r(o3, d3, thr3, pay, stl=stl):
                            return _smooth(o3, d3, thr3, pay,
                                           stl["u"], stl["bits"])[3]

                        primals = (stl["o"], stl["d"], stl["thr"], stl["pay"])
                        _, fvjp = jax.vjp(fb_r, *primals)
                        cots = fvjp((cot[0], cot[1], cot[2]))
                    elif hand_rev:
                        cots = _bounce_reverse_noplanes(
                            stl["o"], stl["d"], stl["thr"], stl["pay"],
                            stl["u"], stl["bits"],
                            (co[0], co[1], co[2]), (cd[0], cd[1], cd[2]),
                            (ct[0], ct[1], ct[2]), (cot[0], cot[1], cot[2]),
                            has_met=has_met, has_die=has_die)
                    else:
                        def fb(o3, d3, thr3, pay, stl=stl):
                            return _smooth(o3, d3, thr3, pay,
                                           stl["u"], stl["bits"])

                        primals = (stl["o"], stl["d"], stl["thr"], stl["pay"])
                        _, fvjp = jax.vjp(fb, *primals)
                        cots = fvjp(((co[0], co[1], co[2]),
                                     (cd[0], cd[1], cd[2]),
                                     (ct[0], ct[1], ct[2]),
                                     (cot[0], cot[1], cot[2])))
                    (co_p, cd_p, ct_p, pay_cot) = cots
                    return (co_p, cd_p, ct_p, pay_cot,
                            stl["bits"]["live_h"].astype(f32),
                            stl["bidx"], stl["bpl"])

                def accumulate(accs, pay_cot, live_h_f, bidx, bplf):
                    # 0/1-mask multiply (fuses to an FMA) instead of
                    # where+add: exact for finite cotangents (mask * x is
                    # x or +-0.0) and one op per (slot, prim) cheaper
                    accs = list(accs)
                    live_h = live_h_f > 0.0
                    sph_live = ~(bplf > 0.0) & live_h
                    pl_live = (bplf > 0.0) & live_h
                    for si in range(n_spheres):
                        mf = ((bidx == f32(si)) & sph_live).astype(f32)
                        for k, cslot in enumerate((0, 1, 2, 3, 8, 9, 10, 11, 12)):
                            if wide:
                                accs[s_pos(k, si)] = accs[s_pos(k, si)] + \
                                    mf * pay_cot[cslot]
                            else:
                                accs[s_pos(k, si)] = accs[s_pos(k, si)] + \
                                    jnp.sum(mf * pay_cot[cslot],
                                            axis=0, keepdims=True)
                    for pi in range(n_planes):
                        mf = ((bidx == f32(pi)) & pl_live).astype(f32)
                        for k, cslot in enumerate((4, 5, 6, 7, 8, 9, 10, 11, 12)):
                            if wide:
                                accs[p_pos(k, pi)] = accs[p_pos(k, pi)] + \
                                    mf * pay_cot[cslot]
                            else:
                                accs[p_pos(k, pi)] = accs[p_pos(k, pi)] + \
                                    jnp.sum(mf * pay_cot[cslot],
                                            axis=0, keepdims=True)
                    return accs

                def accumulate_scratch(pay_cot, live_h_f, bidx, bplf):
                    live_h = live_h_f > 0.0
                    sph_live = ~(bplf > 0.0) & live_h
                    pl_live = (bplf > 0.0) & live_h
                    for si in range(n_spheres):
                        mf = ((bidx == f32(si)) & sph_live).astype(f32)
                        for k, cslot in enumerate((0, 1, 2, 3, 8, 9, 10, 11, 12)):
                            pos = s_pos(k, si)
                            acc_ref[pos, :, :] = acc_ref[pos, :, :] + \
                                mf * pay_cot[cslot]
                    for pi in range(n_planes):
                        mf = ((bidx == f32(pi)) & pl_live).astype(f32)
                        for k, cslot in enumerate((4, 5, 6, 7, 8, 9, 10, 11, 12)):
                            pos = p_pos(k, pi)
                            acc_ref[pos, :, :] = acc_ref[pos, :, :] + \
                                mf * pay_cot[cslot]

                ro = (b == max_bounces - 1) and residuals != "eager"
                if acc_scratch:
                    # accumulators in scratch VMEM: read-modify-write inside
                    # the cond — no carries, and dead bounces skip the adds
                    def rev_core_s(carry, st=st, ro=ro):
                        co_p, cd_p, ct_p, pay_cot, lhf, bidx, bplf = \
                            rebuild_vjp(carry[0:3], carry[3:6], carry[6:9],
                                        st=st, rad_only=ro)
                        if not (dbg_skip_prim or ro):
                            accumulate_scratch(pay_cot, lhf, bidx, bplf)
                        return tuple(co_p) + tuple(cd_p) + tuple(ct_p)

                    carry = tuple(co) + tuple(cd) + tuple(ct)
                    out = (rev_core_s(carry) if not rev_eo else
                           jax.lax.cond(st["anyl"], rev_core_s,
                                        lambda c: tuple(c), carry))
                    co = list(out[0:3])
                    cd = list(out[3:6])
                    ct = list(out[6:9])
                elif acc_outside:
                    # the cond returns only the winner cotangents +
                    # attribution masks; the running per-primitive sums
                    # never ride a cond carry (the round-3 profile's 88%)
                    def rev_core(carry, st=st, ro=ro):
                        co_p, cd_p, ct_p, pay_cot, lhf, bidx, bplf = \
                            rebuild_vjp(carry[0:3], carry[3:6], carry[6:9],
                                        st=st, rad_only=ro)
                        return (tuple(co_p) + tuple(cd_p) + tuple(ct_p)
                                + tuple(pay_cot) + (lhf, bidx, bplf))

                    def rev_skip(carry):
                        return tuple(carry) + tuple([zero] * 16)

                    carry = tuple(co) + tuple(cd) + tuple(ct)
                    out = (rev_core(carry) if not rev_eo else
                           jax.lax.cond(st["anyl"], rev_core, rev_skip,
                                        carry))
                    co = list(out[0:3])
                    cd = list(out[3:6])
                    ct = list(out[6:9])
                    if not dbg_skip_prim:
                        accs = accumulate(accs, out[9:22], out[22], out[23],
                                          out[24])
                else:
                    def rev_body(carry, st=st, ro=ro):
                        accs_l = list(carry[9:])
                        co_p, cd_p, ct_p, pay_cot, lhf, bidx, bplf = \
                            rebuild_vjp(carry[0:3], carry[3:6], carry[6:9],
                                        st=st, rad_only=ro)
                        if not (dbg_skip_prim or ro):
                            accs_l = accumulate(accs_l, pay_cot, lhf, bidx,
                                                bplf)
                        return (tuple(co_p) + tuple(cd_p) + tuple(ct_p)
                                + tuple(accs_l))

                    carry = (tuple(co) + tuple(cd) + tuple(ct) + tuple(accs))
                    out = (rev_body(carry) if not rev_eo else
                           jax.lax.cond(st["anyl"], rev_body,
                                        lambda c: tuple(c), carry))
                    co = list(out[0:3])
                    cd = list(out[3:6])
                    ct = list(out[6:9])
                    accs = list(out[9:])

            (cam_cot,) = raygen_vjps[s]((co[0], co[1], co[2],
                                         cd[0], cd[1], cd[2]))
            cam_tot = list(cam_cot) if cam_tot is None else [
                a + b for a, b in zip(cam_tot, cam_cot)]

        if dbg_skip_reverse:
            # keep the forward stash alive (DCE would otherwise delete the
            # packing work phase 3 normally consumes)
            anchor = zero
            for s in range(spp):
                for st in sample_stash[s]:
                    anchor = anchor + st["packed"].astype(f32)
                    anchor = anchor + (st["tau"] if slim else st["bidx"])
                    arrs = [st["d"], st["thr"]]
                    if not slim:
                        arrs.append(st["o"])
                    if "u" in st:  # absent under recompute_u
                        arrs.append(st["u"])
                    for a3 in arrs:
                        anchor = anchor + a3[0] + a3[1] + a3[2]
            cg_ref[0, 0, 0] = jnp.sum(anchor)
            for i in range(1, 16):
                cg_ref[0, 0, i] = f32(0.0)
        else:
            for i in range(15):
                cg_ref[0, 0, i] = cam_tot[i]
            cg_ref[0, 0, 15] = f32(0.0)
        for k in range(9):
            for si in range(S_pad):
                sg_ref[0, k, si] = (
                    jnp.sum(acc_ref[s_pos(k, si), :, :] if acc_scratch
                            else accs[s_pos(k, si)])
                    if si < n_spheres else f32(0.0))
            for pi in range(P_pad):
                pg_ref[0, k, pi] = (
                    jnp.sum(acc_ref[p_pos(k, pi), :, :] if acc_scratch
                            else accs[p_pos(k, pi)])
                    if pi < n_planes else f32(0.0))

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_mono(scene_bytes, shapes, *, width, height, spp, max_bounces,
                   rows, rng_mode, rng_impl, lean, interpret,
                   residuals="recompute", dbg=(), tune=(), cot_input=False,
                   center0=True):
    s_cols = np.frombuffer(scene_bytes[0], np.float32).reshape(shapes[0])
    p_cols = np.frombuffer(scene_bytes[1], np.float32).reshape(shapes[1])
    kernel = _make_mono_kernel(
        s_cols, p_cols, width=width, height=height, spp=spp,
        max_bounces=max_bounces, rows=rows, rng_mode=rng_mode,
        rng_impl=rng_impl, lean=lean, residuals=residuals, dbg=dbg,
        tune=tune, cot_input=cot_input, center0=center0,
    )
    n = width * height
    n_tiles = -(-n // (rows * 128))
    S_pad = max(s_cols.shape[1], 1)
    P_pad = max(p_cols.shape[1], 1)
    scratch_shapes = []
    if "acc_scratch" in tune:
        n_acc = 9 * (s_cols.shape[1] + p_cols.shape[1])
        scratch_shapes.append(
            pltpu.VMEM((max(n_acc, 1), rows, 128), jnp.float32))
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # cam, per-sample seeds
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 3, rows, 128), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch_shapes,
            out_specs=(
                pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 9, S_pad), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 9, P_pad), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 16), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 9, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 9, P_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 16), jnp.float32),
        ),
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=32)
def _compiled_grad(scene_bytes, shapes, *, width, height, max_bounces, rows,
                   rng_mode, center_sample, lean=False, rng_impl="hw",
                   interpret=False, skip_reverse=False, skip_prim=False):
    s_cols = np.frombuffer(scene_bytes[0], np.float32).reshape(shapes[0])
    p_cols = np.frombuffer(scene_bytes[1], np.float32).reshape(shapes[1])
    kernel = _make_grad_kernel(
        s_cols, p_cols, width=width, height=height, max_bounces=max_bounces,
        rows=rows, rng_mode=rng_mode, center_sample=center_sample, lean=lean,
        rng_impl=rng_impl, skip_reverse=skip_reverse, skip_prim=skip_prim,
    )
    n = width * height
    n_tiles = -(-n // (rows * 128))
    S_pad = max(s_cols.shape[1], 1)
    P_pad = max(p_cols.shape[1], 1)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 3, rows, 128), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 9, S_pad), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 9, P_pad), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 16), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 9, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 9, P_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 16), jnp.float32),
        ),
        interpret=interpret,
    )
    return call


def _stash_arrays(lean, rng_impl, tune):
    """Live stash arrays per (bounce, sample) for the mono VMEM gate:
    41 full payload; lean 14; recompute_u drops the 3 scatter-u arrays;
    slim_stash drops the 3 origin arrays + the winner-id array for a tau
    array (net -3).  ``tune=None`` means the _default_tune layout (hash RNG
    gets both reductions)."""
    if not lean:
        return 41
    if tune is not None:
        return (14 - (3 if "recompute_u" in tune else 0)
                - (3 if "slim_stash" in tune else 0))
    return 8 if rng_impl == "hash" else 14


def _default_tune(s_cols, p_cols, rows, rng_impl, mode, lean):
    """Measured round-3 tune defaults (v5e-1, headline shape; see
    _make_mono_kernel's tune docstring for the cost splits).  Returns
    ``(tune, rows)``.  Dielectric scenes get a shorter tile first — the
    fatter Fresnel reverse chains measured 236 KB OVER the 16 MB
    scoped-VMEM limit at rows=24 + scratch (round-3 BD job) — and the
    scratch-accumulator check then uses the FINAL rows, so mid-size
    dielectric scenes keep scratch when it fits at the reduced tile."""
    if mode not in ("mono", "chunked") or not lean:
        return (), rows
    has_die_l = bool((s_cols[9] == 2.0).any() or (p_cols[9] == 2.0).any())
    n_pr = s_cols.shape[1] + p_cols.shape[1]
    if has_die_l and rows > 16:
        # dielectric reverse chains are VMEM-fatter: rows=32 OOMs scoped
        # VMEM (18.5 MB > 16, CH job), but rows=24 + scratch accumulators
        # fits and measured 433 -> 476 Mrays/s on dielectric.toml (CM
        # job; the round-3 'rows 24/32' sm rows were phantoms — the old
        # defaults silently reduced them to 16).  Without scratch (big
        # prim counts) 24 measured no better than 16 — keep 16 there.
        rows = 24 if 9 * n_pr * 24 * 128 * 4 <= (2 << 20) else 16
    elif n_pr > 4 and rows > 24:
        # rows=32 compiles for the 3-sphere headline but OOMs scoped VMEM
        # at 7 primitives even without dielectrics (CD job: 18.5 MB > 16
        # on dielectric.toml under the mg personality) — the reverse live
        # ranges grow with the per-prim accumulators; cap mid-size scenes
        rows = 24
    scratch_ok = 9 * n_pr * rows * 128 * 4 <= (2 << 20)
    tune = (("acc_scratch",) if scratch_ok else ("acc_outside",))
    tune += ("fwd_dense",)
    if rng_impl == "hash":
        # slim_stash: tau-for-origin + winner-id-in-bits-word (11 -> 8 live
        # stash arrays per bounce-sample, bit-exact — the reverse replays
        # the origin chain forward).  Measured perf-neutral on the headline
        # shapes (round-4 CR job); its value is the VMEM headroom that lets
        # the mono kernel keep spp=16 steps (config 2's specified spp) out
        # of the slower per-sample pipeline.
        tune += ("recompute_u", "slim_stash")
    if p_cols.shape[1] == 0 and s_cols.shape[1] > 0:
        # hand-fused reverse bounce for sphere-only scenes, all material
        # classes (matches jax.vjp to float eps; measured 705 -> 734
        # Mrays/s on the headline shape)
        tune += ("hand_rev",)
    return tune, rows


def pallas_mse_loss_and_grad(
    params,
    scene,
    target,
    size: tuple[int, int],
    seed: int = 0,
    *,
    spp: int = 4,
    max_bounces: Optional[int] = None,
    personality: str = "mg",
    rows: int = 32,
    rng_mode: str = "reference",
    lean: bool = True,
    fwd_rows: Optional[int] = None,
    rng_impl: str = "hash",
    interpret: bool = False,
    mode: str = "mono",
    residuals: str = "recompute",
    tune: Optional[tuple] = None,
):
    """MSE loss + scene-parameter gradients, everything on-chip.

    Forward: the render megakernel (pre-gamma mean over spp).  Backward: the
    fused grad kernel per sample, fed the pixel cotangent
    d(MSE)/d(img) = 2 (img - target) / (3 W H).

    Same constraints as the megakernel (baked constants: recompiles when
    scene geometry/material values change; camera/seed dynamic).  Returns
    (loss, grads) with grads keyed like rt_tpu.diff.extract_params
    (camera.rotation grads cover the 9 matrix entries; vfov/near are
    treated as fixed).
    """
    from ..diff import apply_params

    w, h = size
    chunk = None
    if max_bounces is None:
        max_bounces = scene.max_bounces
    concrete = apply_params(scene, jax.tree_util.tree_map(jnp.asarray, params))
    if residuals == "eager":
        # eager stashes full vjp residuals — the lean stash is moot (and the
        # two are mutually exclusive in the kernel); explicit opt-in wins
        # over the lean default
        lean = False
    n_prims = concrete.spheres.count + concrete.planes.count
    if n_prims > MAX_GRAD_PRIMS and not lean:
        # beyond the full-payload stash cap only the winner-id stash fits
        lean = True
    if n_prims > MAX_GRAD_PRIMS and mode == "mono":
        # the mono kernel unrolls spp x bounces x prims — too big past the
        # payload cap; the per-sample pipeline handles 97..640
        mode = "multi"
    if n_prims > MAX_GRAD_PRIMS and mode == "chunked":
        # the chunked variant runs the same fully-unrolled mono kernel per
        # chunk, so it shares the mono payload cap; past it the unroll
        # blows up at compile time rather than producing wrong results
        raise ValueError(
            f"mode='chunked' needs n_prims <= {MAX_GRAD_PRIMS} (the mono "
            "unroll cap); use the per-sample pipeline (mode='multi')")
    if mode == "mono":
        # the mono VMEM stash is (arrays/bounce) x rows x 128 x bounces x
        # spp; Mosaic OOMs well below the 16 MiB scoped-VMEM budget once
        # the reverse live-range peak rides on top, so the router budgets
        # the stash at a measured 4.2 MB and downshifts rows (below) before
        # falling back to the per-sample pipeline
        arrays = _stash_arrays(lean, rng_impl, tune)
        stash_mb = arrays * rows * 128 * 4 * max_bounces * spp / 2**20
        if stash_mb > 4.2:
            # shrink the tile before abandoning the mono kernel: at config
            # 2's 16 spp the rows=8 slim mono step measured 694.7 Mrays/s
            # vs the per-sample pipeline's 569.9 same-session (CV job);
            # rows=16 @ 16 spp (8 MB stash) OOMs scoped VMEM while every
            # measured <=4.2 MB stash layout compiles (rows=32 @ 4 spp,
            # rows=8 @ 16 spp)
            for r_try in (24, 16, 8):
                if r_try < rows and (arrays * r_try * 128 * 4 * max_bounces
                                     * spp / 2**20) <= 4.2:
                    rows = r_try
                    break
            else:
                mode = "multi"
    if mode == "chunked":
        # EXPLICIT opt-in only (measured negative result, CW job: sm@64spp
        # chunked 91.4 ms vs the per-sample pipeline's 83.3 same-session).
        # The cot-input chunks re-run forward sweeps the mono kernel's
        # in-kernel loss avoids, and the rows<=16 tiling the chunk stash
        # forces costs more than the saved dispatches — per-kernel launch
        # overhead inside one jitted program is tiny.  Kept as the
        # explicitly-callable variant + parity test.
        assert lean and rng_impl == "hash" and residuals == "recompute", \
            "chunked needs the lean hash-RNG layout (cross-kernel draws)"
        arrays = _stash_arrays(lean, rng_impl, tune)
        for c_try in (16, 8, 4, 2):
            if spp % c_try:
                continue
            for r_try in (16, 8):
                if (arrays * r_try * 128 * 4 * max_bounces * c_try
                        / 2**20) <= 4.2:
                    chunk, rows = c_try, r_try
                    break
            if chunk is not None:
                break
        if chunk is None:
            raise ValueError("no chunk layout fits the mono stash budget")
    if not pallas_grad_supported(concrete, lean=lean):
        raise ValueError("scene exceeds the fused grad kernel limits")

    s_cols, p_cols = _flatten_primitives(concrete, personality)
    if tune is None:
        tune, rows = _default_tune(s_cols, p_cols, rows, rng_impl, mode, lean)
    common = dict(
        width=w, height=h, spp=spp, max_bounces=max_bounces, rows=rows,
        rng_mode=rng_mode, lean=lean, rng_impl=rng_impl, interpret=interpret,
        S_table=scene.spheres.center.shape[0],
        M_table=scene.materials.albedo.shape[0],
    )
    key_args = (
        (s_cols.tobytes(), p_cols.tobytes()), (s_cols.shape, p_cols.shape),
        bytes(np.asarray(concrete.spheres.material, np.int32)[:concrete.spheres.count]),
        bytes(np.asarray(concrete.planes.material, np.int32)[:concrete.planes.count]),
    )
    if mode == "mono":
        run = _compiled_pipeline_mono(*key_args, residuals=residuals,
                                      tune=tune, **common)
        target_dev = _target_blocks(target, w, h, rows)
    elif mode == "chunked":
        run = _compiled_pipeline_chunked(*key_args, chunk=chunk,
                                         fwd_rows=fwd_rows, tune=tune,
                                         **common)
        target_dev = jnp.asarray(target, jnp.float32)
    else:
        run = _compiled_pipeline(*key_args, fwd_rows=fwd_rows, **common)
        target_dev = jnp.asarray(target, jnp.float32)
    cam = jnp.concatenate([
        jnp.asarray(concrete.camera.position, jnp.float32),
        jnp.asarray(concrete.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(concrete.camera.vfov * 0.5), w / h, concrete.camera.near, 0.0
        ], jnp.float32),
    ])
    loss, grads = run(cam, jnp.int32(seed), target_dev)
    return loss, _pad_missing_grads(grads, params)


def _pad_missing_grads(grads, params):
    """Zero-fill grads for param keys the kernel doesn't cover (the
    --boxes extension adds boxes.center/extents to extract_params; under
    tracer semantics boxes never hit, mg_ray_tracer.cpp:89-93, so their
    gradient is exactly zero) — keeps the grads tree congruent with the
    params tree for optax."""
    out = dict(grads)
    for k, v in params.items():
        if k not in out:
            out[k] = jnp.zeros_like(jnp.asarray(v))
    return out


def make_mse_step(
    params,
    scene,
    target,
    size: tuple[int, int],
    *,
    spp: int = 4,
    max_bounces: Optional[int] = None,
    personality: str = "mg",
    rows: int = 32,
    rng_mode: str = "reference",
    lean: bool = True,
    fwd_rows: Optional[int] = None,
    rng_impl: str = "hash",
    interpret: bool = False,
    mode: str = "mono",
    residuals: str = "recompute",
    dbg: tuple = (),
    tune: Optional[tuple] = None,
):
    """Prebuilt fwd+bwd step: ``step(seed) -> (loss, grads)``.

    Does all host-side prep (param baking, table flattening, camera packing,
    target upload) ONCE; each call then ships a single int32 seed and runs
    one fused dispatch.  This is the steady-state training-loop shape — per
    step the host does no tracing, no tree flattening and no small-array
    uploads (each of those is a round trip through the remote-TPU tunnel).

    ``mode="mono"``: the whole step — all spp forward sweeps, MSE
    loss/cotangent, reverse sweeps, per-primitive reductions — runs in ONE
    pallas kernel (see the mono-kernel section above).  ``mode="multi"``
    is the per-sample pipeline (one forward megakernel + one grad kernel
    per sample), with the dbg cost-split knobs.
    """
    from ..diff import apply_params

    w, h = size
    chunk = None
    if max_bounces is None:
        max_bounces = scene.max_bounces
    concrete = apply_params(scene, jax.tree_util.tree_map(jnp.asarray, params))
    if residuals == "eager":
        # eager stashes full vjp residuals — the lean stash is moot (and the
        # two are mutually exclusive in the kernel); explicit opt-in wins
        # over the lean default
        lean = False
    n_prims = concrete.spheres.count + concrete.planes.count
    if n_prims > MAX_GRAD_PRIMS and not lean:
        # beyond the full-payload stash cap only the winner-id stash fits
        lean = True
    if n_prims > MAX_GRAD_PRIMS and mode == "mono":
        # the mono kernel unrolls spp x bounces x prims — too big past the
        # payload cap; the per-sample pipeline handles 97..640
        mode = "multi"
    if n_prims > MAX_GRAD_PRIMS and mode == "chunked":
        # the chunked variant runs the same fully-unrolled mono kernel per
        # chunk, so it shares the mono payload cap; past it the unroll
        # blows up at compile time rather than producing wrong results
        raise ValueError(
            f"mode='chunked' needs n_prims <= {MAX_GRAD_PRIMS} (the mono "
            "unroll cap); use the per-sample pipeline (mode='multi')")
    if mode == "mono":
        # the mono VMEM stash is (arrays/bounce) x rows x 128 x bounces x
        # spp; Mosaic OOMs well below the 16 MiB scoped-VMEM budget once
        # the reverse live-range peak rides on top, so the router budgets
        # the stash at a measured 4.2 MB and downshifts rows (below) before
        # falling back to the per-sample pipeline
        arrays = _stash_arrays(lean, rng_impl, tune)
        stash_mb = arrays * rows * 128 * 4 * max_bounces * spp / 2**20
        if stash_mb > 4.2:
            # shrink the tile before abandoning the mono kernel: at config
            # 2's 16 spp the rows=8 slim mono step measured 694.7 Mrays/s
            # vs the per-sample pipeline's 569.9 same-session (CV job);
            # rows=16 @ 16 spp (8 MB stash) OOMs scoped VMEM while every
            # measured <=4.2 MB stash layout compiles (rows=32 @ 4 spp,
            # rows=8 @ 16 spp)
            for r_try in (24, 16, 8):
                if r_try < rows and (arrays * r_try * 128 * 4 * max_bounces
                                     * spp / 2**20) <= 4.2:
                    rows = r_try
                    break
            else:
                mode = "multi"
    if mode == "chunked":
        # EXPLICIT opt-in only (measured negative result, CW job: sm@64spp
        # chunked 91.4 ms vs the per-sample pipeline's 83.3 same-session).
        # The cot-input chunks re-run forward sweeps the mono kernel's
        # in-kernel loss avoids, and the rows<=16 tiling the chunk stash
        # forces costs more than the saved dispatches — per-kernel launch
        # overhead inside one jitted program is tiny.  Kept as the
        # explicitly-callable variant + parity test.
        assert lean and rng_impl == "hash" and residuals == "recompute", \
            "chunked needs the lean hash-RNG layout (cross-kernel draws)"
        arrays = _stash_arrays(lean, rng_impl, tune)
        for c_try in (16, 8, 4, 2):
            if spp % c_try:
                continue
            for r_try in (16, 8):
                if (arrays * r_try * 128 * 4 * max_bounces * c_try
                        / 2**20) <= 4.2:
                    chunk, rows = c_try, r_try
                    break
            if chunk is not None:
                break
        if chunk is None:
            raise ValueError("no chunk layout fits the mono stash budget")
    if not pallas_grad_supported(concrete, lean=lean):
        raise ValueError("scene exceeds the fused grad kernel limits")

    s_cols, p_cols = _flatten_primitives(concrete, personality)
    if tune is None:
        tune, rows = _default_tune(s_cols, p_cols, rows, rng_impl, mode, lean)
    common = dict(
        width=w, height=h, spp=spp, max_bounces=max_bounces, rows=rows,
        rng_mode=rng_mode, lean=lean, rng_impl=rng_impl, interpret=interpret,
        S_table=scene.spheres.center.shape[0],
        M_table=scene.materials.albedo.shape[0],
    )
    key_args = (
        (s_cols.tobytes(), p_cols.tobytes()), (s_cols.shape, p_cols.shape),
        bytes(np.asarray(concrete.spheres.material, np.int32)[:concrete.spheres.count]),
        bytes(np.asarray(concrete.planes.material, np.int32)[:concrete.planes.count]),
    )
    if mode == "mono":
        run = _compiled_pipeline_mono(*key_args, residuals=residuals,
                                      dbg=dbg, tune=tune, **common)
        target_dev = _target_blocks(target, w, h, rows)
    elif mode == "chunked":
        run = _compiled_pipeline_chunked(*key_args, chunk=chunk,
                                         fwd_rows=fwd_rows, tune=tune,
                                         **common)
        target_dev = jnp.asarray(target, jnp.float32)
    else:
        run = _compiled_pipeline(*key_args, fwd_rows=fwd_rows, dbg=dbg,
                                 **common)
        target_dev = jnp.asarray(target, jnp.float32)
    cam = jnp.concatenate([
        jnp.asarray(concrete.camera.position, jnp.float32),
        jnp.asarray(concrete.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(concrete.camera.vfov * 0.5), w / h, concrete.camera.near, 0.0
        ], jnp.float32),
    ])

    def step(seed: int):
        loss, grads = run(cam, jnp.int32(seed), target_dev)
        return loss, _pad_missing_grads(grads, params)

    return step


@functools.lru_cache(maxsize=16)
def _compiled_pipeline(scene_bytes, shapes, s_mat_bytes, p_mat_bytes, *,
                       width, height, spp, max_bounces, rows, rng_mode,
                       S_table, M_table, lean=False, fwd_rows=None,
                       rng_impl="hw", interpret=False, dbg=()):
    """One jitted dispatch: forward frame + loss + per-sample grad kernels +
    gradient assembly."""
    from .pallas_render import _compiled

    n = width * height
    n_tiles = -(-n // (rows * 128))
    pad = n_tiles * rows * 128 - n
    s_mat = np.frombuffer(s_mat_bytes, np.int32)
    p_mat = np.frombuffer(p_mat_bytes, np.int32)
    ns = s_mat.shape[0]
    npl = p_mat.shape[0]

    fwd_calls = [
        _compiled(scene_bytes, shapes, spp_unroll=1, rng_mode=rng_mode,
                  center_sample=(s == 0), width=width, height=height,
                  max_bounces=max_bounces, rows=fwd_rows or rows,
                  rng_impl=rng_impl, interpret=interpret)
        for s in range(min(spp, 2))
    ]
    grad_calls = [
        _compiled_grad(scene_bytes, shapes, width=width, height=height,
                       max_bounces=max_bounces, rows=rows, rng_mode=rng_mode,
                       center_sample=(s == 0), lean=lean,
                       rng_impl=rng_impl, interpret=interpret,
                       skip_reverse=("skip_reverse" in dbg),
                       skip_prim=("skip_prim" in dbg))
        for s in range(min(spp, 2))
    ] if "no_grad" not in dbg else []

    @jax.jit
    def run(cam, seed0, target):
        seeds = seed0 * jnp.int32(100003) + jnp.arange(spp, dtype=jnp.int32)
        total = None
        for s in range(spp):
            call = fwd_calls[0] if s == 0 else fwd_calls[1 % len(fwd_calls)]
            out = call(cam, seeds[s:s + 1])
            total = out if total is None else total + out
        img_blocks = total * jnp.float32(1.0 / spp)
        img = img_blocks.transpose(0, 2, 3, 1).reshape(-1, 3)[:n]
        target_flat = target.reshape(n, 3)
        diff_img = img - target_flat
        loss = jnp.mean(diff_img ** 2)
        cot = 2.0 * diff_img / (3.0 * n * spp)
        cot_blocks = jnp.pad(cot, ((0, pad), (0, 0))).reshape(
            n_tiles, rows, 128, 3).transpose(0, 3, 1, 2)

        if grad_calls:
            sg_total = pg_total = cg_total = None
            for s in range(spp):
                gcall = grad_calls[0] if s == 0 else grad_calls[1 % len(grad_calls)]
                sg, pg, cg = gcall(cam, seeds[s:s + 1], cot_blocks)
                sg = sg.sum(axis=0)
                pg = pg.sum(axis=0)
                cg = cg.sum(axis=(0, 1))
                sg_total = sg if sg_total is None else sg_total + sg
                pg_total = pg if pg_total is None else pg_total + pg
                cg_total = cg if cg_total is None else cg_total + cg
        else:  # dbg "no_grad": forward + loss only, zero gradients
            sg_total = jnp.zeros((9, max(ns, 1)), jnp.float32) * loss
            pg_total = jnp.zeros((9, max(npl, 1)), jnp.float32)
            cg_total = jnp.zeros((16,), jnp.float32)

        grads = _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat,
                                S_table, M_table)
        return loss, grads

    return run


@functools.lru_cache(maxsize=16)
def _compiled_pipeline_chunked(scene_bytes, shapes, s_mat_bytes, p_mat_bytes,
                               *, width, height, spp, chunk, max_bounces,
                               rows, rng_mode, S_table, M_table, lean=True,
                               fwd_rows=None, rng_impl="hash",
                               interpret=False, tune=()):
    """Per-sample-pipeline shape with mono-kernel spp-chunking: one full-spp
    forward frame + jnp cotangent, then ``spp/chunk`` cot-input mono
    dispatches, each running ``chunk`` forward sweeps + reverse sweeps in
    one kernel — amortizing the per-kernel fixed costs the
    1-sample-per-dispatch pipeline pays spp times.  Requires the hash RNG:
    the render and mono kernels derive draws from (pixel index, per-sample
    seed, static counter), so a sample's stream is identical across
    kernels and tile heights."""
    from .pallas_render import _compiled

    n = width * height
    s_mat = np.frombuffer(s_mat_bytes, np.int32)
    p_mat = np.frombuffer(p_mat_bytes, np.int32)
    n_tiles_c = -(-n // (rows * 128))
    pad_c = n_tiles_c * rows * 128 - n
    n_chunks = spp // chunk
    assert n_chunks * chunk == spp

    fwd_calls = [
        _compiled(scene_bytes, shapes, spp_unroll=1, rng_mode=rng_mode,
                  center_sample=(s == 0), width=width, height=height,
                  max_bounces=max_bounces, rows=fwd_rows or rows,
                  rng_impl=rng_impl, interpret=interpret)
        for s in range(min(spp, 2))
    ]
    chunk_calls = [
        _compiled_mono(scene_bytes, shapes, width=width, height=height,
                       spp=chunk, max_bounces=max_bounces, rows=rows,
                       rng_mode=rng_mode, rng_impl=rng_impl, lean=lean,
                       interpret=interpret, tune=tune, cot_input=True,
                       center0=(k == 0))
        for k in range(min(n_chunks, 2))
    ]

    @jax.jit
    def run(cam, seed0, target):
        seeds = seed0 * jnp.int32(100003) + jnp.arange(spp, dtype=jnp.int32)
        total = None
        for s in range(spp):
            call = fwd_calls[0] if s == 0 else fwd_calls[1 % len(fwd_calls)]
            out = call(cam, seeds[s:s + 1])
            total = out if total is None else total + out
        img_blocks = total * jnp.float32(1.0 / spp)
        img = img_blocks.transpose(0, 2, 3, 1).reshape(-1, 3)[:n]
        target_flat = target.reshape(n, 3)
        diff_img = img - target_flat
        loss = jnp.mean(diff_img ** 2)
        cot = 2.0 * diff_img / (3.0 * n * spp)
        cot_blocks = jnp.pad(cot, ((0, pad_c), (0, 0))).reshape(
            n_tiles_c, rows, 128, 3).transpose(0, 3, 1, 2)

        sg_total = pg_total = cg_total = None
        for k in range(n_chunks):
            ccall = (chunk_calls[0] if k == 0
                     else chunk_calls[1 % len(chunk_calls)])
            _, sg, pg, cg = ccall(cam, seeds[k * chunk:(k + 1) * chunk],
                                  cot_blocks)
            sg = sg.sum(axis=0)
            pg = pg.sum(axis=0)
            cg = cg.sum(axis=(0, 1))
            sg_total = sg if sg_total is None else sg_total + sg
            pg_total = pg if pg_total is None else pg_total + pg
            cg_total = cg if cg_total is None else cg_total + cg

        grads = _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat,
                                S_table, M_table)
        return loss, grads

    return run


def _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat,
                    S_table, M_table):
    """Per-primitive gradient rows -> the extract_params-keyed pytree."""
    ns = s_mat.shape[0]
    npl = p_mat.shape[0]
    g_center = jnp.zeros((S_table, 3), jnp.float32)
    g_radius = jnp.zeros((S_table,), jnp.float32)
    if ns:
        g_center = g_center.at[:ns].set(sg_total[0:3, :ns].T)
        g_radius = g_radius.at[:ns].set(sg_total[3, :ns])

    g_alb = jnp.zeros((M_table, 4), jnp.float32)
    g_refl = jnp.zeros((M_table,), jnp.float32)
    g_rough = jnp.zeros((M_table,), jnp.float32)
    if ns:
        g_alb = g_alb.at[s_mat, 0].add(sg_total[4, :ns])
        g_alb = g_alb.at[s_mat, 1].add(sg_total[5, :ns])
        g_alb = g_alb.at[s_mat, 2].add(sg_total[6, :ns])
        g_refl = g_refl.at[s_mat].add(sg_total[7, :ns])
        g_rough = g_rough.at[s_mat].add(sg_total[8, :ns])
    if npl:
        g_alb = g_alb.at[p_mat, 0].add(pg_total[4, :npl])
        g_alb = g_alb.at[p_mat, 1].add(pg_total[5, :npl])
        g_alb = g_alb.at[p_mat, 2].add(pg_total[6, :npl])
        g_refl = g_refl.at[p_mat].add(pg_total[7, :npl])
        g_rough = g_rough.at[p_mat].add(pg_total[8, :npl])

    return {
        "spheres.center": g_center,
        "spheres.radius": g_radius,
        "materials.albedo": g_alb,
        "materials.roughness": g_rough,
        "materials.reflectivity": g_refl,
        "camera.position": cg_total[0:3],
        "camera.rotation": cg_total[3:12].reshape(3, 3),
    }


@functools.lru_cache(maxsize=16)
def _compiled_pipeline_mono(scene_bytes, shapes, s_mat_bytes, p_mat_bytes, *,
                            width, height, spp, max_bounces, rows, rng_mode,
                            S_table, M_table, lean=False, rng_impl="hw",
                            interpret=False, residuals="recompute", dbg=(), tune=()):
    """One jitted dispatch around the mono kernel: seeds + tile sums +
    gradient assembly (the kernel itself does everything else)."""
    n = width * height
    s_mat = np.frombuffer(s_mat_bytes, np.int32)
    p_mat = np.frombuffer(p_mat_bytes, np.int32)

    call = _compiled_mono(scene_bytes, shapes, width=width, height=height,
                          spp=spp, max_bounces=max_bounces, rows=rows,
                          rng_mode=rng_mode, rng_impl=rng_impl, lean=lean,
                          interpret=interpret, residuals=residuals, dbg=dbg,
                          tune=tune)

    @jax.jit
    def run(cam, seed0, target_blocks):
        seeds = seed0 * jnp.int32(100003) + jnp.arange(spp, dtype=jnp.int32)
        lp, sg, pg, cg = call(cam, seeds, target_blocks)
        loss = lp.sum() * jnp.float32(1.0 / (3.0 * n))
        grads = _assemble_grads(sg.sum(axis=0), pg.sum(axis=0),
                                cg.sum(axis=(0, 1)), s_mat, p_mat,
                                S_table, M_table)
        return loss, grads

    return run


def _target_blocks(target, width, height, rows):
    """(H, W, 3) target -> the kernel's (n_tiles, 3, rows, 128) block
    layout, computed host-side ONCE per step builder."""
    n = width * height
    n_tiles = -(-n // (rows * 128))
    flat = np.zeros((n_tiles * rows * 128, 3), np.float32)
    flat[:n] = np.asarray(target, np.float32).reshape(n, 3)
    return jnp.asarray(
        flat.reshape(n_tiles, rows, 128, 3).transpose(0, 3, 1, 2))
