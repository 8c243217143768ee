"""Blockwise fused forward+backward: big-scene gradients with runtime tables.

The fused grad kernel (rt_tpu.ops.pallas_grad) bakes primitives as
compile-time constants and unrolls per-primitive masked reductions, capping
it at MAX_GRAD_PRIMS = 96.  Beyond that the jnp paths take over and fall off
a cliff (measured on v5e-1, 500-sphere scene, 400x300 @ 4spp d8: replay-mode
485 ms/step ~ 1 Mrays/s; plain autodiff fails to compile at that size).
This kernel is the blockwise answer — the differentiable twin of
rt_tpu.ops.pallas_blockwise:

* primitive tables are **runtime VMEM inputs** (streamed through the
  closest-hit scan in blocks, running argmin + global winner index), and
  per-primitive gradients come back as **runtime VMEM output tables**
  accumulated across ray tiles on-chip;
* because tables are inputs, the compiled kernel is reused across parameter
  updates — a full optimization step (tables -> loss -> table grads ->
  parameter grads -> optax update) jits end to end with NO recompiles,
  which the baked-constant kernel fundamentally cannot do;
* the gradient convention is identical to pallas_grad/replay (detached
  sampling): each bounce's smooth map is differentiated with jax.vjp inside
  the kernel trace — the SAME ``_bounce_smooth`` function — with discrete
  decisions (winner identity, roots, coins, masks) pinned from the forward
  sweep.

Mechanics per ray tile (128 rays on lanes, one grid step):

1. forward sweep over bounces: blockwise scans (as in pallas_blockwise)
   additionally extract the winner's radius/plane-d, class, **global row
   index** and near-root bit; everything the reverse needs is stashed in
   registers;
2. reverse sweep: per bounce, vjp of ``_bounce_smooth`` turns (o, d, thr)
   cotangents + the pixel cotangent into payload cotangents (stashed);
3. table-gradient pass: one blockwise sweep over each table; for each block
   row the bounce stashes are reduced across lanes where the global winner
   index matches — the dynamic-table transpose of pallas_grad's unrolled
   masked reductions — and accumulated into the output grad table across
   grid steps (first tile initialises, later tiles add).

RNG mirrors pallas_blockwise exactly (same draw order, same per-tile
hardware-PRNG seeding, same portable counter-hash option) so the gradient
pairs with the blockwise forward image bit-for-bit; ``rng_impl="hash"`` +
``interpret=True`` runs the whole fwd+bwd on CPU for the test suite.

Reference semantics citations: closest-hit select mg_ray_tracer.cpp:95-102,
scatter mg_ray_tracer.cpp:109-152 / sm_ray_tracer.cpp:156-236 — via the
shared smooth map in rt_tpu.ops.pallas_grad.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_blockwise import (
    MAX_BLOCKWISE_PRIMS,
    _BLOCK,
    _bucket,
    _compiled_bw,
    _hash_u01,
    _hw_u01,
    _padded_table,
)
from .pallas_grad import _bounce_smooth
from .pallas_render import _flatten_primitives

__all__ = [
    "bw_grad_supported",
    "bw_mse_loss_and_grad",
    "make_bw_mse_step",
    "make_bw_train_step",
]

_BIG = 3.0e38
_MIN_HIT = 0.001
_LANES = 128
_COLS = 16


def bw_grad_supported(scene) -> bool:
    return (
        scene.spheres.count + scene.planes.count <= MAX_BLOCKWISE_PRIMS
        and scene.boxes.count == 0
    )


def _make_bw_grad_kernel(*, width, height, s_pad, p_pad, max_bounces,
                         rng_mode, rng_impl, center_sample, block):
    """Refs: meta (SMEM int32 [seed, n_sph, n_pln, tile_off]), cam (SMEM 15
    f32), sphere/plane tables (pad, 16) VMEM, cot (1, 3, 1, 128) VMEM block,
    outputs: sphere grad table (s_pad, 16) VMEM (accumulated across tiles),
    plane grad table (p_pad, 16) VMEM, camera cotangent (1, 1, 16) SMEM
    per-tile."""
    f32 = jnp.float32
    shape = (1, _LANES)

    def kernel(meta_ref, cam_ref, sph_ref, pln_ref, cot_ref,
               sg_ref, pg_ref, cg_ref):
        prog = pl.program_id(0)
        tile = prog + meta_ref[3]
        seed = meta_ref[0]
        n_sph = meta_ref[1]
        n_pln = meta_ref[2]
        if rng_impl == "hw":
            pltpu.prng_seed(seed + tile * jnp.int32(1000003))

        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        idx = tile * _LANES + lane
        px = (idx % width).astype(f32)
        py = (idx // width).astype(f32)
        in_image = idx < width * height

        draw_ctr = [0]

        def u01():
            if rng_impl == "hw":
                return _hw_u01(shape)
            draw_ctr[0] += 1
            return _hash_u01(idx, seed, draw_ctr[0], shape)

        cam = [cam_ref[i] for i in range(15)]
        zero = jnp.zeros(shape, f32)
        one = jnp.ones(shape, f32)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (block, _LANES), 0)
        rowf = rowi.astype(f32)

        cot = [jnp.where(in_image, cot_ref[0, c], 0.0) for c in range(3)]

        # ---------------- raygen (vjp-able; matches pallas_blockwise) ------
        u = u01()
        v = u01()
        if center_sample:
            jx = jnp.full(shape, f32(0.5))
            jy = jnp.full(shape, f32(0.5))
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

        # ---------------- forward sweep with stashes -----------------------
        stash = []
        _BITS = ("hit", "live_h", "miss", "alive", "ispl", "root", "ldeg",
                 "mabs", "refl_bit", "tir", "inside", "is_met", "is_die")

        n_pblk = (n_pln + block - 1) // block
        n_sblk = (n_sph + block - 1) // block

        def fwd_bounce(state):
            """One bounce: scan + draws + decision bits + smooth advance.
            Returns (new 10-state) + pay(13) + u(3) + (bidx, bpl) + bits(13
            as f32) — a flat 41-tuple so it can sit in a lax.cond."""
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, live) = state
            lv = live > 0.0

            # carry: best_t, cx, cy, cz, rad, pnx, pny, pnz, pdd,
            #        ar, ag, ab, rf, rg, cls, ispl, gidx, root
            init = (jnp.full(shape, f32(_BIG)),
                    zero, zero, zero, one,
                    zero, zero, zero, zero,
                    zero, zero, zero, one, zero,
                    zero, zero, jnp.full(shape, f32(-1.0)), one)

            def scan_planes(ib, carry):
                blk = pln_ref[pl.ds(ib * block, block), :]
                pnx = blk[:, 0:1]
                pny = blk[:, 1:2]
                pnz = blk[:, 2:3]
                pdd = blk[:, 3:4]
                nd = pnx * dx + pny * dy + pnz * dz
                no = pnx * ox + pny * oy + pnz * oz + pdd
                safe = jnp.where(jnp.abs(nd) > 1e-12, nd, f32(1.0))
                t = -no / safe
                valid = (ib * block + rowi) < n_pln
                ok = valid & (jnp.abs(nd) > 1e-12) & (t >= _MIN_HIT)
                t = jnp.where(ok, t, f32(_BIG))
                tmin = jnp.min(t, axis=0, keepdims=True)
                winrow = jnp.min(jnp.where(t == tmin, rowf, f32(1e9)),
                                 axis=0, keepdims=True)
                msk = ((t == tmin) & (rowf == winrow)).astype(f32)
                better = tmin < carry[0]

                def pick(c):
                    return jnp.sum(msk * blk[:, c:c + 1], axis=0,
                                   keepdims=True)

                gidx = (ib * block).astype(f32) + winrow
                sel = lambda new, old: jnp.where(better, new, old)
                return (sel(tmin, carry[0]),
                        carry[1], carry[2], carry[3], carry[4],
                        sel(pick(0), carry[5]), sel(pick(1), carry[6]),
                        sel(pick(2), carry[7]), sel(pick(3), carry[8]),
                        sel(pick(4), carry[9]), sel(pick(5), carry[10]),
                        sel(pick(6), carry[11]), sel(pick(7), carry[12]),
                        sel(pick(8), carry[13]), sel(pick(9), carry[14]),
                        sel(one, carry[15]), sel(gidx, carry[16]),
                        carry[17])

            def scan_spheres(ib, carry):
                blk = sph_ref[pl.ds(ib * block, block), :]
                cx = blk[:, 0:1]
                cy = blk[:, 1:2]
                cz = blk[:, 2:3]
                rad = blk[:, 3:4]
                ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                bq = ocx * dx + ocy * dy + ocz * dz
                c0 = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                disc = bq * bq - c0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = -bq - sq
                t1 = -bq + sq
                lo = t0 >= _MIN_HIT
                t = jnp.where(lo, t0, t1)
                valid = (ib * block + rowi) < n_sph
                ok = valid & (disc >= 0.0) & (t >= _MIN_HIT)
                t = jnp.where(ok, t, f32(_BIG))
                tmin = jnp.min(t, axis=0, keepdims=True)
                winrow = jnp.min(jnp.where(t == tmin, rowf, f32(1e9)),
                                 axis=0, keepdims=True)
                mskb = (t == tmin) & (rowf == winrow)
                msk = mskb.astype(f32)
                # spheres win a plane tie, strict '<' among themselves
                better = (tmin < carry[0]) | (
                    (tmin == carry[0]) & (carry[15] > 0.0) & (tmin < f32(_BIG))
                )

                def pick(c):
                    return jnp.sum(msk * blk[:, c:c + 1], axis=0,
                                   keepdims=True)

                gidx = (ib * block).astype(f32) + winrow
                root = jnp.sum(msk * lo.astype(f32), axis=0, keepdims=True)
                sel = lambda new, old: jnp.where(better, new, old)
                return (sel(tmin, carry[0]),
                        sel(pick(0), carry[1]), sel(pick(1), carry[2]),
                        sel(pick(2), carry[3]), sel(pick(3), carry[4]),
                        carry[5], carry[6], carry[7], carry[8],
                        sel(pick(4), carry[9]), sel(pick(5), carry[10]),
                        sel(pick(6), carry[11]), sel(pick(7), carry[12]),
                        sel(pick(8), carry[13]), sel(pick(9), carry[14]),
                        sel(zero, carry[15]), sel(gidx, carry[16]),
                        sel(root, carry[17]))

            rec = jax.lax.fori_loop(0, n_pblk, scan_planes, init)
            rec = jax.lax.fori_loop(0, n_sblk, scan_spheres, rec)
            (best_t, bcx, bcy, bcz, brad, bpnx, bpny, bpnz, bpdd,
             bar, bag, bab, brf, brg, bcl, bpl, bidx, broot) = rec

            hit = best_t < f32(1e37)
            live_h = lv & hit

            # draws in the same order as the blockwise forward kernel
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

            # decision bits (forward values; pinned for the smooth map)
            t_safe = jnp.where(hit, best_t, 0.0)
            hx = ox + t_safe * dx
            hy = oy + t_safe * dy
            hz = oz + t_safe * dz
            snx, sny, snz = hx - bcx, hy - bcy, hz - bcz
            sinv = jax.lax.rsqrt(
                jnp.maximum(snx * snx + sny * sny + snz * snz, 1e-30))
            ispl = bpl > 0.0
            nx = jnp.where(ispl, bpnx, snx * sinv)
            ny = jnp.where(ispl, bpny, sny * sinv)
            nz = jnp.where(ispl, bpnz, snz * sinv)
            lxr, lyr, lzr = nx + ux, ny + uy, nz + uz
            ldeg = (lxr * lxr + lyr * lyr + lzr * lzr) < 1e-16
            ddot = dx * nx + dy * ny + dz * nz
            mxr = (dx - 2.0 * ddot * nx) + brg * ux
            myr = (dy - 2.0 * ddot * ny) + brg * uy
            mzr = (dz - 2.0 * ddot * nz) + brg * uz
            mabs = (mxr * nx + myr * ny + mzr * nz) <= 0.0
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

            is_met = bcl == 1.0
            is_die = bcl == 2.0
            alive = live_h & ~(is_met & mabs)
            miss = lv & ~hit

            pay = (bcx, bcy, bcz, brad, bpnx, bpny, bpnz, bpdd,
                   bar, bag, bab, brf, brg)
            bits_f = tuple(x.astype(f32) for x in (
                hit, live_h, miss, alive, ispl, broot > 0.0, ldeg, mabs,
                refl_bit, tir, inside, is_met, is_die))
            bitsd = dict(zip(_BITS, (x > 0.0 for x in bits_f)))
            o_n, d_n, thr_n, _ = _bounce_smooth(
                (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), pay,
                (ux, uy, uz), bitsd)
            new_state = (*o_n, *d_n, *thr_n, bits_f[3])
            return new_state + pay + (ux, uy, uz, bidx, bpl) + bits_f

        def skip_bounce(state):
            # dead tile: state unchanged; stash placeholders with live_h
            # False so the reverse/accum passes contribute exactly nothing
            pay = (zero, zero, zero, one, zero, zero, zero, zero,
                   zero, zero, zero, one, zero)
            return (tuple(state) + pay
                    + (zero, zero, one, jnp.full(shape, f32(-1.0)), zero)
                    + (zero,) * 13)

        state = (ox, oy, oz, dx, dy, dz, one, one, one, one)
        anyl = [None] * max_bounces
        for b in range(max_bounces):
            prev = state
            if b == 0:
                out = fwd_bounce(state)
            else:
                # dead-tile early-out: when every ray in the tile has
                # terminated, skip the O(N) scan + scatter + vjp stash.
                anyl[b] = jnp.sum(state[9]) > 0.0
                out = jax.lax.cond(anyl[b], fwd_bounce, skip_bounce, state)
            state = out[:10]
            bits_f = out[28:41]
            stash.append(dict(
                o=prev[0:3], d=prev[3:6], thr=prev[6:9],
                pay=out[10:23], u=out[23:26],
                bits=dict(zip(_BITS, (x > 0.0 for x in bits_f))),
                bidx=out[26], bpl=out[27],
            ))

        # ---------------- reverse sweep ------------------------------------
        co = [zero, zero, zero]
        cd = [zero, zero, zero]
        ct = [zero, zero, zero]
        pay_cots = [None] * max_bounces

        for b in reversed(range(max_bounces)):
            st = stash[b]

            def rev_bounce(carry):
                def fb(o3, d3, thr3, pay):
                    return _bounce_smooth(o3, d3, thr3, pay, st["u"],
                                          st["bits"])

                _, fvjp = jax.vjp(fb, st["o"], st["d"], st["thr"], st["pay"])
                (co_p, cd_p, ct_p, pay_cot) = fvjp(
                    ((carry[0], carry[1], carry[2]),
                     (carry[3], carry[4], carry[5]),
                     (carry[6], carry[7], carry[8]),
                     (cot[0], cot[1], cot[2])))
                return tuple(co_p) + tuple(cd_p) + tuple(ct_p) + tuple(pay_cot)

            carry = (co[0], co[1], co[2], cd[0], cd[1], cd[2],
                     ct[0], ct[1], ct[2])
            if anyl[b] is None:
                out = rev_bounce(carry)
            else:
                # skipped forward bounce is the identity map: cotangents
                # pass through unchanged, payload cotangents are zero
                out = jax.lax.cond(
                    anyl[b], rev_bounce,
                    lambda c: tuple(c) + (zero,) * 13, carry)
            co = list(out[0:3])
            cd = list(out[3:6])
            ct = list(out[6:9])
            pay_cots[b] = out[9:22]

        # ---------------- table-gradient pass -------------------------------
        # pay_cot slots: 0-3 cx,cy,cz,rad | 4-7 pnx,pny,pnz,pdd |
        #                8-12 ar,ag,ab,rf,rg
        first = prog == 0
        sph_slots = (0, 1, 2, 3, 8, 9, 10, 11, 12)
        pln_slots = (4, 5, 6, 7, 8, 9, 10, 11, 12)

        def accum(ib, _, *, ref, slots, want_sphere):
            base = ib * block
            rows_f = base.astype(f32) + rowf
            g = [jnp.zeros((block, 1), f32) for _ in range(9)]
            for b in range(max_bounces):
                st = stash[b]
                is_kind = (st["bpl"] <= 0.0) if want_sphere else (st["bpl"] > 0.0)
                m = ((st["bidx"] == rows_f) & is_kind
                     & st["bits"]["live_h"]).astype(f32)
                pc = pay_cots[b]
                for k, slot in enumerate(slots):
                    g[k] = g[k] + jnp.sum(m * pc[slot], axis=1, keepdims=True)
            for k in range(9):
                prev = jnp.where(first, 0.0,
                                 ref[pl.ds(base, block), k:k + 1])
                ref[pl.ds(base, block), k:k + 1] = prev + g[k]
            return 0

        # rows beyond the last visited block and columns 9-15 are never
        # written (and never read by the assembly, which slices rows :count
        # and columns 0-8)
        jax.lax.fori_loop(
            0, n_sblk,
            functools.partial(accum, ref=sg_ref, slots=sph_slots,
                              want_sphere=True), 0)
        jax.lax.fori_loop(
            0, n_pblk,
            functools.partial(accum, ref=pg_ref, slots=pln_slots,
                              want_sphere=False), 0)

        (cam_cot,) = raygen_vjp((co[0], co[1], co[2], cd[0], cd[1], cd[2]))
        for i in range(15):
            cg_ref[0, 0, i] = cam_cot[i]
        cg_ref[0, 0, 15] = f32(0.0)

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_bw_grad(*, width, height, s_pad, p_pad, max_bounces, rng_mode,
                      rng_impl, center_sample, interpret, block=_BLOCK,
                      n_tiles=None):
    kernel = _make_bw_grad_kernel(
        width=width, height=height, s_pad=s_pad, p_pad=p_pad,
        max_bounces=max_bounces, rng_mode=rng_mode, rng_impl=rng_impl,
        center_sample=center_sample, block=block,
    )
    if n_tiles is None:
        n = width * height
        n_tiles = -(-n // _LANES)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, 1, _LANES), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 16), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 16), jnp.float32),
        ),
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=16)
def _bw_grad_pipeline(s_mat_bytes, p_mat_bytes, *, width, height, s_pad,
                      p_pad, spp, max_bounces, rng_mode, rng_impl, block,
                      interpret, n_sph, n_pln, S_table, M_table):
    """One jitted dispatch: blockwise forward frame + MSE + per-sample grad
    kernels + parameter-gradient assembly.  Tables/camera/seed are traced
    inputs — NO recompile across parameter updates."""
    n = width * height
    n_tiles = -(-n // _LANES)
    pad = n_tiles * _LANES - n
    s_mat = np.frombuffer(s_mat_bytes, np.int32)
    p_mat = np.frombuffer(p_mat_bytes, np.int32)

    fwd_calls = [
        _compiled_bw(width=width, height=height, s_pad=s_pad, p_pad=p_pad,
                     spp_unroll=1, max_bounces=max_bounces, rng_mode=rng_mode,
                     rng_impl=rng_impl, center_sample=(s == 0),
                     interpret=interpret, block=block)
        for s in range(min(spp, 2))
    ]
    grad_calls = [
        _compiled_bw_grad(width=width, height=height, s_pad=s_pad,
                          p_pad=p_pad, max_bounces=max_bounces,
                          rng_mode=rng_mode, rng_impl=rng_impl,
                          center_sample=(s == 0), interpret=interpret,
                          block=block)
        for s in range(min(spp, 2))
    ]

    @jax.jit
    def run(cam, seed0, s_tab, p_tab, target):
        seeds = seed0 * jnp.int32(100003) + jnp.arange(spp, dtype=jnp.int32)

        def meta(s):
            return jnp.stack([seeds[s], jnp.int32(n_sph), jnp.int32(n_pln),
                              jnp.int32(0)])

        total = None
        for s in range(spp):
            call = fwd_calls[0] if s == 0 else fwd_calls[1 % len(fwd_calls)]
            out = call(meta(s), cam, s_tab, p_tab)
            total = out if total is None else total + out
        img = (total[:, :, 0, :] * jnp.float32(1.0 / spp)).transpose(
            0, 2, 1).reshape(-1, 3)[:n]
        target_flat = target.reshape(n, 3)
        diff_img = img - target_flat
        loss = jnp.mean(diff_img ** 2)
        cot = 2.0 * diff_img / (3.0 * n * spp)
        cot_blocks = jnp.pad(cot, ((0, pad), (0, 0))).reshape(
            n_tiles, 1, _LANES, 3).transpose(0, 3, 1, 2)

        sg_total = pg_total = cg_total = None
        for s in range(spp):
            g = grad_calls[0] if s == 0 else grad_calls[1 % len(grad_calls)]
            sg, pg, cg = g(meta(s), cam, s_tab, p_tab, cot_blocks)
            cg = cg.sum(axis=(0, 1))
            sg_total = sg if sg_total is None else sg_total + sg
            pg_total = pg if pg_total is None else pg_total + pg
            cg_total = cg if cg_total is None else cg_total + cg

        grads = _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat,
                                n_sph, n_pln, S_table, M_table)
        return loss, grads

    return run


@functools.lru_cache(maxsize=16)
def _bw_grad_pipeline_sharded(s_mat_bytes, p_mat_bytes, mesh_key, *, width,
                              height, s_pad, p_pad, spp, max_bounces,
                              rng_mode, rng_impl, block, interpret, n_sph,
                              n_pln, S_table, M_table, axis):
    """Ray-sharded twin of _bw_grad_pipeline (BASELINE configs 4/5).

    Each device renders + differentiates its contiguous tile range (the
    MSE cotangent is pixel-separable, so the local cot needs only local
    pixels); the per-primitive gradient tables and the scalar loss are
    ``psum``-ed across the mesh — XLA schedules the all-reduce against the
    remaining per-shard work (the 'overlapped grad all-reduce' of
    BASELINE.json config 5).  Bit-identical to the unsharded pipeline for
    the same seed: per-shard tile offsets keep pixel ids and RNG streams
    globally unique."""
    from ..dist import _SMAP_NOCHECK, shard_map
    from jax.sharding import PartitionSpec as P

    mesh = _MESHES[mesh_key]
    n_dev = mesh.shape[axis]
    n = width * height
    n_tiles = -(-n // _LANES)
    n_tiles_pad = -(-n_tiles // n_dev) * n_dev
    local_tiles = n_tiles_pad // n_dev
    s_mat = np.frombuffer(s_mat_bytes, np.int32)
    p_mat = np.frombuffer(p_mat_bytes, np.int32)

    fwd_calls = [
        _compiled_bw(width=width, height=height, s_pad=s_pad, p_pad=p_pad,
                     spp_unroll=1, max_bounces=max_bounces, rng_mode=rng_mode,
                     rng_impl=rng_impl, center_sample=(s == 0),
                     interpret=interpret, block=block, n_tiles=local_tiles)
        for s in range(min(spp, 2))
    ]
    grad_calls = [
        _compiled_bw_grad(width=width, height=height, s_pad=s_pad,
                          p_pad=p_pad, max_bounces=max_bounces,
                          rng_mode=rng_mode, rng_impl=rng_impl,
                          center_sample=(s == 0), interpret=interpret,
                          block=block, n_tiles=local_tiles)
        for s in range(min(spp, 2))
    ]

    def shard_fn(cam, seeds, s_tab, p_tab, target_blocks):
        off = jax.lax.axis_index(axis).astype(jnp.int32) * local_tiles

        def meta(s):
            return jnp.stack([seeds[s], jnp.int32(n_sph), jnp.int32(n_pln),
                              off])

        total = None
        for s in range(spp):
            call = fwd_calls[0] if s == 0 else fwd_calls[1 % len(fwd_calls)]
            out = call(meta(s), cam, s_tab, p_tab)
            total = out if total is None else total + out
        img_blocks = total * jnp.float32(1.0 / spp)

        gidx = ((off + jnp.arange(local_tiles))[:, None] * _LANES
                + jnp.arange(_LANES)[None, :])
        valid = (gidx < n).astype(jnp.float32)[:, None, None, :]
        diff = (img_blocks - target_blocks) * valid
        loss = jax.lax.psum(jnp.sum(diff ** 2), axis) / (3.0 * n)
        cot = 2.0 * diff / (3.0 * n * spp)

        sg_total = pg_total = cg_total = None
        for s in range(spp):
            g = grad_calls[0] if s == 0 else grad_calls[1 % len(grad_calls)]
            sg, pg, cg = g(meta(s), cam, s_tab, p_tab, cot)
            cg = cg.sum(axis=(0, 1))
            sg_total = sg if sg_total is None else sg_total + sg
            pg_total = pg if pg_total is None else pg_total + pg
            cg_total = cg if cg_total is None else cg_total + cg
        sg_total = jax.lax.psum(sg_total, axis)
        pg_total = jax.lax.psum(pg_total, axis)
        cg_total = jax.lax.psum(cg_total, axis)
        return loss, sg_total, pg_total, cg_total

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis)),
        out_specs=(P(), P(), P(), P()),
        **_SMAP_NOCHECK,
    )

    @jax.jit
    def run(cam, seed0, s_tab, p_tab, target):
        seeds = seed0 * jnp.int32(100003) + jnp.arange(spp, dtype=jnp.int32)
        tgt = target.reshape(n, 3)
        tgt = jnp.pad(tgt, ((0, n_tiles_pad * _LANES - n), (0, 0)))
        target_blocks = tgt.reshape(n_tiles_pad, 1, _LANES, 3).transpose(
            0, 3, 1, 2)
        loss, sg_total, pg_total, cg_total = sharded(
            cam, seeds, s_tab, p_tab, target_blocks)
        grads = _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat,
                                n_sph, n_pln, S_table, M_table)
        return loss, grads

    return run


# shard meshes are unhashable; key them by id for the lru-cached pipelines
_MESHES: dict = {}


def _mesh_key(mesh) -> int:
    key = id(mesh)
    _MESHES[key] = mesh
    return key


def _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat, ns, npl,
                    S_table, M_table):
    """Grad tables (cols: 0-2 centre/normal, 3 radius/d, 4-6 albedo rgb,
    7 reflectivity, 8 roughness) -> parameter pytree."""
    g_center = jnp.zeros((S_table, 3), jnp.float32)
    g_radius = jnp.zeros((S_table,), jnp.float32)
    if ns:
        g_center = g_center.at[:ns].set(sg_total[:ns, 0:3])
        g_radius = g_radius.at[:ns].set(sg_total[:ns, 3])
    g_alb = jnp.zeros((M_table, 4), jnp.float32)
    g_refl = jnp.zeros((M_table,), jnp.float32)
    g_rough = jnp.zeros((M_table,), jnp.float32)
    if ns:
        g_alb = g_alb.at[s_mat, 0].add(sg_total[:ns, 4])
        g_alb = g_alb.at[s_mat, 1].add(sg_total[:ns, 5])
        g_alb = g_alb.at[s_mat, 2].add(sg_total[:ns, 6])
        g_refl = g_refl.at[s_mat].add(sg_total[:ns, 7])
        g_rough = g_rough.at[s_mat].add(sg_total[:ns, 8])
    if npl:
        g_alb = g_alb.at[p_mat, 0].add(pg_total[:npl, 4])
        g_alb = g_alb.at[p_mat, 1].add(pg_total[:npl, 5])
        g_alb = g_alb.at[p_mat, 2].add(pg_total[:npl, 6])
        g_refl = g_refl.at[p_mat].add(pg_total[:npl, 7])
        g_rough = g_rough.at[p_mat].add(pg_total[:npl, 8])
    return {
        "spheres.center": g_center,
        "spheres.radius": g_radius,
        "materials.albedo": g_alb,
        "materials.roughness": g_rough,
        "materials.reflectivity": g_refl,
        "camera.position": cg_total[0:3],
        "camera.rotation": cg_total[3:12].reshape(3, 3),
    }


def _tables_jnp(scene, params, personality, s_pad, p_pad, size):
    """Traced params -> padded (pad, 16) tables + packed camera vector.

    The jnp twin of pallas_render._flatten_primitives + _padded_table:
    material indices and types are static (they never train), parameter
    values flow through traced gathers — so a full optimization step jits
    end to end with the tables rebuilt on-device each step."""
    from ..diff import apply_params
    from ..materials import personality_classes

    w, h = size
    sc = apply_params(scene, params)
    with jax.ensure_compile_time_eval():  # static lookups inside the jit
        classes = np.asarray(personality_classes(personality))
        mat_t = np.asarray(scene.materials.type)

    def build(geom, mats, count, pad):
        out = jnp.zeros((pad, _COLS), jnp.float32)
        if not count:
            return out
        m = np.asarray(mats)[:count]
        cols = jnp.concatenate([
            geom,
            sc.materials.albedo[m][:, :3],
            sc.materials.reflectivity[m][:, None],
            sc.materials.roughness[m][:, None],
            jnp.broadcast_to(
                jnp.asarray(classes[mat_t[m]], jnp.float32)[:, None],
                (count, 1)),
        ], axis=1)
        return out.at[:count, :10].set(cols)

    ns, npl = scene.spheres.count, scene.planes.count
    s_tab = build(
        jnp.concatenate([sc.spheres.center[:ns],
                         sc.spheres.radius[:ns, None]], axis=1)
        if ns else None,
        scene.spheres.material, ns, s_pad)
    p_tab = build(
        jnp.concatenate([sc.planes.normal[:npl],
                         sc.planes.d[:npl, None]], axis=1)
        if npl else None,
        scene.planes.material, npl, p_pad)
    cam = jnp.concatenate([
        jnp.asarray(sc.camera.position, jnp.float32),
        jnp.asarray(sc.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([np.tan(scene.camera.vfov * 0.5), w / h,
                     scene.camera.near, 0.0], jnp.float32),
    ])
    return s_tab, p_tab, cam


def make_bw_train_step(
    optimizer,
    scene,
    target,
    size: tuple[int, int],
    *,
    spp: int = 4,
    max_bounces: Optional[int] = None,
    personality: str = "mg",
    rng_mode: str = "reference",
    rng_impl: str = "hw",
    block: Optional[int] = None,
    interpret: bool = False,
    mesh=None,
    axis: str = "rays",
):
    """Fully-jitted big-scene optimization step:
    ``step(params, opt_state, seed) -> (params, opt_state, loss)``.

    ``target`` must be a PRE-gamma radiance image (render targets with
    ``gamma=False``): the MSE compares the kernels' pre-gamma mean — the
    convention shared by every gradient pipeline (rt_tpu.diff docstring).

    Tables are rebuilt from the traced parameters on-device every step and
    fed to the blockwise fwd+bwd kernels, so an entire optax loop runs at
    kernel speed with zero recompiles — the thing the baked-constant
    pipeline (rt_tpu.diff.pallas_loss_and_grad / ops.pallas_grad)
    fundamentally cannot do.  Complements rt_tpu.train.make_train_step
    (jnp paths) for scenes beyond the unrolled kernels' caps.

    With ``mesh``, ray tiles are sharded over ``mesh[axis]`` and the
    per-primitive gradient tables are psum-ed across it (BASELINE configs
    4/5); bit-identical to the single-device step for the same seed."""
    import optax

    w, h = size
    if max_bounces is None:
        max_bounces = scene.max_bounces
    if not bw_grad_supported(scene):
        raise ValueError("scene exceeds the blockwise grad kernel limits")
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    if block is None:
        block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    common = dict(
        width=w, height=h, s_pad=s_pad, p_pad=p_pad, spp=spp,
        max_bounces=max_bounces, rng_mode=rng_mode, rng_impl=rng_impl,
        block=block, interpret=interpret,
        n_sph=scene.spheres.count, n_pln=scene.planes.count,
        S_table=scene.spheres.center.shape[0],
        M_table=scene.materials.albedo.shape[0],
    )
    s_mat_b = bytes(np.asarray(scene.spheres.material,
                               np.int32)[:scene.spheres.count])
    p_mat_b = bytes(np.asarray(scene.planes.material,
                               np.int32)[:scene.planes.count])
    if mesh is None:
        run = _bw_grad_pipeline(s_mat_b, p_mat_b, **common)
    else:
        run = _bw_grad_pipeline_sharded(s_mat_b, p_mat_b, _mesh_key(mesh),
                                        axis=axis, **common)
    target_dev = jnp.asarray(target, jnp.float32)

    @jax.jit
    def step(params, opt_state, seed):
        s_tab, p_tab, cam = _tables_jnp(scene, params, personality,
                                        s_pad, p_pad, size)
        loss, grads = run(cam, jnp.int32(seed), s_tab, p_tab, target_dev)
        grads = {k: grads[k] for k in params}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def _prep(params, scene, size, personality, block):
    """Shared host prep: concrete scene -> padded tables + packed camera."""
    from ..diff import apply_params

    w, h = size
    concrete = apply_params(scene, jax.tree_util.tree_map(jnp.asarray, params))
    if not bw_grad_supported(concrete):
        raise ValueError("scene exceeds the blockwise grad kernel limits")
    s_cols, p_cols = _flatten_primitives(concrete, personality)
    s_pad = _bucket(concrete.spheres.count)
    p_pad = _bucket(concrete.planes.count)
    s_tab = jnp.asarray(_padded_table(s_cols, s_pad))
    p_tab = jnp.asarray(_padded_table(p_cols, p_pad))
    if block is None:
        block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    cam = jnp.concatenate([
        jnp.asarray(concrete.camera.position, jnp.float32),
        jnp.asarray(concrete.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(concrete.camera.vfov * 0.5), w / h,
            concrete.camera.near, 0.0
        ], jnp.float32),
    ])
    return concrete, s_tab, p_tab, s_pad, p_pad, cam, block


def bw_mse_loss_and_grad(
    params,
    scene,
    target,
    size: tuple[int, int],
    seed: int = 0,
    *,
    spp: int = 4,
    max_bounces: Optional[int] = None,
    personality: str = "mg",
    rng_mode: str = "reference",
    rng_impl: str = "hw",
    block: Optional[int] = None,
    interpret: bool = False,
):
    """MSE loss + scene-parameter gradients for big scenes, all on-chip.

    Same gradient convention as rt_tpu.ops.pallas_grad (detached sampling),
    but primitive tables are runtime inputs: parameter updates re-use the
    compiled kernels."""
    step = make_bw_mse_step(
        params, scene, target, size, spp=spp, max_bounces=max_bounces,
        personality=personality, rng_mode=rng_mode, rng_impl=rng_impl,
        block=block, interpret=interpret,
    )
    return step(seed)


def make_bw_mse_step(
    params,
    scene,
    target,
    size: tuple[int, int],
    *,
    spp: int = 4,
    max_bounces: Optional[int] = None,
    personality: str = "mg",
    rng_mode: str = "reference",
    rng_impl: str = "hw",
    block: Optional[int] = None,
    interpret: bool = False,
):
    """Prebuilt big-scene fwd+bwd step: ``step(seed) -> (loss, grads)``.

    Host prep (table build, camera packing, target upload) happens once;
    each call ships one int32 seed.  To re-evaluate at UPDATED parameters,
    rebuild the step — the compiled kernels are cached and re-used (tables
    are traced inputs), so the rebuild costs only the host prep."""
    w, h = size
    if max_bounces is None:
        max_bounces = scene.max_bounces
    concrete, s_tab, p_tab, s_pad, p_pad, cam, block = _prep(
        params, scene, size, personality, block)
    run = _bw_grad_pipeline(
        bytes(np.asarray(concrete.spheres.material,
                         np.int32)[:concrete.spheres.count]),
        bytes(np.asarray(concrete.planes.material,
                         np.int32)[:concrete.planes.count]),
        width=w, height=h, s_pad=s_pad, p_pad=p_pad, spp=spp,
        max_bounces=max_bounces, rng_mode=rng_mode, rng_impl=rng_impl,
        block=block, interpret=interpret,
        n_sph=concrete.spheres.count, n_pln=concrete.planes.count,
        S_table=scene.spheres.center.shape[0],
        M_table=scene.materials.albedo.shape[0],
    )
    target_dev = jnp.asarray(target, jnp.float32)

    def step(seed: int):
        return run(cam, jnp.int32(seed), s_tab, p_tab, target_dev)

    return step
