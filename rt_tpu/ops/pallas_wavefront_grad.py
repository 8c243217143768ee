"""Wavefront fused forward+backward: big-scene training on the bounce-major
pipeline.

Round 4 restructured the many-primitive FORWARD bounce-major
(rt_tpu.ops.pallas_wavefront: compaction sorts + bucketed live-prefix
shrink + windowed winner extract, 1.76x the pixel-major blockwise kernel on
the 5000-sphere config-5 slice) — but training stayed on the pixel-major
blockwise fwd+bwd kernels, which re-run O(N-primitives) scans with mostly
dead lanes.  This module closes that gap: the config-5 train step's
expensive part (every closest-hit scan) runs through the wavefront
pipeline, and the backward never scans at all.

Key structural facts that make a wavefront backward cheap:

* **One stash row.**  The forward already materialises every per-bounce ray
  state in HBM (each bounce kernel's input/output (16, N) table) — the
  exact arrays a reverse sweep needs are lying around for free.  The only
  extra record is the WINNER WORD (table row | plane bit | miss), bitcast
  into spare state row 14 by the record-mode bounce kernel
  (pallas_blockwise._bounce_once ``want_record``).  Every other discrete
  decision — root choice, degenerate lambert, metal absorb, Fresnel coin,
  TIR — is recomputed in the reverse from the winner payload + the
  counter-hash draws keyed by (pixel, sample, bounce): the slim-stash
  convention of rt_tpu.ops.pallas_grad, here across kernels instead of
  across sweeps.
* **The reverse needs no scans.**  Per bounce it fetches the pinned
  winner's payload (windowed one-hot, the forward's extract trick), runs
  ``jax.vjp(_bounce_smooth)`` with the recomputed decision bits — the SAME
  smooth map every other gradient pipeline differentiates, so the adjoint
  matches the primal by construction — and scatter-adds the 9 payload
  cotangents into the per-primitive gradient tables with a WINDOWED
  (W, 128) @ (128, 9) one-hot matmul (the transpose of the windowed
  extract; full-table fallback cond when a tile's winners straddle the
  window).  Cost per bounce: O(window) instead of O(N-primitives).
* **Sort permutations transport cotangents.**  Each compaction sort
  additionally carries an iota operand, recording ``src[j]`` = pre-sort
  position of the ray now at j (appending operands to a stable
  ``lax.sort`` cannot change the permutation).  The reverse transports the
  cotangent table through the inverse by one more stable sort keyed on
  ``src``.  Only ~3 sorts/frame at the default schedule.
* **Shrink needs no mirror.**  The forward's bucketed live-prefix shrink
  runs for speed, and its recorded tail arrays are padded back to full
  size with the (frozen, dead) suffix — a dead ray's bounce is the
  identity map, so the full-size reverse passes its cotangent through
  untouched (and its pay-cotangents are exactly zero); the per-sub-tile
  any-live cond skips the dead suffix tiles cheaply.

The loss pipeline needs only ONE forward (the record pass IS the frame):
per chunk, record-forward -> assemble the pre-gamma image (the forward's
ray-id sort) -> MSE cotangent -> per-ray pixel cotangent by gather ->
reverse sweep bounce-major -> per-primitive/c camera gradient assembly
(shared with rt_tpu.ops.pallas_blockwise_grad).  The pixel-major blockwise
pipeline by contrast pays the forward scans twice (frame + each grad
kernel's own sweep).

Gradient convention: detached sampling (discrete decisions pinned), the
convention shared by every pipeline in this repo — reference semantics
mg_ray_tracer.cpp:43-79 (linear-scan argmin), 95-102 (tie select),
109-174 / sm_ray_tracer.cpp:181-219 (scatter) via _bounce_smooth.

RNG is the counter hash keyed by (pixel, sample, bounce) — mandatory here
for the same reason as the forward wavefront: draws must be independent of
where the sorts put a ray.

Measured (v5e-1, round 5; all ratios from interleaved same-state windows):

    =====================================================  ========
    configuration                                           result
    =====================================================  ========
    config-5 train step (5000 sph, 960x540@2spp d8)         262.2 ms
    ... vs the blockwise fused train step (1384.7 ms)       5.28x
    ... step / wavefront-forward-frame ratio                1.355x
    config-4 train step (500 sph, 1920x1080@4spp d8)        1354 ms
    ... vs the blockwise fused step (1300 ms)               0.96x
    on-device FD check (reflectivity, 200x150@2spp)         rel 0.023%
    =====================================================  ========

    The train-step crossover sits far below the forward-only one: the
    forward alone is 0.60x blockwise at the config-4 shape, but the
    scan-free reverse pulls the full step to 0.96x — so
    rt_tpu.train.make_kernel_train_step switches pipelines at 1024
    padded primitives (vs the forward router's 2048).  Correctness
    chain: interpret-mode reverse matches a straight-line jnp vjp of
    the same records to 1e-11; gradient parity vs the blockwise
    pipeline at matched draws (the blockwise side drifts +-ulp at
    depth>=4 because its grad kernel re-runs its own forward sweep,
    while this reverse consumes the true recorded states); sharded ==
    unsharded loss bit-exact on every mesh layout.
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
    _COLS,
    _LANES,
    _auto_cull_group,
    _block_bounds,
    _bucket,
    _morton_perm,
    _padded_table,
    _seed_table,
    _window_start,
)
from .pallas_blockwise_grad import _assemble_grads, _tables_jnp
from .pallas_grad import _bounce_smooth, _decisions
from .pallas_render import _flatten_primitives
from .pallas_wavefront import (
    _ID_MASK,
    _compiled_wf_call,
    _hash_u01_dyn,
    _sort_key,
)

__all__ = [
    "wf_grad_supported",
    "make_wf_mse_step",
    "make_wf_train_step",
]

_BIG = 3.0e38
_MIN_HIT = 0.001


def wf_grad_supported(scene) -> bool:
    return (
        scene.spheres.count + scene.planes.count <= MAX_BLOCKWISE_PRIMS
        and scene.boxes.count == 0
    )


def _sort_state_perm(state, cell_bits: int):
    """Compaction/coherence sort (pallas_wavefront._sort_state, variadic
    mode) that ALSO returns ``src``: src[j] = pre-sort position of the ray
    now at column j.  Stable sort ties break by position, so adding the
    iota operand yields the identical permutation the forward-only sort
    applies."""
    n = state.shape[1]
    key = _sort_key(state, cell_bits)
    iota = jax.lax.iota(jnp.int32, n)
    ops = (key, iota) + tuple(state[i] for i in range(state.shape[0]))
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return jnp.stack(out[2:], axis=0), out[1]


def _transport(cot, src):
    """Cotangent table (R, N) from post-sort layout back to pre-sort
    layout: one stable sort keyed on ``src`` (a permutation of 0..N-1, so
    output column s receives the cotangent of the ray whose pre-sort
    position was s)."""
    ops = (src,) + tuple(cot[i] for i in range(cot.shape[0]))
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return jnp.stack(out[1:], axis=0)


# ---------------------------------------------------------------------------
# reverse kernels
# ---------------------------------------------------------------------------

def _fetch_payload(sph_ref, pln_ref, row_i, hit, ispl, *, s_pad, p_pad, win,
                   shape):
    """Pinned winner payload from the runtime tables: the forward extract's
    one-hot contraction (windowed for spheres on coherent sorted tiles,
    full-table fallback cond) — see pallas_blockwise._bounce_once.
    Returns the 13-slot _bounce_smooth payload tuple + bcl (class)."""
    f32 = jnp.float32
    _dot = functools.partial(
        jax.lax.dot_general,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    zero = jnp.zeros(shape, f32)
    one = jnp.ones(shape, f32)
    sph_win = hit & ~ispl
    rowf = row_i.astype(f32)

    def full_sphere(_):
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (s_pad, _LANES), 0)
        s_oh = ((s_iota == row_i) & sph_win).astype(f32)
        return _dot(sph_ref[...], s_oh, (((0,), (0,)), ((), ())))

    if win and s_pad > win:
        start_i, rel, all_in = _window_start(sph_win, rowf, row_i,
                                             s_pad, win)

        def win_fetch(_):
            blk = sph_ref[pl.ds(start_i, win), :]
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (win, _LANES), 0)
            s_oh = ((w_iota == rel) & sph_win).astype(f32)
            return _dot(blk, s_oh, (((0,), (0,)), ((), ())))

        s_pay = jax.lax.cond(all_in, win_fetch, full_sphere, None)
    else:
        s_pay = full_sphere(None)

    p_iota = jax.lax.broadcasted_iota(jnp.int32, (p_pad, _LANES), 0)
    p_oh = ((p_iota == row_i) & hit & ispl).astype(f32)
    p_pay = _dot(pln_ref[...], p_oh, (((0,), (0,)), ((), ())))

    pick = lambda pay, c: pay[c:c + 1]
    sel = lambda c: jnp.where(ispl, pick(p_pay, c), pick(s_pay, c))
    pay = (
        pick(s_pay, 0), pick(s_pay, 1), pick(s_pay, 2), pick(s_pay, 3),
        pick(p_pay, 0), pick(p_pay, 1), pick(p_pay, 2), pick(p_pay, 3),
        sel(4), sel(5), sel(6),
        # miss lanes fetch nothing: refl falls to 0, but the eta/r0 math
        # divides by refl before the live mask applies — restore 1
        jnp.where(hit, sel(7), one),
        sel(8),
    )
    bcl = sel(9)
    return pay, bcl


def _recompute_t(pay, ispl, hit, o3, d3):
    """Differentiable-free (forward-value) winner t + root bit from the
    pinned payload — the SAME float ops as the lean scan
    (pallas_blockwise lean_spheres/lean_planes), so the recomputed
    decisions match the forward's."""
    f32 = jnp.float32
    ox, oy, oz = o3
    dx, dy, dz = d3
    (bcx, bcy, bcz, brad, bpnx, bpny, bpnz, bpdd, *_rest) = pay
    ocx, ocy, ocz = ox - bcx, oy - bcy, oz - bcz
    bq = ocx * dx + ocy * dy + ocz * dz
    c0 = ocx * ocx + ocy * ocy + ocz * ocz - brad * brad
    disc = bq * bq - c0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -bq - sq
    t1 = -bq + sq
    root = t0 >= _MIN_HIT
    t_s = jnp.where(root, t0, t1)
    nd = bpnx * dx + bpny * dy + bpnz * dz
    safe = jnp.where(jnp.abs(nd) > 1e-12, nd, f32(1.0))
    t_p = -(bpnx * ox + bpny * oy + bpnz * oz + bpdd) / safe
    t = jnp.where(ispl, t_p, t_s)
    best_t = jnp.where(hit, t, f32(_BIG))
    return best_t, root


def _accum_tables(sg_ref, pg_ref, pay_cot, row_i, ispl, live_h, *, s_pad,
                  p_pad, win):
    """Scatter-add the 13-slot payload cotangents into the per-primitive
    grad tables (cols 0-8: centre/normal xyz, radius/d, albedo rgb, refl,
    rough — the pallas_blockwise_grad layout).  One (W, 128) @ (128, 9)
    one-hot matmul per table — the transpose of the windowed winner
    extract; read-modify-write accumulates across sub-tiles and grid
    steps (the output aliases a zeros input)."""
    f32 = jnp.float32
    _dot = functools.partial(
        jax.lax.dot_general,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    sph_slots = (0, 1, 2, 3, 8, 9, 10, 11, 12)
    pln_slots = (4, 5, 6, 7, 8, 9, 10, 11, 12)
    sph_win = live_h & ~ispl
    pln_win = live_h & ispl
    rowf = row_i.astype(f32)

    def accum_one(ref, pad, slots, mask):
        stack = jnp.concatenate([pay_cot[s] for s in slots], axis=0)  # (9,L)
        stack = jnp.where(mask, stack, 0.0)

        def full(_):
            iota = jax.lax.broadcasted_iota(jnp.int32, (pad, _LANES), 0)
            oh = ((iota == row_i) & mask).astype(f32)
            return _dot(oh, stack, (((1,), (1,)), ((), ())))  # (pad, 9)

        if win and pad > win and ref is sg_ref:
            start_i, rel, all_in = _window_start(mask, rowf, row_i,
                                                 pad, win)

            def win_add(_):
                w_iota = jax.lax.broadcasted_iota(jnp.int32,
                                                  (win, _LANES), 0)
                oh = ((w_iota == rel) & mask).astype(f32)
                g = _dot(oh, stack, (((1,), (1,)), ((), ())))  # (win, 9)
                ref[pl.ds(start_i, win), 0:9] = (
                    ref[pl.ds(start_i, win), 0:9] + g)
                return 0

            def full_add(_):
                g = full(None)
                ref[:, 0:9] = ref[:, 0:9] + g
                return 0

            jax.lax.cond(all_in, win_add, full_add, None)
        else:
            g = full(None)
            ref[:, 0:9] = ref[:, 0:9] + g

    accum_one(sg_ref, s_pad, sph_slots, sph_win)
    accum_one(pg_ref, p_pad, pln_slots, pln_win)


def _make_wf_rev_kernel(*, width, height, s_pad, p_pad, max_bounces,
                        rng_mode, wf_rows, win, gen):
    """Reverse ONE wavefront bounce for a state tile (``gen=False``), or
    raygen + bounce 0 (``gen=True``, producing the camera cotangent).

    Refs: meta (SMEM int32 [seed, n_sph, n_pln, bounce_b, n_rays,
    ray_offset, 0, 0]), cam (SMEM f32 15), sphere/plane tables, state
    (16, span) [input state of bounce b; absent when gen], record row
    (1, span) [bounce b's winner words], cot (12, span) [rows 0-8:
    o/d/thr cotangents flowing backward, rows 9-11: the per-ray pixel
    cotangent], zero-initialised grad tables aliased to the outputs.
    Outputs: new cot (absent when gen; replaced by the per-tile camera
    cotangent (1, 1, 16) SMEM), sphere grad table, plane grad table."""
    f32 = jnp.float32
    shape = (1, _LANES)
    n_pix = width * height
    draws_per_sample = 2 + 4 * max_bounces

    def kernel(meta_ref, cam_ref, sph_ref, pln_ref, *rest):
        if gen:
            rec_ref, cot_ref, _sg0, _pg0, cg_ref, sg_ref, pg_ref = rest
        else:
            (state_ref, rec_ref, cot_ref, _sg0, _pg0,
             cot_out, sg_ref, pg_ref) = rest

        seed = meta_ref[0]
        b_dyn = meta_ref[3]
        zero = jnp.zeros(shape, f32)
        one = jnp.ones(shape, f32)
        if gen:
            cam_cot_acc = [jnp.zeros((), f32) for _ in range(15)]

        for r_sub in range(wf_rows):
            sl = pl.ds(r_sub * _LANES, _LANES)
            if gen:
                tile = pl.program_id(0)
                lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                idx = ((tile * wf_rows + r_sub) * _LANES + lane
                       + meta_ref[5])
                lv = idx < meta_ref[4]
                base = (idx // n_pix) * jnp.int32(draws_per_sample)
            else:
                idx = (jax.lax.bitcast_convert_type(state_ref[13:14, sl],
                                                    jnp.int32)
                       & jnp.int32(_ID_MASK))
                lv = state_ref[12:13, sl] > 0.0
                base = ((idx // n_pix) * jnp.int32(draws_per_sample)
                        + jnp.int32(2) + jnp.int32(4) * b_dyn)
            pix = idx % n_pix

            kctr = [0]

            def u01(pix=pix, base=base, kctr=kctr):
                kctr[0] += 1
                return _hash_u01_dyn(pix, seed, base + jnp.int32(kctr[0]),
                                     shape)

            if gen:
                smp = idx // n_pix
                u = u01()
                v = u01()
                # center_first handling: the u01 draws above consume the
                # jitter counters; whether they are USED is per-lane
                # (sample 0 centred) — matches the forward gen kernel
                ctr0 = (smp == 0) & (meta_ref[6] > 0)
                jx = jnp.where(ctr0, f32(0.5), u)
                jy = jnp.where(ctr0, f32(0.5), v)
                px = (pix % width).astype(f32)
                py = (pix // width).astype(f32)

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
                    ox_ = cpx + dwx * near
                    oy_ = cpy + dwy * near
                    oz_ = cpz + dwz * near
                    inv = jax.lax.rsqrt(dwx * dwx + dwy * dwy + dwz * dwz)
                    return (ox_, oy_, oz_, dwx * inv, dwy * inv, dwz * inv)

                cam_v = tuple(cam_ref[i] for i in range(15))
                rays, raygen_vjp = jax.vjp(raygen, cam_v)
                o3 = rays[0:3]
                d3 = rays[3:6]
                thr3 = (one, one, one)
            else:
                o3 = tuple(state_ref[c:c + 1, sl] for c in range(3))
                d3 = tuple(state_ref[c:c + 1, sl] for c in range(3, 6))
                thr3 = tuple(state_ref[c:c + 1, sl] for c in range(6, 9))

            ux = u01()
            uy = u01()
            uz = u01()
            if rng_mode == "sphere":
                ux = 2.0 * ux - 1.0
                uy = 2.0 * uy - 1.0
                uz = 2.0 * uz - 1.0
            uinv = jax.lax.rsqrt(
                jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-30))
            u3 = (ux * uinv, uy * uinv, uz * uinv)
            coin = u01()

            # winner word (bit-30 tag | miss<<25 | plane<<24 | row) — see
            # _bounce_once want_record + the pallas_wavefront tag note
            rec = (jax.lax.bitcast_convert_type(rec_ref[0:1, sl],
                                                jnp.int32)
                   & jnp.int32(_ID_MASK))
            hit = (rec & jnp.int32(1 << 25)) == 0
            ispl = hit & ((rec & jnp.int32(1 << 24)) > 0)
            row_i = jnp.where(hit, rec & jnp.int32((1 << 24) - 1), 0)

            pay, bcl = _fetch_payload(sph_ref, pln_ref, row_i, hit, ispl,
                                      s_pad=s_pad, p_pad=p_pad, win=win,
                                      shape=shape)
            best_t, root = _recompute_t(pay, ispl, hit, o3, d3)
            bits = _decisions(best_t, pay, ispl.astype(f32),
                              root.astype(f32), bcl, o3, d3, lv, u3, coin)

            cot_o = tuple(cot_ref[c:c + 1, sl] for c in range(3))
            cot_d = tuple(cot_ref[c:c + 1, sl] for c in range(3, 6))
            cot_t = tuple(cot_ref[c:c + 1, sl] for c in range(6, 9))
            cot_pix = tuple(cot_ref[c:c + 1, sl] for c in range(9, 12))

            def fb(o3_, d3_, thr3_, pay_):
                return _bounce_smooth(o3_, d3_, thr3_, pay_, u3, bits)

            any_live = jnp.sum(lv.astype(f32)) > 0.0

            def live_body(args):
                cot_o_, cot_d_, cot_t_ = args
                _, fvjp = jax.vjp(fb, o3, d3, thr3, pay)
                (co, cd, ct, pay_cot) = fvjp(
                    (cot_o_, cot_d_, cot_t_, cot_pix))
                return tuple(co) + tuple(cd) + tuple(ct) + tuple(pay_cot)

            def dead_body(args):
                # a dead sub-tile's bounce is the identity map: cotangents
                # pass through, payload cotangents are exactly zero
                cot_o_, cot_d_, cot_t_ = args
                return (tuple(cot_o_) + tuple(cot_d_) + tuple(cot_t_)
                        + (zero,) * 13)

            out = jax.lax.cond(any_live, live_body, dead_body,
                               (cot_o, cot_d, cot_t))
            co, cd, ct = out[0:3], out[3:6], out[6:9]
            pay_cot = out[9:22]

            if gen:
                def add_cam(_):
                    (cam_cot,) = raygen_vjp((co[0], co[1], co[2],
                                             cd[0], cd[1], cd[2]))
                    return tuple(cam_cot)

                cam_cot = jax.lax.cond(
                    any_live, add_cam,
                    lambda _: tuple(jnp.zeros((), f32)
                                    for _ in range(15)), None)
                for i in range(15):
                    cam_cot_acc[i] = cam_cot_acc[i] + cam_cot[i]
            else:
                for c in range(3):
                    cot_out[c:c + 1, sl] = co[c]
                    cot_out[3 + c:4 + c, sl] = cd[c]
                    cot_out[6 + c:7 + c, sl] = ct[c]
                    cot_out[9 + c:10 + c, sl] = cot_pix[c]

            def do_accum(_):
                _accum_tables(sg_ref, pg_ref, pay_cot, row_i, ispl,
                              bits["live_h"], s_pad=s_pad, p_pad=p_pad,
                              win=win)
                return 0

            jax.lax.cond(any_live, do_accum, lambda _: 0, None)

        if gen:
            for i in range(15):
                cg_ref[0, 0, i] = cam_cot_acc[i]
            cg_ref[0, 0, 15] = f32(0.0)

    return kernel


@functools.lru_cache(maxsize=32)
def _compiled_wf_rev(*, width, height, s_pad, p_pad, max_bounces, rng_mode,
                     wf_rows, win, gen, n_tiles, interpret):
    kernel = _make_wf_rev_kernel(
        width=width, height=height, s_pad=s_pad, p_pad=p_pad,
        max_bounces=max_bounces, rng_mode=rng_mode, wf_rows=wf_rows,
        win=win, gen=gen,
    )
    span = wf_rows * _LANES
    in_specs = [
        pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not gen:
        in_specs.append(pl.BlockSpec((16, span), lambda i, *_: (0, i),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, span), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM))   # record row
    in_specs.append(pl.BlockSpec((12, span), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM))   # cot in
    in_specs.append(pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM))   # sg zeros
    in_specs.append(pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM))   # pg zeros
    if gen:
        out_specs = (
            pl.BlockSpec((1, 1, 16), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((n_tiles, 1, 16), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, _COLS), jnp.float32),
        )
        # the zeroed grad tables alias the accumulated outputs (indices
        # count the pallas_call's logical operands incl. the 2 prefetch
        # scalars: meta, cam, sph, pln, rec, cot, sg0, pg0)
        aliases = {6: 1, 7: 2}
    else:
        out_specs = (
            pl.BlockSpec((12, span), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((12, n_tiles * span), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, _COLS), jnp.float32),
        )
        aliases = {7: 1, 8: 2}
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )
    return call


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def _static_config(s_pad, p_pad, max_bounces, block, cull, cull_group,
                   sort_schedule, shrink_at, win):
    """Resolve the wavefront tuning knobs exactly the way
    render_forward_wavefront does (measured defaults, round-4 jobs)."""
    if block is None:
        block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    if cull is None:
        cull = s_pad >= 512 and s_pad // block <= 128
    if cull_group is None and cull:
        nb = s_pad // block
        cull_group = next(g for g in (4, 2, 1) if nb % g == 0)
    elif cull_group is None:
        cull_group = _auto_cull_group(s_pad, block)
    if sort_schedule is None:
        sort_schedule = tuple(b for b in (1, 2, 5) if b < max_bounces)
    if shrink_at == -1:
        cands = [b for b in sort_schedule if b >= 2]
        shrink_at = cands[0] if cands else None
    if shrink_at is not None and shrink_at not in sort_schedule:
        raise ValueError("shrink_at must name a bounce in sort_schedule")
    if win is None:
        win = 256 if s_pad > 512 else 0
    return block, cull, cull_group, tuple(sort_schedule), shrink_at, win


@functools.lru_cache(maxsize=8)
def _wf_grad_pipeline(s_mat_bytes, p_mat_bytes, inv_bytes, *, width, height,
                      s_pad, p_pad, spp, spp_chunk, max_bounces, rng_mode,
                      block, cull, cull_gen, cull_group, sort_schedule,
                      cell_bits, wf_rows, shrink_at, win, center_first,
                      interpret, n_sph, n_pln, S_table, M_table):
    """One jitted dispatch: record-forward wavefront frame + MSE + reverse
    sweep + gradient assembly.  Tables/camera/metas are traced inputs — NO
    recompile across parameter updates (the blockwise-grad property, now on
    the bounce-major pipeline)."""
    n_pix = width * height
    span = wf_rows * _LANES
    s_mat = np.frombuffer(s_mat_bytes, np.int32)
    p_mat = np.frombuffer(p_mat_bytes, np.int32)
    inv_perm = (np.frombuffer(inv_bytes, np.int64)
                if inv_bytes else None)

    chunk_sizes = []
    remaining = spp
    while remaining > 0:
        k = min(spp_chunk, remaining)
        chunk_sizes.append(k)
        remaining -= k

    def calls_for(k, center):
        n_rays = n_pix * k
        n_tiles = -(-n_rays // span)
        common = dict(width=width, height=height, s_pad=s_pad, p_pad=p_pad,
                      max_bounces=max_bounces, rng_mode=rng_mode,
                      block=block, cull_group=cull_group,
                      interpret=interpret, wf_rows=wf_rows, dbg=(),
                      extract_window=win, record=True)
        gen = _compiled_wf_call(center_sample=center, gen=True,
                                n_tiles=n_tiles, cull=cull_gen, **common)
        stepc = {
            nt: _compiled_wf_call(center_sample=center, gen=False,
                                  n_tiles=nt, cull=cull, **common)
            for nt in {n_tiles, max(1, n_tiles // 4),
                       max(1, n_tiles // 16)}
        }
        rcommon = dict(width=width, height=height, s_pad=s_pad,
                       p_pad=p_pad, max_bounces=max_bounces,
                       rng_mode=rng_mode, wf_rows=wf_rows, win=win,
                       n_tiles=n_tiles, interpret=interpret)
        rev = _compiled_wf_rev(gen=False, **rcommon)
        rev_gen = _compiled_wf_rev(gen=True, **rcommon)
        return gen, stepc, rev, rev_gen, n_rays, n_tiles

    calls = [calls_for(k, (ci == 0 and center_first))
             for ci, k in enumerate(chunk_sizes)]

    cfg = dict(n_pix=n_pix, span=span, max_bounces=max_bounces,
               sort_schedule=sort_schedule, cell_bits=cell_bits,
               shrink_at=shrink_at, cull=cull, cull_gen=cull_gen,
               block=block, s_pad=s_pad, p_pad=p_pad)

    @jax.jit
    def run(metas, cam, s_tab, p_tab, target):
        f32 = jnp.float32
        aux = ((_block_bounds(s_tab, block),
                _seed_table(s_tab, block)) if cull else ())

        # ---------------- record forward ---------------------------------
        total = None
        saved = []
        for ci, (k, entry) in enumerate(zip(chunk_sizes, calls)):
            sv = _chunk_forward(entry, metas[ci], cam, s_tab, p_tab, aux,
                                cfg)
            saved.append(sv)
            chans = _chunk_assemble(sv[0])
            acc3 = []
            for c in range(3):
                v = chans[c]
                acc = v[0:n_pix]
                for sm in range(1, k):
                    acc = acc + v[sm * n_pix:(sm + 1) * n_pix]
                acc3.append(acc)
            chunk_img = jnp.stack(acc3, axis=-1)
            total = chunk_img if total is None else total + chunk_img

        # ---------------- loss + pixel cotangent -------------------------
        img = total * f32(1.0 / spp)           # PRE-gamma (convention)
        target_flat = target.reshape(n_pix, 3)
        diff_img = img - target_flat
        loss = jnp.mean(diff_img ** 2)
        cot_flat = 2.0 * diff_img / f32(3.0 * n_pix * spp)

        # ---------------- reverse sweep ----------------------------------
        sg_total = pg_total = cg_total = None
        for ci, (k, entry) in enumerate(zip(chunk_sizes, calls)):
            sg_run, pg_run, cg = _chunk_reverse(
                entry, metas[ci], cam, s_tab, p_tab, saved[ci], cot_flat,
                cfg)
            sg_total = sg_run if sg_total is None else sg_total + sg_run
            pg_total = pg_run if pg_total is None else pg_total + pg_run
            cg_total = cg if cg_total is None else cg_total + cg

        # ---------------- gradient assembly ------------------------------
        if inv_perm is not None:
            # the tables were Morton-sorted; bring per-row grads back to
            # original primitive order before the parameter scatter
            sg_total = sg_total[inv_perm]
        grads = _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat,
                                n_sph, n_pln, S_table, M_table)
        return loss, grads

    return run, len(chunk_sizes)


def _chunk_forward(entry, meta_row, cam, s_tab, p_tab, aux, cfg, off=None):
    """Record forward for one spp chunk: gen + bounce kernels with the
    compaction sorts (permutations recorded) and the bucketed shrink
    (records padded back to full size by the frozen dead suffix).
    Returns ``(final_state, rec0, inputs, recs, srcs, n_rays)``."""
    (gen, stepc, rev, rev_gen, n_rays, n_tiles) = entry
    span = cfg["span"]
    max_bounces = cfg["max_bounces"]
    sort_schedule = cfg["sort_schedule"]
    cell_bits = cfg["cell_bits"]
    shrink_at = cfg["shrink_at"]
    meta_g = meta_row.at[4].set(n_rays)
    if off is not None:
        meta_g = meta_g.at[5].set(off)
    aux_g = aux if cfg["cull_gen"] else ()
    state = gen(meta_g, cam, s_tab, p_tab, *aux_g)
    rec0 = state[14:15]
    N = state.shape[1]
    inputs, recs, srcs = {}, {}, {}

    def run_bounce(st, b, nt):
        meta_b = meta_g.at[3].set(b)
        return stepc[nt](meta_b, cam, s_tab, p_tab, *aux, st)

    b = 1
    while b < max_bounces:
        if b in sort_schedule:
            state, src = _sort_state_perm(state, cell_bits)
            srcs[b] = src
            if b == shrink_at:
                break
        inputs[b] = state
        state = run_bounce(state, b, n_tiles)
        recs[b] = state[14:15]
        b += 1

    if b < max_bounces:
        # bucketed live-prefix tail (the forward's shrink), with every
        # recorded array padded back to full size by the frozen dead
        # suffix — the reverse then runs full-size with no shrink mirror
        # (see module docstring)
        n_live = jnp.sum((state[12] > 0.0).astype(jnp.int32))
        bucket_tiles = [n_tiles, max(1, n_tiles // 4),
                        max(1, n_tiles // 16)]
        tb_list = list(range(b, max_bounces))
        sort_tail = [bb for bb in tb_list
                     if bb in sort_schedule and bb != b]

        def make_tail(nt, b0=b):
            w_sub = nt * span

            def tail(st):
                sub = st[:, :w_sub] if w_sub < N else st
                suffix = st[:, w_sub:]

                def pad(x):
                    if w_sub >= N:
                        return x
                    return jnp.concatenate([x, suffix], axis=1)

                def pad_row(x):
                    if w_sub >= N:
                        return x
                    return jnp.concatenate([x, suffix[14:15]], axis=1)

                t_inputs, t_recs, t_srcs = [], [], []
                for bb in range(b0, max_bounces):
                    if bb in sort_schedule and bb != b0:
                        sub, ssrc = _sort_state_perm(sub, cell_bits)
                        if w_sub < N:
                            ssrc = jnp.concatenate([
                                ssrc,
                                jnp.arange(w_sub, N, dtype=jnp.int32)])
                        t_srcs.append(ssrc)
                    t_inputs.append(pad(sub))
                    sub = run_bounce(sub, bb, nt)
                    t_recs.append(pad_row(sub[14:15]))
                return (pad(sub), tuple(t_inputs), tuple(t_recs),
                        tuple(t_srcs))

            return tail

        idx = jnp.where(
            n_live <= bucket_tiles[2] * span, 2,
            jnp.where(n_live <= bucket_tiles[1] * span, 1, 0))
        state, t_inputs, t_recs, t_srcs = jax.lax.switch(
            idx, [make_tail(nt) for nt in bucket_tiles], state)
        for j, bb in enumerate(tb_list):
            inputs[bb] = t_inputs[j]
            recs[bb] = t_recs[j]
        for j, bb in enumerate(sort_tail):
            srcs[bb] = t_srcs[j]

    return (state, rec0, inputs, recs, srcs)


def _chunk_assemble(state):
    """Final state -> per-channel radiance sorted by global ray id —
    identical addition order to the forward-only pipeline (bit parity)."""
    ray_id = (jax.lax.bitcast_convert_type(state[13], jnp.int32)
              & jnp.int32(_ID_MASK))
    out = jax.lax.sort((ray_id, state[9], state[10], state[11]),
                       num_keys=1, is_stable=True)
    return out[1], out[2], out[3]


def _chunk_reverse(entry, meta_row, cam, s_tab, p_tab, saved, cot_flat,
                   cfg, off=None):
    """Reverse sweep for one chunk: per-ray pixel cotangent by gather,
    bounce-major reverse kernels (cotangent transported through the
    recorded sort permutations), gen-reverse for the camera cotangent.
    Returns (sg_table, pg_table, cam_cot16)."""
    f32 = jnp.float32
    (gen, stepc, rev, rev_gen, n_rays, n_tiles) = entry
    n_pix = cfg["n_pix"]
    max_bounces = cfg["max_bounces"]
    state_f, rec0, inputs, recs, srcs = saved
    N = state_f.shape[1]
    meta0 = meta_row if off is None else meta_row.at[5].set(off)
    idxf = (jax.lax.bitcast_convert_type(state_f[13], jnp.int32)
            & jnp.int32(_ID_MASK))
    pixf = idxf % n_pix
    cotp = jnp.take(cot_flat, pixf, axis=0)      # (N, 3)
    cot = jnp.zeros((12, N), f32).at[9:12].set(cotp.T)
    sg_run = jnp.zeros((cfg["s_pad"], _COLS), f32)
    pg_run = jnp.zeros((cfg["p_pad"], _COLS), f32)
    for b in reversed(range(1, max_bounces)):
        meta_b = meta0.at[3].set(b)
        cot, sg_run, pg_run = rev(meta_b, cam, s_tab, p_tab,
                                  inputs[b], recs[b], cot, sg_run, pg_run)
        if b in srcs:
            cot = _transport(cot, srcs[b])
    meta_g = meta0.at[4].set(n_rays)
    cg_tiles, sg_run, pg_run = rev_gen(meta_g, cam, s_tab, p_tab,
                                       rec0, cot, sg_run, pg_run)
    cg = cg_tiles.sum(axis=(0, 1))
    return sg_run, pg_run, cg


@functools.lru_cache(maxsize=8)
def _wf_grad_pipeline_sharded(s_mat_bytes, p_mat_bytes, inv_bytes, mesh_key,
                              *, axis, width, height, s_pad, p_pad, spp,
                              spp_chunk, max_bounces, rng_mode, block, cull,
                              cull_gen, cull_group, sort_schedule, cell_bits,
                              wf_rows, shrink_at, win, center_first,
                              interpret, n_sph, n_pln, S_table, M_table):
    """Ray-sharded twin of :func:`_wf_grad_pipeline` (BASELINE config 5).

    Each device owns a CONTIGUOUS global ray range and runs its own
    complete record-forward (local compaction sorts + local bucketed
    shrink, exactly like the sharded forward wavefront) and its own
    reverse sweep; hash draws are keyed by GLOBAL ray ids, so per-ray
    radiance is bit-identical to the unsharded pipeline.  The per-chunk
    frames assemble by an ``all_gather`` of the id-sorted local radiance
    (the MSE cotangent is then computed replicated), and the
    per-primitive gradient tables, camera cotangent and loss reduce with
    ``psum`` — XLA overlaps the all-reduce with the remaining per-shard
    reverse work (the overlapped-grad-all-reduce posture of
    BASELINE.json config 5)."""
    from jax.sharding import PartitionSpec as P

    from ..dist import _SMAP_NOCHECK, shard_map
    from .pallas_blockwise_grad import _MESHES

    mesh = _MESHES[mesh_key]
    n_dev = mesh.shape[axis]
    n_pix = width * height
    span = wf_rows * _LANES
    s_mat = np.frombuffer(s_mat_bytes, np.int32)
    p_mat = np.frombuffer(p_mat_bytes, np.int32)
    inv_perm = (np.frombuffer(inv_bytes, np.int64) if inv_bytes else None)

    chunk_sizes = []
    remaining = spp
    while remaining > 0:
        k = min(spp_chunk, remaining)
        chunk_sizes.append(k)
        remaining -= k

    def calls_for(k, center):
        n_rays = n_pix * k
        local_tiles = -(-(-(-n_rays // span)) // n_dev)
        common = dict(width=width, height=height, s_pad=s_pad, p_pad=p_pad,
                      max_bounces=max_bounces, rng_mode=rng_mode,
                      block=block, cull_group=cull_group,
                      interpret=interpret, wf_rows=wf_rows, dbg=(),
                      extract_window=win, record=True)
        gen = _compiled_wf_call(center_sample=center, gen=True,
                                n_tiles=local_tiles, cull=cull_gen,
                                **common)
        stepc = {
            nt: _compiled_wf_call(center_sample=center, gen=False,
                                  n_tiles=nt, cull=cull, **common)
            for nt in {local_tiles, max(1, local_tiles // 4),
                       max(1, local_tiles // 16)}
        }
        rcommon = dict(width=width, height=height, s_pad=s_pad,
                       p_pad=p_pad, max_bounces=max_bounces,
                       rng_mode=rng_mode, wf_rows=wf_rows, win=win,
                       n_tiles=local_tiles, interpret=interpret)
        rev = _compiled_wf_rev(gen=False, **rcommon)
        rev_gen = _compiled_wf_rev(gen=True, **rcommon)
        return gen, stepc, rev, rev_gen, n_rays, local_tiles

    calls = [calls_for(k, (ci == 0 and center_first))
             for ci, k in enumerate(chunk_sizes)]
    cfg = dict(n_pix=n_pix, span=span, max_bounces=max_bounces,
               sort_schedule=sort_schedule, cell_bits=cell_bits,
               shrink_at=shrink_at, cull=cull, cull_gen=cull_gen,
               block=block, s_pad=s_pad, p_pad=p_pad)

    def shard_fn(metas, cam, s_tab, p_tab, target_flat):
        f32 = jnp.float32
        aux = ((_block_bounds(s_tab, block),
                _seed_table(s_tab, block)) if cull else ())
        total = None
        saved = []
        for ci, (k, entry) in enumerate(zip(chunk_sizes, calls)):
            local_tiles = entry[5]
            off = (jax.lax.axis_index(axis).astype(jnp.int32)
                   * jnp.int32(local_tiles * span))
            sv = _chunk_forward(entry, metas[ci], cam, s_tab, p_tab, aux,
                                cfg, off=off)
            saved.append((sv, off))
            flat_local = jnp.stack(_chunk_assemble(sv[0]), axis=-1)
            flat = jax.lax.all_gather(flat_local, axis, axis=0,
                                      tiled=True)        # (n_dev*L, 3)
            acc = flat[0:n_pix]
            for sm in range(1, k):
                acc = acc + flat[sm * n_pix:(sm + 1) * n_pix]
            total = acc if total is None else total + acc
        img = total * f32(1.0 / spp)
        diff_img = img - target_flat
        loss = jnp.mean(diff_img ** 2)
        cot_flat = 2.0 * diff_img / f32(3.0 * n_pix * spp)

        sg_total = pg_total = cg_total = None
        for ci, (k, entry) in enumerate(zip(chunk_sizes, calls)):
            sv, off = saved[ci]
            sg, pg, cg = _chunk_reverse(entry, metas[ci], cam, s_tab,
                                        p_tab, sv, cot_flat, cfg, off=off)
            sg_total = sg if sg_total is None else sg_total + sg
            pg_total = pg if pg_total is None else pg_total + pg
            cg_total = cg if cg_total is None else cg_total + cg
        sg_total = jax.lax.psum(sg_total, axis)
        pg_total = jax.lax.psum(pg_total, axis)
        cg_total = jax.lax.psum(cg_total, axis)
        return loss, sg_total, pg_total, cg_total

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        **_SMAP_NOCHECK,
    )

    @jax.jit
    def run(metas, cam, s_tab, p_tab, target):
        target_flat = target.reshape(n_pix, 3)
        loss, sg_total, pg_total, cg_total = sharded(
            metas, cam, s_tab, p_tab, target_flat)
        if inv_perm is not None:
            sg_total = sg_total[inv_perm]
        grads = _assemble_grads(sg_total, pg_total, cg_total, s_mat, p_mat,
                                n_sph, n_pln, S_table, M_table)
        return loss, grads

    return run, len(chunk_sizes)


def _wf_grad_static(scene, size, spp, spp_chunk):
    """Shared shape/limit resolution for the grad pipeline."""
    w, h = size
    n_pix = w * h
    spp_chunk = max(1, min(spp_chunk, spp))
    # chunk ray cap: the record pass keeps ~max_bounces (16, N) state
    # tables alive in HBM; 2^23 rays/chunk ~ 4.3 GB of records at depth 8
    while n_pix * spp_chunk > (1 << 23) and spp_chunk > 1:
        spp_chunk -= 1
    if n_pix * spp_chunk > _ID_MASK:
        spp_chunk = max(1, _ID_MASK // n_pix)
    if n_pix > _ID_MASK:
        # mirror the forward (pallas_wavefront.py): ray ids ride a
        # bit-30-tagged int32 pattern, so ids past 2^30 would corrupt
        # the tag and silently mis-route cotangents
        raise ValueError("frame too large for exact tagged int32 ray ids")
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    return spp_chunk, s_pad, p_pad


def _morton_static(concrete, s_pad):
    """Static Morton permutation (computed ONCE from the entry geometry —
    trained centres drift from it, which only degrades cull efficiency,
    never correctness: the scan tie-breaks on the original index carried
    in column 10 and the cull bounds are re-derived from the traced
    table every step)."""
    s_cols, _ = _flatten_primitives(concrete, "mg")
    if concrete.spheres.count <= 1:
        return None, None
    perm = _morton_perm(s_cols)
    perm_full = np.arange(s_pad, dtype=np.int64)
    perm_full[:len(perm)] = perm
    inv_full = np.argsort(perm_full, kind="stable")
    return perm_full, inv_full


def _apply_perm_traced(s_tab, perm_full):
    """Sorted traced table: row j <- original row perm[j]; column 10 gets
    each row's ORIGINAL index (the lean scan's tie-break)."""
    s_pad = s_tab.shape[0]
    s_tab = s_tab.at[:, 10].set(jnp.arange(s_pad, dtype=jnp.float32))
    if perm_full is not None:
        s_tab = s_tab[perm_full]
    return s_tab


def _wf_meta_host(scene, seed, n_chunks, center_first):
    """Host meta rows: the pallas_wavefront._wf_meta_rows seed chain plus
    the center flag in column 6 (first chunk only)."""
    from .pallas_wavefront import _wf_meta_rows

    metas = _wf_meta_rows(scene, seed, n_chunks)
    if center_first:
        metas = metas.at[0, 6].set(1)
    return metas


def make_wf_mse_step(
    params,
    scene,
    target,
    size: tuple[int, int],
    *,
    spp: int = 4,
    max_bounces: Optional[int] = None,
    personality: str = "mg",
    rng_mode: str = "reference",
    spp_chunk: int = 4,
    block: Optional[int] = None,
    cull: Optional[bool] = None,
    cull_gen: Optional[bool] = None,
    cull_group: Optional[int] = None,
    sort_schedule: Optional[tuple] = None,
    cell_bits: int = 2,
    wf_rows: int = 4,
    shrink_at: Optional[int] = -1,
    win: Optional[int] = None,
    center_sample: Optional[bool] = None,
    interpret: bool = False,
    mesh=None,
    axis: str = "rays",
):
    """Prebuilt wavefront fwd+bwd MSE step: ``step(seed) -> (loss, grads)``.

    ``target`` must be a PRE-gamma radiance image (the convention shared
    by every gradient pipeline — rt_tpu.diff docstring).  The forward
    image inside the step is bit-identical to
    ``render_forward_wavefront(..., gamma=False)`` at the same seed/chunking
    (the record pass IS the frame)."""
    from ..diff import apply_params

    w, h = size
    if max_bounces is None:
        max_bounces = scene.max_bounces
    concrete = apply_params(scene, jax.tree_util.tree_map(jnp.asarray,
                                                          params))
    if not wf_grad_supported(concrete):
        raise ValueError("scene exceeds the wavefront grad limits")
    spp_chunk, s_pad, p_pad = _wf_grad_static(concrete, size, spp,
                                              spp_chunk)
    block_, cull_, cull_group_, sched, shrink, win_ = _static_config(
        s_pad, p_pad, max_bounces, block, cull, cull_group, sort_schedule,
        shrink_at, win)
    cull_gen_ = bool(cull_) if cull_gen is None else bool(cull_gen)
    perm_full, inv_full = (_morton_static(concrete, s_pad)
                           if cull_ else (None, None))

    # build padded tables the forward way (host, concrete params)
    s_cols, p_cols = _flatten_primitives(concrete, personality)
    gidx = None
    if perm_full is not None:
        n = concrete.spheres.count
        gidx = perm_full[:n]
        s_cols = s_cols[:, gidx]
    s_tab = jnp.asarray(_padded_table(s_cols, s_pad, gidx))
    p_tab = jnp.asarray(_padded_table(p_cols, p_pad))

    common = dict(
        width=w, height=h, s_pad=s_pad, p_pad=p_pad, spp=spp,
        spp_chunk=spp_chunk, max_bounces=max_bounces, rng_mode=rng_mode,
        block=block_, cull=cull_, cull_gen=cull_gen_,
        cull_group=cull_group_, sort_schedule=sched, cell_bits=cell_bits,
        wf_rows=wf_rows, shrink_at=shrink, win=win_,
        center_first=(True if center_sample is None else center_sample),
        interpret=interpret, n_sph=concrete.spheres.count,
        n_pln=concrete.planes.count,
        S_table=scene.spheres.center.shape[0],
        M_table=scene.materials.albedo.shape[0],
    )
    mats = (
        bytes(np.asarray(concrete.spheres.material,
                         np.int32)[:concrete.spheres.count]),
        bytes(np.asarray(concrete.planes.material,
                         np.int32)[:concrete.planes.count]),
        bytes(inv_full) if inv_full is not None else b"",
    )
    if mesh is None:
        run, n_chunks = _wf_grad_pipeline(*mats, **common)
    else:
        from .pallas_blockwise_grad import _mesh_key

        run, n_chunks = _wf_grad_pipeline_sharded(
            *mats, _mesh_key(mesh), axis=axis, **common)
    cam = jnp.concatenate([
        jnp.asarray(concrete.camera.position, jnp.float32),
        jnp.asarray(concrete.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(concrete.camera.vfov * 0.5), w / h,
            concrete.camera.near, 0.0
        ], jnp.float32),
    ])
    target_dev = jnp.asarray(target, jnp.float32)
    center_first = True if center_sample is None else center_sample

    def step(seed: int):
        metas = _wf_meta_host(concrete, int(seed), n_chunks, center_first)
        return run(metas, cam, s_tab, p_tab, target_dev)

    return step


def make_wf_train_step(
    optimizer,
    scene,
    target,
    size: tuple[int, int],
    *,
    spp: int = 4,
    max_bounces: Optional[int] = None,
    personality: str = "mg",
    rng_mode: str = "reference",
    spp_chunk: int = 4,
    interpret: bool = False,
    mesh=None,
    axis: str = "rays",
    **knobs,
):
    """Fully-jitted big-scene optimization step on the WAVEFRONT pipeline:
    ``step(params, opt_state, seed) -> (params, opt_state, loss)``.

    The wavefront twin of
    rt_tpu.ops.pallas_blockwise_grad.make_bw_train_step: tables are
    rebuilt from the traced parameters on-device every step (zero
    recompiles), but the forward scans ride the bounce-major
    compaction/sort pipeline and the backward replaces every scan with
    windowed one-hot fetch/scatter.  ``seed`` is traced (the per-chunk
    seed chain wraps int32 — a valid stream, not the host chain)."""
    import optax

    from ..diff import apply_params

    w, h = size
    if max_bounces is None:
        max_bounces = scene.max_bounces
    if not wf_grad_supported(scene):
        raise ValueError("scene exceeds the wavefront grad limits")
    spp_chunk, s_pad, p_pad = _wf_grad_static(scene, size, spp,
                                              spp_chunk)
    block_, cull_, cull_group_, sched, shrink, win_ = _static_config(
        s_pad, p_pad, max_bounces, knobs.get("block"), knobs.get("cull"),
        knobs.get("cull_group"), knobs.get("sort_schedule"),
        knobs.get("shrink_at", -1), knobs.get("win"))
    cull_gen_ = bool(cull_) if knobs.get("cull_gen") is None \
        else bool(knobs["cull_gen"])
    perm_full, inv_full = (_morton_static(scene, s_pad)
                           if cull_ else (None, None))
    common = dict(
        width=w, height=h, s_pad=s_pad, p_pad=p_pad, spp=spp,
        spp_chunk=spp_chunk, max_bounces=max_bounces, rng_mode=rng_mode,
        block=block_, cull=cull_, cull_gen=cull_gen_,
        cull_group=cull_group_, sort_schedule=sched,
        cell_bits=knobs.get("cell_bits", 2),
        wf_rows=knobs.get("wf_rows", 4), shrink_at=shrink, win=win_,
        center_first=True, interpret=interpret,
        n_sph=scene.spheres.count, n_pln=scene.planes.count,
        S_table=scene.spheres.center.shape[0],
        M_table=scene.materials.albedo.shape[0],
    )
    mats = (
        bytes(np.asarray(scene.spheres.material,
                         np.int32)[:scene.spheres.count]),
        bytes(np.asarray(scene.planes.material,
                         np.int32)[:scene.planes.count]),
        bytes(inv_full) if inv_full is not None else b"",
    )
    if mesh is None:
        run, n_chunks = _wf_grad_pipeline(*mats, **common)
    else:
        from .pallas_blockwise_grad import _mesh_key

        run, n_chunks = _wf_grad_pipeline_sharded(
            *mats, _mesh_key(mesh), axis=axis, **common)
    target_dev = jnp.asarray(target, jnp.float32)
    perm_dev = (jnp.asarray(perm_full) if perm_full is not None else None)
    counts = (jnp.int32(scene.spheres.count), jnp.int32(scene.planes.count))

    @jax.jit
    def step(params, opt_state, seed):
        s_tab, p_tab, cam = _tables_jnp(scene, params, personality,
                                        s_pad, p_pad, size)
        s_tab = _apply_perm_traced(s_tab, perm_dev)
        seed = jnp.asarray(seed, jnp.int32)
        rows = []
        sd = seed
        for ci in range(n_chunks):
            rows.append(jnp.stack([
                sd, counts[0], counts[1], jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.int32(1 if ci == 0 else 0),
                jnp.int32(0)]))
            sd = sd * jnp.int32(1103515245) + jnp.int32(12345)
        metas = jnp.stack(rows)
        loss, grads = run(metas, cam, s_tab, p_tab, target_dev)
        grads = {k: grads[k] for k in params}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
