"""Blockwise Pallas megakernel: large scenes with *dynamic* primitive tables.

The unrolled megakernel (rt_tpu.ops.pallas_render) bakes every primitive
into the instruction stream — unbeatable for small scenes, but compile time
grows with bounces x primitives (capped at MAX_UNROLL_PRIMS = 640) and any
geometry edit recompiles.  This kernel is the *sequence-parallel* analogue
the survey calls for (SURVEY.md §2/§5: the reference's per-ray cost is a
linear scan over all primitives, mg_ray_tracer.cpp:43-52, 70-79 — the
structural twin of long-context attention): primitive tables are **runtime
VMEM inputs** streamed through the closest-hit scan in blocks of 8 with a
running argmin, so

* scenes up to ``MAX_BLOCKWISE_PRIMS`` primitives run on-chip (BASELINE.json
  configs 4 & 5: 500- and 5000-sphere procedural scenes);
* geometry/material edits do NOT recompile — only the padded table bucket,
  image size and bounce count are static (the interactive-editing win the
  unrolled kernel gives up);
* compile time is O(bounces), not O(bounces x primitives): the scan is a
  ``fori_loop`` with a dynamic trip count read from SMEM.

Layout (the part that makes it fast on TPU): each grid step owns 128 rays
living on the **lane** axis — all per-ray state is (1, 128) and the scatter
math is exactly the unrolled kernel's straight-line vector code.  Each scan
step loads an (8, 16) block of the primitive table (8 primitives on the
**sublane** axis, payload columns on lanes), intersects it against the ray
tile by (8,1)x(1,128) broadcasting — a fully packed (8, 128) vector op per
instruction — and folds the block winner into the running best via a
cross-sublane min + first-row tie-break.  The winner's payload (centre,
albedo, IOR, class...) is extracted with masked sublane reductions — the
dynamic-table analogue of the one-hot contraction used by the jnp path
(rt_tpu.ops.intersect._select_min), with the same no-gather rationale.

MXU path (``mxu=True``, experimental, off by default): the two dominating
per-pair computations are matmul-shaped and can move off the VPU onto the
systolic array.  (1) The intersection dot products: with the primitive
table stored transposed as (16, N) payload-rows x primitive-lanes,
``oc.d = o.d - C@D`` and ``|oc|^2 - r^2 = |o|^2 + [cnorm, -2c]@[1, o]``
become two K<=4 ``dot_general`` calls per (128-primitive x 128-ray) block.
(2) Winner-payload extraction: the per-block one-hot winner mask (128, 128)
contracts against the payload table block (16, 128) in ONE K=128 matmul,
replacing ten masked sublane reductions.  Both use ``Precision.HIGHEST``
(f32 via bf16 passes): the one-hot contraction is then *exact* — each f32
payload value splits exactly across the bf16 passes and the MXU accumulates
in f32, so the winner's centre/IOR/class come out bit-identical to a VPU
select.  **Measured on v5e-1 it LOSES to the VPU scan** (500-sphere
800x600@8spp: 193 -> 281 ms; 5000-sphere: 235 -> 318 ms): K<=4 and
6-pass-HIGHEST matmuls issued inside a serial, carry-dependent
``fori_loop`` are MXU-pipeline-fill-bound, while the VPU scan keeps every
(8x128) op fully packed.  Kept as an option because the layout groundwork
(transposed tables, one-hot contraction) is what a future
whole-table-batched matmul formulation needs; parity with the VPU scan is
within one silhouette pixel (different rounding of the expanded quadratic).

Tie-breaking matches the reference (mg_ray_tracer.cpp:95-102): planes are
scanned first with strict '<' (earliest index wins — blocks are visited in
index order and rows within a block break ties by first row), then spheres
win a plane tie but use strict '<' among themselves.

RNG: ``rng_impl="hw"`` (default) uses the TPU hardware PRNG like the
unrolled kernel; ``rng_impl="hash"`` is a portable lowbias32-style counter
hash in pure int32 vector ops — bit-identical between Mosaic and pallas
interpret mode, which is what lets the CPU test suite exercise this kernel
end-to-end (tests/test_pallas_blockwise.py) without TPU hardware.

Forward/serving only: gradients for big scenes use the jnp autodiff/replay
paths (rt_tpu.diff / rt_tpu.replay).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_render import _flatten_primitives, _hash_u01

__all__ = [
    "render_forward_blockwise",
    "blockwise_supported",
    "MAX_BLOCKWISE_PRIMS",
]

_BIG = 3.0e38
_MIN_HIT = 0.001
MAX_BLOCKWISE_PRIMS = 16384  # (N,16) f32 table = 1 MB VMEM at the cap
_BLOCK = 8        # primitives per scan step (f32 sublane count)
_LANES = 128      # rays per grid step
_COLS = 16        # padded payload columns (10 used)


def blockwise_supported(scene, include_boxes: bool = False) -> bool:
    """Whether the blockwise megakernel can handle this scene.  Box scenes
    are fine under tracer semantics (the reference's box stub never hits,
    mg_ray_tracer.cpp:89-93 — the kernel simply has no box scan), and as
    of round 5 the ``--boxes`` extension (include_boxes=True) runs
    blockwise too: boxes get their own runtime table + slab-test scan in
    _bounce_once."""
    total = scene.spheres.count + scene.planes.count
    if include_boxes:
        total += scene.boxes.count
    return total <= MAX_BLOCKWISE_PRIMS


def _bucket(n: int) -> int:
    """Pad a primitive count to a reuse-friendly table height: at least 128,
    then multiples of 512 (recompiles only when the bucket changes)."""
    if n <= 128:
        return 128
    return -(-n // 512) * 512


def _padded_table(cols: np.ndarray, bucket: int,
                  gidx: Optional[np.ndarray] = None) -> np.ndarray:
    """(10, count) column payload -> (bucket, 16) row-major table.  Padding
    rows are all-zero; the kernel masks them by count, so their values never
    matter.  Column 10 carries each row's ORIGINAL (pre-sort) index as f32
    (exact for tables <= 2^24): the lean scan tie-breaks on it so a
    spatially sorted table still reproduces the reference's first-index-
    wins argmin bit-exactly (mg_ray_tracer.cpp:95-102)."""
    out = np.zeros((bucket, _COLS), np.float32)
    n = cols.shape[1]
    out[:n, :10] = cols.T
    out[:, 10] = np.arange(bucket, dtype=np.float32)
    if gidx is not None:
        out[:n, 10] = gidx.astype(np.float32)
    return out


def _padded_box_table(b_cols: np.ndarray, bucket: int) -> np.ndarray:
    """(12, count) box columns (pallas_render._flatten_boxes: centre,
    half-extents, albedo rgb, refl, rough, class) -> (bucket, 16) table.
    Column 12 carries the original index (the among-boxes tie-break)."""
    out = np.zeros((bucket, _COLS), np.float32)
    n = b_cols.shape[1]
    out[:n, :12] = b_cols.T
    out[:, 12] = np.arange(bucket, dtype=np.float32)
    return out


def _box_inputs(scene, personality: str, include_boxes: bool):
    """Shared --boxes table construction: ``(b_pad, btab)`` where btab is
    a 0/1-tuple carrying the padded (b_pad, 16) slab-test table.  One
    place for the flatten/bucket/pad recipe so the unrolled, blockwise,
    wavefront and records pipelines can never desync on it."""
    if not (include_boxes and scene.boxes.count > 0):
        return 0, ()
    from .pallas_render import _flatten_boxes

    b_cols = _flatten_boxes(scene, personality)
    b_pad = _bucket(scene.boxes.count)
    return b_pad, (jnp.asarray(_padded_box_table(b_cols, b_pad)),)


def _morton_perm(cols: np.ndarray) -> np.ndarray:
    """Spatial (Morton/Z-order) permutation of sphere columns.  Sorting
    makes each scan block spatially COMPACT, which is what gives the
    per-block bounding spheres (:func:`_block_bounds`) culling power — an
    unsorted random scene has every block spanning the whole scene, so the
    conservative cull never fires (measured 0.74x, i.e. pure overhead).
    Winner semantics are unchanged: the scan tie-breaks on the original
    index carried in table column 10."""
    n = cols.shape[1]
    if n == 0:
        return np.arange(0)
    c = cols[:3, :].T.astype(np.float64)
    lo, hi = c.min(axis=0), c.max(axis=0)
    q = np.clip(((c - lo) / np.maximum(hi - lo, 1e-9) * 1023.0), 0, 1023
                ).astype(np.int64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def _padded_table_mxu(cols: np.ndarray, bucket: int, kind: str) -> np.ndarray:
    """(10, count) column payload -> transposed (16, bucket) table for the
    MXU scan: payload rows 0-9 as in :func:`_padded_table`; spheres
    additionally get row 10 = |c|^2 - r^2 and rows 11-13 = -2c, so the
    quadratic term is one K=4 matmul against [1, ox, oy, oz].  Row 14
    carries the original index (the lean scan's tie-break column; the MXU
    tables are never sorted, so it is just arange)."""
    out = np.zeros((_COLS, bucket), np.float32)
    n = cols.shape[1]
    out[:10, :n] = cols
    out[14, :] = np.arange(bucket, dtype=np.float32)
    if kind == "sphere" and n:
        cx, cy, cz, rad = cols[0], cols[1], cols[2], cols[3]
        out[10, :n] = cx * cx + cy * cy + cz * cz - rad * rad
        out[11, :n] = -2.0 * cx
        out[12, :n] = -2.0 * cy
        out[13, :n] = -2.0 * cz
    return out


def _hw_u01(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _auto_cull_group(s_pad: int, block: int) -> int:
    """Largest group size in {8, 4, 2, 1} dividing the physical block count
    (the grouped scan must not read past the table)."""
    nb = s_pad // block
    for g in (8, 4, 2, 1):
        if nb % g == 0:
            return g
    return 1


def _block_bounds(s_tab: jax.Array, block: int) -> jax.Array:
    """Per-block bounding spheres for the conservative cull (traced jnp, so
    geometry edits still don't recompile).  Row ib of the (nb_pad, 128)
    result holds [cBx, cBy, cBz, R_B] in cols 0-3: the centroid of the
    block's sphere centres and a radius covering every member sphere
    entirely.  R_B is inflated by a relative 1e-4 + 1e-5 so f32 rounding in
    this computation or in the kernel's distance test can never make the
    bound non-conservative (the cull must preserve the exact argmin).
    Padding rows (centre 0, radius 0) only ever inflate R_B — fewer culls in
    the tail block, never a wrong skip."""
    s_pad = s_tab.shape[0]
    nb = s_pad // block
    c = s_tab[:, :3].reshape(nb, block, 3)
    r = s_tab[:, 3].reshape(nb, block)
    cB = c.mean(axis=1)
    R = jnp.max(jnp.sqrt(jnp.sum((c - cB[:, None, :]) ** 2, axis=-1)) + r,
                axis=1)
    R = R * jnp.float32(1.0 + 1e-4) + jnp.float32(1e-5)
    nb_pad = -(-nb // 8) * 8
    aux = jnp.zeros((nb_pad, 128), jnp.float32)
    aux = aux.at[:nb, 0:3].set(cB).at[:nb, 3].set(R)
    return aux


def _seed_table(s_tab: jax.Array, block: int) -> jax.Array:
    """(128, 16) seed subset for the culled scan: the max-radius sphere of
    every block (traced jnp).  Scanning this subset FIRST establishes a
    tight per-lane running best_t before any full block is visited — the
    grouped cull's t-window test otherwise only fires after the scan
    happens to pass the winner's block (measured: barely 1.06x).  A subset
    scan is a PARTIAL scan, so correctness is untouched: re-encounters in
    the main sweep tie on (t, original index) and keep the first winner.
    Column 10 carries the original index (tie-break), column 11 the row in
    the (sorted) main table (the extract one-hot).  Padding rows are inert
    (centre 1e9, radius 0 -> negative discriminant)."""
    s_pad = s_tab.shape[0]
    nb = s_pad // block
    r = s_tab[:, 3].reshape(nb, block)
    j = jnp.argmax(r, axis=1)
    rows = s_tab[jnp.arange(nb) * block + j]          # (nb, 16)
    seed = jnp.full((128, _COLS), 0.0, jnp.float32)
    seed = seed.at[:, 0].set(1e9).at[:, 10].set(1e9)
    seed = seed.at[:nb, :].set(rows)
    seed = seed.at[:nb, 11].set((jnp.arange(nb) * block + j)
                                .astype(jnp.float32))
    return seed


def _window_start(mask, rowf, row_i, pad, win):
    """Windowed one-hot geometry, shared by the forward winner extract
    (below) and the wavefront reverse's payload fetch / gradient scatter
    (pallas_wavefront_grad): on coherent (sorted) tiles the winner rows
    cluster, so derive the 8-aligned window start from the masked row
    minimum, each lane's window-relative row, and the all-in-window
    predicate gating the windowed fast path (lanes outside fall back to
    the full-table one-hot via the caller's cond).  The three call sites
    MUST agree bit-for-bit — the reverse pins the same winners the
    forward extracted — which is why this lives in one place.

    Returns ``(start_i, rel, all_in)``."""
    f32 = jnp.float32
    wrow = jnp.where(mask, rowf, f32(3e38))
    start_f = jnp.min(wrow)
    start_i = jnp.where(start_f < f32(3e38), start_f,
                        f32(0.0)).astype(jnp.int32)
    start_i = jnp.minimum((start_i // 8) * 8, jnp.int32(pad - win))
    rel = row_i - start_i
    in_win = (rel >= 0) & (rel < win)
    all_in = jnp.sum((mask & ~in_win).astype(f32)) == 0.0
    return start_i, rel, all_in


def _bounce_once(refs, counts, rays, u01, *, s_pad, p_pad, block, scan,
                 mxu, cull, cull_group, rng_mode, skip_cond, dbg=(),
                 extract_window=0, want_record=False, b_pad=0):
    """ONE path-tracing bounce for a 128-lane ray tile: blockwise
    closest-hit scan (payload / lean / culled / MXU variants) + sky on
    miss + lambert/metal/dielectric scatter (mg_ray_tracer.cpp:109-174,
    sm_ray_tracer.cpp:181-219).  Pure function of its inputs — shared by
    the pixel-major kernel (:func:`_make_blockwise_kernel`) and the
    bounce-major wavefront kernel (rt_tpu.ops.pallas_wavefront), so the
    two stay bit-identical by construction.

    ``rays`` = (ox, oy, oz, dx, dy, dz, tr, tg, tb, live_f); ``u01`` is
    called exactly 4 times (unit-vector triple + coin).  ``skip_cond``
    wraps the scan in a dead-tile early-out lax.cond.  Returns
    ``(contrib_rgb, new_o, new_d, new_thr, new_live_f)`` where
    ``contrib_rgb`` is this bounce's (masked) radiance contribution.

    ``b_pad > 0`` (lean scan only) enables the ``--boxes`` extension:
    ``refs`` carries a fifth (b_pad, 16) box table (cols 0-5
    centre/half-extents, 6-8 albedo, 9 refl, 10 rough, 11 class, 12
    original index) and ``counts`` a third n_boxes entry.  Boxes are
    scanned LAST with strict '<' (they lose exact ties to both earlier
    classes; first original index wins among boxes) and the winner's
    normal is the dominant-axis slab face — exactly
    ops/intersect.hit_boxes + the unrolled kernel's --boxes block
    (pallas_render.py; the reference's own tracers never hit boxes,
    mg_ray_tracer.cpp:89-93 — this is the repo's extension at blockwise
    scale).  The lean carry's kind slot becomes {0 sphere, 1 plane,
    2 box}.

    ``want_record=True`` (lean scan only) appends a per-lane int32 WINNER
    WORD to the return tuple: the winner's table row in bits 0-23, bit 24
    set for a plane winner, bit 25 set on miss.  (All-positive, low-bits
    encoding: the word later rides an f32 state row as a bit pattern, so
    it must stay out of both the subnormal range — TPU flushes
    subnormals to zero — and the NaN range; the carrier adds a bit-30
    exponent tag, see pallas_wavefront.)  This is the one piece of the
    argmin the wavefront backward cannot recompute cheaply — every other
    discrete decision (root choice, degenerate lambert, metal absorb,
    Fresnel coin, TIR) is re-derived in the reverse from the winner
    payload + the counter-hash draws, the slim-stash convention of
    rt_tpu.ops.pallas_grad."""
    f32 = jnp.float32
    sph_ref, pln_ref, aux_ref, seed_ref = refs[:4]
    box_ref = refs[4] if len(refs) > 4 else None
    n_sph, n_pln = counts[:2]
    n_box = counts[2] if len(counts) > 2 else 0
    assert b_pad == 0 or (scan == "lean" and not mxu), \
        "--boxes needs the lean scan"
    ox, oy, oz, dx, dy, dz, tr, tg, tb, live = rays
    shape = (1, _LANES)
    zero = jnp.zeros(shape, f32)
    one = jnp.ones(shape, f32)
    p_block = min(block, p_pad)
    s_block = min(block, s_pad)
    prowi = jax.lax.broadcasted_iota(jnp.int32, (p_block, _LANES), 0)
    prowf = prowi.astype(f32)
    srowi = jax.lax.broadcasted_iota(jnp.int32, (s_block, _LANES), 0)
    srowf = srowi.astype(f32)
    if b_pad:
        b_block = min(block, b_pad)
        browi = jax.lax.broadcasted_iota(jnp.int32, (b_block, _LANES), 0)
        browf = browi.astype(f32)
        # slab-test reciprocals, shared across box blocks (exactly
        # ops/intersect.hit_boxes / the unrolled kernel's clamp)
        binvx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, f32(1e-12))
        binvy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, f32(1e-12))
        binvz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, f32(1e-12))
    _dot = functools.partial(
        jax.lax.dot_general,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    lv = live > 0.0

    # ---- blockwise closest-hit scan ------------------------------------
    # carry: best_t, payload slots, is-plane flag (all f32).
    init = (
        jnp.full(shape, f32(_BIG)),  # 0 best_t
        zero, zero, zero,            # 1-3 sphere centre
        zero, zero, zero,            # 4-6 plane normal
        zero, zero, zero,            # 7-9 albedo rgb
        one, zero, zero,             # 10 refl, 11 rough, 12 cls
        zero,                        # 13 is-plane
    )

    def scan_planes(ib, carry):
        blk = pln_ref[pl.ds(ib * p_block, p_block), :]
        pnx = blk[:, 0:1]
        pny = blk[:, 1:2]
        pnz = blk[:, 2:3]
        pdd = blk[:, 3:4]
        nd = pnx * dx + pny * dy + pnz * dz
        no = pnx * ox + pny * oy + pnz * oz + pdd
        safe = jnp.where(jnp.abs(nd) > 1e-12, nd, f32(1.0))
        t = -no / safe
        valid = (ib * p_block + prowi) < n_pln
        ok = valid & (jnp.abs(nd) > 1e-12) & (t >= _MIN_HIT)
        t = jnp.where(ok, t, f32(_BIG))
        tmin = jnp.min(t, axis=0, keepdims=True)
        winrow = jnp.min(jnp.where(t == tmin, prowf, f32(1e9)),
                         axis=0, keepdims=True)
        msk = ((t == tmin) & (prowf == winrow)).astype(f32)

        best_t = carry[0]
        better = tmin < best_t  # strict: earliest index wins

        def pick(c):
            return jnp.sum(msk * blk[:, c:c + 1], axis=0,
                           keepdims=True)

        new = (
            jnp.where(better, tmin, best_t),
            carry[1], carry[2], carry[3],
            jnp.where(better, pick(0), carry[4]),
            jnp.where(better, pick(1), carry[5]),
            jnp.where(better, pick(2), carry[6]),
            jnp.where(better, pick(4), carry[7]),
            jnp.where(better, pick(5), carry[8]),
            jnp.where(better, pick(6), carry[9]),
            jnp.where(better, pick(7), carry[10]),
            jnp.where(better, pick(8), carry[11]),
            jnp.where(better, pick(9), carry[12]),
            jnp.where(better, one, carry[13]),
        )
        return new

    def scan_spheres(ib, carry):
        blk = sph_ref[pl.ds(ib * s_block, s_block), :]
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
        t = jnp.where(t0 >= _MIN_HIT, t0, t1)
        valid = (ib * s_block + srowi) < n_sph
        ok = valid & (disc >= 0.0) & (t >= _MIN_HIT)
        t = jnp.where(ok, t, f32(_BIG))
        tmin = jnp.min(t, axis=0, keepdims=True)
        winrow = jnp.min(jnp.where(t == tmin, srowf, f32(1e9)),
                         axis=0, keepdims=True)
        msk = ((t == tmin) & (srowf == winrow)).astype(f32)

        best_t = carry[0]
        # spheres win a plane tie, strict '<' among themselves
        better = (tmin < best_t) | (
            (tmin == best_t) & (carry[13] > 0.0) & (tmin < f32(_BIG))
        )

        def pick(c):
            return jnp.sum(msk * blk[:, c:c + 1], axis=0,
                           keepdims=True)

        new = (
            jnp.where(better, tmin, best_t),
            jnp.where(better, pick(0), carry[1]),
            jnp.where(better, pick(1), carry[2]),
            jnp.where(better, pick(2), carry[3]),
            carry[4], carry[5], carry[6],
            jnp.where(better, pick(4), carry[7]),
            jnp.where(better, pick(5), carry[8]),
            jnp.where(better, pick(6), carry[9]),
            jnp.where(better, pick(7), carry[10]),
            jnp.where(better, pick(8), carry[11]),
            jnp.where(better, pick(9), carry[12]),
            jnp.where(better, zero, carry[13]),
        )
        return new

    if mxu:
        # per-bounce ray-side matmul operands (K on sublanes)
        d3 = jnp.concatenate([dx, dy, dz], axis=0)          # (3,L)
        o4s = jnp.concatenate([one, ox, oy, oz], axis=0)    # (4,L)
        o4p = jnp.concatenate([ox, oy, oz, one], axis=0)    # (4,L)
        odot = ox * dx + oy * dy + oz * dz
        onorm = ox * ox + oy * oy + oz * oz

    def scan_planes_mxu(ib, carry):
        blk = pln_ref[:, pl.ds(ib * p_block, p_block)]  # (16, B)
        nd = _dot(blk[0:3], d3, (((0,), (0,)), ((), ())))
        no = _dot(blk[0:4], o4p, (((0,), (0,)), ((), ())))
        safe = jnp.where(jnp.abs(nd) > 1e-12, nd, f32(1.0))
        t = -no / safe
        valid = (ib * p_block + prowi) < n_pln
        ok = valid & (jnp.abs(nd) > 1e-12) & (t >= _MIN_HIT)
        t = jnp.where(ok, t, f32(_BIG))
        tmin = jnp.min(t, axis=0, keepdims=True)
        winrow = jnp.min(jnp.where(t == tmin, prowf, f32(1e9)),
                         axis=0, keepdims=True)
        msk = ((t == tmin) & (prowf == winrow)).astype(f32)
        best_t = carry[0]
        better = tmin < best_t  # strict: earliest index wins
        # winner payload: one-hot contraction on the MXU (exact:
        # f32 values split exactly over the bf16 passes, 0/1
        # mask, f32 accumulate)
        pay = _dot(blk, msk, (((1,), (0,)), ((), ())))  # (16, L)
        new = (
            jnp.where(better, tmin, best_t),
            carry[1], carry[2], carry[3],
            jnp.where(better, pay[0:1], carry[4]),
            jnp.where(better, pay[1:2], carry[5]),
            jnp.where(better, pay[2:3], carry[6]),
            jnp.where(better, pay[4:5], carry[7]),
            jnp.where(better, pay[5:6], carry[8]),
            jnp.where(better, pay[6:7], carry[9]),
            jnp.where(better, pay[7:8], carry[10]),
            jnp.where(better, pay[8:9], carry[11]),
            jnp.where(better, pay[9:10], carry[12]),
            jnp.where(better, one, carry[13]),
        )
        return new

    def scan_spheres_mxu(ib, carry):
        blk = sph_ref[:, pl.ds(ib * s_block, s_block)]  # (16, B)
        # bq = oc.d = o.d - C@D; c0 = |oc|^2 - r^2
        #    = |o|^2 + [cnorm, -2c] @ [1, o]
        cd = _dot(blk[0:3], d3, (((0,), (0,)), ((), ())))
        c0p = _dot(blk[10:14], o4s, (((0,), (0,)), ((), ())))
        bq = odot - cd
        c0 = onorm + c0p
        disc = bq * bq - c0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -bq - sq
        t1 = -bq + sq
        t = jnp.where(t0 >= _MIN_HIT, t0, t1)
        valid = (ib * s_block + srowi) < n_sph
        ok = valid & (disc >= 0.0) & (t >= _MIN_HIT)
        t = jnp.where(ok, t, f32(_BIG))
        tmin = jnp.min(t, axis=0, keepdims=True)
        winrow = jnp.min(jnp.where(t == tmin, srowf, f32(1e9)),
                         axis=0, keepdims=True)
        msk = ((t == tmin) & (srowf == winrow)).astype(f32)
        best_t = carry[0]
        # spheres win a plane tie, strict '<' among themselves
        better = (tmin < best_t) | (
            (tmin == best_t) & (carry[13] > 0.0) & (tmin < f32(_BIG))
        )
        pay = _dot(blk, msk, (((1,), (0,)), ((), ())))  # (16, L)
        new = (
            jnp.where(better, tmin, best_t),
            jnp.where(better, pay[0:1], carry[1]),
            jnp.where(better, pay[1:2], carry[2]),
            jnp.where(better, pay[2:3], carry[3]),
            carry[4], carry[5], carry[6],
            jnp.where(better, pay[4:5], carry[7]),
            jnp.where(better, pay[5:6], carry[8]),
            jnp.where(better, pay[6:7], carry[9]),
            jnp.where(better, pay[7:8], carry[10]),
            jnp.where(better, pay[8:9], carry[11]),
            jnp.where(better, pay[9:10], carry[12]),
            jnp.where(better, zero, carry[13]),
        )
        return new

    # ---- lean-carry scan (scan="lean") ---------------------------------
    # The payload-carry scans above spend ~half their VPU ops on the 10
    # masked `pick()` reductions per block; the lean scan only IDENTIFIES
    # the winner — carry (best_t, winner TABLE row, winner ORIGINAL index,
    # is-plane) — and fetches the payload once afterwards with an exact
    # one-hot contraction (see `extract`).
    lean_init = (jnp.full(shape, f32(_BIG)), zero,
                 jnp.full(shape, f32(_BIG)), zero)

    def lean_planes(ib, carry):
        if mxu:
            blk = pln_ref[:, pl.ds(ib * p_block, p_block)]
            nd = _dot(blk[0:3], d3, (((0,), (0,)), ((), ())))
            no = _dot(blk[0:4], o4p, (((0,), (0,)), ((), ())))
        else:
            blk = pln_ref[pl.ds(ib * p_block, p_block), :]
            pnx = blk[:, 0:1]
            pny = blk[:, 1:2]
            pnz = blk[:, 2:3]
            pdd = blk[:, 3:4]
            nd = pnx * dx + pny * dy + pnz * dz
            no = pnx * ox + pny * oy + pnz * oz + pdd
        safe = jnp.where(jnp.abs(nd) > 1e-12, nd, f32(1.0))
        t = -no / safe
        valid = (ib * p_block + prowi) < n_pln
        ok = valid & (jnp.abs(nd) > 1e-12) & (t >= _MIN_HIT)
        t = jnp.where(ok, t, f32(_BIG))
        tmin = jnp.min(t, axis=0, keepdims=True)
        winrow = jnp.min(jnp.where(t == tmin, prowf, f32(1e9)),
                         axis=0, keepdims=True)
        best_t, browf, bgidxf, isplf = carry
        better = tmin < best_t  # strict: earliest index wins
        gwin = f32(1.0) * ib * p_block + winrow
        return (jnp.where(better, tmin, best_t),
                jnp.where(better, gwin, browf),
                jnp.where(better, gwin, bgidxf),
                jnp.where(better, one, isplf))

    def lean_spheres(ib, carry):
        if mxu:
            blk = sph_ref[:, pl.ds(ib * s_block, s_block)]
            cd = _dot(blk[0:3], d3, (((0,), (0,)), ((), ())))
            c0p = _dot(blk[10:14], o4s, (((0,), (0,)), ((), ())))
            bq = odot - cd
            c0 = onorm + c0p
        else:
            blk = sph_ref[pl.ds(ib * s_block, s_block), :]
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
        t = jnp.where(t0 >= _MIN_HIT, t0, t1)
        valid = (ib * s_block + srowi) < n_sph
        ok = valid & (disc >= 0.0) & (t >= _MIN_HIT)
        t = jnp.where(ok, t, f32(_BIG))
        gcol = blk[14:15].T if mxu else blk[:, 10:11]
        tmin = jnp.min(t, axis=0, keepdims=True)
        # among equal-t rows: the one with the smallest ORIGINAL
        # index wins (original indices are unique, so the mask
        # selects exactly one row)
        wingidx = jnp.min(jnp.where(t == tmin, gcol, f32(1e9)),
                          axis=0, keepdims=True)
        wmsk = ((t == tmin) & (gcol == wingidx)).astype(f32)
        winrow = jnp.sum(wmsk * srowf, axis=0, keepdims=True)
        best_t, browf, bgidxf, isplf = carry
        # spheres win a plane tie; among spheres the smaller
        # original index wins (== the reference's scan order)
        better = (tmin < best_t) | (
            (tmin == best_t) & (tmin < f32(_BIG))
            & ((isplf > 0.0) | (wingidx < bgidxf))
        )
        gwin = f32(1.0) * ib * s_block + winrow
        return (jnp.where(better, tmin, best_t),
                jnp.where(better, gwin, browf),
                jnp.where(better, wingidx, bgidxf),
                jnp.where(better, zero, isplf))

    def lean_boxes(ib, carry):
        blk = box_ref[pl.ds(ib * b_block, b_block), :]
        bcx_ = blk[:, 0:1]
        bcy_ = blk[:, 1:2]
        bcz_ = blk[:, 2:3]
        bex_ = blk[:, 3:4]
        bey_ = blk[:, 4:5]
        bez_ = blk[:, 5:6]
        tax = (bcx_ - bex_ - ox) * binvx
        tbx = (bcx_ + bex_ - ox) * binvx
        tay = (bcy_ - bey_ - oy) * binvy
        tby = (bcy_ + bey_ - oy) * binvy
        taz = (bcz_ - bez_ - oz) * binvz
        tbz = (bcz_ + bez_ - oz) * binvz
        tmn = jnp.maximum(jnp.maximum(jnp.minimum(tax, tbx),
                                      jnp.minimum(tay, tby)),
                          jnp.minimum(taz, tbz))
        tmx = jnp.minimum(jnp.minimum(jnp.maximum(tax, tbx),
                                      jnp.maximum(tay, tby)),
                          jnp.maximum(taz, tbz))
        tt = jnp.where(tmn >= _MIN_HIT, tmn, tmx)
        valid = (ib * b_block + browi) < n_box
        ok = valid & (tmx >= tmn) & (tt >= _MIN_HIT)
        t = jnp.where(ok, tt, f32(_BIG))
        gcol = blk[:, 12:13]
        tmin = jnp.min(t, axis=0, keepdims=True)
        wingidx = jnp.min(jnp.where(t == tmin, gcol, f32(1e9)),
                          axis=0, keepdims=True)
        wmsk = ((t == tmin) & (gcol == wingidx)).astype(f32)
        winrow = jnp.sum(wmsk * browf, axis=0, keepdims=True)
        best_t, brow, bgidxf, kindf = carry
        # boxes are scanned last, strict '<': they lose exact ties to
        # both planes and spheres (ops/intersect.closest_hit "tracer"
        # tie order); first original index wins among boxes
        better = tmin < best_t
        gwin = f32(1.0) * ib * b_block + winrow
        return (jnp.where(better, tmin, best_t),
                jnp.where(better, gwin, brow),
                jnp.where(better, wingidx, bgidxf),
                jnp.where(better, f32(2.0), kindf))

    def lean_seed(carry):
        """Partial scan over the per-block representative subset (see
        _seed_table) — tightens best_t so the grouped cull's t-window
        fires from the first group."""
        blk = seed_ref[...]
        cx = blk[:, 0:1]
        cy = blk[:, 1:2]
        cz = blk[:, 2:3]
        rad = blk[:, 3:4]
        gcol = blk[:, 10:11]
        rowcol = blk[:, 11:12]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        bq = ocx * dx + ocy * dy + ocz * dz
        c0 = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = bq * bq - c0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -bq - sq
        t1 = -bq + sq
        t = jnp.where(t0 >= _MIN_HIT, t0, t1)
        ok = (rad > 0.0) & (disc >= 0.0) & (t >= _MIN_HIT)
        t = jnp.where(ok, t, f32(_BIG))
        tmin = jnp.min(t, axis=0, keepdims=True)
        wingidx = jnp.min(jnp.where(t == tmin, gcol, f32(1e9)),
                          axis=0, keepdims=True)
        wmsk = ((t == tmin) & (gcol == wingidx)).astype(f32)
        winrow = jnp.sum(wmsk * rowcol, axis=0, keepdims=True)
        best_t, browf, bgidxf, isplf = carry
        better = (tmin < best_t) | (
            (tmin == best_t) & (tmin < f32(_BIG))
            & ((isplf > 0.0) | (wingidx < bgidxf))
        )
        return (jnp.where(better, tmin, best_t),
                jnp.where(better, winrow, browf),
                jnp.where(better, wingidx, bgidxf),
                jnp.where(better, zero, isplf))

    def lean_spheres_culled(ig, carry):
        # Grouped block cull: ONE vectorized (G, 128) bounding-
        # sphere ray test + ONE branch covers G Morton-adjacent
        # blocks.  Per-block branches measured ~break-even on
        # v5e (the cond's cross-lane reduce + pipeline bubble
        # costs about what one 128-row block scan costs);
        # amortizing the branch G-ways makes skips profitable.
        arow = aux_ref[pl.ds(ig * cull_group, cull_group), :]
        bcx_ = arow[:, 0:1]
        bcy_ = arow[:, 1:2]
        bcz_ = arow[:, 2:3]
        rB = arow[:, 3:4]
        ocx_, ocy_, ocz_ = bcx_ - ox, bcy_ - oy, bcz_ - oz
        tc = ocx_ * dx + ocy_ * dy + ocz_ * dz
        dist2 = ocx_ * ocx_ + ocy_ * ocy_ + ocz_ * ocz_
        # perp2 = dist2 - tc^2 cancels catastrophically for
        # distant blocks: pad every comparison by a few-ulp
        # margin of its operands so f32 rounding can only make
        # the test MORE permissive (exact-argmin guarantee)
        perp2 = dist2 - tc * tc
        m2 = f32(4e-6) * dist2 + f32(1e-6)
        mt = f32(1e-6) * (jnp.abs(tc) + 1.0)
        best_t = carry[0]
        poss = (lv & (perp2 <= rB * rB + m2)
                & (tc + rB + mt >= f32(_MIN_HIT))
                & (tc - rB - mt <= best_t))

        def scan_group(c, ig=ig):
            for j in range(cull_group):
                c = lean_spheres(ig * cull_group + j, c)
            return c

        return jax.lax.cond(
            jnp.sum(poss.astype(f32)) > 0.0,
            scan_group, lambda c: c, carry)

    n_pblk = (n_pln + p_block - 1) // p_block
    n_sblk = (n_sph + s_block - 1) // s_block
    n_sgrp = (n_sblk + cull_group - 1) // cull_group
    if scan == "lean":
        plane_fn = lean_planes
        sphere_fn = lean_spheres_culled if cull else lean_spheres
    else:
        plane_fn = scan_planes_mxu if mxu else scan_planes
        sphere_fn = scan_spheres_mxu if mxu else scan_spheres

    def extract(rec):
        """Lean carries -> the 14-slot payload tuple, via one
        one-hot contraction per table (exact, see above)."""
        best_t, bidxf, _bgidxf, isplf = rec
        hitb = best_t < f32(1e37)
        if "skip_extract" in dbg:
            # timing knob: pretend the winner fetch is free (wrong values,
            # right shapes/costs elsewhere); arity must track the normal
            # path (replay records append a radius slot below)
            return (best_t, zero, zero, zero, zero, zero, zero,
                    jnp.where(hitb, f32(0.5), zero), zero, zero, one,
                    zero, zero, isplf) + \
                ((zero, zero, zero, one, one, one) if b_pad else ()) + \
                ((zero,) if want_record == "replay" else ())
        # Mosaic iota must be integer-typed; bidx is a small
        # exact integer in f32, so the int cast is lossless
        bidx_i = bidxf.astype(jnp.int32)
        sph_win = hitb & (isplf == 0.0)

        def full_sphere_extract(_):
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (s_pad, _LANES), 0)
            s_oh = ((s_iota == bidx_i) & sph_win).astype(f32)
            if mxu:
                return _dot(sph_ref[...], s_oh, (((1,), (0,)), ((), ())))
            return _dot(sph_ref[...], s_oh, (((0,), (0,)), ((), ())))

        W = extract_window
        if W and s_pad > W and not mxu:
            # Windowed winner fetch: on coherent (sorted) tiles the
            # lane winners cluster in a small table range — one-hot over
            # a dynamically-sliced W-row window instead of the whole
            # table (the full one-hot build + K=s_pad contraction is
            # O(s_pad x 128) per sub-tile per bounce, ~10% of a full
            # scan).  EXACT: the windowed contraction accumulates the
            # identical nonzero terms, and lanes outside the window
            # trigger the full fallback via the cond.
            start_i, rel, all_in = _window_start(sph_win, bidxf, bidx_i,
                                                 s_pad, W)

            def win_extract(_):
                blk = sph_ref[pl.ds(start_i, W), :]
                w_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (W, _LANES), 0)
                s_oh = ((w_iota == rel) & sph_win).astype(f32)
                return _dot(blk, s_oh, (((0,), (0,)), ((), ())))

            s_pay = jax.lax.cond(all_in, win_extract,
                                 full_sphere_extract, None)
        else:
            s_pay = full_sphere_extract(None)
        p_iota = jax.lax.broadcasted_iota(
            jnp.int32, (p_pad, _LANES), 0)
        p_oh = ((p_iota == bidx_i) & (isplf == 1.0)).astype(f32)
        if mxu:
            p_pay = _dot(pln_ref[...], p_oh,
                         (((1,), (0,)), ((), ())))
        else:
            p_pay = _dot(pln_ref[...], p_oh,
                         (((0,), (0,)), ((), ())))
        pick = lambda pay, c: pay[c:c + 1]
        if b_pad:
            b_iota = jax.lax.broadcasted_iota(
                jnp.int32, (b_pad, _LANES), 0)
            b_oh = ((b_iota == bidx_i) & (isplf == 2.0)).astype(f32)
            b_pay = _dot(box_ref[...], b_oh, (((0,), (0,)), ((), ())))
            isbox = isplf == 2.0

            def sel(c):
                v = jnp.where(isplf == 1.0, pick(p_pay, c),
                              pick(s_pay, c))
                # box material columns live at 6-11 (geometry takes 0-5)
                return jnp.where(isbox, pick(b_pay, c + 2), v)

            box_geom = (
                pick(b_pay, 0), pick(b_pay, 1), pick(b_pay, 2),
                # extents clamp mirrors the unrolled kernel (div-safe
                # local coordinates for the face normal)
                jnp.maximum(pick(b_pay, 3), f32(1e-12)),
                jnp.maximum(pick(b_pay, 4), f32(1e-12)),
                jnp.maximum(pick(b_pay, 5), f32(1e-12)),
            )
        else:
            sel = lambda c: jnp.where(isplf > 0.0, pick(p_pay, c),
                                      pick(s_pay, c))
            box_geom = ()
        out = (
            best_t,
            pick(s_pay, 0), pick(s_pay, 1), pick(s_pay, 2),
            pick(p_pay, 0), pick(p_pay, 1), pick(p_pay, 2),
            sel(4), sel(5), sel(6),
            # miss lanes fetch nothing: refl falls to 0, but the
            # payload-carry default is 1 — restore it (eta/r0
            # math divides by refl before the live mask applies)
            jnp.where(hitb, sel(7), one),
            sel(8), sel(9), isplf,
        ) + box_geom
        if want_record == "replay":
            # the replay records need the winner's near-root flag, which
            # needs the sphere radius the lean extract otherwise drops
            out = out + (pick(s_pay, 3),)
        return out

    assert not want_record or scan == "lean", \
        "winner-word records need the lean scan's winner-row carry"

    n_bblk = ((n_box + b_block - 1) // b_block) if b_pad else 0

    def do_scan(_):
        rec = jax.lax.fori_loop(0, n_pblk, plane_fn,
                                lean_init if scan == "lean"
                                else init)
        if cull:
            rec = lean_seed(rec)
        rec = jax.lax.fori_loop(0, n_sgrp if cull else n_sblk,
                                sphere_fn, rec)
        if b_pad:
            rec = jax.lax.fori_loop(0, n_bblk, lean_boxes, rec)
        if scan != "lean":
            return rec
        out = extract(rec)
        return out + (rec[1],) if want_record else out

    skip_val = init
    if b_pad:
        skip_val = skip_val + (zero, zero, zero, one, one, one)
    if want_record == "replay":
        skip_val = skip_val + (zero,)   # radius
    if want_record:
        skip_val = skip_val + (zero,)   # winner row
    if skip_cond:
        # dead-tile early-out: when every ray in the tile has
        # terminated, the O(N) scan is skipped (init -> miss,
        # and the sky/throughput math is masked by `lv` anyway).
        any_live = jnp.sum(live) > 0.0
        hitrec = jax.lax.cond(any_live, do_scan,
                              lambda _: skip_val, None)
    else:
        hitrec = do_scan(None)

    (best_t, bcx, bcy, bcz, bpnx, bpny, bpnz,
     bar, bag, bab, brf, brg, bcl, bpl) = hitrec[:14]

    hit = best_t < f32(1e37)

    # sky on miss (mg_ray_tracer.cpp:164)
    ts_ = 0.5 * (dy + 1.0)
    mf = (lv & ~hit).astype(f32)
    contrib = (mf * tr * (1.0 - 0.5 * ts_),
               mf * tg * (1.0 - 0.3 * ts_),
               mf * tb)

    live_h = lv & hit
    t_safe = jnp.where(hit, best_t, 0.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz

    snx, sny, snz = hx - bcx, hy - bcy, hz - bcz
    sinv = jax.lax.rsqrt(
        jnp.maximum(snx * snx + sny * sny + snz * snz, 1e-30))
    ispl = bpl == 1.0
    nx = jnp.where(ispl, bpnx, snx * sinv)
    ny = jnp.where(ispl, bpny, sny * sinv)
    nz = jnp.where(ispl, bpnz, snz * sinv)
    if b_pad:
        # outward slab-face normal: sign of the dominant component of
        # the extent-scaled local hit position (first axis wins a tie —
        # jnp argmax semantics; pallas_render's --boxes block)
        (bbcx, bbcy, bbcz, bbex, bbey, bbez) = hitrec[14:20]
        isbx = bpl == 2.0
        blx = (hx - bbcx) / bbex
        bly = (hy - bbcy) / bbey
        blz = (hz - bbcz) / bbez
        axx = jnp.abs(blx)
        axy = jnp.abs(bly)
        axz = jnp.abs(blz)
        is_x = (axx >= axy) & (axx >= axz)
        is_y = (~is_x) & (axy >= axz)
        is_z = ~(is_x | is_y)
        bnx = jnp.where(is_x, jnp.sign(blx), 0.0)
        bny = jnp.where(is_y, jnp.sign(bly), 0.0)
        bnz = jnp.where(is_z, jnp.sign(blz), 0.0)
        nx = jnp.where(isbx, bnx, nx)
        ny = jnp.where(isbx, bny, ny)
        nz = jnp.where(isbx, bnz, nz)

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

    # lambert (mg_ray_tracer.cpp:109-123)
    lx, ly, lz = nx + ux, ny + uy, nz + uz
    ln2 = lx * lx + ly * ly + lz * lz
    ldeg = ln2 < 1e-16
    linv = jax.lax.rsqrt(jnp.where(ldeg, 1.0, ln2))
    lx = jnp.where(ldeg, nx, lx * linv)
    ly = jnp.where(ldeg, ny, ly * linv)
    lz = jnp.where(ldeg, nz, lz * linv)

    # metal (mg_ray_tracer.cpp:125-140)
    dd = dx * nx + dy * ny + dz * nz
    rx = dx - 2.0 * dd * nx
    ry = dy - 2.0 * dd * ny
    rz = dz - 2.0 * dd * nz
    mx = rx + brg * ux
    my = ry + brg * uy
    mz = rz + brg * uz
    mabs = (mx * nx + my * ny + mz * nz) <= 0.0
    minv = jax.lax.rsqrt(
        jnp.maximum(mx * mx + my * my + mz * mz, 1e-30))
    mx, my, mz = mx * minv, my * minv, mz * minv

    # dielectric (sm_ray_tracer.cpp:181-219)
    inside = dd > 0.0
    sgn = jnp.where(inside, f32(-1.0), f32(1.0))
    onx, ony, onz = sgn * nx, sgn * ny, sgn * nz
    eta = jnp.where(inside, brf, 1.0 / jnp.maximum(brf, 1e-12))
    cosine = jnp.where(inside, brf * dd, -dd)
    cos_i = -(dx * onx + dy * ony + dz * onz)
    sin2 = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2 > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
    fxx = eta * dx + (eta * cos_i - cos_t) * onx
    fyy = eta * dy + (eta * cos_i - cos_t) * ony
    fzz = eta * dz + (eta * cos_i - cos_t) * onz
    r0 = (1.0 - brf) / (1.0 + brf)
    r0 = r0 * r0
    omc = 1.0 - cosine
    omc2 = omc * omc
    prob = jnp.where(tir, 1.0, r0 + (1.0 - r0) * omc2 * omc2 * omc)
    refl_bit = coin < prob
    gx = jnp.where(refl_bit, rx, fxx)
    gy = jnp.where(refl_bit, ry, fyy)
    gz = jnp.where(refl_bit, rz, fzz)
    ginv = jax.lax.rsqrt(
        jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
    gx, gy, gz = gx * ginv, gy * ginv, gz * ginv

    is_met = bcl == 1.0
    is_die = bcl == 2.0
    ndx = jnp.where(is_met, mx, lx)
    ndy = jnp.where(is_met, my, ly)
    ndz = jnp.where(is_met, mz, lz)
    ndx = jnp.where(is_die, gx, ndx)
    ndy = jnp.where(is_die, gy, ndy)
    ndz = jnp.where(is_die, gz, ndz)

    alive = live_h & ~(is_met & mabs)
    af = alive.astype(f32)
    naf = 1.0 - af
    tr = tr * (naf + af * bar * brf)
    tg = tg * (naf + af * bag * brf)
    tb = tb * (naf + af * bab * brf)

    lh = live_h.astype(f32)
    nlh = 1.0 - lh
    ox0r, oy0r, oz0r = ox, oy, oz   # pre-bounce ray (record root recompute)
    dx0r, dy0r, dz0r = dx, dy, dz
    ox = nlh * ox + lh * hx
    oy = nlh * oy + lh * hy
    oz = nlh * oz + lh * hz
    dx = nlh * dx + lh * ndx
    dy = nlh * dy + lh * ndy
    dz = nlh * dz + lh * ndz
    if want_record == "replay":
        # full replay-record set (rt_tpu.replay.PathRecords layout — the
        # render_record_pallas bit packing, records_to_flat decodes it)
        winrow = hitrec[-1]
        radw = hitrec[-2]
        # near-root flag of the sphere winner (recomputed from the
        # extracted payload; replay reads it only for kind==1)
        r_ocx, r_ocy, r_ocz = ox0r - bcx, oy0r - bcy, oz0r - bcz
        r_bq = r_ocx * dx0r + r_ocy * dy0r + r_ocz * dz0r
        r_c0 = (r_ocx * r_ocx + r_ocy * r_ocy + r_ocz * r_ocz
                - radw * radw)
        r_disc = r_bq * r_bq - r_c0
        r_t0 = -r_bq - jnp.sqrt(jnp.maximum(r_disc, 0.0))
        root_f = (r_t0 >= f32(_MIN_HIT)).astype(f32)
        kindv = jnp.where(
            hit, jnp.where(bpl == 1.0, f32(2.0),
                           jnp.where(bpl == 2.0, f32(3.0), f32(1.0))),
            f32(0.0))
        bits_f = (root_f
                  + 2.0 * refl_bit.astype(f32)
                  + 4.0 * ldeg.astype(f32)
                  + 8.0 * (lv & ~hit).astype(f32)
                  + 16.0 * lv.astype(f32)
                  + 32.0 * af)
        return (contrib, (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), af,
                (kindv, winrow, bits_f, ux, uy, uz, coin))
    if want_record:
        winrow = hitrec[-1]
        rec_word = jnp.where(
            hit,
            winrow.astype(jnp.int32)
            | jnp.where(bpl == 1.0, jnp.int32(1 << 24), jnp.int32(0))
            | jnp.where(bpl == 2.0, jnp.int32(1 << 26), jnp.int32(0)),
            jnp.int32(1 << 25))
        return (contrib, (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), af,
                rec_word)
    return contrib, (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), af


def _make_blockwise_kernel(*, width, height, s_pad, p_pad, spp_unroll,
                           max_bounces, rng_mode, rng_impl, center_sample,
                           block=_BLOCK, mxu=False, scan="payload",
                           cull=False, cull_group=4, b_pad=0):
    """Kernel body.  Refs: meta (SMEM scalars: seed, sphere count, plane
    count), cam (SMEM scalars), sphere table (s_pad, 16) VMEM — or
    transposed (16, s_pad) when ``mxu`` — plane table likewise, [aux block
    bounds (nb_pad, 128) VMEM when ``cull``], out (1, 3, 128) VMEM block.

    ``cull=True`` (lean scan only): before intersecting a sphere block, a
    per-lane ray test against the block's bounding sphere (aux table, see
    :func:`_block_bounds`) decides whether ANY live lane could still beat
    its running best inside this block; if not, the whole (block, 16) load +
    intersection is skipped via lax.cond.  The test is conservative with
    non-strict comparisons, so the surviving argmin (incl. the
    spheres-beat-planes tie rule) is bit-exact vs the unculled scan: any
    sphere hit at parameter t satisfies |t - tc| <= R_B and perp^2 <= R_B^2
    for the block bound, so blocks failing (perp^2 <= R^2) & (tc + R >=
    MIN_HIT) & (tc - R <= best_t) on every live lane cannot contribute."""
    f32 = jnp.float32
    shape = (1, _LANES)
    assert not cull or (scan == "lean" and not mxu)
    # the grouped scan addresses blocks [ig*G, ig*G+G): the physical block
    # count must divide evenly so the tail group stays in bounds (tail
    # VALIDITY is handled by the per-row count mask; this is about reads)
    assert not cull or (s_pad // block) % cull_group == 0
    _dot = functools.partial(
        jax.lax.dot_general,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    def kernel(meta_ref, cam_ref, sph_ref, pln_ref, *rest):
        if b_pad:
            box_ref, rest = rest[0], rest[1:]
        else:
            box_ref = None
        if cull:
            aux_ref, seed_ref, out_ref = rest
        else:
            (out_ref,) = rest
        # meta[3] is a tile offset: under the sharded entry point each
        # device owns a contiguous tile range, so ids stay globally unique
        # (per-shard RNG streams, SURVEY.md §2 parallelism table).
        tile = pl.program_id(0) + meta_ref[3]
        seed = meta_ref[0]
        n_sph = meta_ref[1]
        n_pln = meta_ref[2]
        if rng_impl == "hw":
            pltpu.prng_seed(seed + tile * jnp.int32(1000003))

        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        idx = tile * _LANES + lane
        px = (idx % width).astype(f32)
        py = (idx // width).astype(f32)

        draw_ctr = [0]

        def u01():
            if rng_impl == "hw":
                return _hw_u01(shape)
            draw_ctr[0] += 1
            return _hash_u01(idx, seed + tile * jnp.int32(0), draw_ctr[0], shape)

        cpx, cpy, cpz = cam_ref[0], cam_ref[1], cam_ref[2]
        r = [cam_ref[3 + i] for i in range(9)]
        tan_half, aspect, near = cam_ref[12], cam_ref[13], cam_ref[14]

        zero = jnp.zeros(shape, f32)
        one = jnp.ones(shape, f32)
        p_block = min(block, p_pad)
        s_block = min(block, s_pad)
        prowi = jax.lax.broadcasted_iota(jnp.int32, (p_block, _LANES), 0)
        prowf = prowi.astype(f32)
        srowi = jax.lax.broadcasted_iota(jnp.int32, (s_block, _LANES), 0)
        srowf = srowi.astype(f32)

        acc = [zero, zero, zero]

        for smp in range(spp_unroll):
            # sample 0 at the pixel centre (mg_ray_tracer.cpp:189)
            u = u01()
            v = u01()
            if smp == 0 and center_sample:
                jx = jnp.full(shape, f32(0.5))
                jy = jnp.full(shape, f32(0.5))
            else:
                jx, jy = u, v

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
            dx, dy, dz = dwx * inv, dwy * inv, dwz * inv

            tr = one
            tg = one
            tb = one
            live = one

            for b in range(max_bounces):
                contrib, (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), live = \
                    _bounce_once(
                        (sph_ref, pln_ref,
                         aux_ref if cull else None,
                         seed_ref if cull else None,
                         box_ref),
                        (n_sph, n_pln,
                         meta_ref[4] if b_pad else 0),
                        (ox, oy, oz, dx, dy, dz, tr, tg, tb, live),
                        u01,
                        s_pad=s_pad, p_pad=p_pad, block=block, scan=scan,
                        mxu=mxu, cull=cull, cull_group=cull_group,
                        rng_mode=rng_mode, skip_cond=(b > 0),
                        b_pad=b_pad)
                acc[0] += contrib[0]
                acc[1] += contrib[1]
                acc[2] += contrib[2]

        out_ref[0, 0] = acc[0]
        out_ref[0, 1] = acc[1]
        out_ref[0, 2] = acc[2]

    return kernel


@functools.lru_cache(maxsize=32)
def _compiled_bw(*, width, height, s_pad, p_pad, spp_unroll, max_bounces,
                 rng_mode, rng_impl, center_sample, interpret, block=_BLOCK,
                 n_tiles=None, mxu=False, scan="payload", cull=False,
                 cull_group=4, b_pad=0):
    kernel = _make_blockwise_kernel(
        width=width, height=height, s_pad=s_pad, p_pad=p_pad,
        spp_unroll=spp_unroll, max_bounces=max_bounces, rng_mode=rng_mode,
        rng_impl=rng_impl, center_sample=center_sample, block=block, mxu=mxu,
        scan=scan, cull=cull, cull_group=cull_group, b_pad=b_pad,
    )
    if n_tiles is None:
        n = width * height
        n_tiles = -(-n // _LANES)
    s_spec = (_COLS, s_pad) if mxu else (s_pad, _COLS)
    p_spec = (_COLS, p_pad) if mxu else (p_pad, _COLS)
    in_specs = [
        pl.BlockSpec(s_spec, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(p_spec, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if b_pad:
        in_specs.append(pl.BlockSpec((b_pad, _COLS), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
    if cull:
        nb_pad = -(-(s_pad // block) // 8) * 8
        in_specs.append(pl.BlockSpec((nb_pad, 128), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((128, _COLS), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 3, 1, _LANES),
                                   lambda i, *_: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3, 1, _LANES), jnp.float32),
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=32)
def _compiled_frame_bw(*, width, height, s_pad, p_pad, spp, spp_unroll,
                       max_bounces, rng_mode, rng_impl, gamma, center_first,
                       interpret, block=_BLOCK, mxu=False, scan="payload",
                       cull=False, cull_group=4, b_pad=0):
    """Jitted frame: chained sample-chunk kernels + mean + gamma + crop in
    ONE dispatch; primitive tables and camera are traced inputs."""
    chunk_sizes = []
    remaining = spp
    while remaining > 0:
        k = min(spp_unroll, remaining)
        chunk_sizes.append(k)
        remaining -= k
    calls = [
        _compiled_bw(width=width, height=height, s_pad=s_pad, p_pad=p_pad,
                     spp_unroll=k, max_bounces=max_bounces, rng_mode=rng_mode,
                     rng_impl=rng_impl,
                     center_sample=(i == 0 and center_first),
                     interpret=interpret, block=block, mxu=mxu, scan=scan,
                     cull=cull, cull_group=cull_group, b_pad=b_pad)
        for i, k in enumerate(chunk_sizes)
    ]
    n = width * height

    @jax.jit
    def run(meta_rows, cam, s_tab, p_tab, *btab):
        aux = ((_block_bounds(s_tab, block),
                _seed_table(s_tab, block)) if cull else ())
        total = None
        for ci, call in enumerate(calls):
            out = call(meta_rows[ci], cam, s_tab, p_tab, *btab, *aux)
            total = out if total is None else total + out
        img = total[:, :, 0, :] * jnp.float32(1.0 / spp)
        if gamma:
            img = jnp.sqrt(jnp.maximum(img, 0.0))
        flat = img.transpose(0, 2, 1).reshape(-1, 3)
        return flat[:n].reshape(height, width, 3)

    return run, len(chunk_sizes)


def render_forward_blockwise(
    scene,
    size: tuple[int, int],
    seed: int = 0,
    *,
    personality: str = "mg",
    spp: Optional[int] = None,
    max_bounces: Optional[int] = None,
    spp_unroll: int = 4,
    gamma: bool = True,
    rng_mode: str = "reference",
    rng_impl: str = "hw",
    center_sample: Optional[bool] = None,
    interpret: bool = False,
    block: Optional[int] = None,
    mxu: Optional[bool] = None,
    scan: Optional[str] = None,
    cull: Optional[bool] = None,
    order: Optional[str] = None,
    include_boxes: bool = False,
    **_unused,
) -> jax.Array:
    """Render a full frame with the blockwise megakernel.  (H, W, 3) f32.

    Unlike :func:`rt_tpu.ops.pallas_render.render_forward_pallas`, scene
    content (geometry, materials, camera, personality) is a runtime input:
    the compiled kernel is reused across scene edits as long as the padded
    table bucket, image size and bounce count are unchanged.
    """
    if not blockwise_supported(scene, include_boxes):
        raise ValueError(
            "scene exceeds the blockwise megakernel limits "
            f"({MAX_BLOCKWISE_PRIMS} primitives)"
        )
    w, h = size
    if spp is None:
        spp = scene.samples_per_pixel
    if max_bounces is None:
        max_bounces = scene.max_bounces
    spp_unroll = min(spp_unroll, spp)

    boxes_on = include_boxes and scene.boxes.count > 0
    if boxes_on:
        # the --boxes slab scan lives in the lean path only
        if mxu:
            raise ValueError("--boxes is lean-scan only (no MXU variant)")
        scan = "lean"
    s_cols, p_cols = _flatten_primitives(scene, personality)
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    if block is None:
        # bigger blocks amortize the per-block argmin/extract overhead and
        # shorten the serial fori_loop chain: measured on v5e, 500-sphere
        # 800x600@8spp runs 13.2 (block=8) -> 40.4 (32) -> 56.6 (64) ->
        # 66.7 Mrays/s (128).  Small tables stay at one (8,128) f32 tile.
        block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    if mxu is None:
        mxu = False  # measured slower than the VPU scan on v5e (see module doc)
    if scan is None:
        # lean carries measured 1.25-1.46x the payload scan on v5e (500/5000
        # spheres) and are bit-exact against it on device — default
        scan = "lean" if not mxu else "payload"
    if cull is None:
        # Exact-argmin-preserving block culling (see _make_blockwise_kernel)
        # is a MILD win only for multi-thousand-sphere tables: measured on
        # v5e-1 (Morton-sorted, per-block bounds, grouped 4-block branches,
        # seeded best_t) it is 1.06x on the 5000-sphere slice and a LOSS
        # below (~0.9x at 500 spheres).  The root cause is structural, not
        # an implementation gap: a grid step owns 128 rays, and after the
        # first diffuse bounce their directions span the hemisphere — the
        # union of 128 divergent rays needs 7-9 of 10 block groups even
        # when tested against the FINAL per-lane best_t (numpy replay of
        # the exact kernel test), so there is nothing left to skip.  The
        # reference semantics (linear scan, no acceleration structure,
        # mg_ray_tracer.cpp:43-52) and SIMD tiles cap what tile-level
        # bounds can give; recorded deliberately as a negative result.
        # (_seed_table/_block_bounds are sized for <=128 blocks, so an
        # explicitly small ``block`` with a big table opts out.)
        cull = (scan == "lean" and not mxu and s_pad >= 2048
                and s_pad // block <= 128)
    if order is None:
        # spatial sort is what gives the cull teeth (see _morton_perm);
        # winner parity is preserved via the original-index tie-break
        order = "morton" if (cull and scene.spheres.count > 1) else "index"
    if mxu:
        s_tab = jnp.asarray(_padded_table_mxu(s_cols, s_pad, "sphere"))
        p_tab = jnp.asarray(_padded_table_mxu(p_cols, p_pad, "plane"))
    else:
        gidx = None
        if order == "morton":
            assert scan == "lean", "sorted tables need the lean scan"
            perm = _morton_perm(s_cols)
            s_cols = s_cols[:, perm]
            gidx = perm
        s_tab = jnp.asarray(_padded_table(s_cols, s_pad, gidx))
        p_tab = jnp.asarray(_padded_table(p_cols, p_pad))

    b_pad, btab = _box_inputs(scene, personality, boxes_on)

    run, n_chunks = _compiled_frame_bw(
        width=w, height=h, s_pad=s_pad, p_pad=p_pad, spp=spp,
        spp_unroll=spp_unroll, max_bounces=max_bounces, rng_mode=rng_mode,
        rng_impl=rng_impl, gamma=gamma,
        center_first=(True if center_sample is None else center_sample),
        interpret=interpret, block=block, mxu=mxu, scan=scan, cull=cull,
        cull_group=_auto_cull_group(s_pad, block), b_pad=b_pad,
    )

    cam = jnp.concatenate([
        jnp.asarray(scene.camera.position, jnp.float32),
        jnp.asarray(scene.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(scene.camera.vfov * 0.5), w / h, scene.camera.near, 0.0
        ], jnp.float32),
    ])
    metas = _meta_rows(scene, seed, n_chunks)
    return run(metas, cam, s_tab, p_tab, *btab)


def _meta_rows(scene, seed: int, n_chunks: int) -> jnp.ndarray:
    """(n_chunks, 5) int32 SMEM rows: [seed, n_spheres, n_planes,
    tile_off, n_boxes]."""
    metas = []
    chunk_seed = seed
    for _ in range(n_chunks):
        metas.append([chunk_seed, scene.spheres.count, scene.planes.count,
                      0, scene.boxes.count])
        chunk_seed = int((chunk_seed * 1103515245 + 12345) % (2**31 - 1))
    return jnp.asarray(metas, jnp.int32)


def render_forward_blockwise_sharded(
    scene,
    size: tuple[int, int],
    mesh,
    seed: int = 0,
    *,
    axis: str = "rays",
    personality: str = "mg",
    spp: Optional[int] = None,
    max_bounces: Optional[int] = None,
    spp_unroll: int = 4,
    gamma: bool = True,
    rng_mode: str = "reference",
    rng_impl: str = "hw",
    center_sample: Optional[bool] = None,
    interpret: bool = False,
    block: Optional[int] = None,
    mxu: Optional[bool] = None,
    scan: Optional[str] = None,
    cull: Optional[bool] = None,
    order: Optional[str] = None,
    **_unused,
) -> jax.Array:
    """Blockwise megakernel frame sharded over ``mesh[axis]`` (H, W, 3) f32.

    Ray tiles are split into contiguous per-device ranges (the TPU-native
    replacement for ``thread_pool::for_range`` over pixels,
    mg_ray_tracer.cpp:203-204); primitive tables and camera are replicated.
    Each shard's kernel sees a ``tile_offset`` so pixel ids and PRNG streams
    stay globally unique, and the framebuffer is assembled by the out-spec
    all-gather (the back_buffer::flush analogue, back_buffer.cpp:40-50).
    """
    from ..dist import _SMAP_NOCHECK, shard_map
    from jax.sharding import PartitionSpec as P

    if not blockwise_supported(scene):
        raise ValueError(
            "scene exceeds the blockwise megakernel limits "
            f"({MAX_BLOCKWISE_PRIMS} primitives, no boxes) — use the jnp path"
        )
    w, h = size
    if spp is None:
        spp = scene.samples_per_pixel
    if max_bounces is None:
        max_bounces = scene.max_bounces
    spp_unroll = min(spp_unroll, spp)

    s_cols, p_cols = _flatten_primitives(scene, personality)
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    if block is None:
        block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    if mxu is None:
        mxu = False
    if scan is None:
        scan = "lean" if not mxu else "payload"
    if cull is None:
        cull = (scan == "lean" and not mxu and s_pad >= 2048
                and s_pad // block <= 128)  # see above
    if order is None:
        order = "morton" if (cull and scene.spheres.count > 1) else "index"
    if mxu:
        s_tab = jnp.asarray(_padded_table_mxu(s_cols, s_pad, "sphere"))
        p_tab = jnp.asarray(_padded_table_mxu(p_cols, p_pad, "plane"))
    else:
        gidx = None
        if order == "morton":
            assert scan == "lean", "sorted tables need the lean scan"
            perm = _morton_perm(s_cols)
            s_cols = s_cols[:, perm]
            gidx = perm
        s_tab = jnp.asarray(_padded_table(s_cols, s_pad, gidx))
        p_tab = jnp.asarray(_padded_table(p_cols, p_pad))

    n_dev = mesh.shape[axis]
    n = w * h
    n_tiles = -(-n // _LANES)
    local_tiles = -(-n_tiles // n_dev)

    chunk_sizes = []
    remaining = spp
    while remaining > 0:
        k = min(spp_unroll, remaining)
        chunk_sizes.append(k)
        remaining -= k
    center_first = True if center_sample is None else center_sample
    calls = [
        _compiled_bw(width=w, height=h, s_pad=s_pad, p_pad=p_pad,
                     spp_unroll=k, max_bounces=max_bounces, rng_mode=rng_mode,
                     rng_impl=rng_impl,
                     center_sample=(i == 0 and center_first),
                     interpret=interpret, block=block, n_tiles=local_tiles,
                     mxu=mxu, scan=scan, cull=cull,
                     cull_group=_auto_cull_group(s_pad, block))
        for i, k in enumerate(chunk_sizes)
    ]

    def shard_fn(meta_rows, cam_, s_tab_, p_tab_):
        off = jax.lax.axis_index(axis).astype(jnp.int32) * local_tiles
        meta_rows = meta_rows.at[:, 3].add(off)
        aux = ((_block_bounds(s_tab_, block),
                _seed_table(s_tab_, block)) if cull else ())
        total = None
        for ci, call in enumerate(calls):
            out = call(meta_rows[ci], cam_, s_tab_, p_tab_, *aux)
            total = out if total is None else total + out
        return total

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(axis),
        **_SMAP_NOCHECK,
    )

    @functools.partial(jax.jit, static_argnames=())
    def run(meta_rows, cam_, s_tab_, p_tab_):
        total = sharded(meta_rows, cam_, s_tab_, p_tab_)
        img = total[:, :, 0, :] * jnp.float32(1.0 / spp)
        if gamma:
            img = jnp.sqrt(jnp.maximum(img, 0.0))
        flat = img.transpose(0, 2, 1).reshape(-1, 3)
        return flat[:n].reshape(h, w, 3)

    cam = jnp.concatenate([
        jnp.asarray(scene.camera.position, jnp.float32),
        jnp.asarray(scene.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(scene.camera.vfov * 0.5), w / h, scene.camera.near, 0.0
        ], jnp.float32),
    ])
    metas = _meta_rows(scene, seed, len(chunk_sizes))
    return run(metas, cam, s_tab, p_tab)


# ---------------------------------------------------------------------------
# replay-record pass (runtime tables): big-scene records for rt_tpu.replay
# ---------------------------------------------------------------------------

def _make_bw_record_kernel(*, width, height, s_pad, p_pad, max_bounces,
                           rng_mode, rng_impl, center_sample, block,
                           b_pad=0):
    """One sample per pixel through the blockwise scan, emitting the
    replay residuals (the render_record_pallas record set — kind/idx/
    bits/u/coin/jitter, pallas_render.py:182-215 layout) with RUNTIME
    primitive tables: record passes for scenes beyond the unrolled
    kernel's 640-primitive cap, incl. the --boxes extension (kind=3)."""
    f32 = jnp.float32
    shape = (1, _LANES)

    def kernel(meta_ref, cam_ref, sph_ref, pln_ref, *rest):
        if b_pad:
            box_ref, rest = rest[0], rest[1:]
        else:
            box_ref = None
        (rad_ref, kind_ref, idx_ref, bits_ref,
         urx_ref, ury_ref, urz_ref, coin_ref, jit_ref) = rest
        tile = pl.program_id(0) + meta_ref[3]
        seed = meta_ref[0]
        n_sph = meta_ref[1]
        n_pln = meta_ref[2]
        if rng_impl == "hw":
            pltpu.prng_seed(seed + tile * jnp.int32(1000003))

        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        idx = tile * _LANES + lane
        px = (idx % width).astype(f32)
        py = (idx // width).astype(f32)
        draw_ctr = [0]

        def u01():
            if rng_impl == "hw":
                return _hw_u01(shape)
            draw_ctr[0] += 1
            return _hash_u01(idx, seed, draw_ctr[0], shape)

        cpx, cpy, cpz = cam_ref[0], cam_ref[1], cam_ref[2]
        r = [cam_ref[3 + i] for i in range(9)]
        tan_half, aspect, near = cam_ref[12], cam_ref[13], cam_ref[14]
        one = jnp.ones(shape, f32)
        zero = jnp.zeros(shape, f32)

        u = u01()
        v = u01()
        if center_sample:
            jx = jnp.full(shape, f32(0.5))
            jy = jnp.full(shape, f32(0.5))
        else:
            jx, jy = u, v
        jit_ref[0, 0] = jx
        jit_ref[0, 1] = jy

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
        dx, dy, dz = dwx * inv, dwy * inv, dwz * inv
        tr = one
        tg = one
        tb = one
        live = one
        acc = [zero, zero, zero]

        for b in range(max_bounces):
            out = _bounce_once(
                (sph_ref, pln_ref, None, None, box_ref),
                (n_sph, n_pln, meta_ref[4] if b_pad else 0),
                (ox, oy, oz, dx, dy, dz, tr, tg, tb, live),
                u01,
                s_pad=s_pad, p_pad=p_pad, block=block, scan="lean",
                mxu=False, cull=False, cull_group=1, rng_mode=rng_mode,
                skip_cond=(b > 0), want_record="replay", b_pad=b_pad)
            (contrib, (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), live,
             rec) = out
            kindv, idxw, bits_f, ux, uy, uz, coin = rec
            acc = [acc[c] + contrib[c] for c in range(3)]
            kind_ref[0, b] = kindv
            idx_ref[0, b] = idxw
            bits_ref[0, b] = bits_f
            urx_ref[0, b] = ux
            ury_ref[0, b] = uy
            urz_ref[0, b] = uz
            coin_ref[0, b] = coin

        rad_ref[0, 0] = acc[0]
        rad_ref[0, 1] = acc[1]
        rad_ref[0, 2] = acc[2]

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_bw_record(*, width, height, s_pad, p_pad, max_bounces,
                        rng_mode, rng_impl, center_sample, interpret,
                        block=_BLOCK, b_pad=0):
    kernel = _make_bw_record_kernel(
        width=width, height=height, s_pad=s_pad, p_pad=p_pad,
        max_bounces=max_bounces, rng_mode=rng_mode, rng_impl=rng_impl,
        center_sample=center_sample, block=block, b_pad=b_pad,
    )
    n = width * height
    n_tiles = -(-n // _LANES)
    B = max_bounces
    in_specs = [
        pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if b_pad:
        in_specs.append(pl.BlockSpec((b_pad, _COLS), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))

    def blk(ch):
        return pl.BlockSpec((1, ch, 1, _LANES), lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def shp(ch):
        return jax.ShapeDtypeStruct((n_tiles, ch, 1, _LANES), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=(blk(3),) + (blk(B),) * 7 + (blk(2),),
        ),
        out_shape=(shp(3),) + (shp(B),) * 7 + (shp(2),),
        interpret=interpret,
    )
    return call


def render_record_blockwise(
    scene,
    size: tuple[int, int],
    seed: int,
    *,
    personality: str = "mg",
    max_bounces: Optional[int] = None,
    rng_mode: str = "reference",
    center_sample: bool = True,
    rng_impl: str = "hw",
    interpret: bool = False,
    include_boxes: bool = False,
):
    """Blockwise twin of pallas_render.render_record_pallas: one sample
    per pixel, replay records out, RUNTIME tables in — the record pass
    for scenes past the unrolled kernel's cap (and the --boxes extension
    at blockwise scale).  Returns (radiance, records_dict) in the same
    (n_tiles, CH, 1, 128) layout records_to_flat consumes."""
    if not blockwise_supported(scene, include_boxes):
        raise ValueError("scene exceeds the blockwise megakernel limits")
    w, h = size
    if max_bounces is None:
        max_bounces = scene.max_bounces
    boxes_on = include_boxes and scene.boxes.count > 0
    s_cols, p_cols = _flatten_primitives(scene, personality)
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    s_tab = jnp.asarray(_padded_table(s_cols, s_pad))
    p_tab = jnp.asarray(_padded_table(p_cols, p_pad))
    b_pad, btab = _box_inputs(scene, personality, boxes_on)
    call = _compiled_bw_record(
        width=w, height=h, s_pad=s_pad, p_pad=p_pad,
        max_bounces=max_bounces, rng_mode=rng_mode, rng_impl=rng_impl,
        center_sample=center_sample, interpret=interpret, block=block,
        b_pad=b_pad,
    )
    cam = jnp.concatenate([
        jnp.asarray(scene.camera.position, jnp.float32),
        jnp.asarray(scene.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(scene.camera.vfov * 0.5), w / h, scene.camera.near, 0.0
        ], jnp.float32),
    ])
    meta = jnp.asarray([seed, scene.spheres.count, scene.planes.count,
                        0, scene.boxes.count], jnp.int32)
    out = call(meta, cam, s_tab, p_tab, *btab)
    rad, kind, idx, bits, urx, ury, urz, coin, jit = out
    return rad, {
        "kind": kind, "idx": idx, "bits": bits,
        "urx": urx, "ury": ury, "urz": urz, "coin": coin, "jitter": jit,
    }
