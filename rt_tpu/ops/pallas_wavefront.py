"""Bounce-major wavefront megakernel: ray compaction + coherence sorting.

The pixel-major blockwise kernel (rt_tpu.ops.pallas_blockwise) owns 128
FIXED rays per grid step for the whole bounce chain, which leaves two
structural inefficiencies on big scenes (measured, round 3):

* **dead lanes**: a tile runs the full O(N-primitives) scan until its LAST
  ray dies — with 8-bounce paths and ~50%/bounce termination most lanes in
  most tiles are dead for most bounces (the tile-level early-out only fires
  when all 128 die);
* **divergence**: after one diffuse bounce the 128 rays of a tile span the
  whole hemisphere, so the conservative per-block bounding-sphere cull has
  nothing to skip (the round-3 negative result: 1.06x — see
  pallas_blockwise.py, "tile culling is a proven dead end at tile
  granularity with divergent rays").

This module restructures the SAME computation bounce-major (the wavefront
formulation, cf. PAPERS.md "Megakernel vs Wavefront GPU Path Tracing"):
ray state lives in HBM as a (16, N) table (attributes on sublanes, rays on
lanes), one Pallas kernel advances every ray by ONE bounce, and between
bounces the host (inside the same jit) re-orders rays:

* **compaction**: dead rays sort to the back, so whole trailing tiles are
  dead and the per-tile early-out actually fires — work becomes
  proportional to sum(live) instead of #tiles-with-any-live;
* **coherence**: live rays sort by direction octant + coarse origin cell
  (bounds adapted per bounce from the live origins), so the rays sharing a
  tile agree about which primitive blocks are reachable and the
  per-block bounding-sphere cull (reused unchanged from pallas_blockwise)
  finally has teeth.

Correctness: the per-bounce physics is literally the same function
(`pallas_blockwise._bounce_once`), and the RNG is the counter hash keyed by
(pixel, sample, bounce) — a ray's random draws are independent of where the
sort put it, so the ESTIMATOR is unchanged by reordering: every ray traces
the same path and lands the same radiance as in the pixel-major kernel's
``rng_impl="hash"`` mode, and the frames agree to float-association noise
(<= a few ULP — the two jit programs fuse/contract the shared bounce math
differently; asserted at atol 2e-5 by tests/test_pallas_wavefront.py).
The stateful TPU hardware PRNG cannot offer that property (its stream is
tile-order dependent), hence this kernel is hash-RNG only.

Tie-breaking, scan order, sky, scatter semantics: reference
mg_ray_tracer.cpp:36-174 via _bounce_once; see pallas_blockwise.py.
The ``--boxes`` extension rides the same bounce body (round 5): the
slab-test table is a third replicated VMEM input to every bounce
kernel, ray state is unchanged, so the compaction sorts and shrink are
oblivious to it — forward parity vs the blockwise slab path is tested
through sorts and sharding, and measured bit-exact on device with the
wavefront 1.097x FASTER than blockwise on the 2100-sphere + 3-box
auto-route shape (job 82, interleaved windows); gradients for box
scenes keep the blockwise records route (wf_grad_supported rejects
boxes).

Measured (v5e-1, 5000-sphere config-5 slice 960x540@2spp d8; worker jobs
CF/CG0/CG2/CG3/CG5, all same-session ratios vs the pixel-major blockwise
kernel at ~306-316 ms):

    ====================================================  ======  =====
    configuration                                          ms     ratio
    ====================================================  ======  =====
    pure bounce-major, no sort, wf_rows=1                  260    1.19x
    + compaction sort @1                                   228    1.38x
    + wf_rows=4                                            226    1.40x
    + cull_group=4 (finer grouped cull, sorted tiles)      219    1.40x
    + bucketed shrink @3 (sort 1,3,5)                      212    1.49x
    + shrink @2 (sort 1,2,5 — the default)                 194    1.62x
    + windowed winner extract (256 rows, the default)      179    1.76x
    ====================================================  ======  =====

    Sort implementation is a measured WASH (job 71, interleaved
    windows=7, bit-identical frames): variadic lax.sort with the 14
    state rows as payload operands 180.9 ms vs argsort+take gather
    179.6 ms = 0.7% — inside window noise, so the default stays
    "variadic" (one fused sort, no (14, N) gather intermediate);
    both modes are kept and parity-tested (test_sort_modes_agree).

    The SEGMENTED live-prefix pipeline (``pipeline="seg"``: sequential
    lax.switch segments over a 1..1/32 bucket ladder, the next
    scheduled sort at the tail of each branch so it sorts only the
    static prefix, per-segment bucket re-choice) is also a measured
    NEUTRAL (jobs 73/76, interleaved, bit-equal frames): config-5
    slice 1.012x, 4K @2spp-chunk 0.999x (2521 vs 2524 ms).  Two
    conclusions worth the record: (a) the tail pipeline's in-branch
    sorts were ALREADY prefix-sized, so the only new savings were the
    second sort at ~1/2 size and deeper late buckets — a few ms; (b)
    the 4K frame now scales ~linearly from the slice (2521 ms ~=
    16 x 177 ms x 0.89), i.e. with tagged int32 ids + 14-row state the
    sorts are NOT a 4K-specific overhead any more.  Default stays
    "tail"; "seg" is kept parity-tested
    (test_segmented_pipeline_bit_parity).  Denser sort schedules stay a
    loss even at prefix size (job 78, same interleaved session, bit-
    equal): seg(1,2,3,5) = 0.93x and seg(1..6) = 0.74x the tail(1,2,5)
    baseline — extra compactions between the 2- and 5-sorts cost more
    (sort + the re-choice switch overhead) than the in-place liveness
    decay they remove, killing the last open hypothesis for a denser
    schedule.

    Negative results kept deliberately: sorting EVERY bounce loses
    (~9 ms/sort at 1M rays vs little extra skipping: 260 ms); per-block
    cull granularity below 4 loses (g2 237, g1 297 — branch overhead);
    wf_rows=16 spills (350 ms); block=64 loses badly (421).  The
    500-sphere config-4 shape is SLOWER than pixel-major — 0.5x with the
    round-4 16-row state, and still 0.598x after the round-5 14-row pack
    (1080p@16spp interleaved, job 54): with only 4 block-groups of scan
    per tile, per-ray state I/O + sorts outweigh the skips, and the
    12.5% I/O cut moves the needle ~20% of the gap — the remaining cost
    is the sorts + per-grid-step overhead, both scan-independent, so the
    auto-route keeps blockwise below 2048 padded primitives.  Chunk-size
    scaling at 4K is ALSO a negative (0.96x for 4x bigger chunks, job
    53): the compaction sorts scale with rays, so bigger chunks only
    amortize small fixed overheads.  A sky-camera probe (every ray dead
    after bounce 0) measures the structural floor at ~120 ms:
    per-grid-step pipeline overhead on dead tiles is what the bucketed
    shrink attacks; the in-kernel any-live lax.cond alone cannot remove
    it.

Training (round 5): rt_tpu.ops.pallas_wavefront_grad runs the fused
fwd+bwd on THIS pipeline — the bounce kernels' ``record=True`` mode
stashes a winner word in spare row 14, the sorts record their
permutations, and a scan-free reverse sweep transports cotangents
bounce-major (see that module's docstring).  The forward-only entry
points here stay record-free.

State row layout (f32):
  0-2  origin        3-5  direction      6-8  throughput
  9-11 radiance acc  12   live flag      13   ray id (int32 BITCAST)
  14   winner word (grad-record mode)    15   spare (grad-record mode)
Forward-only state is 14 rows (rows 14-15 exist only under
``record=True`` for the wavefront backward) — 12.5% less per-bounce HBM
state traffic than the round-4 16-row layout.
Row 13 carries the global ray id (sample * n_pix + pixel) as an int32
bit-pattern riding an f32 row (``lax.bitcast_convert_type``): ids are
exact up to 2^30 rays, so a 4K frame can chunk at >=8 spp (the round-4
f32 layout capped pixel ids at 2^24 = 2 spp per 4K chunk, which starved
the sort amortization — VERDICT r4 item 2).  The stored pattern is
``id | _ID_TAG`` (bit 30): raw small ints bitcast to f32 are SUBNORMAL
patterns, and the TPU flushes subnormals to zero somewhere between the
kernel stores and the XLA sorts (measured on v5e: frame parity broke
with maxdiff ~1 until the tag; job 50/51) — the tag forces a normal
exponent so every copy/select moves the pattern intact.  The record row
(14, grad mode) gets the same tag for the same reason.  The sorts only
move both rows as opaque payload (never compare them).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_render import _flatten_primitives
from .pallas_blockwise import (
    _BLOCK,
    _COLS,
    _LANES,
    _auto_cull_group,
    _block_bounds,
    _bounce_once,
    _box_inputs,
    _bucket,
    _morton_perm,
    _padded_table,
    _seed_table,
    blockwise_supported,
)

__all__ = ["render_forward_wavefront",
           "render_forward_wavefront_sharded",
           "wavefront_supported"]

# bit-30 exponent tag keeping int bit-patterns in f32 state rows out of
# the TPU's flush-to-zero subnormal range (see module docstring)
_ID_TAG = 1 << 30
_ID_MASK = _ID_TAG - 1

# rays per chunk the 16 GB v5e HBM can hold with the ~3-4 live copies of
# the (14, N) f32 state XLA schedules (bounce in+out, sort/concat temps);
# measured: 66M rays -> 17.7 GB OOM, so cap at 2^25 ~ 1.9 GB/copy
_HBM_RAY_CAP = 1 << 25


def wavefront_supported(scene, include_boxes: bool = False) -> bool:
    """Same scene envelope as the blockwise kernel: the bounce body is
    shared, and since round 5 that includes the ``--boxes`` slab-scan
    table (the box table rides the bounce kernels as a third replicated
    VMEM input; ray state is unchanged, so the compaction sorts are
    oblivious to it).  Additionally a chunk's ray count must keep ray
    ids exact in the tagged int32 encoding (checked at call time
    against 2^30)."""
    return blockwise_supported(scene, include_boxes)


def _hash_u01_dyn(pix, seed, ctr, shape):
    """`pallas_render._hash_u01` with a TRACED draw counter: identical
    bits (the int32 arithmetic wraps the same whether ctr is a Python int
    or a traced int32), which is what lets one compiled bounce kernel
    serve every bounce index while reproducing the pixel-major kernel's
    draw-for-draw stream."""
    i32 = jnp.int32
    x = (pix * i32(-1640531527) + seed * i32(97929)
         + ctr * i32(30103) + i32(1))
    x = jnp.broadcast_to(x, shape)
    u = x.astype(jnp.uint32)
    u = u ^ (u >> 16)
    u = u * jnp.uint32(0x7FEB352D)
    u = u ^ (u >> 15)
    u = u * jnp.uint32(0x846CA68B)
    u = u ^ (u >> 16)
    top24 = jax.lax.bitcast_convert_type(u >> 8, i32)
    return top24.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _make_wf_kernel(*, width, height, s_pad, p_pad, max_bounces, rng_mode,
                    center_sample, gen, block, cull, cull_group, wf_rows,
                    dbg=(), extract_window=0, record=False, b_pad=0):
    """Wavefront kernel body.

    ``gen=True``: raygen + bounce 0.  No state input; pixel/sample ids
    derive from the grid position (rays start in pixel order — already
    coherent, no sort needed before bounce 0).  ``gen=False``: one bounce
    ``b`` (dynamic, from meta) for a ray-state tile.

    Each grid step owns ``wf_rows`` sub-tiles of 128 rays (state block
    (16, wf_rows*128)) and loops the shared bounce body over them.  The
    coarse grid amortizes the per-step pipeline overhead (DMA issue +
    grid sync) that a 128-ray grid would pay per ray-tile PER BOUNCE —
    the overhead that ate the compaction win in the first cut (CF job:
    8100 tiles x 8 bounces at ~microseconds each ~ the whole scan) —
    while the dead-ray early-out stays at 128-ray granularity: each
    sub-tile wraps its scan in its own any-live lax.cond, so a sorted
    dead suffix still skips in 128-ray quanta.

    meta (SMEM int32): [seed, n_spheres, n_planes, bounce_b, n_rays,
    ray_offset, n_boxes, 0] (n_boxes read only when ``b_pad > 0`` —
    the --boxes slab table rides as a third replicated VMEM input).
    cam (SMEM f32): as pallas_blockwise (only used when ``gen``).
    """
    f32 = jnp.float32
    shape = (1, _LANES)
    n_pix = width * height
    draws_per_sample = 2 + 4 * max_bounces

    def kernel(meta_ref, cam_ref, sph_ref, pln_ref, *rest):
        if b_pad:
            box_ref, rest = rest[0], rest[1:]
        else:
            box_ref = None
        if cull:
            aux_ref, seed_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            aux_ref, seed_ref = None, None
        if gen:
            (out_ref,) = rest
        else:
            state_ref, out_ref = rest

        seed = meta_ref[0]
        n_sph = meta_ref[1]
        n_pln = meta_ref[2]

        for r_sub in range(wf_rows):
            sl = pl.ds(r_sub * _LANES, _LANES)
            if gen:
                tile = pl.program_id(0)
                lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                # meta[5]: global ray offset (sharded entry point — each
                # device owns a contiguous ray range; ids stay globally
                # unique so per-ray hash streams match the unsharded run)
                idx = ((tile * wf_rows + r_sub) * _LANES + lane
                       + meta_ref[5])
                pix = idx % n_pix
                smp = idx // n_pix
                live0 = (idx < meta_ref[4]).astype(f32)  # meta[4] = n_rays
                # draws 1-2 are the pixel jitter, 3-6 bounce 0's quad —
                # the same 1-based per-sample counters as the pixel-major
                # kernel
                base = smp * jnp.int32(draws_per_sample)
            else:
                # ray id rides row 13 as a bit-30-tagged int32 bit-pattern
                # (exact to 2^30 rays; see module docstring)
                idx = (jax.lax.bitcast_convert_type(state_ref[13:14, sl],
                                                    jnp.int32)
                       & jnp.int32(_ID_MASK))
                pix = idx % n_pix
                smp = idx // n_pix
                b_dyn = meta_ref[3]
                # bounce b's draws follow jitter(2) + 4 per earlier bounce
                base = (smp * jnp.int32(draws_per_sample) + jnp.int32(2)
                        + jnp.int32(4) * b_dyn)

            kctr = [0]

            def u01(pix=pix, base=base, kctr=kctr):
                kctr[0] += 1
                return _hash_u01_dyn(pix, seed, base + jnp.int32(kctr[0]),
                                     shape)

            if gen:
                # raygen: identical float ops to the pixel-major kernel
                # (pallas_blockwise._make_blockwise_kernel raygen block)
                px = (pix % width).astype(f32)
                py = (pix // width).astype(f32)
                u = u01()
                v = u01()
                if center_sample:
                    ctr0 = (smp == 0)
                    jx = jnp.where(ctr0, f32(0.5), u)
                    jy = jnp.where(ctr0, f32(0.5), v)
                else:
                    jx, jy = u, v
                cpx, cpy, cpz = cam_ref[0], cam_ref[1], cam_ref[2]
                r = [cam_ref[3 + i] for i in range(9)]
                tan_half, aspect, near = (cam_ref[12], cam_ref[13],
                                          cam_ref[14])
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
                one = jnp.ones(shape, f32)
                tr = one
                tg = one
                tb = one
                live = live0
                acc = [jnp.zeros(shape, f32) for _ in range(3)]
            else:
                ox = state_ref[0:1, sl]
                oy = state_ref[1:2, sl]
                oz = state_ref[2:3, sl]
                dx = state_ref[3:4, sl]
                dy = state_ref[4:5, sl]
                dz = state_ref[5:6, sl]
                tr = state_ref[6:7, sl]
                tg = state_ref[7:8, sl]
                tb = state_ref[8:9, sl]
                acc = [state_ref[9 + c:10 + c, sl] for c in range(3)]
                live = state_ref[12:13, sl]

            out = _bounce_once(
                (sph_ref, pln_ref, aux_ref, seed_ref)
                + ((box_ref,) if b_pad else ()),
                (n_sph, n_pln, meta_ref[6] if b_pad else 0),
                (ox, oy, oz, dx, dy, dz, tr, tg, tb, live),
                u01,
                s_pad=s_pad, p_pad=p_pad, block=block, scan="lean",
                mxu=False, cull=cull, cull_group=cull_group,
                rng_mode=rng_mode, skip_cond=not gen, dbg=dbg,
                extract_window=extract_window, want_record=record,
                b_pad=b_pad)
            contrib, (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), live = out[:5]
            acc = [acc[c] + contrib[c] for c in range(3)]

            out_ref[0:1, sl] = ox
            out_ref[1:2, sl] = oy
            out_ref[2:3, sl] = oz
            out_ref[3:4, sl] = dx
            out_ref[4:5, sl] = dy
            out_ref[5:6, sl] = dz
            out_ref[6:7, sl] = tr
            out_ref[7:8, sl] = tg
            out_ref[8:9, sl] = tb
            out_ref[9:10, sl] = acc[0]
            out_ref[10:11, sl] = acc[1]
            out_ref[11:12, sl] = acc[2]
            out_ref[12:13, sl] = live
            out_ref[13:14, sl] = jax.lax.bitcast_convert_type(
                idx | jnp.int32(_ID_TAG), f32)
            if record:
                # the bounce's winner word (see _bounce_once want_record)
                # rides spare row 14 as a tagged int32 bit-pattern: the
                # ONLY stash the wavefront backward needs per bounce
                out_ref[14:15, sl] = jax.lax.bitcast_convert_type(
                    out[5] | jnp.int32(_ID_TAG), f32)
                out_ref[15:16, sl] = jnp.zeros(shape, f32)
            # forward-only mode carries a 14-row state (rows 14-15 are
            # record/spare) — 12.5% less per-bounce HBM state traffic

    return kernel


@functools.lru_cache(maxsize=64)
def _compiled_wf_call(*, width, height, s_pad, p_pad, max_bounces, rng_mode,
                      center_sample, gen, block, cull, cull_group, n_tiles,
                      interpret, wf_rows, dbg=(), extract_window=0,
                      record=False, b_pad=0):
    kernel = _make_wf_kernel(
        width=width, height=height, s_pad=s_pad, p_pad=p_pad,
        max_bounces=max_bounces, rng_mode=rng_mode,
        center_sample=center_sample, gen=gen, block=block, cull=cull,
        cull_group=cull_group, wf_rows=wf_rows, dbg=dbg,
        extract_window=extract_window, record=record, b_pad=b_pad,
    )
    span = wf_rows * _LANES
    n_rows = 16 if record else 14
    in_specs = [
        pl.BlockSpec((s_pad, _COLS), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_pad, _COLS), lambda i, *_: (0, 0),
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
    if not gen:
        in_specs.append(pl.BlockSpec((n_rows, span), lambda i, *_: (0, i),
                                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((n_rows, span), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_tiles * span),
                                       jnp.float32),
        interpret=interpret,
    )
    return call


def _sort_key(state, cell_bits: int):
    """int32 sort key per ray: dead rays last, then direction octant,
    then a coarse origin cell on bounds ADAPTED from the live origins
    (robust to the r=1000 ground sphere dwarfing the scene extent)."""
    i32 = jnp.int32
    live = state[12] > 0.0
    octant = ((state[3] > 0).astype(i32) * 4 + (state[4] > 0).astype(i32) * 2
              + (state[5] > 0).astype(i32))
    nc = 1 << cell_bits
    cell = jnp.zeros_like(octant)
    for a in range(3):
        o = state[a]
        big = jnp.float32(3e38)
        lo = jnp.min(jnp.where(live, o, big))
        hi = jnp.max(jnp.where(live, o, -big))
        span = jnp.maximum(hi - lo, 1e-6)
        q = jnp.clip((o - lo) / span * nc, 0, nc - 1).astype(i32)
        cell = (cell << cell_bits) | q
    dead_shift = 3 + 3 * cell_bits
    key = (octant << (3 * cell_bits)) | cell
    key = jnp.where(live, key, i32(1) << dead_shift)
    return key


def _sort_state(state, cell_bits: int, sort_mode: str):
    key = _sort_key(state, cell_bits)
    if sort_mode == "gather":
        perm = jnp.argsort(key, stable=True)
        return state[:, perm]
    ops = (key,) + tuple(state[i] for i in range(state.shape[0]))
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return jnp.stack(out[1:], axis=0)


_SEG_DIVS = (1, 2, 4, 8, 16, 32)  # live-prefix bucket ladder (seg pipeline)


@functools.lru_cache(maxsize=32)
def _compiled_frame_wf(*, width, height, s_pad, p_pad, spp, spp_chunk,
                       max_bounces, rng_mode, gamma, center_first, interpret,
                       block, cull, cull_gen, cull_group, sort_schedule,
                       sort_mode, cell_bits, wf_rows, shrink_at, dbg=(),
                       extract_window=0, pipeline="tail", b_pad=0):
    """Jitted frame: per chunk, gen kernel (raygen + bounce 0), then one
    bounce kernel per remaining bounce with sort/compaction between the
    bounces named in ``sort_schedule``; per-ray radiance is re-ordered
    back to (sample, pixel) order with a key sort and reduced in exactly
    the pixel-major kernel's addition order (bit parity, see module
    docstring).

    ``shrink_at``: after the sort at this bounce the LIVE PREFIX is
    carved out with a static slice and the remaining bounces run on it —
    a runtime lax.switch picks the smallest {full, 1/4, 1/16} bucket
    whose capacity covers the live count (shapes stay static per branch;
    bit-exact because dead-suffix rays' radiance is already final).
    This attacks what the dead-sub-tile lax.cond cannot: the per-grid-
    step pipeline overhead of all-dead tiles, measured at ~9 ms/bounce
    on the config-5 slice even with every ray dead (CG3 sky-camera
    probe)."""
    n_pix = width * height
    chunk_sizes = []
    remaining = spp
    while remaining > 0:
        k = min(spp_chunk, remaining)
        chunk_sizes.append(k)
        remaining -= k

    def calls_for(k, center):
        n_rays = n_pix * k
        n_tiles = -(-n_rays // (wf_rows * _LANES))
        common = dict(width=width, height=height, s_pad=s_pad, p_pad=p_pad,
                      max_bounces=max_bounces, rng_mode=rng_mode,
                      block=block, cull=cull, cull_group=cull_group,
                      interpret=interpret, wf_rows=wf_rows, dbg=dbg,
                      extract_window=extract_window, b_pad=b_pad)
        gen = _compiled_wf_call(center_sample=center, gen=True,
                                n_tiles=n_tiles,
                                **{**common, "cull": cull_gen})
        tile_set = {n_tiles, max(1, n_tiles // 4), max(1, n_tiles // 16)}
        if pipeline == "seg":
            tile_set |= {max(1, n_tiles // d) for d in _SEG_DIVS}
        stepc = {
            nt: _compiled_wf_call(center_sample=center, gen=False,
                                  n_tiles=nt, **common)
            for nt in tile_set
        }
        return gen, stepc, n_rays, n_tiles

    span = wf_rows * _LANES

    def make_chunk_fn(k, gen, stepc, n_rays, n_tiles):
        # ONE chunk per jit program: a 256-spp 4K frame is 64 chunks, and
        # unrolling them into one program lets XLA keep several (14, N)
        # chunk states live at once — measured 17-22 GB HBM OOM (jobs
        # 89/90).  A host loop over per-chunk programs bounds HBM to one
        # chunk's pipeline (and compiles one small program, reused across
        # chunks, instead of a giant one); single-chunk frames — every
        # benchmark slice — compile to the identical program as before.
        @jax.jit
        def chunk_fn(meta, cam, s_tab, p_tab, *btab):
            aux = ((_block_bounds(s_tab, block),
                    _seed_table(s_tab, block)) if cull else ())
            meta_g = meta.at[4].set(n_rays)
            aux_g = aux if cull_gen else ()
            state = gen(meta_g, cam, s_tab, p_tab, *btab, *aux_g)

            def run_bounce(st, b, nt):
                meta_b = meta.at[3].set(b)
                return stepc[nt](meta_b, cam, s_tab, p_tab, *btab,
                                 *aux, st)

            seg_bounds = (sorted({b for b in sort_schedule
                                  if 1 <= b < max_bounces})
                          if pipeline == "seg" else [])
            if seg_bounds:
                # ---- segmented live-prefix pipeline ---------------------
                # Every sorted segment runs inside a lax.switch branch
                # sized to the smallest ladder bucket covering the live
                # count, and the NEXT scheduled sort runs at the tail of
                # the branch — so it sorts only the (static) prefix, not
                # the full ray table.  Sequential switches (no nesting):
                # live rays always sit inside the previous branch's
                # prefix (sorts compact them there; deaths never move a
                # ray), so any covering bucket is a correct slice.
                b = 1
                while b < max_bounces and b < seg_bounds[0]:
                    state = run_bounce(state, b, n_tiles)
                    b += 1
                buckets = sorted({max(1, n_tiles // d) for d in _SEG_DIVS},
                                 reverse=True)
                for si, s in enumerate(seg_bounds):
                    b1 = (seg_bounds[si + 1] if si + 1 < len(seg_bounds)
                          else max_bounces)
                    if si == 0:
                        # first compaction must see every ray
                        state = _sort_state(state, cell_bits, sort_mode)
                    n_live = jnp.sum((state[12] > 0.0).astype(jnp.int32))
                    idx = jnp.int32(0)
                    for i in range(1, len(buckets)):
                        idx = jnp.where(n_live <= buckets[i] * span,
                                        jnp.int32(i), idx)
                    sort_after = si + 1 < len(seg_bounds)

                    def make_seg(nt, b0=s, b1=b1, sort_after=sort_after):
                        w_sub = nt * span

                        def seg(st):
                            sub = (st[:, :w_sub]
                                   if w_sub < st.shape[1] else st)
                            for bb in range(b0, b1):
                                sub = run_bounce(sub, bb, nt)
                            if sort_after:
                                sub = _sort_state(sub, cell_bits,
                                                  sort_mode)
                            if w_sub < st.shape[1]:
                                sub = jnp.concatenate(
                                    [sub, st[:, w_sub:]], axis=1)
                            return sub

                        return seg

                    state = jax.lax.switch(
                        idx, [make_seg(nt) for nt in buckets], state)
                b = max_bounces
            else:
                b = 1
                while b < max_bounces:
                    if b in sort_schedule:
                        state = _sort_state(state, cell_bits, sort_mode)
                        if b == shrink_at:
                            break
                    state = run_bounce(state, b, n_tiles)
                    b += 1

            if b < max_bounces:
                # bucketed tail on the sorted live prefix
                n_live = jnp.sum((state[12] > 0.0).astype(jnp.int32))
                bucket_tiles = [n_tiles, max(1, n_tiles // 4),
                                max(1, n_tiles // 16)]

                def make_tail(nt, b0=b):
                    w_sub = nt * span

                    def tail(st):
                        sub = st[:, :w_sub] if w_sub < st.shape[1] else st
                        for bb in range(b0, max_bounces):
                            if bb in sort_schedule and bb != b0:
                                sub = _sort_state(sub, cell_bits,
                                                  sort_mode)
                            sub = run_bounce(sub, bb, nt)
                        if w_sub < st.shape[1]:
                            sub = jnp.concatenate([sub, st[:, w_sub:]],
                                                  axis=1)
                        return sub

                    return tail

                idx = jnp.where(
                    n_live <= bucket_tiles[2] * span, 2,
                    jnp.where(n_live <= bucket_tiles[1] * span, 1, 0))
                state = jax.lax.switch(
                    idx, [make_tail(nt) for nt in bucket_tiles], state)
            # ---- assemble: back to (sample, pixel) order ----------------
            ray_id = (jax.lax.bitcast_convert_type(state[13], jnp.int32)
                      & jnp.int32(_ID_MASK))
            out = jax.lax.sort(
                (ray_id, state[9], state[10], state[11]),
                num_keys=1, is_stable=True)
            chans = []
            for c in range(3):
                v = out[1 + c]
                acc = v[0:n_pix]
                for s in range(1, k):
                    acc = acc + v[s * n_pix:(s + 1) * n_pix]
                chans.append(acc)
            chunk_img = jnp.stack(chans, axis=-1)  # (n_pix, 3)
            return chunk_img

        return chunk_fn

    fn_cache = {}
    chunk_fns = []
    for ci, k in enumerate(chunk_sizes):
        key = (k, ci == 0 and center_first)
        if key not in fn_cache:
            fn_cache[key] = make_chunk_fn(k, *calls_for(*key))
        chunk_fns.append(fn_cache[key])

    def run(metas, cam, s_tab, p_tab, *btab):
        total = None
        for ci, fn in enumerate(chunk_fns):
            chunk_img = fn(metas[ci], cam, s_tab, p_tab, *btab)
            total = chunk_img if total is None else total + chunk_img
            if (ci + 1) % 8 == 0:
                # throttle async dispatch: cap the outstanding per-chunk
                # output buffers (95 MB each at 4K)
                jax.block_until_ready(total)
        img = total * jnp.float32(1.0 / spp)
        if gamma:
            img = jnp.sqrt(jnp.maximum(img, 0.0))
        return img.reshape(height, width, 3)

    return run, len(chunk_sizes)


def render_forward_wavefront(
    scene,
    size: tuple[int, int],
    seed: int = 0,
    *,
    personality: str = "mg",
    spp: Optional[int] = None,
    max_bounces: Optional[int] = None,
    spp_chunk: int = 4,
    gamma: bool = True,
    rng_mode: str = "reference",
    rng_impl: str = "hash",
    center_sample: Optional[bool] = None,
    interpret: bool = False,
    block: Optional[int] = None,
    cull: Optional[bool] = None,
    order: Optional[str] = None,
    sort_schedule: Optional[tuple] = None,
    sort_mode: str = "variadic",
    cell_bits: int = 2,
    wf_rows: int = 4,
    cull_group: Optional[int] = None,
    cull_gen: Optional[bool] = None,
    shrink_at: Optional[int] = -1,
    extract_window: Optional[int] = None,
    dbg: tuple = (),
    include_boxes: bool = False,
    pipeline: str = "tail",
    **_unused,
) -> jax.Array:
    """Render a full frame with the bounce-major wavefront pipeline.
    (H, W, 3) f32.  Scene tables are runtime inputs (no recompiles on
    geometry edits), same envelope as the blockwise kernel.

    Hash RNG only: draws are keyed by (pixel, sample, bounce), so the ray
    permutation between bounces does not change the estimator (the frame
    matches ``render_forward_blockwise(rng_impl="hash")`` to ULP-level
    float-association noise).
    """
    if rng_impl != "hash":
        raise ValueError("wavefront kernel is hash-RNG only (reordering "
                         "would change the hw-PRNG stream); pass "
                         "rng_impl='hash'")
    if not wavefront_supported(scene, include_boxes):
        raise ValueError("scene exceeds the wavefront kernel limits")
    w, h = size
    if spp is None:
        spp = scene.samples_per_pixel
    if max_bounces is None:
        max_bounces = scene.max_bounces
    spp_chunk = max(1, min(spp_chunk, spp))
    if w * h * spp_chunk > _ID_MASK:
        # ray ids ride a tagged int32 bit-pattern in a state row (bits
        # 0-29); keep them exact
        spp_chunk = max(1, _ID_MASK // (w * h))
    if w * h * spp_chunk > _HBM_RAY_CAP:
        # XLA keeps ~3-4 live copies of the (14, N) chunk state (each
        # bounce kernel's in+out plus the sort/concat temps): a 66M-ray
        # chunk (4K @ 8 spp) measured 17.7 GB > the 15.75 GB v5e HBM
        # (job 89 OOM).  2^25 rays/chunk ~ 1.9 GB/copy stays safe, and
        # chunk-size scaling is a measured wash (job 53: 0.96x), so
        # capping costs nothing.
        spp_chunk = max(1, _HBM_RAY_CAP // (w * h))
    if w * h > _ID_MASK:
        raise ValueError("frame too large for exact tagged int32 ray ids")

    s_cols, p_cols = _flatten_primitives(scene, personality)
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    if block is None:
        block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    if cull is None:
        # compaction + coherence sorting is precisely what gives the
        # conservative block cull teeth; default it on whenever the
        # grouped tables fit (even for mid-size scenes)
        cull = s_pad >= 512 and s_pad // block <= 128
    if cull_group is None and cull:
        # g4 measured best on coherent sorted tiles (219 ms vs 229 at the
        # auto g8, 237 at g2, 297 at g1 — branch cost still beats the
        # extra skips below 4-block granularity; CG2 job)
        nb = s_pad // block
        for g in (4, 2, 1):
            if nb % g == 0:
                cull_group = g
                break
    if order is None:
        order = "morton" if (cull and scene.spheres.count > 1) else "index"
    if sort_schedule is None:
        # measured on v5e-1 (5000-sphere config-5 slice, CG0/CG2/CG5
        # jobs): each variadic sort costs ~9 ms at 1M rays and re-sorting
        # a compact live region buys little, but sorting at bounce 2 lets
        # the bucketed shrink fire while live counts are still collapsing
        # (0.604 -> 0.044 on the config-5 scene): (1,2,5)+shrink@2 = 194.5
        # ms vs (1,3,5)+shrink@3 = 211.9 vs every-bounce = 260; bounce 0
        # is pixel-ordered (coherent) by construction
        sort_schedule = tuple(b for b in (1, 2, 5) if b < max_bounces)
    if shrink_at == -1:
        # auto: shrink at the second sort (live counts have collapsed by
        # then on path-traced scenes; CG3 measured ~9 ms/bounce of pure
        # dead-tile overhead that only a smaller array removes)
        cands = [b for b in sort_schedule if b >= 2]
        shrink_at = cands[0] if cands else None
    if shrink_at is not None and shrink_at not in sort_schedule:
        raise ValueError("shrink_at must name a bounce in sort_schedule")
    gidx = None
    if order == "morton":
        perm = _morton_perm(s_cols)
        s_cols = s_cols[:, perm]
        gidx = perm
    s_tab = jnp.asarray(_padded_table(s_cols, s_pad, gidx))
    p_tab = jnp.asarray(_padded_table(p_cols, p_pad))

    boxes_on = include_boxes and scene.boxes.count > 0
    b_pad, btab = _box_inputs(scene, personality, boxes_on)

    run, n_chunks = _compiled_frame_wf(
        width=w, height=h, s_pad=s_pad, p_pad=p_pad, spp=spp,
        spp_chunk=spp_chunk, max_bounces=max_bounces, rng_mode=rng_mode,
        gamma=gamma,
        center_first=(True if center_sample is None else center_sample),
        interpret=interpret, block=block, cull=cull,
        cull_gen=bool(cull) if cull_gen is None else bool(cull_gen),
        cull_group=(cull_group if cull_group is not None
                    else _auto_cull_group(s_pad, block)),
        sort_schedule=tuple(sort_schedule), sort_mode=sort_mode,
        cell_bits=cell_bits, wf_rows=wf_rows, dbg=tuple(dbg),
        shrink_at=shrink_at, pipeline=pipeline, b_pad=b_pad,
        extract_window=(256 if extract_window is None and s_pad > 512
                        else (extract_window or 0)),
    )

    cam = jnp.concatenate([
        jnp.asarray(scene.camera.position, jnp.float32),
        jnp.asarray(scene.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(scene.camera.vfov * 0.5), w / h, scene.camera.near, 0.0
        ], jnp.float32),
    ])
    metas = _wf_meta_rows(scene, seed, n_chunks,
                          n_box=scene.boxes.count if boxes_on else 0)
    return run(metas, cam, s_tab, p_tab, *btab)


def _wf_meta_rows(scene, seed: int, n_chunks: int,
                  n_box: int = 0) -> jnp.ndarray:
    """(n_chunks, 8) int32 rows: [seed, n_spheres, n_planes, bounce_b,
    n_rays, ray_offset, n_boxes, 0]; the per-chunk seed chain matches
    pallas_blockwise._meta_rows so equal-chunking runs draw identical
    hash streams."""
    metas = []
    chunk_seed = seed
    for _ in range(n_chunks):
        metas.append([chunk_seed, scene.spheres.count, scene.planes.count,
                      0, 0, 0, n_box, 0])
        chunk_seed = int((chunk_seed * 1103515245 + 12345) % (2**31 - 1))
    return jnp.asarray(metas, jnp.int32)


def render_forward_wavefront_sharded(
    scene,
    size: tuple[int, int],
    mesh,
    seed: int = 0,
    *,
    axis: str = "rays",
    personality: str = "mg",
    spp: Optional[int] = None,
    max_bounces: Optional[int] = None,
    spp_chunk: int = 4,
    gamma: bool = True,
    rng_mode: str = "reference",
    center_sample: Optional[bool] = None,
    interpret: bool = False,
    block: Optional[int] = None,
    cull: Optional[bool] = None,
    cull_gen: Optional[bool] = None,
    order: Optional[str] = None,
    sort_schedule: Optional[tuple] = None,
    sort_mode: str = "variadic",
    cell_bits: int = 2,
    wf_rows: int = 4,
    cull_group: Optional[int] = None,
    shrink_at: Optional[int] = -1,
    include_boxes: bool = False,
    **_unused,
) -> jax.Array:
    """Wavefront frame sharded over ``mesh[axis]`` (H, W, 3) f32.

    Each device owns a CONTIGUOUS global ray range (the thread_pool
    for_range analogue, mg_ray_tracer.cpp:203-204) and runs its own
    complete wavefront — local compaction sorts, local bucketed shrink
    (lax.switch on a device-local live count: devices whose rays die
    early shrink independently of the others).  Hash draws are keyed by
    GLOBAL ray ids (meta ray_offset), so the frame is bit-identical to
    the unsharded wavefront regardless of device count; tables and
    camera are replicated, and the framebuffer assembles via the
    out-spec all-gather of per-shard contiguous ray blocks.
    """
    from ..dist import _SMAP_NOCHECK, shard_map
    from jax.sharding import PartitionSpec as P

    if not wavefront_supported(scene, include_boxes):
        raise ValueError("scene exceeds the wavefront kernel limits")
    w, h = size
    n_pix = w * h
    if spp is None:
        spp = scene.samples_per_pixel
    if max_bounces is None:
        max_bounces = scene.max_bounces
    spp_chunk = max(1, min(spp_chunk, spp))
    if n_pix * spp_chunk > _ID_MASK:
        spp_chunk = max(1, _ID_MASK // n_pix)
    if n_pix * spp_chunk > _HBM_RAY_CAP:
        # per-chip HBM chunk cap, see render_forward_wavefront (the cap
        # is per device: each shard holds only its slice of the state)
        spp_chunk = max(1, _HBM_RAY_CAP // n_pix)
    if n_pix > _ID_MASK:
        raise ValueError("frame too large for exact tagged int32 ray ids")

    s_cols, p_cols = _flatten_primitives(scene, personality)
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    if block is None:
        block = _BLOCK if max(s_pad, p_pad) <= 128 else 128
    if cull is None:
        cull = s_pad >= 512 and s_pad // block <= 128
    if cull_group is None and cull:
        nb = s_pad // block
        cull_group = next(g for g in (4, 2, 1) if nb % g == 0)
    elif cull_group is None:
        cull_group = _auto_cull_group(s_pad, block)
    cull_gen_b = bool(cull) if cull_gen is None else bool(cull_gen)
    if order is None:
        order = "morton" if (cull and scene.spheres.count > 1) else "index"
    if sort_schedule is None:
        sort_schedule = tuple(b for b in (1, 2, 5) if b < max_bounces)
    if shrink_at == -1:
        cands = [b for b in sort_schedule if b >= 2]
        shrink_at = cands[0] if cands else None
    if shrink_at is not None and shrink_at not in sort_schedule:
        raise ValueError("shrink_at must name a bounce in sort_schedule")
    gidx = None
    if order == "morton":
        perm = _morton_perm(s_cols)
        s_cols = s_cols[:, perm]
        gidx = perm
    s_tab = jnp.asarray(_padded_table(s_cols, s_pad, gidx))
    p_tab = jnp.asarray(_padded_table(p_cols, p_pad))

    boxes_on = include_boxes and scene.boxes.count > 0
    b_pad, btab = _box_inputs(scene, personality, boxes_on)

    n_dev = mesh.shape[axis]
    span = wf_rows * _LANES
    chunk_sizes = []
    remaining = spp
    while remaining > 0:
        k = min(spp_chunk, remaining)
        chunk_sizes.append(k)
        remaining -= k
    center_first = True if center_sample is None else center_sample

    def calls_for(k, center):
        n_rays = n_pix * k
        local_tiles = -(-(-(-n_rays // span)) // n_dev)
        common = dict(width=w, height=h, s_pad=s_pad, p_pad=p_pad,
                      max_bounces=max_bounces, rng_mode=rng_mode,
                      block=block, cull_group=cull_group,
                      interpret=interpret, wf_rows=wf_rows, dbg=(),
                      extract_window=(256 if s_pad > 512 else 0),
                      b_pad=b_pad)
        gen = _compiled_wf_call(center_sample=center, gen=True,
                                n_tiles=local_tiles, cull=cull_gen_b,
                                **common)
        stepc = {
            nt: _compiled_wf_call(center_sample=center, gen=False,
                                  n_tiles=nt, cull=cull, **common)
            for nt in {local_tiles, max(1, local_tiles // 4),
                       max(1, local_tiles // 16)}
        }
        return gen, stepc, n_rays, local_tiles

    def shard_chunk(k, gen, stepc, n_rays, local_tiles, meta, cam_,
                    s_tab_, p_tab_, *btab_):
        aux = ((_block_bounds(s_tab_, block),
                _seed_table(s_tab_, block)) if cull else ())
        off = (jax.lax.axis_index(axis).astype(jnp.int32)
               * jnp.int32(local_tiles * span))
        meta_g = meta.at[4].set(n_rays).at[5].set(off)
        aux_g = aux if cull_gen_b else ()
        state = gen(meta_g, cam_, s_tab_, p_tab_, *btab_, *aux_g)

        def run_bounce(st, b, nt):
            meta_b = meta.at[3].set(b)
            return stepc[nt](meta_b, cam_, s_tab_, p_tab_, *btab_,
                             *aux, st)

        b = 1
        while b < max_bounces:
            if b in sort_schedule:
                state = _sort_state(state, cell_bits, sort_mode)
                if b == shrink_at:
                    break
            state = run_bounce(state, b, local_tiles)
            b += 1
        if b < max_bounces:
            n_live = jnp.sum((state[12] > 0.0).astype(jnp.int32))
            bucket_tiles = [local_tiles, max(1, local_tiles // 4),
                            max(1, local_tiles // 16)]

            def make_tail(nt, b0=b):
                w_sub = nt * span

                def tail(st):
                    sub = st[:, :w_sub] if w_sub < st.shape[1] else st
                    for bb in range(b0, max_bounces):
                        if bb in sort_schedule and bb != b0:
                            sub = _sort_state(sub, cell_bits, sort_mode)
                        sub = run_bounce(sub, bb, nt)
                    if w_sub < st.shape[1]:
                        sub = jnp.concatenate([sub, st[:, w_sub:]], axis=1)
                    return sub

                return tail

            idx = jnp.where(
                n_live <= bucket_tiles[2] * span, 2,
                jnp.where(n_live <= bucket_tiles[1] * span, 1, 0))
            state = jax.lax.switch(
                idx, [make_tail(nt) for nt in bucket_tiles], state)

        # local assembly: each shard owns the contiguous global ray range
        # [off, off + local_tiles*span); ascending ray_id order within the
        # shard == global position order, so the out-spec concatenation
        # yields the full-frame ray-ordered radiance
        ray_id = (jax.lax.bitcast_convert_type(state[13], jnp.int32)
                  & jnp.int32(_ID_MASK))
        out = jax.lax.sort((ray_id, state[9], state[10], state[11]),
                           num_keys=1, is_stable=True)
        return jnp.stack(out[1:], axis=-1)  # (local_rays, 3)

    def make_chunk_fn(k, gen, stepc, n_rays, local_tiles):
        # one chunk per jit program — same HBM rationale as the
        # unsharded driver (the cap is per device here)
        @jax.jit
        def chunk_fn(meta, cam_, s_tab_, p_tab_, *btab_):
            sharded = shard_map(
                functools.partial(shard_chunk, k, gen, stepc, n_rays,
                                  local_tiles),
                mesh=mesh,
                in_specs=(P(),) * (4 + len(btab_)),
                out_specs=P(axis),
                **_SMAP_NOCHECK,
            )
            flat = sharded(meta, cam_, s_tab_, p_tab_,
                           *btab_)  # (n_dev*local, 3)
            chans = []
            for c in range(3):
                v = flat[:, c]
                acc = v[0:n_pix]
                for sm in range(1, k):
                    acc = acc + v[sm * n_pix:(sm + 1) * n_pix]
                chans.append(acc)
            return jnp.stack(chans, axis=-1)

        return chunk_fn

    fn_cache = {}
    chunk_fns = []
    for ci, k in enumerate(chunk_sizes):
        key = (k, ci == 0 and center_first)
        if key not in fn_cache:
            fn_cache[key] = make_chunk_fn(k, *calls_for(*key))
        chunk_fns.append(fn_cache[key])

    def run(metas, cam_, s_tab_, p_tab_, *btab_):
        total = None
        for ci, fn in enumerate(chunk_fns):
            chunk_img = fn(metas[ci], cam_, s_tab_, p_tab_, *btab_)
            total = chunk_img if total is None else total + chunk_img
            if (ci + 1) % 8 == 0:
                jax.block_until_ready(total)
        img = total * jnp.float32(1.0 / spp)
        if gamma:
            img = jnp.sqrt(jnp.maximum(img, 0.0))
        return img.reshape(h, w, 3)

    cam = jnp.concatenate([
        jnp.asarray(scene.camera.position, jnp.float32),
        jnp.asarray(scene.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([
            np.tan(scene.camera.vfov * 0.5), w / h, scene.camera.near, 0.0
        ], jnp.float32),
    ])
    metas = _wf_meta_rows(scene, seed, len(chunk_sizes),
                          n_box=scene.boxes.count if boxes_on else 0)
    return run(metas, cam, s_tab, p_tab, *btab)
