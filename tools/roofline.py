#!/usr/bin/env python
"""Roofline / MFU accounting for the hot kernels (round-5 VERDICT item 4).

"29x the CPU baseline" says nothing about how much single-chip headroom
remains.  This script states it in chip terms:

1. **Measured VPU f32 peak** — a Pallas microkernel of pure chained FMAs
   on (8,128) tiles resident in VMEM (no memory traffic in the loop).
   Empirical by design: the achieved-FLOPs ceiling of the exact unit the
   scan runs on, measured on THIS chip in THIS session, no spec-sheet
   numbers to mis-cite.
2. **The lean scan's arithmetic** — ops per (sphere, ray) pair counted
   from pallas_blockwise.lean_spheres (the per-block code): 3 subs +
   5 (bq) + 7 (c0) + 2 (disc) + 1 sqrt + 2 roots + ~4 select/compare for
   t + ~6 min/tie-break = ~30 VPU ops; sqrt retires on the slower
   transcendental path, so 30 is a lower bound on issue slots.
3. **Achieved prim-tests/s** — the blockwise forward on the 5000-sphere
   config-5 slice (the BENCH_TABLE number), times ops/test, over the
   measured peak = the scan's VPU utilisation.
4. **Wavefront live-ray accounting** — the wavefront's win is skipping
   dead lanes, so its honest rate is per LIVE ray-bounce: sum of the
   per-bounce live fractions (measured by replaying the live counts)
   rescales the same roofline.

Usage: python tools/roofline.py  (on the TPU; writes docs/ROOFLINE.md)
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure_vpu_peak(k_fma=4096):
    """Chained-FMA Pallas kernel: 2 flops/op-slot, everything in VMEM.

    VALIDITY caveat (measured, jobs 55/58/59/60): through the remote
    axon tunnel this microbenchmark reads 334-850 TFLOP/s — physically
    impossible for a VPU — under every de-optimization guard tried
    (runtime coefficients, per-rep inputs, program-id-dependent chains).
    The repo's standing note says sub-ms dispatches through the tunnel
    are untrustworthy, and these reps measure ~20 us.  main() therefore
    validates it by K-SCALING (4x the chain must cost ~4x the time) and
    falls back to the scan-saturation anchor when the scaling check
    fails.  Kept as a recorded negative + a ready probe for a locally
    attached chip."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = k_fma         # FMAs per element per grid step
    ROWS = 256        # (ROWS, 128) tile per grid step
    GRID = 64

    def kernel(x_ref, o_ref):
        a = x_ref[...] * (1.0 + pl.program_id(0).astype(jnp.float32)
                          * jnp.float32(1e-9))
        m1 = a * jnp.float32(0.4999999) + jnp.float32(0.5)   # ~1.0
        m2 = a * jnp.float32(0.5000001) + jnp.float32(0.5)
        d = a * jnp.float32(1e-7)
        b = a
        c = a + d
        for _ in range(K // 2):
            # two independent chains so the issue pipeline stays full
            b = b * m1 + d
            c = c * m2 - d
        o_ref[...] = b + c

    call = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, 128), jnp.float32),
    )
    xs = [jnp.full((ROWS, 128), 1.0 + 1e-6 * i, jnp.float32)
          for i in range(8)]
    jax.block_until_ready(call(xs[0]))
    reps = 16
    t0 = time.perf_counter()
    for i in range(reps):
        out = call(xs[i % 8])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * K * ROWS * 128 * GRID
    return flops / dt / 1e12, dt


def measure_scan_saturation():
    """Depth-1 overhead probe: the lean scan with ONE bounce (every lane
    live) isolates the per-frame fixed costs — measured 3x lower
    per-test than the 8-bounce kernel, which shows the deep-bounce
    kernel is in the scan-bound regime (the fixed costs amortize), not
    the other way around."""
    import jax

    import rt_tpu
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise
    from rt_tpu.profiling import sustained

    s5k = rt_tpu.scene.make_procedural_scene(5000)
    size, spp = (1280, 720), 2

    def probe(i):
        return render_forward_blockwise(s5k, size, seed=i, spp=spp,
                                        max_bounces=1, cull=False)

    t = sustained(probe, iters=2, windows=5)["median"]
    tests = size[0] * size[1] * spp * 1 * 5120
    return tests / t, t


SCAN_OPS_PER_TEST = 30  # counted from lean_spheres (see module docstring)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import numpy as np

    import rt_tpu
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise
    from rt_tpu.ops.pallas_wavefront import render_forward_wavefront
    from rt_tpu.profiling import interleaved

    # FMA microbench + K-scaling validity check (see measure_vpu_peak)
    tf_1k, dt_1k = measure_vpu_peak(1024)
    tf_4k, dt_4k = measure_vpu_peak(4096)
    scaling = dt_4k / max(dt_1k, 1e-12)
    peak_valid = 2.5 <= scaling <= 6.0
    verdict = "VALID" if peak_valid else "INVALID - tunnel artefact"
    print(f"FMA microbench: K=1024 -> {tf_1k:.2f} TF, K=4096 -> "
          f"{tf_4k:.2f} TF, time-scaling {scaling:.2f}x ({verdict})",
          flush=True)

    sat_rate, sat_t = measure_scan_saturation()

    s5k = rt_tpu.scene.make_procedural_scene(5000)
    size, spp, depth = (960, 540), 2, 8
    s_pad = 5120

    def bw(i):
        return render_forward_blockwise(s5k, size, seed=i, spp=spp,
                                        max_bounces=depth)

    def wf(i):
        return render_forward_wavefront(s5k, size, seed=i, spp=spp,
                                        max_bounces=depth)

    res = interleaved([(bw, 2), (wf, 3)], windows=5)
    t_bw, t_wf = [r["median"] for r in res]
    rays = size[0] * size[1] * spp
    tests_bw = rays * depth * s_pad
    rate_bw = tests_bw / t_bw
    flops_bw = rate_bw * SCAN_OPS_PER_TEST
    print(f"blockwise config-5: {t_bw*1e3:.1f} ms  {rate_bw/1e12:.3f} T "
          f"prim-tests/s  ~{flops_bw/1e12:.1f} TFLOP/s", flush=True)
    print(f"depth-1 probe (fixed-overhead bound): "
          f"{sat_rate/1e12:.3f} T prim-tests/s ({sat_t*1e3:.1f} ms)",
          flush=True)

    live_frac = _live_profile(s5k, depth)
    eff_depth = float(np.sum(live_frac))
    tests_wf = rays * eff_depth * s_pad
    rate_wf = tests_wf / t_wf
    print(f"wavefront config-5: {t_wf*1e3:.1f} ms  live-weighted depth "
          f"{eff_depth:.2f}/{depth}  {rate_wf/1e12:.3f} T LIVE "
          f"prim-tests/s", flush=True)

    # issue-slot accounting against the VPU's known GEOMETRY (the only
    # spec-independent statement available: 8x128 = 1024 lanes, 1 FMA =
    # 2 flops/lane/slot); the chip clock is the unknown.
    slots_ghz = flops_bw / (2.0 * 1024) / 1e9
    sat_ratio = rate_bw / max(sat_rate, 1e-9)
    md = ["# ROOFLINE — single-chip scan utilisation (measured, v5e-1)", ""]
    if peak_valid:
        md += [
            "**Measured VPU f32 peak** (chained-FMA Pallas microkernel,",
            f"K-scaling check passed: 4x the chain cost {scaling:.2f}x the",
            f"time): **{tf_4k:.1f} TFLOP/s** — the scan rows below state",
            "utilisation against this number.",
        ]
    else:
        md += [
            "**Why there is no absolute-TFLOP peak row.**  A chained-FMA",
            "Pallas microbenchmark read 256-962 TFLOP/s through the remote",
            "tunnel — physically impossible — under every de-optimization",
            "guard tried (runtime coefficients, varied inputs,",
            "program-id-dependent chains), and the built-in K-scaling check",
            f"proves the reads void: 4x the chain cost {scaling:.2f}x the",
            "time (jobs 55/58-61).  Consistent with the repo's standing note",
            "that sub-ms dispatches through the tunnel are untrustworthy;",
            "recorded as a negative, probe kept for locally attached chips.",
        ]
    md += [
        "",
        "| Quantity | Value |",
        "|---|---|",
        f"| blockwise config-5 scan rate (8 bounces) | "
        f"{rate_bw/1e12:.3f} T prim-tests/s = ~{flops_bw/1e12:.1f} "
        f"TFLOP/s at ~{SCAN_OPS_PER_TEST} counted ops/test"
        + (f" = {flops_bw / (tf_4k * 1e12):.0%} of the measured FMA peak"
           if peak_valid else "") + " |",
        f"| implied VPU issue rate | {slots_ghz:.2f} G FMA-slots/s/lane "
        "(vs a ~1-1.7 GHz clock x up-to-4 ALUs/lane: the scan sustains "
        "roughly one vector op per lane-cycle — issue-bound, not "
        "memory-bound) |",
        f"| depth-1 probe | {sat_rate/1e12:.3f} T prim-tests/s: "
        f"{sat_ratio:.1f}x lower "
        "per test — per-frame fixed costs (raygen/assembly/dispatch) "
        "dominate shallow frames, i.e. the 8-bounce kernel is the "
        "scan-bound regime |",
        f"| wavefront same slice | {t_wf*1e3:.1f} ms, live-weighted "
        f"depth {eff_depth:.2f}/{depth} -> {rate_wf/1e12:.3f} T LIVE "
        "prim-tests/s (it wins by ISSUING ~5x fewer tests, trading away "
        "per-test efficiency for compaction/sorts/state I/O) |",
        f"| wavefront / blockwise ratio (interleaved, the stable number) "
        f"| {t_bw/t_wf:.2f}x |",
        "",
        "Reading: the deep-bounce blockwise scan is issue-bound at",
        "roughly a vector op per lane-cycle — the reference's linear-scan",
        "semantics have little single-chip headroom left in the scan",
        "loop itself.  Further forward gains must come from issuing",
        "FEWER tests (the wavefront's compaction + windowed extract, the",
        "measured cull) or more chips (the sharded paths), not from",
        "scanning faster.  All rows are session-dependent absolutes;",
        "ratios within one run are the stable numbers.",
    ]
    with open(os.path.join(REPO, "docs", "ROOFLINE.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("wrote docs/ROOFLINE.md", flush=True)


def _live_profile(scene, depth):
    """Per-bounce live fraction, MEASURED by stepping the real wavefront
    bounce kernels on a small frame and counting state row 12 (a property
    of the scene/materials, independent of frame size to MC noise)."""
    import jax.numpy as jnp
    import numpy as np

    from rt_tpu.ops.pallas_blockwise import (_bucket, _padded_table)
    from rt_tpu.ops.pallas_render import _flatten_primitives
    from rt_tpu.ops.pallas_wavefront import _compiled_wf_call

    w, h = 192, 108
    n_rays = w * h
    span = 512
    n_tiles = -(-n_rays // span)
    s_cols, p_cols = _flatten_primitives(scene, "mg")
    s_pad = _bucket(scene.spheres.count)
    p_pad = _bucket(scene.planes.count)
    s_tab = jnp.asarray(_padded_table(s_cols, s_pad))
    p_tab = jnp.asarray(_padded_table(p_cols, p_pad))
    import numpy as _np
    cam = jnp.concatenate([
        jnp.asarray(scene.camera.position, jnp.float32),
        jnp.asarray(scene.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([_np.tan(scene.camera.vfov * 0.5), w / h,
                     scene.camera.near, 0.0], jnp.float32)])
    common = dict(width=w, height=h, s_pad=s_pad, p_pad=p_pad,
                  max_bounces=depth, rng_mode="reference", block=128,
                  cull=False, cull_group=1, interpret=False, wf_rows=4,
                  dbg=(), extract_window=0)
    gen = _compiled_wf_call(center_sample=True, gen=True,
                            n_tiles=n_tiles, **common)
    stp = _compiled_wf_call(center_sample=True, gen=False,
                            n_tiles=n_tiles, **common)
    meta = jnp.asarray([3, scene.spheres.count, scene.planes.count,
                        0, n_rays, 0, 0, 0], jnp.int32)
    state = gen(meta, cam, s_tab, p_tab)
    fracs = [1.0]
    for b in range(1, depth):
        fracs.append(float(jnp.sum(state[12] > 0.0)) / n_rays)
        state = stp(meta.at[3].set(b), cam, s_tab, p_tab, state)
    return np.asarray(fracs)


if __name__ == "__main__":
    main()
