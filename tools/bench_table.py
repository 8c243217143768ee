#!/usr/bin/env python
"""Measure the five BASELINE.json configs on the attached TPU chip and write
BENCH_TABLE.md.

Configs 4/5 name pod-scale shapes (v5e-8 / multi-host); with one chip those
rows report single-chip rates on the same scenes (the sharded paths are
validated separately on the virtual CPU mesh — tests/test_dist.py,
tests/test_pallas_blockwise.py).  Config 5's full frame (4K @ 256 spp) is
rate-measured on a slice, not rendered end-to-end.

Usage: python tools/bench_table.py [--fast]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="shrink spp for a quick pass")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    import rt_tpu
    from rt_tpu import diff
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise
    from rt_tpu.ops.pallas_grad import make_mse_step
    from rt_tpu.ops.pallas_render import make_render_step, render_forward_pallas

    rows = []

    def timeit(fn, reps=3):
        out = fn(0)
        jax.block_until_ready(out)
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = fn(i + 1)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    from rt_tpu.profiling import interleaved as _interleaved
    from rt_tpu.profiling import sustained as _sustained

    def sustained(step, iters=32):
        """Unified measurement: MEDIAN of 5 pipelined windows (the same
        rt_tpu.profiling.sustained bench.py uses — round-2 VERDICT item 5:
        one methodology everywhere, dispersion available)."""
        return _sustained(step, iters=iters, windows=5)["median"]

    def interleaved(steps, windows=9):
        """Same-state A/B: round-robin windows (rt_tpu.profiling.
        interleaved — the bench.py fwd_ref discipline, windows=9 to
        match).  EVERY ratio in this table comes from one of these calls:
        the chip drifts enough within a session that ratios of two
        sequential measurement blocks are noise (the round-4 committed
        table carried a physically impossible 0.46x step/fwd row from
        exactly that — VERDICT r4 'what's weak' item 1)."""
        return [m["median"]
                for m in _interleaved(steps, windows=windows)]

    # --- native CPU baseline rates (cached; measured on this host) ----------
    # The ratio column for configs 3/4/5 (round-3 VERDICT item 4): the
    # native tracer implements both personalities at matched estimator
    # semantics (native/rt_native.cpp), so TPU/CPU is an apples-to-apples
    # rays/s ratio per scene+depth (rate is spp-invariant; measured at a
    # small spp).
    import json as _json

    _bl_cache_path = os.path.join(REPO, ".baseline_cpu.json")

    def native_mrays(tag, scene, size, spp, personality):
        try:
            cache = _json.load(open(_bl_cache_path))
        except Exception:
            cache = {}
        key = f"cfg:{tag}"
        if key in cache:
            return cache[key]
        from rt_tpu import _native

        if not _native.available():
            os.system(f"make -C {os.path.join(REPO, 'native')} >/dev/null 2>&1")
            _native._TRIED = False
        if not _native.available():
            return 0.0
        _native.render_cpu(scene, size, spp=1, max_bounces=8,
                           personality=personality)
        _, secs = _native.render_cpu(scene, size, spp=spp, max_bounces=8,
                                     personality=personality)
        rate = size[0] * size[1] * spp / secs / 1e6
        cache[key] = rate
        _json.dump(cache, open(_bl_cache_path, "w"))
        return rate

    def vs_cpu(tpu_mrays, cpu_mrays):
        if not cpu_mrays:
            return "no native lib"
        return f"{tpu_mrays/cpu_mrays:.1f}x the native CPU baseline " \
               f"({cpu_mrays:.2f} Mrays/s)"

    # --- session forward reference (ratio anchor) ---------------------------
    # Absolute rates swing ±25% between sessions (BASELINE.md variance
    # note); every fwd+bwd row below therefore reports its time ratio
    # against THIS step, measured in INTERLEAVED same-state windows
    # (VERDICT r4 item 3 — never from two sequential blocks).
    s = rt_tpu.load("scenes/basic.toml")
    ref_step = make_render_step(s, (800, 600), spp=4, max_bounces=8)
    t_ref = sustained(ref_step, iters=16)
    rows.append(("ref: basic 800x600 @4spp d8 fwd (session ratio anchor)",
                 f"{800*600*4/t_ref/1e6:.0f} Mrays/s ({t_ref*1e3:.2f} ms; "
                 "absolute, session-dependent — each ratio row below "
                 "re-measures this step in interleaved windows)"))

    # --- config 1: basic 200x150 @ 1spp d4, parity posture ------------------
    t_cold, img = timeit(lambda i: render_forward_pallas(
        s, (200, 150), seed=i, spp=1, max_bounces=4))
    step1 = make_render_step(s, (200, 150), spp=1, max_bounces=4)
    step1b = make_render_step(s, (200, 150), spp=1, max_bounces=4, frames=16)
    # per-row anchor (VERDICT r4 item 8): both config-1 rows ratio against
    # the session anchor from the same interleaved windows
    t1, t1b, t_ref_i = interleaved(
        [step1, (step1b, 4), (ref_step, 16)])
    tb = t1b / 16
    rows.append(("1: basic 200x150 @1spp d4 fwd",
                 f"{200*150*1/t1/1e6:.0f} Mrays/s sustained ({t1*1e3:.2f} ms/frame "
                 f"prebuilt step = {t1/t_ref_i:.2f}x the anchor frame time, "
                 f"interleaved; {t_cold*1e3:.1f} ms per blocked eager call — "
                 "host round-trip latency, not compute)"))
    rows.append(("1: basic 200x150 @1spp d4 fwd, 16-frame batched dispatch",
                 f"{200*150*1/tb/1e6:.0f} Mrays/s sustained "
                 f"({tb*1e3:.2f} ms/frame = {tb/t_ref_i:.3f}x the anchor "
                 "frame time, interleaved — k seeds per kernel grid "
                 "amortize the fixed dispatch floor)"))

    # --- config 2: basic 800x600 @ 16spp d8 fwd + fwd/bwd -------------------
    spp2 = 4 if args.fast else 16
    step2 = make_render_step(s, (800, 600), spp=spp2, max_bounces=8)
    t, t_ref_i = interleaved([(step2, 16), (ref_step, 16)])
    rows.append((f"2: basic 800x600 @{spp2}spp d8 fwd",
                 f"{800*600*spp2/t/1e6:.0f} Mrays/s sustained "
                 f"({t*1e3:.1f} ms/frame; {t/t_ref_i/(spp2/4):.2f}x the "
                 "anchor per-spp, interleaved)"))

    params = diff.extract_params(s)
    target = jnp.zeros((600, 800, 3), jnp.float32)
    step = make_mse_step(params, s, target, (800, 600), spp=4, max_bounces=8)
    t, t_ref_i = interleaved([lambda i: step(i)[1], ref_step])
    rows.append(("2: basic 800x600 @4spp d8 fwd+bwd (sphere/material/camera grads)",
                 f"{800*600*4/t/1e6:.0f} Mrays/s ({t*1e3:.1f} ms/step; "
                 f"step/fwd = {t/t_ref_i:.2f}x the session anchor, "
                 "interleaved windows)"))

    # config 2 at its SPECIFIED 16 spp (round-3 VERDICT item 5): the slim
    # stash fits 16 spp in the mono kernel at rows=8 (auto-downshifted;
    # measured 694.7 vs the per-sample pipeline's 569.9 Mrays/s, CV job)
    if not args.fast:
        step16 = make_mse_step(params, s, target, (800, 600), spp=16,
                               max_bounces=8)
        t, t_ref_i = interleaved([(lambda i: step16(i)[1], 8),
                                  (ref_step, 16)])
        rows.append(("2: basic 800x600 @16spp d8 fwd+bwd (SPECIFIED spp; "
                     "slim-stash mono kernel, rows=8)",
                     f"{800*600*16/t/1e6:.0f} Mrays/s ({t*1e3:.1f} ms/step; "
                     f"step/fwd = {t/t_ref_i/4:.2f}x the 4spp anchor "
                     "per-spp, interleaved; FD-checked at 16 spp through "
                     "the mono step, job CW, rel 0.235%)"))

    # --- config 3: dielectric 800x600 @ 64spp sm ----------------------------
    d = rt_tpu.load("scenes/dielectric.toml")
    spp3 = 8 if args.fast else 64
    step3 = make_render_step(d, (800, 600), spp=spp3, max_bounces=8,
                             personality="sm")
    cpu3 = native_mrays("3-sm-dielectric", d, (400, 300), 16, "sm")

    # --- config 3: Fresnel/refraction + camera-pose gradients ---------------
    dparams = diff.extract_params(d)
    dstep = make_mse_step(dparams, d, target, (800, 600), spp=4,
                          max_bounces=8, personality="sm")
    loss, dgrads = dstep(0)
    grad_ok = bool(all(np.all(np.isfinite(np.asarray(g)))
                       for g in dgrads.values())
                   and float(np.abs(np.asarray(dgrads["camera.position"])).max()) > 0
                   and float(np.abs(np.asarray(dgrads["materials.reflectivity"])).max()) > 0)
    # one interleaved group: sm fwd + sm fwd+bwd share the windows, so the
    # step/fwd ratio is same-state
    t3, t = interleaved([(step3, 8), lambda i: dstep(i)[1]])
    sm_fwd_rate = 800*600*spp3/t3/1e6
    rows.append((f"3: dielectric 800x600 @{spp3}spp d8 fwd (sm)",
                 f"{sm_fwd_rate:.0f} Mrays/s sustained "
                 f"({t3*1e3:.1f} ms/frame; {vs_cpu(sm_fwd_rate, cpu3)})"))
    sm_step_rate = 800*600*4/t/1e6
    rows.append(("3: dielectric 800x600 @4spp d8 fwd+bwd "
                 "(IOR/Fresnel + camera-pose grads, sm)",
                 f"{sm_step_rate:.0f} Mrays/s ({t*1e3:.1f} ms/step, "
                 f"grad_ok={grad_ok}; step/fwd = {t/(t3/(spp3//4)):.2f}x "
                 "the session sm fwd per-spp, interleaved; "
                 f"{vs_cpu(sm_step_rate, cpu3)})"))

    # sm/mg gap decomposition (round-4): mg personality on the SAME
    # 7-sphere scene isolates scene tax (linear scan size) from dielectric
    # tax (Fresnel/refraction physics + transpose) — the BASELINE-row
    # ratio conflates the two (pallas_grad.py round-4 docstring table).
    # All four steps share one interleaved round-robin.
    if not args.fast:
        mgd_step = make_mse_step(dparams, d, target, (800, 600), spp=4,
                                 max_bounces=8, personality="mg")
        mg_t, mgd_t, smd_t = interleaved([
            lambda i: step(i)[1],        # mg on basic (3 sph)
            lambda i: mgd_step(i)[1],    # mg on dielectric
            lambda i: dstep(i)[1],       # sm on dielectric
        ])
        rows.append(("3: sm/mg fwd+bwd gap decomposition (@4spp d8, "
                     "interleaved same-state windows)",
                     f"BASELINE-row ratio {mg_t/smd_t:.2f} = 1 / (scene tax "
                     f"{mgd_t/mg_t:.2f}x [7 vs 3 spheres, mg on both] x "
                     f"dielectric tax {smd_t/mgd_t:.2f}x); matched-scene "
                     f"sm/mg = {mgd_t/smd_t:.2f}"))

    # config 3 at its SPECIFIED 64 spp (round-3 VERDICT item 5)
    if not args.fast:
        dstep64 = make_mse_step(dparams, d, target, (800, 600), spp=64,
                                max_bounces=8, personality="sm")
        t, t3_i = interleaved([(lambda i: dstep64(i)[1], 2), (step3, 8)])
        rows.append(("3: dielectric 800x600 @64spp d8 fwd+bwd (SPECIFIED "
                     "spp, sm; per-sample pipeline)",
                     f"{800*600*64/t/1e6:.0f} Mrays/s ({t*1e3:.1f} ms/step; "
                     f"step/fwd = {t/t3_i:.2f}x the session sm @{spp3}spp "
                     "fwd frame, interleaved; FD-checked at 64 spp in "
                     "tools job CW (rel 0.006%))"))

    # --- 96-640-primitive window: fused gradients two ways -----------------
    # (a) the unrolled fused kernel with the lean winner-id stash (auto past
    # the 96-prim payload cap, FD-validated rel err ~0.5% on device);
    # (b) the blockwise grad kernel (runtime tables, no recompile on edits)
    import optax

    s200 = rt_tpu.scene.make_procedural_scene(200)
    from rt_tpu.ops.pallas_blockwise_grad import make_bw_train_step

    small = (400, 300)
    tgt_s = jnp.zeros((small[1], small[0], 3), jnp.float32)
    opt = optax.adam(1e-2)
    p200 = diff.extract_params(s200)
    fstep = make_mse_step(p200, s200, tgt_s, small, spp=2, max_bounces=6,
                          rows=8, mode="multi")
    t = sustained(lambda i: fstep(i)[1], iters=16)
    rows.append(("window: 200-sphere 400x300 @2spp d6 fwd+bwd "
                 "(unrolled fused, lean stash)",
                 f"{small[0]*small[1]*2/t/1e6:.0f} Mrays/s ({t*1e3:.1f} ms/step; "
                 "absolute, session-dependent)"))
    bw_step = make_bw_train_step(opt, s200, tgt_s, small, spp=4, max_bounces=8)
    st = opt.init(p200)

    def one(i, _p=[p200, st]):
        _p[0], _p[1], loss = bw_step(_p[0], _p[1], i)
        return loss

    t = sustained(one, iters=8)
    rows.append(("window: 200-sphere 400x300 @4spp d8 full train step "
                 "(blockwise fwd+bwd, runtime tables)",
                 f"{small[0]*small[1]*4/t/1e6:.0f} Mrays/s ({t*1e3:.1f} ms/step; "
                 "absolute, session-dependent)"))

    # --- config 4: 500-sphere 1080p -----------------------------------------
    s500 = rt_tpu.scene.make_procedural_scene(500)
    spp4 = 4 if args.fast else 16
    t, _ = timeit(lambda i: render_forward_blockwise(
        s500, (1920, 1080), seed=i, spp=spp4, max_bounces=8), reps=2)
    rb = 1920 * 1080 * spp4 * 8
    cpu4 = native_mrays("4-mg-500sph", s500, (480, 270), 8, "mg")
    rows.append((f"4: 500-sphere 1080p @{spp4}spp d8 fwd (blockwise)",
                 f"{rb/t/1e9:.2f} Gray-bounces/s ({t:.2f} s/frame; "
                 f"128 spp ≈ {t*128/spp4:.1f} s; "
                 f"{vs_cpu(1920*1080*spp4/t/1e6, cpu4)}; absolute, "
                 "session-dependent)"))

    # static-scene alternative: the unrolled megakernel (scene baked, per-
    # bounce dead-tile early-out) — recompiles on geometry edits but runs
    # the same frame substantially faster
    step500 = make_render_step(s500, (1920, 1080), spp=spp4, max_bounces=8)
    bw500_fwd = lambda i: render_forward_blockwise(
        s500, (1920, 1080), seed=i, spp=spp4, max_bounces=8)
    t, t_bw4 = interleaved([(step500, 4), (bw500_fwd, 2)], windows=5)
    rows.append((f"4: 500-sphere 1080p @{spp4}spp d8 fwd (unrolled, "
                 "early-out)",
                 f"{rb/t/1e9:.2f} Gray-bounces/s ({t:.2f} s/frame = "
                 f"{t_bw4/t:.2f}x the blockwise frame, interleaved)"))

    # --- config 4: gradients at 500 spheres ---------------------------------
    p500 = diff.extract_params(s500)
    bw500 = make_bw_train_step(opt, s500, tgt_s, small, spp=4, max_bounces=8)
    st5 = opt.init(p500)

    def one5(i, _p=[p500, st5]):
        _p[0], _p[1], loss = bw500(_p[0], _p[1], i)
        return loss

    t = sustained(one5, iters=8)
    rows.append(("4: 500-sphere 400x300 @4spp d8 full train step "
                 "(blockwise fwd+bwd)",
                 f"{small[0]*small[1]*4/t/1e6:.0f} Mrays/s ({t*1e3:.1f} ms/step; "
                 "absolute, session-dependent)"))

    # --- config 4: full train step at the SPECIFIED 1080p shape -------------
    if not args.fast:
        tgt_hd = jnp.zeros((1080, 1920, 3), jnp.float32)
        hd_step = make_bw_train_step(opt, s500, tgt_hd, (1920, 1080), spp=4,
                                     max_bounces=8)
        st_hd = opt.init(p500)

        def one_hd(i, _p=[p500, st_hd]):
            _p[0], _p[1], loss = hd_step(_p[0], _p[1], i)
            return loss

        t = sustained(one_hd, iters=2)
        rows.append(("4: 500-sphere 1920x1080 @4spp d8 full train step "
                     "(blockwise fwd+bwd, specified shape)",
                     f"{1920*1080*4/t/1e6:.1f} Mrays/s ({t*1e3:.0f} ms/step; "
                     f"128 spp ≈ {t*128/4:.0f} s/step; absolute, "
                     "session-dependent)"))

    # --- config 5: 5000-sphere rate on a 4K slice ---------------------------
    # blockwise vs wavefront forwards share one interleaved group so the
    # wavefront speedup claim is same-state
    s5k = rt_tpu.scene.make_procedural_scene(5000)
    rb = 960 * 540 * 2 * 8
    cpu5 = native_mrays("5-mg-5000sph", s5k, (240, 135), 2, "mg")

    from rt_tpu.ops.pallas_wavefront import render_forward_wavefront

    def bw5(i):
        return render_forward_blockwise(s5k, (960, 540), seed=i, spp=2,
                                        max_bounces=8)

    def wf5(i):
        return render_forward_wavefront(s5k, (960, 540), seed=i, spp=2,
                                        max_bounces=8)

    t_bw5, t_wf5 = interleaved([(bw5, 2), (wf5, 4)], windows=5)
    rows.append(("5: 5000-sphere fwd rate (960x540 @2spp d8 slice, blockwise)",
                 f"{rb/t_bw5/1e9:.2f} Gray-bounces/s "
                 f"({rb*5120/t_bw5/1e12:.1f} T prim-tests/s; "
                 f"{vs_cpu(960*540*2/t_bw5/1e6, cpu5)})"))
    rows.append(("5: 5000-sphere fwd rate (same slice, WAVEFRONT)",
                 f"{rb/t_wf5/1e9:.2f} Gray-bounces/s ({t_wf5*1e3:.0f} ms; "
                 f"{t_bw5/t_wf5:.2f}x the pixel-major blockwise kernel, "
                 f"interleaved windows; {vs_cpu(960*540*2/t_wf5/1e6, cpu5)})"))

    # --- config 5: gradients + the end-to-end 4K frame ----------------------
    if not args.fast:
        p5k = diff.extract_params(s5k)
        tgt5 = jnp.zeros((540, 960, 3), jnp.float32)
        g5_step = make_bw_train_step(opt, s5k, tgt5, (960, 540), spp=2,
                                     max_bounces=8)
        st5k = opt.init(p5k)

        def one5k(i, _p=[p5k, st5k]):
            _p[0], _p[1], loss = g5_step(_p[0], _p[1], i)
            return loss

        # round-5 headline: the WAVEFRONT train step (record forward +
        # scan-free reverse) vs the blockwise fused step, same windows
        from rt_tpu.ops.pallas_wavefront_grad import make_wf_train_step

        wfg_step = make_wf_train_step(opt, s5k, tgt5, (960, 540), spp=2,
                                      max_bounces=8)
        st5w = opt.init(p5k)

        def one5w(i, _p=[dict(p5k), st5w]):
            _p[0], _p[1], loss = wfg_step(_p[0], _p[1], i)
            return loss

        t_wfg, t, t_wf5_i = interleaved(
            [(one5w, 2), (one5k, 2), (wf5, 4)], windows=5)
        rows.append(("5: 5000-sphere 960x540 @2spp d8 full train step "
                     "(blockwise fwd+bwd)",
                     f"{960*540*2/t/1e6:.1f} Mrays/s ({t*1e3:.0f} ms/step = "
                     f"{t/t_wf5_i:.2f}x the wavefront forward frame, "
                     "interleaved)"))
        rows.append(("5: 5000-sphere 960x540 @2spp d8 full train step "
                     "(WAVEFRONT fwd+bwd, round 5)",
                     f"{960*540*2/t_wfg/1e6:.1f} Mrays/s "
                     f"({t_wfg*1e3:.0f} ms/step = {t/t_wfg:.2f}x the "
                     f"blockwise step, step/fwd = {t_wfg/t_wf5_i:.2f}x the "
                     "wavefront forward — all interleaved windows)"))
    rows.append(("5: END-TO-END frame — 3840x2160 @256spp d8, 5000 spheres",
                 "STATIC one-off measurement (not re-run by this script): "
                 "337.3 s wall via the wavefront pipeline with the 14-row "
                 "state + tagged int32 ids (6.30 Mrays/s; round-4: 627.7 s, "
                 "round-3 blockwise: 800.6 s).  Same-session chunk A/B: "
                 "8-spp chunks vs the old 2-spp cap = 0.96x — chunk size "
                 "is NOT the lever (sorts scale with rays); the delta is "
                 "the 14-row state + session state.  Preview at "
                 "docs/config5_4k_preview.png — reproduce with "
                 "tools/render_4k.py (as a tpu_worker job through the "
                 "remote tunnel)"))

    md = ["# BENCH_TABLE — measured on the attached TPU chip", "",
          "| Config | Result |", "|---|---|"]
    for k, v in rows:
        md.append(f"| {k} | {v} |")
        print(f"{k}: {v}", flush=True)
    md += [
        "",
        "Notes:",
        "- Every RATIO in this table is measured from INTERLEAVED round-",
        "  robin windows (rt_tpu.profiling.interleaved): the chip's rate",
        "  drifts enough within one session to invert a ratio of two",
        "  sequential measurement blocks.  Rows without a ratio are tagged",
        "  'absolute, session-dependent' (±25% across sessions).",
        "- Sustained rows run prebuilt steps (make_render_step /",
        "  make_mse_step / make_bw_train_step), 8-32 pipelined iterations",
        "  blocked once at the end — the steady interactive/serving/training",
        "  shape.  Single blocked eager calls additionally pay a ~25-50 ms",
        "  host→TPU tunnel round trip (reported separately in row 1).",
        "- fwd+bwd rows use the fused Pallas kernels (unrolled ≤640 prims",
        "  via the lean winner-id stash, blockwise runtime-table kernels",
        "  beyond); gradient convention is detached sampling, FD-validated",
        "  in tests and tools/tpu_smoke.",
        "- Rows 4/5 count potential ray-bounces (W*H*spp*depth); the",
        "  reference's linear-scan semantics make work proportional to",
        "  ray-bounces x primitives.",
        "- Roofline (docs/ROOFLINE.md, tools/roofline.py run on device): the",
        "  deep-bounce blockwise scan is issue-bound at ~1 vector op per",
        "  lane-cycle (0.09-0.14 T prim-tests/s ~= 2.6-4.1 TFLOP/s at ~30",
        "  counted ops/test); the wavefront's live-weighted depth on config-5",
        "  is 1.67/8 bounces, i.e. it wins by issuing ~5x fewer tests.  The",
        "  absolute-TFLOP FMA microbench is INVALID through the remote tunnel",
        "  (K-scaling check fails; recorded negative, probe kept for locally",
        "  attached chips).",
    ]
    with open(os.path.join(REPO, "BENCH_TABLE.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("wrote BENCH_TABLE.md", flush=True)


if __name__ == "__main__":
    main()
