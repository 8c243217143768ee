#!/usr/bin/env python
"""On-device smoke + statistical parity suite (run on real TPU).

CPU pytest can't execute the Pallas megakernel (no Mosaic CPU lowering for
the PRNG primitives), so this script is the on-hardware counterpart: it
renders the bundled scenes with both the jnp wavefront and the megakernel
and checks agreement with two complementary gates (round-3 VERDICT item 7
— the old flat 0.01/0.06 thresholds sat far above the MC noise floor at
64 spp, loose enough to hide an estimator-level bug):

* **self-calibrated MC gate**: the pallas-vs-jnp image difference must
  look like the jnp-vs-jnp difference at a fresh key — same estimator,
  independent draws.  The mean gap is bounded by 4 standard errors of the
  measured same-estimator noise, the per-pixel MAD by 1.35x its measured
  same-estimator level (margin for the hw-PRNG vs threefry draw
  distributions; a one-bounce-short kernel moves the sky term by many
  sigma and trips both).
* **deterministic centre-sample gate**: spp=1, 1 bounce, hash RNG — no
  randomness survives, so the kernel must match the jnp render to FMA
  noise (fraction of pixels differing > 2e-5 bounded by 0.1%); a
  systematic estimator slip cannot hide behind statistics here.

``--selftest`` proves the gates bite: it feeds them a deliberately
one-bounce-short jnp render as the "kernel" and asserts they FAIL.

Usage: python tools/tpu_smoke.py [--quick] [--selftest]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mc_gate(pk, jn, jn2, label):
    """Cross-implementation difference (pk vs jn) gated against the
    same-estimator difference (jn vs jn2, independent keys).  Returns
    (ok, message)."""
    import numpy as np

    d = pk - jn
    r = jn - jn2
    se_ref = float(r.std()) / np.sqrt(r.size) + 1e-6
    mad_ref = float(np.abs(r).mean()) + 1e-5
    dmean = abs(float(d.mean()))
    mad = float(np.abs(d).mean())
    ok = dmean <= 4.0 * se_ref and mad <= 1.35 * mad_ref
    msg = (f"{label}: dmean {dmean:.5f} (limit {4*se_ref:.5f}) "
           f"MAD {mad:.5f} (limit {1.35*mad_ref:.5f})")
    return ok, msg


def det_gate(pk, jn, label, frac_limit=1e-3):
    """Deterministic path: bounded fraction of pixels beyond FMA noise."""
    import numpy as np

    bad = float((np.abs(pk - jn) > 2e-5).mean())
    return bad <= frac_limit, (f"{label}: frac>2e-5 = {bad:.5f} "
                               f"(limit {frac_limit})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--selftest", action="store_true",
                    help="prove the gates catch a one-bounce-short kernel")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import rt_tpu
    from rt_tpu.ops.pallas_render import render_forward_pallas

    spp = 16 if args.quick else 64
    size = (200, 150)
    failures = 0

    def jnp_render(s, key_seed, personality, bounces=8):
        return np.asarray(rt_tpu.integrator.render_image(
            s, size, rt_tpu.rng.make_key(key_seed), spp=spp,
            max_bounces=bounces, personality=personality))

    if args.selftest:
        # Inject the bug the gates must catch: a kernel that traces one
        # bounce short.  Simulated with the jnp renderer itself so the
        # difference is EXACTLY the estimator slip, no implementation noise.
        s = rt_tpu.load("scenes/basic.toml")
        jn = jnp_render(s, 1, "mg")
        jn2 = jnp_render(s, 2, "mg")
        bugged = jnp_render(s, 3, "mg", bounces=7)
        ok, msg = mc_gate(bugged, jn, jn2, "selftest one-bounce-short")
        print(f"[{'FAIL (good: gate caught it)' if not ok else 'BAD: gate missed the bug'}] {msg}")
        # deterministic gate selftest: shift the centre sample half a pixel
        det_ref = np.asarray(render_forward_pallas(
            s, size, seed=0, spp=1, max_bounces=1, center_sample=True,
            rng_impl="hash", gamma=False))
        jn_det = np.asarray(rt_tpu.integrator.render_image(
            s, size, rt_tpu.rng.make_key(0), spp=1, max_bounces=2,
            gamma=False))
        ok2, msg2 = det_gate(det_ref, jn_det, "selftest det depth-slip")
        print(f"[{'FAIL (good: gate caught it)' if not ok2 else 'BAD: gate missed the bug'}] {msg2}")
        return 0 if (not ok and not ok2) else 1

    for scene_file, personality in [
        ("scenes/basic.toml", "mg"),
        ("scenes/dielectric.toml", "sm"),
        ("scenes/cornell_spheres.toml", "sm"),
    ]:
        s = rt_tpu.load(scene_file)
        t0 = time.time()
        pk = np.asarray(render_forward_pallas(
            s, size, seed=1, spp=spp, max_bounces=8, personality=personality))
        t_pallas = time.time() - t0
        t0 = time.time()
        jn = jnp_render(s, 1, personality)
        t_jnp = time.time() - t0
        jn2 = jnp_render(s, 2, personality)
        ok, msg = mc_gate(pk, jn, jn2, f"{scene_file} ({personality})")
        failures += not ok
        print(f"[{'ok ' if ok else 'FAIL'}] {msg} "
              f"(pallas {t_pallas:.1f}s, jnp {t_jnp:.1f}s)")

    # deterministic centre-sample hardware check (hash RNG, spp=1, d=1:
    # only the primary hit + sky survive — any estimator slip is systematic)
    s = rt_tpu.load("scenes/basic.toml")
    det_pk = np.asarray(render_forward_pallas(
        s, size, seed=0, spp=1, max_bounces=1, center_sample=True,
        rng_impl="hash", gamma=False))
    det_jn = np.asarray(rt_tpu.integrator.render_image(
        s, size, rt_tpu.rng.make_key(0), spp=1, max_bounces=1, gamma=False))
    ok, msg = det_gate(det_pk, det_jn, "deterministic centre-sample")
    failures += not ok
    print(f"[{'ok ' if ok else 'FAIL'}] {msg}")

    # blockwise megakernel: dynamic-table path (small scene + >640-prim scene)
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise

    for scene_file, personality in [("scenes/basic.toml", "mg"),
                                    ("scenes/dielectric.toml", "sm")]:
        s = rt_tpu.load(scene_file)
        bw = np.asarray(render_forward_blockwise(
            s, size, seed=1, spp=spp, max_bounces=8, personality=personality))
        jn = jnp_render(s, 1, personality)
        jn2 = jnp_render(s, 2, personality)
        ok, msg = mc_gate(bw, jn, jn2, f"{scene_file} (blockwise "
                                       f"{personality})")
        failures += not ok
        print(f"[{'ok ' if ok else 'FAIL'}] {msg}")

    big = rt_tpu.scene.make_procedural_scene(700)
    bw = np.asarray(render_forward_blockwise(big, (160, 120), seed=1,
                                             spp=2, max_bounces=4))
    ok = np.isfinite(bw).all() and 0.05 < bw.mean() < 0.98
    failures += not ok
    print(f"[{'ok ' if ok else 'FAIL'}] 700-sphere blockwise: mean {bw.mean():.4f}")

    # wavefront pipeline vs blockwise hash (same estimator, same draws —
    # agreement is float-association-level, gate via the deterministic rule)
    from rt_tpu.ops.pallas_wavefront import render_forward_wavefront

    wf = np.asarray(render_forward_wavefront(
        big, (160, 120), seed=1, spp=2, max_bounces=4))
    bwh = np.asarray(render_forward_blockwise(
        big, (160, 120), seed=1, spp=2, max_bounces=4, rng_impl="hash"))
    ok, msg = det_gate(wf, bwh, "wavefront vs blockwise (same draws)",
                       frac_limit=5e-3)
    failures += not ok
    print(f"[{'ok ' if ok else 'FAIL'}] {msg}")

    # fused fwd+bwd (default mono+lean pipeline): FD check on a smooth
    # parameter through the kernel's own loss (same seed -> same draws)
    import jax.numpy as jnp

    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    s = rt_tpu.load("scenes/basic.toml")
    params = diff.extract_params(s)
    small = (200, 150)
    tgt = jnp.zeros((small[1], small[0], 3), jnp.float32)
    kw = dict(spp=2, max_bounces=4, seed=17)
    _, g0 = pallas_mse_loss_and_grad(params, s, tgt, small, **kw)
    eps = 1e-3
    name = "materials.reflectivity"
    p_hi = dict(params); p_hi[name] = params[name].at[0].set(params[name][0] + eps)
    p_lo = dict(params); p_lo[name] = params[name].at[0].set(params[name][0] - eps)
    l_hi, _ = pallas_mse_loss_and_grad(p_hi, s, tgt, small, **kw)
    l_lo, _ = pallas_mse_loss_and_grad(p_lo, s, tgt, small, **kw)
    fd = (float(l_hi) - float(l_lo)) / (2 * eps)
    an = float(g0[name][0])
    ok = abs(an - fd) <= max(2e-2 * abs(fd), 1e-4)
    failures += not ok
    print(f"[{'ok ' if ok else 'FAIL'}] fused grad FD: an {an:.6f} fd {fd:.6f}")

    # wavefront fused fwd+bwd (round 5): loss == the forward frame's MSE
    # (the record pass IS the frame) + FD on a smooth parameter
    from rt_tpu.ops.pallas_wavefront_grad import make_wf_mse_step

    wstep = make_wf_mse_step(params, s, tgt, small, spp=2, max_bounces=4)
    wl, wg = wstep(17)
    wimg = np.asarray(render_forward_wavefront(
        s, small, seed=17, spp=2, max_bounces=4, gamma=False))
    ok = abs(float(wl) - float(np.mean(wimg ** 2))) < 1e-6
    failures += not ok
    print(f"[{'ok ' if ok else 'FAIL'}] wavefront-grad loss == forward MSE "
          f"({float(wl):.6f})")
    l_hi = float(make_wf_mse_step(p_hi, s, tgt, small, spp=2,
                                  max_bounces=4)(17)[0])
    l_lo = float(make_wf_mse_step(p_lo, s, tgt, small, spp=2,
                                  max_bounces=4)(17)[0])
    fd = (l_hi - l_lo) / (2 * eps)
    an = float(wg[name][0])
    ok = abs(an - fd) <= max(2e-2 * abs(fd), 1e-4)
    failures += not ok
    print(f"[{'ok ' if ok else 'FAIL'}] wavefront-grad FD: an {an:.6f} "
          f"fd {fd:.6f}")

    # throughput headline
    img = render_forward_pallas(s, (800, 600), seed=2, spp=4, max_bounces=8)
    jax.block_until_ready(img)
    iters = 5 if args.quick else 20
    t0 = time.time()
    for i in range(iters):
        img = render_forward_pallas(s, (800, 600), seed=3 + i, spp=4, max_bounces=8)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / iters
    print(f"megakernel 800x600@4spp: {dt*1000:.2f} ms = "
          f"{800*600*4/dt/1e6:.0f} Mrays/s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
