#!/usr/bin/env python
"""On-device smoke + statistical parity suite (run on real TPU).

CPU pytest can't execute the Pallas megakernel (no Mosaic CPU lowering for
the PRNG primitives), so this script is the on-hardware counterpart: it
renders the bundled scenes with both the jnp wavefront and the megakernel,
checks statistical agreement (same estimator, different RNG streams — the
difference must look like Monte-Carlo noise), and prints throughput.

Usage: python tools/tpu_smoke.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
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
        jn = np.asarray(rt_tpu.integrator.render_image(
            s, size, rt_tpu.rng.make_key(1), spp=spp, max_bounces=8,
            personality=personality))
        t_jnp = time.time() - t0
        mad = float(np.abs(pk - jn).mean())
        dmean = abs(float(pk.mean()) - float(jn.mean()))
        # Monte-Carlo agreement: mean within noise, per-pixel MAD bounded
        ok = dmean < 0.01 and mad < 0.06
        status = "ok " if ok else "FAIL"
        failures += not ok
        print(f"[{status}] {scene_file} ({personality}): "
              f"pallas mean {pk.mean():.4f} jnp {jn.mean():.4f} "
              f"MAD {mad:.4f} (pallas {t_pallas:.1f}s, jnp {t_jnp:.1f}s)")

    # blockwise megakernel: dynamic-table path (small scene + >640-prim scene)
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise

    for scene_file, personality in [("scenes/basic.toml", "mg"),
                                    ("scenes/dielectric.toml", "sm")]:
        s = rt_tpu.load(scene_file)
        bw = np.asarray(render_forward_blockwise(
            s, size, seed=1, spp=spp, max_bounces=8, personality=personality))
        jn = np.asarray(rt_tpu.integrator.render_image(
            s, size, rt_tpu.rng.make_key(1), spp=spp, max_bounces=8,
            personality=personality))
        mad = float(np.abs(bw - jn).mean())
        dmean = abs(float(bw.mean()) - float(jn.mean()))
        ok = dmean < 0.01 and mad < 0.06
        failures += not ok
        print(f"[{'ok ' if ok else 'FAIL'}] {scene_file} (blockwise "
              f"{personality}): mean {bw.mean():.4f} jnp {jn.mean():.4f} "
              f"MAD {mad:.4f}")

    big = rt_tpu.scene.make_procedural_scene(700)
    bw = np.asarray(render_forward_blockwise(big, (160, 120), seed=1,
                                             spp=2, max_bounces=4))
    ok = np.isfinite(bw).all() and 0.05 < bw.mean() < 0.98
    failures += not ok
    print(f"[{'ok ' if ok else 'FAIL'}] 700-sphere blockwise: mean {bw.mean():.4f}")

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
