#!/usr/bin/env python
"""Big-scene inverse rendering: optimize albedos in a procedural N-sphere
scene with the blockwise fused forward+backward Pallas kernel.

At hundreds-to-thousands of spheres the jnp autodiff program becomes
uncompilable and the baked-constant megakernel would recompile every step;
the blockwise pipeline (rt_tpu.ops.pallas_blockwise_grad) rebuilds the
primitive tables from the traced parameters on-device each step, so a full
optax loop runs at kernel speed with zero recompiles.

Usage:
    python examples/big_scene_training.py --spheres 500        # real TPU
    python examples/big_scene_training.py --cpu --spheres 24   # interpret mode
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=500)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", default=None, help="WxH (default 400x300)")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU interpret mode (use a small --spheres)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import rt_tpu
    from rt_tpu.train import make_kernel_train_step

    if args.size:
        w, h = (int(x) for x in args.size.split("x"))
    else:
        w, h = (96, 64) if args.cpu else (400, 300)

    scene = rt_tpu.scene.make_procedural_scene(args.spheres)
    true_albedo = scene.materials.albedo

    # target = render with the true albedos; start from gray
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise

    # gamma=False: every gradient pipeline optimizes PRE-gamma radiance
    # (rt_tpu.diff docstring — sqrt gamma has an infinite derivative at 0),
    # so targets must be rendered pre-gamma too
    target = render_forward_blockwise(
        scene, (w, h), seed=0, spp=args.spp, max_bounces=4, gamma=False,
        rng_impl="hash" if args.cpu else "hw", interpret=args.cpu,
    )
    params = {"materials.albedo": jnp.full_like(true_albedo, 0.5)}

    optimizer = optax.adam(5e-2)
    # routes to the wavefront record/reverse pipeline for many-primitive
    # scenes (>=1024 padded — the TRAIN crossover sits below the
    # forward-only 2048), the pixel-major blockwise step below
    step = make_kernel_train_step(
        optimizer, scene, jnp.asarray(target), (w, h),
        spp=args.spp, max_bounces=4,
        rng_impl="hash" if args.cpu else "hw", interpret=args.cpu,
    )

    opt_state = optimizer.init(params)
    import time

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, i)
        if i % 5 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6f}")
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.steps
    # the inverse problem is under-constrained at demo sizes (some of the
    # 12 materials barely appear in the image), so albedo recovery is not
    # the right success metric — image-space error against a held-out
    # render (fresh seed) is what the loss actually optimizes
    import dataclasses

    def render_with(albedo, seed):
        sc = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials,
                                                 albedo=albedo))
        return render_forward_blockwise(
            sc, (w, h), seed=seed, spp=args.spp, max_bounces=4, gamma=False,
            rng_impl="hash" if args.cpu else "hw", interpret=args.cpu)

    holdout = render_with(true_albedo, seed=12345)
    img0 = render_with(jnp.full_like(true_albedo, 0.5), seed=12345)
    img1 = render_with(params["materials.albedo"], seed=12345)
    e0 = float(jnp.abs(img0 - holdout).mean())
    e1 = float(jnp.abs(img1 - holdout).mean())
    print(f"{dt * 1e3:.1f} ms/step; held-out image MAE {e0:.4f} -> {e1:.4f}")


if __name__ == "__main__":
    main()
