#!/usr/bin/env python
"""Inverse rendering demo: recover a sphere's albedo (and optionally pose)
from a rendered target image.

Usage:
    python examples/inverse_rendering.py [--steps 200] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--out", default="/tmp/inverse_demo")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import rt_tpu
    from rt_tpu import diff, train

    scene = rt_tpu.loads("""
        materials = [
            { type = 'lambert', albedo = [0.85, 0.85, 0.85] },
            { type = 'lambert', albedo = [0.2, 0.45, 0.85] },
            { type = 'metal',   albedo = [0.9, 0.9, 0.9], roughness = 0.1 },
        ]
        spheres = [
            { material = 0, position = [0, -1000, 0], radius = 1000 },
            { material = 1, position = [-0.7, 0.5, 0] },
            { material = 2, position = [0.7, 0.5, 0] },
        ]
        camera = { position = [0, 1, 3], direction = 'forward' }
    """)
    size = (96, 64)
    key = rt_tpu.rng.make_key(0)

    true_params = diff.extract_params(scene)
    target = diff.render_for_loss(true_params, scene, size, key, spp=4, max_bounces=4)

    # corrupt the blue sphere's albedo and optimize it back
    start = dict(true_params)
    start["materials.albedo"] = true_params["materials.albedo"].at[1].set(
        jnp.asarray([0.8, 0.8, 0.2, 1.0])
    )
    start_scene = diff.apply_params(scene, start)

    os.makedirs(args.out, exist_ok=True)
    rt_tpu.image.write_png(os.path.join(args.out, "target.png"),
                           np.sqrt(np.maximum(np.asarray(target), 0)))
    before = diff.render_for_loss(start, scene, size, key, spp=4, max_bounces=4)
    rt_tpu.image.write_png(os.path.join(args.out, "before.png"),
                           np.sqrt(np.maximum(np.asarray(before), 0)))

    params, losses = train.fit(
        start_scene, target, size,
        steps=args.steps, learning_rate=3e-2,
        param_names=["materials.albedo"],
        spp=4, max_bounces=4, log_every=25,
    )
    print("recovered albedo[1]:", np.asarray(params["materials.albedo"][1])[:3],
          " (true: [0.2, 0.45, 0.85])")

    after = diff.render_for_loss({**true_params, **params}, scene, size, key,
                                 spp=4, max_bounces=4)
    rt_tpu.image.write_png(os.path.join(args.out, "after.png"),
                           np.sqrt(np.maximum(np.asarray(after), 0)))
    print(f"wrote {args.out}/{{target,before,after}}.png")


if __name__ == "__main__":
    main()
