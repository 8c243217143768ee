#!/usr/bin/env python
"""Sharded rendering demo: path-trace one frame over a device mesh.

Shards camera rays over the 'rays' mesh axis (and optionally the sphere
table over 'prims' — the reference's only parallelism is a thread pool over
pixels, mg_ray_tracer.cpp:203-204; here the same work rides a
jax.sharding.Mesh with XLA collectives assembling the framebuffer).

The sharded frame is bit-identical to the single-device one: RNG streams
are keyed by global ray-chunk index, not by device.

Usage:
    python examples/sharded_render.py                  # real devices
    python examples/sharded_render.py --virtual 8      # 8 virtual CPU devices
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N devices on CPU (XLA host-device split)")
    ap.add_argument("--scene", default="scenes/basic.toml")
    ap.add_argument("--size", default="400x300")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--prims", type=int, default=1,
                    help="shard the sphere table this many ways ('prims' axis)")
    ap.add_argument("--out", default="/tmp/sharded.png")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import rt_tpu
    from rt_tpu import dist

    n = len(jax.devices())
    mesh = dist.make_mesh(n // args.prims, args.prims)
    print(f"mesh: {n} devices as rays={n // args.prims} x prims={args.prims}")

    w, h = (int(x) for x in args.size.split("x"))
    scene = rt_tpu.load(args.scene)
    key = rt_tpu.rng.make_key(0)

    # bit-identity holds when both paths use the same ray_chunk (RNG streams
    # are keyed by global chunk index)
    chunk = 1024
    img = dist.render_image_sharded(scene, (w, h), key, mesh, spp=args.spp,
                                    ray_chunk=chunk)
    single = rt_tpu.integrator.render_image(scene, (w, h), key, spp=args.spp,
                                            ray_chunk=chunk)
    print("sharded == single-device:",
          bool(np.array_equal(np.asarray(img), np.asarray(single))))

    rt_tpu.image.write_png(args.out, np.asarray(img))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
