#!/usr/bin/env python
"""Reproduce the config-5 END-TO-END frame (BENCH_TABLE last row):
3840x2160 @256spp depth 8 over 5000 procedural spheres through the
bounce-major wavefront pipeline (rt_tpu.ops.pallas_wavefront), writing
docs/config5_4k_preview.png and printing the wall time.

This is the one BENCH_TABLE row tools/bench_table.py does NOT re-measure
(several minutes of wall time); run it directly on the TPU — or, through
the remote tunnel, as a tools/tpu_worker job so the first compile cannot
be mistaken for a hang.

Usage: python tools/render_4k.py [--spp 256] [--spp-chunk 8] [--out PATH]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--spp-chunk", type=int, default=8)
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "docs",
                                         "config5_4k_preview.png"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import numpy as np

    import rt_tpu
    from rt_tpu.ops.pallas_wavefront import render_forward_wavefront

    w, h = (int(v) for v in args.size.split("x"))
    scene = rt_tpu.scene.make_procedural_scene(5000)

    # warm the compile (one tiny chunk shape is enough to hit .jax_cache
    # for the bounce kernels; the full-frame program compiles on first use)
    t0 = time.perf_counter()
    img = render_forward_wavefront(
        scene, (w, h), seed=0, spp=args.spp, spp_chunk=args.spp_chunk,
        max_bounces=8)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    rays = w * h * args.spp
    print(f"{w}x{h} @{args.spp}spp d8, 5000 spheres: {dt:.1f} s wall "
          f"({rays / dt / 1e6:.2f} Mrays/s) — includes first-run compile "
          "if .jax_cache was cold", flush=True)

    arr = np.asarray(img)
    # preview at quarter resolution to keep the repo small
    rt_tpu.image.write_png(args.out, arr[::2, ::2])
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
