"""Blockwise Pallas megakernel tests (rt_tpu.ops.pallas_blockwise).

Unlike the unrolled megakernel (Mosaic-only hardware PRNG), the blockwise
kernel has a portable counter-hash RNG (``rng_impl="hash"``) that is
bit-identical between Mosaic and pallas interpret mode — so the full
estimator runs end-to-end on the CPU test mesh here.  Parity targets:

* deterministic path (1 spp centre sample, 1 bounce: primary hit + sky)
  must match the jnp renderer to float eps;
* full path (multi-spp, full bounces, dielectrics) must match the jnp
  renderer *statistically* — equal-spp MC estimates of the same integral
  (SURVEY.md §4: the reference is nondeterministic, parity is statistical).
"""

import numpy as np
import pytest

import jax.random as jr

import rt_tpu
from rt_tpu.integrator import render_image
from rt_tpu.ops.pallas_blockwise import (
    MAX_BLOCKWISE_PRIMS,
    _bucket,
    blockwise_supported,
    render_forward_blockwise,
)


def _bw(scene, size, **kw):
    kw.setdefault("rng_impl", "hash")
    kw.setdefault("interpret", True)
    return np.asarray(render_forward_blockwise(scene, size, **kw))


def test_supported_gates():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    assert blockwise_supported(s)
    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert' } ]\nboxes = [ { material = 0 } ]\n"
    )
    # round 3: tracer semantics never hit boxes — supported (ignored);
    # only the --boxes extension is out of the blockwise kernel's scope
    assert blockwise_supported(boxy)
    assert not blockwise_supported(boxy, include_boxes=True)


def test_bucket_sizes():
    assert _bucket(3) == 128
    assert _bucket(128) == 128
    assert _bucket(129) == 512
    assert _bucket(500) == 512
    assert _bucket(5000) == 5120


def test_registry_has_blockwise_renderers():
    from rt_tpu import renderer as reg

    assert reg.find_by_name("mg_blockwise") is not None
    assert reg.find_by_name("sm_blockwise") is not None


def test_auto_renderer_cpu_fallback():
    from rt_tpu import renderer as reg

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = np.asarray(reg.create("mg_auto")(s, (32, 24), spp=1, max_bounces=2))
    ref = np.asarray(render_image(s, (32, 24), jr.key(0), spp=1, max_bounces=2))
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_unsupported_scene_raises():
    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert' } ]\nboxes = [ { material = 0 } ]\n"
    )
    # --boxes is the unrolled kernel's / jnp path's job, not blockwise's
    with pytest.raises(ValueError, match="exceeds"):
        render_forward_blockwise(boxy, (8, 8), spp=1, max_bounces=1,
                                 include_boxes=True)
    # tracer semantics (box stub): renders fine, boxes ignored
    img = _bw(boxy, (8, 8), spp=1, max_bounces=1)
    assert np.isfinite(img).all()


def test_deterministic_parity_basic():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img_bw = _bw(s, (64, 48), spp=1, max_bounces=1)
    img_jn = np.asarray(render_image(s, (64, 48), jr.key(0), spp=1, max_bounces=1))
    np.testing.assert_allclose(img_bw, img_jn, atol=1e-5)


def test_deterministic_parity_plane_scene():
    # exercises the plane scan path + plane-vs-sphere tie-breaking
    s = rt_tpu.loads(
        """
samples_per_pixel = 1
max_bounces = 1
materials = [ { type = 'lambert', albedo = 'red' },
              { type = 'metal',   albedo = 'white', roughness = 0.1 } ]
planes  = [ { material = 0 } ]
spheres = [ { material = 1, position = [0.0, 1.0, -3.0], radius = 0.5 } ]
"""
    )
    img_bw = _bw(s, (48, 32), spp=1, max_bounces=1)
    img_jn = np.asarray(render_image(s, (48, 32), jr.key(0), spp=1, max_bounces=1))
    np.testing.assert_allclose(img_bw, img_jn, atol=1e-5)


@pytest.mark.parametrize(
    "path,pers",
    [
        ("/root/reference/scenes/basic.toml", "mg"),
        ("/root/reference/scenes/dielectric.toml", "sm"),
    ],
)
def test_statistical_parity(path, pers):
    s = rt_tpu.load(path)
    spp = 16
    img_bw = _bw(s, (48, 32), spp=spp, max_bounces=8, personality=pers, seed=7)
    img_jn = np.asarray(
        render_image(s, (48, 32), jr.key(3), spp=spp, max_bounces=8, personality=pers)
    )
    # equal-spp MC estimates: image means agree ~1/sqrt(N*spp), pixels ~1/sqrt(spp)
    assert abs(img_bw.mean() - img_jn.mean()) < 0.01
    assert np.abs(img_bw - img_jn).mean() < 0.03


def test_large_procedural_scene_runs():
    # >640 primitives — beyond the unrolled kernel's cap, the blockwise
    # kernel's raison d'être (BASELINE.json config 4)
    s = rt_tpu.scene.make_procedural_scene(700)
    assert blockwise_supported(s)
    img = _bw(s, (16, 16), spp=1, max_bounces=2)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.1


def test_scene_edit_no_recompile():
    # same bucket => the cached jitted frame is reused (cache info stable)
    from rt_tpu.ops import pallas_blockwise as bw

    s1 = rt_tpu.load("/root/reference/scenes/basic.toml")
    _bw(s1, (16, 16), spp=1, max_bounces=1)
    before = bw._compiled_frame_bw.cache_info()
    # move a sphere: same primitive count -> same bucket -> cache hit
    import dataclasses

    import jax.numpy as jnp

    sph = dataclasses.replace(
        s1.spheres, center=s1.spheres.center + jnp.float32(0.05)
    )
    s2 = dataclasses.replace(s1, spheres=sph)
    _bw(s2, (16, 16), spp=1, max_bounces=1)
    after = bw._compiled_frame_bw.cache_info()
    assert after.misses == before.misses
    assert after.hits == before.hits + 1


def test_sharded_matches_single_device():
    # ray tiles sharded over the 8-device CPU mesh; deterministic path must
    # match the unsharded jnp renderer exactly (global tile ids via offset)
    from rt_tpu import dist
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise_sharded

    mesh = dist.make_mesh(8, 1)
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = np.asarray(render_forward_blockwise_sharded(
        s, (64, 48), mesh, spp=1, max_bounces=1, rng_impl="hash",
        interpret=True))
    ref = np.asarray(render_image(s, (64, 48), jr.key(0), spp=1, max_bounces=1))
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_sharded_statistical_full_path():
    from rt_tpu import dist
    from rt_tpu.ops.pallas_blockwise import render_forward_blockwise_sharded

    mesh = dist.make_mesh(4, 1, devices=__import__("jax").devices()[:4])
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = np.asarray(render_forward_blockwise_sharded(
        s, (48, 32), mesh, seed=5, spp=8, max_bounces=6, rng_impl="hash",
        interpret=True))
    ref = np.asarray(render_image(s, (48, 32), jr.key(2), spp=8, max_bounces=6))
    assert abs(img.mean() - ref.mean()) < 0.015
    assert np.abs(img - ref).mean() < 0.04


def test_mxu_deterministic_parity_basic():
    # MXU scan (transposed tables, dot_general intersection + one-hot
    # payload contraction) must match the jnp renderer on the deterministic
    # path; interpret mode evaluates the dots in exact f32
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = _bw(s, (64, 48), spp=1, max_bounces=1, block=128, mxu=True)
    ref = np.asarray(render_image(s, (64, 48), jr.key(0), spp=1, max_bounces=1))
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_mxu_plane_scan_parity():
    s = rt_tpu.loads(
        """
samples_per_pixel = 1
max_bounces = 1
materials = [ { type = 'lambert', albedo = 'red' },
              { type = 'metal',   albedo = 'white', roughness = 0.1 } ]
planes  = [ { material = 0 } ]
spheres = [ { material = 1, position = [0.0, 1.0, -3.0], radius = 0.5 } ]
"""
    )
    img = _bw(s, (48, 32), spp=1, max_bounces=1, block=128, mxu=True)
    ref = np.asarray(render_image(s, (48, 32), jr.key(0), spp=1, max_bounces=1))
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_mxu_matches_vpu_scan_procedural():
    # identical RNG draws -> the two scan implementations see the same path
    # structure; differences are silhouette-pixel rounding in the quadratic
    # (|o|^2 - 2 o.c + |c|^2 form vs |o-c|^2)
    s = rt_tpu.scene.make_procedural_scene(200)  # bucket 512 -> auto mxu
    a = _bw(s, (32, 24), spp=2, max_bounces=4, seed=3)
    b = _bw(s, (32, 24), spp=2, max_bounces=4, seed=3, mxu=False, block=128)
    assert np.abs(a - b).mean() < 1e-4
    assert np.isfinite(a).all()


def test_spp_chunking_matches_single_chunk():
    # spp split across kernel dispatches must agree with one big unroll
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    a = _bw(s, (24, 16), spp=4, max_bounces=4, spp_unroll=2, seed=11)
    b = _bw(s, (24, 16), spp=4, max_bounces=4, spp_unroll=4, seed=11)
    # different RNG chunking -> statistically equal, not bitwise
    assert abs(a.mean() - b.mean()) < 0.02


def test_lean_scan_bitexact_vs_payload():
    # lean-carry scan (best_t + winner index only, one-hot payload fetch
    # after the loop) must be BIT-exact vs the payload-carry scan: same t
    # math, and the one-hot contraction fetches the identical f32 values
    s = rt_tpu.scene.make_procedural_scene(60, seed=3)
    a = _bw(s, (64, 48), spp=2, max_bounces=4, scan="payload", seed=7)
    b = _bw(s, (64, 48), spp=2, max_bounces=4, scan="lean", seed=7)
    assert np.array_equal(a, b)


def test_lean_scan_bitexact_planes_and_ties():
    # plane-vs-sphere tie-breaking flows through the lean carries' is-plane
    # flag; exercise a mixed plane+sphere scene
    s = rt_tpu.load("scenes/cornell_spheres.toml")
    a = _bw(s, (48, 32), spp=2, max_bounces=3, scan="payload", seed=5)
    b = _bw(s, (48, 32), spp=2, max_bounces=3, scan="lean", seed=5)
    assert np.array_equal(a, b)


def test_lean_mxu_scan_parity():
    # lean + MXU intersection: silhouette-pixel rounding class (expanded
    # quadratic), same bar as test_mxu_matches_vpu_scan_procedural
    s = rt_tpu.scene.make_procedural_scene(60, seed=3)
    a = _bw(s, (64, 48), spp=1, max_bounces=2, scan="payload", seed=7)
    b = _bw(s, (64, 48), spp=1, max_bounces=2, scan="lean", mxu=True, seed=7)
    diff_pix = (np.abs(a - b).max(axis=-1) > 1e-4).sum()
    assert diff_pix <= 8, diff_pix


def test_cull_bitexact_vs_nocull():
    """The conservative block cull + Morton-sorted table must preserve the
    exact argmin: culled/sorted and unculled/unsorted renders are
    bit-identical (round-2 VERDICT item 2)."""
    s = rt_tpu.scene.make_procedural_scene(600)
    kw = dict(spp=1, max_bounces=3, seed=5)
    a = _bw(s, (48, 32), cull=False, order="index", **kw)
    b = _bw(s, (48, 32), cull=True, order="morton", **kw)
    assert np.array_equal(a, b)
    # sort alone (no cull) is also winner-exact via the index tie-break
    c = _bw(s, (48, 32), cull=False, order="morton", **kw)
    assert np.array_equal(a, c)


def test_cull_bitexact_small_block():
    """Cull with the small-table block size (8) and a plane in the scene."""
    s = rt_tpu.scene.make_procedural_scene(40)
    kw = dict(spp=2, max_bounces=4, seed=9, block=8)
    a = _bw(s, (32, 24), cull=False, **kw)
    b = _bw(s, (32, 24), cull=True, scan="lean", order="morton", **kw)
    assert np.array_equal(a, b)
