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
    # round 5: the --boxes extension is supported too (slab-test table)
    assert blockwise_supported(boxy)
    assert blockwise_supported(boxy, include_boxes=True)


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
    # past the primitive cap the kernel refuses (with or without boxes)
    big = rt_tpu.scene.make_procedural_scene(17000)
    with pytest.raises(ValueError, match="exceeds"):
        render_forward_blockwise(big, (8, 8), spp=1, max_bounces=1)
    # tracer semantics (box stub): renders fine, boxes ignored; --boxes
    # runs the slab-test table (round 5)
    img = _bw(boxy, (8, 8), spp=1, max_bounces=1)
    assert np.isfinite(img).all()
    img_b = _bw(boxy, (8, 8), spp=1, max_bounces=1, include_boxes=True)
    assert np.isfinite(img_b).all()


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


def _box_scene_toml(n_spheres=0, n_boxes=2):
    import numpy as _np

    rng = _np.random.default_rng(9)
    lines = [
        "samples_per_pixel = 1",
        "max_bounces = 2",
        "materials = [ { type = 'lambert', albedo = 'red' },",
        "              { type = 'metal', albedo = [0.9,0.9,0.9], "
        "roughness = 0.1 } ]",
        "planes  = [ { material = 0, position = [0,0,0], normal = 'up' } ]",
    ]
    sph = ["{ material = %d, position = [%.3f, %.3f, %.3f], radius = %.3f }"
           % (i % 2, x, y, z, r)
           for i, (x, y, z, r) in enumerate(zip(
               rng.uniform(-6, 6, n_spheres), rng.uniform(0.2, 2, n_spheres),
               rng.uniform(-9, -3, n_spheres), rng.uniform(0.1, 0.4, n_spheres)))]
    if sph:
        lines.append("spheres = [ " + ",\n  ".join(sph) + " ]")
    box = ["{ material = %d, position = [%.3f, %.3f, %.3f], "
           "extents = [%.3f, %.3f, %.3f] }"
           % (i % 2, x, y, z, ex, ey, ez)
           for i, (x, y, z, ex, ey, ez) in enumerate(zip(
               rng.uniform(-6, 6, n_boxes), rng.uniform(0.2, 2, n_boxes),
               rng.uniform(-9, -3, n_boxes), rng.uniform(0.1, 0.5, n_boxes),
               rng.uniform(0.1, 0.5, n_boxes), rng.uniform(0.1, 0.5, n_boxes)))]
    lines.append("boxes = [ " + ",\n  ".join(box) + " ]")
    return rt_tpu.loads("\n".join(lines))


def test_boxes_deterministic_parity():
    # --boxes in the blockwise kernel (round 5): primary-hit parity vs the
    # jnp include_boxes path (slab test, dominant-axis normal, box-loses-
    # ties order)
    s = _box_scene_toml(n_spheres=3, n_boxes=3)
    img_bw = _bw(s, (48, 32), spp=1, max_bounces=1, include_boxes=True)
    img_jn = np.asarray(render_image(
        s, (48, 32), jr.key(0), spp=1, max_bounces=1, include_boxes=True))
    np.testing.assert_allclose(img_bw, img_jn, atol=1e-5)


def test_boxes_multibounce_matches_unrolled():
    # multi-bounce: the blockwise slab scan vs the unrolled kernel's baked
    # --boxes block, statistically at equal spp (independent hash streams)
    from rt_tpu.ops.pallas_render import render_forward_pallas

    s = _box_scene_toml(n_spheres=3, n_boxes=3)
    a = _bw(s, (48, 32), spp=8, max_bounces=4, include_boxes=True, seed=3)
    b = np.asarray(render_forward_pallas(
        s, (48, 32), seed=5, spp=8, max_bounces=4, include_boxes=True,
        rng_impl="hash", interpret=True))
    assert abs(a.mean() - b.mean()) < 0.015
    assert np.abs(a - b).mean() < 0.05


def test_boxes_beyond_unrolled_cap():
    # >640 primitives with boxes: exactly the scene class that used to
    # fall off the kernel path entirely (round-4 VERDICT missing #3)
    from rt_tpu.ops.pallas_blockwise import blockwise_supported
    from rt_tpu.ops.pallas_render import pallas_supported

    s = _box_scene_toml(n_spheres=660, n_boxes=24)
    assert not pallas_supported(s, include_boxes=True)   # unrolled cap
    assert blockwise_supported(s, include_boxes=True)
    img = _bw(s, (32, 24), spp=1, max_bounces=2, include_boxes=True)
    assert np.isfinite(img).all()
    # boxes visibly change the frame vs the stub semantics
    img_stub = _bw(s, (32, 24), spp=1, max_bounces=2)
    assert np.abs(img - img_stub).max() > 1e-3


def test_blockwise_records_replay_grads_boxes():
    # >640-prim --boxes scene: pallas_loss_and_grad auto-routes the record
    # pass to the blockwise record kernel (runtime tables) and replays in
    # jnp; FD through the SAME deterministic loss validates the gradients,
    # and box parameters receive gradient (round-4 VERDICT missing #3)
    from rt_tpu import diff
    from rt_tpu.ops.pallas_render import pallas_supported

    import jax.numpy as jnp

    s = _box_scene_toml(n_spheres=660, n_boxes=24)
    assert not pallas_supported(s, include_boxes=True)
    w, h = 32, 24
    params = diff.extract_params(s)
    tgt = jnp.full((h, w, 3), 0.2, jnp.float32)
    kw = dict(seed=3, spp=2, max_bounces=3, rng_impl="hash",
              interpret=True, include_boxes=True)
    loss, grads = diff.pallas_loss_and_grad(params, s, tgt, (w, h), **kw)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k
    assert np.abs(np.asarray(grads["boxes.center"])).max() > 0
    assert np.abs(np.asarray(grads["boxes.extents"])).max() > 0

    eps = 1e-3
    name = "materials.albedo"
    p_hi = dict(params)
    p_lo = dict(params)
    p_hi[name] = params[name].at[0, 0].add(eps)
    p_lo[name] = params[name].at[0, 0].add(-eps)
    l_hi, _ = diff.pallas_loss_and_grad(p_hi, s, tgt, (w, h), **kw)
    l_lo, _ = diff.pallas_loss_and_grad(p_lo, s, tgt, (w, h), **kw)
    fd = (float(l_hi) - float(l_lo)) / (2 * eps)
    an = float(np.asarray(grads[name])[0, 0])
    assert abs(an - fd) <= 3e-2 * max(abs(fd), 1e-6), (an, fd)
