"""Bounce-major wavefront kernel tests (rt_tpu.ops.pallas_wavefront).

The wavefront pipeline shares its per-bounce physics with the pixel-major
blockwise kernel (`pallas_blockwise._bounce_once`) and keys its hash RNG
by (pixel, sample, bounce), so reordering rays between bounces must not
change any ray's path: frames match ``render_forward_blockwise``'s hash
mode to float-association noise (different jit programs contract the
shared math differently — a few ULP), across personalities, sort modes
and schedules.  Parity chain: blockwise hash mode is itself held to the
jnp renderer and the independent NumPy mirror (test_pallas_blockwise.py),
so these tests transitively pin the wavefront estimator to the reference
semantics (mg_ray_tracer.cpp:36-174, sm_ray_tracer.cpp:181-219).
"""

import numpy as np
import pytest

import rt_tpu
from rt_tpu.scene import make_procedural_scene
from rt_tpu.ops.pallas_blockwise import render_forward_blockwise
from rt_tpu.ops.pallas_wavefront import (
    render_forward_wavefront,
    wavefront_supported,
)

ATOL = 2e-5


def _bw(scene, size, **kw):
    kw.setdefault("rng_impl", "hash")
    kw.setdefault("interpret", True)
    return np.asarray(render_forward_blockwise(scene, size, **kw))


def _wf(scene, size, **kw):
    kw.setdefault("interpret", True)
    return np.asarray(render_forward_wavefront(scene, size, **kw))


def test_supported_and_hash_only():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    assert wavefront_supported(s)
    with pytest.raises(ValueError, match="hash"):
        render_forward_wavefront(s, (8, 8), rng_impl="hw", interpret=True)


def test_parity_basic_small():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    kw = dict(spp=2, max_bounces=4, seed=5)
    a = _bw(s, (64, 48), **kw)
    b = _wf(s, (64, 48), **kw)
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_parity_deep_paths():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    kw = dict(spp=8, max_bounces=8, seed=11)
    a = _bw(s, (96, 64), **kw)
    b = _wf(s, (96, 64), **kw)
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_parity_dielectric_sm():
    s = rt_tpu.load("/root/reference/scenes/dielectric.toml")
    kw = dict(personality="sm", spp=4, max_bounces=6, seed=9)
    a = _bw(s, (64, 48), **kw)
    b = _wf(s, (64, 48), **kw)
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_parity_procedural_culled():
    # 600 spheres -> s_pad 1024: the wavefront default turns the block
    # cull ON (the sort is what gives it teeth); parity must hold through
    # cull + Morton table + compaction
    sc = make_procedural_scene(600, spp=2, max_bounces=8)
    kw = dict(spp=2, max_bounces=8, seed=3)
    a = _bw(sc, (96, 64), **kw)
    b = _wf(sc, (96, 64), **kw)
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_sort_modes_agree():
    sc = make_procedural_scene(200, spp=2, max_bounces=6)
    kw = dict(spp=2, max_bounces=6, seed=7)
    a = _wf(sc, (64, 48), sort_mode="variadic", **kw)
    b = _wf(sc, (64, 48), sort_mode="gather", **kw)
    # same permutation semantics -> identical ray order -> identical bits
    np.testing.assert_array_equal(a, b)


def test_parity_boxes_extension():
    # --boxes at wavefront scale: the slab-test table rides the bounce
    # kernels as a third replicated VMEM input (round 5); frames must
    # match the blockwise --boxes path (itself pinned to the jnp slab
    # renderer in test_pallas_blockwise) through the compaction sorts —
    # and the boxes must actually BE in the frame (a silently box-less
    # render was the round-5 review bug)
    import dataclasses

    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert', albedo = 'red' },\n"
        "              { type = 'metal', albedo = 'white' } ]\n"
        "boxes = [ { material = 0, center = [0.0, 0.5, -3.0] },\n"
        "          { material = 1, center = [1.5, 0.5, -4.0] } ]\n")
    sc = make_procedural_scene(200, spp=2, max_bounces=6)
    sc = dataclasses.replace(sc, boxes=boxy.boxes)
    kw = dict(spp=2, max_bounces=6, seed=3, include_boxes=True)
    a = _bw(sc, (64, 48), **kw)
    b = _wf(sc, (64, 48), **kw)
    np.testing.assert_allclose(a, b, atol=ATOL)
    # the boxes change the frame vs the box-stub render
    c = _wf(sc, (64, 48), spp=2, max_bounces=6, seed=3)
    assert np.abs(b - c).max() > 0.01


def test_segmented_pipeline_bit_parity():
    # the segmented live-prefix pipeline (sequential lax.switch segments,
    # prefix-sized sorts, per-segment bucket re-choice) must be BIT-equal
    # to the tail pipeline: segments only change where the sorts run and
    # which (frozen, dead) suffix tiles are skipped, never a live ray's
    # math — 600 spheres so the cull + Morton + windowed extract are on
    sc = make_procedural_scene(600, spp=2, max_bounces=8)
    kw = dict(spp=2, max_bounces=8, seed=3)
    a = _wf(sc, (96, 64), pipeline="tail", **kw)
    b = _wf(sc, (96, 64), pipeline="seg", **kw)
    np.testing.assert_array_equal(a, b)


def test_sort_schedule_invariance():
    # the estimator must not depend on WHEN (or whether) rays are sorted
    sc = make_procedural_scene(200, spp=2, max_bounces=6)
    kw = dict(spp=2, max_bounces=6, seed=13)
    a = _wf(sc, (64, 48), sort_schedule=(), **kw)
    b = _wf(sc, (64, 48), sort_schedule=(1, 3), **kw)
    c = _wf(sc, (64, 48), sort_schedule=tuple(range(1, 6)), **kw)
    np.testing.assert_allclose(a, b, atol=ATOL)
    np.testing.assert_allclose(a, c, atol=ATOL)


def test_spp_chunking_matches_single_chunk():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    kw = dict(spp=4, max_bounces=4, seed=2)
    a = _wf(s, (48, 32), spp_chunk=4, **kw)
    b = _wf(s, (48, 32), spp_chunk=2, **kw)
    # different chunking changes the per-chunk seed chain after chunk 0 —
    # statistical agreement only
    assert abs(a.mean() - b.mean()) < 0.02
    # equal chunking must agree with the blockwise equal-chunk frames
    c = _bw(s, (48, 32), spp_unroll=2, **kw)
    d = _wf(s, (48, 32), spp_chunk=2, **kw)
    np.testing.assert_allclose(c, d, atol=ATOL)


def test_degenerate_geometry_finite():
    # r=0 spheres, duplicate spheres (tie-break), tangent rays: the
    # wavefront path (incl. cull bounds on degenerate blocks) must stay
    # finite and match the pixel-major kernel (test_numerics.py pattern)
    toml = """
samples_per_pixel = 2
max_bounces = 4
materials = [ { name = 'a', type = 'lambert', albedo = 'gray' } ]
spheres = [
  { material = 0, position = [0, 1, -3], radius = 0.0 },
  { material = 0, position = [0, 1, -3], radius = 0.5 },
  { material = 0, position = [0, 1, -3], radius = 0.5 },
  { material = 0, position = [2, 1, -3], radius = 0.001 },
]
"""
    sc = rt_tpu.loads(toml)
    kw = dict(spp=2, max_bounces=4, seed=1)
    a = _bw(sc, (48, 32), **kw)
    b = _wf(sc, (48, 32), **kw)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_registry_and_auto_route():
    from rt_tpu import renderer as reg

    assert reg.find_by_name("mg_wavefront") is not None
    assert reg.find_by_name("sm_wavefront") is not None
    big = make_procedural_scene(5000)
    small = make_procedural_scene(200)
    route_big, _ = reg.auto_route(big, "tpu")
    route_small, _ = reg.auto_route(small, "tpu")
    assert route_big == "wavefront"
    assert route_small in ("blockwise", "pallas")


def test_sharded_bit_identical_to_unsharded():
    """Per-device wavefronts with global ray ids: the sharded frame must
    be bit-identical to the unsharded one on every mesh layout (draws are
    keyed by global ray id; each shard compacts/shrinks independently)."""
    import jax
    from rt_tpu import dist
    from rt_tpu.ops.pallas_wavefront import render_forward_wavefront_sharded

    sc = make_procedural_scene(600, spp=2, max_bounces=6)
    kw = dict(spp=2, max_bounces=6, seed=3, interpret=True)
    ref = _wf(sc, (64, 48), **kw)
    for n in (2, 8):
        mesh = dist.make_mesh(n, 1, devices=jax.devices()[:n])
        img = np.asarray(render_forward_wavefront_sharded(
            sc, (64, 48), mesh, **kw))
        np.testing.assert_array_equal(ref, img)

    # --boxes rides the sharded path too (replicated slab table)
    import dataclasses

    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert', albedo = 'red' } ]\n"
        "boxes = [ { material = 0, center = [0.0, 0.5, -3.0] } ]\n")
    scb = dataclasses.replace(sc, boxes=boxy.boxes)
    kwb = dict(kw, include_boxes=True)
    refb = _wf(scb, (64, 48), **kwb)
    mesh = dist.make_mesh(4, 1, devices=jax.devices()[:4])
    imgb = np.asarray(render_forward_wavefront_sharded(
        scb, (64, 48), mesh, **kwb))
    np.testing.assert_array_equal(refb, imgb)
    assert np.abs(refb - ref).max() > 0.01  # boxes are in the frame
