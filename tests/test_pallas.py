"""Pallas megakernel tests.

With the default hardware PRNG the kernels are Mosaic-only, but
``rng_impl="hash"`` (a portable counter hash, shared with the blockwise
kernels) is bit-identical between Mosaic and pallas interpret mode — so the
flagship kernels' actual math runs end-to-end on the CPU mesh here:
deterministic parity vs the jnp renderer, record→replay round trips, and
the fused fwd+bwd gradient kernel vs the replay-pipeline gradients fed the
same draws.  The on-device statistical counterparts live in
tools/tpu_smoke.py.

Interpret-mode cost scales with the unroll (bounces × primitives), so the
numerical tests use small frames and shallow bounce counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

import rt_tpu
from rt_tpu.integrator import render_image
from rt_tpu.ops.pallas_render import (
    MAX_UNROLL_PRIMS,
    _flatten_primitives,
    pallas_supported,
    render_forward_pallas,
)


def test_supported_gates():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    assert pallas_supported(s)
    big = rt_tpu.scene.make_procedural_scene(MAX_UNROLL_PRIMS + 100)
    assert not pallas_supported(big)
    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert' } ]\nboxes = [ { material = 0 } ]\n"
    )
    # round 3: box scenes run through the kernel (the reference's box stub
    # never hits them; --boxes bakes the slab test) — no more jnp demotion
    assert pallas_supported(boxy)
    assert pallas_supported(boxy, include_boxes=True)


def test_flatten_primitives_payload():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    s_cols, p_cols = _flatten_primitives(s, "mg")
    assert s_cols.shape == (10, 3)
    assert p_cols.shape == (10, 0)
    # ground sphere: centre (0,-1000,0) r=1000, lambert(cls 0), white albedo
    np.testing.assert_allclose(s_cols[:4, 0], [0, -1000, 0, 1000])
    np.testing.assert_allclose(s_cols[4:7, 0], [1, 1, 1])  # gray_33 binarized
    assert s_cols[9, 0] == 0.0
    # metal sphere is index 2: cls 1, roughness 0.05, reflectivity 0.8
    assert s_cols[9, 2] == 1.0
    assert s_cols[8, 2] == pytest.approx(0.05)
    assert s_cols[7, 2] == pytest.approx(0.8)


def test_flatten_personality_changes_classes():
    s = rt_tpu.load("/root/reference/scenes/dielectric.toml")
    mg_cols, _ = _flatten_primitives(s, "mg")
    sm_cols, _ = _flatten_primitives(s, "sm")
    # vacuum sphere (index 1): lambert under mg, dielectric under sm
    assert mg_cols[9, 1] == 0.0
    assert sm_cols[9, 1] == 2.0


def test_registry_has_pallas_renderers():
    from rt_tpu import renderer as reg

    assert reg.find_by_name("mg_pallas") is not None
    assert reg.find_by_name("sm_pallas") is not None


def test_unsupported_scene_raises():
    from rt_tpu.ops.pallas_render import render_forward_pallas

    big = rt_tpu.scene.make_procedural_scene(MAX_UNROLL_PRIMS + 100)
    with pytest.raises(ValueError, match="exceeds"):
        render_forward_pallas(big, (8, 8), spp=1, max_bounces=1)


def _fwd(scene, size, **kw):
    kw.setdefault("rng_impl", "hash")
    kw.setdefault("interpret", True)
    kw.setdefault("rows", 8)
    return np.asarray(render_forward_pallas(scene, size, **kw))


def test_interpret_deterministic_parity_basic():
    # 1 spp centre sample, 1 bounce: primary hit + sky — deterministic, must
    # match the jnp renderer to float eps (VERDICT r1 item 2a)
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = _fwd(s, (64, 48), spp=1, max_bounces=1)
    ref = np.asarray(render_image(s, (64, 48), jr.key(0), spp=1, max_bounces=1))
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_interpret_deterministic_parity_planes():
    # plane scan + plane-vs-sphere tie-break inside the unrolled kernel
    s = rt_tpu.loads(
        """
materials = [ { type = 'lambert', albedo = 'red' },
              { type = 'metal',   albedo = 'white', roughness = 0.1 } ]
planes  = [ { material = 0 } ]
spheres = [ { material = 1, position = [0.0, 1.0, -3.0], radius = 0.5 } ]
"""
    )
    img = _fwd(s, (48, 32), spp=1, max_bounces=1)
    ref = np.asarray(render_image(s, (48, 32), jr.key(0), spp=1, max_bounces=1))
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_interpret_statistical_parity():
    # same estimator, different RNG stream: agreement like MC noise
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = _fwd(s, (32, 24), spp=8, max_bounces=4, seed=5)
    ref = np.asarray(render_image(s, (32, 24), jr.key(2), spp=8, max_bounces=4))
    assert abs(img.mean() - ref.mean()) < 0.02
    assert np.abs(img - ref).mean() < 0.05


def test_interpret_record_replay_roundtrip():
    # the record kernel's residuals, replayed through rt_tpu.replay, must
    # reproduce the kernel's own radiance (they are the same estimator fed
    # the same draws)
    from rt_tpu.camera import generate_rays
    from rt_tpu.integrator import _pixel_grid
    from rt_tpu.ops.pallas_render import records_to_flat, render_record_pallas
    from rt_tpu.replay import PathRecords, replay_radiance

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    w, h, B = 32, 24, 3
    n = w * h
    rad, recs = render_record_pallas(
        s, (w, h), seed=3, max_bounces=B, rows=8, rng_impl="hash",
        interpret=True, center_sample=False)
    flat = records_to_flat(recs, n, B)
    kernel_img = np.asarray(rad).transpose(0, 2, 3, 1).reshape(-1, 3)[:n]

    grid = _pixel_grid((w, h))
    o, d = generate_rays(s.camera, (w, h), grid + flat["jitter"])
    pr = PathRecords(
        kind=flat["kind"], idx=flat["idx"], root_lo=flat["root_lo"],
        live_in=flat["live_in"], miss=flat["miss"],
        alive_out=flat["alive_out"], reflect_bit=flat["reflect_bit"],
        lam_deg=flat["lam_deg"],
    )
    replayed = np.asarray(replay_radiance(
        s, o, d, None, pr, personality="mg", max_bounces=B,
        draws=(flat["ur"], flat["coin"])))
    np.testing.assert_allclose(kernel_img, replayed, atol=1e-4)


@pytest.mark.parametrize("mode", ["multi", "mono"])
def test_interpret_fused_grad_matches_replay(mode):
    # the fused fwd+bwd kernels (per-sample pipeline AND the one-dispatch
    # mono kernel) and the record→replay pipeline implement the same
    # detached-sampling gradient; with the shared hash RNG they see the
    # same paths and draws, so gradients must agree (VERDICT r1 item 2b)
    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    size, spp, B = (32, 24), 2, 3
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3), jnp.float32)

    loss_f, g_f = pallas_mse_loss_and_grad(
        params, s, target, size, seed=1, spp=spp, max_bounces=B,
        rows=8, rng_impl="hash", interpret=True, mode=mode)
    loss_r, g_r = diff.pallas_loss_and_grad(
        params, s, target, size, seed=1, spp=spp, max_bounces=B,
        rng_impl="hash", interpret=True)

    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-5)
    for k in g_r:
        a, b = np.asarray(g_f[k]), np.asarray(g_r[k])
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=k)


def test_make_render_step_structure():
    from rt_tpu.ops.pallas_render import _chunk_seeds, make_render_step

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    # builds without touching the device; unsupported scenes still raise
    step = make_render_step(s, (64, 48), spp=4)
    assert callable(step)
    big = rt_tpu.scene.make_procedural_scene(MAX_UNROLL_PRIMS + 100)
    with pytest.raises(ValueError):
        make_render_step(big, (64, 48))
    # the per-chunk seed chain matches render_forward_pallas's documented LCG
    seeds = np.asarray(_chunk_seeds(7, 3))
    assert seeds[0] == 7
    assert seeds[1] == (7 * 1103515245 + 12345) % (2**31 - 1)
    assert seeds[2] == (int(seeds[1]) * 1103515245 + 12345) % (2**31 - 1)


def test_interpret_fused_grad_matches_replay_spp3():
    # spp=3 exercises the records pipeline's rec_calls[1 % len] reuse for
    # samples >= 2 (only the seed differs) — guards the seed-reuse subtlety
    # in diff._records_pipeline (VERDICT r1 item 10)
    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    size, spp, B = (24, 16), 3, 2
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3), jnp.float32) + 0.25

    loss_f, g_f = pallas_mse_loss_and_grad(
        params, s, target, size, seed=11, spp=spp, max_bounces=B,
        rows=8, rng_impl="hash", interpret=True)
    loss_r, g_r = diff.pallas_loss_and_grad(
        params, s, target, size, seed=11, spp=spp, max_bounces=B,
        rng_impl="hash", interpret=True)

    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-5)
    for k in g_r:
        a, b = np.asarray(g_f[k]), np.asarray(g_r[k])
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=k)


def test_interpret_fused_grad_lean_past_payload_cap(monkeypatch):
    # Past MAX_GRAD_PRIMS the entry point must auto-switch to the lean
    # winner-id stash and force mode="multi" (the mono unroll is spp x
    # bounces x prims).  A real 97+-prim kernel takes minutes to compile in
    # interpret mode, so the cap is monkeypatched down: the routing logic
    # and the lean kernel math are identical at 12 primitives (the >96-prim
    # numbers themselves are validated on TPU, tools/bench_table.py).
    import rt_tpu.ops.pallas_grad as pg
    from rt_tpu import diff

    monkeypatch.setattr(pg, "MAX_GRAD_PRIMS", 8)
    s = rt_tpu.scene.make_procedural_scene(11, seed=5)
    assert 8 < s.spheres.count + s.planes.count <= pg.MAX_GRAD_PRIMS_LEAN
    size, spp, B = (16, 8), 2, 2
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3), jnp.float32)

    loss_f, g_f = pg.pallas_mse_loss_and_grad(
        params, s, target, size, seed=2, spp=spp, max_bounces=B,
        rows=8, rng_impl="hash", interpret=True, lean=False,
        mode="mono")  # must auto-lean AND fall back to multi
    loss_r, g_r = diff.pallas_loss_and_grad(
        params, s, target, size, seed=2, spp=spp, max_bounces=B,
        rng_impl="hash", interpret=True)

    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-5)
    for k in g_r:
        a, b = np.asarray(g_f[k]), np.asarray(g_r[k])
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=k)


def test_interpret_mono_eager_residuals_match():
    # residuals="eager" stashes vjp closures at forward time instead of
    # rematerialising the primal in the reverse sweep — pure scheduling
    # change, gradients must be identical to the recompute default
    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    size, spp, B = (32, 24), 2, 3
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3), jnp.float32)
    kw = dict(seed=1, spp=spp, max_bounces=B, rows=8, rng_impl="hash",
              interpret=True, mode="mono")
    l0, g0 = pallas_mse_loss_and_grad(params, s, target, size, **kw)
    l1, g1 = pallas_mse_loss_and_grad(params, s, target, size,
                                      residuals="eager", **kw)
    assert float(l0) == float(l1)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   atol=1e-6, err_msg=k)


def test_interpret_mono_slim_stash_bit_exact():
    # "slim_stash": the winner index rides the packed bits word and the
    # per-bounce origin stash is replaced by tau = live_h ? best_t : 0,
    # with the reverse sweep REPLAYING the origin chain forward from the
    # raygen origin (the identical fp expressions the forward evaluated) —
    # losses and gradients must be BIT-equal to the standard lean stash,
    # on both personalities (dielectric bits share the packed word)
    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    for path, pers in (("/root/reference/scenes/basic.toml", "mg"),
                       ("/root/reference/scenes/dielectric.toml", "sm")):
        s = rt_tpu.load(path)
        size, spp, B = (32, 24), 2, 3
        params = diff.extract_params(s)
        target = jnp.zeros((size[1], size[0], 3), jnp.float32)
        base = ("acc_scratch", "fwd_dense", "recompute_u", "hand_rev")
        kw = dict(seed=5, spp=spp, max_bounces=B, rows=8, rng_impl="hash",
                  interpret=True, mode="mono", personality=pers)
        l0, g0 = pallas_mse_loss_and_grad(params, s, target, size,
                                          tune=base, **kw)
        l1, g1 = pallas_mse_loss_and_grad(params, s, target, size,
                                          tune=base + ("slim_stash",), **kw)
        assert float(l0) == float(l1)
        for k in g0:
            np.testing.assert_array_equal(np.asarray(g0[k]),
                                          np.asarray(g1[k]), err_msg=k)


def test_interpret_chunked_pipeline_matches_per_sample():
    # the spp-chunked mono pipeline (full-spp forward frame + jnp cotangent
    # + cot-input mono kernels over sample chunks) must reproduce the
    # per-sample pipeline: identical loss (same forward frame) and
    # float-eps gradients (only the summation order differs)
    import numpy as np
    from rt_tpu import diff
    from rt_tpu.ops import pallas_grad as pg

    sc = rt_tpu.load("/root/reference/scenes/dielectric.toml")
    p = diff.extract_params(sc)
    size, spp, mb = (48, 32), 4, 3
    w, h = size
    target = jnp.zeros((h, w, 3), jnp.float32)
    concrete = diff.apply_params(sc, jax.tree_util.tree_map(jnp.asarray, p))
    s_cols, p_cols = pg._flatten_primitives(concrete, "sm")
    key_args = (
        (s_cols.tobytes(), p_cols.tobytes()),
        (s_cols.shape, p_cols.shape),
        bytes(np.asarray(concrete.spheres.material,
                         np.int32)[:concrete.spheres.count]),
        bytes(np.asarray(concrete.planes.material,
                         np.int32)[:concrete.planes.count]),
    )
    common = dict(width=w, height=h, spp=spp, max_bounces=mb, rows=8,
                  rng_mode="reference", lean=True, rng_impl="hash",
                  interpret=True, S_table=sc.spheres.center.shape[0],
                  M_table=sc.materials.albedo.shape[0])
    tune, _ = pg._default_tune(s_cols, p_cols, 8, "hash", "mono", True)
    run_multi = pg._compiled_pipeline(*key_args, fwd_rows=None, **common)
    run_chunk = pg._compiled_pipeline_chunked(*key_args, chunk=2,
                                              fwd_rows=None, tune=tune,
                                              **common)
    cam = jnp.concatenate([
        jnp.asarray(concrete.camera.position, jnp.float32),
        jnp.asarray(concrete.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([np.tan(concrete.camera.vfov * 0.5), w / h,
                     concrete.camera.near, 0.0], jnp.float32),
    ])
    l0, g0 = run_multi(cam, jnp.int32(7), target)
    l1, g1 = run_chunk(cam, jnp.int32(7), target)
    assert float(l0) == float(l1)
    for k in g0:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=k)


def test_grad_pipeline_routing_decisions():
    # the spp/VMEM router: headline shapes keep the one-dispatch mono
    # kernel (downshifting rows when the stash outgrows the measured 4.2 MB
    # budget), and high-spp steps that outgrow every rows tier default to
    # the per-sample pipeline (the spp-chunked variant is a measured
    # negative result, explicit opt-in only)
    from rt_tpu import diff
    from rt_tpu.ops import pallas_grad as pg

    class Sentinel(Exception):
        pass

    picked = {}

    def spy(name):
        def f(*a, **kw):
            picked.update(mode=name, rows=kw.get("rows"),
                          chunk=kw.get("chunk"))
            raise Sentinel
        return f

    orig = (pg._compiled_pipeline_mono, pg._compiled_pipeline_chunked,
            pg._compiled_pipeline)
    pg._compiled_pipeline_mono = spy("mono")
    pg._compiled_pipeline_chunked = spy("chunked")
    pg._compiled_pipeline = spy("multi")
    try:
        def probe(path, pers, spp):
            sc = rt_tpu.load(path)
            p = diff.extract_params(sc)
            target = jnp.zeros((600, 800, 3), jnp.float32)
            picked.clear()
            try:
                pg.make_mse_step(p, sc, target, (800, 600), spp=spp,
                                 max_bounces=8, personality=pers)
            except Sentinel:
                pass
            return dict(picked)

        basic = "/root/reference/scenes/basic.toml"
        diel = "/root/reference/scenes/dielectric.toml"
        assert probe(basic, "mg", 4) == {
            "mode": "mono", "rows": 32, "chunk": None}
        assert probe(basic, "mg", 16) == {
            "mode": "mono", "rows": 8, "chunk": None}
        assert probe(diel, "sm", 4) == {
            "mode": "mono", "rows": 24, "chunk": None}
        # sm@64spp: the per-sample pipeline (chunked measured slower on
        # device — negative result in the pallas_grad gate comment)
        assert probe(diel, "sm", 64)["mode"] == "multi"
    finally:
        (pg._compiled_pipeline_mono, pg._compiled_pipeline_chunked,
         pg._compiled_pipeline) = orig


def test_interpret_fused_grad_dielectric_personality():
    # sm personality on dielectric.toml exercises the has_die branch of the
    # class-presence specialization (Fresnel/refraction + its transpose)
    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    s = rt_tpu.load("/root/reference/scenes/dielectric.toml")
    size, spp, B = (24, 16), 1, 2
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3), jnp.float32) + 0.3

    loss_f, g_f = pallas_mse_loss_and_grad(
        params, s, target, size, seed=4, spp=spp, max_bounces=B,
        rows=8, rng_impl="hash", interpret=True, mode="mono",
        personality="sm")
    loss_r, g_r = diff.pallas_loss_and_grad(
        params, s, target, size, seed=4, spp=spp, max_bounces=B,
        rng_impl="hash", interpret=True, personality="sm")

    assert float(loss_f) == pytest.approx(float(loss_r), rel=1e-5)
    for k in g_r:
        a, b = np.asarray(g_f[k]), np.asarray(g_r[k])
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=k)


def test_fused_step_auto_routing(monkeypatch):
    # the entry points pick kernel mode/stash automatically: mono+lean by
    # default, multi past the 96-prim payload cap or when the mono VMEM
    # stash (spp x bounces) would blow the scoped budget, eager overrides
    # the lean default.  Assert the routing without compiling kernels.
    import rt_tpu.ops.pallas_grad as pg
    from rt_tpu import diff

    calls = []

    def fake_mono(*a, residuals="recompute", **kw):
        calls.append(("mono", kw.get("lean"), residuals))
        return lambda cam, seed, tgt: (0.0, {})

    def fake_multi(*a, **kw):
        calls.append(("multi", kw.get("lean"), None))
        return lambda cam, seed, tgt: (0.0, {})

    monkeypatch.setattr(pg, "_compiled_pipeline_mono", fake_mono)
    monkeypatch.setattr(pg, "_compiled_pipeline", fake_multi)
    monkeypatch.setattr(pg, "_target_blocks", lambda *a: None)

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    params = diff.extract_params(s)
    tgt = jnp.zeros((8, 16, 3), jnp.float32)

    pg.make_mse_step(params, s, tgt, (16, 8), spp=4, max_bounces=8)
    assert calls[-1] == ("mono", True, "recompute")       # default

    pg.make_mse_step(params, s, tgt, (16, 8), spp=64, max_bounces=8)
    assert calls[-1][0] == "multi"                        # spp gate

    pg.make_mse_step(params, s, tgt, (16, 8), spp=2, max_bounces=8,
                     residuals="eager")
    assert calls[-1] == ("mono", False, "eager")          # eager wins

    big = rt_tpu.scene.make_procedural_scene(200, seed=1)
    bp = diff.extract_params(big)
    pg.make_mse_step(bp, big, tgt, (16, 8), spp=2, max_bounces=4)
    assert calls[-1] == ("multi", True, None)             # prim-cap gate

    too_big = rt_tpu.scene.make_procedural_scene(700, seed=1)
    with pytest.raises(ValueError):
        pg.make_mse_step(diff.extract_params(too_big), too_big, tgt,
                         (16, 8), spp=2, max_bounces=4)


def test_megakernel_boxes_parity():
    """--boxes extension in the unrolled kernel: deterministic primary-hit
    parity vs the jnp include_boxes path, and box scenes no longer rejected
    with boxes OFF (the reference's box stub, mg_ray_tracer.cpp:89-93)."""
    import rt_tpu
    from rt_tpu.integrator import render_image
    from rt_tpu.ops.pallas_render import pallas_supported, render_forward_pallas

    s = rt_tpu.loads(
        "materials = [ { type = 'lambert', albedo = 'red' },\n"
        "              { type = 'metal', albedo = [0.9,0.9,0.9], roughness = 0.1 } ]\n"
        "spheres = [ { material = 0, position = [-1.2, 0.5, -4.0], radius = 0.5 } ]\n"
        "planes  = [ { material = 0, position = [0,0,0], normal = 'up' } ]\n"
        "boxes   = [ { material = 1, position = [1.0, 0.5, -4.0], extents = [0.4,0.5,0.4] },\n"
        "            { material = 0, position = [0.0, 0.25, -2.5], extents = [0.25,0.25,0.25] } ]\n"
    )
    assert pallas_supported(s)
    assert pallas_supported(s, include_boxes=True)
    key = rt_tpu.rng.make_key(0)
    a = np.asarray(render_image(s, (48, 32), key, spp=1, max_bounces=1,
                                include_boxes=True, gamma=False))
    b = np.asarray(render_forward_pallas(
        s, (48, 32), seed=0, spp=1, max_bounces=1, include_boxes=True,
        gamma=False, rng_impl="hash", interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # multi-bounce, boxes off: box scene runs through the kernel with the
    # stub semantics (boxes never hit) and matches the jnp tracer's value
    # statistically — here just finiteness + sky/shading sanity
    c = np.asarray(render_forward_pallas(
        s, (32, 24), seed=0, spp=2, max_bounces=3,
        rng_impl="hash", interpret=True))
    assert np.isfinite(c).all() and 0.1 < c.mean() < 1.0


def test_auto_route_accepts_box_scenes():
    from rt_tpu.renderer import auto_route

    import rt_tpu

    s = rt_tpu.loads(
        "materials = [ { type = 'lambert' } ]\n"
        "boxes = [ { material = 0 } ]\n"
        "spheres = [ { material = 0 } ]\n"
    )
    # tracer semantics: no demotion with or without --boxes (small scene)
    assert auto_route(s, "tpu")[0] == "pallas"
    assert auto_route(s, "tpu", include_boxes=True)[0] == "pallas"


def test_make_render_step_frame_batching():
    """frames=k returns (k, H, W, 3); frame 0 bit-matches the unbatched
    step (same seed chain) and other frames carry independent seeds."""
    import rt_tpu
    from rt_tpu.ops.pallas_render import make_render_step

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    kw = dict(spp=2, max_bounces=3, rng_impl="hash", interpret=True)
    a = np.asarray(make_render_step(s, (64, 48), **kw)(seed=5))
    b = np.asarray(make_render_step(s, (64, 48), frames=4, **kw)(seed=5))
    assert b.shape == (4, 48, 64, 3)
    np.testing.assert_array_equal(a, b[0])
    assert not np.array_equal(b[0], b[1])


def test_hand_reverse_matches_vjp():
    """The hand-fused reverse bounce (tune 'hand_rev', spheres-only
    lambert/metal specialization) must match the generic jax.vjp transpose
    to float eps."""
    import rt_tpu
    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    scene = rt_tpu.load("/root/reference/scenes/basic.toml")
    params = diff.extract_params(scene)
    tgt = jnp.zeros((48, 64, 3), jnp.float32)
    kw = dict(spp=2, max_bounces=4, rng_impl="hash", interpret=True, seed=3)
    l0, g0 = pallas_mse_loss_and_grad(params, scene, tgt, (64, 48), **kw)
    l1, g1 = pallas_mse_loss_and_grad(
        params, scene, tgt, (64, 48),
        tune=("acc_scratch", "fwd_dense", "recompute_u", "hand_rev"), **kw)
    assert float(l0) == float(l1)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=5e-4, atol=1e-7, err_msg=k)


def test_hand_reverse_matches_vjp_dielectric():
    """Dielectric-family hand reverse (Fresnel chain transpose) vs vjp."""
    import rt_tpu
    from rt_tpu import diff
    from rt_tpu.ops.pallas_grad import pallas_mse_loss_and_grad

    scene = rt_tpu.load("/root/reference/scenes/dielectric.toml")
    params = diff.extract_params(scene)
    tgt = jnp.zeros((24, 32, 3), jnp.float32)
    kw = dict(spp=1, max_bounces=3, rng_impl="hash", interpret=True,
              seed=5, personality="sm")
    l0, g0 = pallas_mse_loss_and_grad(params, scene, tgt, (32, 24),
                                      tune=(), **kw)
    l1, g1 = pallas_mse_loss_and_grad(
        params, scene, tgt, (32, 24),
        tune=("acc_scratch", "fwd_dense", "recompute_u", "hand_rev"), **kw)
    assert float(l0) == float(l1)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=5e-4, atol=1e-7, err_msg=k)


def test_interpret_record_replay_roundtrip_boxes():
    """--boxes extension through the record kernel (round-3 VERDICT item 9):
    kind=3 records + the smooth slab replay reproduce the kernel's own
    radiance on a box scene, and pallas_loss_and_grad delivers finite
    box-geometry gradients matching the jnp replay pipeline."""
    from rt_tpu import diff
    from rt_tpu.camera import generate_rays
    from rt_tpu.integrator import _pixel_grid
    from rt_tpu.ops.pallas_render import records_to_flat, render_record_pallas
    from rt_tpu.replay import PathRecords, replay_radiance

    s = rt_tpu.loads(
        """
materials = [ { type = 'lambert', albedo = 'gray' },
              { type = 'metal', albedo = 'white', roughness = 0.1 },
              { type = 'lambert', albedo = 'red' } ]
spheres = [ { material = 0, position = [0,-1000,0], radius = 1000 } ]
boxes = [ { material = 2, position = [0, 0.5, -3], extents = [0.5, 0.5, 0.5] },
          { material = 1, position = [1.6, 0.4, -3.5], extents = [0.4, 0.4, 0.4] } ]
"""
    )
    w, h, B = 32, 24, 3
    n = w * h
    rad, recs = render_record_pallas(
        s, (w, h), seed=3, max_bounces=B, rows=8, rng_impl="hash",
        interpret=True, center_sample=False, include_boxes=True)
    flat = records_to_flat(recs, n, B)
    assert (flat["kind"] == 3).any(), "box winners must be recorded"
    kernel_img = np.asarray(rad).transpose(0, 2, 3, 1).reshape(-1, 3)[:n]

    grid = _pixel_grid((w, h))
    o, d = generate_rays(s.camera, (w, h), grid + flat["jitter"])
    pr = PathRecords(
        kind=flat["kind"], idx=flat["idx"], root_lo=flat["root_lo"],
        live_in=flat["live_in"], miss=flat["miss"],
        alive_out=flat["alive_out"], reflect_bit=flat["reflect_bit"],
        lam_deg=flat["lam_deg"],
    )
    replayed = np.asarray(replay_radiance(
        s, o, d, None, pr, personality="mg", max_bounces=B,
        draws=(flat["ur"], flat["coin"]), include_boxes=True))
    np.testing.assert_allclose(kernel_img, replayed, atol=1e-4)

    # end-to-end: the records grad pipeline on a box scene
    params = diff.extract_params(s)
    target = jnp.zeros((h, w, 3), jnp.float32)
    loss, grads = diff.pallas_loss_and_grad(
        params, s, target, (w, h), seed=1, spp=2, max_bounces=B,
        rng_impl="hash", interpret=True, include_boxes=True)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k
    assert np.abs(np.asarray(grads["boxes.center"])).max() > 0
