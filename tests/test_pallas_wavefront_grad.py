"""Wavefront fused fwd+bwd (rt_tpu.ops.pallas_wavefront_grad), interpret
mode on CPU.

Validation strategy (the strongest checks available per property):

* The record pass IS the frame: the step's loss equals the MSE of the
  forward-only wavefront render at the same seed/chunking.
* At spp=1 with matched seeds the estimator is draw-for-draw identical to
  the pixel-major blockwise grad pipeline (bw per-sample seed =
  seed0*100003; wavefront chunk seed = that product), so gradients must
  agree — near-exactly at shallow depth.  At deeper depth tiny per-lane
  deltas appear because the BLOCKWISE grad kernel re-runs its own forward
  sweep whose state drifts +-ulp from the true forward, while the
  wavefront reverse consumes the true recorded states; the wavefront side
  was verified to 1e-11 against a straight-line jnp reverse of the same
  records (round-5 debug harness), so the comparison here uses a small
  absolute floor.
* FD through the step's OWN loss on smooth parameters (reflectivity,
  albedo) — the decisive detached-sampling check (geometry/camera FD on a
  full image includes visibility discontinuities the convention
  deliberately omits, as everywhere else in this repo).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rt_tpu
from rt_tpu import diff
from rt_tpu.ops.pallas_blockwise_grad import make_bw_mse_step
from rt_tpu.ops.pallas_wavefront import render_forward_wavefront
from rt_tpu.ops.pallas_wavefront_grad import (
    make_wf_mse_step,
    make_wf_train_step,
    wf_grad_supported,
)

W, H = 64, 48


@pytest.fixture(scope="module")
def basic():
    return rt_tpu.load("/root/repo/scenes/basic.toml")


def test_loss_matches_forward_frame(basic):
    params = diff.extract_params(basic)
    tgt = jnp.zeros((H, W, 3), jnp.float32)
    step = make_wf_mse_step(params, basic, tgt, (W, H), spp=2,
                            max_bounces=4, interpret=True)
    loss, grads = step(3)
    img = np.asarray(render_forward_wavefront(
        basic, (W, H), seed=3, spp=2, max_bounces=4, gamma=False,
        interpret=True))
    assert abs(float(loss) - float(np.mean(img ** 2))) < 1e-6
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k
    assert np.abs(np.asarray(grads["spheres.center"])).max() > 0
    assert np.abs(np.asarray(grads["camera.position"])).max() > 0


def test_grads_match_blockwise_matched_draws(basic):
    params = diff.extract_params(basic)
    tgt = jnp.full((H, W, 3), 0.25, jnp.float32)
    S = 11
    wf = make_wf_mse_step(params, basic, tgt, (W, H), spp=1, max_bounces=3,
                          interpret=True)
    bw = make_bw_mse_step(params, basic, tgt, (W, H), spp=1, max_bounces=3,
                          rng_impl="hash", interpret=True)
    lw, gw = wf(S * 100003)
    lb, gb = bw(S)
    assert float(lw) == float(lb)  # same estimator, same draws
    for k in gw:
        a, b = np.asarray(gw[k]), np.asarray(gb[k])
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, err_msg=k)


def test_fd_smooth_params(basic):
    params = diff.extract_params(basic)
    tgt = jnp.full((H, W, 3), 0.25, jnp.float32)
    seed = 7

    def loss_at(p):
        st = make_wf_mse_step(p, basic, tgt, (W, H), spp=2, max_bounces=4,
                              interpret=True)
        return float(st(seed)[0])

    step = make_wf_mse_step(params, basic, tgt, (W, H), spp=2,
                            max_bounces=4, interpret=True)
    _, grads = step(seed)
    for name, idx, eps, tol in [
        ("materials.reflectivity", (0,), 1e-3, 2e-2),
        ("materials.albedo", (1, 0), 1e-3, 2e-2),
    ]:
        p_hi = dict(params)
        p_lo = dict(params)
        p_hi[name] = params[name].at[idx].add(eps)
        p_lo[name] = params[name].at[idx].add(-eps)
        fd = (loss_at(p_hi) - loss_at(p_lo)) / (2 * eps)
        an = float(np.asarray(grads[name])[idx])
        assert abs(an - fd) <= tol * max(abs(fd), 1e-6), (name, an, fd)


def test_multi_chunk_spp(basic):
    # spp > spp_chunk exercises the per-chunk seed chain + grad summation
    params = diff.extract_params(basic)
    tgt = jnp.zeros((H, W, 3), jnp.float32)
    one = make_wf_mse_step(params, basic, tgt, (W, H), spp=4, max_bounces=3,
                           spp_chunk=4, interpret=True)
    two = make_wf_mse_step(params, basic, tgt, (W, H), spp=4, max_bounces=3,
                           spp_chunk=2, interpret=True)
    l1, g1 = one(5)
    l2, g2 = two(5)
    # different chunkings = different seed chains -> statistically close,
    # not equal; gradients must at least be finite and same-scale
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b)), k


def test_windowed_culled_morton_path():
    # >=512 padded spheres turns on cull + Morton sort + the 256-row
    # windowed fetch/scatter; gradient parity vs blockwise at matched
    # draws proves the window fallbacks and the inverse-permutation
    # assembly
    s = rt_tpu.scene.make_procedural_scene(600)
    assert wf_grad_supported(s)
    w, h, B = 48, 32, 2
    params = diff.extract_params(s)
    tgt = jnp.full((h, w, 3), 0.25, jnp.float32)
    S = 5
    wf = make_wf_mse_step(params, s, tgt, (w, h), spp=1, max_bounces=B,
                          interpret=True)
    bw = make_bw_mse_step(params, s, tgt, (w, h), spp=1, max_bounces=B,
                          rng_impl="hash", interpret=True)
    lw, gw = wf(S * 100003)
    lb, gb = bw(S)
    assert float(lw) == float(lb)
    for k in gw:
        a, b = np.asarray(gw[k]), np.asarray(gb[k])
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, err_msg=k)


def test_train_step_descends(basic):
    import optax

    params = diff.extract_params(basic)
    tgt = np.asarray(render_forward_wavefront(
        basic, (W, H), seed=0, spp=2, max_bounces=3, gamma=False,
        interpret=True))
    # perturb a material and train back toward the rendered target
    # (albedo only — adam moves EVERY trained param ~lr per step
    # regardless of gradient scale, so including the camera pose in a
    # near-converged init just wrecks the image)
    p0 = {"materials.albedo": params["materials.albedo"] * 0.7}
    opt = optax.adam(2e-2)
    step = make_wf_train_step(opt, basic, tgt, (W, H), spp=2, max_bounces=3,
                              interpret=True)
    st = opt.init(p0)
    p, losses = p0, []
    for i in range(4):
        p, st, loss = step(p, st, 0)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sharded_matches_unsharded(basic):
    # global ray ids keep per-ray hash draws layout-independent, so the
    # ray-sharded pipeline reproduces the unsharded loss bit-for-bit and
    # the psum'd gradients to float-association noise, on any mesh shape
    from rt_tpu import dist

    params = diff.extract_params(basic)
    tgt = jnp.full((H, W, 3), 0.25, jnp.float32)
    ref_step = make_wf_mse_step(params, basic, tgt, (W, H), spp=2,
                                max_bounces=3, interpret=True)
    l0, g0 = ref_step(13)
    for n_dev in (2, 4):
        mesh = dist.make_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        st = make_wf_mse_step(params, basic, tgt, (W, H), spp=2,
                              max_bounces=3, interpret=True, mesh=mesh)
        l1, g1 = st(13)
        assert float(l1) == float(l0), n_dev
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b, a, atol=1e-5 * scale,
                                       err_msg=f"{k}@{n_dev}")
