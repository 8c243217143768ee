"""Blockwise fused fwd+bwd kernel tests (rt_tpu.ops.pallas_blockwise_grad).

Runs entirely on CPU via pallas interpret mode + the portable hash RNG
(deterministic for a fixed seed, so finite differences apply directly).

Gradient convention is detached sampling: whole-image FD validates the
*material* gradients (silhouette-free integrand); geometry/camera gradients
are validated with a one-pixel cotangent on an interior (smooth-path) pixel
where FD of the forward radiance is legitimate.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rt_tpu
from rt_tpu import diff
from rt_tpu.ops.pallas_blockwise import _bucket, _compiled_bw, _padded_table
from rt_tpu.ops.pallas_blockwise_grad import (
    bw_grad_supported,
    bw_mse_loss_and_grad,
    make_bw_mse_step,
)
from rt_tpu.ops.pallas_render import _flatten_primitives

SIZE = (32, 24)
SPP = 2
MB = 4
KW = dict(spp=SPP, max_bounces=MB, rng_impl="hash", interpret=True)


@functools.lru_cache(maxsize=1)
def _setup():
    scene = rt_tpu.load("/root/reference/scenes/basic.toml")
    params = diff.extract_params(scene)
    return scene, params


def _render(scene, s_tab, p_tab, cam, seed, size=SIZE):
    """The pipeline's own forward chaining (seeds seed*100003+s, center
    sample first) so FD probes see exactly the differentiated estimator."""
    w, h = size
    s_pad, p_pad = s_tab.shape[0], p_tab.shape[0]
    total = None
    for s in range(SPP):
        meta = jnp.asarray(
            [seed * 100003 + s, scene.spheres.count, scene.planes.count, 0],
            jnp.int32)
        call = _compiled_bw(width=w, height=h, s_pad=s_pad, p_pad=p_pad,
                            spp_unroll=1, max_bounces=MB,
                            rng_mode="reference", rng_impl="hash",
                            center_sample=(s == 0), interpret=True, block=8)
        out = call(meta, cam, s_tab, p_tab)
        total = out if total is None else total + out
    img = (total[:, :, 0, :] / SPP).transpose(0, 2, 1).reshape(-1, 3)
    return np.asarray(img[: w * h]).reshape(h, w, 3)


def _tables_and_cam(scene, size=SIZE):
    w, h = size
    s_cols, p_cols = _flatten_primitives(scene, "mg")
    s_tab = jnp.asarray(_padded_table(s_cols, _bucket(scene.spheres.count)))
    p_tab = jnp.asarray(_padded_table(p_cols, _bucket(scene.planes.count)))
    cam = jnp.concatenate([
        jnp.asarray(scene.camera.position, jnp.float32),
        jnp.asarray(scene.camera.rotation, jnp.float32).reshape(-1),
        jnp.asarray([np.tan(scene.camera.vfov * 0.5), w / h,
                     scene.camera.near, 0.0], jnp.float32),
    ])
    return s_tab, p_tab, cam


def test_supported_gate():
    scene, _ = _setup()
    assert bw_grad_supported(scene)
    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert' } ]\nboxes = [ { material = 0 } ]\n")
    assert not bw_grad_supported(boxy)


def test_loss_finite_and_grad_keys():
    scene, params = _setup()
    target = jnp.zeros((SIZE[1], SIZE[0], 3), jnp.float32)
    loss, grads = bw_mse_loss_and_grad(params, scene, target, SIZE, seed=3,
                                       **KW)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("spheres.center", "spheres.radius", "materials.albedo",
              "materials.roughness", "materials.reflectivity",
              "camera.position", "camera.rotation"):
        assert k in grads
        assert np.all(np.isfinite(np.asarray(grads[k])))


@pytest.mark.parametrize("name,idx", [
    ("materials.reflectivity", (0,)),
    ("materials.albedo", (1, 0)),
    ("materials.roughness", (2,)),
])
def test_material_grads_match_whole_image_fd(name, idx):
    scene, params = _setup()
    target = jnp.zeros((SIZE[1], SIZE[0], 3), jnp.float32)
    _, grads = bw_mse_loss_and_grad(params, scene, target, SIZE, seed=3, **KW)
    eps = 1e-3
    hi = dict(params)
    hi[name] = params[name].at[idx].set(params[name][idx] + eps)
    lo = dict(params)
    lo[name] = params[name].at[idx].set(params[name][idx] - eps)
    lh, _ = bw_mse_loss_and_grad(hi, scene, target, SIZE, seed=3, **KW)
    ll, _ = bw_mse_loss_and_grad(lo, scene, target, SIZE, seed=3, **KW)
    fd = (float(lh) - float(ll)) / (2 * eps)
    an = float(grads[name][idx])
    assert abs(an - fd) <= max(0.05 * abs(fd), 1e-5), (an, fd)


def test_geometry_grads_match_one_pixel_fd():
    scene, params = _setup()
    w, h = SIZE
    s_tab, p_tab, cam = _tables_and_cam(scene)
    img0 = _render(scene, s_tab, p_tab, cam, 3)
    # interior pixel of the fuchsia sphere (max r-g): a smooth path
    fy, fx = np.unravel_index(np.argmax(img0[..., 0] - img0[..., 1]),
                              img0.shape[:2])
    target = jnp.asarray(img0).at[fy, fx].add(-1.0)
    _, grads = bw_mse_loss_and_grad(params, scene, target, SIZE, seed=3, **KW)
    # cot = 2*(img-target)/(3*n*spp) applied per sample; summed over spp
    # samples the analytic grad is (2/(3n)) * d img[fy,fx] / d p
    scale = 2.0 / (3.0 * w * h)
    eps = 1e-4
    checks = [
        ("spheres.center", (1, 0), lambda e: (s_tab.at[1, 0].add(e), cam)),
        ("spheres.radius", (1,), lambda e: (s_tab.at[1, 3].add(e), cam)),
        ("camera.position", (0,), lambda e: (s_tab, cam.at[0].add(e))),
    ]
    for name, idx, bump in checks:
        sh, ch = bump(eps)
        sl, cl = bump(-eps)
        ih = _render(scene, sh, p_tab, ch, 3)
        il = _render(scene, sl, p_tab, cl, 3)
        fd = float((ih[fy, fx] - il[fy, fx]).sum() / (2 * eps)) * scale
        an = float(grads[name][idx])
        assert abs(an) > 1e-9, f"{name}: expected non-zero gradient"
        assert abs(an - fd) <= max(0.06 * abs(fd), 1e-8), (name, an, fd)


def test_pipeline_reused_across_param_updates():
    # tables are runtime inputs: stepping parameters must NOT recompile
    from rt_tpu.ops import pallas_blockwise_grad as bwg

    scene, params = _setup()
    target = jnp.zeros((SIZE[1], SIZE[0], 3), jnp.float32)
    _ = bw_mse_loss_and_grad(params, scene, target, SIZE, seed=1, **KW)
    before = bwg._bw_grad_pipeline.cache_info()
    p2 = dict(params)
    p2["materials.reflectivity"] = params["materials.reflectivity"] * 0.9
    p2["spheres.center"] = params["spheres.center"] + 0.01
    _ = bw_mse_loss_and_grad(p2, scene, target, SIZE, seed=1, **KW)
    after = bwg._bw_grad_pipeline.cache_info()
    assert after.misses == before.misses
    assert after.hits == before.hits + 1


def test_train_step_decreases_loss_without_recompile():
    import optax

    from rt_tpu.ops import pallas_blockwise_grad as bwg
    from rt_tpu.ops.pallas_blockwise_grad import make_bw_train_step

    scene, params = _setup()
    size = (24, 16)
    # target: the scene with a dimmer fuchsia sphere — recover via albedo
    s_tab, p_tab, cam = _tables_and_cam(scene, size)
    target = jnp.asarray(_render(scene, s_tab, p_tab, cam, 7, size))

    p0 = {"materials.albedo": params["materials.albedo"] * 0.6}
    opt = optax.adam(5e-2)
    step = make_bw_train_step(opt, scene, target, size, spp=SPP,
                              max_bounces=MB, rng_impl="hash",
                              interpret=True)
    opt_state = opt.init(p0)
    losses = []
    p = p0
    for i in range(4):
        p, opt_state, loss = step(p, opt_state, 7)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    # the jitted step must not retrace across parameter updates
    assert step._cache_size() == 1


def test_sharded_train_step_matches_single_device():
    import optax

    from rt_tpu import dist
    from rt_tpu.ops.pallas_blockwise_grad import make_bw_train_step

    scene, params = _setup()
    size = (32, 24)
    target = jnp.zeros((size[1], size[0], 3), jnp.float32)
    p0 = {"materials.albedo": params["materials.albedo"] * 0.8,
          "spheres.center": params["spheres.center"]}
    opt = optax.adam(1e-2)
    kw = dict(spp=SPP, max_bounces=MB, rng_impl="hash", interpret=True)
    st1 = make_bw_train_step(opt, scene, target, size, **kw)
    st8 = make_bw_train_step(opt, scene, target, size,
                             mesh=dist.make_mesh(8, 1), **kw)
    s1 = opt.init(p0)
    s8 = opt.init(p0)
    p1, _, l1 = st1(p0, s1, 5)
    p8, _, l8 = st8(p0, s8, 5)
    # per-shard tile offsets keep RNG streams globally unique => identical
    # estimator; the psum only reorders the loss/grad reductions
    assert abs(float(l1) - float(l8)) < 1e-6
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p8[k]),
                                   atol=1e-6)


def test_large_scene_grads_run():
    # >640 primitives: beyond both unrolled kernels' caps
    scene = rt_tpu.scene.make_procedural_scene(700)
    params = diff.extract_params(scene)
    target = jnp.zeros((12, 16, 3), jnp.float32)
    loss, grads = bw_mse_loss_and_grad(params, scene, target, (16, 12),
                                       seed=0, spp=1, max_bounces=2,
                                       rng_impl="hash", interpret=True)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["spheres.center"])
    assert g.shape[0] >= 700 and np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0
