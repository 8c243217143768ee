"""Numerical-hygiene guards (the functional-model analogue of the
reference's absent TSan/race jobs, SURVEY.md §5): renders and gradients
must be NaN/Inf-free under jax_debug_nans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rt_tpu
from rt_tpu import diff


@pytest.fixture(autouse=True)
def nan_debugging():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def test_render_nan_free_basic():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = rt_tpu.integrator.render_image(s, (24, 16), rt_tpu.rng.make_key(0),
                                         spp=2, max_bounces=4)
    assert np.all(np.isfinite(np.asarray(img)))


def test_render_nan_free_dielectric():
    s = rt_tpu.load("/root/reference/scenes/dielectric.toml")
    img = rt_tpu.integrator.render_image(s, (24, 16), rt_tpu.rng.make_key(0),
                                         spp=2, max_bounces=4, personality="sm")
    assert np.all(np.isfinite(np.asarray(img)))


def test_grads_nan_free_under_debug():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    params = diff.extract_params(s)
    target = jnp.zeros((16, 24, 3))
    for mode in ("autodiff", "replay"):
        loss, grads = diff.loss_and_grad(
            params, s, target, (24, 16), rt_tpu.rng.make_key(1),
            spp=1, max_bounces=3, grad_mode=mode,
        )
        assert np.isfinite(float(loss))
        for k, g in grads.items():
            assert np.all(np.isfinite(np.asarray(g))), (mode, k)


def test_degenerate_geometry_no_nans():
    # zero-radius sphere, duplicate spheres, grazing plane
    s = rt_tpu.loads(
        "materials = [ { type = 'metal', albedo = 'white', roughness = 0 } ]\n"
        "spheres = [ { material = 0, position = [0,1,-3], radius = 0.0 },\n"
        "            { material = 0, position = [0,1,-3], radius = 0.5 },\n"
        "            { material = 0, position = [0,1,-3], radius = 0.5 } ]\n"
        "planes = [ { material = 0, position = 'origin', normal = 'up' } ]\n"
    )
    img = rt_tpu.integrator.render_image(s, (16, 12), rt_tpu.rng.make_key(0),
                                         spp=2, max_bounces=6)
    assert np.all(np.isfinite(np.asarray(img)))
