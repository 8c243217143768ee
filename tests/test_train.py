import numpy as np
import jax.numpy as jnp
import pytest

import rt_tpu
from rt_tpu import diff, train


@pytest.fixture(scope="module")
def scene():
    return rt_tpu.loads(
        "materials = [ { type = 'lambert', albedo = [0.9, 0.2, 0.2] } ]\n"
        "spheres = [ { material = 0, position = [0, 1, -3], radius = 0.6 } ]\n"
        "camera = { position = [0, 1, 0], direction = 'forward' }\n"
    )


def test_fit_recovers_albedo(scene):
    # Render a target with known albedo, perturb, optimize back.
    size = (24, 16)
    key = rt_tpu.rng.make_key(0)
    true_params = diff.extract_params(scene)
    target = diff.render_for_loss(true_params, scene, size, key, spp=2, max_bounces=2)

    start = dict(true_params)
    start["materials.albedo"] = true_params["materials.albedo"].at[0, 0].set(0.3)
    start_scene = diff.apply_params(scene, start)

    params, losses = train.fit(
        start_scene, target, size,
        steps=60, learning_rate=5e-2, param_names=["materials.albedo"],
        verbose=False, spp=2, max_bounces=2,
    )
    # the loss floors at the MC-noise level (per-step RNG differs from the
    # target's), so recovery of the parameter is the criterion
    assert losses[-1] < losses[0]
    rec = float(params["materials.albedo"][0, 0])
    assert rec == pytest.approx(0.9, abs=0.08)


def test_checkpoint_roundtrip(tmp_path, scene):
    import optax

    params = diff.extract_params(scene)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    train.save_checkpoint(str(tmp_path), params, opt_state, 7)
    restored = train.restore_checkpoint(str(tmp_path), params, opt_state)
    assert restored is not None
    r_params, _, step = restored
    assert step == 7
    for k in params:
        np.testing.assert_allclose(np.asarray(r_params[k]), np.asarray(params[k]))
