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


def _advanced_state(scene):
    """Params + a NON-trivial Adam state (one real update so mu/nu != 0)."""
    import jax
    import optax

    params = diff.extract_params(scene)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 0.1, params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return opt, params, opt_state


def _assert_state_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(tmp_path, scene):
    opt, params, opt_state = _advanced_state(scene)
    train.save_checkpoint(str(tmp_path), params, opt_state, 7)
    restored = train.restore_checkpoint(str(tmp_path), params, opt_state)
    assert restored is not None
    r_params, r_opt, step = restored
    assert step == 7
    for k in params:
        np.testing.assert_allclose(np.asarray(r_params[k]), np.asarray(params[k]))
    # optimizer state (incl. Adam moments) must survive the round trip
    _assert_state_equal(r_opt, opt_state)


def test_checkpoint_npz_fallback_keeps_opt_state(tmp_path, scene, monkeypatch):
    """Force the .npz fallback path (orbax import fails) and assert the Adam
    moments survive the round trip — round-2 VERDICT item 7."""
    import builtins
    import optax

    opt, params, opt_state = _advanced_state(scene)

    real_import = builtins.__import__

    def no_orbax(name, *args, **kwargs):
        if name.startswith("orbax"):
            raise ImportError("orbax disabled for test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_orbax)
    train.save_checkpoint(str(tmp_path), params, opt_state, 3)
    assert any(p.name.endswith(".npz") for p in tmp_path.iterdir())
    restored = train.restore_checkpoint(str(tmp_path), params, opt.init(params))
    assert restored is not None
    r_params, r_opt, step = restored
    assert step == 3
    _assert_state_equal(r_opt, opt_state)
    # a further optimizer step runs cleanly on the restored state
    grads = {k: jnp.ones_like(v) * 0.05 for k, v in r_params.items()}
    updates, _ = opt.update(grads, r_opt, r_params)
    optax.apply_updates(r_params, updates)


def test_kernel_train_step_router():
    # small scenes -> the blockwise fused step; many-primitive scenes ->
    # the wavefront record/reverse step (train crossover at 1024 padded
    # prims — below the forward-only 2048, train.py docstring)
    import optax

    import rt_tpu
    from rt_tpu import train
    from rt_tpu.ops import pallas_blockwise_grad as bwg
    from rt_tpu.ops import pallas_wavefront_grad as wfg

    opt = optax.adam(1e-2)
    small = rt_tpu.load("/root/repo/scenes/basic.toml")
    big = rt_tpu.scene.make_procedural_scene(2100)
    tgt = jnp.zeros((16, 24, 3), jnp.float32)
    calls = []
    orig_bw, orig_wf = bwg.make_bw_train_step, wfg.make_wf_train_step
    try:
        bwg.make_bw_train_step = lambda *a, **k: calls.append("bw")
        wfg.make_wf_train_step = lambda *a, **k: calls.append("wf")
        # the router imports from the modules at call time
        train.make_kernel_train_step(opt, small, tgt, (24, 16))
        train.make_kernel_train_step(opt, big, tgt, (24, 16))
    finally:
        bwg.make_bw_train_step = orig_bw
        wfg.make_wf_train_step = orig_wf
    assert calls == ["bw", "wf"]
