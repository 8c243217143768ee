"""Replay-mode gradients: value equality with the direct trace, gradient
equality with direct autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rt_tpu
from rt_tpu import diff
from rt_tpu.integrator import trace_batch
from rt_tpu.replay import replay_radiance, trace_batch_recorded, trace_batch_replay

SCENE = "/root/reference/scenes/basic.toml"
DIELECTRIC = "/root/reference/scenes/dielectric.toml"


def _rays(scene, size=(24, 16)):
    from rt_tpu.camera import generate_rays

    w, h = size
    idx = np.arange(w * h)
    grid = jnp.asarray(
        np.stack([idx % w, idx // w], axis=-1).astype(np.float32) + 0.5
    )
    return generate_rays(scene.camera, size, grid)


@pytest.mark.parametrize("scene_file,personality", [
    (SCENE, "mg"), (DIELECTRIC, "sm"),
])
def test_replay_value_matches_trace(scene_file, personality):
    s = rt_tpu.load(scene_file)
    o, d = _rays(s)
    key = rt_tpu.rng.make_key(9)
    direct = trace_batch(s, o, d, key, personality=personality, max_bounces=5)
    replay = trace_batch_replay(s, o, d, key, personality=personality, max_bounces=5)
    # tolerance covers float reassociation between the two compiled programs
    np.testing.assert_allclose(np.asarray(replay), np.asarray(direct), atol=1e-4, rtol=1e-4)


def test_records_shapes():
    s = rt_tpu.load(SCENE)
    o, d = _rays(s, (8, 8))
    rad, recs = trace_batch_recorded(s, o, d, rt_tpu.rng.make_key(0), max_bounces=3)
    assert rad.shape == (64, 3)
    assert recs.kind.shape == (3, 64)
    assert recs.miss.dtype == bool


@pytest.mark.parametrize("scene_file,personality", [
    (SCENE, "mg"), (DIELECTRIC, "sm"),
])
def test_replay_grads_match_autodiff(scene_file, personality):
    s = rt_tpu.load(scene_file)
    key = rt_tpu.rng.make_key(4)
    size = (24, 16)
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3))

    def loss(p, mode):
        return diff.image_loss(p, s, target, size, key, spp=2, max_bounces=4,
                               personality=personality, grad_mode=mode)

    l_auto, g_auto = jax.value_and_grad(loss)(params, "autodiff")
    l_rep, g_rep = jax.value_and_grad(loss)(params, "replay")
    assert float(l_rep) == pytest.approx(float(l_auto), rel=1e-5)
    for k in g_auto:
        np.testing.assert_allclose(
            np.asarray(g_rep[k]), np.asarray(g_auto[k]), atol=2e-4, rtol=2e-3,
            err_msg=k,
        )


def test_replay_through_sharded_render():
    from rt_tpu import dist

    s = rt_tpu.load(SCENE)
    key = rt_tpu.rng.make_key(5)
    size = (32, 16)
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3))
    mesh = dist.make_mesh(8, 1)

    def render_fn(sc, sz, k, **o):
        return dist.render_image_sharded(sc, sz, k, mesh, **o)

    l1, g1 = diff.loss_and_grad(params, s, target, size, key, spp=1, max_bounces=3,
                                ray_chunk=64)
    # shard_map with an inner scan must run under jit (eager shard_map
    # doesn't support closed_call yet)
    sharded = jax.jit(lambda p: jax.value_and_grad(diff.image_loss)(
        p, s, target, size, key, spp=1, max_bounces=3, ray_chunk=64,
        render_fn=render_fn))
    l2, g2 = sharded(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=1e-5, rtol=1e-4, err_msg=k)
