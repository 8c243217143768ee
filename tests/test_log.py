"""Silent-fallback visibility (VERDICT r1 item 9): the performance-relevant
downgrades must warn (once), and the records-pipeline recompile must log."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

import rt_tpu
from rt_tpu import log as rtlog


@pytest.fixture(autouse=True)
def _fresh_warnings():
    rtlog.reset_warnings()
    yield
    rtlog.reset_warnings()


def test_warn_once_is_once(capsys):
    assert rtlog.warn_once("k", "message one")
    assert not rtlog.warn_once("k", "message one")
    err = capsys.readouterr().err
    assert err.count("message one") == 1


def test_sharded_replay_no_downgrade(capsys):
    """Round 3: prims-sharded replay runs the global-winner path — the
    round-2 warn-and-downgrade-to-autodiff is gone (tests/test_dist.py
    asserts gradient parity; here: NO warning is emitted)."""
    from rt_tpu import dist

    mesh = dist.make_mesh(2, 2, devices=jax.devices()[:4])
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    img = dist.render_image_sharded(
        s, (32, 24), jr.key(0), mesh, spp=1, max_bounces=2,
        grad_mode="replay")
    np.asarray(img)
    assert "downgrading" not in capsys.readouterr().err


def test_auto_route_warns_on_unsupported_scene():
    from rt_tpu.renderer import auto_route

    small = rt_tpu.load("/root/reference/scenes/basic.toml")
    assert auto_route(small, "tpu") == ("pallas", None)
    assert auto_route(small, "cpu") == ("jnp", None)

    big = rt_tpu.scene.make_procedural_scene(700)
    route, warning = auto_route(big, "tpu")
    assert route == "blockwise" and warning is None

    # round 3: box scenes route to the kernels (reference box-stub
    # semantics; --boxes bakes the slab test).  Round 5: --boxes past
    # the unrolled cap rides the BLOCKWISE slab-table scan — no more
    # jnp demotion (and no warning) until the 16384-primitive cap.
    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert' } ]\nboxes = [ { material = 0 } ]\n"
    )
    assert auto_route(boxy, "tpu") == ("pallas", None)
    big_boxy = rt_tpu.scene.make_procedural_scene(700)
    import dataclasses

    big_boxy = dataclasses.replace(big_boxy, boxes=boxy.boxes)
    route, warning = auto_route(big_boxy, "tpu", include_boxes=True)
    assert route == "blockwise" and warning is None
    huge = rt_tpu.scene.make_procedural_scene(17000)
    route, warning = auto_route(huge, "tpu")
    assert route == "jnp" and warning is not None

    # many-primitive scenes ride the wavefront, with or without --boxes
    # (the wavefront bounce kernels carry the slab-scan table since
    # round 5 — a box scene must never be silently rendered box-less)
    from rt_tpu.ops.pallas_wavefront import wavefront_supported

    many = rt_tpu.scene.make_procedural_scene(2100)
    assert auto_route(many, "tpu") == ("wavefront", None)
    many_boxy = dataclasses.replace(many, boxes=boxy.boxes)
    assert wavefront_supported(many_boxy, include_boxes=True) is True
    assert auto_route(many_boxy, "tpu", include_boxes=True) == \
        ("wavefront", None)
    assert auto_route(many_boxy, "tpu") == ("wavefront", None)


def test_records_pipeline_recompile_logs(capsys):
    from rt_tpu import diff

    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    size, spp, B = (16, 8), 1, 2
    params = diff.extract_params(s)
    target = jnp.zeros((size[1], size[0], 3), jnp.float32)
    kw = dict(seed=0, spp=spp, max_bounces=B, rng_impl="hash", interpret=True)

    diff.pallas_loss_and_grad(params, s, target, size, **kw)
    capsys.readouterr()
    # same params: no recompile log
    diff.pallas_loss_and_grad(params, s, target, size, **kw)
    assert "recompiles" not in capsys.readouterr().err
    # changed param values: the silent recompile is now logged
    p2 = dict(params)
    p2["spheres.radius"] = params["spheres.radius"] + 0.01
    diff.pallas_loss_and_grad(p2, s, target, size, **kw)
    assert "recompiles" in capsys.readouterr().err
