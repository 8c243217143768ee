"""Pallas megakernel tests.

The kernel only runs on real TPU hardware (Mosaic has no CPU lowering for
the PRNG primitives), so numerical tests here are structure-level; the
statistical parity run against the jnp renderer lives in
tools/tpu_smoke.py and is exercised on-device.
"""

import numpy as np
import pytest

import rt_tpu
from rt_tpu.ops.pallas_render import (
    MAX_UNROLL_PRIMS,
    _flatten_primitives,
    pallas_supported,
)


def test_supported_gates():
    s = rt_tpu.load("/root/reference/scenes/basic.toml")
    assert pallas_supported(s)
    big = rt_tpu.scene.make_procedural_scene(MAX_UNROLL_PRIMS + 100)
    assert not pallas_supported(big)
    boxy = rt_tpu.loads(
        "materials = [ { type = 'lambert' } ]\nboxes = [ { material = 0 } ]\n"
    )
    assert not pallas_supported(boxy)


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
