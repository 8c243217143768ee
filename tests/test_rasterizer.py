import os

import numpy as np

import rt_tpu
from rt_tpu.integrator import render_rasterizer

import ref_impl

REF_SCENES = "/root/reference/scenes"


def test_rasterizer_matches_mirror_basic():
    s = rt_tpu.load(os.path.join(REF_SCENES, "basic.toml"))
    img = np.asarray(render_rasterizer(s, (48, 32)))
    expected = ref_impl.rasterize_np(ref_impl.scene_to_np(s), ref_impl.camera_to_np(s), (48, 32))
    np.testing.assert_allclose(img, expected, atol=2e-4, rtol=1e-3)


def test_rasterizer_with_boxes_and_planes():
    s = rt_tpu.loads(
        "materials = [ { type = 'lambert', albedo = 'red' },"
        "              { type = 'lambert', albedo = 'blue' } ]\n"
        "planes = [ { material = 0, position = 'origin', normal = 'up' } ]\n"
        "boxes = [ { material = 1, position = [0, 1, -4], extents = 0.7 } ]\n"
        "camera = { position = [0, 1.5, 0], direction = [0, -0.2, -1] }\n"
    )
    img = np.asarray(render_rasterizer(s, (40, 30)))
    expected = ref_impl.rasterize_np(ref_impl.scene_to_np(s), ref_impl.camera_to_np(s), (40, 30))
    np.testing.assert_allclose(img, expected, atol=2e-4, rtol=1e-3)


def test_rasterizer_sky_is_white_in_compat():
    # The reference's sky constants colour{238,245,255} / colour{208,228,255}
    # binarize to white through to_component_value (colour.hpp:72-84).
    s = rt_tpu.loads("camera = { position = 'origin', direction = 'up' }\n")
    img = np.asarray(render_rasterizer(s, (8, 8)))
    assert np.allclose(img, 1.0)
    img_true = np.asarray(render_rasterizer(s, (8, 8), compat_colours=False))
    assert not np.allclose(img_true, 1.0)  # light blue gradient
