import numpy as np
import pytest

from rt_tpu.colour import (
    NAMED_COLOURS,
    colour_from_hex,
    pack_rgba8888,
    resolve_colour,
    unpack_rgba8888,
)


def test_named_colour_compat_binarization():
    # colour.hpp:72-84: integer components clamp to [0,1] without /255 —
    # named colours binarize to RGB-cube corners.
    assert resolve_colour("gray_33") == (1.0, 1.0, 1.0, 1.0)
    assert resolve_colour("fuchsia") == (1.0, 0.0, 1.0, 1.0)
    assert resolve_colour("black") == (0.0, 0.0, 0.0, 1.0)
    assert resolve_colour("navy") == (0.0, 0.0, 1.0, 1.0)
    assert resolve_colour("white") == (1.0, 1.0, 1.0, 1.0)


def test_named_colour_true_mode():
    r, g, b, a = resolve_colour("gray_33", compat=False)
    assert abs(r - 0xAA / 255) < 1e-6 and r == g == b and a == 1.0


def test_unknown_alias_raises():
    with pytest.raises(ValueError, match="unknown colour alias"):
        resolve_colour("not_a_colour")


def test_array_colour():
    # float components pass through with [0,1] clamp; missing alpha = 1
    # (scene.cpp:347-356).
    assert resolve_colour([0.25, 0.5, 2.0]) == (0.25, 0.5, 1.0, 1.0)
    assert resolve_colour([0.1, 0.2, 0.3, 0.4]) == pytest.approx((0.1, 0.2, 0.3, 0.4))
    with pytest.raises(ValueError):
        resolve_colour([0.1] * 5)


def test_all_names_resolve():
    # 149 named constants in colour.hpp:181-334 (inline constexpr colour …)
    assert len(NAMED_COLOURS) == 149
    for n in NAMED_COLOURS:
        c = resolve_colour(n)
        assert all(v in (0.0, 1.0) for v in c)


def test_pack_matches_reference_formula():
    # colour.hpp:100-106: clamp, * 255.99999, truncate.
    img = np.array([[[0.0, 0.5, 1.0]]], np.float32)
    w = pack_rgba8888(img)
    assert w[0, 0] == (0 << 24) | (127 << 16) | (255 << 8) | 255


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (4, 5, 3)).astype(np.float32)
    w = pack_rgba8888(img)
    back = unpack_rgba8888(w)
    assert np.allclose(back[..., :3], img, atol=1.5 / 255)
    assert np.all(back[..., 3] == 1.0)


def test_colour_from_hex():
    assert colour_from_hex(0xFF00FF) == (1.0, 0.0, 1.0, 1.0)
    assert colour_from_hex(0x000000) == (0.0, 0.0, 0.0, 1.0)
    r, g, b, a = colour_from_hex(0x7FFFD4, compat=False)
    assert abs(r - 127 / 255) < 1e-6


def test_rgba_argb_literals():
    from rt_tpu.colour import colour_from_argb_hex, colour_from_rgba_hex

    # _rgba UDL: 0xRRGGBBAA (colour.hpp:158-162)
    assert colour_from_rgba_hex(0xFF000080, compat=False) == pytest.approx(
        (1.0, 0.0, 0.0, 128 / 255)
    )
    # _argb UDL: 0xAARRGGBB rotated into RGBA (colour.hpp:171-176)
    assert colour_from_argb_hex(0x80FF0000, compat=False) == pytest.approx(
        (1.0, 0.0, 0.0, 128 / 255)
    )
    # compat binarization applies to literals too
    assert colour_from_rgba_hex(0xAA00AAFF) == (1.0, 0.0, 1.0, 1.0)
