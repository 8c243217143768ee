import numpy as np

from rt_tpu.viewer import ansi_preview


def test_ansi_preview_shape():
    img = np.zeros((8, 10, 3), np.float32)
    img[:4] = [1.0, 0.0, 0.0]
    s = ansi_preview(img, max_width=10)
    lines = s.split("\n")
    assert len(lines) == 4  # two pixels per character row
    assert "38;2;255;0;0" in lines[0]
    assert "\x1b[0m" in lines[0]


def test_ansi_preview_downscale():
    img = np.ones((100, 400, 3), np.float32)
    s = ansi_preview(img, max_width=100)
    # downscaled to at most 100 columns
    assert max(line.count("▀") for line in s.split("\n")) <= 100


def test_odd_height_padding():
    img = np.ones((3, 4, 3), np.float32) * 0.5
    s = ansi_preview(img, max_width=4)
    assert len(s.split("\n")) == 2
