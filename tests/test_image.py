import os

import numpy as np

from rt_tpu.image import Framebuffer, to_rgba8888, write_image, write_png, write_ppm


def test_framebuffer_layout():
    fb = Framebuffer(8, 4)
    assert fb.size == (8, 4)
    assert fb.position_of(0) == (0, 0)
    assert fb.position_of(9) == (1, 1)  # image.hpp:82-85: (i % W, i // W)
    assert fb.pixels.shape == (4, 8)
    # 64-byte alignment like the reference's aligned image buffer
    assert fb.pixels.ctypes.data % 64 == 0


def test_framebuffer_clear_and_blit():
    fb = Framebuffer(4, 2)
    fb.clear()
    assert np.all(fb.pixels == 0x000000FF)
    img = np.zeros((2, 4, 3), np.float32)
    img[..., 0] = 1.0
    fb.blit(img)
    assert np.all(fb.pixels == 0xFF0000FF)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (6, 5, 3)).astype(np.float32)
    p = str(tmp_path / "out.png")
    write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # decode with zlib manually: IDAT payload reconstructs the filtered rows
    import struct
    import zlib

    pos = 8
    chunks = {}
    idat = b""
    while pos < len(data):
        ln = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IDAT":
            idat += payload
        chunks[tag] = payload
        pos += 12 + ln
    w, h = struct.unpack(">II", chunks[b"IHDR"][:8])
    assert (w, h) == (5, 6)
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + w * 4)
    assert np.all(rows[:, 0] == 0)  # no filter
    rgba = rows[:, 1:].reshape(h, w, 4)
    expect = np.clip(img * 255.99999, 0, 255.99999).astype(np.uint8)
    np.testing.assert_array_equal(rgba[..., :3], expect)
    assert np.all(rgba[..., 3] == 255)


def test_ppm_and_npy(tmp_path):
    img = np.ones((2, 3, 3), np.float32) * 0.5
    write_ppm(str(tmp_path / "a.ppm"), img)
    data = open(str(tmp_path / "a.ppm"), "rb").read()
    assert data.startswith(b"P6\n3 2\n255\n")
    write_image(str(tmp_path / "b.npy"), img)
    back = np.load(str(tmp_path / "b.npy"))
    np.testing.assert_array_equal(back, img)


def test_pack_formula():
    img = np.array([[[1.0, 0.0, 0.999]]], np.float32)
    w = to_rgba8888(img)
    assert (w[0, 0] >> 24) == 255
    assert ((w[0, 0] >> 8) & 0xFF) == int(0.999 * 255.99999)
