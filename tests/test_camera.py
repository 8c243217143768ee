import jax.numpy as jnp
import numpy as np
import pytest

from rt_tpu.camera import (
    generate_rays,
    look_rotation,
    rotate_pitch,
    rotate_yaw,
    screen_to_world,
    world_to_screen,
)
from rt_tpu.scene import Camera


def _cam(pos=(0, 1, 3), direction=(0, 0, -1)):
    return Camera.from_pose(pos, direction)


def test_look_rotation_orthonormal():
    for d in [(0, 0, -1), (1, 2, 3), (0, 1, 0), (0, -1, 0), (-1, 0.5, 0.25)]:
        R = np.asarray(look_rotation(jnp.asarray(d, jnp.float32)))
        assert np.allclose(R.T @ R, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)
        fwd = -R[:, 2]
        assert np.allclose(fwd, np.asarray(d) / np.linalg.norm(d), atol=1e-5)


def test_center_ray_is_forward():
    cam = _cam()
    size = (64, 48)
    o, d = generate_rays(cam, size, jnp.array([[32.0, 24.0]]))
    assert np.allclose(np.asarray(d)[0], [0, 0, -1], atol=1e-6)
    # origin on the near plane (mg_ray_tracer.cpp:190: unproject depth 0)
    assert np.allclose(np.asarray(o)[0], [0, 1, 3 - 0.01], atol=1e-6)


def test_ray_through_known_point():
    # A sphere centre exactly on a pixel's ray: project then unproject.
    cam = _cam()
    size = (200, 150)
    target = jnp.array([[0.3, 1.2, -2.0]])
    px, depth = world_to_screen(cam, size, target)
    o, d = generate_rays(cam, size, px)
    o, d = np.asarray(o)[0], np.asarray(d)[0]
    tgt = np.asarray(target)[0]
    # target must lie on the ray
    t = np.dot(tgt - o, d)
    assert np.allclose(o + t * d, tgt, atol=1e-4)
    assert 0.0 < float(depth[0]) < 1.0


def test_screen_world_roundtrip():
    cam = _cam(pos=(2, 0.5, 1), direction=(0.3, -0.2, -1))
    size = (320, 240)
    pts = jnp.array([[10.0, 20.0], [300.0, 200.0], [160.0, 120.0]])
    for depth in (0.0, 0.5, 1.0):
        w = screen_to_world(cam, size, pts, depth)
        px, dd = world_to_screen(cam, size, w)
        assert np.allclose(np.asarray(px), np.asarray(pts), atol=0.05)
        assert np.allclose(np.asarray(dd), depth, atol=1e-3)


def test_near_far_unprojection_distances():
    cam = _cam()
    size = (64, 48)
    pts = jnp.array([[32.0, 24.0]])
    near_p = np.asarray(screen_to_world(cam, size, pts, 0.0))[0]
    far_p = np.asarray(screen_to_world(cam, size, pts, 1.0))[0]
    assert np.linalg.norm(near_p - np.array([0, 1, 3])) == pytest.approx(0.01, abs=1e-5)
    assert np.linalg.norm(far_p - np.array([0, 1, 3])) == pytest.approx(1000.0, rel=1e-4)


def test_vfov():
    # A ray at the vertical screen edge must make vfov/2 with forward.
    cam = _cam()
    w, h = 100, 100  # square: aspect 1
    _, d = generate_rays(cam, (w, h), jnp.array([[50.0, 0.0]]))
    d = np.asarray(d)[0]
    ang = np.arccos(np.dot(d, [0, 0, -1]))
    assert ang == pytest.approx(np.pi / 8, rel=1e-3)  # vfov=pi/4 → half = pi/8


def test_yaw_pitch():
    R = np.asarray(look_rotation(jnp.array([0.0, 0.0, -1.0])))
    Ry = np.asarray(rotate_yaw(jnp.asarray(R), jnp.float32(np.pi / 2)))
    fwd = -Ry[:, 2]
    assert np.allclose(fwd, [-1, 0, 0], atol=1e-6)  # yaw left 90° from -z → -x
    Rp = np.asarray(rotate_pitch(jnp.asarray(R), jnp.float32(np.pi / 2)))
    fwd = -Rp[:, 2]
    assert np.allclose(fwd, [0, 1, 0], atol=1e-6)  # pitch up 90° → +y


def test_raygen_differentiable():
    import jax

    def f(pos):
        cam = Camera(position=pos, rotation=look_rotation(jnp.array([0.0, 0.0, -1.0])))
        o, d = generate_rays(cam, (8, 8), jnp.array([[4.0, 4.0]]))
        return jnp.sum(o) + jnp.sum(d)

    g = jax.grad(f)(jnp.array([0.0, 1.0, 3.0]))
    assert np.all(np.isfinite(np.asarray(g)))
