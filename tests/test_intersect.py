import jax.numpy as jnp
import numpy as np
import pytest

from rt_tpu.scene import Boxes, Planes, Spheres
from rt_tpu.ops.intersect import closest_hit, hit_boxes, hit_planes, hit_spheres

BIG = 1e38


def _spheres(centers, radii, mats=None):
    n = len(centers)
    pad = max(8, n)
    c = np.full((pad, 3), 1e9, np.float32)
    r = np.zeros(pad, np.float32)
    m = np.zeros(pad, np.int32)
    if n:
        c[:n] = centers
        r[:n] = radii
        if mats is not None:
            m[:n] = mats
    return Spheres(center=jnp.asarray(c), radius=jnp.asarray(r), material=jnp.asarray(m), count=n)


def _planes(normals, ds, mats=None):
    n = len(normals)
    pad = max(8, n)
    nn = np.zeros((pad, 3), np.float32)
    dd = np.ones(pad, np.float32)
    m = np.zeros(pad, np.int32)
    if n:
        nn[:n] = normals
        dd[:n] = ds
        if mats is not None:
            m[:n] = mats
    return Planes(normal=jnp.asarray(nn), d=jnp.asarray(dd), material=jnp.asarray(m), count=n)


def _boxes(centers, extents, mats=None):
    n = len(centers)
    pad = max(8, n)
    c = np.full((pad, 3), 1e9, np.float32)
    e = np.zeros((pad, 3), np.float32)
    m = np.zeros(pad, np.int32)
    if n:
        c[:n] = centers
        e[:n] = extents
        if mats is not None:
            m[:n] = mats
    return Boxes(center=jnp.asarray(c), extents=jnp.asarray(e), material=jnp.asarray(m), count=n)


def test_sphere_head_on():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, idx = hit_spheres(o, d, *_sph_args([[0, 0, -5]], [1.0]))
    assert float(t[0]) == pytest.approx(4.0, abs=1e-5)
    assert int(idx[0]) == 0


def _sph_args(centers, radii):
    s = _spheres(centers, radii)
    return s.center, s.radius, s.count


def test_sphere_miss():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    t, _ = hit_spheres(o, d, *_sph_args([[0, 0, -5]], [1.0]))
    assert float(t[0]) > BIG


def test_sphere_inside_hits_exit():
    # Ray starting at the centre exits at t = r.
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    t, _ = hit_spheres(o, d, *_sph_args([[0, 0, -5]], [2.0]))
    assert float(t[0]) == pytest.approx(2.0, abs=1e-5)


def test_sphere_behind_misses():
    o = jnp.array([[0.0, 0.0, -10.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])  # sphere is behind (+z side)
    t, _ = hit_spheres(o, d, *_sph_args([[0, 0, -5]], [1.0]))
    assert float(t[0]) > BIG


def test_sphere_min_dist_epsilon():
    # Surface-origin ray pointing away: both roots < min_dist → miss
    # (mg_ray_tracer.cpp:20,47: min_hit_dist=0.001).
    o = jnp.array([[0.0, 0.0, -4.0]])  # on the surface
    d = jnp.array([[0.0, 0.0, 1.0]])   # pointing away
    t, _ = hit_spheres(o, d, *_sph_args([[0, 0, -5]], [1.0]))
    assert float(t[0]) > BIG


def test_sphere_earliest_index_wins_ties():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    # identical spheres: index 0 must win (scan keeps incumbent on ties)
    t, idx = hit_spheres(o, d, *_sph_args([[0, 0, -5], [0, 0, -5]], [1.0, 1.0]))
    assert int(idx[0]) == 0


def test_plane_hit():
    o = jnp.array([[0.0, 2.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    # ground plane y=0: n=(0,1,0), d=0
    t, _ = hit_planes(o, d, *_pl_args([[0, 1, 0]], [0.0]))
    assert float(t[0]) == pytest.approx(2.0, abs=1e-6)


def _pl_args(normals, ds):
    p = _planes(normals, ds)
    return p.normal, p.d, p.count


def test_plane_parallel_misses():
    o = jnp.array([[0.0, 2.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    t, _ = hit_planes(o, d, *_pl_args([[0, 1, 0]], [0.0]))
    assert float(t[0]) > BIG


def test_plane_double_sided():
    # from below, the plane still hits (reference r.hits(plane) semantics
    # feed the stored normal regardless of side, mg_ray_tracer.cpp:57-58)
    o = jnp.array([[0.0, -3.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    t, _ = hit_planes(o, d, *_pl_args([[0, 1, 0]], [0.0]))
    assert float(t[0]) == pytest.approx(3.0, abs=1e-6)


def test_box_slab():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    b = _boxes([[0, 0, -5]], [[1, 1, 1]])
    t, _ = hit_boxes(o, d, b.center, b.extents, b.count)
    assert float(t[0]) == pytest.approx(4.0, abs=1e-5)


def test_box_inside_hits_exit():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    b = _boxes([[0, 0, -5]], [[1, 1, 1]])
    t, _ = hit_boxes(o, d, b.center, b.extents, b.count)
    assert float(t[0]) == pytest.approx(1.0, abs=1e-5)


def test_closest_hit_sphere_beats_plane_on_tie():
    # sphere surface and plane at the same distance → sphere wins
    # (select(a=spheres, b=planes) keeps a on ties, mg_ray_tracer.cpp:95-102)
    sph = _spheres([[0, 0, -5]], [1.0], [1])
    pl = _planes([[0, 0, 1]], [4.0], [2])  # plane z=-4: n·x + 4 = 0
    box = _boxes([], [])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    rec = closest_hit(sph, pl, box, o, d)
    assert bool(rec.hit[0])
    assert float(rec.t[0]) == pytest.approx(4.0, abs=1e-5)
    assert int(rec.material[0]) == 1  # sphere's material


def test_closest_hit_boxes_excluded_by_default():
    # test_boxes is a stub in the path tracers (mg_ray_tracer.cpp:89-93)
    sph = _spheres([], [])
    pl = _planes([], [])
    box = _boxes([[0, 0, -5]], [[1, 1, 1]], [0])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    rec = closest_hit(sph, pl, box, o, d)
    assert not bool(rec.hit[0])
    rec = closest_hit(sph, pl, box, o, d, include_boxes=True)
    assert bool(rec.hit[0])
    assert float(rec.t[0]) == pytest.approx(4.0, abs=1e-5)


def test_closest_hit_normal_points_outward():
    sph = _spheres([[0, 0, -5]], [1.0], [0])
    pl = _planes([], [])
    box = _boxes([], [])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    rec = closest_hit(sph, pl, box, o, d)
    assert np.allclose(np.asarray(rec.normal)[0], [0, 0, 1], atol=1e-5)


def test_padding_is_inert():
    # padded table rows must never produce hits
    sph = _spheres([[0, 0, -5]], [1.0], [0])
    pl = _planes([], [])
    box = _boxes([], [])
    o = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (16, 1))
    dirs = np.zeros((16, 3), np.float32)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(16, 3))
    dirs[:] = v / np.linalg.norm(v, axis=-1, keepdims=True)
    rec = closest_hit(sph, pl, box, o, jnp.asarray(dirs))
    # every hit must be the real sphere
    t = np.asarray(rec.t)
    hit = np.asarray(rec.hit)
    assert np.all(t[hit] < 20.0)


def test_intersect_differentiable():
    import jax

    def f(radius):
        sph = Spheres(
            center=jnp.full((8, 3), 1e9, jnp.float32).at[0].set(jnp.array([0.0, 0.0, -5.0])),
            radius=jnp.zeros(8, jnp.float32).at[0].set(radius),
            material=jnp.zeros(8, jnp.int32),
            count=1,
        )
        t, _ = hit_spheres(
            jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, -1.0]]),
            sph.center, sph.radius, sph.count,
        )
        return t[0]

    g = jax.grad(f)(jnp.float32(1.0))
    # t = 4 at r=1; dt/dr = -1 (head-on): t = 5 - r
    assert float(g) == pytest.approx(-1.0, abs=1e-4)
