"""Intersection math against analytic cases, per the build-plan test
strategy (SURVEY.md §4: unit tests the reference never had)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yetanotherconsolegameengine_tpu.ops import intersect as I
from yetanotherconsolegameengine_tpu.scene.materials import Material
from yetanotherconsolegameengine_tpu.scene.tables import SceneBuilder


def rays(*ods):
    o = jnp.asarray([x[0] for x in ods], jnp.float32)
    d = jnp.asarray([x[1] for x in ods], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def build(f):
    s = SceneBuilder("t")
    f(s)
    return s.build()


def test_sphere_hit_and_normal():
    sc = build(lambda s: s.add_sphere((0, 0, -5), 1.0, Material.solid((1, 0, 0))))
    o, d = rays(((0, 0, 0), (0, 0, -1)), ((0, 5, -5), (0, -1, 0)),
                ((3, 0, 0), (0, 0, -1)))
    h = I.intersect_spheres(sc.spheres, o, d, 1e-3, 1e9)
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(h.n[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(h.t[1], 4.0, rtol=1e-5)
    assert not bool(h.hit[2])


def test_sphere_inside_gives_far_root():
    sc = build(lambda s: s.add_sphere((0, 0, 0), 2.0, Material.solid((1, 0, 0))))
    o, d = rays(((0, 0, 0), (1, 0, 0)))
    h = I.intersect_spheres(sc.spheres, o, d, 1e-3, 1e9)
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    # Outward geometric normal (the reference does NOT flip sphere normals).
    np.testing.assert_allclose(h.n[0], [1, 0, 0], atol=1e-5)


def test_box_entry_exit_faces():
    sc = build(lambda s: s.add_box((-1, -1, -3), (1, 1, -1), Material.solid((1, 1, 1))))
    o, d = rays(((0, 0, 0), (0, 0, -1)),    # outside -> entry face z=-1
                ((0, 0, -2), (0, 0, -1)),   # inside -> exit face z=-3
                ((0, 3, -2), (0, -1, 0)))   # from top -> face y=1
    h = I.intersect_boxes(sc.boxes, o, d, 1e-3, 1e9)
    np.testing.assert_allclose(h.t[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(h.n[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(h.t[1], 1.0, rtol=1e-5)
    np.testing.assert_allclose(h.n[1], [0, 0, 1], atol=1e-5)  # flipped to ray
    np.testing.assert_allclose(h.n[2], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(h.t[2], 2.0, rtol=1e-5)


def test_rect_uv():
    sc = build(lambda s: s.add_xy_rect(-1, 1, 0, 2, -4, Material.solid((1, 1, 1))))
    o, d = rays(((0.5, 1.5, 0), (0, 0, -1)), ((2, 1, 0), (0, 0, -1)))
    h = I.intersect_rects(sc.rects, o, d, 1e-3, 1e9)
    assert bool(h.hit[0]) and not bool(h.hit[1])
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose([h.u[0], h.v[0]], [0.75, 0.75], rtol=1e-5)
    np.testing.assert_allclose(h.n[0], [0, 0, 1], atol=1e-5)


def test_plane_two_sided():
    sc = build(lambda s: s.add_plane((0, 0, 0), (0, 1, 0), Material.solid((1, 1, 1))))
    o, d = rays(((0, 2, 0), (0, -1, 0)), ((0, -2, 0), (0, 1, 0)),
                ((0, 2, 0), (1, 0, 0)))
    h = I.intersect_planes(sc.planes, o, d, 1e-3, 1e9)
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(h.n[0], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(h.n[1], [0, -1, 0], atol=1e-5)  # flipped
    assert not bool(h.hit[2])


def test_disk_xz_radius_quirk():
    # The reference disk tests radius in XZ only (Surfaces.cs:119-125).
    sc = build(lambda s: s.add_disk((0, 1, -3), (0, 1, 0), 0.5,
                                    Material.solid((1, 1, 0))))
    o, d = rays(((0.4, 3, -3), (0, -1, 0)), ((0.6, 3, -3), (0, -1, 0)))
    h = I.intersect_disks(sc.disks, o, d, 1e-3, 1e9)
    assert bool(h.hit[0]) and not bool(h.hit[1])
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)


def test_cylinder_side_and_caps():
    sc = build(lambda s: s.add_cylinder((0, 0, -3), 0.5, 0.0, 2.0, True,
                                        Material.solid((0, 0, 1))))
    o, d = rays(((0, 1, 0), (0, 0, -1)),      # side hit
                ((0, 5, -3), (0, -1, 0)),     # top cap
                ((0.4, 1.0, 0), (0, 0, -1)),  # side, off-axis
                ((0, 5, 0), (0, -1, 0)))      # parallel outside -> miss
    h = I.intersect_cylinders(sc.cylinders, o, d, 1e-3, 1e9)
    np.testing.assert_allclose(h.t[0], 2.5, rtol=1e-5)
    np.testing.assert_allclose(h.n[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(h.t[1], 3.0, rtol=1e-5)
    np.testing.assert_allclose(h.n[1], [0, 1, 0], atol=1e-5)
    assert bool(h.hit[2])
    assert not bool(h.hit[3])


def test_triangle_barycentric_and_orientation():
    sc = build(lambda s: s.add_triangle((0, 0, -2), (2, 0, -2), (0, 2, -2),
                                        Material.solid((1, 0, 1))))
    o, d = rays(((0.5, 0.5, 0), (0, 0, -1)),   # inside
                ((1.5, 1.5, 0), (0, 0, -1)),   # outside (u+v>1)
                ((0.5, 0.5, -4), (0, 0, 1)))   # backside
    h = I.intersect_triangles(sc.triangles, o, d, 1e-3, 1e9)
    assert bool(h.hit[0]) and not bool(h.hit[1]) and bool(h.hit[2])
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose([h.u[0], h.v[0]], [0.25, 0.25], rtol=1e-4)
    np.testing.assert_allclose(h.n[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(h.n[2], [0, 0, -1], atol=1e-5)


def test_scene_merge_picks_nearest():
    def f(s):
        s.add_sphere((0, 0, -5), 1.0, Material.solid((1, 0, 0)))
        s.add_sphere((0, 0, -10), 1.0, Material.solid((0, 1, 0)))
        s.add_plane((0, 0, -20), (0, 0, 1), Material.solid((0, 0, 1)))
    sc = build(f)
    o, d = rays(((0, 0, 0), (0, 0, -1)), ((0, 3, 0), (0, 0, -1)))
    h = I.intersect_scene(sc, o, d, 1e-3, 1e9)
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(h.t[1], 20.0, rtol=1e-5)  # misses spheres


def test_tmax_respected_for_shadows():
    sc = build(lambda s: s.add_sphere((0, 0, -5), 1.0, Material.solid((1, 0, 0))))
    o, d = rays(((0, 0, 0), (0, 0, -1)))
    h_near = I.intersect_scene(sc, o, d, 1e-3, jnp.asarray([3.0]))
    h_far = I.intersect_scene(sc, o, d, 1e-3, jnp.asarray([5.0]))
    assert not bool(h_near.hit[0]) and bool(h_far.hit[0])


def test_brute_force_property_random_rays(rng):
    """Property test: table intersection == per-primitive numpy loop."""
    def f(s):
        for _ in range(12):
            c = rng.uniform(-3, 3, 3)
            c[2] -= 5
            s.add_sphere(c, rng.uniform(0.2, 1.0), Material.solid((1, 1, 1)))
    sc = build(f)
    n = 64
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h = I.intersect_spheres(sc.spheres, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e9)

    centers = np.asarray(sc.spheres.center)
    radii = np.asarray(sc.spheres.radius)
    mask = np.asarray(sc.spheres.mask)
    t_ref = np.full(n, np.inf, np.float32)
    for i in range(len(radii)):
        if not mask[i]:
            continue
        oc = o - centers[i]
        hb = np.sum(oc * d, axis=1)
        c = np.sum(oc * oc, axis=1) - radii[i] ** 2
        disc = hb * hb - c
        ok = disc >= 0
        s_ = np.sqrt(np.maximum(disc, 0))
        t1, t2 = -hb - s_, -hb + s_
        t = np.where(t1 >= 1e-3, t1, t2)
        ok &= t >= 1e-3
        t_ref = np.where(ok & (t < t_ref), t, t_ref)
    got = np.where(np.asarray(h.hit), np.asarray(h.t), np.inf)
    np.testing.assert_allclose(got, t_ref, rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
