"""Mesh BVH: build invariants + traversal == brute force (SURVEY.md §4:
"property tests (BVH hit ≡ brute-force hit over random rays)")."""

import numpy as np
import jax.numpy as jnp

from yetanotherconsolegameengine_tpu.ops.intersect import INF, moller_trumbore
from yetanotherconsolegameengine_tpu.ops.mesh_bvh import (
    LEAF_K, build_mesh_bvh, intersect_mesh)
from yetanotherconsolegameengine_tpu.scene.mesh_loader import (
    make_gem, make_icosphere, make_knot, make_torus, transform_mesh)


def _random_mesh(rng, n=200):
    a = rng.randn(n, 3).astype(np.float32)
    b = a + 0.3 * rng.randn(n, 3).astype(np.float32)
    c = a + 0.3 * rng.randn(n, 3).astype(np.float32)
    return a, b, c


def _brute_force(a, b, c, o, d, tmin, tmax):
    e1, e2 = b - a, c - a
    t, _, _, _ = moller_trumbore(jnp.asarray(a), jnp.asarray(e1),
                                 jnp.asarray(e2), jnp.asarray(o),
                                 jnp.asarray(d),
                                 jnp.asarray(tmin)[:, None],
                                 jnp.asarray(tmax)[:, None])
    return np.asarray(t.min(axis=1))


def _random_rays(rng, n=256, spread=4.0):
    o = spread * rng.randn(n, 3).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_build_invariants(rng):
    a, b, c = _random_mesh(rng)
    bvh = build_mesh_bvh(a, b, c, np.zeros(len(a), np.int32))
    skip = np.asarray(bvh.skip)
    count = np.asarray(bvh.tri_count)
    start = np.asarray(bvh.tri_start)
    N = bvh.n_nodes
    # Skip links always advance and stay in [i+1, N].
    assert np.all(skip > np.arange(N))
    assert np.all(skip <= N)
    # Leaves cover every triangle exactly once.
    covered = np.zeros(len(a), bool)
    for i in range(N):
        if count[i] > 0:
            assert count[i] <= LEAF_K
            seg = slice(start[i], start[i] + count[i])
            assert not covered[seg].any()
            covered[seg] = True
    assert covered.all()
    # Child AABBs are contained in the root AABB.
    bmin = np.asarray(bvh.bmin)
    bmax = np.asarray(bvh.bmax)
    assert np.all(bmin >= bmin[0] - 1e-5)
    assert np.all(bmax <= bmax[0] + 1e-5)


def test_traversal_equals_brute_force(rng):
    a, b, c = _random_mesh(rng, n=300)
    bvh = build_mesh_bvh(a, b, c, np.arange(len(a), dtype=np.int32))
    o, d = _random_rays(rng)
    tmin = np.full(len(o), 1e-3, np.float32)
    tmax = np.full(len(o), 1e9, np.float32)
    h = intersect_mesh(bvh, jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    t_ref = _brute_force(a, b, c, o, d, tmin, tmax)
    t_got = np.asarray(h.t)
    hit_ref = t_ref < 1e9
    assert np.array_equal(np.asarray(h.hit), hit_ref)
    np.testing.assert_allclose(t_got[hit_ref], t_ref[hit_ref],
                               rtol=1e-4, atol=1e-5)


def test_traversal_respects_tmax(rng):
    a, b, c = _random_mesh(rng, n=100)
    bvh = build_mesh_bvh(a, b, c, np.zeros(len(a), np.int32))
    o, d = _random_rays(rng, n=128)
    tmin = np.full(len(o), 1e-3, np.float32)
    far = np.full(len(o), 1e9, np.float32)
    h_far = intersect_mesh(bvh, jnp.asarray(o), jnp.asarray(d), tmin, far)
    # Clamp tmax just below each hit: the hit must disappear.
    t = np.asarray(h_far.t)
    hit = np.asarray(h_far.hit)
    near = np.where(hit, t * 0.99, 1.0).astype(np.float32)
    h_near = intersect_mesh(bvh, jnp.asarray(o), jnp.asarray(d), tmin, near)
    assert not np.any(np.asarray(h_near.hit) & hit)


def test_normals_face_the_ray(rng):
    tris = make_icosphere(2)
    bvh = build_mesh_bvh(tris[:, 0], tris[:, 1], tris[:, 2],
                         np.zeros(len(tris), np.int32))
    o, d = _random_rays(rng, n=128, spread=3.0)
    h = intersect_mesh(bvh, jnp.asarray(o), jnp.asarray(d),
                       np.float32(1e-3), np.float32(1e9))
    hit = np.asarray(h.hit)
    nd = np.sum(np.asarray(h.n) * d, axis=1)
    assert np.all(nd[hit] < 0.0)


def test_materials_gathered_per_triangle(rng):
    a, b, c = _random_mesh(rng, n=64)
    mats = rng.randint(0, 7, len(a)).astype(np.int32)
    bvh = build_mesh_bvh(a, b, c, mats)
    o, d = _random_rays(rng, n=256)
    h = intersect_mesh(bvh, jnp.asarray(o), jnp.asarray(d),
                       np.float32(1e-3), np.float32(1e9))
    got = np.asarray(h.mat)
    hit = np.asarray(h.hit)
    # Check against brute force winner's material.
    e1, e2 = b - a, c - a
    t, _, _, _ = moller_trumbore(jnp.asarray(a), jnp.asarray(e1),
                                 jnp.asarray(e2), jnp.asarray(o),
                                 jnp.asarray(d), 1e-3, 1e9)
    t = np.asarray(t)
    best = t.argmin(axis=1)
    # Map brute-force index through the BVH's leaf permutation via material.
    assert np.array_equal(got[hit], mats[best[hit]])


def test_procedural_meshes_shapes():
    for tris in (make_icosphere(1), make_torus(seg_u=8, seg_v=6),
                 make_knot(seg_u=16, seg_v=4), make_gem()):
        assert tris.ndim == 3 and tris.shape[1:] == (3, 3)
        assert np.isfinite(tris).all()
    t = transform_mesh(make_gem(), normalize=True, scale=2.0,
                       translate=(1.0, 2.0, 3.0))
    lo = t.reshape(-1, 3).min(0)
    hi = t.reshape(-1, 3).max(0)
    assert (hi - lo).max() <= 2.0 + 1e-5


def test_mesh_scene_end_to_end():
    """A mesh scene renders through the full frame step."""
    import jax
    from yetanotherconsolegameengine_tpu.render.renderer import (
        frame_step, init_state)
    from yetanotherconsolegameengine_tpu.scene.mesh_scenes import (
        build_glass_gem_scene)

    scene = build_glass_gem_scene()
    assert scene.mesh is not None
    state = init_state(24, 16, 1)
    out, state2 = jax.jit(
        lambda s, c, st: frame_step(s, c, st, fb_w=24, fb_h=16, ss=1)
    )(scene, scene.default_pose, state)
    top = np.asarray(out.top_rgb)
    assert top.shape == (16, 24, 3)
    assert np.isfinite(top).all()
    assert top.max() > 0.0
