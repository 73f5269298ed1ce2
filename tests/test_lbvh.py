"""On-device LBVH: traversal equivalence with brute force / the SAH build,
layout invariants, and jittability of the rebuild."""

import jax
import jax.numpy as jnp
import numpy as np

from yetanotherconsolegameengine_tpu.ops.lbvh import _dfs_layout, build_lbvh
from yetanotherconsolegameengine_tpu.ops.mesh_bvh import (build_mesh_bvh,
                                                          intersect_mesh)
from yetanotherconsolegameengine_tpu.scene.mesh_loader import make_icosphere


def _random_mesh(rng, n=230):
    a = rng.randn(n, 3).astype(np.float32)
    b = a + 0.3 * rng.randn(n, 3).astype(np.float32)
    c = a + 0.3 * rng.randn(n, 3).astype(np.float32)
    return a, b, c


def _random_rays(rng, n=256):
    o = 4.0 * rng.randn(n, 3).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_dfs_layout_invariants():
    for L in (1, 2, 8, 64):
        heap, skip, leaf_ord = _dfs_layout(L)
        N = 2 * L - 1
        assert len(heap) == N
        assert sorted(heap) == list(range(1, N + 1))   # every heap node once
        assert np.all(skip > np.arange(N))
        assert np.all(skip <= N)
        assert sorted(leaf_ord[leaf_ord >= 0]) == list(range(L))


def test_lbvh_matches_sah_traversal(rng):
    a, b, c = _random_mesh(rng)
    mats = rng.randint(0, 5, len(a)).astype(np.int32)
    sah = build_mesh_bvh(a, b, c, mats)
    lbv = build_lbvh(a, b, c, mats)
    o, d = _random_rays(rng)
    h1 = intersect_mesh(sah, o, d, np.float32(1e-3), np.float32(1e9))
    h2 = intersect_mesh(lbv, o, d, np.float32(1e-3), np.float32(1e9))
    assert np.array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    hit = np.asarray(h1.hit)
    np.testing.assert_allclose(np.asarray(h1.t)[hit], np.asarray(h2.t)[hit],
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(h1.mat)[hit], np.asarray(h2.mat)[hit])


def test_lbvh_rebuild_is_jittable(rng):
    tris = make_icosphere(2)
    mats = np.zeros(len(tris), np.int32)

    @jax.jit
    def rebuild_and_probe(verts):
        bvh = build_lbvh(verts[:, 0], verts[:, 1], verts[:, 2],
                         jnp.asarray(mats))
        o = jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        h = intersect_mesh(bvh, o, d, 1e-3, 1e9)
        return h.t[0], h.hit[0]

    v = jnp.asarray(tris)
    t, hit = rebuild_and_probe(v)
    assert bool(hit)
    np.testing.assert_allclose(float(t), 2.0, atol=1e-3)
    # Deformed geometry flows through the SAME compiled rebuild.
    t2, hit2 = rebuild_and_probe(v * 1.5)
    assert bool(hit2)
    np.testing.assert_allclose(float(t2), 1.5, atol=1e-3)


def test_lbvh_nonpow2_padding(rng):
    # Triangle counts that force padding exercise the degenerate tail.
    for n in (3, 17, 65):
        a, b, c = _random_mesh(rng, n=n)
        lbv = build_lbvh(a, b, c, np.zeros(n, np.int32))
        o, d = _random_rays(rng, n=64)
        h = intersect_mesh(lbv, o, d, np.float32(1e-3), np.float32(1e9))
        t = np.asarray(h.t)
        assert np.isfinite(t[np.asarray(h.hit)]).all()


def test_lbvh_straddling_leaf_normals_finite():
    # Regression: a winner in a leaf that mixes valid and padded triangles
    # (T % LEAF_K != 0) must return a finite unit normal. Padding vertices
    # with inf made the masked-sum attribute extraction produce 0*inf=NaN.
    n = 5  # pads to 8 -> second leaf holds 1 valid + 3 padded tris
    a = np.array([[i * 10.0, 0.0, 0.0] for i in range(n)], np.float32)
    b = a + np.array([1.0, 0.0, 0.0], np.float32)
    c = a + np.array([0.0, 1.0, 0.0], np.float32)
    lbv = build_lbvh(a, b, c, np.zeros(n, np.int32))
    # One ray straight down at each triangle's interior.
    o = jnp.asarray(a + np.array([0.25, 0.25, 3.0], np.float32))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    h = intersect_mesh(lbv, o, d, np.float32(1e-3), np.float32(1e9))
    assert np.asarray(h.hit).all()
    nrm = np.asarray(h.n)
    assert np.isfinite(nrm).all()
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
