"""Cluster-matmul mesh traversal vs brute force / skip-link BVH.

The cluster path (ops/mesh_clusters.py) makes its hit DECISION in-kernel
with 8 low mantissa bits of t sacrificed to the winner index and an
approximate-reciprocal Newton division, then resolves exact t/u/v by
recomputing the single winning triangle. So the contract is: every
brute-force hit is found, t matches to ~1e-4 relative, and the winning
material/normal agree wherever the nearest hit is unambiguous.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yetanotherconsolegameengine_tpu.ops.intersect import INF, moller_trumbore
from yetanotherconsolegameengine_tpu.ops.mesh_bvh import build_mesh_bvh, intersect_mesh
from yetanotherconsolegameengine_tpu.ops.mesh_clusters import (
    KC, build_clusters, intersect_clusters)
from yetanotherconsolegameengine_tpu.scene.mesh_loader import make_icosphere


def _mesh():
    tris = make_icosphere(2) * 1.3          # 320 tris -> 2 clusters
    knot = make_icosphere(1) * 0.4 + np.asarray([0.9, 0.9, 0.0], np.float32)
    tris = np.concatenate([tris, knot])
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    mat = (np.arange(len(tris)) % 5).astype(np.int32)
    return a, b, c, mat


def _rays(n=512, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # Aim half the rays at the mesh so plenty hit.
    o[: n // 2] = rng.uniform(-2.5, 2.5, size=(n // 2, 3)) * np.asarray(
        [1, 1, 0], np.float32) + np.asarray([0, 0, 3.5], np.float32)
    d[: n // 2] = -o[: n // 2] + rng.normal(scale=0.3, size=(n // 2, 3))
    d[: n // 2] /= np.linalg.norm(d[: n // 2], axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _brute(a, b, c, mat, o, d, tmin=1e-3, tmax=INF):
    e1 = jnp.asarray(b - a)
    e2 = jnp.asarray(c - a)
    t, u, v, valid = moller_trumbore(jnp.asarray(a), e1, e2, o, d, tmin, tmax)
    tb = jnp.min(t, axis=1)
    hit = tb < INF
    win = jnp.argmin(t, axis=1)
    return tb, hit, jnp.asarray(mat)[win]


import pytest as _pytest


@_pytest.mark.parametrize("kc", [KC, 128, 512])
def test_cluster_hits_match_brute_force(kc):
    """Also at non-default cluster widths: proxy sets pack kc=512 (the
    packed-t winner index then takes 9 low mantissa bits instead of 8)."""
    a, b, c, mat = _mesh()
    mc = build_clusters(a, b, c, mat, kc=kc)
    assert mc.kc == kc
    if kc == KC:
        assert mc.n_clusters >= 2
    o, d = _rays()
    h = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True)
    tb, hit_b, mat_b = _brute(a, b, c, mat, o, d)

    hit_c = np.asarray(h.hit)
    hit_bn = np.asarray(hit_b)
    # Every brute-force hit must be found (conservative cull), and no
    # phantom hits may appear.
    assert (hit_c == hit_bn).mean() > 0.995, (hit_c.sum(), hit_bn.sum())
    both = hit_c & hit_bn
    assert both.sum() > 100  # the scene must actually be exercised
    t_c = np.asarray(h.t)[both]
    t_b = np.asarray(tb)[both]
    np.testing.assert_allclose(t_c, t_b, rtol=2e-4, atol=2e-4)
    # Winner material agrees away from exact ties.
    clear = both & (np.abs(np.asarray(tb) - np.asarray(h.t)) < 1e-4)
    agree = (np.asarray(h.mat)[clear] == np.asarray(mat_b)[clear]).mean()
    assert agree > 0.99


def test_cluster_matches_skiplink_bvh():
    a, b, c, mat = _mesh()
    mc = build_clusters(a, b, c, mat)
    bvh = build_mesh_bvh(a, b, c, mat)
    o, d = _rays(seed=3)
    h_c = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True)
    h_b = intersect_mesh(bvh, o, d, 1e-3, INF)
    hit_c = np.asarray(h_c.hit)
    hit_b = np.asarray(h_b.hit)
    assert (hit_c == hit_b).mean() > 0.995
    both = hit_c & hit_b
    np.testing.assert_allclose(np.asarray(h_c.t)[both],
                               np.asarray(h_b.t)[both], rtol=2e-4, atol=2e-4)
    # Normals agree up to sign-flip convention (both flip against the ray).
    n_dot = np.sum(np.asarray(h_c.n)[both] * np.asarray(h_b.n)[both], axis=1)
    assert (n_dot > 0.999).mean() > 0.99


def test_respects_tmax_and_inactive_rays():
    a, b, c, mat = _mesh()
    mc = build_clusters(a, b, c, mat)
    o, d = _rays(seed=7, n=256)
    h_far = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True)
    # tmax shorter than every hit -> no hits.
    h_near = intersect_clusters(mc, o, d, 1e-3, 1e-4, interpret=True)
    assert not bool(np.asarray(h_near.hit).any())
    # Inactive convention: far-away origins never hit.
    o_in = jnp.full_like(o, 2.9e30)
    h_in = intersect_clusters(mc, o_in, d, 1e-3, INF, interpret=True)
    assert not bool(np.asarray(h_in.hit).any())
    assert bool(np.asarray(h_far.hit).any())


def test_early_exit_skips_occluded_clusters():
    """Near-to-far early exit: a fully occluding near wall must prevent the
    far wall's cluster from ever being visited (regression: ref reads in a
    Pallas while cond are discharged to pre-loop values, which silently
    disabled the exit until maxbest rode the carry)."""
    def wall(z, n=KC):
        tris = []
        g = int(np.ceil(np.sqrt(n / 2)))
        k = 0
        for i in range(g):
            for j in range(g):
                if k >= n:
                    break
                x0, y0 = -2 + 4 * i / g, -2 + 4 * j / g
                x1, y1 = -2 + 4 * (i + 1) / g, -2 + 4 * (j + 1) / g
                tris.append(((x0, y0, z), (x1, y0, z), (x1, y1, z)))
                tris.append(((x0, y0, z), (x1, y1, z), (x0, y1, z)))
                k += 2
        return np.asarray(tris[:n], np.float32)

    tris = np.concatenate([wall(-1.0), wall(-100.0)])
    mc = build_clusters(tris[:, 0], tris[:, 1], tris[:, 2],
                        np.zeros(len(tris), np.int32))
    P = 256
    o = np.zeros((P, 3), np.float32)
    o[:, 2] = 1.0
    rng = np.random.RandomState(0)
    d = np.stack([rng.uniform(-0.3, 0.3, P), rng.uniform(-0.3, 0.3, P),
                  -np.ones(P)], -1)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    from yetanotherconsolegameengine_tpu.ops.mesh_clusters import _intersect_impl
    h, (visits, _, lens) = _intersect_impl(
        mc, jnp.asarray(o), jnp.asarray(d),
        jnp.full((P,), 1e-3, jnp.float32), jnp.full((P,), 3e38, jnp.float32),
        interpret=True, stats=True)
    assert bool(np.asarray(h.hit).all())
    np.testing.assert_allclose(np.asarray(h.t), 2.0, atol=0.3)
    # The far wall must never be evaluated — culled from the list outright
    # (per-ray AABB-exit clamp) or skipped by the in-kernel early exit.
    assert int(np.asarray(visits)[0]) <= 1


def test_per_ray_tmin_marching():
    """Marching tmin past the first hit must find the far side (the shadow
    transmittance loop depends on per-ray tmin, trace.py:127)."""
    a, b, c, mat = _mesh()
    mc = build_clusters(a, b, c, mat)
    n = 128
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32), (n, 1))
    ang = jnp.linspace(-0.15, 0.15, n)
    d = jnp.stack([jnp.sin(ang), jnp.zeros(n), -jnp.cos(ang)], axis=1)
    h1 = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True)
    assert bool(np.asarray(h1.hit).all())
    tmin2 = h1.t + 1e-3
    h2 = intersect_clusters(mc, o, d, tmin2, INF, interpret=True)
    # Sphere: the second hit is the back face, strictly farther.
    both = np.asarray(h2.hit)
    assert both.mean() > 0.95
    assert (np.asarray(h2.t)[both] > np.asarray(h1.t)[both]).all()


def test_dense_single_origin_exact():
    """Dense single-origin fan over a fine sphere — the workload that
    exposed (a) the DMA slot write-after-read race (the refill copy
    overwrote the cluster block mid-eval; deterministic under the
    synchronous interpreter) and (b) the MXU default-bf16 matmul precision
    corrupting the Woop barycentrics. Every brute-force hit must be found
    with exact t."""
    from yetanotherconsolegameengine_tpu.ops.mesh_clusters import _intersect_impl
    tris = make_icosphere(3) * 1.3
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    mc = build_clusters(a, b, c, np.zeros(len(tris), np.int32))
    n = 2048
    rng = np.random.RandomState(0)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 3.0
    d = rng.normal(size=(n, 3))
    d[:, 2] -= 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d.astype(np.float32))
    h = _intersect_impl(mc, o_j, d_j, jnp.full((n,), 1e-3, jnp.float32),
                        jnp.full((n,), 3e38, jnp.float32), interpret=True)
    e1 = jnp.asarray(b - a)
    e2 = jnp.asarray(c - a)
    t_all, _, _, _ = moller_trumbore(jnp.asarray(a), e1, e2, o_j, d_j,
                                     1e-3, INF)
    tb = jnp.min(t_all, axis=1)
    hit_b = np.asarray(tb < INF)
    hit_c = np.asarray(h.hit)
    assert (hit_b == hit_c).all()
    both = hit_b & hit_c
    np.testing.assert_allclose(np.asarray(h.t)[both], np.asarray(tb)[both],
                               rtol=1e-5, atol=1e-5)


def test_presort_off_is_bit_identical():
    """presort=False (tiles = caller lane order, no binning sort) returns
    the same hits as the binned path: tiling shapes only the conservative
    cull lists and the early-exit bound. The one legitimate divergence is
    packed-t ties across clusters (winner follows visit order); this
    fixed mesh/ray set has none, so exact equality holds and any future
    inequality here means a REAL winner-tracking bug, not a tie."""
    a, b, c, mat = _mesh()
    mc = build_clusters(a, b, c, mat)
    o, d = _rays(n=701, seed=3)   # non-multiple of TILE: exercises padding
    hs = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True)
    hn = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True,
                            presort=False)
    np.testing.assert_array_equal(np.asarray(hs.hit), np.asarray(hn.hit))
    np.testing.assert_array_equal(np.asarray(hs.t), np.asarray(hn.t))
    np.testing.assert_array_equal(np.asarray(hs.mat), np.asarray(hn.mat))
    np.testing.assert_array_equal(np.asarray(hs.n), np.asarray(hn.n))


def test_tile_width_knob_matches_default():
    """tile=128 (narrower ray tiles: smaller per-visit VPU epilogue,
    shorter silhouette lists) returns the same hits as the default
    tile=256: tile width shapes only the cull lists and the early-exit
    bound, so — as with presort — results match exactly up to packed-t
    ties, of which this fixed set has none."""
    a, b, c, mat = _mesh()
    mc = build_clusters(a, b, c, mat)
    o, d = _rays(n=701, seed=3)
    hs = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True)
    for tile in (128, 512):
        hn = intersect_clusters(mc, o, d, 1e-3, INF, interpret=True,
                                tile=tile)
        np.testing.assert_array_equal(np.asarray(hs.hit), np.asarray(hn.hit))
        np.testing.assert_array_equal(np.asarray(hs.t), np.asarray(hn.t))
        np.testing.assert_array_equal(np.asarray(hs.mat), np.asarray(hn.mat))
        np.testing.assert_array_equal(np.asarray(hs.n), np.asarray(hn.n))
