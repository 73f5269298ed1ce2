"""On-device LBVH build: Morton sort + complete-tree reduction.

The reference rebuilds its binned-SAH BVH on the CPU whenever geometry
changes (Scene.RebuildBVH -> BVH.BuildRecursive, /root/reference/
ConsoleGame/RayTracing/Objects/BVH.cs:258-459; MeshBVH at mesh load).
SURVEY.md §7 calls for the TPU replacement: "BVH build = on-device LBVH
(Morton codes from AABB centroids -> radix sort -> linear hierarchy)".

This build is 100% jittable device work with NO sequential construction:

1. centroid Morton codes (30-bit interleave, vectorized bit ops),
2. ``jnp.argsort`` (XLA's sort IS the radix sort on TPU),
3. triangles padded to a power-of-two leaf count; leaf AABBs by grouped
   min/max; internal levels by log2(L) reshape-reductions (a complete
   binary tree instead of Karras ranges — the tree SHAPE becomes static,
   so the stackless skip-link flattening of ops/mesh_bvh.py is a
   host-precomputed permutation, not a traversal),
4. one static-permutation gather into DFS order.

Produces the exact ``MeshBVH`` structure ``intersect_mesh`` traverses, so
LBVH-rebuilt and SAH-built trees are interchangeable. Quality: a complete
Morton tree visits ~1.3-2x more nodes than SAH on irregular meshes, but
the *rebuild* runs on device in microseconds instead of a host round-trip
— the right trade for per-frame dynamic geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mesh_bvh import MeshBVH

LEAF_K = 4  # triangles per LBVH leaf


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (the standard Morton interleave)."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def morton3(x, y, z):
    """30-bit Morton code from [0,1]^3 coords (vectorized)."""
    def q(v):
        return _expand_bits((jnp.clip(v, 0.0, 1.0) * 1023.0)
                            .astype(jnp.uint32))
    return (q(x) << jnp.uint32(2)) | (q(y) << jnp.uint32(1)) | q(z)


@functools.lru_cache(maxsize=32)
def _dfs_layout(n_leaves: int):
    """Static DFS flattening of a complete binary tree with n_leaves
    (power of two) leaves.

    Returns numpy arrays over the 2*n_leaves-1 DFS-ordered nodes:
    (heap_index, skip_link, leaf_ordinal_or_-1). heap indices are 1-based
    (node k has children 2k, 2k+1; leaves are heap k in [L, 2L))."""
    L = n_leaves
    N = 2 * L - 1
    heap = np.zeros(N, np.int64)
    skip = np.zeros(N, np.int32)
    leaf_ord = np.full(N, -1, np.int64)
    pos = [0]
    # Node k at depth d = bit_length(k)-1 owns L >> d leaves, so its DFS
    # subtree spans 2*(L >> d) - 1 slots. Iterative pre-order emit.
    stack = [(1, N)]
    while stack:
        k, skip_to = stack.pop()
        i = pos[0]
        pos[0] += 1
        heap[i] = k
        skip[i] = skip_to
        if k >= L:
            leaf_ord[i] = k - L
        else:
            left_leaves = L >> ((k * 2).bit_length() - 1)
            sz_left = 2 * left_leaves - 1
            stack.append((k * 2 + 1, skip_to))
            stack.append((k * 2, i + 1 + sz_left))
    return heap, skip, leaf_ord


def build_lbvh(a, b, c, mat) -> MeshBVH:
    """Jittable LBVH build over (T, 3) triangle vertex arrays.

    All inputs may be traced values; the output MeshBVH has static shapes
    determined only by T, so rebuilding the same mesh each frame hits one
    compiled program.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    mat = jnp.asarray(mat, jnp.int32)
    T = a.shape[0]

    tmin = jnp.minimum(jnp.minimum(a, b), c)
    tmax = jnp.maximum(jnp.maximum(a, b), c)
    cent = (tmin + tmax) * 0.5
    lo = jnp.min(cent, axis=0)
    hi = jnp.max(cent, axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)
    n01 = (cent - lo) / ext
    codes = morton3(n01[:, 0], n01[:, 1], n01[:, 2])
    order = jnp.argsort(codes)

    # Pad to a power-of-two leaf count.
    L = 1
    while L * LEAF_K < T:
        L *= 2
    Tp = L * LEAF_K
    pad = Tp - T
    orderp = jnp.concatenate([order, jnp.zeros(pad, order.dtype)])
    valid = jnp.concatenate([jnp.ones(T, bool), jnp.zeros(pad, bool)])

    a_s = a[orderp]
    b_s = b[orderp]
    c_s = c[orderp]
    m_s = jnp.where(valid, mat[orderp], 0)
    # Degenerate the padded triangles so they never hit. Zero vertices (not
    # inf): det=0 fails the validity test, and e1/e2/normals stay finite —
    # inf padding made 0*inf=NaN leak through intersect_mesh's masked-sum
    # attribute extraction whenever a straddling leaf held the winner.
    zero3 = jnp.zeros((1, 3), jnp.float32)
    a_s = jnp.where(valid[:, None], a_s, zero3)
    b_s = jnp.where(valid[:, None], b_s, zero3)
    c_s = jnp.where(valid[:, None], c_s, zero3)

    tmin_s = jnp.minimum(jnp.minimum(a_s, b_s), c_s)
    tmax_s = jnp.maximum(jnp.maximum(a_s, b_s), c_s)
    big = jnp.float32(3e38)
    tmin_s = jnp.where(valid[:, None], tmin_s, big)
    tmax_s = jnp.where(valid[:, None], tmax_s, -big)

    # Leaf AABBs, then log2(L) internal levels (heap layout, 1-based).
    leaf_min = tmin_s.reshape(L, LEAF_K, 3).min(axis=1)
    leaf_max = tmax_s.reshape(L, LEAF_K, 3).max(axis=1)
    levels_min = [leaf_min]
    levels_max = [leaf_max]
    while levels_min[-1].shape[0] > 1:
        m = levels_min[-1]
        x = levels_max[-1]
        levels_min.append(m.reshape(-1, 2, 3).min(axis=1))
        levels_max.append(x.reshape(-1, 2, 3).max(axis=1))
    # heap[1..2L-1]: concat root-level-first.
    heap_min = jnp.concatenate(levels_min[::-1], axis=0)   # (2L-1, 3)
    heap_max = jnp.concatenate(levels_max[::-1], axis=0)

    heap_idx, skip, leaf_ord = _dfs_layout(L)
    gather = jnp.asarray(heap_idx - 1, jnp.int32)          # 0-based
    f_bmin = heap_min[gather]
    f_bmax = heap_max[gather]
    is_leaf = leaf_ord >= 0
    tri_start = jnp.asarray(np.where(is_leaf, leaf_ord * LEAF_K, 0),
                            jnp.int32)
    tri_count = jnp.asarray(np.where(is_leaf, LEAF_K, 0), jnp.int32)

    e1 = b_s - a_s
    e2 = c_s - a_s
    nrm = jnp.cross(e1, e2)
    ln = jnp.sqrt(jnp.maximum(jnp.sum(nrm * nrm, axis=1, keepdims=True),
                              1e-20))
    nrm = nrm / ln
    # intersect_mesh gathers tri_start..+8 (its LEAF_K); pad the tail so
    # those gathers stay in bounds regardless of leaf size.
    from .mesh_bvh import LEAF_K as TRAV_K
    tail = max(0, TRAV_K)
    padrow = lambda x: jnp.concatenate(
        [x, jnp.zeros((tail,) + x.shape[1:], x.dtype)])
    return MeshBVH(
        bmin=f_bmin, bmax=f_bmax, skip=jnp.asarray(skip),
        tri_start=tri_start, tri_count=tri_count,
        a=padrow(a_s), e1=padrow(e1), e2=padrow(e2), n=padrow(nrm),
        mat=padrow(m_s))
