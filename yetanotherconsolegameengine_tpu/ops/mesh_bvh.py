"""Triangle-mesh BVH: host binned-SAH build, stackless lockstep traversal.

The reference's MeshBVH (/root/reference/ConsoleGame/RayTracing/Objects/
MeshBVH.cs:11-603) is a binned-SAH BVH (16 bins x 3 axes, leaf <= 8) over
SoA triangle arrays, traversed iteratively with a stackalloc stack.

The TPU re-design keeps the SAH build (host-side numpy — it runs once at
mesh load, MeshBVH.cs:306-459) but inverts the traversal: instead of a
per-ray stack, nodes are flattened in DFS pre-order with *skip links*
("threaded" BVH). Every ray carries a single i32 cursor; one lockstep
``lax.while_loop`` round does, for ALL rays at once:

    gather ONE fused node row (AABB + skip + the leaf's LEAF_K triangles
    inline) -> slab test vs current best t -> leaf? dense (P, K)
    Moller-Trumbore on the in-row triangles, winner normal/material
    selected immediately via a first-min mask
    -> cursor = AABB-hit-and-internal ? node+1 (first child) : skip link

Perf model (measured, 69k-tri bunny @ 28.8k rays): gathers dominate, so
the round does exactly one row gather (122 -> 10.8 ms/sweep total across
this file's optimizations); lockstep cost is the MAX visited-node count
over all rays (~10x the mean), so two-stage ray compaction packs
survivors into P/4 then P/16 batches once most rays finish; LEAF_K=4
balances leaf-gather bytes against tree depth.

No stack arrays, no data-dependent control flow: the loop state is
(cursor, best t/n/mat/u/v) plus the per-ray constants (so compaction can
slice them). The near-child-first ordering of the reference is not
needed for correctness — tmax shrinks monotonically in any order.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import INF, Hit, _safe_div

# Max triangles per leaf. The reference uses 8 (MeshBVH.cs); on TPU the
# per-round (P, K, 13) leaf gather dominates traversal cost and K=4
# measures ~1.65x faster than K=8 on the 69k-tri bunny (K=1:158ms,
# K=2:121ms, K=4:74ms, K=8:122ms, K=16:185ms per sweep @ 28.8k rays).
LEAF_K = 4
SAH_BINS = 16       # MeshBVH.cs:331


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshBVH:
    """Device-resident flattened BVH + SoA triangles (padded).

    Nodes are DFS pre-order. For node i: internal -> first child is i+1,
    ``skip[i]`` jumps over the whole subtree; leaf -> ``tri_start/tri_count``
    index the leaf-sorted triangle arrays. ``n_nodes`` is the sentinel
    "done" cursor value.
    """

    bmin: jax.Array       # (N, 3)
    bmax: jax.Array       # (N, 3)
    skip: jax.Array       # (N,) i32 — next node when AABB missed / leaf done
    tri_start: jax.Array  # (N,) i32
    tri_count: jax.Array  # (N,) i32 — 0 for internal nodes
    a: jax.Array          # (T, 3) triangle SoA (leaf-sorted, padded)
    e1: jax.Array         # (T, 3)
    e2: jax.Array         # (T, 3)
    n: jax.Array          # (T, 3) unit geometric normals
    mat: jax.Array        # (T,) i32

    @property
    def n_nodes(self) -> int:
        return self.bmin.shape[0]

    @property
    def n_tris(self) -> int:
        return self.a.shape[0]


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def build_mesh_bvh(a: np.ndarray, b: np.ndarray, c: np.ndarray,
                   mat: np.ndarray) -> MeshBVH:
    """Binned-SAH build over (T, 3) vertex arrays (MeshBVH.cs:306-459)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = np.asarray(c, np.float32)
    mat = np.asarray(mat, np.int32)
    T = a.shape[0]
    tmin = np.minimum(np.minimum(a, b), c)
    tmax = np.maximum(np.maximum(a, b), c)
    cent = (tmin + tmax) * 0.5

    # Recursive build over an index permutation; collect (bmin, bmax,
    # leaf_range_or_children). Iterative explicit stack to survive big meshes.
    nodes = []  # dicts: bmin, bmax, left, right, start, count, axis
    order = np.arange(T)

    def make_node(lo, hi):
        nodes.append(dict(bmin=None, bmax=None, left=-1, right=-1,
                          start=lo, count=hi - lo, axis=0))
        return len(nodes) - 1

    root = make_node(0, T)
    stack = [root]
    while stack:
        ni = stack.pop()
        nd = nodes[ni]
        lo, hi = nd["start"], nd["start"] + nd["count"]
        idx = order[lo:hi]
        nb_min = tmin[idx].min(axis=0)
        nb_max = tmax[idx].max(axis=0)
        nd["bmin"], nd["bmax"] = nb_min, nb_max
        count = hi - lo
        if count <= LEAF_K:
            continue
        cb_min = cent[idx].min(axis=0)
        cb_max = cent[idx].max(axis=0)
        ext = cb_max - cb_min
        # Binned SAH over the 3 axes.
        best = (np.inf, -1, -1)  # (cost, axis, split_bin)
        bins_of = {}
        for ax in range(3):
            if ext[ax] <= 1e-12:
                continue
            scale = SAH_BINS * (1.0 - 1e-6) / ext[ax]
            bins = np.minimum(((cent[idx, ax] - cb_min[ax]) * scale)
                              .astype(np.int64), SAH_BINS - 1)
            bins_of[ax] = bins
            cnt = np.bincount(bins, minlength=SAH_BINS)
            bin_min = np.full((SAH_BINS, 3), np.inf, np.float32)
            bin_max = np.full((SAH_BINS, 3), -np.inf, np.float32)
            for k in range(SAH_BINS):
                sel = bins == k
                if sel.any():
                    bin_min[k] = tmin[idx[sel]].min(axis=0)
                    bin_max[k] = tmax[idx[sel]].max(axis=0)

            def area_sweep(bm, bx, cn):
                run_min = np.minimum.accumulate(bm, axis=0)
                run_max = np.maximum.accumulate(bx, axis=0)
                d = np.maximum(run_max - run_min, 0.0)
                area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
                return area, np.cumsum(cn)

            areaL, cntL = area_sweep(bin_min, bin_max, cnt)
            areaR, cntR = area_sweep(bin_min[::-1], bin_max[::-1], cnt[::-1])
            areaR, cntR = areaR[::-1], cntR[::-1]
            for k in range(SAH_BINS - 1):
                nl, nr = cntL[k], cntR[k + 1]
                if nl == 0 or nr == 0:
                    continue
                cost = areaL[k] * nl + areaR[k + 1] * nr
                if cost < best[0]:
                    best = (cost, ax, k)
        if best[1] < 0:
            # Degenerate: median split on the longest axis.
            ax = int(np.argmax(ext))
            sort = np.argsort(cent[idx, ax], kind="stable")
            order[lo:hi] = idx[sort]
            mid = lo + count // 2
        else:
            ax, k = best[1], best[2]
            go_left = bins_of[ax] <= k
            order[lo:hi] = np.concatenate([idx[go_left], idx[~go_left]])
            mid = lo + int(go_left.sum())
        nd["axis"] = ax
        li = make_node(lo, mid)
        ri = make_node(mid, hi)
        nd["left"], nd["right"] = li, ri
        nd["count"] = 0
        stack.append(ri)
        stack.append(li)

    # Flatten DFS pre-order with skip links.
    N = len(nodes)
    f_bmin = np.zeros((N, 3), np.float32)
    f_bmax = np.zeros((N, 3), np.float32)
    f_skip = np.zeros(N, np.int32)
    f_start = np.zeros(N, np.int32)
    f_count = np.zeros(N, np.int32)
    # Iterative emit (recursion depth can exceed Python's limit on big meshes).
    flat_i = [0]
    stack2 = [(root, N)]
    while stack2:
        ni, skip_to = stack2.pop()
        nd = nodes[ni]
        i = flat_i[0]
        flat_i[0] += 1
        f_bmin[i], f_bmax[i] = nd["bmin"], nd["bmax"]
        f_skip[i] = skip_to
        if nd["left"] < 0:
            f_start[i] = nd["start"]
            f_count[i] = nd["count"]
        else:
            # Right child's subtree skips to our skip; left child skips to
            # the right child's flat index — which is i + 1 + size(left).
            # Push right first so left is emitted immediately after us.
            sz_left = _subtree_size(nodes, nd["left"])
            right_at = i + 1 + sz_left
            stack2.append((nd["right"], skip_to))
            stack2.append((nd["left"], right_at))

    # Leaf-sorted triangle arrays, padded so leaf gathers never go OOB.
    perm = order
    a_s, b_s, c_s, m_s = a[perm], b[perm], c[perm], mat[perm]
    e1 = b_s - a_s
    e2 = c_s - a_s
    nrm = np.cross(e1, e2)
    ln = np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm / np.maximum(ln, 1e-20)
    Tp = T + LEAF_K  # pad tail so start..start+K gathers are in-bounds
    return MeshBVH(
        bmin=jnp.asarray(f_bmin), bmax=jnp.asarray(f_bmax),
        skip=jnp.asarray(f_skip),
        tri_start=jnp.asarray(f_start), tri_count=jnp.asarray(f_count),
        a=jnp.asarray(_pad_to(a_s, Tp)), e1=jnp.asarray(_pad_to(e1, Tp)),
        e2=jnp.asarray(_pad_to(e2, Tp)), n=jnp.asarray(_pad_to(nrm, Tp)),
        mat=jnp.asarray(_pad_to(m_s, Tp)),
    )


def _subtree_size(nodes, ni) -> int:
    """Flat size of subtree ni (iterative)."""
    total = 0
    st = [ni]
    while st:
        n = st.pop()
        total += 1
        nd = nodes[n]
        if nd["left"] >= 0:
            st.append(nd["left"])
            st.append(nd["right"])
    return total


def _pack_nodes_fused(bvh: MeshBVH):
    """(N, 8 + 13*LEAF_K) rows: bmin(3) bmax(3) skip count, then the
    leaf's LEAF_K triangles inline (a e1 e2 n mat each).

    Fusing the leaf triangles into the node row makes traversal exactly
    ONE row gather per step — gathers dominate mesh-traversal cost on TPU
    (they cost ~5x the compute they feed), so this is the single biggest
    lever. Internal nodes carry zeroed triangle slots (masked by count).
    """
    head = jnp.concatenate(
        [bvh.bmin, bvh.bmax, bvh.skip.astype(jnp.float32)[:, None],
         bvh.tri_count.astype(jnp.float32)[:, None]], axis=1)   # (N, 8)
    tri_rows = jnp.concatenate(
        [bvh.a, bvh.e1, bvh.e2, bvh.n,
         bvh.mat.astype(jnp.float32)[:, None]], axis=1)          # (T, 13)
    k_iota = jnp.arange(LEAF_K, dtype=jnp.int32)
    ti = bvh.tri_start[:, None] + k_iota[None, :]                # (N, K)
    leaf = tri_rows[ti].reshape(bvh.n_nodes, LEAF_K * 13)
    return jnp.concatenate([head, leaf], axis=1)


def intersect_mesh(bvh: MeshBVH, o, d, tmin, tmax) -> Hit:
    """Stackless lockstep traversal with ray compaction. o/d: (P, 3).

    Mirrors MeshBVH.Hit / TriHit semantics (MeshBVH.cs:132-304): slab test
    against the running best-t, double-sided Moller-Trumbore, normal
    flipped against the ray.

    Lockstep cost is the MAX visited-node count over all rays (~10x the
    mean on the bunny: mean 13, max 131), so after most rays finish the
    remaining few are compacted (stable argsort on the alive flag) into a
    P/4 batch, then P/16, and the tail rounds run at a fraction of the
    width. Static shapes throughout; results scatter back by index.
    """
    P = o.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))
    t_hi0 = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))
    n_nodes = bvh.n_nodes
    inv_d = _safe_div(jnp.ones_like(o), d)
    packed_nodes = _pack_nodes_fused(bvh)

    k_iota = jnp.arange(LEAF_K, dtype=jnp.int32)

    def body(st):
        o = st["o"]
        d = st["d"]
        inv_d = st["inv"]
        t_lo = st["tlo"]
        node = jnp.minimum(st["node"], n_nodes - 1)
        active = st["node"] < n_nodes
        row = packed_nodes[node]            # (P, 8+13K): THE round's gather
        nb_min = row[:, 0:3]
        nb_max = row[:, 3:6]
        skip_link = row[:, 6].astype(jnp.int32)
        count = row[:, 7].astype(jnp.int32)
        ta = (nb_min - o) * inv_d
        tb = (nb_max - o) * inv_d
        t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
        t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
        box_hit = active & (t0 <= t1) & (t1 >= t_lo) & (t0 <= st["t"])

        is_leaf = count > 0
        do_leaf = box_hit & is_leaf

        # The leaf's triangles ride in the node row — no second gather.
        trow = row[:, 8:].reshape(-1, LEAF_K, 13)             # (P, K, 13)
        la = trow[..., 0:3]
        le1 = trow[..., 3:6]
        le2 = trow[..., 6:9]
        h = jnp.cross(d[:, None, :], le2)
        det = jnp.sum(le1 * h, axis=-1)
        inv_det = _safe_div(jnp.ones_like(det), det)
        s = o[:, None, :] - la
        u = jnp.sum(s * h, axis=-1) * inv_det
        q = jnp.cross(s, le1)
        v = jnp.sum(d[:, None, :] * q, axis=-1) * inv_det
        tt = jnp.sum(le2 * q, axis=-1) * inv_det
        valid = (do_leaf[:, None]
                 & (k_iota[None, :] < count[:, None])
                 & (jnp.abs(det) >= 1e-8)
                 & (u >= 0.0) & (u <= 1.0)
                 & (v >= 0.0) & (u + v <= 1.0)
                 & (tt >= t_lo[:, None]) & (tt < st["t"][:, None]))
        tt = jnp.where(valid, tt, INF)
        # First-min select over the K lanes (no argmin+gather chains).
        t_leaf = jnp.min(tt, axis=1)
        is_min = (tt == t_leaf[:, None]) & (tt < INF)
        first = jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1
        sel = (is_min & first).astype(jnp.float32)            # (P, K)
        better = t_leaf < st["t"]
        st["t"] = jnp.where(better, t_leaf, st["t"])
        # Winner attributes selected NOW from the in-row triangle data
        # (first-min one-hot) — no end-of-traversal winner gather either.
        sel3 = sel[..., None]
        win_n = jnp.sum(sel3 * trow[..., 9:12], axis=1)       # (P, 3)
        win_m = jnp.sum(sel * trow[..., 12], axis=1)
        b3 = better[:, None]
        st["wn"] = jnp.where(b3, win_n, st["wn"])
        st["wm"] = jnp.where(better, win_m, st["wm"])
        st["u"] = jnp.where(better, jnp.sum(sel * u, axis=1), st["u"])
        st["v"] = jnp.where(better, jnp.sum(sel * v, axis=1), st["v"])

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, node + 1, skip_link)
        st["node"] = jnp.where(active, nxt, st["node"])
        return st

    st = dict(
        node=jnp.zeros(P, jnp.int32),
        t=t_hi0,
        wn=jnp.zeros((P, 3), jnp.float32), wm=jnp.zeros(P, jnp.float32),
        u=jnp.zeros(P, jnp.float32), v=jnp.zeros(P, jnp.float32),
        o=o, d=d, inv=inv_d, tlo=t_lo,
    )

    def n_alive(s):
        return jnp.sum((s["node"] < n_nodes).astype(jnp.int32))

    def compact_run(st, widths):
        """Run until <= widths[0] rays are alive, compact the survivors to
        that width (stable argsort on the alive flag), recurse on the
        narrower batch, and scatter the results back."""
        if not widths:
            return jax.lax.while_loop(
                lambda s: jnp.any(s["node"] < n_nodes), body, st)
        M = widths[0]
        st = jax.lax.while_loop(lambda s: n_alive(s) > M, body, st)
        order = jnp.argsort(
            jnp.where(st["node"] < n_nodes, 0, 1).astype(jnp.int32))
        idx = order[:M]
        sub = {k: v[idx] for k, v in st.items()}
        sub = compact_run(sub, widths[1:])
        for k in ("node", "t", "wn", "wm", "u", "v"):
            st[k] = st[k].at[idx].set(sub[k])
        return st

    widths = [m for m in (P // 4, P // 16) if m >= 512]
    st = compact_run(st, widths if P >= 4096 else [])

    hit = st["t"] < t_hi0
    nrm = st["wn"]
    flip = jnp.sum(nrm * d, axis=-1) >= 0.0
    nrm = jnp.where(flip[:, None], -nrm, nrm)
    return Hit(t=jnp.where(hit, st["t"], INF), n=nrm,
               u=st["u"], v=st["v"], mat=st["wm"].astype(jnp.int32),
               hit=hit)
