"""Secondary-ray LOD: vertex-clustering mesh simplification.

The reference traces every ray — primary, shadow, diffuse bounce — against
the full-resolution MeshBVH (/root/reference/ConsoleGame/RayTracing/Objects/
MeshBVH.cs:132-304). On TPU the cluster-streaming traversal's cost for
INCOHERENT populations scales with the cluster count (each ray tile's
conservative frustum covers a large fraction of the mesh, so the candidate
union approaches C; measured: the dragon's ~8.7k bounce rays cost 3x its
65k coherent primaries). Secondary rays only feed soft quantities — shadow
occlusion and one-bounce GI — so a geometrically faithful low-poly proxy
is visually indistinguishable at terminal resolutions (the dragon carries
~70 triangles per traced pixel at 240x135; even a 16x reduction leaves >4
per pixel). This module builds that proxy.

Method: uniform-grid vertex clustering (Rossignac–Borrel). Every vertex
snaps to its grid cell's representative (the mean of the cell's vertices);
triangles whose three cells are not distinct collapse and are dropped.
Because the mesh is a triangle soup where shared edges repeat exact
coordinates, identical vertices map to identical cells — the simplified
soup stays crack-free wherever the original was. The grid resolution is
binary-searched to hit a target triangle budget.

The proxy intersects through the same cluster engine as the full mesh
(ops/mesh_clusters.py); selection between them happens per ray population
in ops/trace.py. A conservative ``t_bias`` (the clustering cell diagonal)
ships with the proxy: secondary rays start beyond it so that origins on
the FULL surface never self-intersect the displaced proxy skin.
"""

from __future__ import annotations

import numpy as np


def simplify_soup(tris: np.ndarray, mats: np.ndarray, target_tris: int):
    """Vertex-cluster ``tris`` (T, 3, 3) down to <= ``target_tris``.

    Returns (tris' (T', 3, 3) f32, mats' (T',) i32, cell_size float).
    Falls back to the input when it is already under budget.
    """
    tris = np.asarray(tris, np.float32)
    mats = np.asarray(mats, np.int32)
    T = tris.shape[0]
    if T <= target_tris:
        return tris, mats, 0.0

    v = tris.reshape(-1, 3)
    lo = v.min(axis=0)
    hi = v.max(axis=0)
    extent = float(np.max(hi - lo))
    if extent <= 0.0:
        return tris, mats, 0.0

    def attempt(n_cells: int):
        cell = extent / n_cells
        q = np.clip(((v - lo) / cell).astype(np.int64), 0, n_cells * 2)
        key = (q[:, 0] << 42) | (q[:, 1] << 21) | q[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
        # Cell representative = mean of the cell's vertices.
        reps = np.zeros((len(uniq), 3), np.float64)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
        for ax in range(3):
            reps[:, ax] = np.bincount(inv, weights=v[:, ax],
                                      minlength=len(uniq))
        reps /= cnt[:, None]
        tri_cells = inv.reshape(-1, 3)
        keep = ((tri_cells[:, 0] != tri_cells[:, 1])
                & (tri_cells[:, 1] != tri_cells[:, 2])
                & (tri_cells[:, 0] != tri_cells[:, 2]))
        out = reps[tri_cells[keep]].astype(np.float32)
        return out, mats[keep], cell

    # Binary search the grid resolution for the largest grid (finest
    # detail) that stays under the triangle budget.
    lo_n, hi_n = 4, 512
    best = attempt(lo_n)
    while lo_n + 1 < hi_n:
        mid = (lo_n + hi_n) // 2
        cand = attempt(mid)
        if cand[0].shape[0] <= target_tris:
            best, lo_n = cand, mid
        else:
            hi_n = mid
    out, m, cell = best
    # Conservative self-intersection bias: the proxy surface deviates from
    # the true surface by at most ~one cell diagonal.
    return out, m, float(cell * np.sqrt(3.0))
