"""River network: D8 flow directions + accumulation + carve depth
(RiverNetworkGlobal.cs:7-86 / RiverNetwork.cs).

The reference computes, over a heightfield: steepest-descent D8 flow
directions, flow accumulation in ascending height order, then a carve
depth and river water surface per column. This is inherently a global
sweep; it is vectorized here except the height-ordered accumulation pass,
which is a single O(n) scatter loop over sorted columns.
"""

from __future__ import annotations

import numpy as np

from .settings import WorldGenSettings

# D8 neighbor offsets (dx, dz).
_D8 = np.asarray([(-1, -1), (0, -1), (1, -1), (-1, 0),
                  (1, 0), (-1, 1), (0, 1), (1, 1)], np.int64)


def flow_directions(height: np.ndarray) -> np.ndarray:
    """(W, H) height -> (W, H) index into _D8 of the steepest descent, or
    -1 for pits/flats (RiverNetworkGlobal D8 pass)."""
    h = np.asarray(height, np.float64)
    W, H = h.shape
    best_drop = np.zeros((W, H))
    best_dir = np.full((W, H), -1, np.int64)
    dist = np.asarray([np.hypot(dx, dz) for dx, dz in _D8])
    for k, (dx, dz) in enumerate(_D8):
        nh = np.full((W, H), np.inf)
        # nh[x, z] = h[x+dx, z+dz] over the in-bounds region.
        dst_x = slice(max(0, -dx), W - max(0, dx))
        src_x = slice(max(0, dx), W - max(0, -dx))
        dst_z = slice(max(0, -dz), H - max(0, dz))
        src_z = slice(max(0, dz), H - max(0, -dz))
        nh[dst_x, dst_z] = h[src_x, src_z]
        drop = (h - nh) / dist[k]
        better = drop > best_drop
        best_drop[better] = drop[better]
        best_dir[better] = k
    return best_dir


def flow_accumulation(height: np.ndarray, fdir: np.ndarray) -> np.ndarray:
    """Upslope-area accumulation, visiting columns from high to low
    (RiverNetworkGlobal accumulation pass: ascending height order means
    every column pushes its accumulated flow to its downstream neighbor)."""
    h = np.asarray(height, np.float64)
    W, H = h.shape
    acc = np.ones((W, H))
    order = np.argsort(h, axis=None)[::-1]  # highest first
    xs, zs = np.unravel_index(order, (W, H))
    fd = fdir[xs, zs]
    ok = fd >= 0
    dx = _D8[fd[ok], 0]
    dz = _D8[fd[ok], 1]
    tx = xs[ok] + dx
    tz = zs[ok] + dz
    inb = (tx >= 0) & (tx < W) & (tz >= 0) & (tz < H)
    src = np.flatnonzero(ok)[inb]
    # Sequential scatter: each column adds its (already final) accumulation
    # downstream. Order guarantees upstream-before-downstream.
    sx, sz = xs[src], zs[src]
    txx, tzz = tx[inb], tz[inb]
    for i in range(len(src)):
        acc[txx[i], tzz[i]] += acc[sx[i], sz[i]]
    return acc


def carve(height: np.ndarray, gs: WorldGenSettings):
    """Returns (carved_height, river_mask, water_surface_delta).

    Carve depth grows with log-accumulation past the river threshold
    (RiverNetworkGlobal carve pass)."""
    fdir = flow_directions(height)
    acc = flow_accumulation(height, fdir)
    river = acc >= gs.river_min_accum
    depth = np.where(
        river,
        np.minimum(gs.river_carve_depth,
                   1.0 + np.log1p(acc / gs.river_min_accum)),
        0.0)
    carved = np.asarray(height, np.float64) - depth
    return carved, river, depth
