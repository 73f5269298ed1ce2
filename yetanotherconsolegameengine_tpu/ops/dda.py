"""Voxel grid traversal: branchless restart DDA with brick empty-space skip.

The reference's VolumeGrid (/root/reference/ConsoleGame/RayTracing/Objects/
VolumeGrid.cs:8-420) marches rays with an incremental Amanatidis-Woo 3-D
DDA over (mat, meta) cells stored in 8^3 Morton-ordered bricks, returning
entry-axis face normals.

The TPU re-design replaces the stateful per-axis DDA increments with a
*restart* formulation that is pure arithmetic per iteration — ideal for
lockstep lanes — and uses an 8^3 brick occupancy map for empty-space
skipping (SURVEY.md §7: "chunked voxel worlds as device-resident brick
pools"):

    p      = o + t * d, nudged into the current cell
    cell   = floor((p - origin) / h)
    solid? -> done (face normal = axis crossed to enter this cell)
    step   = brick occupied ? 1 cell : 8-cell aligned brick
    t      = min over axes of the next (cell|brick) boundary crossing

Every pixel advances one (voxel or brick) step per ``lax.while_loop``
round; the loop ends when all rays hit or exit. Cells store material-bank
ids directly (0 = air) — the (mat, meta) -> Material palette lookup of
VoxelMaterialPalette.cs is baked at scene build time.

Negative result (round 3, measured on the v5e): a 4^3-supercell variant —
64 occupancy bits + a supercell-level Chebyshev distance packed into one
gathered (4,) u32 row, occupied supercells resolved by a 10-step unrolled
in-register cell march — LOST to this design on both voxel configs
(island orbit 14.2 -> 9.9 fps, DDA room 19 -> 17.1). The cell-level
distance field already makes empty space ~free (jumps up to 30 cells per
gather), so the supercell level only added per-round VPU work without
cutting the round count, which is set by surface-grazing rays marching
1 cell per round either way.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import INF, Hit, _safe_div

BRICK = 8  # VolumeGrid.cs bricks are 8^3 (Morton-ordered within brick)


# Chebyshev distance cap in CELLS (the field moved from brick to cell
# resolution): empty-space jumps reach MAX_DIST-1 cells. Each unit costs one
# min-filter iteration in cell_distance_field (run only on chunk change).
MAX_DIST = 31


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelWorld:
    """Device-resident dense voxel grid with embedded distance encoding.

    ``cells``: (nx, ny, nz) int16. Positive = material-bank id (solid);
    non-positive = -(D+1) where D is the Chebyshev distance in CELLS to
    the nearest solid cell. Embedding the distance in the cell value
    means the DDA needs ONE gather per step (gathers dominate traversal
    cost on TPU). The DDA jumps (D-1) cells through empty space: a
    unit-direction ray moves <= s in L-inf per distance s, so the jump
    can never skip a solid cell. Grid dims are padded up to brick
    multiples at build.
    """

    cells: jax.Array     # (nx, ny, nz) i16, distance-encoded
    origin: jax.Array    # (3,) world-space min corner
    voxel_size: jax.Array  # () f32

    @property
    def dims(self):
        return self.cells.shape


@jax.jit
def cell_distance_field(cells) -> jax.Array:
    """Chebyshev distance-to-solid at CELL resolution, on device:
    MAX_DIST iterations of a separable 3x3x3 min-filter. ~600M i16 ops on
    the full streamed-world window — a few ms on the VPU, run only when
    chunks change."""
    d = jnp.where(cells > 0, 0, MAX_DIST).astype(jnp.int16)

    def body(_, d):
        # Sequential separable radius-1 min-filter per axis = one L-inf
        # (3x3x3) min — iterating grows true Chebyshev distance.
        m = d
        for axis in range(3):
            lo = jnp.roll(m, 1, axis).at[
                tuple(slice(0, 1) if a == axis else slice(None)
                      for a in range(3))].set(MAX_DIST)
            hi = jnp.roll(m, -1, axis).at[
                tuple(slice(-1, None) if a == axis else slice(None)
                      for a in range(3))].set(MAX_DIST)
            m = jnp.minimum(m, jnp.minimum(lo, hi))
        return jnp.minimum(d, (m + 1).astype(jnp.int16))

    return jax.lax.fori_loop(0, MAX_DIST, body, d)


@jax.jit
def encode_cells(cells) -> jax.Array:
    """Material ids -> distance-encoded cells (see VoxelWorld)."""
    dist = cell_distance_field(cells)
    return jnp.where(cells > 0, cells,
                     (-(dist.astype(jnp.int16)) - 1)).astype(jnp.int16)


def build_voxel_world(cells: np.ndarray, origin, voxel_size: float) -> VoxelWorld:
    """cells: (nx, ny, nz) int material-bank ids (0 = air)."""
    cells = np.asarray(cells)
    pad = [(0, (-cells.shape[i]) % BRICK) for i in range(3)]
    cells = jnp.asarray(np.pad(cells, pad).astype(np.int16))
    return VoxelWorld(cells=encode_cells(cells),
                      origin=jnp.asarray(origin, jnp.float32),
                      voxel_size=jnp.asarray(voxel_size, jnp.float32))


def intersect_voxels(w: VoxelWorld, o, d, tmin, tmax) -> Hit:
    """Nearest solid-cell hit for (P, 3) rays (VolumeGrid.Hit semantics:
    entry-face normals, VolumeGrid.cs:98-231)."""
    P = o.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))
    t_hi = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))
    nx, ny, nz = w.dims
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    h = w.voxel_size
    inv_d = _safe_div(jnp.ones_like(d), d)

    # Grid AABB entry (VolumeGrid.RayAabb).
    gmin = w.origin
    gmax = w.origin + dims.astype(jnp.float32) * h
    ta = (gmin[None] - o) * inv_d
    tb = (gmax[None] - o) * inv_d
    t0v = jnp.minimum(ta, tb)
    t1v = jnp.maximum(ta, tb)
    t_enter = jnp.max(t0v, axis=-1)
    t_exit = jnp.min(t1v, axis=-1)
    enter_axis = jnp.argmax(t0v, axis=-1).astype(jnp.int32)
    t_start = jnp.maximum(t_enter, t_lo)
    inside = t_enter < t_lo  # origin inside the grid: no defined entry face
    alive0 = (t_enter <= t_exit) & (t_start < t_hi) & (t_exit >= t_lo)

    eps = 1e-4 * h

    # 1-D flattened table: ONE linear-index gather per step (the encoded
    # cells carry both material and brick distance).
    cells_flat = w.cells.reshape(-1)

    def body(st):
        o, d, inv_d = st["o"], st["d"], st["inv"]
        t_exit, t_hi = st["texit"], st["thi"]
        t, axis, alive = st["t"], st["axis"], st["alive"]
        p = o + (t + eps)[:, None] * d
        cell = jnp.floor((p - gmin[None]) / h).astype(jnp.int32)
        in_grid = jnp.all((cell >= 0) & (cell < dims[None]), axis=-1)
        alive = alive & in_grid & (t < jnp.minimum(t_exit, t_hi))
        cc = jnp.clip(cell, 0, dims[None] - 1)
        lin = (cc[:, 0] * ny + cc[:, 1]) * nz + cc[:, 2]
        enc = cells_flat[lin].astype(jnp.int32)
        mid = jnp.maximum(enc, 0)
        solid = alive & (enc > 0)
        newly = solid & ~st["hit"]
        st["hit"] = st["hit"] | newly
        st["t_hit"] = jnp.where(newly, t, st["t_hit"])
        st["axis_hit"] = jnp.where(newly, axis, st["axis_hit"])
        st["mat"] = jnp.where(newly, mid, st["mat"])
        alive = alive & ~solid

        d_cell = jnp.maximum(-enc - 1, 0)  # cell distance from the encoding
        nxt = jnp.where(d > 0.0, (cell + 1).astype(jnp.float32),
                        cell.astype(jnp.float32))
        t_axes = (gmin[None] + nxt * h - o) * inv_d
        t_axes = jnp.where(jnp.abs(d) < 1e-12, INF, t_axes)
        new_axis = jnp.argmin(t_axes, axis=-1).astype(jnp.int32)
        t_new = jnp.min(t_axes, axis=-1)
        # Distance-field empty-space skip: the nearest solid cell is
        # d_cell away in L-inf, and a unit-direction ray moves <= s per
        # component over distance s, so advancing (d_cell-1) cells is
        # always safe. Falls back to the single-cell boundary step.
        free_jump = t + jnp.maximum(d_cell - 1, 0).astype(jnp.float32) * h
        t_new = jnp.maximum(t_new, free_jump)
        st["t"] = jnp.where(alive, jnp.maximum(t_new, t + eps), st["t"])
        st["axis"] = jnp.where(alive, new_axis, st["axis"])
        st["alive"] = alive
        return st

    st = dict(t=t_start, axis=enter_axis, alive=alive0,
              hit=jnp.zeros(P, bool), t_hit=jnp.full(P, INF, jnp.float32),
              axis_hit=jnp.zeros(P, jnp.int32),
              mat=jnp.zeros(P, jnp.int32),
              o=o, d=d, inv=inv_d, texit=t_exit, thi=t_hi)

    # Ray compaction (same scheme as ops/mesh_bvh.py): lockstep step count
    # is the MAX march length over all rays; once most rays resolve, pack
    # the survivors into a P/4 then P/16 batch and finish narrow.
    def n_alive(s):
        return jnp.sum(s["alive"].astype(jnp.int32))

    result_keys = ("t", "axis", "alive", "hit", "t_hit", "axis_hit", "mat")

    def compact_run(st, widths):
        if not widths:
            return jax.lax.while_loop(lambda s: jnp.any(s["alive"]),
                                      body, st)
        M = widths[0]
        st = jax.lax.while_loop(lambda s: n_alive(s) > M, body, st)
        order = jnp.argsort(jnp.where(st["alive"], 0, 1).astype(jnp.int32))
        idx = order[:M]
        sub = {k: v[idx] for k, v in st.items()}
        sub = compact_run(sub, widths[1:])
        for k in result_keys:
            st[k] = st[k].at[idx].set(sub[k])
        return st

    widths = [m for m in (P // 4, P // 16) if m >= 512]
    st = compact_run(st, widths if P >= 4096 else [])

    hit = st["hit"]
    n = (jax.nn.one_hot(st["axis_hit"], 3, dtype=jnp.float32)
         * jnp.where(jnp.take_along_axis(d, st["axis_hit"][:, None],
                                         axis=1)[:, 0] < 0, 1.0, -1.0)[:, None])
    # A hit at t_start with the origin inside the grid has no entry face;
    # face the ray (the reference's inside-start behavior).
    n = jnp.where((inside & (st["t_hit"] <= t_start + eps))[:, None], -d, n)
    z = jnp.zeros(P, jnp.float32)
    return Hit(t=jnp.where(hit, st["t_hit"], INF), n=n, u=z, v=z,
               mat=st["mat"], hit=hit)
