"""Cluster-matmul mesh traversal: the TPU-native answer to MeshBVH.

The reference traverses a binned-SAH BVH per ray with a stack
(/root/reference/ConsoleGame/RayTracing/Objects/MeshBVH.cs:132-304). Round 1
re-expressed that as a lockstep skip-link walk (ops/mesh_bvh.py) — correct,
but one (P, 60) gather per traversal step is ~5x the compute it feeds, and
the lockstep cost is the MAX visited-node count, so a 69k-tri mesh ran at
~1.4 Mray/s. This module replaces per-ray pointer chasing with the
TPU-shaped equivalent: *tile-synchronous dense cluster testing* (the "ray
stream tracing" family — rays stream as coherent bundles, geometry streams
as dense blocks, and all intersection math is matmul/VPU-shaped).

  1. HOST BUILD  — triangles are sorted into a spatially coherent linear
     order (recursive median split) and packed into CONSECUTIVE clusters of
     exactly kc (default KC=256; proxy sets pack wider) with tight AABBs
     (zero padding waste). Each cluster bakes its triangles' Woop
     world->barycentric transforms into one (24, kc) f32 block — three
     8-sublane field groups (U/V/W), rows 0-3 of each = x/y/z/affine —
     so a whole cluster is ONE aligned DMA (24 KB at kc=256) whose
     field-major layout lets VISIT_BATCH blocks land lane-adjacent and
     intersect as a single matmul.
  2. XLA CULL    — rays are binned into coherent tiles of T rays (default
     TILE=256; see intersect_clusters(tile=)) (stable sort by direction
     octant + origin Morton; primary rays keep image order). Each tile is
     split into SUB_W=64-ray sub-bundles; a dense
     conservative interval-arithmetic slab test of every sub-bundle against
     every cluster AABB yields, per tile, a near-to-far sorted candidate
     list. This is the "traversal", done in bulk on the VPU instead of
     serially per ray — and it cannot overflow: capacity is the full
     cluster count. Rays that cannot touch the global mesh AABB within
     their [tmin, tmax] never enter a tile at all.
  3. PALLAS KERNEL — one grid step per tile. The leading chunk of the
     tile's list is DMA'd to SMEM (more only if the list is long); a
     dynamic while_loop streams candidate clusters HBM->VMEM (NBUF-deep
     async pipeline) and evaluates 256 rays x VISIT_BATCH*kc triangles
     per loop step as one skinny K=12 MXU matmul + VPU validity masks
     (per-visit cost is launch-bound, so batching list entries into one
     contraction amortizes it). A single bit-packed min-reduce tracks the
     winner: the low log2(VISIT_BATCH*kc) mantissa bits of each candidate
     t are overwritten with the step-local triangle index, so one i32 min
     gives nearest-t, its triangle, and its list entry. The loop EXITS as
     soon as the next cluster's conservative entry distance exceeds every
     ray's current best (near-to-far order makes this exact).
  4. XLA RESOLVE — one row gather per ray fetches the winning triangle and
     re-runs exact Moller-Trumbore for full-precision t/u/v (the in-kernel
     t lost its 8 low mantissa bits, ~3e-5 relative, fine for pruning but
     not for shading).

Approximate reciprocal (+1 Newton step, ~2^-24 rel) keeps the per-visit
divide off the critical path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, Hit, _safe_div

KC = 256               # default triangles per cluster (sublane extent);
                       # tables may pack wider (power of two) — the kernel
                       # reads the width off gmat's lane extent. Visits are
                       # launch-bound (~2.3 us for a (768,4)x(4,512) visit),
                       # so proxy sets pack 2x wider to halve visit count.
TILE = 256             # default rays per tile (see intersect_clusters(tile=));
                       # Mosaic lane alignment bounds it below at 128
SUB_W = 64             # rays per cull sub-bundle (frustum granularity)
NBUF = 4               # cluster DMA pipeline depth
EXIT_CHUNK = 1         # loop STEPS between early-exit checks (a step spans
                       # VISIT_BATCH entries, so the entry-level cadence is
                       # EXIT_CHUNK*VISIT_BATCH = 4, matching the round-4
                       # winner). Round-4 notes (entry units): visits between
                       # early-exit checks. Measured on the
                       # dragon @240x135 (tools/ab_dragon.py, round 4):
                       # exit4 40.8 fps vs exit8 39.0 — tighter exit bounds
                       # beat the halved check cadence; exit2 41.1 vs exit4
                       # 40.6 across invocations = flat within tunnel noise,
                       # not worth doubling the check cost. tile128 (finer
                       # ray tiles for silhouette culls) measured 29.2 fps —
                       # per-tile launch overhead dominates; keep TILE=256.
DISABLE_EARLY_EXIT = False   # debug/ablation knob
# Candidate-list entries evaluated per kernel loop step. Each visit's cost
# is launch-bound (~2.3 us for a (768,4)x(4,512) matmul), so one step DMAs
# VISIT_BATCH consecutive list entries into lane-adjacent VMEM slices and
# evaluates them as ONE (12, V*3kc)x(12, 2T) contraction + one epilogue.
# The packed winner's low bits then index V*kc triangles; the kernel can't
# recover the winning CLUSTER id per lane (no per-lane SMEM gather), so it
# carries the step's base list position and XLA resolves the id with one
# batched take_along_axis into the candidate lists. Power of two; 1 = the
# round-4 per-entry loop. Measured round 5 (tools/ab_dragon.py /
# tools/ab_island.py, vbN exitN): the ENTRY-level exit cadence
# (EXIT_CHUNK*VISIT_BATCH) must stay at the round-4 winner of 4 or
# over-visiting eats the amortization (dragon vb4/exit4 35.8 fps vs
# vb4/exit1 40.8 pre-shadow-proxy). At the matched cadence, vb4/exit1
# beats vb1/exit4 everywhere once sweeps are short (coarse proxies make
# them launch-bound): dragon 55.6 vs 53.5 fps, bunny @160x90 130.1 vs
# 125.4, island @240x135 21.3 vs 20.5.
VISIT_BATCH = 4
# Refine the approx reciprocal with one Newton step in the visit. It was
# briefly OFF for +1.3 fps on the dragon (the packed-t winner only ORDERS
# candidates and the XLA resolve recomputes exact t/u/v), but the raw
# ~2^-12 relative t error breaks the in-kernel ``t > tmin`` validity test
# against PER-RAY MARCHED tmin: shadow-transmittance loops bump tmin by an
# absolute 1e-3 past the previous hit (trace.py), and at t >= ~4 the
# approx error exceeds that epsilon, so the loop re-finds the same
# surface forever (tests/test_mesh_clusters.py::test_per_ray_tmin_marching).
# The opaque-dragon image A/B that justified OFF never marched. Stays ON.
NEWTON_RCP = True
LIST_CHUNK = 512       # list entries DMA'd to SMEM up front
_NEG0_BITS = np.int32(-0x80000000)   # bits of -0.0 == INT32_MIN


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshClusters:
    """Device-resident cluster tables (static per mesh)."""

    cbmin: jax.Array     # (C, 3) cluster AABB min
    cbmax: jax.Array     # (C, 3)
    gmat: jax.Array      # (C, 24, KC) Woop blocks, FIELD-MAJOR: sublane
                         # groups [0:8)=U, [8:16)=V, [16:24)=W; rows 0-2 of
                         # each group = x/y/z, row 3 = affine const, rows
                         # 4-7 zero pad (keeps each group 8-sublane aligned
                         # so the kernel's 4-row reads stay layout-free)
    tri_rows: jax.Array  # (C*KC, 16): a(3) e1(3) e2(3) n(3) mat 0 0 0
    bounds: jax.Array    # (2, 3) global mesh AABB (for ray-sort Morton keys)
    # Self-intersection guard for LOD proxy sets (scene/lod.py): the proxy
    # surface deviates from the true surface by up to this distance, so
    # secondary rays originating on the FULL mesh clamp tmin to it.
    t_bias: float = dataclasses.field(default=0.0,
                                      metadata=dict(static=True))

    @property
    def n_clusters(self) -> int:
        return self.cbmin.shape[0]

    @property
    def kc(self) -> int:
        """Triangles per cluster (a power of two; gmat's lane extent)."""
        return self.gmat.shape[2]


def _woop_rows(a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """Per-triangle world->barycentric affine rows (float64 inverse).

    Returns (rows, const): rows (T, 3, 3) = U/V/W vectors, const (T, 3)
    = the affine terms (-U.A, -V.A, -W.A). Degenerate triangles get all-zero
    rows and const (-1,-1,-1): dw==0 -> t=inf/NaN -> never valid.
    """
    a64 = a.astype(np.float64)
    e1 = b.astype(np.float64) - a64
    e2 = c.astype(np.float64) - a64
    n = np.cross(e1, e2)
    s = np.stack([e1, e2, n], axis=-1)          # (T, 3, 3) columns e1|e2|n
    det = np.linalg.det(s)
    ok = np.abs(det) > 1e-18
    s_safe = np.where(ok[:, None, None], s, np.eye(3)[None])
    inv = np.linalg.inv(s_safe)                  # (T, 3, 3) rows U/V/W
    inv = np.where(ok[:, None, None], inv, 0.0)
    const = -np.einsum("tij,tj->ti", inv, a64)
    const = np.where(ok[:, None], const, -1.0)
    return inv.astype(np.float32), const.astype(np.float32)


def pack_cluster_blocks(a: np.ndarray, b: np.ndarray, c: np.ndarray,
                        mat: np.ndarray, kc: int = KC):
    """Host packing of triangles into ``kc``-wide cluster blocks.

    Returns numpy ``(cbmin (C,3), cbmax (C,3), gmat (C,8,3kc),
    tri_rows (C*kc,16))`` — the raw table rows of ``MeshClusters`` —
    so callers can either assemble a whole-mesh ``MeshClusters``
    (``build_clusters``) or scatter the blocks into slots of a larger
    device-resident table (the streamed-world surface mesher,
    world/surface.py)."""
    assert kc & (kc - 1) == 0, "kc must be a power of two"
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = np.asarray(c, np.float32)
    mat = np.asarray(mat, np.int32)
    T = a.shape[0]
    tmin = np.minimum(np.minimum(a, b), c)
    tmax = np.maximum(np.maximum(a, b), c)
    cent = (tmin + tmax) * 0.5

    # Recursive median sort gives a spatially coherent linear order; packing
    # CONSECUTIVE runs of exactly kc into clusters then wastes no padded
    # slots, at the cost of slightly looser AABBs where a run straddles a
    # split. Sorting down to kc/4-sized leaves keeps those spans small.
    order = np.arange(T)
    stack = [(0, T)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= max(kc // 4, 32):
            continue
        idx = order[lo:hi]
        cb = cent[idx]
        ax = int(np.argmax(cb.max(axis=0) - cb.min(axis=0)))
        srt = np.argsort(cb[:, ax], kind="stable")
        order[lo:hi] = idx[srt]
        mid = lo + (hi - lo) // 2
        stack.append((mid, hi))
        stack.append((lo, mid))

    ranges = [(lo, min(lo + kc, T)) for lo in range(0, T, kc)]
    C = len(ranges)
    a_s, b_s, c_s, m_s = a[order], b[order], c[order], mat[order]
    rows, const = _woop_rows(a_s, b_s, c_s)

    cbmin = np.zeros((C, 3), np.float32)
    cbmax = np.zeros((C, 3), np.float32)
    gmat = np.zeros((C, 24, kc), np.float32)
    tri_rows = np.zeros((C * kc, 16), np.float32)
    # Degenerate padding slots: const=-1, rows=0 (never valid). Row 3 of
    # each 8-sublane field group is that field's affine-const row.
    gmat[:, 3::8, :] = -1.0

    e1 = b_s - a_s
    e2 = c_s - a_s
    nrm = np.cross(e1, e2)
    ln = np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm / np.maximum(ln, 1e-20)

    for ci, (lo, hi) in enumerate(ranges):
        cnt = hi - lo
        sl = slice(lo, hi)
        cbmin[ci] = tmin[order[sl]].min(axis=0)
        cbmax[ci] = tmax[order[sl]].max(axis=0)
        for f in range(3):      # U, V, W field groups
            for comp in range(3):   # x, y, z rows
                gmat[ci, f * 8 + comp, :cnt] = rows[sl, f, comp]
            gmat[ci, f * 8 + 3, :cnt] = const[sl, f]
        dst = slice(ci * kc, ci * kc + cnt)
        tri_rows[dst, 0:3] = a_s[sl]
        tri_rows[dst, 3:6] = e1[sl]
        tri_rows[dst, 6:9] = e2[sl]
        tri_rows[dst, 9:12] = nrm[sl]
        tri_rows[dst, 12] = m_s[sl]

    return cbmin, cbmax, gmat, tri_rows


def build_clusters(a: np.ndarray, b: np.ndarray, c: np.ndarray,
                   mat: np.ndarray, t_bias: float = 0.0,
                   kc: int = KC) -> MeshClusters:
    """Spatial-sort + consecutive-kc packing host build."""
    cbmin, cbmax, gmat, tri_rows = pack_cluster_blocks(a, b, c, mat, kc=kc)
    bounds = np.stack([cbmin.min(axis=0), cbmax.max(axis=0)])
    return MeshClusters(
        cbmin=jnp.asarray(cbmin), cbmax=jnp.asarray(cbmax),
        gmat=jnp.asarray(gmat), tri_rows=jnp.asarray(tri_rows),
        bounds=jnp.asarray(bounds), t_bias=float(t_bias))


# ---------------------------------------------------------------------------
# XLA cull: sub-bundle frusta vs cluster AABBs (conservative intervals)
# ---------------------------------------------------------------------------

def _axis_interval(ol, oh, dl, dh, lo, hi):
    """Conservative [t_lo, t_hi] during which ANY ray with origin in
    [ol, oh] and direction in [dl, dh] can be inside slab [lo, hi].

    Entirely branch-free; any case it cannot bound returns [0, INF).
    """
    inf = jnp.float32(INF)
    overlap = (oh >= lo) & (ol <= hi)
    right = ol > hi     # all origins right of slab
    # Entry lower bound.
    t_lo = jnp.where(
        overlap, 0.0,
        jnp.where(right,
                  jnp.where(dl < 0.0, (hi - ol) / dl, inf),
                  jnp.where(dh > 0.0, (lo - oh) / dh, inf)))
    # Exit upper bound: unbounded unless direction is sign-definite.
    t_hi = jnp.where(dl > 0.0, (hi - ol) / dl,
                     jnp.where(dh < 0.0, (lo - oh) / dh, inf))
    return t_lo, jnp.maximum(t_hi, 0.0)


def _tile_cull(o_t, d_t, act_t, tmax_t, cbmin, cbmax):
    """Per-tile near-to-far candidate lists from SUB_W-ray sub-bundle frusta.

    o_t/d_t: (n_tiles, T, 3). Returns (ids (n_tiles, Cp) i32, te_bits
    (n_tiles, Cp) i32 ascending, lens (n_tiles,) i32). The sub-bundle
    width is fixed at SUB_W rays regardless of tile width, so total cull
    work (n_tiles * S * C interval tests) is invariant in the tile knob."""
    inf = jnp.float32(INF)
    big = jnp.float32(2.0e30)
    n_tiles = o_t.shape[0]
    tile = o_t.shape[1]
    C = cbmin.shape[0]
    S = max(1, tile // SUB_W)
    o_s = o_t.reshape(n_tiles, S, tile // S, 3)
    d_s = d_t.reshape(n_tiles, S, tile // S, 3)
    a_s = act_t.reshape(n_tiles, S, tile // S)
    x_s = tmax_t.reshape(n_tiles, S, tile // S)
    a3 = a_s[..., None]
    ol = jnp.min(jnp.where(a3, o_s, big), axis=2)    # (n_tiles, S, 3)
    oh = jnp.max(jnp.where(a3, o_s, -big), axis=2)
    dl = jnp.min(jnp.where(a3, d_s, big), axis=2)
    dh = jnp.max(jnp.where(a3, d_s, -big), axis=2)
    any_act = jnp.any(a_s, axis=2)                   # (n_tiles, S)
    tmax_hi = jnp.max(jnp.where(a_s, x_s, 0.0), axis=2)

    t_lo = jnp.zeros((n_tiles, S, C), jnp.float32)
    t_hi = jnp.full_like(t_lo, inf)
    for ax in range(3):
        lo_a, hi_a = _axis_interval(
            ol[:, :, ax:ax + 1], oh[:, :, ax:ax + 1],
            dl[:, :, ax:ax + 1], dh[:, :, ax:ax + 1],
            cbmin[None, None, :, ax], cbmax[None, None, :, ax])
        t_lo = jnp.maximum(t_lo, lo_a)
        t_hi = jnp.minimum(t_hi, hi_a)

    cand_s = ((t_lo <= t_hi * 1.0001 + 1e-4)
              & (t_lo < tmax_hi[..., None]) & any_act[..., None])
    key_s = jnp.where(cand_s, t_lo, inf)
    key = jnp.min(key_s, axis=1)                     # (n_tiles, C)
    cand = jnp.any(cand_s, axis=1)

    Cp = ((C + 127) // 128) * 128
    pad = Cp - C
    if pad:
        key = jnp.pad(key, ((0, 0), (0, pad)), constant_values=INF)
    iota = jnp.broadcast_to(
        jnp.arange(Cp, dtype=jnp.int32)[None, :], key.shape)
    te, ids = jax.lax.sort([key, iota], num_keys=1)  # one fused sort pass
    te_bits = jax.lax.bitcast_convert_type(te, jnp.int32)
    lens = jnp.sum(cand.astype(jnp.int32), axis=1)
    return ids, te_bits, lens


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _trace_kernel(lens_smem, lists_hbm, gmat_hbm, rays_ref, out_ref,
                  lst, gbuf, sem_l, sem_g, *, any_hit=False, kc=KC,
                  tile=TILE, vb=1):
    T = tile
    V = vb
    i = pl.program_id(0)
    n = lens_smem[i]
    # Loop steps cover V consecutive list entries each.
    n_steps = jax.lax.div(n + (V - 1), V)
    Cp = lst.shape[1]

    # List DMA in LIST_CHUNK pieces: typical tiles need one 4 KB chunk, not
    # the whole Cp row (SMEM DMA bandwidth is precious). Later chunks load
    # only when the list is actually that long.
    for ch in range(0, Cp, LIST_CHUNK):
        sz = min(LIST_CHUNK, Cp - ch)

        def _load(ch=ch, sz=sz):
            cpy = pltpu.make_async_copy(
                lists_hbm.at[i, :, pl.ds(ch, sz)],
                lst.at[:, pl.ds(ch, sz)], sem_l)
            cpy.start()
            cpy.wait()

        # Every chunk is conditional — including chunk 0: empty tiles
        # (whole populations of inactive/pre-filtered rays sort into them)
        # must cost near-zero, and SMEM DMAs are the expensive part of the
        # per-tile preamble.
        pl.when(n > ch)(_load)

    od = rays_ref[:, 0:2 * T]          # (4, 2T): [o|1] then [d|0] columns
    # hi/lo bf16 split of the ray columns (hoisted out of the visit loop).
    od_hi = od.astype(jnp.bfloat16)
    od_lo = (od - od_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # Stack the 3 hi/lo passes along the CONTRACTED dim: one K=12 matmul
    # computes g_hi*od_hi + g_hi*od_lo + g_lo*od_hi with the cross-pass
    # sum accumulating INSIDE the MXU (f32). The two (3kc, 2T) VPU adds
    # of the explicit 3-pass form were ~1/3 of the whole visit's vector
    # time; the MXU pads K to its native depth anyway, so K=12 costs the
    # same as K=4.
    od12 = jnp.concatenate([od_hi, od_lo, od_hi], axis=0)   # (12, 2T)
    lim = rays_ref[:, 2 * T:3 * T]     # (4, T): rows = init_bits tmin . .
    init_packed = pltpu.bitcast(lim[0:1, :], jnp.int32)    # (1, T)
    tmin = lim[1:2, :]                                     # (1, T)

    def get_dma(slot, e):
        # Entry e of the candidate list -> lane slice e%V of VMEM slot
        # (slot = (e // V) % NBUF). gmat rows are FIELD-MAJOR (24, kc):
        # sublane groups [0:8)=U, [8:16)=V, [16:24)=W (4 rows used + 4 pad
        # each, keeping every group 8-sublane aligned), so one DMA per
        # entry lands all three fields at lane offset (e%V)*kc — a
        # multiple of 128 for every supported kc.
        cid = lst[0, jnp.minimum(e, Cp - 1)]
        return pltpu.make_async_copy(
            gmat_hbm.at[cid, :, :],
            gbuf.at[slot, :, pl.ds(jax.lax.rem(e, V) * kc, kc)],
            sem_g.at[slot, jax.lax.rem(e, V)])

    @pl.when(n > 0)
    def _():
        for ee in range((NBUF - 1) * V):
            @pl.when(ee < n)
            def _():
                get_dma((ee // V) % NBUF, ee).start()

    VK = V * kc
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (VK, T), 0)
    kmask = jnp.int32(VK - 1)
    # Which list entry (relative to the step base) each packed-index row
    # belongs to: rows [v*kc, (v+1)*kc) came from entry base+v.
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (VK, T), 0) // kc

    # The winner state (best_packed, best_jb) rides the while CARRY as
    # VALUES. Ref-carried state read back inside the loop body/cond is
    # discharged to its pre-loop value by Pallas (verified empirically:
    # both the cond and cross-iteration body reads went stale, silently
    # corrupting winner tracking) — only pure DMA/semaphore ops live under
    # pl.when; all state updates are masked by `ok` instead. best_jb is
    # the winning step's BASE list position (j*V); the winning entry is
    # best_jb + (packed_idx >> log2kc), resolved in XLA.
    def _visit(j, best_packed, best_jb):
        ok = j < n_steps
        base = j * V
        slot = jax.lax.rem(j, NBUF)

        for v in range(V):
            @pl.when(base + v < n)
            def _(v=v):
                get_dma(slot, base + v).wait()

        # Assemble the step's matmul operand: the three 4-row field groups
        # of the slot's V lane-adjacent blocks, lane-concatenated to
        # [U-all | V-all | W-all] (each "-all" spans VK lanes in block
        # order, so packed index v*kc+t maps back to entry base+v). The
        # concat moves 48 KB/step — trivial next to the DMA traffic it
        # lets one matmul + one epilogue amortize over V entries.
        gb = gbuf[slot]
        g = jnp.concatenate([gb[0:4, :], gb[8:12, :], gb[16:20, :]],
                            axis=1)                    # (4, 3*VK)
        # Precision is load-bearing: the MXU's DEFAULT matmul precision is
        # a single bf16 pass, and the Woop rows of fine triangles are large
        # (|U| ~ 1/edge) with the barycentrics emerging from catastrophic
        # cancellation — at bf16 mantissa the u/v tests are garbage (3% of
        # bunny pixels speckled). Mosaic offers only DEFAULT or HIGHEST
        # (6 passes, ~2x frame cost), so do the classic 3-pass hi/lo bf16
        # decomposition by hand: err ~2^-22, half the HIGHEST cost.
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        g12 = jnp.concatenate([g_hi, g_hi, g_lo], axis=0)  # (12, 3*VK)
        rr = jax.lax.dot_general(g12, od12, dn,
                                 preferred_element_type=jnp.float32)
        ou = rr[:VK, :T]
        ov = rr[VK:2 * VK, :T]
        ow = rr[2 * VK:, :T]
        du = rr[:VK, T:]
        dv = rr[VK:2 * VK, T:]
        dw = rr[2 * VK:, T:]
        bt = pltpu.bitcast(best_packed & ~kmask, jnp.float32)
        r0 = pl.reciprocal(dw, approx=True)
        if NEWTON_RCP:
            inv_dw = r0 * (2.0 - dw * r0)              # one Newton step
        else:
            # ~2^-12 relative t error: winner ORDER can flip only between
            # triangles within ~0.02% in t (either passes the exact
            # resolve); u/v perturbation ~2e-4 sits inside the 1e-3 slack.
            inv_dw = r0
        t = -ow * inv_dw
        u = ou + t * du
        v = ov + t * dv
        m = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        # Small barycentric slack keeps shared edges watertight against
        # residual rounding (HIGHEST-precision matmul is ~f32 but not
        # bit-identical); overlapping acceptance double-hits resolve via
        # the nearest-t min and the XLA resolve recomputes exact t/u/v.
        # Rows of entries past the list's end read stale VMEM (never
        # DMA'd this step): mask them by list position, which also covers
        # whole steps past n_steps (ok stays as a belt-and-braces mask on
        # the winner update).
        valid = ((m >= -1e-3) & (t > tmin) & (t < bt)  # NaNs fail all three
                 & (base + sub_iota < n))
        tt = jnp.where(valid, t, jnp.float32(3.0e38))
        packed = (pltpu.bitcast(tt, jnp.int32) & ~kmask) | k_iota
        pmin = jnp.min(packed, axis=0, keepdims=True)  # (1, T)
        better = (pmin < best_packed) & ok
        best_packed = jnp.where(better, pmin, best_packed)
        best_jb = jnp.where(better, base, best_jb)
        # Refill the PREVIOUS iteration's slot (step j+NBUF-1 lands in
        # slot (j-1) % NBUF): no iteration ever DMA-writes the slot it is
        # reading. Starting the refill of the CURRENT slot in the same
        # iteration is a write-after-read race — Mosaic does not order
        # async-copy writes against in-flight vector reads of the same
        # buffer (symptom: ~0.5-9%% of rays returned a different cluster's
        # t with the right cid; deterministic under the synchronous
        # interpreter, speckle on hardware).
        nxt = j + NBUF - 1
        nxt_slot = jax.lax.rem(nxt, NBUF)
        for v in range(V):
            @pl.when(ok & (nxt * V + v < n))
            def _(v=v):
                get_dma(nxt_slot, nxt * V + v).start()
        return best_packed, best_jb

    def cond(st):
        # Near-to-far lists: once the next cluster's conservative entry
        # exceeds every ray's current best, nothing can improve. The
        # maxbest bound is refreshed once per EXIT_CHUNK steps: the (1, T)
        # max-reduce costs ~20% of a visit, so per-visit checking loses
        # more than it saves. In ANY-HIT mode (opaque shadow queries) a
        # ray with any hit stops constraining the bound entirely, so fully
        # shadowed tiles exit after their first blocking cluster.
        j, best_packed, best_jb = st
        if DISABLE_EARLY_EXIT:
            return j < n_steps
        if any_hit:
            bound = jnp.max(jnp.where(best_jb >= 0,
                                      jnp.int32(-0x80000000), best_packed))
        else:
            bound = jnp.max(best_packed)
        return (j < n_steps) & (lst[1, jnp.minimum(j * V, Cp - 1)] < bound)

    def chunk(st):
        j, best_packed, best_jb = st
        for k in range(EXIT_CHUNK):
            best_packed, best_jb = _visit(j + k, best_packed, best_jb)
        return j + EXIT_CHUNK, best_packed, best_jb

    j, best_packed, best_jb = jax.lax.while_loop(
        cond, chunk, (jnp.int32(0), init_packed,
                      jnp.full((1, T), -1, jnp.int32)))
    jc = jnp.minimum(j, n_steps)

    # Drain the DMA pipeline: an early exit leaves up to NBUF-1 prefetched
    # steps' copies in flight (entries [jc*V, min((jc+NBUF-1)*V, n)));
    # their semaphores MUST be consumed before the kernel ends or the
    # device wedges.
    def _drain(e, x):
        get_dma(jax.lax.rem(jax.lax.div(e, V), NBUF), e).wait()
        return x
    jax.lax.fori_loop(jc * V, jnp.minimum((jc + NBUF - 1) * V, n), _drain,
                      jnp.int32(0))

    out_ref[0:1, :] = best_packed
    out_ref[1:2, :] = best_jb
    out_ref[2:3, :] = jnp.broadcast_to(jc, (1, T))    # loop steps run
    out_ref[3:4, :] = jnp.broadcast_to(n, (1, T))     # list length


def _run_kernel(lens, lists, gmat, rays, n_tiles, interpret=False,
                any_hit=False):
    T = rays.shape[1] // (3 * n_tiles)   # rays is (4, n_tiles * 3T)
    assert rays.shape[1] == 3 * T * n_tiles, (rays.shape, n_tiles)
    Cp = lists.shape[2]
    kc = gmat.shape[2]
    vb = max(1, VISIT_BATCH)
    return pl.pallas_call(
        functools.partial(_trace_kernel, any_hit=any_hit, kc=kc, tile=T,
                          vb=vb),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lens (n_tiles,)
            pl.BlockSpec(memory_space=pl.ANY),       # lists (n_tiles,2,Cp)
            pl.BlockSpec(memory_space=pl.ANY),       # gmat (C,24,kc)
            pl.BlockSpec((4, 3 * T), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((4, T), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * T), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((2, Cp), jnp.int32),
            pltpu.VMEM((NBUF, 24, vb * kc), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((NBUF, vb)),
        ],
        interpret=interpret,
    )(lens, lists, gmat, rays)


# ---------------------------------------------------------------------------
# Ray binning + end-to-end intersect
# ---------------------------------------------------------------------------

def _morton3(q: jax.Array, bits: int) -> jax.Array:
    """Interleave 3 x `bits`-bit ints (q: (..., 3) i32) -> Morton code."""
    code = jnp.zeros(q.shape[:-1], jnp.int32)
    for b in range(bits):
        for ax in range(3):
            code = code | (((q[..., ax] >> b) & 1) << (3 * b + ax))
    return code


def _sort_keys(o, d, active, bounds):
    """Direction-octant-major, origin-Morton, then direction-Morton binning
    keys. Stable argsort keeps the (already image-coherent) original order
    within equal keys, so primary rays stay in pixel-block order for free.
    The direction sub-bits matter for BOUNCE populations: rays leaving a
    surface patch in similar directions share a tight frustum, which is
    what keeps the per-tile candidate unions short (incoherent bounce
    sweeps measured 3x the primary cost without them)."""
    oct_ = (((d[:, 0] < 0).astype(jnp.int32))
            | ((d[:, 1] < 0).astype(jnp.int32) << 1)
            | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    span = jnp.maximum(bounds[1] - bounds[0], 1e-6)
    q = jnp.clip(((o - bounds[0]) / span * 31.0), 0.0, 31.0).astype(jnp.int32)
    dq = jnp.clip(jnp.abs(d) * 3.999, 0.0, 3.0).astype(jnp.int32)
    key = (oct_ << 21) | (_morton3(q, 5) << 6) | _morton3(dq, 2)
    return jnp.where(active, key, jnp.int32(1 << 29))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "stats", "any_hit",
                                    "presort", "tile"))
def _intersect_impl(mc: MeshClusters, o, d, t_lo, t_hi, interpret=False,
                    stats=False, any_hit=False, presort=True, tile=None):
    P = o.shape[0]
    T = TILE if tile is None else tile
    # Mosaic lane alignment: the out block is (4, T) and the rays block
    # (4, 3T); both need 128-multiple lane extents on hardware.
    assert T % 128 == 0 and T >= 128, T
    kc = mc.kc
    vb = max(1, VISIT_BATCH)
    # Low mantissa bits carry the triangle index WITHIN A STEP's vb
    # lane-concatenated blocks: idx = v*kc + tri, v = the entry offset
    # from the winning step's base list position.
    kmask = jnp.int32(vb * kc - 1)
    Pp = ((P + T - 1) // T) * T
    pad = Pp - P
    active = jnp.max(jnp.abs(o), axis=1) < 1.0e30
    # Global-AABB prefilter: rays that cannot touch the mesh bounds within
    # [t_lo, t_hi] never enter a tile (sky rays and floor-clipped rays are
    # the bulk of a real frame).
    inv_d = _safe_div(jnp.ones_like(d), d)
    ta = (mc.bounds[0][None] - o) * inv_d
    tb = (mc.bounds[1][None] - o) * inv_d
    tn = jnp.max(jnp.minimum(ta, tb), axis=1)
    tf = jnp.min(jnp.maximum(ta, tb), axis=1)
    active = active & (tn <= tf) & (tf >= t_lo) & (tn <= t_hi)
    # No triangle lies beyond the ray's global-AABB exit: clamping each
    # ray's search window to it keeps rays that pass THROUGH the bounds but
    # miss the mesh from poisoning the tile's early-exit bound.
    t_hi = jnp.minimum(t_hi, tf * 1.0001 + 1e-3)
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        t_lo = jnp.pad(t_lo, (0, pad))
        t_hi = jnp.pad(t_hi, (0, pad))
        active = jnp.pad(active, (0, pad))

    # ``presort=False`` keeps the caller's lane order: tiles are 256
    # CONSECUTIVE lanes, and the whole binning infrastructure (key
    # compute, Pp-wide stable sort, 5 sorted gathers, the output unsort
    # scatter) drops out. Tiling shapes only the conservative cull lists
    # and the early-exit bound, so per-ray results are identical UP TO
    # packed-t ties: when two triangles in different clusters quantize to
    # the same 24-bit t (shared edges on cluster boundaries), the winner
    # follows the tile's near-to-far visit order — measured a handful of
    # boundary pixels at <1e-4 image delta. It pays when the population
    # is already spatially coherent AND its fixed sort cost rivals its
    # visit cost (e.g. point-light shadow rays: origins are image-ordered
    # primary hits, directions converge on the light).
    if presort:
        key = _sort_keys(o, d, active, mc.bounds)
        iota = jnp.arange(Pp, dtype=jnp.int32)
        _, sidx = jax.lax.sort([key, iota], num_keys=1, is_stable=True)
        # ONE packed (Pp, 8) row gather instead of five separate gathers:
        # per-ray gather cost is flat in row count, so multi-field fetches
        # pack into a single row (the round-2 #1 perf lever). ``active``
        # folds into the t_hi column's sign (active windows are strictly
        # positive: t_lo >= 0 and active requires tf >= t_lo, so
        # t_hi >= t_lo * 1.0001 + 1e-3 > 0).
        thi_m = jnp.where(active, t_hi, -1.0)
        rows8 = jnp.concatenate(
            [o, d, t_lo[:, None], thi_m[:, None]], axis=1)[sidx]
        o_s = rows8[:, 0:3]
        d_s = rows8[:, 3:6]
        tlo_s = rows8[:, 6]
        act_s = rows8[:, 7] >= 0.0
        thi_s = jnp.maximum(rows8[:, 7], 0.0)
    else:
        o_s, d_s, tlo_s, thi_s, act_s = o, d, t_lo, t_hi, active

    n_tiles = Pp // T
    o_t = o_s.reshape(n_tiles, T, 3)
    d_t = d_s.reshape(n_tiles, T, 3)
    act_t = act_s.reshape(n_tiles, T)
    thi_t = thi_s.reshape(n_tiles, T)

    ids, te_bits, lens = _tile_cull(o_t, d_t, act_t, thi_t,
                                    mc.cbmin, mc.cbmax)
    lists = jnp.stack([ids, te_bits], axis=1)          # (n_tiles, 2, Cp)

    # Ray blocks: (4, 3T) per tile = [o|1][d|0][lim] column groups.
    thi_eff = jnp.where(act_s, jnp.minimum(thi_s, jnp.float32(3.0e37)),
                        0.0)
    init_bits = jnp.where(
        act_s,
        jax.lax.bitcast_convert_type(thi_eff, jnp.int32) | kmask,
        jnp.int32(_NEG0_BITS))
    init_f = jax.lax.bitcast_convert_type(init_bits, jnp.float32)
    o4 = jnp.concatenate([o_s, jnp.ones((Pp, 1), jnp.float32)], axis=1)
    d4 = jnp.concatenate([d_s, jnp.zeros((Pp, 1), jnp.float32)], axis=1)
    lim = jnp.stack([init_f, tlo_s, jnp.zeros_like(tlo_s),
                     jnp.zeros_like(tlo_s)], axis=1)   # (Pp, 4)
    rays = jnp.concatenate([
        o4.reshape(n_tiles, T, 4),
        d4.reshape(n_tiles, T, 4),
        lim.reshape(n_tiles, T, 4),
    ], axis=1)                                         # (n_tiles, 3T, 4)
    rays = rays.transpose(2, 0, 1).reshape(4, n_tiles * 3 * T)

    out = _run_kernel(lens, lists, mc.gmat, rays, n_tiles,
                      interpret=interpret, any_hit=any_hit)

    # Recover the winning CLUSTER id from the kernel's (packed, base list
    # position) words while rays are still in tile order: entry offset =
    # packed_idx // kc, then one batched take_along_axis into the per-tile
    # candidate lists (the kernel itself cannot gather SMEM per lane).
    # any_hit consumers only need the hit BIT, so they skip the gather.
    jb_t = out[1].reshape(n_tiles, T)
    if any_hit:
        cid_s = jnp.where(jb_t >= 0, 0, -1)
    else:
        sub_t = (out[0].reshape(n_tiles, T) & kmask) // kc
        pos = jnp.clip(jb_t + sub_t, 0, lists.shape[2] - 1)
        cid_s = jnp.take_along_axis(lists[:, 0, :], pos, axis=1)
        cid_s = jnp.where(jb_t >= 0, cid_s, -1)
    words = jnp.stack([out[0], cid_s.reshape(-1)], axis=1)   # (Pp, 2)

    # Unsort the two winner words: ONE (Pp, 2) permutation scatter by sidx
    # (instead of building an inverse permutation + two gathers), then
    # resolve attributes in original ray order.
    if presort:
        res2 = jnp.zeros((Pp, 2), jnp.int32).at[sidx].set(
            words, unique_indices=True)
        packed = res2[:P, 0]
        cid = res2[:P, 1]
    else:
        packed = words[:P, 0]
        cid = words[:P, 1]

    hit = cid >= 0
    if any_hit:
        # Occlusion-only query: the caller consumes hit (and the winner's
        # material only to check opacity, which any-hit mode already
        # guarantees — scene.mesh_all_opaque). Skip the whole per-ray
        # tri_rows gather + exact Moller-Trumbore resolve: at shadow
        # population widths (P x L rays) the resolve gather costs more
        # than the traversal itself.
        t_approx = jax.lax.bitcast_convert_type(packed & ~kmask,
                                                jnp.float32)
        mat0 = mc.tri_rows[0, 12].astype(jnp.int32)
        z = jnp.zeros_like(t_approx)
        res = Hit(t=jnp.where(hit, t_approx, INF), n=-d[:P], u=z, v=z,
                  mat=jnp.where(hit, mat0, 0), hit=hit)
        if stats:
            return res, (out[2, ::T], out[3, ::T], lens)
        return res
    kk = packed & jnp.int32(kc - 1)   # triangle index WITHIN its cluster
    flat = jnp.where(hit, cid * kc + kk, 0)
    row = mc.tri_rows[flat]                            # THE per-ray gather
    a = row[:, 0:3]
    e1 = row[:, 3:6]
    e2 = row[:, 6:9]
    n = row[:, 9:12]
    mat = row[:, 12].astype(jnp.int32)

    # Exact single-triangle Moller-Trumbore recompute (full precision).
    o_r = o[:P]
    d_r = d[:P]
    h = jnp.cross(d_r, e2)
    det = jnp.sum(e1 * h, axis=1)
    inv_det = _safe_div(jnp.ones_like(det), det)
    s = o_r - a
    u = jnp.sum(s * h, axis=1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(d_r * q, axis=1) * inv_det
    t = jnp.sum(e2 * q, axis=1) * inv_det
    t_approx = jax.lax.bitcast_convert_type(packed & ~kmask,
                                            jnp.float32)
    ok = jnp.abs(det) >= 1e-12
    t = jnp.where(ok, t, t_approx)
    u = jnp.clip(jnp.where(ok, u, 0.0), 0.0, 1.0)
    v = jnp.clip(jnp.where(ok, v, 0.0), 0.0, 1.0)

    nd = jnp.sum(n * d_r, axis=1)
    n = jnp.where((nd < 0.0)[:, None], n, -n)
    res = Hit(t=jnp.where(hit, t, INF), n=n, u=u, v=v, mat=mat, hit=hit)
    if stats:
        # (visits, lens) per tile: visits = loop iterations actually run.
        return res, (out[2, ::T], out[3, ::T], lens)
    return res


def intersect_clusters(mc: MeshClusters, o, d, tmin, tmax,
                       interpret: bool = None, any_hit: bool = False,
                       presort: bool = True, tile: int = None) -> Hit:
    """Hit query over the cluster tables. o/d: (P, 3); tmin/tmax scalar
    or (P,). Matches intersect_mesh semantics (double-sided, normal flipped
    against the ray). ``interpret=None`` auto-selects the Pallas
    interpreter off-TPU (CPU CI). ``any_hit=True`` (valid only when every
    mesh material is opaque) returns SOME blocking hit per ray instead of
    the nearest: shadow transmittance zeroes on any opaque blocker, and
    fully shadowed tiles then exit after their first blocking cluster.
    ``presort=False`` skips ray binning and tiles the caller's lane order
    directly (bit-identical results; see _intersect_impl). ``tile``
    (default module TILE) sets rays-per-tile: narrower tiles shrink each
    visit's VPU epilogue ((kc, T) mask/min work) and shorten silhouette
    tiles' candidate lists at the cost of more per-tile preambles; cull
    cost is tile-invariant (fixed SUB_W-ray frusta). Must be a multiple
    of 128 (Mosaic lane alignment)."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    P = o.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))
    t_hi = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))
    return _intersect_impl(mc, o, d, t_lo, t_hi, interpret=interpret,
                           any_hit=any_hit, presort=presort, tile=tile)
