"""Batched ray-primitive intersection over SoA scene tables.

The reference dispatches through virtual `Hittable.Hit` calls behind a BVH
(/root/reference/ConsoleGame/RayTracing/Objects/*). The TPU design is the
inverse: for each primitive *type* we test ALL rays against ALL table rows as
one dense broadcast on the VPU (pixels are the vector axis, primitives the
reduced axis), then merge the per-type winners. For the bundled scenes
(tens of primitives) this brute-force sweep beats any divergent traversal;
triangle meshes use ops/mesh_bvh.py instead.

TPU performance note: per-ray index gathers cost ~5x the whole intersection
sweep on the VPU, so winner attributes are NEVER gathered. Each type builds
a one-hot "first minimum" select mask (P, N) and extracts winner rows with
a single (P, N) @ (N, K) matmul on the MXU (``_sel_rows``); per-candidate
quantities (UVs, face axes) reduce under the same mask. Zero gathers on the
brute-force path.

Intersection math matches the reference objects exactly:
  spheres       Objects/BoundedObjects.cs:31-69
  boxes         Objects/BoundedObjects.cs:99-115 (6 rects -> one slab test)
  cylinders     Objects/BoundedObjects.cs:148-247
  planes/disks/rects   Objects/Surfaces.cs
  triangles     Objects/Triangle.cs:130-176 (Möller–Trumbore, double-sided)

Every function takes rays ``o``, ``d`` of shape (P, 3) and scalar-or-(P,)
``tmin``/``tmax`` and returns a ``Hit`` with per-ray winner fields.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)

# All matmuls/einsums here contract over *coordinates*, not activations:
# TPU default matmul precision is bf16 multiplies, which corrupts hit
# distances / UV bounds tests (observed as wrong shadow occlusion). Force
# full f32 on the MXU.
_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    t: jax.Array     # (P,) hit distance; INF when miss
    n: jax.Array     # (P, 3) shading normal
    u: jax.Array     # (P,)
    v: jax.Array     # (P,)
    mat: jax.Array   # (P,) i32 material id
    hit: jax.Array   # (P,) bool

    @staticmethod
    def miss(p: int) -> "Hit":
        z = jnp.zeros((p,), jnp.float32)
        return Hit(t=jnp.full((p,), INF), n=jnp.zeros((p, 3), jnp.float32),
                   u=z, v=z, mat=jnp.zeros((p,), jnp.int32),
                   hit=jnp.zeros((p,), bool))


def merge(a: Hit, b: Hit) -> Hit:
    take_b = b.hit & (b.t < a.t)
    tb3 = take_b[:, None]
    return Hit(t=jnp.where(take_b, b.t, a.t),
               n=jnp.where(tb3, b.n, a.n),
               u=jnp.where(take_b, b.u, a.u),
               v=jnp.where(take_b, b.v, a.v),
               mat=jnp.where(take_b, b.mat, a.mat),
               hit=a.hit | b.hit)


def _safe_div(num, den, eps=1e-12):
    s = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / s


def _first_min(tm, row_mask):
    """(P, N) candidate distances (INF = miss) + (N,) row mask ->
    (tbest (P,), sel (P, N) one-hot f32, hit (P,))."""
    tm = jnp.where(row_mask[None, :], tm, INF)
    tbest = jnp.min(tm, axis=1)
    hit = tbest < INF
    is_min = (tm == tbest[:, None]) & (tm < INF)
    first = jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1
    sel = (is_min & first).astype(jnp.float32)
    return tbest, sel, hit


def _sel_rows(sel, rows):
    """Winner-row extraction: (P, N) one-hot @ (N, K) -> (P, K) on the MXU."""
    return jnp.matmul(sel, rows, precision=_HI)


def _sel_val(sel, pn):
    """Winner of a per-candidate (P, N) quantity -> (P,)."""
    return jnp.sum(sel * pn, axis=1)


def _sel_mat(sel, mat_rows):
    """Winner material id via the f32 one-hot (exact for ids < 2^24)."""
    return jnp.matmul(sel, mat_rows.astype(jnp.float32),
                      precision=_HI).astype(jnp.int32)


def _bc(tval, P):
    return jnp.broadcast_to(jnp.asarray(tval, jnp.float32), (P,))[:, None]


# -- spheres ------------------------------------------------------------------

def intersect_spheres(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = _bc(tmin, P)
    tmax = _bc(tmax, P)
    oc = o[:, None, :] - tb.center[None]            # (P, N, 3)
    half_b = jnp.einsum("pnk,pk->pn", oc, d, precision=_HI)
    c = jnp.sum(oc * oc, axis=-1) - tb.radius[None] ** 2
    disc = half_b * half_b - c                       # a == 1 (unit dirs)
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = -half_b - s
    t_far = -half_b + s
    near_ok = (t_near >= tmin) & (t_near <= tmax)
    far_ok = (t_far >= tmin) & (t_far <= tmax)
    t = jnp.where(near_ok, t_near, t_far)
    valid = (disc >= 0.0) & (near_ok | far_ok)
    t = jnp.where(valid, t, INF)

    tbest, sel, hit = _first_min(t, tb.mask)
    ctr = _sel_rows(sel, tb.center)
    inv_r = _sel_val(sel, jnp.broadcast_to(
        (1.0 / jnp.maximum(tb.radius, 1e-20))[None], t.shape))
    p = o + tbest[:, None] * d
    n = (p - ctr) * inv_r[:, None]
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=_sel_mat(sel, tb.mat), hit=hit)


# -- axis-aligned boxes -------------------------------------------------------

def intersect_boxes(tb, o, d, tmin, tmax) -> Hit:
    """Slab test returning the same face/normal/UV the reference's
    6-rect Box produces (entry face, or exit face when the origin is inside;
    normal always flipped against the ray like the rects do)."""
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = _bc(tmin, P)
    tmax = _bc(tmax, P)
    inv_d = _safe_div(jnp.ones_like(d), d)           # (P, 3)
    ta = (tb.bmin[None] - o[:, None, :]) * inv_d[:, None, :]   # (P, N, 3)
    tc = (tb.bmax[None] - o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.minimum(ta, tc)
    tf = jnp.maximum(ta, tc)
    t0 = jnp.max(tn, axis=-1)
    t1 = jnp.min(tf, axis=-1)
    axis_in = jnp.argmax(tn, axis=-1)                # entry face axis
    axis_out = jnp.argmin(tf, axis=-1)               # exit face axis
    enter_ok = (t0 <= t1) & (t0 >= tmin) & (t0 <= tmax)
    exit_ok = (t0 <= t1) & (t1 >= tmin) & (t1 <= tmax)
    t = jnp.where(enter_ok, t0, t1)
    axis = jnp.where(enter_ok, axis_in, axis_out)    # (P, N)
    valid = enter_ok | exit_ok
    t = jnp.where(valid, t, INF)

    tbest, sel, hit = _first_min(t, tb.mask)
    ax = _sel_val(sel, axis.astype(jnp.float32)).astype(jnp.int32)
    p = o + tbest[:, None] * d
    ax_oh = (ax[:, None] == jnp.arange(3)[None]).astype(jnp.float32)
    d_axis = jnp.sum(d * ax_oh, axis=1)
    n = ax_oh * jnp.where(d_axis < 0, 1.0, -1.0)[:, None]
    # Face UV per Objects/Surfaces.cs: the two free axes in ascending order.
    fa = jnp.where(ax == 0, 1, 0)
    fb = jnp.where(ax == 2, 1, 2)
    fa_oh = (fa[:, None] == jnp.arange(3)[None]).astype(jnp.float32)
    fb_oh = (fb[:, None] == jnp.arange(3)[None]).astype(jnp.float32)
    bmin_w = _sel_rows(sel, tb.bmin)
    bmax_w = _sel_rows(sel, tb.bmax)
    pu = jnp.sum(p * fa_oh, 1)
    pv = jnp.sum(p * fb_oh, 1)
    u0 = jnp.sum(bmin_w * fa_oh, 1)
    u1 = jnp.sum(bmax_w * fa_oh, 1)
    v0 = jnp.sum(bmin_w * fb_oh, 1)
    v1 = jnp.sum(bmax_w * fb_oh, 1)
    u = _safe_div(pu - u0, u1 - u0)
    v = _safe_div(pv - v0, v1 - v0)
    return Hit(t=tbest, n=n, u=u, v=v, mat=_sel_mat(sel, tb.mat), hit=hit)


# -- axis-aligned rects -------------------------------------------------------

def intersect_rects(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = _bc(tmin, P)
    tmax = _bc(tmax, P)
    # Per-row axis one-hots as (N, 3) matrices: o_ax = o @ axes^T etc. —
    # replaces the per-(P, N) index gathers with matmuls.
    ax_oh = (tb.axis[:, None] == jnp.arange(3)[None]).astype(jnp.float32)
    fa = jnp.where(tb.axis == 0, 1, 0)
    fb = jnp.where(tb.axis == 2, 1, 2)
    fa_oh = (fa[:, None] == jnp.arange(3)[None]).astype(jnp.float32)
    fb_oh = (fb[:, None] == jnp.arange(3)[None]).astype(jnp.float32)
    o_ax = jnp.matmul(o, ax_oh.T, precision=_HI)                               # (P, N)
    d_ax = jnp.matmul(d, ax_oh.T, precision=_HI)
    ad = jnp.abs(d_ax)
    safe = jnp.where(ad < 1e-8, jnp.where(d_ax < 0, -1e-8, 1e-8), d_ax)
    t = (tb.k[None] - o_ax) / safe
    pu = jnp.matmul(o, fa_oh.T, precision=_HI) + t * (jnp.matmul(d, fa_oh.T, precision=_HI))
    pv = jnp.matmul(o, fb_oh.T, precision=_HI) + t * (jnp.matmul(d, fb_oh.T, precision=_HI))
    valid = ((ad >= 1e-8) & (t >= tmin) & (t <= tmax)
             & (pu >= tb.u0[None]) & (pu <= tb.u1[None])
             & (pv >= tb.v0[None]) & (pv <= tb.v1[None]))
    t = jnp.where(valid, t, INF)

    tbest, sel, hit = _first_min(t, tb.mask)
    n_axis = _sel_rows(sel, ax_oh)                   # (P, 3) winner axis oh
    d_axis = jnp.sum(d * n_axis, axis=1)
    n = n_axis * jnp.where(d_axis < 0, 1.0, -1.0)[:, None]
    pu_b = _sel_val(sel, pu)
    pv_b = _sel_val(sel, pv)
    u0 = _sel_val(sel, jnp.broadcast_to(tb.u0[None], t.shape))
    u1 = _sel_val(sel, jnp.broadcast_to(tb.u1[None], t.shape))
    v0 = _sel_val(sel, jnp.broadcast_to(tb.v0[None], t.shape))
    v1 = _sel_val(sel, jnp.broadcast_to(tb.v1[None], t.shape))
    u = _safe_div(pu_b - u0, u1 - u0)
    v = _safe_div(pv_b - v0, v1 - v0)
    return Hit(t=tbest, n=n, u=u, v=v, mat=_sel_mat(sel, tb.mat), hit=hit)


# -- Y-axis cylinders ---------------------------------------------------------

def intersect_cylinders(tb, o, d, tmin, tmax) -> Hit:
    """Capped Y cylinders with the reference's root preference: the NEAR side
    root wins if in range, else the far root; caps override only when closer
    (BoundedObjects.cs:160-232)."""
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = _bc(tmin, P)
    tmax = _bc(tmax, P)
    ox = o[:, 0:1] - tb.cx[None]
    oy = o[:, 1:2]
    oz = o[:, 2:3] - tb.cz[None]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    r2 = (tb.radius ** 2)[None]

    a = dx * dx + dz * dz
    half_b = ox * dx + oz * dz
    c = ox * ox + oz * oz - r2
    disc = half_b * half_b - a * c
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = _safe_div(jnp.ones_like(a), a)
    quad_ok = (a > 1e-12) & (disc >= 0.0)

    def side_valid(t):
        y = oy + t * dy
        return (quad_ok & (t > tmin) & (t < tmax)
                & (y >= tb.ymin[None]) & (y <= tb.ymax[None]))

    t1 = (-half_b - s) * inv_a
    t2 = (-half_b + s) * inv_a
    v1 = side_valid(t1)
    v2 = side_valid(t2) & ~v1
    t_side = jnp.where(v1, t1, jnp.where(v2, t2, INF))
    side_hit = v1 | v2

    cap_possible = tb.capped[None] & (jnp.abs(dy) > 1e-8)

    def cap(ky, t_cur):
        t = _safe_div(ky[None] - oy, dy)
        rx = ox + t * dx
        rz = oz + t * dz
        ok = (cap_possible & (t > tmin) & (t < tmax)
              & (rx * rx + rz * rz <= r2) & (t < t_cur))
        return jnp.where(ok, t, t_cur), ok

    t_cur = t_side
    t_cur, top_ok = cap(tb.ymax, t_cur)
    t_cur, bot_ok = cap(tb.ymin, t_cur)
    valid = side_hit | top_ok | bot_ok
    t = jnp.where(valid, t_cur, INF)

    tbest, sel, hit = _first_min(t, tb.mask)
    px = o[:, 0] + tbest * d[:, 0]
    pz = o[:, 2] + tbest * d[:, 2]
    is_top = _sel_val(sel, (top_ok & ~bot_ok).astype(jnp.float32)) > 0.5
    is_bot = _sel_val(sel, bot_ok.astype(jnp.float32)) > 0.5
    cx_w = _sel_val(sel, jnp.broadcast_to(tb.cx[None], t.shape))
    cz_w = _sel_val(sel, jnp.broadcast_to(tb.cz[None], t.shape))
    inv_r = _sel_val(sel, jnp.broadcast_to(
        (1.0 / jnp.maximum(tb.radius, 1e-20))[None], t.shape))
    n_side = jnp.stack([(px - cx_w) * inv_r,
                        jnp.zeros_like(px),
                        (pz - cz_w) * inv_r], axis=-1)
    n_top = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    n_bot = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    n = jnp.where(is_top[:, None], n_top,
                  jnp.where(is_bot[:, None], n_bot, n_side))
    flip = jnp.sum(n * d, axis=-1) >= 0.0
    n = jnp.where(flip[:, None], -n, n)
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=_sel_mat(sel, tb.mat), hit=hit)


# -- disks --------------------------------------------------------------------

def intersect_disks(tb, o, d, tmin, tmax) -> Hit:
    """NOTE: the radius test deliberately uses the XZ distance only, matching
    the reference quirk at Objects/Surfaces.cs:119-125 (its disks are always
    used facing +Y)."""
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = _bc(tmin, P)
    tmax = _bc(tmax, P)
    denom = jnp.matmul(d, tb.normal.T, precision=_HI)                          # (P, N)
    nd_c = jnp.sum(tb.normal * tb.center, axis=-1)
    no = jnp.matmul(o, tb.normal.T, precision=_HI)
    adenom = jnp.abs(denom)
    safe = jnp.where(adenom < 1e-8, jnp.where(denom < 0, -1e-8, 1e-8), denom)
    t = (nd_c[None] - no) / safe
    px = o[:, 0:1] + t * d[:, 0:1]
    pz = o[:, 2:3] + t * d[:, 2:3]
    dx = px - tb.center[None, :, 0]
    dz = pz - tb.center[None, :, 2]
    rr = dx * dx + dz * dz
    valid = (adenom >= 1e-6) & (t >= tmin) & (t <= tmax) & (rr <= (tb.radius ** 2)[None])
    t = jnp.where(valid, t, INF)

    tbest, sel, hit = _first_min(t, tb.mask)
    nrm = _sel_rows(sel, tb.normal)
    denom_b = jnp.sum(nrm * d, axis=-1)
    n = jnp.where((denom_b < 0)[:, None], nrm, -nrm)
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=_sel_mat(sel, tb.mat), hit=hit)


# -- infinite planes ----------------------------------------------------------

def intersect_planes(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = _bc(tmin, P)
    tmax = _bc(tmax, P)
    denom = jnp.matmul(d, tb.normal.T, precision=_HI)
    no = jnp.matmul(o, tb.normal.T, precision=_HI)
    t = _safe_div(tb.d[None] - no, denom)
    valid = (jnp.abs(denom) >= 1e-6) & (t >= tmin) & (t <= tmax)
    t = jnp.where(valid, t, INF)

    tbest, sel, hit = _first_min(t, tb.mask)
    nrm = _sel_rows(sel, tb.normal)
    denom_b = jnp.sum(nrm * d, axis=-1)
    n = jnp.where((denom_b < 0)[:, None], nrm, -nrm)
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=_sel_mat(sel, tb.mat), hit=hit)


# -- triangles ----------------------------------------------------------------

def moller_trumbore(a, e1, e2, o, d, tmin, tmax, eps_det=1e-8):
    """Double-sided Möller–Trumbore over (P, N) pairs.

    a/e1/e2: (N, 3); o/d: (P, 3); tmin/tmax broadcastable to (P, 1).
    Returns (t, u, v, valid) each (P, N); t = INF on miss.
    """
    h = jnp.cross(d[:, None, :], e2[None])           # (P, N, 3)
    det = jnp.einsum("nk,pnk->pn", e1, h, precision=_HI)
    inv_det = _safe_div(jnp.ones_like(det), det)
    s = o[:, None, :] - a[None]
    u = jnp.einsum("pnk,pnk->pn", s, h, precision=_HI) * inv_det
    q = jnp.cross(s, e1[None])
    v = jnp.einsum("pk,pnk->pn", d, q, precision=_HI) * inv_det
    t = jnp.einsum("nk,pnk->pn", e2, q, precision=_HI) * inv_det
    valid = ((jnp.abs(det) >= eps_det)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (t >= tmin) & (t <= tmax))
    return jnp.where(valid, t, INF), u, v, valid


def intersect_triangles(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = _bc(tmin, P)
    tmax = _bc(tmax, P)
    t, u, v, _ = moller_trumbore(tb.a, tb.e1, tb.e2, o, d, tmin, tmax)
    tbest, sel, hit = _first_min(t, tb.mask)
    nrm = _sel_rows(sel, tb.n)
    nd = jnp.sum(nrm * d, axis=-1)
    n = jnp.where((nd < 0)[:, None], nrm, -nrm)
    ub = _sel_val(sel, u)
    vb = _sel_val(sel, v)
    return Hit(t=tbest, n=n, u=ub, v=vb, mat=_sel_mat(sel, tb.mat), hit=hit)


# -- whole scene --------------------------------------------------------------

def intersect_scene(scene, o, d, tmin, tmax, shadow: bool = False,
                    lod: bool = False, fine: bool = False,
                    presort: bool = True) -> Hit:
    """Nearest hit across every primitive table (the TPU `Scene.Hit`,
    cf. Scenes/Scene.cs:71-75).

    The cheap dense tables run FIRST and their running best-t feeds the
    mesh/voxel traversals as a per-ray tmax: a ray already stopped by the
    floor clips its BVH/cluster/DDA march at that depth — the biggest
    single lever for rays that miss the hero geometry.

    ``shadow=True`` marks an occlusion query: when every mesh material is
    opaque (scene.mesh_all_opaque) — or when the scene uses BINARY
    shadows, where ANY intersection occludes regardless of material —
    the cluster traversal may return ANY blocking hit instead of the
    nearest: transmittance zeroes on any blocker, transparent primitives
    in OTHER tables still win the nearest-t merge, and fully shadowed
    tiles exit after their first blocking cluster (measured +2-3% whole-
    frame on bunny/dragon; load-bearing for the streamed island's sun
    sweeps where terrain rays graze many clusters).

    ``lod=True`` marks a SECONDARY population (shadow or bounce rays):
    when the scene carries a low-poly proxy cluster set
    (scene.mesh_clusters_lod, built by scene/lod.py for big meshes), the
    mesh sweep traces it instead of the full set, with tmin clamped past
    the proxy's surface-deviation bias so origins on the full surface
    never self-shadow against the displaced proxy skin.

    ``fine=True`` marks the PRIMARY population of an ultra-dense hero
    mesh: trace the sub-pixel-faithful fine proxy
    (scene.mesh_clusters_fine) when the scene ships one.

    ``presort=False`` skips the cluster sweep's ray-binning sort and
    tiles the caller's lane order directly (bit-identical results; for
    populations already coherent in lane order — see RenderConfig
    presort_primary / presort_shadow)."""
    h = Hit.miss(o.shape[0])
    h = merge(h, intersect_spheres(scene.spheres, o, d, tmin, tmax))
    h = merge(h, intersect_boxes(scene.boxes, o, d, tmin, tmax))
    h = merge(h, intersect_rects(scene.rects, o, d, tmin, tmax))
    h = merge(h, intersect_cylinders(scene.cylinders, o, d, tmin, tmax))
    h = merge(h, intersect_disks(scene.disks, o, d, tmin, tmax))
    h = merge(h, intersect_planes(scene.planes, o, d, tmin, tmax))
    h = merge(h, intersect_triangles(scene.triangles, o, d, tmin, tmax))
    t_clip = jnp.minimum(jnp.broadcast_to(tmax, h.t.shape), h.t + 1e-3)
    if scene.mesh is not None:
        from .mesh_bvh import intersect_mesh
        h = merge(h, intersect_mesh(scene.mesh, o, d, tmin, t_clip))
    if scene.mesh_clusters is not None:
        from .mesh_clusters import intersect_clusters
        mc = scene.mesh_clusters
        lod_set = getattr(scene, "mesh_clusters_lod", None)
        fine_set = getattr(scene, "mesh_clusters_fine", None)
        shadow_set = getattr(scene, "mesh_clusters_shadow", None)
        mc_tmin = tmin
        if lod and shadow and shadow_set is not None:
            # Occlusion-only query against the extra-coarse shadow proxy
            # (tables.py SHADOW_LOD_TARGET_TRIS): shadow-test work scales
            # with the proxy's triangle count and occlusion tolerates the
            # simplification.
            mc = shadow_set
            mc_tmin = jnp.maximum(jnp.asarray(tmin, jnp.float32),
                                  jnp.float32(mc.t_bias))
        elif lod and lod_set is not None:
            mc = lod_set
            mc_tmin = jnp.maximum(jnp.asarray(tmin, jnp.float32),
                                  jnp.float32(mc.t_bias))
        elif fine and fine_set is not None:
            mc = fine_set
        h = merge(h, intersect_clusters(
            mc, o, d, mc_tmin, t_clip,
            any_hit=bool(shadow and (scene.mesh_all_opaque
                                     or scene.binary_shadows)),
            presort=presort))
    if scene.voxels is not None:
        from .dda import intersect_voxels
        t_clip = jnp.minimum(t_clip, h.t + 1e-3)
        h = merge(h, intersect_voxels(scene.voxels, o, d, tmin, t_clip))
    return h
