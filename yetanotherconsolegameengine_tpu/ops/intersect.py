"""Batched ray-primitive intersection over SoA scene tables.

The reference dispatches through virtual `Hittable.Hit` calls behind a BVH
(/root/reference/ConsoleGame/RayTracing/Objects/*). The TPU design is the
inverse: for each primitive *type* we test ALL rays against ALL table rows as
one dense broadcast on the VPU (pixels are the vector axis, primitives the
reduced axis), then merge the per-type winners. For the bundled scenes
(tens of primitives) this brute-force sweep beats any divergent traversal;
triangle meshes use ops/mesh_bvh.py instead.

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


def _reduce(tmat, mask):
    """(P, N) candidate distances + (N,) row mask -> best (t, idx, hit)."""
    tm = jnp.where(mask[None, :], tmat, INF)
    idx = jnp.argmin(tm, axis=1)
    t = jnp.take_along_axis(tm, idx[:, None], axis=1)[:, 0]
    return t, idx, t < INF


def _safe_div(num, den, eps=1e-12):
    s = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / s


# -- spheres ------------------------------------------------------------------

def intersect_spheres(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), o.shape[:1])[:, None]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), o.shape[:1])[:, None]
    oc = o[:, None, :] - tb.center[None]            # (P, N, 3)
    half_b = jnp.einsum("pnk,pk->pn", oc, d)
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

    tbest, j, hit = _reduce(t, tb.mask)
    ctr = tb.center[j]
    inv_r = 1.0 / jnp.maximum(tb.radius[j], 1e-20)
    p = o + tbest[:, None] * d
    n = (p - ctr) * inv_r[:, None]
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=tb.mat[j], hit=hit)


# -- axis-aligned boxes -------------------------------------------------------

def intersect_boxes(tb, o, d, tmin, tmax) -> Hit:
    """Slab test returning the same face/normal/UV the reference's
    6-rect Box produces (entry face, or exit face when the origin is inside;
    normal always flipped against the ray like the rects do)."""
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))[:, None]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))[:, None]
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
    axis = jnp.where(enter_ok, axis_in, axis_out)
    valid = enter_ok | exit_ok
    t = jnp.where(valid, t, INF)

    tbest, j, hit = _reduce(t, tb.mask)
    axis = jnp.take_along_axis(axis, j[:, None], axis=1)[:, 0]
    bmin, bmax = tb.bmin[j], tb.bmax[j]
    p = o + tbest[:, None] * d
    d_axis = jnp.take_along_axis(d, axis[:, None], axis=1)[:, 0]
    n = (jax.nn.one_hot(axis, 3, dtype=jnp.float32)
         * jnp.where(d_axis < 0, 1.0, -1.0)[:, None])
    # Face UV per Objects/Surfaces.cs: the two free axes in ascending order.
    fa = jnp.where(axis == 0, 1, 0)
    fb = jnp.where(axis == 2, 1, 2)
    pu = jnp.take_along_axis(p, fa[:, None], axis=1)[:, 0]
    pv = jnp.take_along_axis(p, fb[:, None], axis=1)[:, 0]
    u0 = jnp.take_along_axis(bmin, fa[:, None], axis=1)[:, 0]
    u1 = jnp.take_along_axis(bmax, fa[:, None], axis=1)[:, 0]
    v0 = jnp.take_along_axis(bmin, fb[:, None], axis=1)[:, 0]
    v1 = jnp.take_along_axis(bmax, fb[:, None], axis=1)[:, 0]
    u = _safe_div(pu - u0, u1 - u0)
    v = _safe_div(pv - v0, v1 - v0)
    return Hit(t=tbest, n=n, u=u, v=v, mat=tb.mat[j], hit=hit)


# -- axis-aligned rects -------------------------------------------------------

def intersect_rects(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))[:, None]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))[:, None]
    o_ax = jnp.take(o, tb.axis, axis=1)              # (P, N)
    d_ax = jnp.take(d, tb.axis, axis=1)
    ad = jnp.abs(d_ax)
    safe = jnp.where(ad < 1e-8, jnp.where(d_ax < 0, -1e-8, 1e-8), d_ax)
    t = (tb.k[None] - o_ax) / safe
    fa = jnp.where(tb.axis == 0, 1, 0)
    fb = jnp.where(tb.axis == 2, 1, 2)
    pu = jnp.take(o, fa, axis=1) + t * jnp.take(d, fa, axis=1)
    pv = jnp.take(o, fb, axis=1) + t * jnp.take(d, fb, axis=1)
    valid = ((ad >= 1e-8) & (t >= tmin) & (t <= tmax)
             & (pu >= tb.u0[None]) & (pu <= tb.u1[None])
             & (pv >= tb.v0[None]) & (pv <= tb.v1[None]))
    t = jnp.where(valid, t, INF)

    tbest, j, hit = _reduce(t, tb.mask)
    axis = tb.axis[j]
    d_axis = jnp.take_along_axis(d, axis[:, None], axis=1)[:, 0]
    n = (jax.nn.one_hot(axis, 3, dtype=jnp.float32)
         * jnp.where(d_axis < 0, 1.0, -1.0)[:, None])
    pu_b = jnp.take_along_axis(pu, j[:, None], axis=1)[:, 0]
    pv_b = jnp.take_along_axis(pv, j[:, None], axis=1)[:, 0]
    u = _safe_div(pu_b - tb.u0[j], tb.u1[j] - tb.u0[j])
    v = _safe_div(pv_b - tb.v0[j], tb.v1[j] - tb.v0[j])
    return Hit(t=tbest, n=n, u=u, v=v, mat=tb.mat[j], hit=hit)


# -- Y-axis cylinders ---------------------------------------------------------

def intersect_cylinders(tb, o, d, tmin, tmax) -> Hit:
    """Capped Y cylinders with the reference's root preference: the NEAR side
    root wins if in range, else the far root; caps override only when closer
    (BoundedObjects.cs:160-232)."""
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))[:, None]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))[:, None]
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

    tbest, j, hit = _reduce(t, tb.mask)
    px = o[:, 0] + tbest * d[:, 0]
    pz = o[:, 2] + tbest * d[:, 2]
    is_top = jnp.take_along_axis(top_ok & ~bot_ok, j[:, None], 1)[:, 0]
    is_bot = jnp.take_along_axis(bot_ok, j[:, None], 1)[:, 0]
    inv_r = 1.0 / jnp.maximum(tb.radius[j], 1e-20)
    n_side = jnp.stack([(px - tb.cx[j]) * inv_r,
                        jnp.zeros_like(px),
                        (pz - tb.cz[j]) * inv_r], axis=-1)
    n_top = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    n_bot = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    n = jnp.where(is_top[:, None], n_top,
                  jnp.where(is_bot[:, None], n_bot, n_side))
    flip = jnp.sum(n * d, axis=-1) >= 0.0
    n = jnp.where(flip[:, None], -n, n)
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=tb.mat[j], hit=hit)


# -- disks --------------------------------------------------------------------

def intersect_disks(tb, o, d, tmin, tmax) -> Hit:
    """NOTE: the radius test deliberately uses the XZ distance only, matching
    the reference quirk at Objects/Surfaces.cs:119-125 (its disks are always
    used facing +Y)."""
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))[:, None]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))[:, None]
    denom = jnp.einsum("nk,pk->pn", tb.normal, d)
    nd_c = jnp.sum(tb.normal * tb.center, axis=-1)
    no = jnp.einsum("nk,pk->pn", tb.normal, o)
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

    tbest, j, hit = _reduce(t, tb.mask)
    nrm = tb.normal[j]
    denom_b = jnp.sum(nrm * d, axis=-1)
    n = jnp.where((denom_b < 0)[:, None], nrm, -nrm)
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=tb.mat[j], hit=hit)


# -- infinite planes ----------------------------------------------------------

def intersect_planes(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))[:, None]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))[:, None]
    denom = jnp.einsum("nk,pk->pn", tb.normal, d)
    no = jnp.einsum("nk,pk->pn", tb.normal, o)
    t = _safe_div(tb.d[None] - no, denom)
    valid = (jnp.abs(denom) >= 1e-6) & (t >= tmin) & (t <= tmax)
    t = jnp.where(valid, t, INF)

    tbest, j, hit = _reduce(t, tb.mask)
    nrm = tb.normal[j]
    denom_b = jnp.sum(nrm * d, axis=-1)
    n = jnp.where((denom_b < 0)[:, None], nrm, -nrm)
    z = jnp.zeros_like(tbest)
    return Hit(t=tbest, n=n, u=z, v=z, mat=tb.mat[j], hit=hit)


# -- triangles ----------------------------------------------------------------

def moller_trumbore(a, e1, e2, o, d, tmin, tmax, eps_det=1e-8):
    """Double-sided Möller–Trumbore over (P, N) pairs.

    a/e1/e2: (N, 3); o/d: (P, 3); tmin/tmax broadcastable to (P, 1).
    Returns (t, u, v, valid) each (P, N); t = INF on miss.
    """
    h = jnp.cross(d[:, None, :], e2[None])           # (P, N, 3)
    det = jnp.einsum("nk,pnk->pn", e1, h)
    inv_det = _safe_div(jnp.ones_like(det), det)
    s = o[:, None, :] - a[None]
    u = jnp.einsum("pnk,pnk->pn", s, h) * inv_det
    q = jnp.cross(s, e1[None])
    v = jnp.einsum("pk,pnk->pn", d, q) * inv_det
    t = jnp.einsum("nk,pnk->pn", e2, q) * inv_det
    valid = ((jnp.abs(det) >= eps_det)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (t >= tmin) & (t <= tmax))
    return jnp.where(valid, t, INF), u, v, valid


def intersect_triangles(tb, o, d, tmin, tmax) -> Hit:
    if tb.mask.shape[0] == 0:
        return Hit.miss(o.shape[0])
    P = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (P,))[:, None]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (P,))[:, None]
    t, u, v, _ = moller_trumbore(tb.a, tb.e1, tb.e2, o, d, tmin, tmax)
    tbest, j, hit = _reduce(t, tb.mask)
    nrm = tb.n[j]
    nd = jnp.sum(nrm * d, axis=-1)
    n = jnp.where((nd < 0)[:, None], nrm, -nrm)
    ub = jnp.take_along_axis(u, j[:, None], axis=1)[:, 0]
    vb = jnp.take_along_axis(v, j[:, None], axis=1)[:, 0]
    return Hit(t=tbest, n=n, u=ub, v=vb, mat=tb.mat[j], hit=hit)


# -- whole scene --------------------------------------------------------------

def intersect_scene(scene, o, d, tmin, tmax) -> Hit:
    """Nearest hit across every primitive table (the TPU `Scene.Hit`,
    cf. Scenes/Scene.cs:71-75)."""
    h = Hit.miss(o.shape[0])
    h = merge(h, intersect_spheres(scene.spheres, o, d, tmin, tmax))
    h = merge(h, intersect_boxes(scene.boxes, o, d, tmin, tmax))
    h = merge(h, intersect_rects(scene.rects, o, d, tmin, tmax))
    h = merge(h, intersect_cylinders(scene.cylinders, o, d, tmin, tmax))
    h = merge(h, intersect_disks(scene.disks, o, d, tmin, tmax))
    h = merge(h, intersect_planes(scene.planes, o, d, tmin, tmax))
    h = merge(h, intersect_triangles(scene.triangles, o, d, tmin, tmax))
    if scene.mesh is not None:
        from .mesh_bvh import intersect_mesh
        h = merge(h, intersect_mesh(scene.mesh, o, d, tmin, tmax))
    if scene.voxels is not None:
        from .dda import intersect_voxels
        h = merge(h, intersect_voxels(scene.voxels, o, d, tmin, tmax))
    return h
