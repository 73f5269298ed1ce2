"""Pallas path-tracing megakernel for primitive-table scenes.

The XLA wavefront (ops/trace.py) pays per-op dispatch and HBM round-trips
for every one of the ~60 ops x ~8 rounds of the trace loop. This kernel
runs the ENTIRE per-pixel path trace — primary + mirror/refraction stack +
shadow rays + Oren-Nayar shading — inside one ``pallas_call``: the pixel
grid is tiled into (TILE_R, 128) f32 blocks, all scene tables live whole
in VMEM (bundled scenes are tens of rows), and every per-primitive /
per-material / per-light loop is a *statically unrolled* Python loop whose
row parameters are SMEM scalar reads broadcast against the tile — zero
gathers, zero HBM traffic between rounds, VPU-shaped (8,128) math
throughout (pallas_guide.md: TPU Architecture / Tiling Constraints).

Semantics match ops/trace.py (and therefore the reference's TraceFull,
/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:448-620) for
scenes whose geometry fits the primitive tables; scenes with mesh BVHs or
voxel worlds keep the XLA path (render/renderer.py chooses per scene).

Limits: primitive rows + lights + materials must fit the unroll budget
(MAX_UNROLL rows total) to bound compile time; larger scenes fall back.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.tables import SceneData

LANES = 128
TILE_R = 32            # rows per tile -> (32, 128) = 4096 pixels/program
# Kernel-side path stack depth. The reference's 16 slots are generous
# (RaytraceRenderer.cs:450): a refraction event pushes reflect+refract and
# then pops one, a net +1 per nesting level, and nesting is capped by
# max_mirror_bounces — so the worst-case stack depth is
# max_mirror_bounces + 1 (= 3 at the default caps). 8 slots halve the
# VMEM-resident stack + push/pop select cost vs 16 with zero semantic
# loss; configs whose worst case exceeds this fall back to the XLA path
# (see kernel_stack_sufficient / renderer._host_scene) instead of
# silently truncating.
KERNEL_STACK = 8


def kernel_stack_sufficient(hs: "_HostScene", cfg: RenderConfig) -> bool:
    """True when the megakernel's stack provably cannot overflow for this
    scene + config (opaque scenes never push at all)."""
    if not scene_has_transparency(hs):
        return True
    return cfg.max_mirror_bounces + 1 <= min(KERNEL_STACK,
                                             cfg.path_stack_size)
INF = 3.0e38
_EPS = 1e-4

# Unroll budget: primitives x (bounce rounds) must stay compile-friendly.
# 160 admits the 100-random-spheres demo scene (~30 s Mosaic compile).
MAX_UNROLL = 160


def scene_fits(scene: SceneData) -> bool:
    """Can this scene run in the megakernel?"""
    if (scene.mesh is not None or scene.mesh_clusters is not None
            or scene.voxels is not None):
        return False
    if scene.textures is not None:
        return False
    n = (scene.spheres.mask.shape[0] + scene.boxes.mask.shape[0]
         + scene.rects.mask.shape[0] + scene.cylinders.mask.shape[0]
         + scene.disks.mask.shape[0] + scene.planes.mask.shape[0]
         + scene.triangles.mask.shape[0])
    return n <= MAX_UNROLL and scene.materials.albedo.shape[0] <= MAX_UNROLL \
        and scene.lights.mask.shape[0] <= 8


@dataclasses.dataclass(frozen=True)
class _HostScene:
    """Host-side numpy snapshot of the scene tables for unrolling.

    Row parameters become Python floats baked into the kernel as
    immediates — the scene is a compile-time constant of the kernel,
    which is exactly the recompile-per-scene tradeoff the SURVEY's build
    plan accepts ("recompile per scene is fine — 16 scenes")."""

    spheres: tuple
    boxes: tuple
    rects: tuple
    cylinders: tuple
    disks: tuple
    planes: tuple
    triangles: tuple
    materials: tuple
    lights: tuple
    ambient: tuple
    bg_top: tuple
    bg_bottom: tuple
    binary_shadows: bool


def snapshot_scene(scene: SceneData) -> _HostScene:
    g = lambda a: np.asarray(a)

    def rows(tb, fields):
        mask = g(tb.mask)
        out = []
        for i in range(mask.shape[0]):
            if not mask[i]:
                continue
            out.append(tuple(
                tuple(float(v) for v in g(getattr(tb, f))[i])
                if g(getattr(tb, f)).ndim == 2
                else (int(g(getattr(tb, f))[i])
                      if g(getattr(tb, f)).dtype.kind in "iub"
                      else float(g(getattr(tb, f))[i]))
                for f in fields))
        return tuple(out)

    m = scene.materials
    mats = tuple(
        (tuple(float(v) for v in g(m.albedo)[i]),
         float(g(m.specular)[i]), float(g(m.reflectivity)[i]),
         tuple(float(v) for v in g(m.emission)[i]),
         float(g(m.transparency)[i]), float(g(m.ior)[i]),
         tuple(float(v) for v in g(m.transmission)[i]),
         int(g(m.proc)[i]),
         tuple(float(v) for v in g(m.albedo2)[i]),
         float(g(m.proc_scale)[i]))
        for i in range(g(m.albedo).shape[0]))

    return _HostScene(
        spheres=rows(scene.spheres, ("center", "radius", "mat")),
        boxes=rows(scene.boxes, ("bmin", "bmax", "mat")),
        rects=rows(scene.rects, ("axis", "k", "u0", "u1", "v0", "v1", "mat")),
        cylinders=rows(scene.cylinders,
                       ("cx", "cz", "radius", "ymin", "ymax", "capped",
                        "mat")),
        disks=rows(scene.disks, ("center", "normal", "radius", "mat")),
        planes=rows(scene.planes, ("normal", "d", "mat")),
        triangles=rows(scene.triangles, ("a", "e1", "e2", "n", "mat")),
        materials=mats,
        lights=rows(scene.lights, ("pos", "color", "intensity")),
        ambient=(tuple(float(v) for v in g(scene.ambient_color)),
                 float(g(scene.ambient_intensity))),
        bg_top=tuple(float(v) for v in g(scene.bg_top)),
        bg_bottom=tuple(float(v) for v in g(scene.bg_bottom)),
        binary_shadows=scene.binary_shadows,
    )


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _intersect_all(hs: _HostScene, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Unrolled nearest-hit over every primitive row.

    Returns (t, nx, ny, nz, u, v, mat_f) as (TILE_R, LANES) blocks; the
    normal is the geometric normal flipped against the ray; mat_f is the
    material id as f32 (exact for small ids)."""
    shape = ox.shape
    t_best = jnp.full(shape, INF, jnp.float32)
    nx = jnp.zeros(shape, jnp.float32)
    ny = jnp.zeros(shape, jnp.float32)
    nz = jnp.zeros(shape, jnp.float32)
    uu = jnp.zeros(shape, jnp.float32)
    vv = jnp.zeros(shape, jnp.float32)
    mat = jnp.zeros(shape, jnp.float32)

    def consider(tc, valid, nxx, nyy, nzz, uc, vc, mid):
        nonlocal t_best, nx, ny, nz, uu, vv, mat
        better = valid & (tc < t_best) & (tc >= tmin) & (tc <= tmax)
        t_best = jnp.where(better, tc, t_best)
        nx = jnp.where(better, nxx, nx)
        ny = jnp.where(better, nyy, ny)
        nz = jnp.where(better, nzz, nz)
        uu = jnp.where(better, uc, uu)
        vv = jnp.where(better, vc, vv)
        mat = jnp.where(better, jnp.float32(mid), mat)

    zero = jnp.zeros(shape, jnp.float32)

    for (c, r, mid) in hs.spheres:
        # BoundedObjects.cs:31-69 (near root preferred, else far).
        ocx, ocy, ocz = ox - c[0], oy - c[1], oz - c[2]
        half_b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - cc
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -half_b - s
        t_far = -half_b + s
        near_ok = (t_near >= tmin) & (t_near <= tmax)
        tc = jnp.where(near_ok, t_near, t_far)
        valid = disc >= 0.0
        inv_r = 1.0 / max(r, 1e-20)
        px = ox + tc * dx
        py = oy + tc * dy
        pz = oz + tc * dz
        consider(tc, valid, (px - c[0]) * inv_r, (py - c[1]) * inv_r,
                 (pz - c[2]) * inv_r, zero, zero, mid)

    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-12,
                             jnp.where(dx < 0, -1e-12, 1e-12), dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-12,
                             jnp.where(dy < 0, -1e-12, 1e-12), dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-12,
                             jnp.where(dz < 0, -1e-12, 1e-12), dz)

    for (bmin, bmax, mid) in hs.boxes:
        # Slab test; entry face else exit face (BoundedObjects.cs:99-115).
        tax = (bmin[0] - ox) * inv_dx
        tbx = (bmax[0] - ox) * inv_dx
        tay = (bmin[1] - oy) * inv_dy
        tby = (bmax[1] - oy) * inv_dy
        taz = (bmin[2] - oz) * inv_dz
        tbz = (bmax[2] - oz) * inv_dz
        tnx = jnp.minimum(tax, tbx)
        tfx = jnp.maximum(tax, tbx)
        tny = jnp.minimum(tay, tby)
        tfy = jnp.maximum(tay, tby)
        tnz = jnp.minimum(taz, tbz)
        tfz = jnp.maximum(taz, tbz)
        t0 = jnp.maximum(tnx, jnp.maximum(tny, tnz))
        t1 = jnp.minimum(tfx, jnp.minimum(tfy, tfz))
        enter_ok = (t0 <= t1) & (t0 >= tmin) & (t0 <= tmax)
        tc = jnp.where(enter_ok, t0, t1)
        valid = (t0 <= t1)
        # Face axis: which slab produced the chosen t.
        use_n = enter_ok
        # No bool-valued where (Mosaic can't select i8 vectors): pure i1 logic.
        ax_x = (use_n & (t0 == tnx)) | (~use_n & (t1 == tfx))
        ax_y = ((use_n & (t0 == tny)) | (~use_n & (t1 == tfy))) & ~ax_x
        ax_z = ~ax_x & ~ax_y
        sx = jnp.where(dx < 0, 1.0, -1.0)
        sy = jnp.where(dy < 0, 1.0, -1.0)
        sz = jnp.where(dz < 0, 1.0, -1.0)
        nxx = jnp.where(ax_x, sx, 0.0)
        nyy = jnp.where(ax_y, sy, 0.0)
        nzz = jnp.where(ax_z, sz, 0.0)
        px = ox + tc * dx
        py = oy + tc * dy
        pz = oz + tc * dz
        ex = max(bmax[0] - bmin[0], 1e-9)
        ey = max(bmax[1] - bmin[1], 1e-9)
        ez = max(bmax[2] - bmin[2], 1e-9)
        ux = (px - bmin[0]) / ex
        uy = (py - bmin[1]) / ey
        uz = (pz - bmin[2]) / ez
        uc = jnp.where(ax_x, uy, ux)
        vc = jnp.where(ax_z, uy, uz)
        consider(tc, valid, nxx, nyy, nzz, uc, vc, mid)

    for (axis, k, u0, u1, v0, v1, mid) in hs.rects:
        # Surfaces.cs:145-359; axis = fixed coord, (u, v) ascending free axes.
        o_ax = (ox, oy, oz)[axis]
        d_ax = (dx, dy, dz)[axis]
        inv = (inv_dx, inv_dy, inv_dz)[axis]
        tc = (k - o_ax) * inv
        fa = 1 if axis == 0 else 0
        fb = 1 if axis == 2 else 2
        pu = (ox, oy, oz)[fa] + tc * (dx, dy, dz)[fa]
        pv = (ox, oy, oz)[fb] + tc * (dx, dy, dz)[fb]
        valid = ((jnp.abs(d_ax) >= 1e-8)
                 & (pu >= u0) & (pu <= u1) & (pv >= v0) & (pv <= v1))
        sgn = jnp.where(d_ax < 0, 1.0, -1.0)
        nxx = sgn if axis == 0 else zero
        nyy = sgn if axis == 1 else zero
        nzz = sgn if axis == 2 else zero
        uc = (pu - u0) / max(u1 - u0, 1e-9)
        vc = (pv - v0) / max(v1 - v0, 1e-9)
        consider(tc, valid, nxx, nyy, nzz, uc, vc, mid)

    for (cx, cz, r, ymin, ymax, capped, mid) in hs.cylinders:
        # BoundedObjects.cs:148-247.
        ocx = ox - cx
        ocz = oz - cz
        a = dx * dx + dz * dz
        half_b = ocx * dx + ocz * dz
        cc = ocx * ocx + ocz * ocz - r * r
        disc = half_b * half_b - a * cc
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_a = 1.0 / jnp.maximum(a, 1e-12)
        quad_ok = (a > 1e-12) & (disc >= 0.0)
        t1c = (-half_b - s) * inv_a
        t2c = (-half_b + s) * inv_a

        def side_ok(tc):
            y = oy + tc * dy
            return quad_ok & (tc > tmin) & (tc < tmax) \
                & (y >= ymin) & (y <= ymax)

        v1 = side_ok(t1c)
        v2 = side_ok(t2c) & ~v1
        t_side = jnp.where(v1, t1c, jnp.where(v2, t2c, INF))
        hit_side = v1 | v2
        t_cur = t_side
        false_m = quad_ok & ~quad_ok  # bool false without an i8 constant
        is_top = false_m
        is_bot = false_m
        if capped:
            for (ky, is_t) in ((ymax, True), (ymin, False)):
                tc = (ky - oy) * inv_dy
                rx = ocx + tc * dx
                rz = ocz + tc * dz
                ok = ((jnp.abs(dy) > 1e-8) & (tc > tmin) & (tc < tmax)
                      & (rx * rx + rz * rz <= r * r) & (tc < t_cur))
                t_cur = jnp.where(ok, tc, t_cur)
                if is_t:
                    is_top = ok
                else:
                    is_bot = ok
                    is_top = is_top & ~ok
        valid = hit_side | is_top | is_bot
        px = ox + t_cur * dx
        pz2 = oz + t_cur * dz
        inv_r = 1.0 / max(r, 1e-20)
        nxx = jnp.where(is_top | is_bot, 0.0, (px - cx) * inv_r)
        nyy = jnp.where(is_top, 1.0, jnp.where(is_bot, -1.0, 0.0))
        nzz = jnp.where(is_top | is_bot, 0.0, (pz2 - cz) * inv_r)
        flip = (nxx * dx + nyy * dy + nzz * dz) >= 0.0
        consider(t_cur, valid,
                 jnp.where(flip, -nxx, nxx), jnp.where(flip, -nyy, nyy),
                 jnp.where(flip, -nzz, nzz), zero, zero, mid)

    for (c, n, r, mid) in hs.disks:
        # Surfaces.cs:119-125 (XZ-distance radius quirk preserved).
        denom = n[0] * dx + n[1] * dy + n[2] * dz
        nd_c = n[0] * c[0] + n[1] * c[1] + n[2] * c[2]
        no = n[0] * ox + n[1] * oy + n[2] * oz
        safe = jnp.where(jnp.abs(denom) < 1e-8,
                         jnp.where(denom < 0, -1e-8, 1e-8), denom)
        tc = (nd_c - no) / safe
        px = ox + tc * dx
        pz2 = oz + tc * dz
        rr = (px - c[0]) ** 2 + (pz2 - c[2]) ** 2
        valid = (jnp.abs(denom) >= 1e-6) & (rr <= r * r)
        flip = denom >= 0.0
        consider(tc, valid,
                 jnp.where(flip, -n[0], n[0]), jnp.where(flip, -n[1], n[1]),
                 jnp.where(flip, -n[2], n[2]), zero, zero, mid)

    for (n, dd, mid) in hs.planes:
        denom = n[0] * dx + n[1] * dy + n[2] * dz
        no = n[0] * ox + n[1] * oy + n[2] * oz
        safe = jnp.where(jnp.abs(denom) < 1e-12,
                         jnp.where(denom < 0, -1e-12, 1e-12), denom)
        tc = (dd - no) / safe
        valid = jnp.abs(denom) >= 1e-6
        flip = denom >= 0.0
        consider(tc, valid,
                 jnp.where(flip, -n[0], n[0]), jnp.where(flip, -n[1], n[1]),
                 jnp.where(flip, -n[2], n[2]), zero, zero, mid)

    for (a, e1, e2, n, mid) in hs.triangles:
        # Double-sided Moller-Trumbore (Triangle.cs:130-176).
        hx = dy * e2[2] - dz * e2[1]
        hy = dz * e2[0] - dx * e2[2]
        hz = dx * e2[1] - dy * e2[0]
        det = e1[0] * hx + e1[1] * hy + e1[2] * hz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12,
                                  jnp.where(det < 0, -1e-12, 1e-12), det)
        sx = ox - a[0]
        sy = oy - a[1]
        sz = oz - a[2]
        uc = (sx * hx + sy * hy + sz * hz) * inv_det
        qx = sy * e1[2] - sz * e1[1]
        qy = sz * e1[0] - sx * e1[2]
        qz = sx * e1[1] - sy * e1[0]
        vc = (dx * qx + dy * qy + dz * qz) * inv_det
        tc = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        valid = ((jnp.abs(det) >= 1e-8) & (uc >= 0.0) & (uc <= 1.0)
                 & (vc >= 0.0) & (uc + vc <= 1.0))
        nd = n[0] * dx + n[1] * dy + n[2] * dz
        flip = nd >= 0.0
        consider(tc, valid,
                 jnp.where(flip, -n[0], n[0]), jnp.where(flip, -n[1], n[1]),
                 jnp.where(flip, -n[2], n[2]), uc, vc, mid)

    hit = t_best < INF
    return t_best, nx, ny, nz, uu, vv, mat, hit


def _used_material_ids(hs: _HostScene):
    ids = set()
    for rows in (hs.spheres, hs.boxes, hs.rects, hs.cylinders, hs.disks,
                 hs.planes, hs.triangles):
        for row in rows:
            ids.add(int(row[-1]))
    return ids


def scene_has_transparency(hs: _HostScene) -> bool:
    return any(hs.materials[mid][4] > 0.0 for mid in _used_material_ids(hs))


def _any_hit(hs: _HostScene, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Occlusion-only sweep: ~40% cheaper than _intersect_all (no winner
    normals/UVs/materials). Valid when every material is opaque."""
    hit = ox > INF  # i1-typed false (no i8 bool constant for Mosaic)

    def consider(tc, valid):
        nonlocal hit
        hit = hit | (valid & (tc >= tmin) & (tc <= tmax))

    for (c, r, mid) in hs.spheres:
        ocx, ocy, ocz = ox - c[0], oy - c[1], oz - c[2]
        half_b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - cc
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -half_b - s
        t_far = -half_b + s
        near_ok = (t_near >= tmin) & (t_near <= tmax)
        consider(jnp.where(near_ok, t_near, t_far), disc >= 0.0)

    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-12,
                             jnp.where(dx < 0, -1e-12, 1e-12), dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-12,
                             jnp.where(dy < 0, -1e-12, 1e-12), dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-12,
                             jnp.where(dz < 0, -1e-12, 1e-12), dz)

    for (bmin, bmax, mid) in hs.boxes:
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum((bmin[0] - ox) * inv_dx,
                                    (bmax[0] - ox) * inv_dx),
                        jnp.minimum((bmin[1] - oy) * inv_dy,
                                    (bmax[1] - oy) * inv_dy)),
            jnp.minimum((bmin[2] - oz) * inv_dz, (bmax[2] - oz) * inv_dz))
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum((bmin[0] - ox) * inv_dx,
                                    (bmax[0] - ox) * inv_dx),
                        jnp.maximum((bmin[1] - oy) * inv_dy,
                                    (bmax[1] - oy) * inv_dy)),
            jnp.maximum((bmin[2] - oz) * inv_dz, (bmax[2] - oz) * inv_dz))
        enter_ok = (t0 <= t1) & (t0 >= tmin) & (t0 <= tmax)
        consider(jnp.where(enter_ok, t0, t1), t0 <= t1)

    for (axis, k, u0, u1, v0, v1, mid) in hs.rects:
        o_ax = (ox, oy, oz)[axis]
        d_ax = (dx, dy, dz)[axis]
        inv = (inv_dx, inv_dy, inv_dz)[axis]
        tc = (k - o_ax) * inv
        fa = 1 if axis == 0 else 0
        fb = 1 if axis == 2 else 2
        pu = (ox, oy, oz)[fa] + tc * (dx, dy, dz)[fa]
        pv = (ox, oy, oz)[fb] + tc * (dx, dy, dz)[fb]
        consider(tc, (jnp.abs(d_ax) >= 1e-8) & (pu >= u0) & (pu <= u1)
                 & (pv >= v0) & (pv <= v1))

    for (cx, cz, r, ymin, ymax, capped, mid) in hs.cylinders:
        ocx = ox - cx
        ocz = oz - cz
        a = dx * dx + dz * dz
        half_b = ocx * dx + ocz * dz
        cc = ocx * ocx + ocz * ocz - r * r
        disc = half_b * half_b - a * cc
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_a = 1.0 / jnp.maximum(a, 1e-12)
        quad_ok = (a > 1e-12) & (disc >= 0.0)
        for tc in ((-half_b - s) * inv_a, (-half_b + s) * inv_a):
            y = oy + tc * dy
            consider(tc, quad_ok & (y >= ymin) & (y <= ymax))
        if capped:
            for ky in (ymin, ymax):
                tc = (ky - oy) * inv_dy
                rx = ocx + tc * dx
                rz = ocz + tc * dz
                consider(tc, (jnp.abs(dy) > 1e-8)
                         & (rx * rx + rz * rz <= r * r))

    for (c, n, r, mid) in hs.disks:
        denom = n[0] * dx + n[1] * dy + n[2] * dz
        nd_c = n[0] * c[0] + n[1] * c[1] + n[2] * c[2]
        no = n[0] * ox + n[1] * oy + n[2] * oz
        safe = jnp.where(jnp.abs(denom) < 1e-8,
                         jnp.where(denom < 0, -1e-8, 1e-8), denom)
        tc = (nd_c - no) / safe
        px = ox + tc * dx
        pz2 = oz + tc * dz
        rr = (px - c[0]) ** 2 + (pz2 - c[2]) ** 2
        consider(tc, (jnp.abs(denom) >= 1e-6) & (rr <= r * r))

    for (n, dd, mid) in hs.planes:
        denom = n[0] * dx + n[1] * dy + n[2] * dz
        no = n[0] * ox + n[1] * oy + n[2] * oz
        safe = jnp.where(jnp.abs(denom) < 1e-12,
                         jnp.where(denom < 0, -1e-12, 1e-12), denom)
        consider((dd - no) / safe, jnp.abs(denom) >= 1e-6)

    for (a, e1, e2, n, mid) in hs.triangles:
        hx = dy * e2[2] - dz * e2[1]
        hy = dz * e2[0] - dx * e2[2]
        hz = dx * e2[1] - dy * e2[0]
        det = e1[0] * hx + e1[1] * hy + e1[2] * hz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12,
                                  jnp.where(det < 0, -1e-12, 1e-12), det)
        sx = ox - a[0]
        sy = oy - a[1]
        sz = oz - a[2]
        uc = (sx * hx + sy * hy + sz * hz) * inv_det
        qx = sy * e1[2] - sz * e1[1]
        qy = sz * e1[0] - sx * e1[2]
        qz = sx * e1[1] - sy * e1[0]
        vc = (dx * qx + dy * qy + dz * qz) * inv_det
        tc = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        consider(tc, (jnp.abs(det) >= 1e-8) & (uc >= 0.0) & (uc <= 1.0)
                 & (vc >= 0.0) & (uc + vc <= 1.0))

    return hit


def _mat_field(hs: _HostScene, mat_f, extract):
    """Unrolled material select: extract(row) per bank row, merged by id."""
    out = jnp.full(mat_f.shape, jnp.float32(extract(hs.materials[0])))
    for i, row in enumerate(hs.materials[1:], start=1):
        out = jnp.where(mat_f == jnp.float32(i), jnp.float32(extract(row)),
                        out)
    return out


def _albedo(hs: _HostScene, mat_f, px, py, pz):
    """Solid / world-XZ checker albedo (Scenes.cs:408-428)."""
    r = jnp.zeros(mat_f.shape, jnp.float32)
    g = jnp.zeros(mat_f.shape, jnp.float32)
    b = jnp.zeros(mat_f.shape, jnp.float32)
    for i, row in enumerate(hs.materials):
        alb, _, _, _, _, _, _, proc, alb2, scale = row
        sel = mat_f == jnp.float32(i)
        if proc == 1:  # checker
            cx = jnp.floor(px / scale)
            cz = jnp.floor(pz / scale)
            even = jnp.mod(cx + cz, 2.0) == 0.0
            rr = jnp.where(even, alb[0], alb2[0])
            gg = jnp.where(even, alb[1], alb2[1])
            bb = jnp.where(even, alb[2], alb2[2])
        else:
            rr = jnp.float32(alb[0])
            gg = jnp.float32(alb[1])
            bb = jnp.float32(alb[2])
        r = jnp.where(sel, rr, r)
        g = jnp.where(sel, gg, g)
        b = jnp.where(sel, bb, b)
    return r, g, b


def _splitmix(hi, lo):
    """One exact SplitMix64 step on uint32 pairs -> (hi, lo, uniform f32).

    Bit-identical to core/u64.splitmix64 + sampler.rng_next_unit (and so to
    RaytraceSampler.Rng.NextUnit): the XLA and Pallas trace paths see the
    SAME random sequence. Mosaic has no u32->f32 cast, so the top 24 bits
    route through an int32 bitcast."""
    from ..core import u64
    nhi, nlo = u64.splitmix64((hi, lo))
    m24 = pltpu.bitcast(nhi >> jnp.uint32(8), jnp.int32).astype(jnp.float32)
    unit = (m24 + 0.5) * jnp.float32(1.0 / 16777216.0)
    return nhi, nlo, unit


def build_kernel(hs: _HostScene, cfg: RenderConfig, hi_w: int, hi_h: int,
                 interpret: bool = False):
    """Build the pallas_call for a fixed scene snapshot + image size.

    Ray generation and per-pixel RNG seeding happen IN-KERNEL from 18
    camera/jitter scalars (core/camera.ray_params) + the frame index: the
    XLA-side raygen + seed hashing cost ~0.24 ms/frame at 160x90 — about
    as much as the whole trace — and 8 HBM input planes; in-kernel they
    are a handful of VPU ops per lane. The scalar params are shared with
    make_jittered_rays so both trace paths derive rays from identical
    values (the Bayer jitter base is the gather-free closed form,
    core/sampler.bayer_base).

    ``interpret=True`` runs the kernel through the Pallas interpreter (CPU)
    — used by the CI equivalence tests that pin this kernel to the XLA
    wavefront (ops/trace.py) without TPU hardware."""
    from ..core import sampler, u64

    sigma = cfg.diffuse_sigma_deg * math.pi / 180.0
    s2 = sigma * sigma
    on_a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    on_b = 0.45 * s2 / (s2 + 0.09)
    inv_pi = 1.0 / math.pi

    n_pixels = hi_w * hi_h
    rows_total = pl.cdiv(n_pixels, LANES)
    grid = pl.cdiv(rows_total, TILE_R)

    def kernel(par_ref, frame_ref,
               rad_r_ref, rad_g_ref, rad_b_ref, sky_ref,
               alb_r_ref, alb_g_ref, alb_b_ref,
               nx_ref, ny_ref, nz_ref, depth_ref, nray_ref):
        shape = (TILE_R, LANES)
        f0 = jnp.zeros(shape, jnp.float32)

        # ---- in-kernel jittered ray generation -------------------------
        # (MakeJitteredRay semantics, RaytraceRenderer.cs:419-437, via the
        # same scalars as core/camera.make_jittered_rays.)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        pix = (pl.program_id(0) * TILE_R + row) * LANES + lane
        lane_ok = pix < n_pixels  # padded tail lanes never trace
        pyi = pix // hi_w
        pxi = pix - pyi * hi_w

        base = sampler.bayer_base(pxi, pyi)
        jx = sampler.frac(sampler.frac(base + par_ref[0, 14])
                          + par_ref[0, 16]) - 0.5
        jy = sampler.frac(sampler.frac(base + par_ref[0, 15])
                          + par_ref[0, 17]) - 0.5
        uu_ = ((pxi.astype(jnp.float32) + 0.5 + jx) / hi_w) * 2.0 - 1.0
        vv_ = 1.0 - ((pyi.astype(jnp.float32) + 0.5 + jy) / hi_h) * 2.0
        uw = uu_ * par_ref[0, 12]
        vh = vv_ * par_ref[0, 13]
        dxx = par_ref[0, 3] + par_ref[0, 6] * uw + par_ref[0, 9] * vh
        dyy = par_ref[0, 4] + par_ref[0, 7] * uw + par_ref[0, 10] * vh
        dzz = par_ref[0, 5] + par_ref[0, 8] * uw + par_ref[0, 11] * vh
        dlen = jnp.sqrt(jnp.maximum(1e-20,
                                    dxx * dxx + dyy * dyy + dzz * dzz))
        dx0 = dxx / dlen
        dy0 = dyy / dlen
        dz0 = dzz / dlen
        ox0 = par_ref[0, 0] + f0
        oy0 = par_ref[0, 1] + f0
        oz0 = par_ref[0, 2] + f0

        # ---- in-kernel per-pixel seed (RaytraceSampler.PerFrameSeed) ----
        frame_u32 = frame_ref[0, 0].astype(jnp.uint32)
        rhi, rlo = sampler.per_frame_seed(
            pxi.astype(jnp.uint32), pyi.astype(jnp.uint32),
            frame_u32, cfg.seed_salt)

        def shade_lights(px, py, pz, nx, ny, nz, wox, woy, woz,
                         alb_r, alb_g, alb_b, active):
            """Oren-Nayar direct lighting with shadow occlusion
            (RaytraceRenderer.cs:810-831, :757-798).

            Returns (r, g, b, shadow_ray_count): the count matches
            ops/trace.py's transmittance_to_lights accounting lane for
            lane, so both paths report identical rays_traced."""
            acc_r = f0
            acc_g = f0
            acc_b = f0
            n_shadow = f0
            cos_o = jnp.maximum(0.0, nx * wox + ny * woy + nz * woz)
            sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
            pox = wox - nx * cos_o
            poy = woy - ny * cos_o
            poz = woz - nz * cos_o
            pox, poy, poz = _normalize3(pox, poy, poz)
            for (lp, lc, li) in hs.lights:
                if not (li > 0.0):
                    # Statically elide zero-intensity lights — matches
                    # trace.py's dynamic (intensity > 0) need-gate (lights
                    # are compile-time constants here), keeping the two
                    # paths' shadow-ray counts aligned.
                    continue
                tlx = lp[0] - px
                tly = lp[1] - py
                tlz = lp[2] - pz
                d2 = jnp.maximum(1e-12, tlx * tlx + tly * tly + tlz * tlz)
                dist = jnp.sqrt(d2)
                inv_dist = 1.0 / dist
                lx = tlx * inv_dist
                ly = tly * inv_dist
                lz = tlz * inv_dist
                ndotl = jnp.maximum(0.0, nx * lx + ny * ly + nz * lz)
                need = active & (ndotl > 0.0)
                # Shadow ray (binary or tinted transmittance).
                sox = px + nx * _EPS
                soy = py + ny * _EPS
                soz = pz + nz * _EPS
                tr_r = jnp.ones(shape, jnp.float32)
                tr_g = jnp.ones(shape, jnp.float32)
                tr_b = jnp.ones(shape, jnp.float32)
                smin = jnp.full(shape, _EPS, jnp.float32)
                if hs.binary_shadows or not scene_has_transparency(hs):
                    # All-opaque scene: occlusion-only any-hit sweep.
                    occ = _any_hit(hs, sox, soy, soz, lx, ly, lz, smin,
                                   dist - _EPS)
                    tr_r = jnp.where(occ, 0.0, tr_r)
                    tr_g = jnp.where(occ, 0.0, tr_g)
                    tr_b = jnp.where(occ, 0.0, tr_b)
                    n_shadow += need.astype(jnp.float32)
                else:
                    # ``done`` mirrors trace.py's per-lane termination so
                    # the shadow-ray counts line up exactly.
                    done = ~need
                    for _ in range(cfg.max_refractions):
                        n_shadow += (need & ~done).astype(jnp.float32)
                        st, _, _, _, _, _, smat, shit = _intersect_all(
                            hs, sox, soy, soz, lx, ly, lz, smin,
                            dist - _EPS)
                        m_tr = _mat_field(hs, smat, lambda r: r[4])
                        opaque = shit & (m_tr <= 0.0) & ~done
                        tr_r = jnp.where(opaque, 0.0, tr_r)
                        tr_g = jnp.where(opaque, 0.0, tr_g)
                        tr_b = jnp.where(opaque, 0.0, tr_b)
                        through = shit & (m_tr > 0.0) & ~done
                        tm_r = _mat_field(hs, smat, lambda r: r[6][0])
                        tm_g = _mat_field(hs, smat, lambda r: r[6][1])
                        tm_b = _mat_field(hs, smat, lambda r: r[6][2])
                        tr_r = jnp.where(through, tr_r * tm_r * m_tr, tr_r)
                        tr_g = jnp.where(through, tr_g * tm_g * m_tr, tr_g)
                        tr_b = jnp.where(through, tr_b * tm_b * m_tr, tr_b)
                        faded = ((tr_r <= 1e-6) & (tr_g <= 1e-6)
                                 & (tr_b <= 1e-6))
                        done = done | ~shit | opaque | faded
                        smin = jnp.where(shit, st + _EPS, smin)
                # Oren-Nayar term.
                cos_i = ndotl
                sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
                pix = lx - nx * cos_i
                piy = ly - ny * cos_i
                piz = lz - nz * cos_i
                pix, piy, piz = _normalize3(pix, piy, piz)
                cos_phi = jnp.maximum(0.0, pix * pox + piy * poy + piz * poz)
                sin_alpha = jnp.maximum(sin_i, sin_o)
                tan_beta = jnp.minimum(sin_i / jnp.maximum(1e-6, cos_i),
                                       sin_o / jnp.maximum(1e-6, cos_o))
                on = on_a + on_b * cos_phi * sin_alpha * tan_beta
                zero_f = (cos_i <= 0.0) | (cos_o <= 0.0)
                f_on = jnp.where(zero_f, 0.0, on * inv_pi)
                # BRDF clipped to [0,1] per channel, then x ndotl x falloff
                # (trace.py oren_nayar + light loop semantics).
                atten = jnp.where(need, ndotl * li / d2, 0.0)
                acc_r += jnp.clip(alb_r * f_on, 0.0, 1.0) * atten \
                    * lc[0] * tr_r
                acc_g += jnp.clip(alb_g * f_on, 0.0, 1.0) * atten \
                    * lc[1] * tr_g
                acc_b += jnp.clip(alb_b * f_on, 0.0, 1.0) * atten \
                    * lc[2] * tr_b
            return acc_r, acc_g, acc_b, n_shadow

        # ---- wavefront state -------------------------------------------
        # Scenes with no transparent material never push/pop the path
        # stack; compiling it out removes ~5 MB of VMEM selects per round.
        HAS_TR = scene_has_transparency(hs)
        # Clamp to the provable worst-case depth (max_mirror_bounces + 1,
        # see the KERNEL_STACK derivation): kernel_stack_sufficient
        # guarantees the bound fits, so this is bit-identical and shrinks
        # the VMEM-resident stack + per-round push/pop selects (8 -> 3
        # slots at default caps). trace.py applies the same clamp.
        S = min(cfg.path_stack_size, KERNEL_STACK,
                cfg.max_mirror_bounces + 1)
        st = dict(
            ox=ox0, oy=oy0, oz=oz0, dx=dx0, dy=dy0, dz=dz0,
            br=jnp.ones(shape, jnp.float32), bg=jnp.ones(shape, jnp.float32),
            bb=jnp.ones(shape, jnp.float32),
            mirror=f0, diffuse=f0,
            # Bool carries don't lower in Mosaic (i8->i1 trunc); masks
            # live as f32 0/1 and are re-derived as bools in the body.
            is_primary=lane_ok.astype(jnp.float32),
            active=lane_ok.astype(jnp.float32),
            **({"sp": jnp.zeros(shape, jnp.int32),
                "stack": jnp.zeros((S, 11, TILE_R, LANES), jnp.float32)}
               if HAS_TR else {}),
            rad_r=f0, rad_g=f0, rad_b=f0,
            primary_hit=jnp.zeros(shape, jnp.float32),
            sky=jnp.zeros(shape, jnp.float32),
            g_ar=f0, g_ag=f0, g_ab=f0,
            g_nx=f0, g_ny=f0, g_nz=f0,
            g_d=jnp.full(shape, INF, jnp.float32),
            g_valid=jnp.zeros(shape, jnp.float32),
            rhi=rhi, rlo=rlo,
            nray=f0,
            rnd=jnp.int32(0),
        )

        def body(st):
            ox, oy, oz = st["ox"], st["oy"], st["oz"]
            dx, dy, dz = st["dx"], st["dy"], st["dz"]
            active = st["active"] > 0.5
            # Honest per-lane ray accounting, mirroring trace.py:196.
            st["nray"] += st["active"]
            is_primary_b = st["is_primary"] > 0.5
            primary_hit_b = st["primary_hit"] > 0.5
            g_valid_b = st["g_valid"] > 0.5
            t, nx, ny, nz, uu, vv, mat_f, hit = _intersect_all(
                hs, ox, oy, oz, dx, dy, dz,
                jnp.full(shape, 1e-3, jnp.float32),
                jnp.full(shape, INF, jnp.float32))
            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz
            alb_r, alb_g, alb_b = _albedo(hs, mat_f, px, py, pz)

            # miss -> sky gradient
            miss = active & ~hit
            tbg = 0.5 * (dy + 1.0)
            sky_r = hs.bg_bottom[0] * (1 - tbg) + hs.bg_top[0] * tbg
            sky_g = hs.bg_bottom[1] * (1 - tbg) + hs.bg_top[1] * tbg
            sky_b = hs.bg_bottom[2] * (1 - tbg) + hs.bg_top[2] * tbg
            st["rad_r"] += jnp.where(miss, st["br"] * sky_r, 0.0)
            st["rad_g"] += jnp.where(miss, st["bg"] * sky_g, 0.0)
            st["rad_b"] += jnp.where(miss, st["bb"] * sky_b, 0.0)
            primary_miss = miss & is_primary_b & ~primary_hit_b
            st["sky"] = jnp.maximum(st["sky"], primary_miss.astype(jnp.float32))
            g_valid_b = g_valid_b | primary_miss

            hit_now = active & hit
            primary_now = hit_now & is_primary_b
            st["primary_hit"] = jnp.maximum(
                st["primary_hit"], primary_now.astype(jnp.float32))
            fill_g = primary_now & ~g_valid_b
            st["g_ar"] = jnp.where(fill_g, alb_r, st["g_ar"])
            st["g_ag"] = jnp.where(fill_g, alb_g, st["g_ag"])
            st["g_ab"] = jnp.where(fill_g, alb_b, st["g_ab"])
            st["g_nx"] = jnp.where(fill_g, nx, st["g_nx"])
            st["g_ny"] = jnp.where(fill_g, ny, st["g_ny"])
            st["g_nz"] = jnp.where(fill_g, nz, st["g_nz"])
            st["g_d"] = jnp.where(fill_g, t, st["g_d"])
            st["g_valid"] = jnp.maximum(st["g_valid"],
                                        (g_valid_b | fill_g)
                                        .astype(jnp.float32))
            st["is_primary"] = jnp.where(hit_now, 0.0, st["is_primary"])

            em_r = _mat_field(hs, mat_f, lambda r: r[3][0])
            em_g = _mat_field(hs, mat_f, lambda r: r[3][1])
            em_b = _mat_field(hs, mat_f, lambda r: r[3][2])
            st["rad_r"] += jnp.where(hit_now, st["br"] * em_r, 0.0)
            st["rad_g"] += jnp.where(hit_now, st["bg"] * em_g, 0.0)
            st["rad_b"] += jnp.where(hit_now, st["bb"] * em_b, 0.0)

            m_tr = _mat_field(hs, mat_f, lambda r: r[4])
            m_refl = _mat_field(hs, mat_f, lambda r: r[2])
            m_ior = _mat_field(hs, mat_f, lambda r: r[5])

            if HAS_TR:
                transparent = hit_now & (m_tr > 0.0)
            else:
                transparent = hit_now & ~hit_now   # static false
            can_bounce = st["mirror"] < cfg.max_mirror_bounces
            mirror = hit_now & ~transparent & (m_refl >= cfg.mirror_threshold)
            diffuse = hit_now & ~transparent & ~mirror

            # -- transparent: Fresnel push reflect + refract ---------------
            tr_act = transparent & can_bounce
            if HAS_TR:
                cos_in = nx * dx + ny * dy + nz * dz
                front = cos_in < 0.0
                nlx = jnp.where(front, nx, -nx)
                nly = jnp.where(front, ny, -ny)
                nlz = jnp.where(front, nz, -nz)
                eta_i = jnp.where(front, 1.0, m_ior)
                eta_t = jnp.where(front, m_ior, 1.0)
                eta = eta_i / eta_t
                dn = dx * nlx + dy * nly + dz * nlz
                rfx = dx - 2.0 * dn * nlx
                rfy = dy - 2.0 * dn * nly
                rfz = dz - 2.0 * dn * nlz
                rfx, rfy, rfz = _normalize3(rfx, rfy, rfz)
                cosi = jnp.clip(-dn, -1.0, 1.0)
                kk = 1.0 - eta * eta * (1.0 - cosi * cosi)
                has_refr = kk >= 0.0
                rt = eta * cosi - jnp.sqrt(jnp.maximum(kk, 0.0))
                tx = dx * eta + nlx * rt
                ty = dy * eta + nly * rt
                tz = dz * eta + nlz * rt
                tx, ty, tz = _normalize3(tx, ty, tz)
                r0 = ((eta_i - eta_t) / (eta_i + eta_t)) ** 2
                fres = r0 + (1.0 - r0) * (1.0 - jnp.abs(dn)) ** 5
                tr_amt = jnp.clip(m_tr, 0.0, 1.0)
                t_w = jnp.where(has_refr, (1.0 - fres) * tr_amt, 0.0)
                r_w = jnp.clip(fres + m_refl * (1.0 - fres), 0.0, 1.0)
                tm_r = _mat_field(hs, mat_f, lambda r: r[6][0])
                tm_g = _mat_field(hs, mat_f, lambda r: r[6][1])
                tm_b = _mat_field(hs, mat_f, lambda r: r[6][2])

                slot_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (S, 1, TILE_R, LANES), 0)

                def push(stk, sp, mask, vals):
                    """vals: tuple of 11 (TILE_R, LANES) arrays; one fused
                    select over the slot axis."""
                    sp_ok = mask & (sp < S)
                    vstack = jnp.stack(vals)        # (11, R, L)
                    sel = (slot_iota == sp[None, None]) & sp_ok[None, None]
                    newstk = jnp.where(sel, vstack[None], stk)
                    return newstk, sp + sp_ok.astype(jnp.int32)

                sp = st["sp"]
                stk = st["stack"]
                stk, sp = push(stk, sp, tr_act & (r_w > 0.0), (
                    px + nlx * _EPS, py + nly * _EPS, pz + nlz * _EPS,
                    rfx, rfy, rfz,
                    st["br"] * alb_r * r_w, st["bg"] * alb_g * r_w,
                    st["bb"] * alb_b * r_w,
                    st["mirror"] + 1.0, st["diffuse"]))
                stk, sp = push(stk, sp, tr_act & (t_w > 0.0), (
                    px - nlx * _EPS, py - nly * _EPS, pz - nlz * _EPS,
                    tx, ty, tz,
                    st["br"] * tm_r * t_w, st["bg"] * tm_g * t_w,
                    st["bb"] * tm_b * t_w,
                    st["mirror"] + 1.0, st["diffuse"]))
                st["stack"] = stk
                st["sp"] = sp

            # -- diffuse: ambient + lights + one cosine bounce -------------
            amb = hs.ambient[1]
            st["rad_r"] += jnp.where(diffuse,
                                     st["br"] * hs.ambient[0][0] * amb
                                     * alb_r, 0.0)
            st["rad_g"] += jnp.where(diffuse,
                                     st["bg"] * hs.ambient[0][1] * amb
                                     * alb_g, 0.0)
            st["rad_b"] += jnp.where(diffuse,
                                     st["bb"] * hs.ambient[0][2] * amb
                                     * alb_b, 0.0)
            if hs.lights:
                lr, lg, lb, n_sh = shade_lights(px, py, pz, nx, ny, nz,
                                                -dx, -dy, -dz,
                                                alb_r, alb_g, alb_b, diffuse)
                st["rad_r"] += st["br"] * lr
                st["rad_g"] += st["bg"] * lg
                st["rad_b"] += st["bb"] * lb
                st["nray"] += n_sh

            # Cosine hemisphere bounce (RaytraceSampler.cs:63-111).
            want_bounce = diffuse & (st["diffuse"]
                                     < jnp.float32(cfg.diffuse_bounces))
            hi1, lo1, u1 = _splitmix(st["rhi"], st["rlo"])
            hi2, lo2, u2 = _splitmix(hi1, lo1)
            st["rhi"] = jnp.where(want_bounce, hi2, st["rhi"])
            st["rlo"] = jnp.where(want_bounce, lo2, st["rlo"])
            r_s = jnp.sqrt(u1)
            theta = 2.0 * math.pi * u2
            bx = r_s * jnp.cos(theta)
            by = r_s * jnp.sin(theta)
            bz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
            # Branchless ONB, identical to sampler.cosine_sample_hemisphere
            # (degenerate w.z ~ -1 guard as a select).
            degen = nz < -0.999999
            a_onb = 1.0 / (1.0 + jnp.where(degen, 0.0, nz))
            b_onb = -nx * ny * a_onb
            ux_ = jnp.where(degen, 0.0, 1.0 - nx * nx * a_onb)
            uy_ = jnp.where(degen, -1.0, b_onb)
            uz_ = jnp.where(degen, 0.0, -nx)
            vx_ = jnp.where(degen, -1.0, b_onb)
            vy_ = jnp.where(degen, 0.0, 1.0 - ny * ny * a_onb)
            vz_ = jnp.where(degen, 0.0, -ny)
            bdx = ux_ * bx + vx_ * by + nx * bz
            bdy = uy_ * bx + vy_ * by + ny * bz
            bdz = uz_ * bx + vz_ * by + nz * bz
            # Full Oren-Nayar weight for the bounce direction * pi
            # (trace.py: bounce_beta = beta * f_bounce * pi).
            cos_i = jnp.maximum(0.0, nx * bdx + ny * bdy + nz * bdz)
            cos_o = jnp.maximum(0.0, -(nx * dx + ny * dy + nz * dz))
            sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
            sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
            pix = bdx - nx * cos_i
            piy = bdy - ny * cos_i
            piz = bdz - nz * cos_i
            pix, piy, piz = _normalize3(pix, piy, piz)
            pox2 = -dx - nx * cos_o
            poy2 = -dy - ny * cos_o
            poz2 = -dz - nz * cos_o
            pox2, poy2, poz2 = _normalize3(pox2, poy2, poz2)
            cphi = jnp.maximum(0.0, pix * pox2 + piy * poy2 + piz * poz2)
            s_alpha = jnp.maximum(sin_i, sin_o)
            t_beta = jnp.minimum(sin_i / jnp.maximum(1e-6, cos_i),
                                 sin_o / jnp.maximum(1e-6, cos_o))
            on_w = on_a + on_b * cphi * s_alpha * t_beta
            f_w = jnp.where((cos_i <= 0) | (cos_o <= 0), 0.0, on_w * inv_pi)
            bounce_w = f_w * math.pi

            mirror_cont = mirror & can_bounce
            cont = mirror_cont | want_bounce
            dn_m = dx * nx + dy * ny + dz * nz
            mrx = dx - 2.0 * dn_m * nx
            mry = dy - 2.0 * dn_m * ny
            mrz = dz - 2.0 * dn_m * nz
            mrx, mry, mrz = _normalize3(mrx, mry, mrz)
            st["ox"] = jnp.where(cont, px + nx * _EPS, ox)
            st["oy"] = jnp.where(cont, py + ny * _EPS, oy)
            st["oz"] = jnp.where(cont, pz + nz * _EPS, oz)
            st["dx"] = jnp.where(mirror_cont, mrx,
                                 jnp.where(want_bounce, bdx, dx))
            st["dy"] = jnp.where(mirror_cont, mry,
                                 jnp.where(want_bounce, bdy, dy))
            st["dz"] = jnp.where(mirror_cont, mrz,
                                 jnp.where(want_bounce, bdz, dz))
            st["br"] = jnp.where(mirror_cont, st["br"] * alb_r,
                                 jnp.where(want_bounce,
                                           st["br"] * alb_r * bounce_w,
                                           st["br"]))
            st["bg"] = jnp.where(mirror_cont, st["bg"] * alb_g,
                                 jnp.where(want_bounce,
                                           st["bg"] * alb_g * bounce_w,
                                           st["bg"]))
            st["bb"] = jnp.where(mirror_cont, st["bb"] * alb_b,
                                 jnp.where(want_bounce,
                                           st["bb"] * alb_b * bounce_w,
                                           st["bb"]))
            st["mirror"] = st["mirror"] + mirror_cont.astype(jnp.float32)
            st["diffuse"] = st["diffuse"] + want_bounce.astype(jnp.float32)

            # -- pop -------------------------------------------------------
            if HAS_TR:
                ended = active & ~cont
                can_pop = ended & (st["sp"] > 0)
                idx = jnp.maximum(st["sp"] - 1, 0)
                pop_sel = (slot_iota == idx[None, None]).astype(jnp.float32)
                popped = jnp.sum(st["stack"] * pop_sel, axis=0)  # (11,R,L)
                names = ("ox", "oy", "oz", "dx", "dy", "dz", "br", "bg",
                         "bb", "mirror", "diffuse")
                for i, nm in enumerate(names):
                    st[nm] = jnp.where(can_pop, popped[i], st[nm])
                st["sp"] = st["sp"] - can_pop.astype(jnp.int32)
                st["active"] = (active & (cont | can_pop)) \
                    .astype(jnp.float32)
            else:
                st["active"] = (active & cont).astype(jnp.float32)
            st["rnd"] = st["rnd"] + 1
            return st

        def cond(st):
            return jnp.any(st["active"] > 0.5) \
                & (st["rnd"] < cfg.max_trace_rounds)

        st = jax.lax.while_loop(cond, body, st)

        rad_r_ref[:] = st["rad_r"]
        rad_g_ref[:] = st["rad_g"]
        rad_b_ref[:] = st["rad_b"]
        sky_ref[:] = st["sky"]
        alb_r_ref[:] = st["g_ar"]
        alb_g_ref[:] = st["g_ag"]
        alb_b_ref[:] = st["g_ab"]
        nx_ref[:] = st["g_nx"]
        ny_ref[:] = st["g_ny"]
        nz_ref[:] = st["g_nz"]
        depth_ref[:] = st["g_d"]
        nray_ref[:] = st["nray"]

    spec = pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = [jax.ShapeDtypeStruct((rows_total, LANES), f32)
                 for _ in range(12)]

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 18), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[spec] * 12,
        out_shape=out_shape,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _cached_kernel(hs: _HostScene, cfg: RenderConfig, hi_w: int, hi_h: int,
                   interpret: bool = False):
    return build_kernel(hs, cfg, hi_w, hi_h, interpret=interpret)


def trace_all_pallas(scene: SceneData, hs: _HostScene, cam, frame_idx,
                     hi_w: int, hi_h: int, cfg: RenderConfig,
                     interpret: bool = False, params=None):
    """Drop-in replacement for ops.trace.trace_all on fitting scenes.

    Takes the camera pose + frame index instead of ray arrays: primary
    rays and per-pixel RNG seeds are generated in-kernel (see
    build_kernel). Returns the same TraceResult pytree with (P,)-leading
    shapes, P = hi_w * hi_h. rays_traced is MEASURED in-kernel (per-lane
    active + shadow counts, summed) with the same accounting as trace.py,
    so the two paths report identical counts on the same scene."""
    from ..core.camera import ray_params
    from .trace import TraceResult

    (rr, rg, rb), sky, (ar, ag, ab), (nx, ny, nz), dep, rays = \
        trace_planes_pallas(scene, hs, cam, frame_idx, hi_w, hi_h, cfg,
                            interpret=interpret, params=params)
    flat = lambda x: x.reshape(-1)
    radiance = jnp.stack([flat(rr), flat(rg), flat(rb)], axis=-1)
    albedo = jnp.stack([flat(ar), flat(ag), flat(ab)], axis=-1)
    normal = jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1)
    return TraceResult(radiance=radiance, is_sky=flat(sky) > 0.5,
                       albedo=albedo, normal=normal, depth=flat(dep),
                       rays_traced=rays)


def trace_planes_pallas(scene: SceneData, hs: _HostScene, cam, frame_idx,
                        hi_w: int, hi_h: int, cfg: RenderConfig,
                        interpret: bool = False, params=None):
    """Megakernel trace returning per-channel (hi_h, hi_w) image planes —
    the layout the fused post kernel (ops/pallas_post.py) consumes.

    Returns ((rad_r, rad_g, rad_b), sky_f32, (alb r,g,b), (n x,y,z),
    depth, rays_traced)."""
    from ..core.camera import ray_params

    P = hi_w * hi_h
    # ``params``: precomputed ray_params row (frame scans hoist the scalar
    # camera math out of the loop body; see renderer.frame_scan).
    if params is None:
        params = ray_params(cam, hi_w, hi_h, frame_idx)
    params = params.reshape(1, 18)
    frame = jnp.asarray(frame_idx, jnp.int32).reshape(1, 1)
    call = _cached_kernel(hs, cfg, hi_w, hi_h, interpret)
    (rr, rg, rb, sky, ar, ag, ab, nx, ny, nz, dep, nray) = call(params, frame)

    def img(x):
        return x.reshape(-1)[:P].reshape(hi_h, hi_w)

    rays = jnp.sum(nray.reshape(-1)[:P]).astype(jnp.int32)
    return ((img(rr), img(rg), img(rb)), img(sky),
            (img(ar), img(ag), img(ab)), (img(nx), img(ny), img(nz)),
            img(dep), rays)
