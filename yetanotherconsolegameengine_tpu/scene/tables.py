"""Scene as structure-of-arrays tables (the TPU inversion of the reference).

The reference scene is a `List<Hittable>` of virtual objects behind a CPU
BVH (/root/reference/ConsoleGame/RayTracing/Scenes/Scene.cs:12,66-82). Here a
scene is one pytree of padded, fixed-shape device arrays — one table per
primitive type, a material bank, lights, sky — so the whole intersection
test is a dense, branch-free batch per type. Small scenes don't need a BVH
at all on TPU (every pixel tests every primitive in lockstep on the VPU);
triangle meshes get their own flattened BVH (ops/mesh_bvh.py).

Padding: every table is padded to a power-of-two bucket with `mask=False`
rows, so switching between similar scenes reuses the compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .materials import Material, MaterialBank, MaterialTable

# Meshes at or above this size build cluster tables (ops/mesh_clusters.py,
# tile-synchronous Pallas traversal) instead of the skip-link MeshBVH; below
# it the per-ray walk is competitive and CPU-test-friendly.
CLUSTER_MIN_TRIS = 16384

# Secondary-ray LOD proxy budget (scene/lod.py): cluster meshes whose
# vertex-clustered simplification lands under this AND achieves >= 4x
# reduction get a proxy set that shadow/bounce sweeps trace instead of the
# full mesh.
LOD_TARGET_TRIS = 24576

# OCCLUSION proxy budget: shadow sweeps are the dragon frame's single
# biggest cost (round-5 profile: 6.7 ms of a 24.5 ms frame for the
# P*L any-hit sweep vs the 24k-tri LOD set — the cluster kernel's cost is
# ray-triangle WORK, not launch count), and binary/colored occlusion
# tolerates far more simplification than bounce radiance. Meshes whose
# secondary LOD set is still >= 2x this budget also build an extra-coarse
# shadow-only set.
SHADOW_LOD_TARGET_TRIS = 6144

# PRIMARY-ray LOD proxy budget: hero meshes far above terminal-resolution
# pixel density (the dragon carries ~70 tris/pixel at 240x135) also get a
# geometrically faithful FINE proxy whose vertex-clustering cell is far
# below a pixel footprint — primary rays trace it instead of the full set
# (cfg.primary_mesh_lod gates per frame). Built only when the mesh exceeds
# 3x this budget, so e.g. the 69k-tri bunny keeps tracing full-res.
# Round-5 A/B on the dragon @240x135: 147k -> 96k costs image delta vs
# full-primary of mean 0.00260/p99 0.036 (vs 147k's own 0.00195/0.031 —
# same max, silhouette-edge pixel class) and buys 54.6 -> 55.6 fps.
PRIMARY_LOD_TARGET_TRIS = 98304

# Proxy sets pack 512-triangle clusters (vs the full mesh's 256): cluster
# visits are launch-bound (~2.3 us regardless of width), so doubling the
# triangles per visit halves a sweep's visit count for near-free — the
# slightly looser AABBs cost only wasted triangle LANES, which are cheap.
PROXY_KC = 512


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _table(cls, count: int, **cols):
    """Build a padded device table of `cls` from host column lists.
    A zero-count table gets zero rows, so its primitive type compiles out
    of the frame program entirely."""
    nb = _bucket(count) if count else 0
    mask = np.zeros(nb, np.bool_)
    mask[:count] = True
    out = {}
    for key, (vals, dtype, width) in cols.items():
        a = (np.asarray(vals, dtype) if count
             else np.zeros((0, width) if width else 0, dtype))
        if width and a.ndim == 1:
            a = a.reshape(0, width)
        out[key] = jnp.asarray(_pad_rows(a, nb))
    return cls(mask=jnp.asarray(mask), **out)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SphereTable:
    center: jax.Array   # (N, 3)
    radius: jax.Array   # (N,)
    mat: jax.Array      # (N,) i32
    mask: jax.Array     # (N,) bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoxTable:
    bmin: jax.Array     # (N, 3)
    bmax: jax.Array     # (N, 3)
    mat: jax.Array
    mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RectTable:
    """Axis-aligned rectangles. ``axis`` is the fixed coordinate (0=X for
    YZRect, 1=Y for XZRect, 2=Z for XYRect); (u, v) span the remaining two
    axes in ascending order, matching the UV conventions of
    Objects/Surfaces.cs:145-359."""

    axis: jax.Array     # (N,) i32
    k: jax.Array        # (N,) fixed-coordinate value
    u0: jax.Array
    u1: jax.Array
    v0: jax.Array
    v1: jax.Array
    mat: jax.Array
    mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CylinderTable:
    """Y-axis capped cylinders (Objects/BoundedObjects.cs:118-248)."""

    cx: jax.Array
    cz: jax.Array
    radius: jax.Array
    ymin: jax.Array
    ymax: jax.Array
    capped: jax.Array   # (N,) bool
    mat: jax.Array
    mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiskTable:
    center: jax.Array   # (N, 3)
    normal: jax.Array   # (N, 3) unit
    radius: jax.Array
    mat: jax.Array
    mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlaneTable:
    normal: jax.Array   # (N, 3) unit
    d: jax.Array        # (N,) = dot(normal, point)
    mat: jax.Array
    mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleTable:
    """Triangles in cached-edge SoA (a, e1=b-a, e2=c-a, unit n), the layout
    of Objects/MeshBVH.cs:76-99 / Triangle.cs:38-45."""

    a: jax.Array        # (N, 3)
    e1: jax.Array       # (N, 3)
    e2: jax.Array       # (N, 3)
    n: jax.Array        # (N, 3)
    mat: jax.Array
    mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LightTable:
    pos: jax.Array       # (L, 3)
    color: jax.Array     # (L, 3)
    intensity: jax.Array # (L,)
    mask: jax.Array      # (L,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneData:
    """The complete device-resident scene."""

    materials: MaterialTable
    spheres: SphereTable
    boxes: BoxTable
    rects: RectTable
    cylinders: CylinderTable
    disks: DiskTable
    planes: PlaneTable
    triangles: TriangleTable
    mesh: Optional[Any]      # ops.mesh_bvh.MeshBVH or None
    mesh_clusters: Optional[Any]  # ops.mesh_clusters.MeshClusters or None
    voxels: Optional[Any]    # ops.dda.VoxelWorld or None
    lights: LightTable
    ambient_color: jax.Array      # (3,)
    ambient_intensity: jax.Array  # ()
    bg_top: jax.Array             # (3,)
    bg_bottom: jax.Array          # (3,)
    textures: Optional[jax.Array] # (T, H, W, 3) or None

    # Static metadata (compile-time):
    name: str = dataclasses.field(metadata=dict(static=True))
    binary_shadows: bool = dataclasses.field(metadata=dict(static=True))
    has_dynamic_textures: bool = dataclasses.field(metadata=dict(static=True))
    defaults: Tuple[float, ...] = dataclasses.field(metadata=dict(static=True))
    # Every mesh-triangle material fully opaque? Lets shadow queries run the
    # cluster traversal in ANY-HIT mode (a blocking opaque hit zeroes the
    # transmittance regardless of which one is nearest).
    mesh_all_opaque: bool = dataclasses.field(default=True,
                                              metadata=dict(static=True))
    # Low-poly proxy cluster set for SECONDARY rays (shadow / bounce
    # populations, scene/lod.py); None when the mesh is small enough that
    # the full set is cheap. Selection happens in ops/trace.py.
    mesh_clusters_lod: Optional[Any] = None
    # Fine proxy cluster set for PRIMARY rays of ultra-dense hero meshes
    # (sub-pixel vertex clustering, see PRIMARY_LOD_TARGET_TRIS); None for
    # meshes near or below screen pixel density.
    mesh_clusters_fine: Optional[Any] = None
    # Extra-coarse proxy for OCCLUSION-ONLY queries (shadow transmittance;
    # see SHADOW_LOD_TARGET_TRIS): shadow sweeps test ray-triangle work
    # proportional to the proxy's triangle count, and occlusion tolerates
    # far more simplification than bounce radiance. Selected by
    # intersect_scene when shadow=True and lod=True.
    mesh_clusters_shadow: Optional[Any] = None
    # Does ANY material have transparency > 0? When False (known at scene
    # build), the wavefront trace statically elides its refraction stack —
    # the (S, P) stack arrays cost ~14 ms/frame at 64.8k rays even when no
    # path ever pushes. True is the safe default (keep the stack).
    any_transparent: bool = dataclasses.field(default=True,
                                              metadata=dict(static=True))

    @property
    def default_pose(self):
        from ..core.camera import CameraPose
        px, py, pz, yaw, pitch, fov = self.defaults
        return CameraPose.create((px, py, pz), yaw, pitch, fov)


class SceneBuilder:
    """Imperative host-side scene construction -> one SceneData pytree.

    Plays the role of the reference's `Scene` + `Scenes.Build*` helpers
    (Scenes/Scenes.cs): `add_*` primitives, lights, ambient, sky, camera
    defaults, then `build()`.
    """

    def __init__(self, name: str = "scene"):
        self.name = name
        self.bank = MaterialBank()
        self._spheres: list = []
        self._boxes: list = []
        self._rects: list = []
        self._cylinders: list = []
        self._disks: list = []
        self._planes: list = []
        self._triangles: list = []
        self._lights: list = []
        self._mesh_tris: list = []   # (a, b, c, mat_id) for the mesh BVH
        self.voxels = None
        self.ambient_color = (1.0, 1.0, 1.0)
        self.ambient_intensity = 0.075
        self.bg_top = (0.6, 0.8, 1.0)
        self.bg_bottom = (1.0, 1.0, 1.0)
        self.textures: list = []
        self.binary_shadows = False
        self.has_dynamic_textures = False
        self.default_pos = (0.0, 1.0, 0.0)
        self.default_yaw = 0.0
        self.default_pitch = 0.0
        self.default_fov = 60.0

    # -- primitives ---------------------------------------------------------

    def _mid(self, mat: Material) -> int:
        return self.bank.add(mat)

    def add_sphere(self, center, radius, mat: Material):
        self._spheres.append((tuple(center), float(radius), self._mid(mat)))

    def add_box(self, bmin, bmax, mat: Material):
        self._boxes.append((tuple(bmin), tuple(bmax), self._mid(mat)))

    def add_rect(self, axis: int, k: float, u0, u1, v0, v1, mat: Material):
        self._rects.append((axis, k, u0, u1, v0, v1, self._mid(mat)))

    def add_xy_rect(self, x0, x1, y0, y1, z, mat):
        self.add_rect(2, z, x0, x1, y0, y1, mat)

    def add_xz_rect(self, x0, x1, z0, z1, y, mat):
        self.add_rect(1, y, x0, x1, z0, z1, mat)

    def add_yz_rect(self, y0, y1, z0, z1, x, mat):
        self.add_rect(0, x, y0, y1, z0, z1, mat)

    def add_cylinder(self, center, radius, ymin, ymax, capped, mat: Material):
        self._cylinders.append((center[0], center[2], radius, min(ymin, ymax),
                                max(ymin, ymax), bool(capped), self._mid(mat)))

    def add_disk(self, center, normal, radius, mat: Material):
        n = np.asarray(normal, np.float32)
        n = n / max(1e-20, float(np.linalg.norm(n)))
        self._disks.append((tuple(center), tuple(n), float(radius), self._mid(mat)))

    def add_plane(self, point, normal, mat: Material):
        n = np.asarray(normal, np.float64)
        n = n / max(1e-20, float(np.linalg.norm(n)))
        d = float(np.dot(n, np.asarray(point, np.float64)))
        self._planes.append((tuple(n.astype(np.float32)), d, self._mid(mat)))

    def add_triangle(self, a, b, c, mat: Material):
        self._triangles.append((tuple(a), tuple(b), tuple(c), self._mid(mat)))

    def add_mesh_triangles(self, tris, mat: Material):
        """Bulk triangles destined for the mesh accel; `tris` is (N,3,3)."""
        mid = self._mid(mat)
        self._mesh_tris.append((np.asarray(tris, np.float32), mid))

    def add_texture(self, image) -> int:
        """Register a (H, W, 3) float32 linear image; returns texture id."""
        self.textures.append(np.asarray(image, np.float32))
        return len(self.textures) - 1

    def add_texture_file(self, path: str) -> int:
        """Load an image file as a texture (the reference's OpenCV imread
        path, Renderer/Texture.cs:13-60), sRGB-decoded to linear."""
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        return self.add_texture(img ** 2.2)

    def add_video_texture(self, reader) -> int:
        """Bind a live frame reader (video/camera/synthetic) to a texture
        slot (the reference's dynamic Texture wrapping a running reader,
        Renderer/Texture.cs:62-112). The renderer polls the reader each
        frame and refreshes the slot; TAA history resets every frame while
        the scene is live (RaytraceRenderer.cs:171)."""
        from ..video import textures as vidtex
        frame = reader.try_get_frame()
        if frame is not None:
            img = vidtex.frame_to_texture(frame)
        else:
            img = np.zeros((reader.height, reader.width, 3), np.float32)
        tid = self.add_texture(img)
        self.has_dynamic_textures = True
        vidtex.register(self.name, tid, reader)
        return tid

    def add_light(self, pos, color, intensity):
        self._lights.append((tuple(pos), tuple(color), float(intensity)))

    def set_camera(self, pos, yaw=0.0, pitch=0.0, fov=60.0):
        self.default_pos = tuple(pos)
        self.default_yaw = float(yaw)
        self.default_pitch = float(pitch)
        self.default_fov = float(fov)

    # -- build --------------------------------------------------------------

    def build(self) -> SceneData:
        f32, i32 = np.float32, np.int32

        def col(items, idx, dtype, width=0):
            return ([it[idx] for it in items], dtype, width)

        spheres = _table(SphereTable, len(self._spheres),
                         center=col(self._spheres, 0, f32, 3),
                         radius=col(self._spheres, 1, f32),
                         mat=col(self._spheres, 2, i32))
        boxes = _table(BoxTable, len(self._boxes),
                       bmin=col(self._boxes, 0, f32, 3),
                       bmax=col(self._boxes, 1, f32, 3),
                       mat=col(self._boxes, 2, i32))
        rects = _table(RectTable, len(self._rects),
                       axis=col(self._rects, 0, i32),
                       k=col(self._rects, 1, f32),
                       u0=col(self._rects, 2, f32), u1=col(self._rects, 3, f32),
                       v0=col(self._rects, 4, f32), v1=col(self._rects, 5, f32),
                       mat=col(self._rects, 6, i32))
        cylinders = _table(CylinderTable, len(self._cylinders),
                           cx=col(self._cylinders, 0, f32),
                           cz=col(self._cylinders, 1, f32),
                           radius=col(self._cylinders, 2, f32),
                           ymin=col(self._cylinders, 3, f32),
                           ymax=col(self._cylinders, 4, f32),
                           capped=col(self._cylinders, 5, np.bool_),
                           mat=col(self._cylinders, 6, i32))
        disks = _table(DiskTable, len(self._disks),
                       center=col(self._disks, 0, f32, 3),
                       normal=col(self._disks, 1, f32, 3),
                       radius=col(self._disks, 2, f32),
                       mat=col(self._disks, 3, i32))
        planes = _table(PlaneTable, len(self._planes),
                        normal=col(self._planes, 0, f32, 3),
                        d=col(self._planes, 1, f32),
                        mat=col(self._planes, 2, i32))

        tri_items = []
        for (a, b, c, mid) in self._triangles:
            a = np.asarray(a, f32); b = np.asarray(b, f32); c = np.asarray(c, f32)
            e1, e2 = b - a, c - a
            n = np.cross(e1, e2)
            n = n / max(1e-20, float(np.linalg.norm(n)))
            tri_items.append((a, e1, e2, n.astype(f32), mid))
        triangles = _table(TriangleTable, len(tri_items),
                           a=col(tri_items, 0, f32, 3),
                           e1=col(tri_items, 1, f32, 3),
                           e2=col(tri_items, 2, f32, 3),
                           n=col(tri_items, 3, f32, 3),
                           mat=col(tri_items, 4, i32))

        lights = _table(LightTable, len(self._lights),
                        pos=col(self._lights, 0, f32, 3),
                        color=col(self._lights, 1, f32, 3),
                        intensity=col(self._lights, 2, f32))

        mesh = None
        mesh_clusters = None
        mesh_clusters_lod = None
        mesh_clusters_fine = None
        mesh_clusters_shadow = None
        if self._mesh_tris:
            tris = np.concatenate(
                [np.asarray(t, f32).reshape(-1, 3, 3)
                 for t, _ in self._mesh_tris])
            mat_ids = np.concatenate(
                [np.full(np.asarray(t).reshape(-1, 3, 3).shape[0], m, i32)
                 for t, m in self._mesh_tris])
            a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
            if tris.shape[0] >= CLUSTER_MIN_TRIS:
                # Big static meshes take the tile-synchronous cluster-matmul
                # path (ops/mesh_clusters.py); the per-ray skip-link walk is
                # gather-bound at this size and its host SAH build with
                # LEAF_K=4 would dominate scene construction.
                from ..ops.mesh_clusters import build_clusters
                mesh_clusters = build_clusters(a, b, c, mat_ids)
                # Secondary-ray proxy: incoherent shadow/bounce sweeps cost
                # ~C per ray tile, so a vertex-clustered low-poly set cuts
                # them by the reduction factor (scene/lod.py has the why).
                from .lod import simplify_soup
                target = min(LOD_TARGET_TRIS,
                             max(8192, tris.shape[0] // 4))
                lod_tris, lod_mats, t_bias = simplify_soup(
                    tris, mat_ids, target)
                # Fine PRIMARY proxy for ultra-dense meshes: vertex
                # clustering at a sub-pixel cell. Its surface deviation
                # (fine_bias) adds to the coarse proxy's t_bias because
                # secondary-ray origins now sit on the fine surface.
                fine_bias = 0.0
                if tris.shape[0] >= 3 * PRIMARY_LOD_TARGET_TRIS:
                    f_tris, f_mats, fine_bias = simplify_soup(
                        tris, mat_ids, PRIMARY_LOD_TARGET_TRIS)
                    mesh_clusters_fine = build_clusters(
                        f_tris[:, 0], f_tris[:, 1], f_tris[:, 2], f_mats,
                        kc=PROXY_KC)
                if lod_tris.shape[0] <= tris.shape[0] // 4:
                    mesh_clusters_lod = build_clusters(
                        lod_tris[:, 0], lod_tris[:, 1], lod_tris[:, 2],
                        lod_mats, t_bias=t_bias + fine_bias, kc=PROXY_KC)
                    # Occlusion-only set: simplify the LOD soup further
                    # (shadow tests scale with triangle count; shadows
                    # tolerate it — measured image delta on the dragon
                    # below 2e-3 mean).
                    if lod_tris.shape[0] >= 2 * SHADOW_LOD_TARGET_TRIS:
                        s_tris, s_mats, s_bias = simplify_soup(
                            lod_tris, lod_mats, SHADOW_LOD_TARGET_TRIS)
                        mesh_clusters_shadow = build_clusters(
                            s_tris[:, 0], s_tris[:, 1], s_tris[:, 2],
                            s_mats,
                            t_bias=t_bias + fine_bias + s_bias,
                            kc=PROXY_KC)
            else:
                # Sub-cluster meshes build ON DEVICE via the LBVH (Morton
                # sort + complete-tree reduction, ops/lbvh.py) — the
                # scene-switch/geometry-dirty path the reference serves
                # with its CPU binned-SAH builder (Scene.RebuildBVH,
                # Scenes/Scene.cs:66-69). One jitted dispatch instead of a
                # host build; the host SAH builder (ops/mesh_bvh.py)
                # remains for tests and offline tooling.
                from ..ops.lbvh import build_lbvh
                mesh = jax.jit(build_lbvh)(a, b, c, jnp.asarray(mat_ids))

        textures = None
        if self.textures:
            th = max(t.shape[0] for t in self.textures)
            tw = max(t.shape[1] for t in self.textures)
            padded = [np.pad(t, ((0, th - t.shape[0]), (0, tw - t.shape[1]), (0, 0)))
                      for t in self.textures]
            textures = jnp.asarray(np.stack(padded))

        mesh_all_opaque = all(
            self.bank._mats[mid].transparency <= 0.0
            for _, mid in self._mesh_tris) if self._mesh_tris else True
        any_transparent = any(m.transparency > 0.0
                              for m in self.bank._mats)
        return SceneData(
            materials=self.bank.build(),
            spheres=spheres, boxes=boxes, rects=rects, cylinders=cylinders,
            disks=disks, planes=planes, triangles=triangles,
            mesh=mesh, mesh_clusters=mesh_clusters,
            mesh_clusters_lod=mesh_clusters_lod,
            mesh_clusters_fine=mesh_clusters_fine,
            mesh_clusters_shadow=mesh_clusters_shadow,
            voxels=self.voxels, lights=lights,
            ambient_color=jnp.asarray(self.ambient_color, jnp.float32),
            ambient_intensity=jnp.asarray(self.ambient_intensity, jnp.float32),
            bg_top=jnp.asarray(self.bg_top, jnp.float32),
            bg_bottom=jnp.asarray(self.bg_bottom, jnp.float32),
            textures=textures,
            name=self.name,
            binary_shadows=self.binary_shadows,
            has_dynamic_textures=self.has_dynamic_textures,
            defaults=(*(float(x) for x in self.default_pos),
                      self.default_yaw, self.default_pitch, self.default_fov),
            mesh_all_opaque=mesh_all_opaque,
            any_transparent=any_transparent,
        )
