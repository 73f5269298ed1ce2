"""Materials as a table, not closures.

The reference attaches either a `Material` struct or a
`Func<Vec3,Vec3,float,Material>` closure to every object
(/root/reference/ConsoleGame/RayTracing/Material.cs:5-61,
Scenes/Scenes.cs:408-428). Closures don't trace; instead every primitive
carries an int id into a structure-of-arrays material bank, and procedural
materials (solid / checker / texture) become a small `proc` code evaluated
at the hit point inside the shading kernel — the same table-ization the
reference itself performs when serializing scenes over TCP
(Scenes/SyncScene.cs:282-401 "baked materials").
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PROC_SOLID = 0
PROC_CHECKER = 1
PROC_TEXTURE = 2
# Per-voxel-cell albedo tint: multiply by 1 + 0.08*((hash(cell) % 5) - 2),
# the same variation band as the voxel palette's meta tints
# (VoxelMaterialPalette.MaterialLookup's strata/grass meta factors). The
# streamed-world surface mesher merges faces across meta variants — per-cell
# bank ids would shatter the greedy rectangles ~10x — and restores the
# variation procedurally from the hit cell (compute over memory: the tint
# is 6 VPU int ops instead of distinct material rows).
PROC_CELL_TINT = 3


@dataclasses.dataclass(frozen=True)
class Material:
    """Host-side material description (hashable, deduped into the bank)."""

    albedo: Tuple[float, float, float] = (0.7, 0.7, 0.7)
    specular: float = 0.0
    reflectivity: float = 0.0
    emission: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    transparency: float = 0.0
    ior: float = 1.5
    transmission: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Procedural surface: solid albedo, XZ checker, or texture lookup.
    proc: int = PROC_SOLID
    albedo2: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # checker 2nd color
    proc_scale: float = 1.0                                # checker cell size
    tex_id: int = -1
    tex_weight: float = 1.0
    uv_scale: float = 1.0

    @staticmethod
    def solid(albedo, specular=0.0, reflectivity=0.0, emission=(0.0, 0.0, 0.0)):
        return Material(albedo=tuple(albedo), specular=specular,
                        reflectivity=reflectivity, emission=tuple(emission))

    @staticmethod
    def emissive(emission):
        """Emissive panel: black albedo + emission (Scenes.cs:413-416)."""
        return Material(albedo=(0.0, 0.0, 0.0), emission=tuple(emission))

    @staticmethod
    def checker(a, b, scale, specular=0.0, reflectivity=0.0):
        """World-XZ checker (Scenes.cs:418-428)."""
        return Material(albedo=tuple(a), albedo2=tuple(b), proc=PROC_CHECKER,
                        proc_scale=scale, specular=specular,
                        reflectivity=reflectivity)

    @staticmethod
    def glass(albedo=(1.0, 1.0, 1.0), reflectivity=0.02, transparency=1.0,
              ior=1.5, transmission=(1.0, 1.0, 1.0)):
        return Material(albedo=tuple(albedo), reflectivity=reflectivity,
                        transparency=transparency, ior=ior,
                        transmission=tuple(transmission))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """Device SoA material bank; every field indexed by material id."""

    albedo: jax.Array        # (M, 3)
    specular: jax.Array      # (M,)
    reflectivity: jax.Array  # (M,)
    emission: jax.Array      # (M, 3)
    transparency: jax.Array  # (M,)
    ior: jax.Array           # (M,)
    transmission: jax.Array  # (M, 3)
    proc: jax.Array          # (M,) int32
    albedo2: jax.Array       # (M, 3)
    proc_scale: jax.Array    # (M,)
    tex_id: jax.Array        # (M,) int32
    tex_weight: jax.Array    # (M,)
    uv_scale: jax.Array      # (M,)


class MaterialBank:
    """Host-side builder that dedupes `Material`s and emits a MaterialTable."""

    def __init__(self):
        self._mats: list[Material] = []
        self._index: dict[Material, int] = {}
        # id 0 is a neutral gray default (lookup fallback, VolumeGrid-style).
        self.add(Material())

    def add(self, mat: Material) -> int:
        idx = self._index.get(mat)
        if idx is None:
            idx = len(self._mats)
            self._mats.append(mat)
            self._index[mat] = idx
        return idx

    def __len__(self) -> int:
        return len(self._mats)

    def build(self) -> MaterialTable:
        m = self._mats
        f32 = np.float32
        return MaterialTable(
            albedo=jnp.asarray(np.array([x.albedo for x in m], f32)),
            specular=jnp.asarray(np.array([x.specular for x in m], f32)),
            reflectivity=jnp.asarray(np.array([x.reflectivity for x in m], f32)),
            emission=jnp.asarray(np.array([x.emission for x in m], f32)),
            transparency=jnp.asarray(np.array([x.transparency for x in m], f32)),
            ior=jnp.asarray(np.array([x.ior for x in m], f32)),
            transmission=jnp.asarray(np.array([x.transmission for x in m], f32)),
            proc=jnp.asarray(np.array([x.proc for x in m], np.int32)),
            albedo2=jnp.asarray(np.array([x.albedo2 for x in m], f32)),
            proc_scale=jnp.asarray(np.array([x.proc_scale for x in m], f32)),
            tex_id=jnp.asarray(np.array([x.tex_id for x in m], np.int32)),
            tex_weight=jnp.asarray(np.array([x.tex_weight for x in m], f32)),
            uv_scale=jnp.asarray(np.array([x.uv_scale for x in m], f32)),
        )


def gather_material(table: MaterialTable, mat_id) -> MaterialTable:
    """Gather per-pixel material records from the bank (mat_id: (...,) i32).

    TPU note: per-field gathers cost ~5x the whole intersection sweep on
    the VPU, so for small banks the 13 field gathers become ONE one-hot
    matmul on the MXU: onehot(mat_id) @ packed_fields. Larger banks fall
    back to a single packed-row gather.
    """
    M = table.albedo.shape[0]
    packed = jnp.concatenate([
        table.albedo,                     # 0:3
        table.emission,                   # 3:6
        table.transmission,               # 6:9
        table.albedo2,                    # 9:12
        table.specular[:, None],          # 12
        table.reflectivity[:, None],      # 13
        table.transparency[:, None],      # 14
        table.ior[:, None],               # 15
        table.proc.astype(jnp.float32)[:, None],        # 16
        table.proc_scale[:, None],        # 17
        table.tex_id.astype(jnp.float32)[:, None],      # 18
        table.tex_weight[:, None],        # 19
        table.uv_scale[:, None],          # 20
    ], axis=1)                            # (M, 21)
    flat_id = mat_id.reshape(-1)
    if M <= 128:
        onehot = (flat_id[:, None] == jnp.arange(M, dtype=mat_id.dtype)[None]
                  ).astype(jnp.float32)
        rows = jnp.matmul(onehot, packed,
                          precision=jax.lax.Precision.HIGHEST)
    else:
        rows = packed[flat_id]            # single contiguous-row gather
    rows = rows.reshape(*mat_id.shape, 21)
    return MaterialTable(
        albedo=rows[..., 0:3], emission=rows[..., 3:6],
        transmission=rows[..., 6:9], albedo2=rows[..., 9:12],
        specular=rows[..., 12], reflectivity=rows[..., 13],
        transparency=rows[..., 14], ior=rows[..., 15],
        proc=rows[..., 16].astype(jnp.int32), proc_scale=rows[..., 17],
        tex_id=rows[..., 18].astype(jnp.int32), tex_weight=rows[..., 19],
        uv_scale=rows[..., 20])


def sample_albedo(mat: MaterialTable, pos, uv, textures: Optional[jax.Array],
                  tint_pos=None):
    """Evaluate the procedural surface color at a hit.

    Solid / checker follow Scenes.cs:408-428; texture blending follows
    RaytraceRenderer.SampleAlbedo (RaytraceRenderer.cs:724-735) with
    bilinear wrap sampling like Renderer/Texture.cs.
    ``pos`` (..., 3), ``uv`` (..., 2). Returns (..., 3).

    ``tint_pos``: position nudged INSIDE the surface (hit + eps along the
    ray) so PROC_CELL_TINT resolves the SOLID cell rather than the
    boundary-ambiguous face point; defaults to ``pos``.
    """
    base = mat.albedo
    # Checker in world XZ.
    cx = jnp.floor(pos[..., 0] / mat.proc_scale).astype(jnp.int32)
    cz = jnp.floor(pos[..., 2] / mat.proc_scale).astype(jnp.int32)
    check = ((cx + cz) & 1) == 0
    checker = jnp.where(check[..., None], mat.albedo, mat.albedo2)
    out = jnp.where((mat.proc == PROC_CHECKER)[..., None], checker, base)

    # Per-cell tint (streamed-world surface quads, world/surface.py).
    tp = pos if tint_pos is None else tint_pos
    qx = jnp.floor(tp[..., 0] / mat.proc_scale).astype(jnp.int32)
    qy = jnp.floor(tp[..., 1] / mat.proc_scale).astype(jnp.int32)
    qz = jnp.floor(tp[..., 2] / mat.proc_scale).astype(jnp.int32)
    hsh = ((qx * jnp.int32(0x27D4EB2F))
           ^ (qy * np.int32(np.uint32(0x9E3779B1)))
           ^ (qz * np.int32(np.uint32(0x85EBCA6B))))
    hsh = hsh ^ (hsh >> 15)
    hsh = hsh * jnp.int32(0x165667B1)
    hsh = hsh ^ (hsh >> 13)
    variant = jnp.abs(hsh) % 5
    tint = 1.0 + 0.08 * (variant.astype(jnp.float32) - 2.0)
    out = jnp.where((mat.proc == PROC_CELL_TINT)[..., None],
                    jnp.clip(base * tint[..., None], 0.0, 1.0), out)

    if textures is not None and textures.size > 0:
        tiles = jnp.maximum(1e-6, mat.uv_scale)
        tex = _sample_bilinear(textures, jnp.maximum(mat.tex_id, 0),
                               uv[..., 0] * tiles, uv[..., 1] * tiles)
        w = jnp.clip(mat.tex_weight, 0.0, 1.0)[..., None]
        blended = out * (1.0 - w) + tex * w
        use_tex = ((mat.proc == PROC_TEXTURE) & (mat.tex_id >= 0))[..., None]
        out = jnp.where(use_tex, jnp.clip(blended, 0.0, 1.0), out)
    return out


def _sample_bilinear(textures, tex_id, u, v):
    """Bilinear sample from the (T, H, W, 3) atlas with UV wrap + V flip."""
    _, th, tw, _ = textures.shape
    uu = u - jnp.floor(u)
    vv = 1.0 - (v - jnp.floor(v))
    x = uu * (tw - 1)
    y = vv * (th - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, tw - 1)
    y1 = jnp.minimum(y0 + 1, th - 1)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    c00 = textures[tex_id, y0, x0]
    c10 = textures[tex_id, y0, x1]
    c01 = textures[tex_id, y1, x0]
    c11 = textures[tex_id, y1, x1]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy
