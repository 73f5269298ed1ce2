"""Mesh showcase scenes (the reference's MeshScenes,
/root/reference/ConsoleGame/RayTracing/Scenes/MeshScenes.cs:106-376).

Each scene drops one (or all) hero meshes on a checker floor with a
console-16-aligned material palette (MeshSwatches, MeshScenes.cs:13-103)
and sits the mesh on the ground from its pre-read bounds
(AddMeshAutoGround, MeshScenes.cs:180-236). Stanford OBJ assets are loaded
when discoverable (``find_asset``); otherwise procedural stand-ins keep the
scenes self-contained.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .materials import Material
from .mesh_loader import (find_asset, load_obj, make_dragon, make_gem,
                          make_icosphere, make_knot, make_torus, mesh_bounds,
                          transform_mesh)
from .tables import SceneBuilder, SceneData

# MeshSwatches: flat-ish plastic materials aligned to the console palette
# (MeshScenes.cs:13-103).
SWATCH = {
    "ivory": Material.solid((0.93, 0.91, 0.85), specular=0.10),
    "jade": Material.solid((0.35, 0.75, 0.55), specular=0.25, reflectivity=0.08),
    "copper": Material.solid((0.85, 0.45, 0.25), specular=0.45, reflectivity=0.25),
    "slate": Material.solid((0.35, 0.38, 0.42), specular=0.15),
    "gold": Material.solid((0.95, 0.78, 0.25), specular=0.5, reflectivity=0.35),
    "glass": Material.glass(reflectivity=0.04, ior=1.5),
}


def _mesh_or_fallback(asset: str, fallback, scale: float, at,
                      normalize: bool = True) -> np.ndarray:
    path = find_asset(asset)
    if path is not None:
        return load_obj(path, normalize=normalize, scale=scale, translate=at)
    return transform_mesh(fallback(), normalize=normalize, scale=scale,
                          translate=at)


def _auto_ground(tris: np.ndarray, floor_y: float = 0.0) -> np.ndarray:
    """Translate so the mesh's min-Y sits on the floor (MeshScenes.cs:180+)."""
    lo, _ = mesh_bounds(tris)
    return tris + np.asarray([0.0, floor_y - lo[1], 0.0], np.float32)


def _stage(s: SceneBuilder):
    s.ambient_color, s.ambient_intensity = (1, 1, 1), 0.04
    s.add_xz_rect(-12.0, 12.0, -12.0, 6.0, 0.0,
                  Material.checker((0.82, 0.82, 0.82), (0.2, 0.2, 0.2), 0.75,
                                   specular=0.05))
    s.add_light((2.5, 5.0, 2.0), (1.0, 0.97, 0.9), 120.0)
    s.add_light((-3.0, 4.0, -1.0), (0.85, 0.9, 1.0), 60.0)
    s.bg_top = (0.55, 0.75, 1.0)
    s.bg_bottom = (0.95, 0.98, 1.0)


def _single_mesh_scene(name: str, asset: Optional[str], fallback,
                       mat: Material, scale: float = 2.0) -> SceneData:
    s = SceneBuilder(name)
    _stage(s)
    if asset is not None:
        tris = _mesh_or_fallback(asset, fallback, scale, (0.0, 0.0, -3.5))
    else:
        tris = transform_mesh(fallback(), normalize=True, scale=scale,
                              translate=(0.0, 0.0, -3.5))
    tris = _auto_ground(tris)
    s.add_mesh_triangles(tris, mat)
    s.set_camera((0.0, 1.6, 1.5), fov=60.0)
    return s.build()


def build_bunny_scene() -> SceneData:
    """Stanford bunny (MeshScenes.BuildBunnyScene, MeshScenes.cs:106-117);
    icosphere stand-in when the asset is absent."""
    return _single_mesh_scene("bunny", "stanford-bunny.obj",
                              lambda: make_icosphere(3), SWATCH["ivory"])


def build_teapot_scene() -> SceneData:
    """Utah teapot (MeshScenes.cs:119-127); torus stand-in."""
    return _single_mesh_scene("teapot", "teapot.obj",
                              lambda: make_torus(), SWATCH["copper"])


def build_cow_scene() -> SceneData:
    """Cow mesh (MeshScenes.cs:129-133); torus-knot stand-in."""
    return _single_mesh_scene("cow", "cow.obj",
                              lambda: make_knot(), SWATCH["jade"])


def build_dragon_scene() -> SceneData:
    """xyzrgb dragon (MeshScenes.cs:135-143). The dragon OBJ is a missing
    large blob in the reference mount, so the stand-in is ``make_dragon``
    — a ~600k-triangle procedural hero mesh, the same order as the real
    asset, so the BASELINE.md 60fps@240x135 north star is actually
    measured; a real dragon OBJ is used when discoverable."""
    return _single_mesh_scene("dragon", "xyzrgb_dragon.obj",
                              make_dragon, SWATCH["gold"], scale=2.6)


def build_glass_gem_scene() -> SceneData:
    """Faceted refractive mesh — exercises triangle + Fresnel paths."""
    return _single_mesh_scene("glass_gem", None, lambda: make_gem(),
                              SWATCH["glass"], scale=1.6)


def build_all_meshes_scene() -> SceneData:
    """Every hero mesh in a ring (MeshScenes.BuildAllMeshesScene,
    MeshScenes.cs:238-376)."""
    s = SceneBuilder("all_meshes")
    _stage(s)
    entries = [
        ("stanford-bunny.obj", lambda: make_icosphere(2), SWATCH["ivory"], 1.6),
        ("teapot.obj", lambda: make_torus(), SWATCH["copper"], 1.6),
        ("cow.obj", lambda: make_knot(), SWATCH["jade"], 1.6),
        (None, lambda: make_gem(), SWATCH["glass"], 1.2),
    ]
    radius = 2.8
    for i, (asset, fb, mat, scale) in enumerate(entries):
        ang = i * (2.0 * math.pi / len(entries)) + math.pi / 4
        at = (radius * math.cos(ang), 0.0, -4.0 + radius * math.sin(ang))
        if asset is not None:
            tris = _mesh_or_fallback(asset, fb, scale, at)
        else:
            tris = transform_mesh(fb(), normalize=True, scale=scale,
                                  translate=at)
        s.add_mesh_triangles(_auto_ground(tris), mat)
    s.add_sphere((0.0, 1.0, -4.0), 1.0,
                 Material.solid((0.95, 0.95, 0.95), reflectivity=0.92))
    s.set_camera((0.0, 2.2, 1.5), pitch=-0.18, fov=60.0)
    return s.build()


MESH_SCENE_BUILDERS = {
    "bunny": build_bunny_scene,
    "teapot": build_teapot_scene,
    "cow": build_cow_scene,
    "dragon": build_dragon_scene,
    "glass_gem": build_glass_gem_scene,
    "all_meshes": build_all_meshes_scene,
}
