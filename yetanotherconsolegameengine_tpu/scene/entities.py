"""Scene entity layer: per-frame dynamic updates to scene tables.

The reference's ISceneEntity (/root/reference/ConsoleGame/RayTracing/
Scenes/Scene.cs:537-542) mutates Hittables and requests BVH rebuilds; its
dynamic entities live in TestScenesRandom.cs:708-829 (BobbingSphereEntity,
OrbitingLightEntity, PulsingLightEntity, UVWobbleEntity).

TPU inversion: an entity is a pure function patching the immutable
SceneData pytree — a row of the sphere/light tables swaps via ``.at[]``
updates (tiny device ops, no recompiles since every shape is static).
There is no BVH to rebuild: primitive tables are brute-force swept, so
"GeometryDirty" costs nothing. Dynamic scenes stay on the XLA trace path
(the Pallas kernel bakes geometry as compile-time constants).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp

from .tables import SceneData


def _sin(x):
    """sin that stays HOST math for the eager per-tick path (a Python
    float in keeps device dispatches at zero) but traces when ``t`` rides
    a lax.scan (the batched app loop folds entity updates into the frame
    scan, render/renderer.py frame_scan(scene_fn=...))."""
    return jnp.sin(x) if isinstance(x, jax.Array) else math.sin(x)


def _cos(x):
    return jnp.cos(x) if isinstance(x, jax.Array) else math.cos(x)


class SceneEntity:
    """Protocol: patch the scene for time ``t`` (seconds)."""

    def apply(self, scene: SceneData, t: float) -> SceneData:
        raise NotImplementedError


@dataclasses.dataclass
class BobbingSphereEntity(SceneEntity):
    """Sphere bobbing on Y (BobbingSphereEntity, TestScenesRandom.cs:708)."""

    index: int
    base_center: Sequence[float]
    amplitude: float = 0.5
    freq_hz: float = 0.4

    def apply(self, scene, t):
        y = self.base_center[1] + self.amplitude * _sin(
            2.0 * math.pi * self.freq_hz * t)
        center = scene.spheres.center.at[self.index].set(
            (self.base_center[0], y, self.base_center[2]))
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, center=center))


@dataclasses.dataclass
class OrbitingLightEntity(SceneEntity):
    """Light circling a pivot (OrbitingLightEntity)."""

    index: int
    pivot: Sequence[float]
    radius: float = 3.0
    height: float = 3.0
    period_s: float = 6.0

    def apply(self, scene, t):
        ang = 2.0 * math.pi * t / self.period_s
        pos = (self.pivot[0] + self.radius * _cos(ang),
               self.pivot[1] + self.height,
               self.pivot[2] + self.radius * _sin(ang))
        lights = dataclasses.replace(
            scene.lights, pos=scene.lights.pos.at[self.index].set(pos))
        return dataclasses.replace(scene, lights=lights)


@dataclasses.dataclass
class PulsingLightEntity(SceneEntity):
    """Light intensity breathing (PulsingLightEntity)."""

    index: int
    base_intensity: float
    depth: float = 0.5        # fraction of base
    freq_hz: float = 0.8

    def apply(self, scene, t):
        k = 1.0 + self.depth * _sin(2.0 * math.pi * self.freq_hz * t)
        lights = dataclasses.replace(
            scene.lights,
            intensity=scene.lights.intensity.at[self.index].set(
                self.base_intensity * k))
        return dataclasses.replace(scene, lights=lights)


@dataclasses.dataclass
class UVWobbleEntity(SceneEntity):
    """Wobbles a material's UV scale (UVWobbleEntity)."""

    mat_id: int
    base_scale: float = 1.0
    depth: float = 0.3
    freq_hz: float = 0.5

    def apply(self, scene, t):
        k = self.base_scale * (1.0 + self.depth * _sin(
            2.0 * math.pi * self.freq_hz * t))
        mats = dataclasses.replace(
            scene.materials,
            uv_scale=scene.materials.uv_scale.at[self.mat_id].set(k))
        return dataclasses.replace(scene, materials=mats)


@jax.jit
def _spin_lbvh(a, b, c, mat, ang, pivot):
    """Rotate the mesh about Y at ``pivot`` and rebuild its BVH on device
    (ops/lbvh.py — Morton sort + complete-tree reduction). Fully jitted:
    per frame this is ONE device dispatch, not a host build."""
    from ..ops.lbvh import build_lbvh
    ca = jnp.cos(ang)
    sa = jnp.sin(ang)

    def rot(v):
        p = v - pivot
        x = p[:, 0] * ca + p[:, 2] * sa
        z = -p[:, 0] * sa + p[:, 2] * ca
        return jnp.stack([x, p[:, 1], z], axis=1) + pivot

    return build_lbvh(rot(a), rot(b), rot(c), mat)


@dataclasses.dataclass
class SpinningMeshEntity(SceneEntity):
    """Rigid mesh spinning about Y with a PER-FRAME on-device LBVH rebuild
    — the reference's GeometryDirty -> Scene.RebuildBVH path
    (Scenes/Scene.cs:66-69,122-127; BobbingSphereEntity requests exactly
    this every frame, TestScenesRandom.cs:708-715). The rebuilt tree has
    the same static shapes every frame (same T), so every rebuild hits one
    compiled program."""

    a0: Any              # (T, 3) base vertex arrays (device)
    b0: Any
    c0: Any
    mat: Any             # (T,) i32 material ids
    pivot: Sequence[float]
    spin_hz: float = 0.12

    def apply(self, scene, t):
        ang = jnp.float32(2.0 * math.pi * self.spin_hz * t)
        mesh = _spin_lbvh(self.a0, self.b0, self.c0, self.mat, ang,
                          jnp.asarray(self.pivot, jnp.float32))
        return dataclasses.replace(scene, mesh=mesh)


class DynamicScene:
    """A SceneData plus its entities: ``at_time(t)`` is the frame's scene
    (the Scene.Update + GeometryDirty path, Scene.cs:100-127, without any
    rebuild cost)."""

    def __init__(self, base: SceneData, entities: List[SceneEntity]):
        self.base = base
        self.entities = entities
        self.t = 0.0

    def update(self, dt: float) -> SceneData:
        self.t += dt
        return self.at_time(self.t)

    def at_time(self, t: float) -> SceneData:
        scene = self.base
        for e in self.entities:
            scene = e.apply(scene, t)
        return scene
