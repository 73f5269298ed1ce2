"""Camera pose and jittered primary-ray generation.

TPU-first equivalent of the reference's per-pixel ray setup
(/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:407-437 —
``BuildCamera``/``ForwardFromYawPitch``/``MakeJitteredRay``): the whole
(H, W) grid of rays is produced as one batched computation inside the jitted
frame step instead of a threaded per-row loop.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from . import sampler


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraPose:
    """Dynamic camera inputs to the frame step (a tiny scalar upload)."""

    pos: jax.Array        # (3,) f32
    yaw: jax.Array        # () f32
    pitch: jax.Array      # () f32
    fov_deg: jax.Array    # () f32

    @staticmethod
    def create(pos=(0.0, 1.0, 0.0), yaw=0.0, pitch=0.0, fov_deg=60.0) -> "CameraPose":
        return CameraPose(
            pos=jnp.asarray(pos, jnp.float32),
            yaw=jnp.asarray(yaw, jnp.float32),
            pitch=jnp.asarray(pitch, jnp.float32),
            fov_deg=jnp.asarray(fov_deg, jnp.float32),
        )


def forward_from_yaw_pitch(yaw, pitch):
    """Forward vector convention: yaw 0 looks down -Z (RaytraceRenderer.cs:413-417)."""
    cp = jnp.cos(pitch)
    return jnp.stack([jnp.sin(yaw) * cp, jnp.sin(pitch), -jnp.cos(yaw) * cp], axis=-1)


def _normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(eps, jnp.sum(v * v, axis=-1, keepdims=True)))


def make_jittered_rays(cam: CameraPose, width: int, height: int, frame_idx):
    """Build the full (H, W) grid of jittered primary rays.

    Per-pixel ordered-dither jitter rotated per frame by the golden-ratio
    sequence, then a pinhole projection through the yaw/pitch camera basis —
    semantics of MakeJitteredRay (RaytraceRenderer.cs:419-437) with the
    per-frame rotation from the frame loop (RaytraceRenderer.cs:178-179).

    Returns (origins, dirs), each (H, W, 3) float32. ``origins`` is the
    broadcast camera position.
    """
    aspect = width / float(height)
    px = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)

    fidx = jnp.asarray(frame_idx, jnp.int32)
    jitter_rot_x = sampler.frac((fidx.astype(jnp.float32) + 1.0) * sampler.GOLDEN_X)
    jitter_rot_y = sampler.frac((fidx.astype(jnp.float32) + 1.0) * sampler.GOLDEN_Y)

    jx = sampler.frac(sampler.blue_noise(px, py, fidx, 0) + jitter_rot_x) - 0.5
    jy = sampler.frac(sampler.blue_noise(px, py, fidx, 1) + jitter_rot_y) - 0.5

    u = ((px.astype(jnp.float32) + 0.5 + jx) / width) * 2.0 - 1.0
    v = 1.0 - ((py.astype(jnp.float32) + 0.5 + jy) / height) * 2.0

    fov_rad = cam.fov_deg * jnp.float32(math.pi / 180.0)
    half_h = jnp.tan(0.5 * fov_rad)
    half_w = half_h * aspect

    fwd = _normalize(forward_from_yaw_pitch(cam.yaw, cam.pitch))
    world_up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    right = _normalize(jnp.cross(fwd, world_up))
    up = _normalize(jnp.cross(right, fwd))

    d = (
        fwd
        + right * (u * half_w)[..., None]
        + up * (v * half_h)[..., None]
    )
    d = _normalize(d)
    o = jnp.broadcast_to(cam.pos, d.shape)
    return o, d
