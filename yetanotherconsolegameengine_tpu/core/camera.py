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


def ray_params(cam: CameraPose, width: int, height: int, frame_idx):
    """Scalar ray-generation parameters as one (18,) f32 vector.

    Shared by make_jittered_rays (XLA path) and the Pallas megakernel's
    in-kernel ray generation, so both paths derive their per-pixel rays
    from IDENTICAL basis/rotation scalars. Layout:

    [0:3] pos  [3:6] fwd  [6:9] right  [9:12] up
    [12] half_w  [13] half_h
    [14] r2 rotation x  [15] r2 rotation y   (blue-noise per-frame rot)
    [16] golden rotation x  [17] golden rotation y  (jitter rot)
    """
    aspect = width / float(height)
    fidx = jnp.asarray(frame_idx, jnp.int32).astype(jnp.float32)
    fov_rad = cam.fov_deg * jnp.float32(math.pi / 180.0)
    half_h = jnp.tan(0.5 * fov_rad)
    half_w = half_h * aspect
    fwd = _normalize(forward_from_yaw_pitch(cam.yaw, cam.pitch))
    world_up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    right = _normalize(jnp.cross(fwd, world_up))
    up = _normalize(jnp.cross(right, fwd))
    rots = jnp.stack([
        sampler.frac((fidx + 1.0) * jnp.float32(sampler.R2_X)),
        sampler.frac((fidx + 1.0) * jnp.float32(sampler.R2_Y)),
        sampler.frac((fidx + 1.0) * jnp.float32(sampler.GOLDEN_X)),
        sampler.frac((fidx + 1.0) * jnp.float32(sampler.GOLDEN_Y)),
    ])
    return jnp.concatenate([
        cam.pos, fwd, right, up,
        jnp.stack([half_w, half_h]), rots]).astype(jnp.float32)


def make_jittered_rays(cam: CameraPose, width: int, height: int, frame_idx,
                       params=None):
    """Build the full (H, W) grid of jittered primary rays.

    Per-pixel ordered-dither jitter rotated per frame by the golden-ratio
    sequence, then a pinhole projection through the yaw/pitch camera basis —
    semantics of MakeJitteredRay (RaytraceRenderer.cs:419-437) with the
    per-frame rotation from the frame loop (RaytraceRenderer.cs:178-179).

    Returns (origins, dirs), each (H, W, 3) float32. ``origins`` is the
    broadcast camera position.

    Derives all scalars via ray_params so the Pallas megakernel's in-kernel
    ray generation (ops/pallas_trace.py) and this path see identical values.
    """
    px = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)

    # ``params``: a precomputed ray_params row (frame scans hoist the ~40
    # scalar ops out of the loop body; see renderer.frame_scan).
    p = ray_params(cam, width, height, frame_idx) if params is None \
        else params
    bn_x = sampler.frac(sampler.bayer_base(px, py) + p[14])
    bn_y = sampler.frac(sampler.bayer_base(px, py) + p[15])
    jx = sampler.frac(bn_x + p[16]) - 0.5
    jy = sampler.frac(bn_y + p[17]) - 0.5

    u = ((px.astype(jnp.float32) + 0.5 + jx) / width) * 2.0 - 1.0
    v = 1.0 - ((py.astype(jnp.float32) + 0.5 + jy) / height) * 2.0

    pos, fwd, right, up = p[0:3], p[3:6], p[6:9], p[9:12]
    d = (
        fwd
        + right * (u * p[12])[..., None]
        + up * (v * p[13])[..., None]
    )
    d = _normalize(d)
    o = jnp.broadcast_to(pos, d.shape)
    return o, d
