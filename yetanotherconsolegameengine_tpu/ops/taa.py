"""Temporal anti-aliasing blend with guide-based disocclusion + luminance clamp.

Functional port of the reference's serial per-pixel pass
(/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:274-398,
``TemporalBlendWithClamp``) and the camera-motion reset policy
(RayTracing/TemporalAA.cs:58-76). The whole (H, W) blend is one fused
vector program; the 3x3 neighborhood clamp is built from shifted copies
with edge-clamped padding.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig

_LUMA = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)


def luma(c):
    return jnp.einsum("...k,k->...", c, _LUMA)


def _shifted(a, oy, ox):
    """a shifted by (oy, ox) with edge clamp, matching the reference's
    index clamping at :349-355."""
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (a.ndim - 2)
    ap = jnp.pad(a, pad, mode="edge")
    h, w = a.shape[:2]
    return ap[1 + oy:1 + oy + h, 1 + ox:1 + ox + w]


def temporal_blend(current, normal, depth, sky, history, prev_normal,
                   prev_depth, prev_sky, history_valid, force_reset,
                   cfg: RenderConfig):
    """Returns (blended, ...) — blended is also the new history; guides for
    the next frame are simply (normal, depth, sky)."""
    alpha = jnp.clip(cfg.taa_alpha, 0.0, 1.0)

    # Disocclusion / reactive mask from guides.
    sky_flip = sky != prev_sky
    nonfinite = ~(jnp.isfinite(depth) & jnp.isfinite(prev_depth))
    dz = jnp.abs(depth - prev_depth)
    rel = dz / jnp.maximum(1e-4, jnp.minimum(depth, prev_depth))
    n_now = normal / jnp.maximum(1e-20, jnp.linalg.norm(normal, axis=-1, keepdims=True))
    n_prev = prev_normal / jnp.maximum(1e-20, jnp.linalg.norm(prev_normal, axis=-1, keepdims=True))
    ndot = jnp.sum(n_now * n_prev, axis=-1)
    react = sky_flip | nonfinite | (rel > 0.05) | (ndot < 0.8)
    local_alpha = jnp.where(react, 1.0, alpha)

    # 3x3 same-sky neighborhood luminance bounds.
    lum = luma(current)
    r = max(0, cfg.taa_clamp_radius)
    min_l = jnp.full_like(lum, jnp.inf)
    max_l = jnp.full_like(lum, -jnp.inf)
    for oy in range(-r, r + 1):
        for ox in range(-r, r + 1):
            ls = _shifted(lum, oy, ox)
            ss = _shifted(sky, oy, ox)
            ok = ss == sky
            min_l = jnp.minimum(min_l, jnp.where(ok, ls, jnp.inf))
            max_l = jnp.maximum(max_l, jnp.where(ok, ls, -jnp.inf))

    rng = max_l - min_l
    l_min = min_l - rng * cfg.taa_luminance_pad
    l_max = max_l + rng * cfg.taa_luminance_pad
    prev = history
    prev_l = luma(prev)
    scale_hi = l_max / jnp.maximum(1e-6, prev_l)
    scale_lo = l_min / jnp.maximum(1e-6, prev_l)
    scale = jnp.where(prev_l > l_max, scale_hi,
                      jnp.where(prev_l < l_min, scale_lo, 1.0))
    prev = prev * scale[..., None]

    a3 = local_alpha[..., None]
    blended = prev * (1.0 - a3) + current * a3

    reset = force_reset | ~history_valid
    blended = jnp.where(reset, current, blended)
    return blended


def should_reset_history(cam_pos, yaw, pitch, last_cam, last_yaw, last_pitch,
                         have_last, cfg: RenderConfig):
    """Camera-motion reset test (TemporalAA.cs:58-67); `have_last` guards the
    first frame (the reference encodes that with NaN sentinels)."""
    d = cam_pos - last_cam
    trans = jnp.sqrt(jnp.sum(d * d))
    moved = ((trans > cfg.motion_trans_reset)
             | (jnp.abs(yaw - last_yaw) > cfg.motion_rot_reset)
             | (jnp.abs(pitch - last_pitch) > cfg.motion_rot_reset))
    return have_last & moved
