"""Auto-exposure + ACES filmic tone mapping + saturation post.

Port of /root/reference/ConsoleGame/RayTracing/ToneMapper.cs: log-average
auto-exposure with EMA smoothing and [min,max] clamping over a strided,
sky-masked sample of the HDR buffer (:49-91), ACES filmic curve (:247-260),
gamma encode, and saturation/vibrance (:223-238). The exposure EMA is a
device scalar threaded through the frame state; the strided reduction is a
masked mean — under multi-chip pixel sharding XLA turns it into a psum.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig
from .taa import luma


def update_exposure(hdr, sky, ae_exposure, cfg: RenderConfig, sample_step: int = 2):
    """Returns (new_ae_exposure, effective_exposure)."""
    if not cfg.auto_exposure:
        return ae_exposure, cfg.tone_exposure * ae_exposure
    step = max(2, sample_step)
    lum = luma(hdr[::step, ::step])
    use = (~sky[::step, ::step]) & (lum > 0.0)
    log_l = jnp.where(use, jnp.log(1e-6 + lum), 0.0)
    cnt = jnp.sum(use)
    avg_log = jnp.sum(log_l) / jnp.maximum(1, cnt)
    avg_lum = jnp.exp(avg_log)
    target = jnp.clip(cfg.ae_key / jnp.maximum(1e-6, avg_lum), cfg.ae_min, cfg.ae_max)
    target = jnp.where(cnt > 0, target, ae_exposure)
    s = 1.0 - jnp.exp(-jnp.float32(cfg.ae_speed))
    new_ae = ae_exposure + (target - ae_exposure) * s
    return new_ae, cfg.tone_exposure * new_ae


def aces_film(x):
    num = x * (2.51 * x + 0.03)
    den = x * (2.43 * x + 0.59) + 0.14
    return jnp.clip(jnp.where(den > 0.0, num / den, 0.0), 0.0, 1.0)


def map_pixels(hdr, effective_exposure, cfg: RenderConfig):
    """HDR linear -> display-ready [0,1] (ToneMapper.MapPixel semantics)."""
    c = jnp.maximum(0.0, hdr) * effective_exposure
    c = aces_film(c)
    inv_gamma = 1.0 / max(0.1, cfg.tone_gamma)
    c = jnp.power(jnp.clip(c, 0.0, 1.0), inv_gamma)

    y = luma(c)[..., None]
    maxc = jnp.max(c, axis=-1, keepdims=True)
    minc = jnp.min(c, axis=-1, keepdims=True)
    chroma = maxc - minc
    vib = 1.0 + cfg.tone_vibrance * (1.0 - chroma)
    f = cfg.tone_saturation * vib
    return jnp.clip(y + (c - y) * f, 0.0, 1.0)
