"""Edge-aware à-trous wavelet denoise (3 dilated 5x5 passes).

Functional port of the reference's serial pass
(/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:622-722,
``ApplyAtrousDenoise``): a 5-tap B3-spline kernel dilated by 1/2/4, with
per-tap weights from luminance, normal, depth and albedo differences, sky
pixels passed through and cross-sky taps rejected. Here each pass is 25
shifted fused multiply-adds over the whole image — the serial bottleneck the
reference pays on its producer thread disappears into the jitted program.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig
from .taa import luma

_K5 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def _shifted(a, oy, ox, pad):
    p = [(pad, pad), (pad, pad)] + [(0, 0)] * (a.ndim - 2)
    ap = jnp.pad(a, p, mode="edge")
    h, w = a.shape[:2]
    return ap[pad + oy:pad + oy + h, pad + ox:pad + ox + w]


def atrous_denoise(src, albedo, normal, depth, sky, cfg: RenderConfig):
    n0 = normal / jnp.maximum(1e-20, jnp.linalg.norm(normal, axis=-1, keepdims=True))
    a0 = albedo
    z0 = depth
    cur = src
    # One exp of a weighted sum == the product of four exps; shared form
    # with the fused Pallas post kernel (ops/pallas_post.py) so the two
    # post paths stay numerically aligned (and 4x fewer transcendentals).
    inv_c = 1.0 / max(1e-6, cfg.atrous_c_phi)
    inv_n = 1.0 / max(1e-6, cfg.atrous_n_phi)
    inv_z = 1.0 / max(1e-6, cfg.atrous_z_phi)
    inv_a = 1.0 / max(1e-6, cfg.atrous_a_phi)

    for it in range(max(1, cfg.atrous_iterations)):
        step = 1 << it
        pad = 2 * step
        lum0 = luma(cur)
        accum = jnp.zeros_like(cur)
        wsum = jnp.zeros_like(lum0)
        for ky in range(-2, 3):
            wy = _K5[ky + 2]
            for kx in range(-2, 3):
                w_base = _K5[kx + 2] * wy
                oy, ox = ky * step, kx * step
                c = _shifted(cur, oy, ox, pad)
                a = _shifted(a0, oy, ox, pad)
                n = _shifted(n0, oy, ox, pad)
                z = _shifted(z0, oy, ox, pad)
                s = _shifted(sky, oy, ox, pad)

                dl = jnp.abs(luma(c) - lum0)
                dn = jnp.maximum(0.0, 1.0 - jnp.sum(n0 * n, axis=-1))
                dz = jnp.abs(z - z0)
                da = jnp.sum(jnp.abs(a - a0), axis=-1)
                w = w_base * jnp.exp(-(dl * inv_c + dn * inv_n
                                       + dz * inv_z + da * inv_a))
                w = jnp.where(s == sky, w, 0.0)
                accum = accum + c * w[..., None]
                wsum = wsum + w
        out = jnp.where((wsum > 1e-8)[..., None],
                        accum / jnp.maximum(wsum, 1e-8)[..., None], cur)
        cur = jnp.where(sky[..., None], cur, out)
    return cur
