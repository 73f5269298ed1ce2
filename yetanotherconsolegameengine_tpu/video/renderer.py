"""Video frame -> terminal cells on the TPU.

The reference's VideoRenderer (/root/reference/ConsoleGame/Renderer/
VideoRenderer.cs:12-292) does Lanczos-3 resample -> aspect-fit ->
supersample -> half-block chexels with a host thread pool. Here the whole
chain is one jitted device program over the frame: separable Lanczos-3
resampling as two dense matrix multiplies (resampling IS a matmul — the
MXU-native formulation), aspect-fit letterboxing, and the same '▀'
half-cell split + ANSI-256 quantization as the ray tracer's output stage.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ansi

_HI = jax.lax.Precision.HIGHEST


def _lanczos_weights(src: int, dst: int, a: int = 3) -> np.ndarray:
    """(dst, src) resampling matrix with Lanczos-a kernel
    (VideoRenderer.cs:184-241's filter, expressed as a matmul)."""
    scale = src / dst
    out = np.zeros((dst, src), np.float32)
    support = a * max(1.0, scale)
    for i in range(dst):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support))
        xs = np.arange(lo, hi + 1)
        t = (xs - center) / max(1.0, scale)
        w = np.sinc(t) * np.sinc(t / a)
        w[np.abs(t) >= a] = 0.0
        xs_c = np.clip(xs, 0, src - 1)
        for x, wv in zip(xs_c, w):
            out[i, x] += wv
        s = out[i].sum()
        if s != 0:
            out[i] /= s
    return out


@functools.lru_cache(maxsize=16)
def _resample_mats(src_h: int, src_w: int, dst_h: int, dst_w: int):
    return (jnp.asarray(_lanczos_weights(src_h, dst_h)),
            jnp.asarray(_lanczos_weights(src_w, dst_w)))


def _fit_rect(src_w, src_h, dst_w, dst_h) -> Tuple[int, int, int, int]:
    """Aspect-fit (x0, y0, w, h) inside the destination."""
    scale = min(dst_w / src_w, dst_h / src_h)
    w = max(1, int(round(src_w * scale)))
    h = max(1, int(round(src_h * scale)))
    return (dst_w - w) // 2, (dst_h - h) // 2, w, h


class VideoRenderer:
    """IFrameReader -> per-frame half-block cell grids.

    Plays the reference VideoRenderer's role behind the same output
    contract as RaytraceRenderer (top/bot RGB + ANSI indices)."""

    def __init__(self, reader, fb_w: int, fb_h: int, ss: int = 1):
        self.reader = reader
        self.fb_w, self.fb_h = fb_w, fb_h
        self.ss = max(1, ss)
        self._compiled = {}
        self._last = None

    def _convert(self, frame: np.ndarray):
        src_h, src_w = frame.shape[:2]
        hi_w = self.fb_w * self.ss
        hi_h = self.fb_h * 2 * self.ss
        x0, y0, w, h = _fit_rect(src_w, src_h, hi_w, hi_h)
        key = (src_h, src_w, h, w, x0, y0)
        if key not in self._compiled:
            wy, wx = _resample_mats(src_h, src_w, h, w)

            @jax.jit
            def convert(img_u8):
                img = img_u8.astype(jnp.float32) * (1.0 / 255.0)
                # Separable Lanczos: (h,src_h)@(src_h,src_w,3) then cols.
                tmp = jnp.einsum("hs,swc->hwc", wy, img, precision=_HI)
                res = jnp.einsum("dw,hwc->hdc", wx, tmp, precision=_HI)
                res = jnp.clip(res, 0.0, 1.0)
                canvas = jnp.zeros((hi_h, hi_w, 3), jnp.float32)
                canvas = jax.lax.dynamic_update_slice(canvas, res,
                                                      (y0, x0, 0))
                cells = canvas.reshape(self.fb_h, 2, self.ss,
                                       self.fb_w, self.ss, 3).mean((2, 4))
                top = cells[:, 0]
                bot = cells[:, 1]
                return (top, bot, ansi.rgb_to_ansi256(top),
                        ansi.rgb_to_ansi256(bot))

            self._compiled[key] = convert
        return self._compiled[key](jnp.asarray(frame))

    def render(self):
        """Returns (top_rgb, bot_rgb, fg_ansi, bg_ansi) or the previous
        frame when the reader has nothing new yet."""
        frame = self.reader.try_get_frame()
        if frame is None:
            return self._last
        self._last = self._convert(frame)
        return self._last
