"""Tone mapping and terminal color quantization unit tests."""

import jax.numpy as jnp
import numpy as np

from yetanotherconsolegameengine_tpu.config import RenderConfig
from yetanotherconsolegameengine_tpu.ops import ansi, tonemap


def test_aces_curve_anchors():
    x = jnp.asarray([0.0, 1.0, 100.0])
    y = np.asarray(tonemap.aces_film(x))
    assert y[0] == 0.0
    assert 0.8 < y[1] < 0.85  # ACES(1.0) ~ 0.8037
    assert y[2] == 1.0        # saturates


def test_map_pixels_range_and_saturation():
    cfg = RenderConfig()
    hdr = jnp.asarray([[[0.2, 0.2, 0.2], [4.0, 0.1, 0.1], [-1.0, 0.5, 2.0]]])
    out = np.asarray(tonemap.map_pixels(hdr, jnp.float32(1.0), cfg))
    assert (out >= 0.0).all() and (out <= 1.0).all()
    gray_in = jnp.asarray([[[0.3, 0.3, 0.3]]])
    g = np.asarray(tonemap.map_pixels(gray_in, jnp.float32(1.0), cfg))[0, 0]
    np.testing.assert_allclose(g[0], g[1], atol=1e-6)  # gray stays gray


def test_exposure_ema_and_clamp():
    cfg = RenderConfig()
    hdr = jnp.full((16, 16, 3), 10.0)           # very bright
    sky = jnp.zeros((16, 16), bool)
    ae = jnp.float32(1.0)
    for _ in range(50):
        ae, eff = tonemap.update_exposure(hdr, sky, ae, cfg)
    assert abs(float(ae) - cfg.ae_min) < 1e-3   # clamps at the floor
    hdr = jnp.full((16, 16, 3), 1e-5)           # very dark
    for _ in range(50):
        ae, eff = tonemap.update_exposure(hdr, sky, ae, cfg)
    assert abs(float(ae) - cfg.ae_max) < 1e-3


def test_exposure_all_sky_keeps_state():
    cfg = RenderConfig()
    hdr = jnp.full((8, 8, 3), 5.0)
    sky = jnp.ones((8, 8), bool)
    ae, _ = tonemap.update_exposure(hdr, sky, jnp.float32(0.7), cfg)
    assert abs(float(ae) - 0.7) < 1e-6


def test_ansi256_primaries_and_gray():
    rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
                       [0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.214, 0.214, 0.214]])
    idx = np.asarray(ansi.rgb_to_ansi256(rgb))
    assert idx[0] == 16 + 36 * 5          # pure red -> 196
    assert idx[1] == 16 + 6 * 5           # pure green -> 46
    assert idx[2] == 16 + 5               # pure blue -> 21
    assert idx[3] == 16                   # black cube corner
    assert 231 == idx[4] or idx[4] == 255 # white: cube corner or gray top
    # linear 0.214 -> sRGB ~128: nearer the gray ramp than the cube.
    assert 232 <= idx[5] <= 255


def test_console16_nearest():
    rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.45], [0.9, 0.9, 0.9]])
    idx = np.asarray(ansi.rgb_to_console16(rgb))
    assert idx[0] == 12   # Red
    assert idx[1] == 1    # DarkBlue
    assert idx[2] in (7, 15)
