"""Windowed (SDL) backend: headless compose/resize behavior.

Runs under SDL's dummy video driver — no display needed. Mirrors the
reference OpenGLTerminalRenderer contract: half-block pixel compose with
linear->sRGB encode (:118-149), wheel-driven grid resize with clamping
(:238-251)."""

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")

from yetanotherconsolegameengine_tpu.engine.chexel import Framebuffer
from yetanotherconsolegameengine_tpu.engine.terminal_renderer import BACKENDS
from yetanotherconsolegameengine_tpu.engine.window_renderer import (
    MAX_CELLS_H, MAX_CELLS_W, MIN_CELLS_H, MIN_CELLS_W,
    WindowTerminalRenderer, _srgb8)


def make_backend(**kw):
    r = WindowTerminalRenderer(**kw)
    fb = Framebuffer(*r.console_size())
    h, w = fb.height, fb.width
    top = np.random.default_rng(7).random((h, w, 3)).astype(np.float32)
    bot = np.random.default_rng(8).random((h, w, 3)).astype(np.float32)
    fb.blit_half_blocks(top, bot, np.full((h, w), 15), np.zeros((h, w)))
    r.add_framebuffer(fb)
    return r, fb, top, bot


def test_registered_backend():
    assert "window" in BACKENDS
    assert BACKENDS["window"] is WindowTerminalRenderer


def test_compose_pixels_matches_planes():
    r, fb, top, bot = make_backend(cells_w=48, cells_h=20)
    px = r.compose_pixels()
    assert px.shape == (40, 48, 3)
    np.testing.assert_array_equal(px[0::2], _srgb8(top))
    np.testing.assert_array_equal(px[1::2], _srgb8(bot))


def test_srgb8_matches_reference_formula():
    # LinearToSrgb8 (OpenGLTerminalRenderer.cs:391-404) at the exact
    # breakpoint and endpoints.
    c = np.float32([0.0, 0.0031308, 0.5, 1.0, -1.0, 2.0])
    out = _srgb8(c)
    assert out[0] == 0 and out[3] == 255
    assert out[4] == 0 and out[5] == 255
    assert out[1] == round(12.92 * 0.0031308 * 255)
    assert out[2] == round((1.055 * 0.5 ** (1 / 2.4) - 0.055) * 255)


def test_wheel_resizes_grid_with_clamps():
    r, *_ = make_backend(cells_w=120, cells_h=40)
    r._on_wheel(+1)
    assert r.console_size() == (124, 42)
    r._on_wheel(-1)
    assert r.console_size() == (120, 40)
    for _ in range(200):
        r._on_wheel(-1)
    assert r.console_size() == (MIN_CELLS_W, MIN_CELLS_H)
    for _ in range(200):
        r._on_wheel(+1)
    assert r.console_size() == (MAX_CELLS_W, MAX_CELLS_H)


def test_render_headless_dummy_driver():
    r, fb, top, bot = make_backend(cells_w=40, cells_h=15, scale=2)
    try:
        r.render()
        r.render()
        assert r.frames_rendered == 2
        # The screen surface received the letterboxed blit: its center
        # pixel equals the composed image's center pixel.
        w, h = r._screen.get_size()
        got = r._screen.get_at((w // 2, h // 2))[:3]
        px = r.compose_pixels()
        want = px[px.shape[0] // 2, px.shape[1] // 2]
        assert np.abs(np.int32(got) - want).max() <= 2  # scale filtering
    finally:
        r.close()
