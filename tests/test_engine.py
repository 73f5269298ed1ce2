"""Engine shell: chexel framebuffers, ANSI encoders (native == Python),
input escape parsing, fly camera, and the headless program loop."""

import io
import os
import re

import numpy as np
import pytest

from yetanotherconsolegameengine_tpu.engine.chexel import (
    HALF_BLOCK, SPACE, Framebuffer, compose)
from yetanotherconsolegameengine_tpu.engine.fly_camera import FlyCamera
from yetanotherconsolegameengine_tpu.engine.input import TerminalInput
from yetanotherconsolegameengine_tpu.engine.terminal_renderer import (
    ANSITerminalRenderer, _py_encode)
from yetanotherconsolegameengine_tpu.native import load as load_native


def _rand_grids(rng, h=12, w=20):
    g = np.full((h, w), HALF_BLOCK, np.int32)
    f = rng.randint(0, 256, (h, w)).astype(np.int32)
    b = rng.randint(0, 256, (h, w)).astype(np.int32)
    return g, f, b


def test_native_encoder_builds():
    assert load_native() is not None, "C++ encoder failed to build"


def test_native_matches_python_encoder(rng):
    lib = load_native()
    assert lib is not None
    import ctypes
    g, f, b = _rand_grids(rng)
    h, w = g.shape
    buf = (ctypes.c_uint8 * lib.yacge_ansi_max_bytes(w, h))()
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n = lib.yacge_ansi_encode(p(g), p(f), p(b), w, h, 1, buf)
    native = bytes(buf[:n])
    assert native == _py_encode(g, f, b, 1)


def test_encoder_run_length_compression():
    lib = load_native()
    import ctypes
    h, w = 4, 40
    g = np.full((h, w), HALF_BLOCK, np.int32)
    f = np.full((h, w), 196, np.int32)  # constant colors
    b = np.full((h, w), 21, np.int32)
    buf = (ctypes.c_uint8 * lib.yacge_ansi_max_bytes(w, h))()
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n = lib.yacge_ansi_encode(p(g), p(f), p(b), w, h, 1, buf)
    data = bytes(buf[:n])
    # Constant colors -> exactly one fg and one bg SGR in the whole frame.
    assert data.count(b"[38;5;") == 1
    assert data.count(b"[48;5;") == 1


def test_diff_encoder_emits_only_changes(rng):
    lib = load_native()
    import ctypes
    g, f, b = _rand_grids(rng, 8, 16)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    buf = (ctypes.c_uint8 * lib.yacge_ansi_max_bytes(16, 8))()
    # Identical frames -> nothing to emit.
    n = lib.yacge_ansi_encode_diff(p(g), p(f), p(b), p(g), p(f), p(b),
                                   16, 8, 1, buf)
    assert n == -1
    # One changed cell -> tiny output with one seek.
    f2 = f.copy()
    f2[3, 7] = (f2[3, 7] + 1) % 256
    n = lib.yacge_ansi_encode_diff(p(g), p(f2), p(b), p(g), p(f), p(b),
                                   16, 8, 1, buf)
    data = bytes(buf[:n])
    assert 0 < n < 64
    assert b"\x1b[4;8H" in data  # row 3 -> terminal row 4, col 7 -> 8


def test_framebuffer_blit_and_compose():
    fb = Framebuffer(8, 4)
    top = np.linspace(0, 1, 8 * 4 * 3, dtype=np.float32).reshape(4, 8, 3)
    fa = np.arange(32, dtype=np.int32).reshape(4, 8)
    fb.blit_half_blocks(top, top * 0.5, fa, fa + 1)
    assert (fb.glyph == HALF_BLOCK).all()
    np.testing.assert_array_equal(fb.fg_ansi, fa)

    # Front buffer with a hole: back shows through where front is SPACE.
    front = Framebuffer(8, 4)
    front.write_text(0, 0, "AB", fg_ansi=10, bg_ansi=2)
    out = compose([front, fb], 8, 4)
    assert out.glyph[0, 0] == ord("A")
    assert out.fg_ansi[0, 0] == 10
    assert out.glyph[1, 3] == HALF_BLOCK  # back buffer visible


def test_compose_respects_offsets():
    small = Framebuffer(2, 2, offset_x=3, offset_y=1)
    small.write_text(0, 0, "X")
    out = compose([small], 8, 4)
    assert out.glyph[1, 3] == ord("X")
    assert out.glyph[0, 0] == SPACE


class _FakeFdInput(TerminalInput):
    """TerminalInput reading from a pipe instead of a tty."""


def _make_input(data: bytes) -> TerminalInput:
    r, w = os.pipe()
    os.write(w, data)
    os.close(w)
    return TerminalInput(fd=r)


def test_input_parses_keys_and_arrows():
    inp = _make_input(b"wa\x1b[A\x1b[D\x1b")
    inp.update()
    keys = []
    while (k := inp.try_get_key()) is not None:
        keys.append(k)
    assert keys == ["w", "a", "up", "left", "esc"]
    assert inp.is_key_down("w") and inp.is_key_down("up")


def test_input_parses_sgr_mouse():
    inp = _make_input(b"\x1b[<0;10;5M\x1b[<64;1;1M")
    inp.enable_mouse = True
    inp.update()
    ev = inp.try_get_mouse()
    assert ev.button == 0 and ev.x == 10 and ev.y == 5 and ev.pressed
    ev2 = inp.try_get_mouse()
    assert ev2.wheel == 1


def test_fly_camera_moves_in_yaw_frame():
    cam = FlyCamera(pos=(0, 0, 0), yaw=0.0)

    class FakeInput:
        def __init__(self, keys):
            self.keys = keys

        def is_key_down(self, k):
            return k in self.keys

    moved = cam.update(FakeInput({"w"}), 1.0)
    assert moved
    assert cam.pos[2] < -2.9 and abs(cam.pos[0]) < 1e-9
    cam2 = FlyCamera(pos=(0, 0, 0), yaw=np.pi / 2)
    cam2.update(FakeInput({"w"}), 1.0)
    assert cam2.pos[0] > 2.9 and abs(cam2.pos[2]) < 1e-6


def test_program_headless_runs(tmp_path):
    """The full app loop, non-interactive, writing ANSI to a pipe."""
    from yetanotherconsolegameengine_tpu.engine.program import main

    r, w = os.pipe()
    old = os.dup(1)
    os.dup2(w, 1)
    try:
        rc = main(["--scene", "test", "--frames", "2", "--size", "24x14",
                   "--no-world", "--non-interactive"])
    finally:
        os.dup2(old, 1)
        os.close(old)
        os.close(w)
    data = b""
    while True:
        chunk = os.read(r, 1 << 20)
        if not chunk:
            break
        data += chunk
    os.close(r)
    assert rc == 0
    assert b"\x1b[38;5;" in data  # SGR colors present
    assert "▀".encode() in data   # half-block cells present
    assert b"fps" in data         # HUD line


def test_batched_component_matches_unbatched():
    """--batch K must only pipeline, never change pixels: a batch=4
    RaytraceComponent over a static scene with no input blits the exact
    frame sequence of the batch=1 component (same 1-tick latency: both
    show frame t-1 at tick t), fg/bg grids bit-identical and RGB planes
    within the display-u8 quantization the stacked readback ships."""
    from yetanotherconsolegameengine_tpu.engine.raytrace_entity import (
        RaytraceComponent)
    from yetanotherconsolegameengine_tpu.engine.chexel import Framebuffer

    w, h, n_ticks = 24, 14, 6
    comps = []
    for batch in (1, 4):
        fb = Framebuffer(w, h)
        c = RaytraceComponent(fb, scene_names=["test"], enable_world=False,
                              batch=batch)
        c.show_hud = False
        comps.append((c, fb))
    seqs = {1: [], 4: []}
    for t in range(n_ticks):
        for (c, fb), b in zip(comps, (1, 4)):
            c.update(1.0 / 30.0)
            seqs[b].append((fb.fg_ansi.copy(), fb.bg_ansi.copy(),
                            fb.fg_rgb.copy(), fb.bg_rgb.copy()))
    for t in range(1, n_ticks):   # tick 0 blits nothing on both paths
        fg1, bg1, top1, bot1 = seqs[1][t]
        fg4, bg4, top4, bot4 = seqs[4][t]
        np.testing.assert_array_equal(fg4, fg1, err_msg=f"tick {t}")
        np.testing.assert_array_equal(bg4, bg1, err_msg=f"tick {t}")
        np.testing.assert_allclose(top4, top1, atol=1 / 255.0,
                                   err_msg=f"tick {t}")
        np.testing.assert_allclose(bot4, bot1, atol=1 / 255.0,
                                   err_msg=f"tick {t}")
    for (c, _), _b in zip(comps, (1, 4)):
        c.close()


def test_batched_dynamic_scene_matches_unbatched():
    """Dynamic scenes batch by folding the per-frame scene mutation (LBVH
    rebuild included) into the frame scan (render_many(times=, scene_fn=));
    the batched component must blit the exact unbatched frame sequence."""
    from yetanotherconsolegameengine_tpu.engine.raytrace_entity import (
        RaytraceComponent)
    from yetanotherconsolegameengine_tpu.engine.chexel import Framebuffer

    w, h, n_ticks = 20, 12, 5
    seqs = {}
    for batch in (1, 3):
        fb = Framebuffer(w, h)
        c = RaytraceComponent(fb, scene_names=["spinning_mesh"],
                              enable_world=False, batch=batch)
        c.show_hud = False
        frames = []
        for _ in range(n_ticks):
            c.update(1.0 / 30.0)
            frames.append((fb.fg_ansi.copy(), fb.fg_rgb.copy()))
        seqs[batch] = frames
        c.close()
    for t in range(1, n_ticks):
        fg1, top1 = seqs[1][t]
        fg3, top3 = seqs[3][t]
        np.testing.assert_array_equal(fg3, fg1, err_msg=f"tick {t}")
        np.testing.assert_allclose(top3, top1, atol=1 / 255.0,
                                   err_msg=f"tick {t}")
