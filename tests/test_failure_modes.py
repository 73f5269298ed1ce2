"""Failure detection / self-healing (SURVEY.md §5): worker crashes don't
kill streaming, corrupted worlds are rejected cleanly, the app survives
reader failures."""

import numpy as np
import pytest

from yetanotherconsolegameengine_tpu.world.manager import WorldManager
from yetanotherconsolegameengine_tpu.world.settings import WorldConfig

CFG = WorldConfig(chunks_x=2, chunks_y=1, chunks_z=2, chunk_size=16,
                  view_distance=1, seed=3)


def _lut():
    lut = np.zeros((12, 5), np.int16)
    lut[1:, :] = 1
    return lut


def test_worker_exception_does_not_kill_streaming():
    calls = {"n": 0}

    def flaky_source(cx, cy, cz):
        calls["n"] += 1
        if calls["n"] % 2 == 1:  # every other chunk build crashes
            raise RuntimeError("injected fault")
        C = CFG.chunk_size
        blocks = np.ones((C, C, C), np.int32)
        return blocks, np.zeros_like(blocks)

    mgr = WorldManager(CFG, _lut(), flaky_source, n_workers=2)
    try:
        import time
        # Failed jobs leave the desired set unsatisfied; re-requesting
        # retries them (WorkerLoop swallow semantics, WorldManager.cs:874).
        deadline = time.time() + 30.0
        while time.time() < deadline:
            mgr.load_chunks_around((16.0, 0.0, 16.0))
            mgr.drain_ready(max_chunks=64)
            with mgr._desired_lock:
                if mgr._desired <= mgr._loaded:
                    break
            time.sleep(0.01)
        with mgr._desired_lock:
            assert mgr._desired <= mgr._loaded
        assert calls["n"] > 4  # retries happened
    finally:
        mgr.shutdown()


def test_player_failsafe_teleport(tmp_path):
    from yetanotherconsolegameengine_tpu.world.volume_scene import (
        build_minecraft_like)

    vs = build_minecraft_like(cfg=CFG, world_path=str(tmp_path / "w.vg"))
    try:
        # Hurl the player far below the world: the fail-safe teleport
        # (VolumeScenes.cs:152-158) must recover them above ground.
        vs.pos[1] = CFG.world_min_y - 200.0
        vs.vel[1] = -50.0
        vs.update(1 / 30)
        assert vs.pos[1] > CFG.world_min_y - 50.0
    finally:
        vs.manager.shutdown()


def test_video_renderer_handles_dead_reader():
    from yetanotherconsolegameengine_tpu.video.renderer import VideoRenderer

    class DeadReader:
        def try_get_frame(self):
            return None

        def close(self):
            pass

    vr = VideoRenderer(DeadReader(), fb_w=16, fb_h=8)
    assert vr.render() is None  # no frame yet: caller keeps last/skips
