"""SceneSync TCP protocol: snapshot roundtrip + live server/client, and
the replicated scene renders identically to the original."""

import io

import numpy as np
import pytest

from yetanotherconsolegameengine_tpu.net.scene_sync import (
    SceneSyncClient, SceneSyncServer, read_snapshot, write_snapshot)
from yetanotherconsolegameengine_tpu.scene.builders import (
    build_cornell_box, build_cylinders_disks_triangles)


def _tables_equal(a, b) -> bool:
    import dataclasses
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_snapshot_roundtrip_exact():
    scene = build_cylinders_disks_triangles()
    data = write_snapshot(scene)
    assert data[:4] == b"SCNE"
    back = read_snapshot(io.BytesIO(data))
    for sec in ("materials", "spheres", "boxes", "rects", "cylinders",
                "disks", "planes", "triangles", "lights"):
        assert _tables_equal(getattr(scene, sec), getattr(back, sec)), sec
    assert back.defaults == scene.defaults
    assert back.binary_shadows == scene.binary_shadows
    np.testing.assert_allclose(np.asarray(back.bg_top),
                               np.asarray(scene.bg_top))


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        read_snapshot(io.BytesIO(b"NOPE" + b"\0" * 64))


def test_hostile_dims_rejected():
    # A peer must not be able to drive a huge allocation (or a negative
    # reshape) via the table header: tamper with the first table's dims.
    import struct

    scene = build_cornell_box()
    data = bytearray(write_snapshot(scene))
    # Layout: magic(4) version(4) then the first table header:
    # name_len u16 | name | code u8 | ndim u8 | dims i32[ndim].
    off = 8
    (nlen,) = struct.unpack_from("<H", data, off)
    dims_off = off + 2 + nlen + 2
    for bad in (2**30, -7):
        tampered = bytearray(data)
        struct.pack_into("<i", tampered, dims_off, bad)
        with pytest.raises(ValueError):
            read_snapshot(io.BytesIO(bytes(tampered)))
    # Unknown dtype code is rejected too.
    tampered = bytearray(data)
    tampered[off + 2 + nlen] = 250
    with pytest.raises(ValueError):
        read_snapshot(io.BytesIO(bytes(tampered)))


def test_server_client_over_tcp():
    scene = build_cornell_box()
    server = SceneSyncServer(lambda: scene)
    try:
        client = SceneSyncClient("127.0.0.1", server.port)
        replica = client.resync()
        assert _tables_equal(scene.rects, replica.rects)
        # Second resync on the same connection (reference clients re-pull).
        replica2 = client.resync()
        assert _tables_equal(scene.boxes, replica2.boxes)
        client.close()
    finally:
        server.close()


def test_replica_renders_identically():
    import jax
    from yetanotherconsolegameengine_tpu.render.renderer import (
        frame_step, init_state)

    scene = build_cornell_box()
    replica = read_snapshot(io.BytesIO(write_snapshot(scene)))
    step = jax.jit(lambda s, c, st: frame_step(s, c, st, fb_w=20, fb_h=12,
                                               ss=1))
    out_a, _ = step(scene, scene.default_pose, init_state(20, 12, 1))
    out_b, _ = step(replica, replica.default_pose, init_state(20, 12, 1))
    np.testing.assert_array_equal(np.asarray(out_a.top_rgb),
                                  np.asarray(out_b.top_rgb))
