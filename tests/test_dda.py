"""Voxel DDA: traversal == brute force over per-cell boxes, entry-face
normals, brick skipping transparency, and the voxel scenes end-to-end."""

import numpy as np
import jax.numpy as jnp

from yetanotherconsolegameengine_tpu.ops.dda import (
    BRICK, build_voxel_world, intersect_voxels)


def _brute_force_t(cells, origin, h, o, d):
    """Nearest solid-cell hit distance by slab-testing every solid cell.
    ``cells`` may be distance-encoded (solid iff value > 0)."""
    xs, ys, zs = np.where(cells > 0)
    bmin = origin + np.stack([xs, ys, zs], 1) * h          # (N, 3)
    bmax = bmin + h
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)      # (P, 3)
    ta = (bmin[None] - o[:, None]) * inv[:, None]          # (P, N, 3)
    tb = (bmax[None] - o[:, None]) * inv[:, None]
    t0 = np.minimum(ta, tb).max(axis=-1)
    t1 = np.maximum(ta, tb).min(axis=-1)
    ok = (t0 <= t1) & (t1 >= 1e-3)
    # Entry distance; a ray starting inside a solid cell hits immediately
    # (the reference DDA's inside-start behavior), not at the cell's exit.
    tc = np.where(t0 >= 1e-3, t0, 1e-3)
    tc = np.where(ok, tc, np.inf)
    return tc.min(axis=1)


def _rand_rays(rng, n, lo, hi, spread=30.0):
    o = lo + (hi - lo) * rng.rand(n, 3) + spread * (rng.rand(n, 3) - 0.5)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def test_dda_equals_brute_force(rng):
    cells = (rng.rand(12, 9, 14) < 0.12).astype(np.int32) * 3
    origin = np.asarray([-5.0, -3.0, -7.0], np.float32)
    h = 0.8
    w = build_voxel_world(cells, origin, h)
    # Note build pads dims to brick multiples with air; brute force uses the
    # padded array for identical geometry.
    padded = np.asarray(w.cells)
    o, d = _rand_rays(rng, 512, origin, origin + np.asarray(cells.shape) * h)
    hit = intersect_voxels(w, jnp.asarray(o), jnp.asarray(d),
                           np.float32(1e-3), np.float32(1e9))
    t_ref = _brute_force_t(padded, origin, h, o, d)
    t_got = np.where(np.asarray(hit.hit), np.asarray(hit.t), np.inf)
    both = np.isfinite(t_ref) & np.isfinite(t_got)
    # Agreement on hit/miss except boundary-epsilon cases.
    agree = (np.isfinite(t_ref) == np.isfinite(t_got))
    assert agree.mean() > 0.99, f"hit/miss agreement {agree.mean()}"
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=1e-3, atol=2e-3)


def test_entry_face_normals():
    cells = np.zeros((8, 8, 8), np.int32)
    cells[4, 4, 4] = 1
    w = build_voxel_world(cells, (0.0, 0.0, 0.0), 1.0)
    c = np.asarray([4.5, 4.5, 4.5], np.float32)
    # Six axis-aligned rays aimed at the cube from outside.
    starts = np.asarray([[c[0] - 3, c[1], c[2]], [c[0] + 3, c[1], c[2]],
                         [c[0], c[1] - 3, c[2]], [c[0], c[1] + 3, c[2]],
                         [c[0], c[1], c[2] - 3], [c[0], c[1], c[2] + 3]],
                        np.float32)
    dirs = (c[None] - starts)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    hit = intersect_voxels(w, jnp.asarray(starts), jnp.asarray(dirs),
                           np.float32(1e-3), np.float32(1e9))
    assert np.asarray(hit.hit).all()
    n = np.asarray(hit.n)
    expect = -dirs  # axis-aligned entry faces oppose the ray
    np.testing.assert_allclose(n, expect, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.t), 2.5, atol=1e-3)


def test_brick_skip_crosses_empty_space():
    # Solid wall at far end; rays must skip many empty bricks to reach it.
    nx = BRICK * 8
    cells = np.zeros((nx, BRICK, BRICK), np.int32)
    cells[-1, :, :] = 2
    w = build_voxel_world(cells, (0.0, 0.0, 0.0), 1.0)
    o = np.asarray([[0.5, 4.0, 4.0]], np.float32)
    d = np.asarray([[1.0, 0.0, 0.0]], np.float32)
    hit = intersect_voxels(w, jnp.asarray(o), jnp.asarray(d),
                           np.float32(1e-3), np.float32(1e9))
    assert bool(np.asarray(hit.hit)[0])
    np.testing.assert_allclose(float(np.asarray(hit.t)[0]), nx - 1 - 0.5,
                               atol=1e-3)


def test_inside_start_hits_immediately():
    cells = np.ones((8, 8, 8), np.int32)
    w = build_voxel_world(cells, (0.0, 0.0, 0.0), 1.0)
    o = np.asarray([[4.0, 4.0, 4.0]], np.float32)
    d = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    hit = intersect_voxels(w, jnp.asarray(o), jnp.asarray(d),
                           np.float32(1e-3), np.float32(1e9))
    assert bool(np.asarray(hit.hit)[0])
    # Normal faces the ray even without a defined entry face.
    assert float(np.sum(np.asarray(hit.n)[0] * d[0])) < 0.0


def test_material_ids_surface():
    cells = np.zeros((8, 8, 8), np.int32)
    cells[2, 2, 2] = 5
    cells[6, 2, 2] = 9
    w = build_voxel_world(cells, (0.0, 0.0, 0.0), 1.0)
    o = np.asarray([[2.5, 2.5, -2.0], [6.5, 2.5, -2.0]], np.float32)
    d = np.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], np.float32)
    hit = intersect_voxels(w, jnp.asarray(o), jnp.asarray(d),
                           np.float32(1e-3), np.float32(1e9))
    assert np.asarray(hit.mat).tolist() == [5, 9]


def test_voxel_scene_end_to_end():
    import jax
    from yetanotherconsolegameengine_tpu.render.renderer import (
        frame_step, init_state)
    from yetanotherconsolegameengine_tpu.scene.voxel_scenes import (
        build_voxel_test_scene)

    scene = build_voxel_test_scene(merge="dda")
    assert scene.voxels is not None
    state = init_state(24, 16, 1)
    out, _ = jax.jit(
        lambda s, c, st: frame_step(s, c, st, fb_w=24, fb_h=16, ss=1)
    )(scene, scene.default_pose, state)
    top = np.asarray(out.top_rgb)
    assert np.isfinite(top).all() and top.max() > 0.0


def test_greedy_mesh_boxes_exact_cover():
    """The greedy mesher must cover every solid cell exactly once with
    same-(block, meta) boxes (the voxel_test room rides the megakernel on
    the strength of this decomposition)."""
    from yetanotherconsolegameengine_tpu.scene.voxel_scenes import (
        greedy_mesh_boxes)

    rng = np.random.RandomState(3)
    blocks = (rng.rand(9, 7, 8) < 0.35).astype(np.int32) * \
        rng.randint(1, 4, size=(9, 7, 8))
    meta = rng.randint(0, 3, size=blocks.shape)
    boxes = greedy_mesh_boxes(blocks, meta)
    cover = np.zeros(blocks.shape, np.int32)
    for (lo, hi, b, m) in boxes:
        sl = tuple(slice(a, c) for a, c in zip(lo, hi))
        cover[sl] += 1
        assert (blocks[sl] == b).all()
        assert ((meta[sl] % 5) == m).all()
    assert (cover == (blocks > 0).astype(np.int32)).all()
