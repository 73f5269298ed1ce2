"""Streamed-world surface meshing (world/surface.py).

Covers: exact exposed-face coverage of the greedy mesher (the voxel
analogue of the greedy-box property test), the transparent-neighbor face
rule, meta-variant merging via the merge LUT, slot streaming in
SurfaceClusterTable, and DDA-vs-surface render equivalence (VolumeGrid
semantics, VolumeGrid.cs:98-231: identical entry faces -> identical
normals/materials/hit distances).
"""

import numpy as np
import pytest

from yetanotherconsolegameengine_tpu.ops.mesh_clusters import KC
from yetanotherconsolegameengine_tpu.world.surface import (
    SurfaceClusterTable, greedy_mesh_chunk)


def _pad(core):
    p = np.zeros(tuple(s + 2 for s in core.shape), np.int16)
    p[1:-1, 1:-1, 1:-1] = core
    return p


def _quads(tris):
    """Recover (ax, w, u0, u1, v0, v1, per-quad first-tri idx) from the
    emitted tri pairs (first half = (0,1,2), second half = (0,2,3))."""
    n = tris.shape[0] // 2
    out = []
    for i in range(n):
        t1, t2 = tris[i], tris[n + i]
        corners = np.unique(np.concatenate([t1, t2]), axis=0)
        assert corners.shape[0] == 4
        const_ax = [a for a in range(3)
                    if np.unique(corners[:, a]).size == 1]
        assert len(const_ax) == 1
        ax = const_ax[0]
        w = corners[0, ax]
        rest = [a for a in range(3) if a != ax]
        lo = corners[:, rest].min(axis=0)
        hi = corners[:, rest].max(axis=0)
        out.append((ax, w, lo[0], hi[0], lo[1], hi[1]))
    return out


def _coverage_check(core, transparent, merge_lut=None):
    """Every exposed face covered exactly once, none elsewhere.

    Valid for OPAQUE-ONLY grids, where the two faces that could share a
    grid plane cell (+face of cell w-1 needs air at w; -face of cell w
    needs air at w-1) are mutually exclusive -- so per-(ax, w, u, v)
    rasterized quad coverage must equal the exposed-face indicator."""
    p = _pad(core)
    tris, mats = greedy_mesh_chunk(p, transparent, (0, 0, 0), 1.0,
                                   merge_lut=merge_lut)
    C = core.shape[0]
    cover = {ax: np.zeros((C + 1, C, C), np.int32) for ax in range(3)}
    for (ax, w, u0, u1, v0, v1) in _quads(tris):
        cover[ax][int(w), int(u0):int(u1), int(v0):int(v1)] += 1
    for ax in range(3):
        want = np.zeros((C + 1, C, C), np.int32)
        for sgn in (1, -1):
            sl = [slice(1, -1)] * 3
            sl[ax] = slice(2, None) if sgn > 0 else slice(0, -2)
            nb = p[tuple(sl)]
            exposed = np.moveaxis((core > 0) & (nb == 0), ax, 0)
            for cw in range(C):
                w = cw + 1 if sgn > 0 else cw
                want[w] += exposed[cw]
        np.testing.assert_array_equal(cover[ax], want, err_msg=f"ax={ax}")


def test_mesh_covers_exposed_faces_exactly():
    rng = np.random.default_rng(11)
    core = (rng.random((8, 8, 8)) < 0.4).astype(np.int16) * \
        rng.integers(1, 4, (8, 8, 8)).astype(np.int16)
    _coverage_check(core, np.zeros(8, bool))


def test_flat_slab_merges_to_single_quads():
    core = np.zeros((16, 16, 16), np.int16)
    core[:, 0:3, :] = 2
    tris, mats = greedy_mesh_chunk(_pad(core), np.zeros(4, bool),
                                   (0, 0, 0), 1.0)
    # 6 box faces -> 6 quads -> 12 tris.
    assert tris.shape[0] == 12
    assert (mats == 2).all()


def test_transparent_neighbor_rule():
    # Sand column under water: sand/water face exists (sand's), air/water
    # face exists (water's), water-water interior has none.
    core = np.zeros((4, 4, 4), np.int16)
    core[1, 0, 1] = 2            # sand
    core[1, 1, 1] = 5            # water above it
    core[1, 2, 1] = 5            # more water
    transparent = np.zeros(8, bool)
    transparent[5] = True
    tris, mats = greedy_mesh_chunk(_pad(core), transparent, (0, 0, 0), 1.0)
    quads = _quads(tris)
    n = len(quads)
    # sand: 6 quads (5 air faces + 1 against water). water column: 4 side
    # quads (2 cells merged vertically per direction) + 1 top; its bottom
    # face is NOT exposed (neighbor sand is opaque). Total 11.
    assert n == 11, n
    # The sand top face (against water) exists: a y-plane quad at w=1
    # whose material is sand.
    sand_top = [q for q, m in zip(quads, mats[:n])
                if q[0] == 1 and q[1] == 1.0 and m == 2]
    assert len(sand_top) == 1


def test_merge_lut_merges_meta_variants():
    core = np.zeros((8, 8, 8), np.int16)
    # Checkerboard of two bank ids of the same block.
    ids = np.where((np.add.outer(np.arange(8), np.arange(8)) % 2)
                   .astype(bool), 3, 4).astype(np.int16)
    core[:, 0, :] = ids
    merge = np.arange(16, dtype=np.int16)
    merge[4] = 3
    tris_raw, _ = greedy_mesh_chunk(_pad(core), np.zeros(16, bool),
                                    (0, 0, 0), 1.0)
    tris_merged, mats = greedy_mesh_chunk(_pad(core), np.zeros(16, bool),
                                          (0, 0, 0), 1.0, merge_lut=merge)
    assert tris_merged.shape[0] == 12      # one slab again
    assert tris_raw.shape[0] > 100         # checker shatters without LUT
    assert (mats == 3).all()


def test_surface_cluster_table_slots():
    wb = np.array([[0, 0, 0], [64, 64, 64]], np.float32)
    tbl = SurfaceClusterTable(8, wb)
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tris = np.repeat(tri, KC + 1, axis=0)  # needs 2 clusters
    mats = np.zeros(KC + 1, np.int32)
    tbl.update_chunks([((0, 0, 0), tris, mats)])
    assert tbl.n_used == 2
    mc = tbl.clusters()
    live = np.asarray(mc.cbmin)[:, 0] < 1e29
    assert live.sum() == 2
    # Update in place: same chunk, now 1 cluster.
    tbl.update_chunks([((0, 0, 0), tris[:4], mats[:4])])
    assert tbl.n_used == 1
    live = np.asarray(mc.cbmin)[:, 0] < 1e29  # old snapshot unchanged
    mc2 = tbl.clusters()
    assert (np.asarray(mc2.cbmin)[:, 0] < 1e29).sum() == 1
    tbl.remove_chunks([(0, 0, 0)])
    assert tbl.n_used == 0
    assert (np.asarray(tbl.clusters().cbmin)[:, 0] < 1e29).sum() == 0


def test_overflow_is_counted_not_fatal():
    wb = np.array([[0, 0, 0], [64, 64, 64]], np.float32)
    tbl = SurfaceClusterTable(1, wb)
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tris = np.repeat(tri, 2 * KC, axis=0)
    tbl.update_chunks([((0, 0, 0), tris, np.zeros(2 * KC, np.int32))])
    assert tbl.n_used == 1
    assert tbl.overflowed == 1


def test_surface_render_matches_dda():
    """The surface-quad image equals the DDA image for an opaque grid:
    identical entry faces -> identical normals, materials, distances."""
    import jax.numpy as jnp

    from yetanotherconsolegameengine_tpu.ops.dda import build_voxel_world
    from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer
    from yetanotherconsolegameengine_tpu.scene.materials import Material
    from yetanotherconsolegameengine_tpu.scene.tables import SceneBuilder
    import dataclasses

    rng = np.random.default_rng(3)
    core = np.zeros((12, 12, 12), np.int16)
    hills = (4 + 4 * rng.random((12, 12))).astype(int)
    for x in range(12):
        for z in range(12):
            core[x, :hills[x, z], z] = 1 + (x + z) % 3

    def base_scene():
        s = SceneBuilder("surf_eq")
        ids = {}
        for b in (1, 2, 3):
            ids[b] = s.bank.add(Material.solid({
                1: (0.8, 0.3, 0.2), 2: (0.2, 0.7, 0.3),
                3: (0.3, 0.3, 0.9)}[b]))
        s.add_light((6.0, 30.0, 6.0), (1, 1, 1), 400.0)
        s.set_camera((6.0, 14.0, -6.0), fov=60.0)
        s.binary_shadows = True
        return s, ids

    s, ids = base_scene()
    sc = s.build()
    bank_of = np.zeros(4, np.int16)
    for b, i in ids.items():
        bank_of[b] = i
    cells = bank_of[core]

    vw = build_voxel_world(cells, (0.0, 0.0, 0.0), 1.0)
    sc_dda = dataclasses.replace(sc, voxels=vw)

    tris, mats = greedy_mesh_chunk(_pad(cells), np.zeros(16, bool),
                                   (0, 0, 0), 1.0)
    wb = np.array([[0, 0, 0], [12, 12, 12]], np.float32)
    tbl = SurfaceClusterTable(16, wb)
    tbl.update_chunks([((0, 0, 0), tris, mats.astype(np.int32))])
    sc_mesh = dataclasses.replace(sc, mesh_clusters=tbl.clusters(),
                                  mesh_all_opaque=True)

    imgs = []
    for scene in (sc_dda, sc_mesh):
        r = RaytraceRenderer(scene, fb_w=48, fb_h=24, ss=1,
                             use_pallas=False)
        r.cam_pos = [6.0, 14.0, -6.0]
        r.yaw, r.pitch = 0.0, -0.9
        r._cam_cache = None
        out = r.render()
        imgs.append(np.asarray(out.top_rgb))
    d = np.abs(imgs[0] - imgs[1])
    # Sub-pixel grazing differences only.
    assert np.isfinite(imgs[0]).all() and np.isfinite(imgs[1]).all()
    assert (d > 0.02).mean() < 0.02, float(d.max())


def test_tiny_island_surface_end_to_end(tmp_path):
    import jax.numpy as jnp

    from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer
    from yetanotherconsolegameengine_tpu.world.settings import WorldConfig
    from yetanotherconsolegameengine_tpu.world.volume_scene import (
        build_minecraft_like)

    cfg = WorldConfig(chunks_x=2, chunks_y=2, chunks_z=2, view_distance=1)
    vs = build_minecraft_like(cfg, world_path=str(tmp_path / "w.vg"),
                              regenerate=True)
    vs.manager.ensure_all_loaded(vs.pos)
    sc = vs.update(1.0 / 30.0)
    assert sc.mesh_clusters is not None and sc.voxels is None
    assert vs.manager._surface.overflowed == 0
    r = RaytraceRenderer(sc, fb_w=32, fb_h=16, ss=1, use_pallas=False)
    out = r.render()
    img = np.asarray(out.top_rgb)
    assert np.isfinite(img).all() and img.std() > 1e-3
    vs.manager.shutdown()


def test_wavefront_compaction_matches_uncompacted():
    """BOTH wavefront compaction levels (ops/trace.py) reproduce the
    uncompacted loop's image on a cluster scene (per-ray arithmetic is
    order-independent; radiance summation order differs only when a lane
    accumulates across a compaction boundary).

    The pixel count must clear the compaction gates or this test compares
    the uncompacted loop against itself (the original 48x24 version did
    exactly that: P=2304 < the 4096 level-1 gate)."""
    import yetanotherconsolegameengine_tpu.ops.trace as trace_mod
    from yetanotherconsolegameengine_tpu.parallel.sharding import (
        cluster_test_scene)
    from yetanotherconsolegameengine_tpu.render.renderer import (
        RaytraceRenderer)

    fb_w, fb_h = 64, 32
    P = fb_w * (fb_h * 2)
    assert P >= 4096           # level-1 gate (trace.py: P >= 4096)
    assert (P // 2) // 4 >= 512  # level-2 gate (trace.py: Pc // 4 >= 512)
    sc = cluster_test_scene(subdiv=3)
    imgs = {}
    try:
        for flag in (True, False):
            trace_mod.WAVEFRONT_COMPACTION = flag
            r = RaytraceRenderer(sc, fb_w=fb_w, fb_h=fb_h, ss=1,
                                 use_pallas=False)
            imgs[flag] = np.asarray(r.render().top_rgb)
    finally:
        trace_mod.WAVEFRONT_COMPACTION = True
    np.testing.assert_allclose(imgs[True], imgs[False], atol=1e-5)


def test_fine_proxy_only_for_ultra_dense(monkeypatch):
    """Meshes below 3x PRIMARY_LOD_TARGET_TRIS (e.g. the 69k-tri bunny
    regime) must NOT build a fine primary proxy — they trace full-res."""
    import yetanotherconsolegameengine_tpu.scene.tables as tables_mod
    from yetanotherconsolegameengine_tpu.scene.materials import Material
    from yetanotherconsolegameengine_tpu.scene.mesh_loader import (
        make_icosphere, transform_mesh)
    from yetanotherconsolegameengine_tpu.scene.tables import SceneBuilder

    monkeypatch.setattr(tables_mod, "CLUSTER_MIN_TRIS", 4096)
    s = SceneBuilder("no_fine")
    tris = transform_mesh(make_icosphere(4), normalize=True)  # 5120 tris
    s.add_mesh_triangles(tris, Material.solid((0.8, 0.7, 0.6)))
    sc = s.build()
    assert sc.mesh_clusters is not None
    assert sc.mesh_clusters_fine is None


def test_primary_fine_lod_close_to_full(monkeypatch):
    """The sub-pixel fine proxy for primary rays renders within a small
    tolerance of the full-resolution trace, and cfg.primary_mesh_lod=False
    reverts to the full set."""
    import dataclasses

    import yetanotherconsolegameengine_tpu.scene.tables as tables_mod
    from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG
    from yetanotherconsolegameengine_tpu.render.renderer import (
        RaytraceRenderer)
    from yetanotherconsolegameengine_tpu.scene.materials import Material
    from yetanotherconsolegameengine_tpu.scene.mesh_loader import (
        make_icosphere, transform_mesh)
    from yetanotherconsolegameengine_tpu.scene.tables import SceneBuilder

    monkeypatch.setattr(tables_mod, "CLUSTER_MIN_TRIS", 4096)
    monkeypatch.setattr(tables_mod, "PRIMARY_LOD_TARGET_TRIS", 4096)
    s = SceneBuilder("fine_lod")
    # subdiv-5 icosphere: 20480 tris at a 32x16 framebuffer ~ 10 tris per
    # traced ray — the "mesh far denser than pixels" regime the fine
    # proxy is for (the dragon is ~70 tris/pixel).
    tris = transform_mesh(make_icosphere(5), normalize=True, scale=1.2,
                          translate=(0.0, 1.0, -2.5))
    s.add_mesh_triangles(tris, Material.solid((0.8, 0.7, 0.6)))
    s.add_light((2.0, 5.0, 1.0), (1, 1, 1), 60.0)
    s.set_camera((0.0, 1.0, 1.0), fov=60.0)
    sc = s.build()
    assert sc.mesh_clusters_fine is not None

    imgs = {}
    for flag in (True, False):
        cfg = dataclasses.replace(DEFAULT_CONFIG, primary_mesh_lod=flag)
        r = RaytraceRenderer(sc, fb_w=32, fb_h=16, ss=1, use_pallas=False,
                             cfg=cfg)
        imgs[flag] = np.asarray(r.render().top_rgb)
    # The proxy shifts total scene luminance slightly, which the global
    # auto-exposure multiplies into EVERY pixel — normalize it out and
    # compare structure: only a few silhouette pixels may move.
    a = imgs[True] / imgs[True].mean()
    b = imgs[False] / imgs[False].mean()
    d = np.abs(a - b)
    assert d.mean() < 0.05, float(d.mean())
    assert (d > 0.3).mean() < 0.03, float((d > 0.3).mean())


def test_block_order_primary_matches_default():
    """16x16 pixel-block lane order (cfg.block_order_primary, paired with
    presort_primary=False) renders the same image as the default binned
    order, up to packed-t tie-breaks on cluster-boundary edges (a handful
    of pixels at <1e-4), including when the row count pads to 16."""
    import dataclasses

    from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG
    from yetanotherconsolegameengine_tpu.parallel.sharding import (
        cluster_test_scene)
    from yetanotherconsolegameengine_tpu.render.renderer import (
        RaytraceRenderer)

    sc = cluster_test_scene(subdiv=3)
    for fbw, fbh in ((48, 20),):   # hi 48x40 -> rows pad to 48
        imgs = {}
        rays = {}
        for bo in (False, True):
            cfg = dataclasses.replace(DEFAULT_CONFIG,
                                      block_order_primary=bo,
                                      presort_primary=not bo)
            r = RaytraceRenderer(sc, fb_w=fbw, fb_h=fbh, ss=1,
                                 use_pallas=False, cfg=cfg)
            out = r.render()
            imgs[bo] = np.asarray(out.top_rgb).astype(np.float32)
            rays[bo] = int(out.rays_traced)
        assert rays[False] == rays[True]   # dead pad lanes excluded
        d = np.abs(imgs[False] - imgs[True])
        assert float(d.max()) < 1e-3
        frac = float((d.max(axis=-1) > 0).mean())
        assert frac < 0.02, f"{frac:.3f} of pixels differ"
