"""Regenerate golden images for test_golden.py.

Run on the CPU backend (same as CI): renders every static bundled scene at
48x28 cells for 4 frames and stores the final top/bot RGB planes in
tests/goldens.npz. The 16-scene table as regression fixtures is the
reference's own de-facto test strategy (SURVEY.md §4), done properly with
the ToPng/golden idea (Framebuffer.cs:51-100) the reference never wired up.

    python tests/golden_gen.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_SCENES = ["test", "cornell", "mirror_spheres", "primitives", "boxes",
                 "texture_test", "glass", "glass_gem", "voxel_test",
                 # Quality contracts the tolerance/equivalence tests can't
                 # lock (VERDICT r3 #6): the forced cluster-matmul traversal
                 # and the streamed-world greedy-surface path (incl. its
                 # pooled shadow-proxy LOD) drift silently if a threshold
                 # or proxy change shifts pixels.
                 "cluster_forced", "island_surface",
                 # The ultra-dense-mesh PROXY ROUTING contract (VERDICT r4
                 # #8): primary rays on the fine vertex-clustered set,
                 # bounce rays on the coarse LOD set, shadow rays on the
                 # extra-coarse occlusion set, with composed t_biases —
                 # the dragon's quality-critical gates at toy scale.
                 "fine_forced"]
FB_W, FB_H, FRAMES = 48, 28, 4


def _island_surface_scene():
    """Deterministic 2x2x2-chunk generated island on the surface-cluster
    path (worldgen is seeded; greedy meshing and slot allocation are
    order-deterministic after ensure_all_loaded)."""
    import tempfile

    from yetanotherconsolegameengine_tpu.world.settings import WorldConfig
    from yetanotherconsolegameengine_tpu.world.volume_scene import (
        build_minecraft_like)

    import dataclasses

    cfg = WorldConfig(chunks_x=2, chunks_y=2, chunks_z=2, view_distance=1)
    with tempfile.TemporaryDirectory() as td:
        vs = build_minecraft_like(cfg, world_path=os.path.join(td, "w.vg"),
                                  regenerate=True)
        vs.manager.ensure_all_loaded(vs.pos)
        sc = vs.update(1.0 / 30.0)
        vs.manager.shutdown()
    assert sc.mesh_clusters is not None
    # Look DOWN at the surface from above the spawn: the spawn pose faces
    # the horizon, which goldens as pure sky and locks nothing.
    pose = (float(vs.pos[0]), float(vs.pos[1]) + 10.0, float(vs.pos[2]),
            sc.defaults[3], -0.9, sc.defaults[5])
    return dataclasses.replace(sc, defaults=pose)


def _fine_forced_scene():
    """The dragon's proxy-routing chain forced at toy scale: a 5.1k-tri
    icosphere ships fine/LOD/shadow cluster sets built at tiny budgets
    (production gates: scene/tables.py PRIMARY_LOD_TARGET_TRIS /
    LOD_TARGET_TRIS / SHADOW_LOD_TARGET_TRIS), so primary rays trace the
    fine set, bounces the LOD set, shadows the occlusion set, and the
    t_bias composition (lod = base + fine, shadow = base + fine + shadow)
    is pixel-locked. Routing or bias drift fails this golden."""
    import dataclasses

    from yetanotherconsolegameengine_tpu.ops.mesh_clusters import (
        build_clusters)
    from yetanotherconsolegameengine_tpu.scene.lod import simplify_soup
    from yetanotherconsolegameengine_tpu.scene.materials import Material
    from yetanotherconsolegameengine_tpu.scene.mesh_loader import (
        make_icosphere, transform_mesh)
    from yetanotherconsolegameengine_tpu.scene.tables import (
        PROXY_KC, SceneBuilder)

    s = SceneBuilder("fine_forced")
    s.add_xz_rect(-6.0, 6.0, -6.0, 3.0, 0.0,
                  Material.checker((0.8, 0.8, 0.8), (0.2, 0.2, 0.2), 0.8))
    s.add_light((2.5, 4.0, 1.5), (1.0, 0.95, 0.9), 70.0)
    tris = transform_mesh(make_icosphere(4), normalize=True, scale=1.3,
                          translate=(0.0, 0.9, -2.4))
    s.add_mesh_triangles(tris, Material.solid((0.85, 0.7, 0.55)))
    mid = s._mesh_tris[-1][1]
    s.set_camera((0.0, 1.3, 1.2), fov=60.0)
    scene = s.build()

    mats = np.full(tris.shape[0], mid, np.int32)
    full = build_clusters(tris[:, 0], tris[:, 1], tris[:, 2], mats)
    f_tris, f_mats, fine_bias = simplify_soup(tris, mats, 2048)
    fine = build_clusters(f_tris[:, 0], f_tris[:, 1], f_tris[:, 2],
                          f_mats, kc=PROXY_KC)
    l_tris, l_mats, lod_bias = simplify_soup(tris, mats, 512)
    lod = build_clusters(l_tris[:, 0], l_tris[:, 1], l_tris[:, 2], l_mats,
                         t_bias=lod_bias + fine_bias, kc=PROXY_KC)
    sh_tris, sh_mats, sh_bias = simplify_soup(l_tris, l_mats, 128)
    shadow = build_clusters(sh_tris[:, 0], sh_tris[:, 1], sh_tris[:, 2],
                            sh_mats,
                            t_bias=lod_bias + fine_bias + sh_bias,
                            kc=PROXY_KC)
    return dataclasses.replace(
        scene, mesh=None, mesh_clusters=full, mesh_clusters_fine=fine,
        mesh_clusters_lod=lod, mesh_clusters_shadow=shadow)


def _scene(name: str):
    from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

    if name == "cluster_forced":
        from yetanotherconsolegameengine_tpu.parallel.sharding import (
            cluster_test_scene)
        return cluster_test_scene(subdiv=3)
    if name == "island_surface":
        return _island_surface_scene()
    if name == "fine_forced":
        return _fine_forced_scene()
    return SCENE_BUILDERS[name]()


def render_scene(name: str):
    from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer

    r = RaytraceRenderer(_scene(name), fb_w=FB_W, fb_h=FB_H, ss=1)
    for _ in range(FRAMES):
        out = r.render()
    return np.asarray(out.top_rgb), np.asarray(out.bot_rgb)


def main():
    # Optional scene-name args: regenerate ONLY those, merging into the
    # existing npz (adding a new golden must not silently re-bake the
    # others under whatever code drift is in the working tree).
    only = sys.argv[1:]
    path = os.path.join(os.path.dirname(__file__), "goldens.npz")
    data = {}
    if only and os.path.isfile(path):
        data = dict(np.load(path))
    for name in (only or GOLDEN_SCENES):
        top, bot = render_scene(name)
        data[f"{name}_top"] = top
        data[f"{name}_bot"] = bot
        print(f"{name}: mean {top.mean():.4f}", flush=True)
    np.savez_compressed(path, **data)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
