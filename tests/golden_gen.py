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
                 "cluster_forced", "island_surface"]
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


def _scene(name: str):
    from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

    if name == "cluster_forced":
        from yetanotherconsolegameengine_tpu.parallel.sharding import (
            cluster_test_scene)
        return cluster_test_scene(subdiv=3)
    if name == "island_surface":
        return _island_surface_scene()
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
