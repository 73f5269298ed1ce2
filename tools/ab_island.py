"""Island-orbit + bunny fps under kernel-constant variants (vbN/exitN/
nbufN consumed exactly like tools/ab_dragon.py — patch before first
compile). Usage: python tools/ab_island.py [vbN exitN ...] [bunny|island]
"""
import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    names = sys.argv[1:]
    from yetanotherconsolegameengine_tpu.ops import mesh_clusters as mcmod
    targets = []
    for name in names:
        if name.startswith("exit"):
            mcmod.EXIT_CHUNK = int(name[4:])
        elif name.startswith("vb"):
            mcmod.VISIT_BATCH = int(name[2:])
        elif name.startswith("nbuf"):
            mcmod.NBUF = int(name[4:])
        else:
            targets.append(name)
    targets = targets or ["island"]
    from yetanotherconsolegameengine_tpu.render.renderer import (
        RaytraceRenderer)

    if "bunny" in targets:
        from yetanotherconsolegameengine_tpu.scene.builders import (
            SCENE_BUILDERS)
        r = RaytraceRenderer(SCENE_BUILDERS["bunny"](), fb_w=160, fb_h=90)
        grids, _ = r.render_many(60)
        np.asarray(grids[0][-1, 0, 0])
        t0 = time.perf_counter()
        for _ in range(2):
            grids, _ = r.render_many(60)
        np.asarray(grids[0][-1, 0, 0])
        print(f"bunny  {120 / (time.perf_counter() - t0):7.2f} fps",
              flush=True)

    if "island" in targets:
        from yetanotherconsolegameengine_tpu.world.volume_scene import (
            build_minecraft_like)
        vs = build_minecraft_like()
        vs.manager.ensure_all_loaded(vs.pos)
        sc = vs.update(1.0 / 30.0)
        rr = RaytraceRenderer(sc, fb_w=240, fb_h=135, ss=1,
                              use_pallas=False)
        eye = vs.pos.copy()
        eye[1] += 6.0
        poses = [(eye, math.pi * 2 * i / 64, -0.35) for i in range(64)]
        batch = (poses * 2)[:128]
        grids, out = rr.render_many(len(batch), poses=batch)
        np.asarray(grids[0][-1, 0, 0])
        t0 = time.perf_counter()
        for _ in range(2):
            grids, out = rr.render_many(len(batch), poses=batch)
        np.asarray(grids[0][-1, 0, 0])
        dt = (time.perf_counter() - t0) / (2 * len(batch))
        print(f"island @240x135  {1.0 / dt:6.2f} fps "
              f"({dt * 1000:.2f} ms/frame)", flush=True)
        vs.manager.shutdown()


if __name__ == "__main__":
    main()
