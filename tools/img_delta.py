"""Image-delta gate for LOD/proxy changes: render one converged frame of a
scene under two scene patches and report mean/max |top_rgb| difference.

Usage: python tools/img_delta.py [scene] [patchA] [patchB] [WxH]
Patches: full (as built) | noshad (strip occlusion proxy) | nolod (strip
secondary proxy) | nofine (strip primary fine proxy).
"""
import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS
from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer

PATCHES = {
    "full": {},
    "noshad": dict(mesh_clusters_shadow=None),
    "nolod": dict(mesh_clusters_lod=None, mesh_clusters_shadow=None),
    "nofine": dict(mesh_clusters_fine=None),
}


def render(scene, w, h, n=8):
    r = RaytraceRenderer(scene, fb_w=w, fb_h=h)
    out = None
    for _ in range(n):   # let TAA converge
        out = r.render()
    return np.asarray(out.top_rgb), np.asarray(out.bot_rgb)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    pa = sys.argv[2] if len(sys.argv) > 2 else "full"
    pb = sys.argv[3] if len(sys.argv) > 3 else "noshad"
    wh = sys.argv[4] if len(sys.argv) > 4 else "240x135"
    w, h = map(int, wh.split("x"))
    scene = SCENE_BUILDERS[name]()
    imgs = {}
    for p in (pa, pb):
        s = dataclasses.replace(scene, **PATCHES[p])
        imgs[p] = render(s, w, h)
    for plane, i in (("top", 0), ("bot", 1)):
        d = np.abs(imgs[pa][i] - imgs[pb][i])
        print(f"{plane}: mean {d.mean():.5f}  p99 "
              f"{np.percentile(d, 99):.5f}  max {d.max():.5f}", flush=True)


if __name__ == "__main__":
    main()
