"""Attribute the headline gap between frame_step and the recorded bench.

bench.py's fps comes from render_many(N) — frame_step inside a lax.scan
plus the per-frame glue (camera xs slicing, state threading, fg/bg u8
casts, DynamicUpdateSlice stacking of the output grids) plus per-batch
dispatch/readback. tools/time_post_fusion.py times frame_step ALONE at
0.072 ms while the bench implies ~0.13 ms/frame; this tool times the
FULL frame_scan body by scan-difference (render_many(1) vs
render_many(1+N) in the same process) so the residual splits into
"scan glue" (difference - frame_step) vs "dispatch/readback" (bench -
difference).

Usage: python tools/time_frame_scan.py [scene] [W] [H] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

REPS = 400


def _sync(g):
    np.asarray(g[0])


def timed(r, n):
    grids, out = r.render_many(n)
    _sync(grids[0])  # warm (compile)
    t0 = time.perf_counter()
    grids, out = r.render_many(n)
    _sync(grids[0])
    return time.perf_counter() - t0


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else REPS
    r = RaytraceRenderer(SCENE_BUILDERS[name](), fb_w=W, fb_h=H, ss=1)
    t1 = timed(r, 1)
    # Median of 3: the tunnel's dispatch+readback term varies run to run.
    tn = min(timed(r, 1 + reps) for _ in range(3))
    t1 = min(t1, *(timed(r, 1) for _ in range(2)))
    per = (tn - t1) / reps * 1000
    print(f"scan body (frame_step + glue)   {per:8.3f} ms/frame")
    print(f"per-dispatch overhead (n=1)     {t1 * 1000:8.3f} ms")
    print("compare: tools/time_post_fusion.py's composed frame_step; the")
    print("difference is scan glue (xs slice, u8 casts, DUS stacking).")


if __name__ == "__main__":
    main()
