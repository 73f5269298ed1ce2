"""Full benchmark suite: the five BASELINE.json configs on one TPU chip.

    python bench_suite.py            # all configs, one JSON line each

1. Cornell Box @160x90 (bench.py's headline config)
2. Mirror spheres on checker @240x135 with reflections + TAA
3. Primitive showcase (cylinders/disks/triangles/boxes, full shading)
4. Voxel DDA scene (volume-grid test room)
5. Bunny mesh with BVH traversal + on-device LBVH rebuild timing

Frames run through render_many (lax.scan over the real frame step).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Host-readback sync: jax.block_until_ready does not reliably block
    on the axon-tunneled TPU backend (see bench.py); a 1-element dependent
    readback does."""
    np.asarray(x[-1, 0, 0] if getattr(x, "ndim", 0) >= 3 else x)


def bench_scene(name, scene, fb_w, fb_h, batch=120, n_batches=2, ss=1):
    from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer

    r = RaytraceRenderer(scene, fb_w=fb_w, fb_h=fb_h, ss=ss)
    grids, out = r.render_many(batch)
    _sync(grids[0])
    rays = int(out.rays_traced)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        grids, out = r.render_many(batch)
    _sync(grids[0])
    dt = (time.perf_counter() - t0) / (n_batches * batch)
    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"{name} @{fb_w}x{fb_h} ({rays} rays/frame)",
        "fps": round(fps, 1),
        "mrays_per_s": round(rays * fps / 1e6, 2),
        "pallas": r._hs is not None,
    }))
    return fps


def bench_lbvh_rebuild():
    """On-device LBVH rebuild throughput (the scene-switch/geometry-dirty
    path, BASELINE config #5)."""
    from yetanotherconsolegameengine_tpu.ops.lbvh import build_lbvh
    from yetanotherconsolegameengine_tpu.ops.mesh_bvh import intersect_mesh
    from yetanotherconsolegameengine_tpu.scene.mesh_loader import (
        find_asset, load_obj, make_knot)

    path = find_asset("stanford-bunny.obj")
    tris = (load_obj(path, scale=2.0) if path else make_knot())
    T = len(tris)
    v = jnp.asarray(tris)
    mats = jnp.zeros(T, jnp.int32)

    @jax.jit
    def rebuild(verts):
        bvh = build_lbvh(verts[:, 0], verts[:, 1], verts[:, 2], mats)
        return bvh.bmin[0]  # force materialization

    r = rebuild(v)
    jax.block_until_ready(r)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        r = rebuild(v)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": f"on-device LBVH rebuild ({T} tris)",
        "ms": round(dt * 1000, 3),
        "mtris_per_s": round(T / dt / 1e6, 2),
    }))


def main():
    from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

    bench_scene("Cornell Box", SCENE_BUILDERS["cornell"](), 160, 90)
    bench_scene("Mirror spheres + TAA", SCENE_BUILDERS["mirror_spheres"](),
                240, 135)
    bench_scene("Mirror spheres ss=2 (4x rays)",
                SCENE_BUILDERS["mirror_spheres"](), 240, 135, batch=60,
                ss=2)
    bench_scene("Primitive showcase", SCENE_BUILDERS["primitives"](),
                160, 90)
    bench_scene("Voxel room (greedy-meshed)", SCENE_BUILDERS["voxel_test"](),
                160, 90)
    from yetanotherconsolegameengine_tpu.scene.voxel_scenes import (
        build_voxel_test_scene)
    bench_scene("Voxel DDA room (forced DDA)",
                build_voxel_test_scene(merge="dda"), 160, 90,
                batch=30, n_batches=2)
    bench_scene("Bunny mesh BVH", SCENE_BUILDERS["bunny"](), 160, 90,
                batch=10, n_batches=2)
    # The BASELINE.md north star: a dragon-class mesh (~600k tris, the
    # procedural stand-in for the missing xyzrgb_dragon.obj) at the
    # reference's 240x135 cell geometry.
    bench_scene("Dragon mesh (598k tris)", SCENE_BUILDERS["dragon"](),
                240, 135, batch=10, n_batches=2)
    bench_lbvh_rebuild()


if __name__ == "__main__":
    main()
