"""Multi-chip pixel-space sharding of the frame step.

The reference's only intra-frame parallelism is CPU threads over pixels
(SURVEY.md §2.8 P1/P2: PixelThreadPool.For2D / FixedThreadFor row bands).
The TPU-native scale-out axis is the same one — the pixel grid — but across
chips: the frame state and outputs are sharded by image ROWS over a 1-D
`jax.sharding.Mesh`, the scene tables and camera are replicated, and the
single jitted frame step runs SPMD. XLA inserts the collectives:

- path tracing is embarrassingly parallel (no communication),
- the à-trous / TAA-clamp stencils need halo rows -> collective-permutes,
- the auto-exposure log-mean is a global reduce -> psum.

This mirrors the "CP-analog" sharding called out in SURVEY.md §2.8: image
space is the sequence dimension, and the only cross-pixel communication in
the whole pipeline is the denoiser's border exchange.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_CONFIG, RenderConfig
from ..render.renderer import FrameOutput, FrameState, frame_step, init_state

ROWS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (ROWS,))


def _row_sharded(mesh: Mesh, tree):
    """Shard every array leaf with >=2 dims by its leading (row) axis;
    replicate scalars/vectors."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return NamedSharding(mesh, P(ROWS, *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, tree)


def _replicated(mesh: Mesh, tree):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def make_sharded_step(mesh: Mesh, scene, fb_w: int, fb_h: int, ss: int = 1,
                      cfg: RenderConfig = DEFAULT_CONFIG):
    """Compile the frame step with row sharding. Returns (step, state) where
    ``state`` is already placed row-sharded on the mesh.

    fb_h * 2 * ss must be divisible by the mesh size so every device owns an
    equal band of traced rows.
    """
    n = mesh.devices.size
    hi_h = fb_h * 2 * ss
    if hi_h % n or fb_h % n:
        raise ValueError(
            f"fb_h={fb_h} (hi_h={hi_h}) must be divisible by mesh size {n}")

    state = init_state(fb_w, fb_h, ss)
    state_shardings = _row_sharded(mesh, state)
    state = jax.device_put(state, state_shardings)
    scene = jax.device_put(scene, _replicated(mesh, scene))

    fn = functools.partial(frame_step, fb_w=fb_w, fb_h=fb_h, ss=ss, cfg=cfg)

    def out_shardings():
        rows3 = NamedSharding(mesh, P(ROWS, None, None))
        rows2 = NamedSharding(mesh, P(ROWS, None))
        repl = NamedSharding(mesh, P())
        out_s = FrameOutput(top_rgb=rows3, bot_rgb=rows3, fg_ansi=rows2,
                            bg_ansi=rows2, rays_traced=repl)
        return (out_s, state_shardings)

    step = jax.jit(fn, out_shardings=out_shardings())
    return step, scene, state


def cluster_test_scene(subdiv: int = 4):
    """A small scene FORCED onto the cluster-matmul mesh path (the tables
    builder only picks clusters above CLUSTER_MIN_TRIS; the sharding
    validation wants the Pallas traversal exercised at toy sizes)."""
    import dataclasses

    from ..ops.mesh_clusters import build_clusters
    from ..scene.materials import Material
    from ..scene.mesh_loader import make_icosphere, transform_mesh
    from ..scene.tables import SceneBuilder

    s = SceneBuilder("cluster_shard_test")
    s.add_xz_rect(-6.0, 6.0, -6.0, 3.0, 0.0,
                  Material.checker((0.8, 0.8, 0.8), (0.2, 0.2, 0.2), 0.8))
    s.add_light((2.0, 4.0, 2.0), (1.0, 1.0, 1.0), 60.0)
    # Mirror + glass spheres: keep paths alive into rounds >= 2 (mirror
    # bounce -> diffuse shade -> cosine bounce) and force use_stack=True
    # (refraction pushes/pops), so the wavefront-compaction levels in
    # ops/trace.py gather REAL stack columns across both boundaries —
    # the island's water path depends on exactly that.
    s.add_sphere((1.6, 0.6, -2.0), 0.6,
                 Material.solid((0.95, 0.95, 0.95), reflectivity=1.0))
    s.add_sphere((-1.5, 0.5, -1.2), 0.5, Material.glass())
    tris = transform_mesh(make_icosphere(subdiv), normalize=True, scale=1.4,
                          translate=(0.0, 0.9, -2.5))
    s.add_mesh_triangles(tris, Material.solid((0.9, 0.85, 0.8)))
    mid = s._mesh_tris[-1][1]
    s.set_camera((0.0, 1.2, 1.0), fov=60.0)
    scene = s.build()
    mc = build_clusters(tris[:, 0], tris[:, 1], tris[:, 2],
                        np.full(tris.shape[0], mid, np.int32))
    return dataclasses.replace(scene, mesh=None, mesh_clusters=mc)


def run_sharded_frames(mesh: Mesh, scene, fb_w: int, fb_h: int,
                       n_frames: int = 2):
    """Run ``n_frames`` sharded steps; returns the last FrameOutput."""
    step, scene, state = make_sharded_step(mesh, scene, fb_w, fb_h, ss=1)
    cam = scene.default_pose
    out = None
    for _ in range(n_frames):
        out, state = step(scene, cam, state)
    jax.block_until_ready(out.top_rgb)
    return out


def dryrun(n_devices: int, fb_w: int = 32, fb_h: int = 16) -> None:
    """Sharded frames over every traversal path the engine ships — used by
    the driver's multi-chip compile/execute validation
    (__graft_entry__.dryrun_multichip).

    Scenes: Cornell (dense primitive tables), a sub-cluster mesh (LBVH +
    skip-link walk), a FORCED cluster-matmul mesh (the Pallas streaming
    traversal, interpreter-lowered off-TPU so XLA partitions its emulation
    like any other ops), and a voxel DDA room. Each must compile, execute
    two state-threaded steps, and produce finite pixels under the N-way
    row sharding."""
    from ..scene.builders import SCENE_BUILDERS, build_cornell_box

    mesh = make_mesh(n_devices)
    scenes = [("cornell", build_cornell_box())]
    # subdiv=3 (1280 tris, 5 clusters): the Pallas interpreter under 8-way
    # SPMD is compile-heavy, and the toy size already exercises the whole
    # sort/cull/kernel/resolve path per device. The skip-link mesh walk
    # (pure XLA gathers — standard partitioning) is validated by the CI
    # equality test in tests/test_pipeline.py instead, to keep the
    # driver-gate dryrun inside its time budget.
    scenes.append(("mesh_clusters", cluster_test_scene(subdiv=3)))
    try:
        scenes.append(("voxel_dda", __import__(
            "yetanotherconsolegameengine_tpu.scene.voxel_scenes",
            fromlist=["build_voxel_test_scene"])
            .build_voxel_test_scene(merge="dda")))
    except Exception:
        pass
    for name, scene in scenes:
        out = run_sharded_frames(mesh, scene, fb_w, fb_h)
        assert np.isfinite(np.asarray(out.top_rgb)).all(), name
