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


def dryrun(n_devices: int, fb_w: int = 32, fb_h: int = 16) -> None:
    """One sharded frame on tiny shapes — used by the driver's multi-chip
    compile/execute validation (see __graft_entry__.dryrun_multichip)."""
    from ..scene.builders import build_cornell_box

    mesh = make_mesh(n_devices)
    scene = build_cornell_box()
    step, scene, state = make_sharded_step(mesh, scene, fb_w, fb_h, ss=1)
    cam = scene.default_pose
    out, state = step(scene, cam, state)
    jax.block_until_ready(out.top_rgb)
    # A second step exercises the state round-trip under sharding.
    out, state = step(scene, cam, state)
    jax.block_until_ready(out.top_rgb)
    assert np.isfinite(np.asarray(out.top_rgb)).all()
