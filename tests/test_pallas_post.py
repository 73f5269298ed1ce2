"""Fused Pallas post kernel (TAA + à-trous + exposure) equivalence with
the XLA post stages, via the full frame_step on CPU (interpret mode).

Covers the whole fused device path end to end: in-kernel raygen -> trace
megakernel -> fused post -> tonemap/ANSI, against the reference XLA
pipeline on the same scene, camera, and frame sequence."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG
from yetanotherconsolegameengine_tpu.ops import pallas_post
from yetanotherconsolegameengine_tpu.ops.pallas_trace import snapshot_scene
from yetanotherconsolegameengine_tpu.render import renderer as R
from yetanotherconsolegameengine_tpu.scene import builders

FB_W, FB_H = 32, 24


def _run(scene, host_scene, n_frames=3):
    step = jax.jit(functools.partial(
        R.frame_step, fb_w=FB_W, fb_h=FB_H, ss=1, cfg=DEFAULT_CONFIG),
        static_argnames=("host_scene", "pallas_interpret"))
    state = R.init_state(FB_W, FB_H, 1)
    cam = scene.default_pose
    outs = []
    for _ in range(n_frames):
        out, state = step(scene, cam, state, host_scene=host_scene,
                          pallas_interpret=True)
        outs.append(out)
    return outs, state


def test_fused_frame_matches_xla_frame():
    scene = builders.SCENE_BUILDERS["cornell"]()
    hs = snapshot_scene(scene)
    assert pallas_post.post_fuse_ok(FB_W, FB_H * 2)

    outs_ref, st_ref = _run(scene, None)
    outs_got, st_got = _run(scene, hs)

    for i, (a, b) in enumerate(zip(outs_ref, outs_got)):
        top_a = np.asarray(a.top_rgb)
        top_b = np.asarray(b.top_rgb)
        np.testing.assert_allclose(top_b, top_a, atol=2e-3,
                                   err_msg=f"frame {i} top_rgb")
        np.testing.assert_allclose(np.asarray(b.bot_rgb),
                                   np.asarray(a.bot_rgb), atol=2e-3,
                                   err_msg=f"frame {i} bot_rgb")
        # Quantized indices may flip on the odd boundary pixel from 1-ulp
        # float differences; require near-total agreement.
        fg_a = np.asarray(a.fg_ansi)
        fg_b = np.asarray(b.fg_ansi)
        assert (fg_a != fg_b).mean() < 0.005, f"frame {i} fg_ansi"
        assert int(a.rays_traced) == int(b.rays_traced), f"frame {i} rays"

    np.testing.assert_allclose(np.asarray(st_got.history),
                               np.asarray(st_ref.history), atol=2e-3)
    np.testing.assert_allclose(float(st_got.ae_exposure),
                               float(st_ref.ae_exposure), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_got.prev_sky),
                                  np.asarray(st_ref.prev_sky))


def test_fused_post_gate():
    assert pallas_post.post_fuse_ok(160, 180)
    # 240x270 (64.8k px) needs ~18.2 MB of scoped VMEM on v5e — over the
    # 16 MB DEFAULT stack, but the kernel requests a 100 MB limit
    # (CompilerParams.vmem_limit_bytes; v5e has 128 MB physical VMEM), so
    # it fuses. The unrolled tap form also fits 480x540 (240x135 at ss=2,
    # 259k px — validated on-chip), the largest shipped config; the gate
    # still rejects sizes beyond what has been validated.
    assert pallas_post.post_fuse_ok(240, 270)
    assert pallas_post.post_fuse_ok(480, 540)
    assert not pallas_post.post_fuse_ok(480, 720)
