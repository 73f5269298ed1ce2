"""Measure the megakernel->post fusion ceiling on the headline config.

VERDICT r4 #5 asks for the rays->ANSI fusion (one pallas_call for trace +
TAA/denoise/tonemap/ANSI) or a measured reason it doesn't pay. The most a
fusion can recover is the gap between the composed frame step and the sum
of its two Pallas programs timed alone — that gap IS the inter-kernel cost
(launch + the HBM round trip of the 11 image planes between the kernels).

Scan-difference method as in tools/time_components.py: each variant runs
as a length-1 vs length-(1+N) lax.scan inside one jit; the difference
cancels dispatch + readback. Run on the real TPU.

Usage: python tools/time_post_fusion.py [scene] [W] [H]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG as cfg
from yetanotherconsolegameengine_tpu.core.camera import CameraPose, ray_params
from yetanotherconsolegameengine_tpu.ops import pallas_post, pallas_trace
from yetanotherconsolegameengine_tpu.render import renderer as rmod
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

# Sub-ms components: the scan-difference needs many reps or tunnel noise
# (~0.1-0.2 ms per invocation pair) swamps the signal.
REPS = 400


def timeit(label, fn, *args):
    def runner(n):
        @jax.jit
        def f(*a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        float(f(*args))
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0
    t1 = runner(1)
    tn = runner(1 + REPS)
    ms = (tn - t1) / REPS * 1000
    print(f"{label:40s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    scene = SCENE_BUILDERS[name]()
    r = rmod.RaytraceRenderer(scene, fb_w=W, fb_h=H, ss=1)
    hs = r._host_scene()
    assert hs is not None, "megakernel not eligible for this scene/host"
    hi_w, hi_h = W, H * 2
    cam = CameraPose.create(list(scene.defaults[0:3]), scene.defaults[3],
                            scene.defaults[4], scene.defaults[5])
    params = ray_params(cam, hi_w, hi_h, 1)
    state = rmod.init_state(W, H, 1)

    # (a) composed frame step (trace kernel + fused post-tail kernel + glue)
    def full(c, params):
        out, _ = rmod.frame_step(scene, cam, state, W, H, 1, cfg,
                                 host_scene=hs, fused_post=True,
                                 precomp=(params + c * 0,
                                          jnp.asarray(False)))
        return c + jnp.sum(out.top_rgb[0, 0]) * 1e-9

    a = timeit("frame_step (trace + post, composed)", full, params)

    # (b) trace megakernel alone
    def trace_only(c, params):
        rad3, sky_f, alb3, n3, dep, nray = pallas_trace.trace_planes_pallas(
            scene, hs, cam, 1, hi_w, hi_h, cfg, params=params + c * 0)
        return c + rad3[0][0, 0] * 1e-9

    b = timeit("trace megakernel alone", trace_only, params)

    # (c) fused post tail alone (same shapes the frame feeds it)
    img = jnp.full((hi_h, hi_w), 0.5, jnp.float32)
    dep = jnp.ones((hi_h, hi_w), jnp.float32)

    def post_only(c, img, dep):
        i = img + c * 0
        blended, mapped, ansi_full, new_ae = pallas_post.post_fused_tail(
            cfg, 2, (i, img, img), (img, img, img), (img, img, img), dep,
            img, (i, img, img), (img, img, img), dep, img,
            jnp.asarray(True), jnp.asarray(False), jnp.asarray(1.0))
        return c + blended[0, 0, 0] * 1e-9 + mapped[0, 0, 0] * 1e-12

    c = timeit("post_fused_tail alone", post_only, img, dep)

    gap = a - b - c
    print(f"\ncomposed {a:.3f} = trace {b:.3f} + post {c:.3f} "
          f"+ GAP {gap:.3f} ms", flush=True)
    print(f"fusion ceiling: {gap:.3f} ms = {100 * gap / a:.1f}% of the "
          f"frame (launch + {11 * hi_w * hi_h * 4 / 1e6:.2f} MB plane "
          f"round-trip)", flush=True)


if __name__ == "__main__":
    main()
