"""Per-round cost attribution for trace_all on the island (or any scene).

Times trace_all with max_trace_rounds clamped to k = 1, 2, 3, 4, 6, and
the default — the increments are each wavefront round's marginal cost
(round 0 is peeled, so k=1 measures the primary round alone). Also times
compaction off at the default depth. Scan-difference method (bench.py).

Usage: python tools/time_rounds.py [scene] [W] [H]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG as cfg
from yetanotherconsolegameengine_tpu.core import sampler
from yetanotherconsolegameengine_tpu.core.camera import CameraPose, make_jittered_rays
from yetanotherconsolegameengine_tpu.ops import trace
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

REPS = 10


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
    name = sys.argv[1] if len(sys.argv) > 1 else "island"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 135
    if name == "island":
        from yetanotherconsolegameengine_tpu.world.volume_scene import (
            build_minecraft_like)
        vs = build_minecraft_like()
        vs.manager.ensure_all_loaded(vs.pos)
        scene = vs.update(1.0 / 30.0)
        eye = vs.pos.copy()
        eye[1] += 6.0
        scene = dataclasses.replace(
            scene, defaults=(float(eye[0]), float(eye[1]), float(eye[2]),
                             0.7, -0.35, scene.defaults[5]))
    else:
        scene = SCENE_BUILDERS[name]()
    hi_w, hi_h = W, H * 2
    cam = CameraPose.create(list(scene.defaults[0:3]), scene.defaults[3],
                            scene.defaults[4], scene.defaults[5])
    o, d = make_jittered_rays(cam, hi_w, hi_h, 1)
    o = jnp.asarray(np.asarray(o.reshape(-1, 3)))
    d = jnp.asarray(np.asarray(d.reshape(-1, 3)))
    px = jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 1)
    py = jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 0)
    seed = sampler.per_frame_seed(px, py, jnp.int32(1), cfg.seed_salt)
    r0 = jnp.asarray(np.asarray(seed[0].reshape(-1)))
    r1 = jnp.asarray(np.asarray(seed[1].reshape(-1)))
    print(f"scene={name} P={o.shape[0]}", flush=True)

    def run(c, o, d, r0, r1, k=None, compact=True):
        cc = cfg if k is None else dataclasses.replace(
            cfg, max_trace_rounds=k)
        old = trace.WAVEFRONT_COMPACTION
        trace.WAVEFRONT_COMPACTION = compact
        try:
            res = trace.trace_all(scene, o + c * 0, d, (r0, r1), cc)
        finally:
            trace.WAVEFRONT_COMPACTION = old
        return jnp.sum(res.radiance) * 1e-9

    prev = None
    for k in (1, 2, 3, 4, 6, cfg.max_trace_rounds):
        ms = timeit(f"trace_all rounds<={k}",
                    lambda c, *a, k=k: run(c, *a, k=k), o, d, r0, r1)
        if prev is not None:
            print(f"{'':8s}marginal round cost {ms - prev:+8.3f} ms",
                  flush=True)
        prev = ms
    timeit("trace_all NO compaction",
           lambda c, *a: run(c, *a, compact=False), o, d, r0, r1)
    if name == "island":
        vs.manager.shutdown()


if __name__ == "__main__":
    main()
