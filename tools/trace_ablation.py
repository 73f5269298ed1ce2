"""Ablate trace_all pieces on the dragon to locate non-sweep frame cost.

Variants (each timed by the scan-difference method):
  full        : trace_all as shipped (LOD secondaries)
  no_lights   : lights masked out -> no shadow sweeps at all
  no_bounce   : diffuse_bounces=0 -> single round, no bounce sweep
  no_lod      : secondary_mesh_lod=False (round-2 behavior, no lax.cond)
  small_stack : path_stack_size=2 -> 8x smaller wavefront stack arrays

Usage: python tools/trace_ablation.py [scene] [W] [H] [variants...]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG
from yetanotherconsolegameengine_tpu.core import sampler
from yetanotherconsolegameengine_tpu.core.camera import CameraPose, make_jittered_rays
from yetanotherconsolegameengine_tpu.ops import trace
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

REPS = 6


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
    print(f"{label:22s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    args = sys.argv[1:]
    name = args[0] if args else "dragon"
    W = int(args[1]) if len(args) > 1 else 240
    H = int(args[2]) if len(args) > 2 else 135
    wanted = set(args[3:])
    scene = SCENE_BUILDERS[name]()
    hi_w, hi_h = W, H * 2
    cam = CameraPose.create(list(scene.defaults[0:3]), scene.defaults[3],
                            scene.defaults[4], scene.defaults[5])
    o, d = make_jittered_rays(cam, hi_w, hi_h, 1)
    o = jnp.asarray(np.asarray(o.reshape(-1, 3)))
    d = jnp.asarray(np.asarray(d.reshape(-1, 3)))
    seed = sampler.per_frame_seed(
        jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 1),
        jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 0),
        jnp.int32(1), DEFAULT_CONFIG.seed_salt)
    r0 = jnp.asarray(np.asarray(seed[0].reshape(-1)))
    r1 = jnp.asarray(np.asarray(seed[1].reshape(-1)))

    no_lights = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights, mask=jnp.zeros_like(scene.lights.mask)))

    variants = {
        "full": (scene, DEFAULT_CONFIG),
        "no_lights": (no_lights, DEFAULT_CONFIG),
        "no_bounce": (scene,
                      dataclasses.replace(DEFAULT_CONFIG,
                                          diffuse_bounces=0)),
        "no_lod": (scene,
                   dataclasses.replace(DEFAULT_CONFIG,
                                       secondary_mesh_lod=False)),
        "small_stack": (scene,
                        dataclasses.replace(DEFAULT_CONFIG,
                                            path_stack_size=2)),
    }
    for label, (sc, cfg) in variants.items():
        if wanted and label not in wanted:
            continue

        def fn(c, o, d, r0, r1, sc=sc, cfg=cfg):
            res = trace.trace_all(sc, o + c * 0, d, (r0, r1), cfg)
            return jnp.sum(res.radiance) * 1e-9

        timeit(label, fn, o, d, r0, r1)


if __name__ == "__main__":
    main()
