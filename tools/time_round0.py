"""Dissect the island's peeled primary round (trace_all, max_trace_rounds=1).

Variants isolate the real in-frame cost of each round-0 stage (the
standalone sweeps in time_components.py understate the sun sweep: they cap
tmax at 8 where the real sun distance is ~2000):

  base        — the full round 0
  no-lights   — light table masked off: drops the shadow sweep + direct
                lighting shading. delta = their true in-frame cost.
  no-mesh     — mesh clusters removed AND lights off: every ray hits sky;
                what remains is raygen-side bookkeeping + primitive sweep.

Usage: python tools/time_round0.py [scene] [W] [H]
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

REPS = 10
cfg = dataclasses.replace(DEFAULT_CONFIG, max_trace_rounds=1)


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

    no_lights = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights, mask=jnp.zeros_like(scene.lights.mask)))
    no_mesh = dataclasses.replace(
        no_lights, mesh_clusters=None, mesh_clusters_lod=None, mesh=None)

    def run(c, o, d, r0, r1, sc=scene):
        res = trace.trace_all(sc, o + c * 0, d, (r0, r1), cfg)
        return jnp.sum(res.radiance) * 1e-9

    base = timeit("round 0 (base)", run, o, d, r0, r1)
    nl = timeit("round 0, lights masked off",
                lambda c, *a: run(c, *a, sc=no_lights), o, d, r0, r1)
    nm = timeit("round 0, no mesh + no lights",
                lambda c, *a: run(c, *a, sc=no_mesh), o, d, r0, r1)
    print(f"\nshadow sweep + direct lighting      {base - nl:8.3f} ms",
          flush=True)
    print(f"primary mesh sweep + hit shading      {nl - nm:8.3f} ms",
          flush=True)
    print(f"bookkeeping floor (raygen/sky/state)  {nm:8.3f} ms", flush=True)
    if name == "island":
        vs.manager.shutdown()


if __name__ == "__main__":
    main()
