"""Bisect the island primary round's non-sweep cost.

time_round0.py showed (island @240x135): shadow+direct lighting 2.5 ms,
bookkeeping floor 0.2 ms, but "primary sweep + hit shading" 17.3 ms where
the standalone sweep (incl. resolve) is only ~5 ms. This builds the round
up stage by stage with the EXACT in-frame calls to find the missing ~12 ms.

Usage: python tools/time_round0b.py [scene] [W] [H]
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
from yetanotherconsolegameengine_tpu.ops.intersect import INF, intersect_scene
from yetanotherconsolegameengine_tpu.scene.materials import (
    gather_material, sample_albedo)
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
    print(f"{label:44s} {ms:8.3f} ms", flush=True)
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
    P = o.shape[0]
    print(f"scene={name} P={P}", flush=True)

    def sweep(c, o, d):
        h = intersect_scene(scene, o + c * 0, d, 1e-3, INF, presort=True)
        return jnp.sum(h.t * 0) + jnp.sum(h.u) * 1e-9

    def sweep_mat(c, o, d):
        h = intersect_scene(scene, o + c * 0, d, 1e-3, INF, presort=True)
        m = gather_material(scene.materials, h.mat)
        return (jnp.sum(h.t * 0) + jnp.sum(m.albedo) * 1e-9
                + jnp.sum(m.transparency) * 1e-12)

    def sweep_mat_alb(c, o, d):
        h = intersect_scene(scene, o + c * 0, d, 1e-3, INF, presort=True)
        m = gather_material(scene.materials, h.mat)
        p = o + h.t[:, None] * d
        uv = jnp.stack([h.u, h.v], axis=-1)
        alb = sample_albedo(m, p, uv, scene.textures, tint_pos=p + d * 1e-3)
        return jnp.sum(h.t * 0) + jnp.sum(alb) * 1e-9

    timeit("intersect_scene (in-frame primary call)", sweep, o, d)
    timeit("  + gather_material", sweep_mat, o, d)
    timeit("  + sample_albedo", sweep_mat_alb, o, d)
    if name == "island":
        vs.manager.shutdown()


if __name__ == "__main__":
    main()
