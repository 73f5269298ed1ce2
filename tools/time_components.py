"""Time individual frame components of a mesh scene on the real TPU.

Scan-difference method (see bench.py): each component runs inside one jit
as a lax.scan of length 1 vs 1+N with a chained carry; the difference
cancels dispatch+readback overhead. Reports ms per component.

Usage: python tools/time_components.py [scene] [W] [H]
"""

import sys
import time

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG as cfg
from yetanotherconsolegameengine_tpu.core import sampler
from yetanotherconsolegameengine_tpu.core.camera import CameraPose, make_jittered_rays
from yetanotherconsolegameengine_tpu.ops import trace
from yetanotherconsolegameengine_tpu.ops.intersect import INF, intersect_scene
from yetanotherconsolegameengine_tpu.ops.mesh_clusters import (
    _intersect_impl, _tile_cull, _sort_keys, TILE)
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

REPS = 10


def timeit(label, fn, *args):
    """fn(carry, *args) -> carry (scalar). Times reps inside one jit."""
    def runner(n):
        @jax.jit
        def f(*a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        float(f(*args))            # compile + warm
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0
    t1 = runner(1)
    tn = runner(1 + REPS)
    ms = (tn - t1) / REPS * 1000
    print(f"{label:34s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 135
    if name == "island":
        # Streamed minecraft-like world on the surface-cluster path, fully
        # loaded (the bench's steady state), spawn-orbit pose.
        import dataclasses
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
    mc = scene.mesh_clusters
    mcl = scene.mesh_clusters_lod or mc
    mcs = getattr(scene, "mesh_clusters_shadow", None) or mcl
    hi_w, hi_h = W, H * 2
    cam = CameraPose.create(list(scene.defaults[0:3]), scene.defaults[3],
                            scene.defaults[4], scene.defaults[5])
    o, d = make_jittered_rays(cam, hi_w, hi_h, 1)
    o = np.asarray(o.reshape(-1, 3))
    d = np.asarray(d.reshape(-1, 3))
    P = o.shape[0]
    print(f"scene={name} P={P} C={mc.n_clusters} C_lod={mcl.n_clusters}",
          flush=True)

    o_j = jnp.asarray(o)
    d_j = jnp.asarray(d)
    ones = jnp.ones((P,), jnp.float32)

    # 1. full wavefront trace (trace_all)
    seed = sampler.per_frame_seed(
        jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 1),
        jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 0),
        jnp.int32(1), cfg.seed_salt)
    rng = (np.asarray(seed[0].reshape(-1)), np.asarray(seed[1].reshape(-1)))

    def full_trace(c, o, d, r0, r1):
        res = trace.trace_all(scene, o + c * 0, d, (r0, r1), cfg)
        return jnp.sum(res.radiance) * 1e-9

    timeit("trace_all (full frame trace)", full_trace, o_j, d_j,
           jnp.asarray(rng[0]), jnp.asarray(rng[1]))

    # 2. single cluster sweep: primary rays, full mesh
    def sweep(c, o, d, mc=mc):
        h = _intersect_impl(mc, o + c * 0, d, ones * 1e-3, ones * INF)
        return jnp.sum(h.t * 0) + jnp.sum(h.u) * 1e-9

    timeit("primary sweep (full set)", sweep, o_j, d_j)

    # 2b. the set the frame's primary round ACTUALLY traces (fine proxy
    # when present, tables.py PRIMARY_LOD_TARGET_TRIS).
    mcf = getattr(scene, "mesh_clusters_fine", None)
    if mcf is not None:
        print(f"  (fine proxy: C_fine={mcf.n_clusters} kc={mcf.kc})",
              flush=True)
        timeit("primary sweep (FINE set)",
               lambda c, o, d: sweep(c, o, d, mc=mcf), o_j, d_j)

    # 3. same rays against the LOD set
    timeit("primary sweep (LOD set)",
           lambda c, o, d: sweep(c, o, d, mc=mcl), o_j, d_j)

    # 3b. L-major unsorted shadow sweep at W*L lanes vs the LOD set —
    # what the primary round's direct lighting actually runs (trace.py
    # lmajor_shadow; L point lights).
    L = int(np.asarray(scene.lights.mask).sum())
    if L > 0:
        from yetanotherconsolegameengine_tpu.ops.mesh_clusters import (
            intersect_clusters)

        def shadow_sweep(c, o, d, m=mcs):
            so = jnp.tile(o, (L, 1))
            sd = jnp.tile(d, (L, 1))
            h = intersect_clusters(m, so + c * 0, sd, 1e-3,
                                   jnp.full((P * L,), 8.0, jnp.float32),
                                   any_hit=bool(scene.mesh_all_opaque),
                                   presort=False)
            return jnp.sum(h.t * 0) + jnp.sum(
                h.hit.astype(jnp.float32)) * 1e-9

        timeit(f"shadow sweep (occl set, {L} lights, P*L)", shadow_sweep,
               o_j, d_j)
        if mcs is not mcl:
            timeit(f"shadow sweep (LOD set, {L} lights, P*L)",
                   lambda c, o, d: shadow_sweep(c, o, d, m=mcl), o_j, d_j)

    # 4. sort + unsort only (the binning infrastructure at P rays)
    def sort_only(c, o, d):
        key = _sort_keys(o + c * 0, d, jnp.ones((P,), bool), mc.bounds)
        iota = jnp.arange(P, dtype=jnp.int32)
        _, sidx = jax.lax.sort([key, iota], num_keys=1, is_stable=True)
        o_s = o[sidx]
        unsort = jnp.zeros((P,), jnp.int32).at[sidx].set(iota)
        return jnp.sum(o_s[unsort][:3, 0]) * 1e-9 + c * 0

    timeit("ray sort+gather+unsort", sort_only, o_j, d_j)

    # 5. cull only (full set)
    n_tiles = (P + TILE - 1) // TILE
    Pp = n_tiles * TILE

    def cull_only(c, o, d, cb0, cb1):
        o_t = jnp.pad(o, ((0, Pp - P), (0, 0))).reshape(n_tiles, TILE, 3)
        d_t = jnp.pad(d, ((0, Pp - P), (0, 0)),
                      constant_values=1.0).reshape(n_tiles, TILE, 3)
        act = jnp.ones((n_tiles, TILE), bool)
        tmx = jnp.full((n_tiles, TILE), 1e3, jnp.float32)
        ids, te, lens = _tile_cull(o_t + c * 0, d_t, act, tmx, cb0, cb1)
        return jnp.sum(lens).astype(jnp.float32) * 1e-9

    timeit("tile cull (full set)", cull_only, o_j, d_j, mc.cbmin, mc.cbmax)
    timeit("tile cull (LOD set)", cull_only, o_j, d_j, mcl.cbmin, mcl.cbmax)

    # 6. primitive tables only (floor etc.)
    prim_scene = dataclasses.replace(scene, mesh_clusters=None, mesh=None,
                                     mesh_clusters_lod=None)

    def prim(c, o, d):
        h = intersect_scene(prim_scene, o + c * 0, d, 1e-3, INF)
        return jnp.sum(h.t * 0) + jnp.sum(h.u) * 1e-9

    timeit("primitive tables sweep", prim, o_j, d_j)

    # 7. post stages (XLA path) at this resolution
    from yetanotherconsolegameengine_tpu.ops import ansi, atrous, taa, tonemap
    img = jnp.ones((hi_h, hi_w, 3), jnp.float32) * 0.5
    dep = jnp.ones((hi_h, hi_w), jnp.float32)
    sky = jnp.zeros((hi_h, hi_w), bool)

    def post(c, img, dep):
        blended = taa.temporal_blend(img + c * 0, img, dep, sky, img, img,
                                     dep, sky, jnp.asarray(True),
                                     jnp.asarray(False), cfg)
        den = atrous.atrous_denoise(blended, img, img, dep, sky, cfg)
        ae, expv = tonemap.update_exposure(den, sky, jnp.asarray(1.0), cfg,
                                           sample_step=2)
        cells = den.reshape(H, 2, 1, W, 1, 3).mean(axis=(2, 4))
        top = tonemap.map_pixels(cells[:, 0], expv, cfg)
        fg = ansi.rgb_to_ansi256(top)
        return jnp.sum(top) * 1e-9 + jnp.sum(fg).astype(jnp.float32) * 1e-12

    timeit("post stages (XLA, unfused)", post, img, dep)


if __name__ == "__main__":
    main()
