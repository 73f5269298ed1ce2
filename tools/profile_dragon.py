"""Decompose the dragon frame cost into its cluster sweeps.

Reconstructs the wavefront rounds of ops/trace.py as explicit steps
(primary intersect -> primary shadows -> diffuse bounce -> bounce shadows)
over the real dragon scene inside ONE jitted program, and reports each
sweep's visit statistics (cluster DMAs actually executed, list lengths,
active tiles). One compile, one dispatch.

Usage:  python tools/profile_dragon.py [scene] [W] [H]
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
from yetanotherconsolegameengine_tpu.ops.intersect import INF, intersect_scene, merge
from yetanotherconsolegameengine_tpu.ops.mesh_clusters import _intersect_impl
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS
from yetanotherconsolegameengine_tpu.scene.materials import gather_material


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 135
    t0 = time.time()
    scene = SCENE_BUILDERS[name]()
    mc = scene.mesh_clusters
    print(f"scene={name} clusters={mc.n_clusters} build={time.time()-t0:.1f}s",
          flush=True)
    hi_w, hi_h = W, H * 2
    d0, y, p, fov = (scene.defaults[0:3], scene.defaults[3],
                     scene.defaults[4], scene.defaults[5])
    cam = CameraPose.create(list(d0), y, p, fov)
    prim_scene = dataclasses.replace(scene, mesh_clusters=None, mesh=None)
    lt = scene.lights
    L = lt.mask.shape[0]

    use_lod = scene.mesh_clusters_lod is not None and "nolod" not in sys.argv
    mc_lod = scene.mesh_clusters_lod if use_lod else mc
    mc_shad = (getattr(scene, "mesh_clusters_shadow", None)
               if use_lod else None) or mc_lod
    print(f"occlusion set: {mc_shad.n_clusters} clusters")
    print(f"secondary set: {'LOD' if use_lod else 'full'} "
          f"({mc_lod.n_clusters} clusters, bias {mc_lod.t_bias:.4f})")
    use_fine = (getattr(scene, "mesh_clusters_fine", None) is not None
                and "nofine" not in sys.argv)
    mc_prim = scene.mesh_clusters_fine if use_fine else mc
    print(f"primary set: {'FINE' if use_fine else 'full'} "
          f"({mc_prim.n_clusters} clusters)")

    def sweep_stats(o, d, tlo, thi, any_hit=False, secondary=False):
        m = (mc_shad if any_hit else mc_lod) if secondary else mc_prim
        tlo = jnp.maximum(jnp.broadcast_to(jnp.asarray(tlo, jnp.float32),
                                           (o.shape[0],)),
                          jnp.float32(m.t_bias))
        h, (visits, lens, _) = _intersect_impl(
            m, o, d, tlo, thi, stats=True, any_hit=any_hit)
        return h, (jnp.sum(visits), jnp.sum(lens),
                   jnp.sum(lens > 0), jnp.sum(thi > 0))

    def shadow_pop(hit_p, n, diffuse, P):
        to_l = lt.pos[None] - hit_p[:, None, :]
        dist = jnp.sqrt(jnp.maximum(1e-12, jnp.sum(to_l ** 2, axis=-1)))
        ldir = to_l / dist[..., None]
        ndotl = jnp.maximum(0.0, jnp.einsum("pk,plk->pl", n, ldir))
        need = diffuse[:, None] & lt.mask[None] & (ndotl > 0.0)
        so = jnp.broadcast_to((hit_p + n * 1e-4)[:, None, :],
                              (P, L, 3)).reshape(-1, 3)
        so = jnp.where(need.reshape(-1)[:, None], so, jnp.float32(2.9e30))
        sd = ldir.reshape(-1, 3)
        smax = jnp.where(need.reshape(-1), (dist - 1e-4).reshape(-1), 0.0)
        return so, sd, smax

    @jax.jit
    def profile():
        o, d = make_jittered_rays(cam, hi_w, hi_h, 1)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        P = o.shape[0]
        out = {}
        hp = intersect_scene(prim_scene, o, d, 1e-3, INF)
        t_clip = hp.t + 1e-3
        h0, out["primary"] = sweep_stats(o, d, 1e-3, t_clip)
        h = merge(hp, h0)
        m = gather_material(scene.materials, h.mat)
        p_pt = o + h.t[:, None] * d
        diffuse = (h.hit & (m.transparency <= 0.0)
                   & (m.reflectivity < cfg.mirror_threshold))
        out["mesh_hits"] = jnp.sum(h0.hit)
        out["diffuse_hits"] = jnp.sum(diffuse)

        so, sd, smax = shadow_pop(p_pt, h.n, diffuse, P)
        _, out["shadow_r0"] = sweep_stats(so, sd, 1e-3, smax, any_hit=True, secondary=True)

        px = jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 1)
        py = jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 0)
        seed = sampler.per_frame_seed(px, py, jnp.int32(1), cfg.seed_salt)
        rng = (seed[0].reshape(-1), seed[1].reshape(-1))
        _, bdir = sampler.cosine_sample_hemisphere(h.n, rng)
        bo = jnp.where(diffuse[:, None], p_pt + h.n * 1e-4,
                       jnp.float32(2.9e30))
        hpb = intersect_scene(prim_scene, bo, bdir, 1e-3, INF)
        hb0, out["bounce"] = sweep_stats(bo, bdir, 1e-3, hpb.t + 1e-3, secondary=True)
        hb = merge(hpb, hb0)
        bp = bo + hb.t[:, None] * bdir
        bdiff = hb.hit & diffuse
        out["bounce_hits"] = jnp.sum(hb0.hit & diffuse)
        so, sd, smax = shadow_pop(bp, hb.n, bdiff, P)
        _, out["shadow_r1"] = sweep_stats(so, sd, 1e-3, smax, any_hit=True, secondary=True)
        return out

    print("compiling...", flush=True)
    t0 = time.time()
    out = jax.tree_util.tree_map(lambda x: np.asarray(x), profile())
    print(f"compile+run {time.time()-t0:.1f}s", flush=True)
    print(f"mesh hits {out['mesh_hits']}  diffuse {out['diffuse_hits']}  "
          f"bounce mesh hits {out['bounce_hits']}")
    tot = 0
    for k in ("primary", "shadow_r0", "bounce", "shadow_r1"):
        v, l, tiles, rays = out[k]
        tot += int(v)
        print(f"{k:12s} rays={int(rays):7d} visits={int(v):7d} "
              f"listed={int(l):7d} tiles={int(tiles):4d}")
    print(f"total visits/frame: {tot}   (x0.8us = {tot*0.8e-3:.1f} ms)")


if __name__ == "__main__":
    main()
