"""Time each dragon cluster sweep standalone with REAL frame populations.

Builds the round-0/round-1 ray populations exactly as ops/trace.py does
(via one stats program), pulls them to host, then times each sweep as its
own scan-difference jit. Pins down per-visit cost vs fixed overhead.
"""
import sys, time, dataclasses
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, ".")
from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG as cfg
from yetanotherconsolegameengine_tpu.core import sampler
from yetanotherconsolegameengine_tpu.core.camera import CameraPose, make_jittered_rays
from yetanotherconsolegameengine_tpu.ops.intersect import INF, intersect_scene, merge
from yetanotherconsolegameengine_tpu.ops.mesh_clusters import _intersect_impl
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS
from yetanotherconsolegameengine_tpu.scene.materials import gather_material

REPS = 10

def timeit(label, mc, o, d, tlo, thi, any_hit=False, presort=True):
    o, d = jnp.asarray(o), jnp.asarray(d)
    tlo, thi = jnp.asarray(tlo), jnp.asarray(thi)
    def runner(n):
        @jax.jit
        def f(o, d, tlo, thi):
            def body(c, _):
                h = _intersect_impl(mc, o, d, tlo + c*0, thi, any_hit=any_hit, presort=presort)
                return jnp.sum(h.t * 0) + jnp.float32(1e-9) * jnp.sum(h.hit), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        float(f(o, d, tlo, thi))
        t0 = time.perf_counter(); float(f(o, d, tlo, thi))
        return time.perf_counter() - t0
    t1 = runner(1); tn = runner(1 + REPS)
    ms = (tn - t1) / REPS * 1000
    h, (visits, lens, _) = _intersect_impl(mc, o, d, tlo, thi, stats=True, any_hit=any_hit, presort=presort)
    v = int(np.asarray(visits).sum())
    print(f"{label:24s} {ms:8.2f} ms  visits={v:6d}  ns/visit={ms*1e6/max(v,1):7.0f}", flush=True)

def main():
    scene = SCENE_BUILDERS["dragon"]()
    mc, mcl = scene.mesh_clusters, scene.mesh_clusters_lod
    W, H = 240, 135
    hi_w, hi_h = W, H*2
    cam = CameraPose.create(list(scene.defaults[0:3]), *scene.defaults[3:6])
    prim = dataclasses.replace(scene, mesh_clusters=None, mesh=None)
    lt = scene.lights; L = lt.mask.shape[0]

    @jax.jit
    def pops():
        o, d = make_jittered_rays(cam, hi_w, hi_h, 1)
        o = o.reshape(-1, 3); d = d.reshape(-1, 3); P = o.shape[0]
        hp = intersect_scene(prim, o, d, 1e-3, INF)
        h0 = _intersect_impl(mc, o, d, jnp.full((P,), 1e-3), hp.t + 1e-3)
        h = merge(hp, h0)
        m = gather_material(scene.materials, h.mat)
        p_pt = o + h.t[:, None] * d
        diffuse = h.hit & (m.transparency <= 0.0) & (m.reflectivity < cfg.mirror_threshold)
        to_l = lt.pos[None] - p_pt[:, None, :]
        dist = jnp.sqrt(jnp.maximum(1e-12, jnp.sum(to_l**2, -1)))
        ldir = to_l / dist[..., None]
        ndotl = jnp.maximum(0.0, jnp.einsum("pk,plk->pl", h.n, ldir))
        need = diffuse[:, None] & lt.mask[None] & (ndotl > 0.0)
        so = jnp.broadcast_to((p_pt + h.n*1e-4)[:, None, :], (P, L, 3)).reshape(-1, 3)
        so = jnp.where(need.reshape(-1)[:, None], so, jnp.float32(2.9e30))
        sd = ldir.reshape(-1, 3)
        smax = jnp.where(need.reshape(-1), (dist - 1e-4).reshape(-1), 0.0)
        seed = sampler.per_frame_seed(
            jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 1),
            jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 0),
            jnp.int32(1), cfg.seed_salt)
        _, bdir = sampler.cosine_sample_hemisphere(h.n, (seed[0].reshape(-1), seed[1].reshape(-1)))
        bo = jnp.where(diffuse[:, None], p_pt + h.n*1e-4, jnp.float32(2.9e30))
        hpb = intersect_scene(prim, bo, bdir, 1e-3, INF)
        return o, d, hp.t + 1e-3, so, sd, smax, bo, bdir, hpb.t + 1e-3
    o, d, pclip, so, sd, smax, bo, bdir, bclip = [np.asarray(x) for x in pops()]
    P = o.shape[0]
    print(f"P={P} shadowP={so.shape[0]}", flush=True)
    bias = np.float32(mcl.t_bias)
    mcf = getattr(scene, "mesh_clusters_fine", None) or mc
    tlo_p = np.full(P, 1e-3, np.float32)
    tlo_s = np.maximum(np.full(so.shape[0], 1e-3, np.float32), bias)
    tlo_b = np.maximum(np.full(P, 1e-3, np.float32), bias)
    # presort A/B: primary rays are image-ordered and shadow-ray origins
    # are image-ordered primary hits, so skipping the binning sort may
    # beat paying it; bounce directions are cosine-random (control).
    for ps in (True, False):
        tag = "sort" if ps else "nosort"
        timeit(f"primary fine ({tag})", mcf, o, d, tlo_p, pclip, presort=ps)
        timeit(f"shadow r0 LOD anyhit ({tag})", mcl, so, sd, tlo_s, smax,
               any_hit=True, presort=ps)
        timeit(f"bounce LOD ({tag})", mcl, bo, bdir, tlo_b, bclip, presort=ps)
    # L-major lane order (each light's rays contiguous) for the unsorted
    # shadow sweep: an interleaved 256-lane tile mixes rays to L lights
    # (wide direction intervals); L-major tiles converge on ONE light.
    Lp = so.shape[0] // P
    som = so.reshape(P, Lp, 3).transpose(1, 0, 2).reshape(-1, 3)
    sdm = sd.reshape(P, Lp, 3).transpose(1, 0, 2).reshape(-1, 3)
    smaxm = smax.reshape(P, Lp).T.reshape(-1)
    tlosm = tlo_s.reshape(P, Lp).T.reshape(-1)
    timeit("shadow r0 Lmajor (nosort)", mcl, som, sdm, tlosm, smaxm,
           any_hit=True, presort=False)
    timeit("primary full(clip)", mc, o, d, tlo_p, pclip)
    # fixed-cost floor: all rays inactive at shadow width
    dead = np.full_like(so, 2.9e30)
    for ps in (True, False):
        tag = "sort" if ps else "nosort"
        timeit(f"empty sweep @130k ({tag})", mcl, dead, sd,
               np.full(so.shape[0], 1e-3, np.float32),
               np.zeros(so.shape[0], np.float32), any_hit=True, presort=ps)

if __name__ == "__main__":
    main()
