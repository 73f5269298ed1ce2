"""Wavefront path tracing: the whole pixel grid advances in lockstep.

The reference traces each pixel independently with an explicit 16-slot work
stack and nested mirror/diffuse loops
(/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:448-620,
``TraceFull``). TPU lanes execute in lockstep, so the recursion is
re-expressed as a *wavefront*: every pixel carries (current ray, throughput,
depth counters, a fixed-size stack, an RNG state) as device arrays, and one
``lax.while_loop`` round performs, for ALL pixels at once:

  scene intersect -> sky/emission accumulation -> branch classification
  (refraction push / mirror continue / diffuse shade + bounce) -> stack pop.

The loop runs until every pixel's stack is empty (bounded by the same depth
caps as the reference: 1 diffuse bounce, 2 mirror/refraction events, 16
stack slots), so the worst case is small and static — the property that
makes the reference's design map onto masked fixed-trip loops with no
semantic loss.

Shading semantics reproduced exactly: Oren–Nayar direct lighting with
inverse-square falloff (RaytraceRenderer.cs:810-831), Schlick Fresnel
reflect+refract splitting (:737-755), colored shadow transmittance through
transparent media capped at MaxRefractions re-hits (:757-798), vertical
sky-gradient miss shading (:474-486), emission accumulation (:500-504).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core import sampler
from ..scene.materials import gather_material, sample_albedo
from .intersect import INF, intersect_scene

_EPS = 1e-4  # RaytraceRenderer.Eps

# Ablation/debug knob for the between-rounds wavefront compaction (see
# trace_all); tests flip it to verify compacted == uncompacted output.
WAVEFRONT_COMPACTION = True

# Ablation knob for the provable stack-depth clamp (see trace_all): tests
# flip it to verify the clamped stack is bit-identical to the full
# cfg.path_stack_size stack on transparency-heavy scenes.
STACK_CLAMP = True


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def reflect(v, n):
    return v - n * (2.0 * _dot(v, n))[..., None]


def refract(v, n, eta):
    """Snell refraction; returns (has_refract, dir) (RaytraceRenderer.cs:737-748)."""
    cosi = -jnp.clip(_dot(v, n), -1.0, 1.0)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    has = k >= 0.0
    d = v * eta[..., None] + n * (eta * cosi - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None]
    return has, d


def fresnel_schlick(cos_theta, eta_i, eta_t):
    r0 = ((eta_i - eta_t) / (eta_i + eta_t)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5


def _normalize(v):
    return v / jnp.sqrt(jnp.maximum(1e-20, jnp.sum(v * v, axis=-1, keepdims=True)))


def oren_nayar(albedo, n, wo, wi, sigma_rad: float):
    """Oren–Nayar diffuse BRDF (RaytraceRenderer.cs:810-831), saturated."""
    cos_i = jnp.maximum(0.0, _dot(n, wi))
    cos_o = jnp.maximum(0.0, _dot(n, wo))
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
    proj_i = _normalize(wi - n * cos_i[..., None])
    proj_o = _normalize(wo - n * cos_o[..., None])
    cos_phi = jnp.maximum(0.0, _dot(proj_i, proj_o))
    s2 = sigma_rad * sigma_rad
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    sin_alpha = jnp.maximum(sin_i, sin_o)
    tan_beta = jnp.minimum(sin_i / jnp.maximum(1e-6, cos_i),
                           sin_o / jnp.maximum(1e-6, cos_o))
    on = a + b * cos_phi * sin_alpha * tan_beta
    f = albedo * (on * (1.0 / math.pi))[..., None]
    zero = (cos_i <= 0.0) | (cos_o <= 0.0)
    return jnp.where(zero[..., None], 0.0, jnp.clip(f, 0.0, 1.0))


def transmittance_to_lights(scene, so, sd, max_dist, need, cfg: RenderConfig,
                            lod: bool = False, presort: bool | None = None):
    """Colored transmittance along shadow rays, or binary occlusion for voxel
    worlds (RaytraceRenderer.ComputeTransmittanceToLight, :757-798).

    so/sd: (R, 3) shadow rays; max_dist: (R,); ``need`` marks lanes whose
    result is semantically used. ``lod`` routes the mesh sweep through the
    secondary-ray proxy set when the scene has one.
    Returns ((R, 3) transmittance, traced-ray count).
    """
    # Un-needed lanes get far-away origins so the BVH/DDA inner compaction
    # drops them immediately (see trace body).
    so = jnp.where(need[:, None], so, jnp.float32(2.9e30))
    if presort is None:
        presort = cfg.presort_shadow
    if scene.binary_shadows:
        def occluded(_):
            h = intersect_scene(scene, so, sd, 1e-3, max_dist, shadow=True,
                                lod=lod, presort=presort)
            return jnp.where(h.hit[:, None], 0.0, jnp.ones_like(so))

        trans = jax.lax.cond(jnp.any(need), occluded,
                             lambda _: jnp.ones_like(so), None)
        return trans, jnp.sum(need.astype(jnp.int32))

    def cond(st):
        return jnp.any(need & ~st["done"]) & (st["i"] < cfg.max_refractions)

    def body(st):
        rays = st["rays"] + jnp.sum((need & ~st["done"]).astype(jnp.int32))
        h = intersect_scene(scene, so, sd, st["tmin"], max_dist, shadow=True,
                            lod=lod, presort=presort)
        m = gather_material(scene.materials, h.mat)
        done = st["done"]
        trans = st["trans"]
        opaque = h.hit & (m.transparency <= 0.0) & ~done
        trans = jnp.where(opaque[:, None], 0.0, trans)
        through = h.hit & (m.transparency > 0.0) & ~done
        tint = m.transmission * m.transparency[:, None]
        trans = jnp.where(through[:, None], trans * tint, trans)
        faded = jnp.all(trans <= 1e-6, axis=-1)
        done = done | ~h.hit | opaque | faded
        return dict(trans=trans, done=done,
                    tmin=jnp.where(done, st["tmin"], h.t + _EPS),
                    rays=rays, i=st["i"] + 1)

    st = jax.lax.while_loop(cond, body, dict(
        trans=jnp.ones_like(so), done=jnp.zeros(so.shape[0], bool),
        tmin=jnp.full(so.shape[0], _EPS, jnp.float32),
        rays=jnp.int32(0), i=jnp.int32(0)))
    trans = jnp.where(jnp.all(st["trans"] <= 1e-6, axis=-1, keepdims=True),
                      0.0, st["trans"])
    return trans, st["rays"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TraceResult:
    radiance: jax.Array     # (P, 3) linear HDR
    is_sky: jax.Array       # (P,) bool
    albedo: jax.Array       # (P, 3) G-buffer
    normal: jax.Array       # (P, 3)
    depth: jax.Array        # (P,)
    rays_traced: jax.Array  # () i32 — semantic rays (primary+bounce+shadow)


def trace_all(scene, o0, d0, rng0, cfg: RenderConfig) -> TraceResult:
    """Trace every pixel's full path tree. o0/d0: (P, 3); rng0: u64 pair (P,)."""
    P = o0.shape[0]
    # Provable stack-depth bound (same derivation as pallas_trace.py
    # KERNEL_STACK): a refraction event pushes reflect+refract and the
    # pushing lane terminates and pops one back the same round (transparent
    # hits never continue in place), so the stack nets +1 per nesting
    # level with a within-round peak of +2; pushes require
    # mirror < max_mirror_bounces and pushed items carry mirror+1, so
    # nesting is capped at max_mirror_bounces levels => sp never exceeds
    # max_mirror_bounces + 1 (= 3 at default caps). Clamping the (S, P)
    # stack arrays to that bound is bit-identical (no push can ever be
    # dropped) and cuts the stack's where/pop traffic 5.3x at the 16-slot
    # default — measured ~14 ms/frame at 64.8k rays on the island.
    S = (min(cfg.path_stack_size, cfg.max_mirror_bounces + 1)
         if STACK_CLAMP else cfg.path_stack_size)
    sigma_rad = cfg.diffuse_sigma_deg * math.pi / 180.0
    use_lod = (cfg.secondary_mesh_lod
               and getattr(scene, "mesh_clusters_lod", None) is not None)
    use_fine = (cfg.primary_mesh_lod
                and getattr(scene, "mesh_clusters_fine", None) is not None)
    # No transparent material anywhere -> no refraction push can ever fire
    # -> statically elide the (S, P) stack arrays (they cost ~14 ms/frame
    # at 64.8k rays in pure where-traffic even when never pushed).
    use_stack = getattr(scene, "any_transparent", True)
    f3 = lambda: jnp.zeros((P, 3), jnp.float32)

    state = dict(
        o=o0, d=d0, beta=jnp.ones((P, 3), jnp.float32),
        mirror=jnp.zeros(P, jnp.int32), diffuse=jnp.zeros(P, jnp.int32),
        is_primary=jnp.ones(P, bool), active=jnp.ones(P, bool),
        radiance=f3(), primary_hit=jnp.zeros(P, bool),
        is_sky=jnp.zeros(P, bool),
        g_albedo=f3(), g_normal=f3(),
        g_depth=jnp.full(P, INF, jnp.float32),
        g_valid=jnp.zeros(P, bool),
        rng_hi=rng0[0], rng_lo=rng0[1],
        round=jnp.int32(0), rays=jnp.int32(0),
    )
    if use_stack:
        state.update(
            sp=jnp.zeros(P, jnp.int32),
            st_o=jnp.zeros((S, P, 3), jnp.float32),
            st_d=jnp.zeros((S, P, 3), jnp.float32),
            st_beta=jnp.zeros((S, P, 3), jnp.float32),
            st_mirror=jnp.zeros((S, P), jnp.int32),
            st_diffuse=jnp.zeros((S, P), jnp.int32),
        )

    def push(st, mask, item_o, item_d, item_beta, item_mirror, item_diffuse):
        if not use_stack:
            return st
        # (S, W) iota from the live stack shape: the loop may run at the
        # compacted width, not P (constant-folded by XLA either way).
        slot_iota = jax.lax.broadcasted_iota(jnp.int32,
                                             st["st_mirror"].shape, 0)
        mask = mask & (st["sp"] < S)
        sel = (slot_iota == st["sp"][None, :]) & mask[None, :]
        sel3 = sel[..., None]
        st["st_o"] = jnp.where(sel3, item_o[None], st["st_o"])
        st["st_d"] = jnp.where(sel3, item_d[None], st["st_d"])
        st["st_beta"] = jnp.where(sel3, item_beta[None], st["st_beta"])
        st["st_mirror"] = jnp.where(sel, item_mirror[None], st["st_mirror"])
        st["st_diffuse"] = jnp.where(sel, item_diffuse[None], st["st_diffuse"])
        st["sp"] = st["sp"] + mask.astype(jnp.int32)
        return st

    def cond(st):
        return jnp.any(st["active"]) & (st["round"] < cfg.max_trace_rounds)

    def body(st, lod_sweep: bool = False):
        o, d, beta = st["o"], st["d"], st["beta"]
        W = o.shape[0]   # full P in round 0, the compacted width after
        active = st["active"]
        st["rays"] = st["rays"] + jnp.sum(active.astype(jnp.int32))

        # Degenerate inactive lanes' rays to a far-away origin: the mesh
        # traversal and voxel DDA kill such rays in one round and their
        # internal ray compaction then shrinks the batch — without this,
        # finished wavefront lanes RE-MARCH the whole BVH/grid every outer
        # round (the dominant cost on mesh/voxel scenes once most paths
        # have terminated).
        o_q = jnp.where(active[:, None], o, jnp.float32(2.9e30))
        # ``lod_sweep`` is a PYTHON static: round 0 is peeled out of the
        # while loop below, so the full-detail primary sweep and the
        # LOD-proxy secondary sweep each compile exactly once and never
        # share a lax.cond (which XLA can flatten into executing BOTH
        # sweeps every round — measured ~20 ms/round on the dragon).
        hit = intersect_scene(scene, o_q, d, 1e-3, INF,
                              lod=use_lod and lod_sweep,
                              fine=use_fine and not lod_sweep,
                              # Round 0 is image-ordered; later rounds mix
                              # mirror/pop/bounce continuations -> bin them.
                              presort=(True if lod_sweep
                                       else cfg.presort_primary))
        m = gather_material(scene.materials, hit.mat)
        p = o + hit.t[:, None] * d
        uv = jnp.stack([hit.u, hit.v], axis=-1)
        base_albedo = sample_albedo(m, p, uv, scene.textures,
                                    tint_pos=p + d * 1e-3)

        # ---- miss: vertical sky gradient -----------------------------------
        miss = active & ~hit.hit
        tbg = 0.5 * (d[:, 1] + 1.0)
        sky = scene.bg_bottom * (1.0 - tbg[:, None]) + scene.bg_top * tbg[:, None]
        st["radiance"] = st["radiance"] + jnp.where(miss[:, None], beta * sky, 0.0)
        # Primary/G-buffer bookkeeping is statically elided in compacted
        # sub-batches (gather_batch drops the keys): every lane entering a
        # post-round-0 body has is_primary == False (round 0 clears it on
        # hit and misses terminate), so these updates are provable no-ops
        # there — and each dropped array is one less flat-cost compaction
        # gather + one less per-round where-write.
        hit_now = active & hit.hit
        if "g_valid" in st:
            primary_miss = miss & st["is_primary"] & ~st["primary_hit"]
            st["is_sky"] = st["is_sky"] | primary_miss
            st["g_valid"] = st["g_valid"] | primary_miss

            # ---- hit bookkeeping --------------------------------------------
            primary_now = hit_now & st["is_primary"]
            st["primary_hit"] = st["primary_hit"] | primary_now
            fill_g = primary_now & ~st["g_valid"]
            fg = fill_g[:, None]
            st["g_albedo"] = jnp.where(fg, base_albedo, st["g_albedo"])
            st["g_normal"] = jnp.where(fg, hit.n, st["g_normal"])
            st["g_depth"] = jnp.where(fill_g, hit.t, st["g_depth"])
            st["g_valid"] = st["g_valid"] | fill_g
            st["is_primary"] = st["is_primary"] & ~hit_now

        st["radiance"] = st["radiance"] + jnp.where(
            hit_now[:, None], beta * m.emission, 0.0)

        # ---- branch classification -----------------------------------------
        transparent = hit_now & (m.transparency > 0.0)
        can_bounce = st["mirror"] < cfg.max_mirror_bounces
        mirror = (hit_now & ~transparent
                  & (m.reflectivity >= cfg.mirror_threshold))
        diffuse = hit_now & ~transparent & ~mirror

        # ---- transparent: Fresnel-weighted reflect + refract pushes ---------
        tr_act = transparent & can_bounce
        n = hit.n
        front = _dot(n, d) < 0.0
        nl = jnp.where(front[:, None], n, -n)
        eta_i = jnp.where(front, 1.0, m.ior)
        eta_t = jnp.where(front, m.ior, 1.0)
        eta = eta_i / eta_t
        refl_dir = _normalize(reflect(d, nl))
        has_refr, refr_dir = refract(d, nl, eta)
        cos_theta = jnp.abs(_dot(nl, -d))
        fres = fresnel_schlick(cos_theta, eta_i, eta_t)
        tr_amt = jnp.clip(m.transparency, 0.0, 1.0)
        t_w = jnp.where(has_refr, (1.0 - fres) * tr_amt, 0.0)
        r_w = jnp.clip(fres + m.reflectivity * (1.0 - fres), 0.0, 1.0)

        st = push(st, tr_act & (r_w > 0.0),
                  p + nl * _EPS, refl_dir,
                  beta * base_albedo * r_w[:, None],
                  st["mirror"] + 1, st["diffuse"])
        st = push(st, tr_act & (t_w > 0.0),
                  p - nl * _EPS, _normalize(refr_dir),
                  beta * m.transmission * t_w[:, None],
                  st["mirror"] + 1, st["diffuse"])

        # ---- diffuse: ambient + direct lights + one cosine bounce -----------
        wo = -d
        amb = (scene.ambient_color * scene.ambient_intensity) * base_albedo
        st["radiance"] = st["radiance"] + jnp.where(diffuse[:, None], beta * amb, 0.0)

        lt = scene.lights
        L = lt.mask.shape[0]
        if L > 0:
            to_l = lt.pos[None] - p[:, None, :]                 # (P, L, 3)
            dist2 = jnp.maximum(1e-12, jnp.sum(to_l * to_l, axis=-1))
            dist = jnp.sqrt(dist2)
            ldir = to_l / dist[..., None]
            ndotl = jnp.maximum(0.0, jnp.einsum("pk,plk->pl", hit.n, ldir))
            # Zero-intensity lights contribute exactly 0 (atten factor), so
            # their shadow lanes are pure waste — gate them out of ``need``
            # and the far-origin degenerate path culls them. Load-bearing
            # for DayNight worlds: sun and moon intensities are mutually
            # exclusive (world/volume_scene.py), so this halves the live
            # island shadow lanes every frame. Bit-identical (contrib is
            # where(need)-masked).
            need = (diffuse[:, None] & lt.mask[None] & (ndotl > 0.0)
                    & (lt.intensity[None] > 0.0))

            # L-major lane order (cluster scenes): [light0: all rays]
            # [light1: ...] instead of ray-major interleaving, traced
            # UNSORTED — each 256-lane tile is then consecutive rays
            # toward ONE light (under the 16x16 block primary order, one
            # pixel block), so the binning sort's fixed ~3.5 ms at 130k
            # lanes drops out with near-sort frustum quality. Pure layout
            # transposes; per-(ray, light) results are identical up to
            # packed-t ties.
            lmaj = (cfg.lmajor_shadow and L > 1
                    and scene.mesh_clusters is not None)
            if lmaj:
                so = jnp.broadcast_to(
                    (p + hit.n * _EPS)[:, None, :],
                    (W, L, 3)).transpose(1, 0, 2).reshape(W * L, 3)
                sd = ldir.transpose(1, 0, 2).reshape(W * L, 3)
                smax = (dist - _EPS).T.reshape(W * L)
                sneed = need.T.reshape(W * L)
                trans, shadow_rays = transmittance_to_lights(
                    scene, so, sd, smax, sneed, cfg, lod=use_lod,
                    presort=False)
                trans = trans.reshape(L, W, 3).transpose(1, 0, 2)
            else:
                so = jnp.broadcast_to((p + hit.n * _EPS)[:, None, :],
                                      (W, L, 3)).reshape(W * L, 3)
                sd = ldir.reshape(W * L, 3)
                trans, shadow_rays = transmittance_to_lights(
                    scene, so, sd, (dist - _EPS).reshape(W * L),
                    need.reshape(W * L), cfg, lod=use_lod)
                trans = trans.reshape(W, L, 3)
            st["rays"] = st["rays"] + shadow_rays

            atten = lt.intensity[None] / dist2
            f_on = oren_nayar(base_albedo[:, None, :],
                              hit.n[:, None, :], wo[:, None, :],
                              ldir, sigma_rad)
            contrib = (f_on * ndotl[..., None] * lt.color[None]
                       * atten[..., None] * trans)
            contrib = jnp.where(need[..., None], contrib, 0.0)
            st["radiance"] = st["radiance"] + beta * jnp.sum(contrib, axis=1)

        want_bounce = diffuse & (st["diffuse"] < cfg.diffuse_bounces)
        rng = (st["rng_hi"], st["rng_lo"])
        new_rng, bounce_dir = sampler.cosine_sample_hemisphere(hit.n, rng)
        st["rng_hi"] = jnp.where(want_bounce, new_rng[0], st["rng_hi"])
        st["rng_lo"] = jnp.where(want_bounce, new_rng[1], st["rng_lo"])
        f_bounce = oren_nayar(base_albedo, hit.n, wo, bounce_dir, sigma_rad)
        bounce_beta = beta * f_bounce * jnp.float32(math.pi)

        # ---- continue in place vs pop ---------------------------------------
        mirror_cont = mirror & can_bounce
        cont = mirror_cont | want_bounce
        o_new = p + n * _EPS
        d_new = jnp.where(mirror_cont[:, None], _normalize(reflect(d, n)),
                          bounce_dir)
        beta_new = jnp.where(mirror_cont[:, None], beta * base_albedo,
                             bounce_beta)
        c3 = cont[:, None]
        st["o"] = jnp.where(c3, o_new, o)
        st["d"] = jnp.where(c3, d_new, d)
        st["beta"] = jnp.where(c3, beta_new, beta)
        st["mirror"] = st["mirror"] + mirror_cont.astype(jnp.int32)
        st["diffuse"] = st["diffuse"] + want_bounce.astype(jnp.int32)

        ended = active & ~cont
        if use_stack:
            slot_iota = jax.lax.broadcasted_iota(jnp.int32,
                                                 st["st_mirror"].shape, 0)
            can_pop = ended & (st["sp"] > 0)
            idx = jnp.maximum(st["sp"] - 1, 0)
            # Pop via select-sum over the slot axis (gathers cost ~5x the
            # whole intersection sweep on TPU; a (S, P) masked reduce is
            # pure VPU).
            pop_sel = (slot_iota == idx[None, :]).astype(jnp.float32)
            take = lambda a: jnp.sum(
                a * (pop_sel[..., None] if a.ndim == 3 else pop_sel), axis=0)
            take_i = lambda a: jnp.sum(a * pop_sel.astype(a.dtype), axis=0)
            pm3 = can_pop[:, None]
            st["o"] = jnp.where(pm3, take(st["st_o"]), st["o"])
            st["d"] = jnp.where(pm3, take(st["st_d"]), st["d"])
            st["beta"] = jnp.where(pm3, take(st["st_beta"]), st["beta"])
            st["mirror"] = jnp.where(can_pop, take_i(st["st_mirror"]),
                                     st["mirror"])
            st["diffuse"] = jnp.where(can_pop, take_i(st["st_diffuse"]),
                                      st["diffuse"])
            st["sp"] = st["sp"] - can_pop.astype(jnp.int32)
            st["active"] = active & (cont | can_pop)
        else:
            st["active"] = active & cont
        st["round"] = st["round"] + 1
        return st

    # Round 0 peeled out of the loop: the coherent primary sweep compiles
    # against the full-detail mesh, the loop body against the LOD proxy —
    # with no data-dependent branch between them.
    st = body(state)

    # Wavefront compaction between rounds (cluster scenes only): after the
    # primary round, actives are the continuation populations (mirror /
    # refraction / bounce rays — measured <=30% of P on typical island and
    # dragon frames), yet every later round still pays full-width sort,
    # cull, shadow-sweep, and shading traffic (~17 ms/round at 57.6k lanes
    # on the island). Packing survivors (actives sorted first) into P//2
    # halves every per-round cost. The OVERFLOW half runs as a second
    # compacted batch whose while_loop zero-trips when it holds no actives
    # (the common case) — so a pose where >half the wavefront continues
    # (camera filling the frame with bouncing terrain) degrades to the
    # uncompacted cost instead of silently dropping path energy. Per-ray
    # arithmetic is order-independent (the cluster kernel's near-to-far
    # early exit is exact per ray), so results match the uncompacted loop
    # up to radiance summation order; primitive/megakernel scenes skip
    # this path entirely (bit-exactness with the megakernel is CI-locked).
    compact = (WAVEFRONT_COMPACTION and scene.mesh_clusters is not None
               and P >= 4096)
    if compact:
        Pc = P // 2

        # The compacted sub-batches carry ONLY what post-round-0 rounds
        # read: ray/throughput/counters/RNG/stack. The G-buffer + primary
        # bookkeeping arrays (is_primary, primary_hit, is_sky, g_*) are
        # provably dead there (see body()) and stay at full width. The
        # carried fields pack into ONE (P, C) f32 matrix so each
        # compaction level pays a single flat-cost gather instead of ~18
        # per-array gathers (a P-wide gather costs a flat ~0.1-0.5 ms on
        # this chip regardless of row width — the round-5 island profile
        # attributed ~12 ms/frame to exactly this machinery).
        _bc = lambda a, t: jax.lax.bitcast_convert_type(a, t)

        def pack_state(src):
            f32 = jnp.float32
            cols = [src["o"], src["d"], src["beta"],
                    _bc(src["mirror"], f32)[:, None],
                    _bc(src["diffuse"], f32)[:, None],
                    src["active"].astype(f32)[:, None],
                    _bc(src["rng_hi"], f32)[:, None],
                    _bc(src["rng_lo"], f32)[:, None]]
            if use_stack:
                cols.append(_bc(src["sp"], f32)[:, None])
                for k in ("st_o", "st_d", "st_beta"):
                    w = src[k].shape[1]
                    cols.append(jnp.moveaxis(src[k], 0, 1).reshape(w, -1))
                for k in ("st_mirror", "st_diffuse"):
                    cols.append(_bc(jnp.moveaxis(src[k], 0, 1), f32))
            return jnp.concatenate(cols, axis=1)

        def unpack_state(rows, rnd, rays):
            f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
            n = rows.shape[0]
            sub = dict(
                o=rows[:, 0:3], d=rows[:, 3:6], beta=rows[:, 6:9],
                mirror=_bc(rows[:, 9], i32), diffuse=_bc(rows[:, 10], i32),
                active=rows[:, 11] > 0.5,
                rng_hi=_bc(rows[:, 12], u32), rng_lo=_bc(rows[:, 13], u32),
                radiance=jnp.zeros((n, 3), f32),
                round=rnd, rays=rays)
            if use_stack:
                sub["sp"] = _bc(rows[:, 14], i32)
                off = 15
                for k in ("st_o", "st_d", "st_beta"):
                    sub[k] = jnp.moveaxis(
                        rows[:, off:off + 3 * S].reshape(n, S, 3), 1, 0)
                    off += 3 * S
                for k in ("st_mirror", "st_diffuse"):
                    sub[k] = jnp.moveaxis(
                        _bc(rows[:, off:off + S], i32), 1, 0)
                    off += S
            return sub

        def active_order(src):
            return jnp.argsort(jnp.where(src["active"], 0, 1)
                               .astype(jnp.int32), stable=True)

        body_lod = lambda s: body(s, lod_sweep=True)
        order = active_order(st)
        rows_sorted = pack_state(st)[order]   # the ONE level-1 gather
        rad_parts = []
        for bi, (lo, hi) in enumerate(((0, Pc), (Pc, P))):
            sub = unpack_state(rows_sorted[lo:hi],
                               st["round"], st["rays"])
            if bi == 0 and Pc // 4 >= 512:
                # SECOND compaction level: round 1 (the first LOD round —
                # bounce/mirror/refraction shading of the primary hits) runs
                # at Pc, then its survivors (mirror chains and stack pops;
                # measured a few % of P) repack into Pc//4 = P//8, so every
                # round >= 2 pays 1/8-width sort/cull/shadow/shading instead
                # of 1/2. Same overflow contract as level 1: the 3P/8 tail
                # batch zero-trips when empty, so a pose with >P/8 survivors
                # degrades to the old cost rather than dropping energy. Only
                # the actives-packed first batch nests — the level-1
                # overflow batch is already the rare case.
                # Round 0 is peeled, so every lane enters here at round == 1:
                # run exactly round 1 (zero-trips when the batch is empty).
                sub = jax.lax.while_loop(
                    lambda s: cond(s) & (s["round"] < 2), body_lod, sub)
                Pc2 = Pc // 4
                order2 = active_order(sub)
                rows2 = pack_state(sub)[order2]   # the ONE level-2 gather
                rad2_parts = []
                for lo2, hi2 in ((0, Pc2), (Pc2, Pc)):
                    sub2 = unpack_state(rows2[lo2:hi2],
                                        sub["round"], sub["rays"])
                    sub2 = jax.lax.while_loop(cond, body_lod, sub2)
                    rad2_parts.append(sub2["radiance"])
                    sub["rays"] = sub2["rays"]
                sub["radiance"] = sub["radiance"].at[order2].add(
                    jnp.concatenate(rad2_parts), unique_indices=True)
            else:
                sub = jax.lax.while_loop(cond, body_lod, sub)
            rad_parts.append(sub["radiance"])
            st["rays"] = sub["rays"]
        st["radiance"] = st["radiance"].at[order].add(
            jnp.concatenate(rad_parts), unique_indices=True)
    else:
        st = jax.lax.while_loop(cond, lambda s: body(s, lod_sweep=True), st)
    return TraceResult(radiance=st["radiance"], is_sky=st["is_sky"],
                       albedo=st["g_albedo"], normal=st["g_normal"],
                       depth=st["g_depth"], rays_traced=st["rays"])
