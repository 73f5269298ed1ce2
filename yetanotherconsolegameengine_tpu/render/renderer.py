"""The frame engine: one jitted device program per frame.

TPU-first restructuring of the reference's frame procedure
(/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:157-267,
``TryFlipAndBlit``): the five serial stages — jittered ray generation,
path trace, temporal blend, à-trous denoise, auto-exposure/tone-map +
half-block downsample — fuse into a single ``jit``-compiled function
``frame_step`` whose inputs are the scene tables, a camera pose, and a
device-resident ``FrameState`` (TAA history + guides, exposure EMA, last
camera, frame counter). The state is donated, so history updates are
in-place on device; only the quantized cell grids return to the host.

Buffer geometry matches the reference: tracing happens at
``hi_w = fb_w * ss`` by ``hi_h = fb_h * 2 * ss`` (two vertical pixels per
character cell — the '▀' half-block trick, RaytraceRenderer.cs:86-87), and
each cell averages ss*ss traced texels per half (:229-264).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, RenderConfig
from ..core import sampler
from ..core.camera import CameraPose, make_jittered_rays
from ..ops import ansi, atrous, taa, tonemap, trace
from ..ops.intersect import INF
from ..scene.tables import SceneData


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameState:
    """Device-resident state threaded through frames (donated)."""

    history: jax.Array       # (hiH, hiW, 3)
    prev_normal: jax.Array   # (hiH, hiW, 3)
    prev_depth: jax.Array    # (hiH, hiW)
    prev_sky: jax.Array      # (hiH, hiW) bool
    history_valid: jax.Array # () bool
    ae_exposure: jax.Array   # () f32
    last_cam: jax.Array      # (3,)
    last_yaw: jax.Array      # ()
    last_pitch: jax.Array    # ()
    have_last: jax.Array     # () bool
    frame_idx: jax.Array     # () i32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameOutput:
    """Per-cell results: SDR colors + quantized indices, (fb_h, fb_w[, 3])."""

    top_rgb: jax.Array      # tone-mapped [0,1] — the '▀' foreground color
    bot_rgb: jax.Array      # background color
    fg_ansi: jax.Array      # int32 ANSI-256 index
    bg_ansi: jax.Array
    rays_traced: jax.Array  # () i32 — telemetry for the HUD / benchmarks


def init_state(fb_w: int, fb_h: int, ss: int = 1) -> FrameState:
    hi_w, hi_h = fb_w * ss, fb_h * 2 * ss
    f = jnp.zeros((hi_h, hi_w, 3), jnp.float32)
    return FrameState(
        history=f, prev_normal=f,
        prev_depth=jnp.zeros((hi_h, hi_w), jnp.float32),
        prev_sky=jnp.zeros((hi_h, hi_w), bool),
        history_valid=jnp.asarray(False),
        ae_exposure=jnp.asarray(1.0, jnp.float32),
        last_cam=jnp.zeros(3, jnp.float32),
        last_yaw=jnp.asarray(0.0, jnp.float32),
        last_pitch=jnp.asarray(0.0, jnp.float32),
        have_last=jnp.asarray(False),
        frame_idx=jnp.asarray(0, jnp.int32),
    )


def frame_step(scene: SceneData, cam: CameraPose, state: FrameState,
               fb_w: int, fb_h: int, ss: int = 1,
               cfg: RenderConfig = DEFAULT_CONFIG, host_scene=None,
               pallas_interpret: bool = False, fused_post=None,
               precomp=None):
    """Render one frame. Pure; jit with static (fb_w, fb_h, ss, cfg,
    host_scene, pallas_interpret, fused_post).

    ``host_scene`` (a pallas_trace._HostScene snapshot) routes the trace
    through the Pallas megakernel (raygen + RNG seeding run in-kernel);
    None keeps the XLA wavefront trace (CPU tests, mesh/voxel scenes,
    dynamic scenes). ``fused_post`` selects the fused Pallas post program
    for the TAA/denoise/exposure(+tail) stages independently of the trace
    path — mesh/voxel scenes trace through XLA but still post through
    Pallas on TPU; None (default) follows the trace path choice.
    ``pallas_interpret`` runs the Pallas programs through the interpreter
    for CPU-based CI.

    ``precomp``: optional (ray_params_row (18,), reset ()) computed
    OUTSIDE a frame scan. The camera-basis scalars are ~40 scalar HLO ops
    that run on the TPU scalar unit — ~46 us/frame when traced inside a
    scan body, but one vectorized batch for ALL frames when hoisted
    (frame_scan does this)."""
    ss = max(1, ss)
    hi_w, hi_h = fb_w * ss, fb_h * 2 * ss
    frame = state.frame_idx + 1
    frame_idx = frame & 0x7FFFFFFF

    if precomp is not None:
        params_row, reset = precomp
    else:
        params_row = None
        reset = taa.should_reset_history(
            cam.pos, cam.yaw, cam.pitch,
            state.last_cam, state.last_yaw, state.last_pitch,
            state.have_last, cfg)
    if scene.has_dynamic_textures:
        reset = jnp.asarray(True)

    from ..ops import pallas_post
    if fused_post is None:
        fused_post = host_scene is not None
    fuse_post = fused_post and pallas_post.post_fuse_ok(hi_w, hi_h)

    # ---- trace: Pallas megakernel (static primitive scenes) or the XLA
    # wavefront (everything else). Both produce per-plane results.
    if host_scene is not None and fuse_post:
        from ..ops.pallas_trace import trace_planes_pallas
        rad3, sky_f, alb3, n3, dep, rays_traced = trace_planes_pallas(
            scene, host_scene, cam, frame_idx, hi_w, hi_h, cfg,
            interpret=pallas_interpret, params=params_row)
        g_depth = jnp.where(dep >= INF, jnp.float32(3.4e38), dep)
    else:
        if host_scene is not None:
            from ..ops.pallas_trace import trace_all_pallas
            res = trace_all_pallas(scene, host_scene, cam, frame_idx,
                                   hi_w, hi_h, cfg,
                                   interpret=pallas_interpret,
                                   params=params_row)
        else:
            # Ray generation (RaytraceRenderer.cs:183-194).
            o, d = make_jittered_rays(cam, hi_w, hi_h, frame_idx,
                                      params=params_row)
            # Per-pixel RNG seeds (RaytraceRenderer.cs:203).
            px = jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 1)
            py = jax.lax.broadcasted_iota(jnp.uint32, (hi_h, hi_w), 0)
            seed = sampler.per_frame_seed(px, py, frame_idx, cfg.seed_salt)
            use_blocks = (cfg.block_order_primary
                          and scene.mesh_clusters is not None
                          and hi_w % 16 == 0)
            if use_blocks:
                # 16x16 pixel-block lane order: the cluster sweep's tiles
                # (TILE=256 consecutive lanes) become square pixel blocks
                # with tight frusta instead of full-width row strips —
                # pure layout transforms, no sort (pairs with
                # presort_primary=False). Rows pad to a multiple of 16
                # with dead lanes (killed by the global-AABB prefilter in
                # round 0 and excluded from the semantic ray count).
                hp16 = (hi_h + 15) // 16 * 16

                def to_blocks(x, fill):
                    if hp16 != hi_h:
                        pad = [(0, hp16 - hi_h), (0, 0)]
                        pad += [(0, 0)] * (x.ndim - 2)
                        x = jnp.pad(x, pad, constant_values=fill)
                    tail = x.shape[2:]
                    x = x.reshape(hp16 // 16, 16, hi_w // 16, 16, *tail)
                    return jnp.moveaxis(x, 1, 2).reshape(hp16 * hi_w, *tail)

                def from_blocks(x):
                    tail = x.shape[1:]
                    x = x.reshape(hp16 // 16, hi_w // 16, 16, 16, *tail)
                    x = jnp.moveaxis(x, 2, 1).reshape(hp16, hi_w, *tail)
                    return x[:hi_h].reshape(hi_h * hi_w, *tail)

                # Block-ordered lanes are already tile-coherent: skip the
                # binning sort for the primary sweep (its whole point);
                # cfg.presort_primary still governs the non-block fallback.
                cfg_blk = dataclasses.replace(cfg, presort_primary=False)
                rb = trace.trace_all(
                    scene, to_blocks(o, 2.9e30), to_blocks(d, 1.0),
                    (to_blocks(seed[0], 0), to_blocks(seed[1], 0)), cfg_blk)
                res = trace.TraceResult(
                    radiance=from_blocks(rb.radiance),
                    is_sky=from_blocks(rb.is_sky),
                    albedo=from_blocks(rb.albedo),
                    normal=from_blocks(rb.normal),
                    depth=from_blocks(rb.depth),
                    rays_traced=rb.rays_traced - (hp16 - hi_h) * hi_w)
            else:
                res = trace.trace_all(
                    scene, o.reshape(-1, 3), d.reshape(-1, 3),
                    (seed[0].reshape(-1), seed[1].reshape(-1)), cfg)
        rays_traced = res.rays_traced
        g_depth = jnp.where(res.depth.reshape(hi_h, hi_w) >= INF,
                            jnp.float32(3.4e38),
                            res.depth.reshape(hi_h, hi_w))
        if fuse_post:
            rad3 = tuple(res.radiance.reshape(hi_h, hi_w, 3)[..., k]
                         for k in range(3))
            alb3 = tuple(res.albedo.reshape(hi_h, hi_w, 3)[..., k]
                         for k in range(3))
            n3 = tuple(res.normal.reshape(hi_h, hi_w, 3)[..., k]
                       for k in range(3))
            sky_f = res.is_sky.reshape(hi_h, hi_w).astype(jnp.float32)

    fused_tail = None
    if fuse_post:
        # One Pallas program for TAA + à-trous + exposure (+ the
        # tone-map/ANSI tail when ss == 1).
        hist3 = tuple(state.history[..., k] for k in range(3))
        pn3 = tuple(state.prev_normal[..., k] for k in range(3))
        post_args = (cfg, max(2, ss * 2), rad3, alb3, n3, g_depth, sky_f,
                     hist3, pn3, state.prev_depth,
                     state.prev_sky.astype(jnp.float32),
                     state.history_valid, reset, state.ae_exposure)
        if ss == 1:
            blended, mapped, ansi_full, new_ae = pallas_post.post_fused_tail(
                *post_args, interpret=pallas_interpret)
            # Deinterleave even/odd rows into the '▀' top/bottom grids.
            fused_tail = (mapped[0::2], mapped[1::2],
                          ansi_full[0::2], ansi_full[1::2])
        else:
            blended, denoised, new_ae = pallas_post.post_fused(
                *post_args, interpret=pallas_interpret)
        exposure = cfg.tone_exposure * new_ae
        sky = sky_f > 0.5
        g_normal = jnp.stack(n3, axis=-1)
    else:
        hdr = res.radiance.reshape(hi_h, hi_w, 3)
        sky = res.is_sky.reshape(hi_h, hi_w)
        g_albedo = res.albedo.reshape(hi_h, hi_w, 3)
        g_normal = res.normal.reshape(hi_h, hi_w, 3)

        # Temporal blend (:218) and spatial denoise (:221-224).
        blended = taa.temporal_blend(hdr, g_normal, g_depth, sky,
                                     state.history, state.prev_normal,
                                     state.prev_depth, state.prev_sky,
                                     state.history_valid, reset, cfg)
        denoised = atrous.atrous_denoise(blended, g_albedo, g_normal,
                                         g_depth, sky, cfg)

        # Auto exposure (:226-227).
        new_ae, exposure = tonemap.update_exposure(
            denoised, sky, state.ae_exposure, cfg,
            sample_step=max(2, ss * 2))

    if fused_tail is not None:
        top, bot, fg_a, bg_a = fused_tail
    else:
        # Half-block downsample + tone map (:229-264).
        cells = denoised.reshape(fb_h, 2, ss, fb_w, ss, 3).mean(axis=(2, 4))
        top = tonemap.map_pixels(cells[:, 0], exposure, cfg)
        bot = tonemap.map_pixels(cells[:, 1], exposure, cfg)
        fg_a = ansi.rgb_to_ansi256(top)
        bg_a = ansi.rgb_to_ansi256(bot)

    out = FrameOutput(
        top_rgb=top, bot_rgb=bot,
        fg_ansi=fg_a,
        bg_ansi=bg_a,
        rays_traced=rays_traced,
    )
    new_state = FrameState(
        history=blended, prev_normal=g_normal, prev_depth=g_depth,
        prev_sky=sky, history_valid=jnp.asarray(True),
        ae_exposure=new_ae,
        last_cam=cam.pos, last_yaw=cam.yaw, last_pitch=cam.pitch,
        have_last=jnp.asarray(True), frame_idx=frame,
    )
    return out, new_state


def _rgb_u8(x: jax.Array) -> jax.Array:
    """Quantize a display-referred [0,1] RGB plane to u8 for the stacked
    batched readback (round-to-nearest; decode is /255)."""
    return (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def frame_scan(scene: SceneData, cams: CameraPose, state: FrameState,
               fb_w: int, fb_h: int, ss: int = 1,
               cfg: RenderConfig = DEFAULT_CONFIG, host_scene=None,
               fused_post=None, stack_rgb: bool = False,
               scene_fn=None, ts=None):
    """Render a SEQUENCE of frames in one device program.

    ``cams`` is a CameraPose pytree with a leading (N,) axis. TAA history,
    exposure EMA, and the frame counter thread through ``lax.scan``, so
    this is the real frame loop — just without a host round-trip per frame
    (the reference's Terminal loop necessarily pays one per frame;
    Terminal.cs:126-184).

    Returns ((fg_ansi_u8, bg_ansi_u8) stacked (N, fb_h, fb_w), the last
    frame's full FrameOutput, final state). Only the quantized cell grids
    are stacked per frame by default — that is all a terminal consumer
    needs, and stacking full f32 RGB planes costs ~10x the render itself.
    ``stack_rgb=True`` (the batched app loop, which blits RGB into the
    framebuffer for the window backend / PNG export) also stacks the
    tone-mapped top/bot cell planes, quantized to display u8 (<1/510
    error on already-display-referred values; consumers decode /255).
    The batched loop's readback is tunnel-bandwidth-bound at 240x135, so
    the u8 planes (8 B/cell total vs f16's 14) buy ~1.75x there.

    ``scene_fn`` + ``ts`` fold PER-FRAME SCENE MUTATION into the scan:
    ``scene_fn(t)`` (a pure traceable callable, e.g.
    DynamicScene.at_time) rebuilds the frame's scene — including on-device
    LBVH rebuilds — INSIDE the device program, so a spinning mesh batches
    exactly like a static scene (zero extra dispatches per frame; the
    reference rebuilds its BVH on the host between frames,
    Scene.cs:122-127). ``ts`` is the (N,) f32 time per frame. The
    megakernel snapshot (host_scene) bakes geometry and must be None."""
    assert scene_fn is None or host_scene is None

    def step(st, xs):
        if scene_fn is None:
            cam, pc = xs
            sc = scene
        else:
            cam, pc, t = xs
            sc = scene_fn(t)
        out, st2 = frame_step(sc, cam, st, fb_w, fb_h, ss, cfg,
                              host_scene=host_scene, fused_post=fused_post,
                              precomp=pc)
        ys = (out.fg_ansi.astype(jnp.uint8), out.bg_ansi.astype(jnp.uint8))
        if stack_rgb:
            ys = ys + (_rgb_u8(out.top_rgb), _rgb_u8(out.bot_rgb))
        return st2, ys

    n = cams.pos.shape[0]
    # Hoist the per-frame scalar prep out of the scan body: the camera
    # basis (ray_params) and the TAA motion-reset test are ~50 scalar HLO
    # ops each frame — ~46 us/frame on the TPU scalar unit inside the
    # loop, one vectorized batch over all N frames out here.
    from ..core.camera import ray_params
    from ..ops import taa as _taa
    hi_w, hi_h = fb_w * max(1, ss), fb_h * 2 * max(1, ss)
    fidx = (state.frame_idx + 1 + jnp.arange(n, dtype=jnp.int32)) \
        & 0x7FFFFFFF
    params_all = jax.vmap(
        lambda c, f: ray_params(c, hi_w, hi_h, f))(cams, fidx)
    prev_pos = jnp.concatenate([state.last_cam[None], cams.pos[:-1]])
    prev_yaw = jnp.concatenate([state.last_yaw[None], cams.yaw[:-1]])
    prev_pitch = jnp.concatenate([state.last_pitch[None],
                                  cams.pitch[:-1]])
    have = jnp.concatenate([state.have_last[None],
                            jnp.ones(n - 1, bool)])
    resets = jax.vmap(
        lambda p, y, pt, lp, ly, lpt, h: _taa.should_reset_history(
            p, y, pt, lp, ly, lpt, h, cfg))(
        cams.pos, cams.yaw, cams.pitch, prev_pos, prev_yaw, prev_pitch,
        have)
    pcs = (params_all, resets)

    xs = (cams, pcs) if scene_fn is None else (
        cams, pcs, jnp.asarray(ts, jnp.float32))
    head = jax.tree_util.tree_map(lambda x: x[:-1], xs)
    last_cam = jax.tree_util.tree_map(lambda x: x[-1], cams)
    last_pc = jax.tree_util.tree_map(lambda x: x[-1], pcs)
    last_scene = scene if scene_fn is None else scene_fn(
        jnp.asarray(ts, jnp.float32)[-1])
    if n > 1:
        state, grids = jax.lax.scan(step, state, head)
    else:
        z8 = jnp.zeros((0, fb_h, fb_w), jnp.uint8)
        grids = (z8, z8)
        if stack_rgb:
            zrgb = jnp.zeros((0, fb_h, fb_w, 3), jnp.uint8)
            grids = grids + (zrgb, zrgb)
    out, state = frame_step(last_scene, last_cam, state, fb_w, fb_h, ss,
                            cfg, host_scene=host_scene,
                            fused_post=fused_post, precomp=last_pc)
    lasts = (out.fg_ansi.astype(jnp.uint8)[None],
             out.bg_ansi.astype(jnp.uint8)[None])
    if stack_rgb:
        lasts = lasts + (_rgb_u8(out.top_rgb)[None],
                         _rgb_u8(out.bot_rgb)[None])
    grids = tuple(jnp.concatenate([g, l]) for g, l in zip(grids, lasts))
    return grids, out, state


class RaytraceRenderer:
    """Host-side convenience wrapper: owns the jitted step + frame state.

    Plays the role of the reference's RaytraceRenderer object (buffers +
    SetCamera/TryFlipAndBlit/Resize, RaytraceRenderer.cs:74-157) with the
    mutable buffers replaced by a donated FrameState.
    """

    def __init__(self, scene: SceneData, fb_w: int, fb_h: int, ss: int = 1,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 fov_deg: Optional[float] = None, use_pallas: bool = True):
        self.scene = scene
        self.fb_w, self.fb_h, self.ss = fb_w, fb_h, max(1, ss)
        self.cfg = cfg
        self.use_pallas = use_pallas
        self._hs = None
        self._cam_cache = None
        self.state = init_state(fb_w, fb_h, self.ss)
        defaults = scene.defaults
        self.cam_pos = list(defaults[0:3])
        self.yaw, self.pitch = defaults[3], defaults[4]
        self.fov_deg = fov_deg if fov_deg is not None else defaults[5]
        self._compile()
        self._hs = self._host_scene()

    def _compile(self):
        # Buffer donation would let XLA reuse the HBM of the old FrameState,
        # but some PJRT backends (the axon TPU tunnel) reject donated inputs;
        # the state is <1 MB at terminal resolutions so we skip donation and
        # keep a single jit.
        # Fused Pallas post runs whenever a real TPU is present — the trace
        # path (megakernel vs XLA wavefront for mesh/voxel scenes) no
        # longer decides the post path.
        try:
            on_cpu = jax.devices()[0].platform.lower() == "cpu"
        except RuntimeError:
            on_cpu = True
        # Independent of use_pallas: that flag gates the TRACE megakernel
        # (which bakes scene geometry); the post program bakes only the
        # image geometry, so dynamic/mesh/voxel scenes still fuse.
        self._fused_post = not on_cpu
        self._step = jax.jit(
            functools.partial(frame_step, fb_w=self.fb_w, fb_h=self.fb_h,
                              ss=self.ss, cfg=self.cfg,
                              fused_post=self._fused_post),
            static_argnames=("host_scene",))
        self._scan = None

    def _host_scene(self):
        """Pallas megakernel snapshot when eligible (TPU + fitting scene)."""
        if not self.use_pallas:
            return None
        from ..ops import pallas_trace
        if not pallas_trace.scene_fits(self.scene):
            return None
        try:
            if jax.devices()[0].platform.lower() in ("cpu",):
                return None
        except RuntimeError:
            return None
        hs = pallas_trace.snapshot_scene(self.scene)
        # Configs whose worst-case push depth exceeds the kernel stack
        # would silently drop paths the XLA path keeps — fall back.
        if not pallas_trace.kernel_stack_sufficient(hs, self.cfg):
            return None
        return hs

    def set_camera(self, pos, yaw, pitch):
        pos = list(pos)
        if (pos != self.cam_pos or float(yaw) != self.yaw
                or float(pitch) != self.pitch):
            self._cam_cache = None
        self.cam_pos = pos
        self.yaw, self.pitch = float(yaw), float(pitch)

    def set_fov(self, fov_deg: float):
        self.fov_deg = float(fov_deg)
        self._cam_cache = None

    def _update_video_textures(self):
        """Poll live readers and refresh their texture-bank slots (the
        reference samples the reader buffer directly, Texture.cs:62-112;
        here the latest frame is uploaded once per rendered frame)."""
        if not self.scene.has_dynamic_textures:
            return
        from ..video import textures as vidtex
        tex = self.scene.textures
        changed = False
        for tid, reader in vidtex.readers_for(self.scene.name):
            frame = reader.try_get_frame()
            if frame is None:
                continue
            img = jnp.asarray(vidtex.frame_to_texture(frame))
            h, w = img.shape[:2]
            tex = tex.at[tid, :h, :w, :].set(img)
            changed = True
        if changed:
            self.scene = dataclasses.replace(self.scene, textures=tex)

    def render(self) -> FrameOutput:
        # Rebuilding CameraPose costs a host->device upload round-trip per
        # frame over the axon tunnel — cache it while the pose is unchanged.
        if self._cam_cache is None:
            self._cam_cache = CameraPose.create(
                self.cam_pos, self.yaw, self.pitch, self.fov_deg)
        self._update_video_textures()
        out, self.state = self._step(self.scene, self._cam_cache, self.state,
                                     host_scene=self._hs)
        return out

    def render_many(self, n: int, poses=None, rgb: bool = False,
                    times=None, scene_fn=None):
        """Render ``n`` frames in ONE dispatch (lax.scan over frame_step);
        advances the renderer state. ``poses``: optional list of
        (pos, yaw, pitch) per frame. Returns
        ((fg_ansi_u8, bg_ansi_u8) stacked (n, fb_h, fb_w), last frame's
        FrameOutput); with ``rgb=True`` the grids tuple also stacks
        (top_rgb, bot_rgb) display-u8 planes (the batched app loop
        decodes /255 and blits those).
        ``times`` + ``scene_fn`` batch PER-FRAME-MUTATING scenes:
        ``scene_fn(t)`` (traceable, e.g. DynamicScene.at_time) rebuilds
        the frame's scene inside the scan — LBVH rebuild and all — so
        dynamic scenes amortize the tunnel round-trip exactly like static
        ones. ``scene_fn`` is a jit-static argument: pass a STABLE
        callable (the same bound method every batch), or every call
        recompiles.
        Video textures refresh once per BATCH (the scan is
        one device program; per-frame texture updates need render())."""
        import numpy as np
        self._update_video_textures()
        if poses is None:
            poses = [(self.cam_pos, self.yaw, self.pitch)] * n
        # Stack on host: ONE upload for the whole pose sequence (per-pose
        # jnp uploads cost a tunnel round-trip each).
        stacked = CameraPose(
            pos=jnp.asarray(np.asarray([p for (p, _, _) in poses],
                                       np.float32)),
            yaw=jnp.asarray(np.asarray([y for (_, y, _) in poses],
                                       np.float32)),
            pitch=jnp.asarray(np.asarray([pt for (_, _, pt) in poses],
                                         np.float32)),
            fov_deg=jnp.asarray(
                np.full(len(poses), self.fov_deg, np.float32)))
        if self._scan is None:
            self._scan = jax.jit(
                functools.partial(frame_scan, fb_w=self.fb_w,
                                  fb_h=self.fb_h, ss=self.ss, cfg=self.cfg,
                                  fused_post=self._fused_post),
                static_argnames=("host_scene", "stack_rgb", "scene_fn"))
        ts = None if times is None else jnp.asarray(
            np.asarray(times, np.float32))
        grids, out, self.state = self._scan(self.scene, stacked, self.state,
                                            host_scene=self._hs,
                                            stack_rgb=rgb,
                                            scene_fn=scene_fn, ts=ts)
        return grids, out

    def resize(self, fb_w: int, fb_h: int, ss: Optional[int] = None):
        if ss is not None:
            self.ss = max(1, ss)
        self.fb_w, self.fb_h = fb_w, fb_h
        self.state = init_state(fb_w, fb_h, self.ss)
        self._compile()

    def set_scene(self, scene: SceneData, reset_camera: bool = True,
                  static: bool = True):
        """``static=False`` marks per-frame-mutating geometry: the Pallas
        megakernel (which bakes the scene at compile time) is bypassed and
        the XLA trace path is used."""
        self.scene = scene
        self.state = init_state(self.fb_w, self.fb_h, self.ss)
        self._hs = self._host_scene() if static else None
        self._cam_cache = None
        if reset_camera:
            d = scene.defaults
            self.cam_pos, self.yaw, self.pitch = list(d[0:3]), d[3], d[4]
            self.fov_deg = d[5]
