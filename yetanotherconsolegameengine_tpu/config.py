"""Render-quality constants and engine configuration.

Mirrors the compile-time constants of the reference renderer
(/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:31-44) and the
knob surface catalogued in SURVEY.md §5 ("Config / flag system").
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (trace-time constant) quality knobs for the frame step.

    These become Python-level constants inside the jitted frame program, so
    changing any of them triggers a recompile — exactly the role they play as
    `const` fields in the reference (RaytraceRenderer.cs:31-44).
    """

    diffuse_bounces: int = 1
    indirect_samples: int = 1
    max_mirror_bounces: int = 2
    max_refractions: int = 2
    mirror_threshold: float = 0.9
    eps: float = 1e-4
    seed_salt: int = 0x9E3779B97F4A7C15

    # Temporal AA (RaytraceRenderer.cs:41-43, TemporalAA.cs)
    taa_alpha: float = 0.01
    motion_trans_reset: float = 0.0025
    motion_rot_reset: float = 0.0025
    taa_clamp_radius: int = 1
    taa_luminance_pad: float = 0.10

    # À-trous denoise (RaytraceRenderer.cs:221-224)
    atrous_iterations: int = 3
    atrous_c_phi: float = 3.0
    atrous_n_phi: float = 0.35
    atrous_z_phi: float = 2.0
    atrous_a_phi: float = 0.20

    # Oren–Nayar roughness (RaytraceRenderer.cs:65)
    diffuse_sigma_deg: float = 25.0

    # Secondary-ray mesh LOD (deliberate TPU-first deviation: the reference
    # traces every population against the full MeshBVH). When a scene
    # carries a low-poly proxy cluster set (scene/lod.py), shadow and
    # bounce sweeps trace it instead of the full mesh — soft quantities
    # only, visually indistinguishable at terminal resolutions, and the
    # defining lever for incoherent-sweep cost on ~600k-tri meshes.
    secondary_mesh_lod: bool = True
    # Primary rays of ultra-dense hero meshes trace the sub-pixel fine
    # proxy (scene.mesh_clusters_fine) when the scene ships one.
    primary_mesh_lod: bool = True
    # Cluster-sweep ray binning (ops/mesh_clusters.py presort): the
    # stable sort + gathers + unsort cost a fixed ~6.7 ms at 130k lanes.
    # Hardware A/B (tools/time_sweeps.py, dragon @240x135): the binned
    # order wins EVERY population despite that fixed cost — primary fine
    # 12.1 ms sorted vs 32.6 unsorted (row-strip tiles span the whole
    # image width), shadow 12.4 vs 18.4 (and vs 21.5 L-major), bounce
    # 10.5 vs 30.3 — so both stay True. ``presort_primary`` only applies
    # when the 16x16 block order below is inapplicable (renderer.py forces
    # it off when blocks are active, which beat the sorted order at frame
    # level 23.5 vs 20.5 fps).
    presort_primary: bool = True
    presort_shadow: bool = True
    # L-major unsorted shadow lanes: lay the (W, L) shadow population out
    # as [light0: all rays][light1: ...] instead of ray-major interleaved
    # and skip the binning sort entirely. Under the 16x16 block primary
    # order each 256-lane tile is then one pixel block converging on ONE
    # light — near-sort-quality frusta for free. The sort's fixed cost is
    # ~3.5 ms at 130k lanes (measured empty-sweep, tools/time_sweeps.py);
    # only applied when it beats presort_shadow at frame level.
    lmajor_shadow: bool = True
    # Feed the cluster trace in 16x16 pixel-BLOCK lane order (pure static
    # layout transforms, no sort): each primary tile is then a square
    # pixel block with a tight frustum, instead of a 256-lane row strip,
    # and the binning sort's fixed cost drops out. Row count pads to a
    # multiple of 16 with dead lanes (subtracted from rays_traced).
    # Frame-level A/B on the dragon: 23.5 fps vs 20.5 binned.
    block_order_primary: bool = True

    # Tone mapping (ToneMapper.cs:8-21)
    tone_exposure: float = 1.0
    tone_gamma: float = 2.2
    auto_exposure: bool = True
    ae_key: float = 0.18
    ae_speed: float = 0.2
    ae_min: float = 0.10
    ae_max: float = 1.50
    tone_saturation: float = 2.0
    tone_vibrance: float = 0.0

    # Wavefront loop cap: the reference's explicit path stack holds 16 items
    # (RaytraceRenderer.cs:450); with its push discipline (refraction events
    # push <=2 children up to mirror depth 2) plus in-place mirror/diffuse
    # continuations, no path needs more than this many trace rounds.
    max_trace_rounds: int = 24
    path_stack_size: int = 16


DEFAULT_CONFIG = RenderConfig()
