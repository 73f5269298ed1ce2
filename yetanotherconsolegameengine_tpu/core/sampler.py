"""Deterministic per-pixel sampling: ordered-dither jitter + SplitMix64 RNG.

Reproduces the sampling stack of the reference
(/root/reference/ConsoleGame/RayTracing/RaytraceSampler.cs):

- an 8x8 ordered-dither ("blue noise") tile rotated per frame by two
  low-discrepancy constants (the R2 sequence) for primary-ray jitter,
- a per-pixel, per-frame SplitMix64 seed built from an FNV-style mix of
  (x, y, frame, salt),
- a SplitMix64 counter RNG producing uniform floats,
- cosine-weighted hemisphere sampling with a branchless orthonormal basis.

All of it is pure integer hashing, so it vectorizes over the full pixel grid
and is bit-reproducible against the reference algorithms.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import u64

BLUE_TILE = 8

# FNV-1a 64-bit offset basis and the mixing constants used by the reference
# seed hash (RaytraceSampler.cs:55-68).
_FNV_OFFSET = 1469598103934665603
_KX = 0x9E3779B97F4A7C15
_KY = 0xC2B2AE3D27D4EB4F
_KF = 0x165667B19E3779F9

# R2 low-discrepancy rotation constants (RaytraceSampler.cs:32) and the
# golden-ratio pair used for the per-frame jitter rotation
# (RaytraceRenderer.cs:178-179). These are public mathematical constants
# (1/phi_2, 1/phi_2^2 and 1/phi, 1/phi^2).
R2_X = 0.7548776662466927
R2_Y = 0.5698402909980532
GOLDEN_X = 0.61803398875
GOLDEN_Y = 0.38196601125


def _bayer(n: int) -> np.ndarray:
    """Recursive Bayer ordered-dither matrix; the reference's 8x8 'blue
    noise' table (RaytraceSampler.cs:9-19) is exactly the standard 8x8 Bayer
    matrix, so we generate it instead of embedding the table."""
    m = np.zeros((1, 1), dtype=np.int64)
    while m.shape[0] < n:
        m = np.block([[4 * m, 4 * m + 2], [4 * m + 3, 4 * m + 1]])
    return m


BAYER8 = _bayer(BLUE_TILE)


def frac(v):
    return v - jnp.floor(v)


def bayer_base(px, py):
    """The 8x8 ordered-dither base sample in [0,1) at integer pixel coords,
    computed arithmetically (no table gather — the Bayer matrix value is
    the bit-reversed interleave of (x^y, y), verified against _bayer(8)).
    Gather-free so the Pallas megakernel can evaluate it per lane."""
    x = px.astype(jnp.int32) & (BLUE_TILE - 1)
    y = py.astype(jnp.int32) & (BLUE_TILE - 1)
    xy = x ^ y
    v = jnp.zeros_like(x)
    k = 3  # log2(BLUE_TILE)
    for i in range(k):
        v = v + ((((xy >> i) & 1) << (2 * (k - 1 - i) + 1))
                 + (((y >> i) & 1) << (2 * (k - 1 - i))))
    return (v.astype(jnp.float32) + 0.5) * (1.0 / (BLUE_TILE * BLUE_TILE))


def blue_noise(px, py, frame_idx, channel: int):
    """Ordered-dither sample in [0,1) for integer pixel coords.

    Matches RaytraceSampler.BlueNoiseSample: tile value + per-frame R2
    rotation, fract-wrapped.
    """
    c = R2_X if channel == 0 else R2_Y
    rot = frac((frame_idx.astype(jnp.float32) + 1.0) * c)
    return frac(bayer_base(px, py) + rot)


def per_frame_seed(px, py, frame_idx, salt: int):
    """Per-pixel 64-bit seed, matching RaytraceSampler.PerFrameSeed with
    jx = jy = 0 (the only way the renderer calls it,
    RaytraceRenderer.cs:203)."""
    shape = px.shape
    h = u64.const(_FNV_OFFSET, shape)
    h = u64.splitmix64(u64.xor(h, u64.mul(u64.from_u32(px), u64.const(_KX, shape))))
    h = u64.splitmix64(u64.xor(h, u64.mul(u64.from_u32(py), u64.const(_KY, shape))))
    f = u64.from_u32(frame_idx.astype(jnp.uint32))
    h = u64.splitmix64(u64.xor(h, u64.mul(f, u64.const(_KF, shape))))
    h = u64.splitmix64(h)  # jx = jy = 0 contributes nothing to the xor
    h = u64.splitmix64(u64.xor(h, u64.const(salt, shape)))
    return h


def rng_next_unit(state):
    """Advance the SplitMix64 RNG; returns (new_state, uniform in (0,1)).

    Matches RaytraceSampler.Rng.NextUnit: top 24 bits -> (m24+0.5)/2^24.
    """
    state = u64.splitmix64(state)
    m24 = (state[0] >> 8).astype(jnp.float32)
    return state, (m24 + 0.5) * (1.0 / 16777216.0)


def cosine_sample_hemisphere(n, state):
    """Cosine-weighted hemisphere direction about unit normal ``n``.

    Branchless ONB construction as in RaytraceSampler.CosineSampleHemisphere
    (the Duff et al. basis with the w.z ~ -1 guard expressed as a select).
    ``n`` is (..., 3); returns (new_state, dir (..., 3)).
    """
    state, u1 = rng_next_unit(state)
    state, u2 = rng_next_unit(state)
    r = jnp.sqrt(u1)
    phi = jnp.float32(2.0 * np.pi) * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))

    wx, wy, wz = n[..., 0], n[..., 1], n[..., 2]
    degenerate = wz < -0.999999

    a = 1.0 / (1.0 + jnp.where(degenerate, 0.0, wz))
    b = -wx * wy * a
    u_axis = jnp.stack([1.0 - wx * wx * a, b, -wx], axis=-1)
    v_axis = jnp.stack([b, 1.0 - wy * wy * a, -wy], axis=-1)

    u_deg = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], jnp.float32), u_axis.shape)
    v_deg = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0], jnp.float32), v_axis.shape)
    deg = degenerate[..., None]
    u_axis = jnp.where(deg, u_deg, u_axis)
    v_axis = jnp.where(deg, v_deg, v_axis)

    d = u_axis * x[..., None] + v_axis * y[..., None] + n * z[..., None]
    return state, d
