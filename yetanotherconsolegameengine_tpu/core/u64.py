"""64-bit unsigned integer arithmetic on uint32 pairs, for TPU.

TPUs (and default-config JAX) have no uint64, but the reference engine's
deterministic sampling is built on 64-bit hashing — SplitMix64 and an
FNV-style per-pixel seed (reference: RayTracing/RaytraceSampler.cs:55-80).
We reproduce those bit-exactly with (hi, lo) uint32 pairs; every op below is
elementwise and vectorizes across the whole pixel grid on the VPU.

A U64 value is a tuple ``(hi, lo)`` of equal-shaped jnp.uint32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

U32_MASK = 0xFFFFFFFF


def const(c: int, shape=()):
    """Broadcast a Python int constant to a U64 of the given shape."""
    hi = jnp.full(shape, (c >> 32) & U32_MASK, dtype=jnp.uint32)
    lo = jnp.full(shape, c & U32_MASK, dtype=jnp.uint32)
    return hi, lo


def from_u32(x):
    """Zero-extend a uint32 array to U64."""
    x = x.astype(jnp.uint32)
    return jnp.zeros_like(x), x


def add(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(jnp.uint32)
    return a[0] + b[0] + carry, lo


def xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def shr(a, k: int):
    """Logical right shift by a static amount."""
    hi, lo = a
    if k == 0:
        return hi, lo
    if k < 32:
        return hi >> k, (lo >> k) | (hi << (32 - k))
    if k == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (k - 32)


def shl(a, k: int):
    hi, lo = a
    if k == 0:
        return hi, lo
    if k < 32:
        return (hi << k) | (lo >> (32 - k)), lo << k
    if k == 32:
        return lo, jnp.zeros_like(lo)
    return lo << (k - 32), jnp.zeros_like(lo)


def _mulhi32(a, b):
    """High 32 bits of a 32x32 unsigned multiply, via 16-bit limbs."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    lo = a0 * b0
    t = a1 * b0 + (lo >> 16)
    w1 = t & 0xFFFF
    w2 = t >> 16
    t2 = a0 * b1 + w1
    return a1 * b1 + w2 + (t2 >> 16)


def mul(a, b):
    """Low 64 bits of a 64x64 unsigned multiply (wrapping, like C#)."""
    ah, al = a
    bh, bl = b
    lo = al * bl
    hi = _mulhi32(al, bl) + al * bh + ah * bl
    return hi, lo


def splitmix64(state):
    """One SplitMix64 step (Steele/Lea/Flood), matching RaytraceSampler.cs:70-80.

    z += 0x9E3779B97F4A7C15
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9
    z = (z ^ (z >> 27)) * 0x94D049BB133111EB
    return z ^ (z >> 31)
    """
    z = add(state, const(0x9E3779B97F4A7C15, state[0].shape))
    z = mul(xor(z, shr(z, 30)), const(0xBF58476D1CE4E5B9, z[0].shape))
    z = mul(xor(z, shr(z, 27)), const(0x94D049BB133111EB, z[0].shape))
    return xor(z, shr(z, 31))
