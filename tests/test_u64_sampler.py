"""Unit tests for the uint32-pair u64 arithmetic and the deterministic
sampler, validated against native numpy uint64 as ground truth."""

import jax.numpy as jnp
import numpy as np

from yetanotherconsolegameengine_tpu.core import sampler, u64

M64 = (1 << 64) - 1


def splitmix64_ref(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def to_pair(vals):
    vals = np.asarray(vals, np.uint64)
    return (jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def from_pair(p):
    return (np.asarray(p[0], np.uint64) << np.uint64(32)) | np.asarray(p[1], np.uint64)


def test_splitmix64_matches_reference():
    seeds = [0, 1, 42, 0xDEADBEEF, 0x9E3779B97F4A7C15, M64]
    got = from_pair(u64.splitmix64(to_pair(seeds)))
    want = np.array([splitmix64_ref(s) for s in seeds], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mul_add_shift():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 1 << 62, size=32).astype(np.uint64)
    b = rng.randint(0, 1 << 62, size=32).astype(np.uint64)
    np.testing.assert_array_equal(from_pair(u64.add(to_pair(a), to_pair(b))),
                                  a + b)
    np.testing.assert_array_equal(from_pair(u64.mul(to_pair(a), to_pair(b))),
                                  a * b)
    for k in (1, 13, 31, 32, 40, 63):
        np.testing.assert_array_equal(
            from_pair(u64.shr(to_pair(a), k)), a >> np.uint64(k))


def test_bayer_table_is_the_reference_table():
    # First two rows of the reference's 8x8 table (RaytraceSampler.cs:11-12).
    assert list(sampler.BAYER8[0]) == [0, 32, 8, 40, 2, 34, 10, 42]
    assert list(sampler.BAYER8[1]) == [48, 16, 56, 24, 50, 18, 58, 26]
    assert sorted(sampler.BAYER8.flatten().tolist()) == list(range(64))


def test_rng_next_unit_uniform():
    px = jnp.arange(4096, dtype=jnp.uint32)
    seed = sampler.per_frame_seed(px, px * 7 + 3, jnp.int32(5),
                                  0x9E3779B97F4A7C15)
    _, x = sampler.rng_next_unit(seed)
    x = np.asarray(x)
    assert x.min() > 0.0 and x.max() < 1.0
    assert abs(x.mean() - 0.5) < 0.02


def test_per_frame_seed_decorrelated():
    px = jnp.zeros(2, jnp.uint32)
    s_a = sampler.per_frame_seed(px, px, jnp.int32(1), 1)
    s_b = sampler.per_frame_seed(px + 1, px, jnp.int32(1), 1)
    assert from_pair(s_a)[0] != from_pair(s_b)[0]


def test_cosine_hemisphere_distribution():
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4096, 3))
    px = jnp.arange(4096, dtype=jnp.uint32)
    seed = sampler.per_frame_seed(px, px, jnp.int32(9), 3)
    _, d = sampler.cosine_sample_hemisphere(n, seed)
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    assert (d[:, 2] >= 0).all()
    # E[cos theta] = 2/3 for a cosine-weighted hemisphere.
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.02


def test_blue_noise_range_and_frame_variation():
    px = jnp.arange(8, dtype=jnp.int32)
    py = jnp.zeros(8, jnp.int32)
    a = sampler.blue_noise(px, py, jnp.int32(0), 0)
    b = sampler.blue_noise(px, py, jnp.int32(1), 0)
    assert float(jnp.max(a)) < 1.0 and float(jnp.min(a)) >= 0.0
    assert not np.allclose(np.asarray(a), np.asarray(b))
