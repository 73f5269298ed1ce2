"""Isolate the cluster kernel's FIXED per-tile cost on the real TPU.

Runs _run_kernel directly on synthetic candidate lists of controlled
length (0, 1, 2, 4, 8 clusters per tile) over the dragon's LOD table.
len=0 measures pure launch + preamble (list DMA skipped, loop zero-trips);
the slope over len measures the true per-visit cost at this kc.

Also times the XLA-side wrapper (_intersect_impl) minus the kernel by
comparing against the full intersect at the same ray population.

Usage: python tools/time_kernel_fixed.py [scene] [n_rays]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yetanotherconsolegameengine_tpu.ops.mesh_clusters import (
    _run_kernel, _intersect_impl, TILE)
from yetanotherconsolegameengine_tpu.ops.intersect import INF
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

REPS = 20


def timeit(label, fn, *args):
    def runner(n):
        @jax.jit
        def f(*a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        float(f(*args))
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0
    t1 = runner(1)
    tn = runner(1 + REPS)
    ms = (tn - t1) / REPS * 1000
    print(f"{label:40s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 64800
    scene = SCENE_BUILDERS[name]()
    mc = scene.mesh_clusters_lod or scene.mesh_clusters
    C = mc.n_clusters
    kc = mc.kc
    n_tiles = (P + TILE - 1) // TILE
    Pp = n_tiles * TILE
    print(f"scene={name} P={P} tiles={n_tiles} C={C} kc={kc}", flush=True)

    rng = np.random.default_rng(0)
    # Rays: sane unit directions, origins outside the mesh.
    o = rng.uniform(-1, 1, (Pp, 3)).astype(np.float32) + 5.0
    d = rng.normal(size=(Pp, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    # rays buffer layout: exactly _intersect_impl's packing —
    # (n_tiles, 3T, 4) -> transpose(2,0,1) -> (4, n_tiles*3T).
    T = TILE
    o4 = np.concatenate([o, np.ones((Pp, 1), np.float32)], axis=1)
    d4 = np.concatenate([d, np.zeros((Pp, 1), np.float32)], axis=1)
    init_bits = np.full((Pp,), np.float32(1e30).view(np.int32) | (kc - 1),
                        np.int32)
    lim = np.zeros((Pp, 4), np.float32)
    lim[:, 0] = init_bits.view(np.float32)
    lim[:, 1] = 1e-3
    rays = np.concatenate([
        o4.reshape(n_tiles, T, 4),
        d4.reshape(n_tiles, T, 4),
        lim.reshape(n_tiles, T, 4),
    ], axis=1)                                         # (n_tiles, 3T, 4)
    rays = jnp.asarray(np.ascontiguousarray(
        rays.transpose(2, 0, 1).reshape(4, n_tiles * 3 * T)))

    Cp = ((C + 127) // 128) * 128
    ids = np.tile(np.arange(Cp, dtype=np.int32) % C, (n_tiles, 1))
    te = np.zeros((n_tiles, Cp), np.int32)  # entry t bits: 0.0 => never exit
    lists = jnp.asarray(np.stack([ids, te], axis=1))  # (n_tiles, 2, Cp)

    for L in [0, 1, 2, 4, 8, 16]:
        lens = jnp.full((n_tiles,), min(L, C), jnp.int32)

        def run(c, lens=lens):
            out = _run_kernel(lens, lists, mc.gmat, rays, n_tiles)
            return c + jnp.sum(out[0, ::TILE]).astype(jnp.float32) * 1e-9

        timeit(f"kernel len={L:3d} ({n_tiles} tiles)", run)

    # Full production intersect at the same population for comparison.
    o_j = jnp.asarray(o[:P])
    d_j = jnp.asarray(d[:P])
    ones = jnp.ones((P,), jnp.float32)

    def full(c):
        h = _intersect_impl(mc, o_j + c * 0, d_j, ones * 1e-3, ones * INF)
        return c + jnp.sum(h.u) * 1e-9

    timeit("_intersect_impl (sort+cull+kernel+res)", full)


if __name__ == "__main__":
    main()
