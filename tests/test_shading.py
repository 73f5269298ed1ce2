"""Shading-semantics tests: shadows, mirrors, emission, refraction,
colored transmittance — the behaviors of TraceFull
(/root/reference/ConsoleGame/RayTracing/RaytraceRenderer.cs:448-620)."""

import jax.numpy as jnp
import numpy as np

from yetanotherconsolegameengine_tpu.config import RenderConfig
from yetanotherconsolegameengine_tpu.core import sampler
from yetanotherconsolegameengine_tpu.ops import trace
from yetanotherconsolegameengine_tpu.scene.materials import Material
from yetanotherconsolegameengine_tpu.scene.tables import SceneBuilder

CFG = RenderConfig()


def trace_rays(scene, origins, dirs, seed_base=7):
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(dirs, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    n = o.shape[0]
    px = jnp.arange(n, dtype=jnp.uint32)
    rng = sampler.per_frame_seed(px, px + 13, jnp.int32(seed_base), 99)
    return trace.trace_all(scene, o, d, rng, CFG)


def test_sky_gradient_on_miss():
    s = SceneBuilder("sky")
    s.bg_top = (0.0, 0.0, 1.0)
    s.bg_bottom = (1.0, 0.0, 0.0)
    sc = s.build()
    res = trace_rays(sc, [[0, 0, 0], [0, 0, 0]], [[0, 1, 0], [0, -1, 0]])
    up, down = np.asarray(res.radiance)
    assert up[2] > 0.9 and up[0] < 0.1       # straight up -> top color
    assert down[0] > 0.9 and down[2] < 0.1   # straight down -> bottom color
    assert np.asarray(res.is_sky).all()


def test_point_light_shadowing():
    s = SceneBuilder("shadow")
    s.ambient_intensity = 0.0
    s.bg_top = s.bg_bottom = (0, 0, 0)
    s.add_plane((0, 0, 0), (0, 1, 0), Material.solid((0.8, 0.8, 0.8)))
    s.add_sphere((0, 2.0, -3.0), 0.5, Material.solid((0.5, 0.5, 0.5)))
    s.add_light((0, 6.0, -3.0), (1, 1, 1), 50.0)
    sc = s.build()
    # One ray under the sphere (shadowed), one off to the side (lit).
    res = trace_rays(sc, [[0, 1, 0], [0, 1, 0]],
                     [[0, -0.3162, -0.9487], [3.0, -1.0, -3.0]])
    shadowed, lit = np.asarray(res.radiance)
    assert lit.mean() > 4 * shadowed.mean()


def test_emission_reaches_camera():
    s = SceneBuilder("emit")
    s.ambient_intensity = 0.0
    s.bg_top = s.bg_bottom = (0, 0, 0)
    s.add_sphere((0, 0, -3), 1.0, Material.solid((1, 1, 1), emission=(5, 0, 0)))
    sc = s.build()
    res = trace_rays(sc, [[0, 0, 0]], [[0, 0, -1]])
    r = np.asarray(res.radiance)[0]
    assert r[0] >= 5.0 and r[1] < 1e-3


def test_mirror_reflects_scene():
    s = SceneBuilder("mirror")
    s.ambient_intensity = 0.0
    s.bg_top = s.bg_bottom = (0, 0, 0)
    # Mirror at z=-2 (reflectivity above the 0.9 threshold), red emitter
    # behind the camera.
    s.add_xy_rect(-2, 2, -2, 2, -2.0, Material.solid((1, 1, 1), reflectivity=0.95))
    s.add_sphere((0, 0, 4), 1.0, Material.solid((1, 1, 1), emission=(3, 0, 0)))
    sc = s.build()
    res = trace_rays(sc, [[0, 0, 0]], [[0, 0, -1]])
    r = np.asarray(res.radiance)[0]
    assert r[0] > 2.0 and r[1] < 0.1  # sees the red emitter via the mirror


def test_mirror_depth_capped():
    # Two parallel mirrors: ray must terminate (MaxMirrorBounces=2).
    s = SceneBuilder("hall")
    s.ambient_intensity = 0.0
    s.bg_top = s.bg_bottom = (0.2, 0.2, 0.2)
    m = Material.solid((1, 1, 1), reflectivity=0.95)
    s.add_xy_rect(-2, 2, -2, 2, -2.0, m)
    s.add_xy_rect(-2, 2, -2, 2, 2.0, m)
    sc = s.build()
    res = trace_rays(sc, [[0, 0, 0]], [[0.05, 0, -1]])
    assert np.isfinite(np.asarray(res.radiance)).all()


def test_glass_splits_and_tints_shadows():
    s = SceneBuilder("glass")
    s.ambient_intensity = 0.0
    s.bg_top = s.bg_bottom = (0, 0, 0)
    s.add_plane((0, 0, 0), (0, 1, 0), Material.solid((0.9, 0.9, 0.9)))
    s.add_sphere((0, 1.5, -3), 0.7,
                 Material.glass(transmission=(1.0, 0.2, 0.2)))
    s.add_light((0, 6, -3), (1, 1, 1), 60.0)
    sc = s.build()
    # Ray hits the floor directly under the glass sphere: shadow should be
    # red-tinted (colored transmittance), not black (binary).
    res = trace_rays(sc, [[0, 0.5, -1.0], [2.5, 0.5, -1.0]],
                     [[0, -0.24, -0.97], [0, -0.24, -0.97]])
    under, side = np.asarray(res.radiance)
    assert under[0] > 2.5 * under[1]  # red >> green under the glass
    assert side.mean() > 0.01         # the lit comparison point


def test_gbuffer_primary_only():
    s = SceneBuilder("g")
    s.add_sphere((0, 0, -3), 1.0, Material.solid((0.3, 0.6, 0.9)))
    sc = s.build()
    res = trace_rays(sc, [[0, 0, 0], [5, 0, 0]], [[0, 0, -1], [0, 0, -1]])
    alb = np.asarray(res.albedo)
    dep = np.asarray(res.depth)
    np.testing.assert_allclose(alb[0], [0.3, 0.6, 0.9], atol=1e-5)
    np.testing.assert_allclose(dep[0], 2.0, rtol=1e-4)
    assert np.asarray(res.is_sky)[1]
    assert dep[1] > 1e30  # sky depth sentinel


def test_binary_shadow_scene_flag():
    s = SceneBuilder("bin")
    s.ambient_intensity = 0.0
    s.bg_top = s.bg_bottom = (0, 0, 0)
    s.binary_shadows = True
    s.add_plane((0, 0, 0), (0, 1, 0), Material.solid((0.9, 0.9, 0.9)))
    s.add_sphere((0, 1.5, -3), 0.7, Material.glass(transmission=(1.0, 0.2, 0.2)))
    s.add_light((0, 6, -3), (1, 1, 1), 60.0)
    sc = s.build()
    res = trace_rays(sc, [[0, 0.5, -1.0]], [[0, -0.24, -0.97]])
    under = np.asarray(res.radiance)[0]
    # Binary occlusion: the glass sphere blocks fully -> only the (zero)
    # ambient remains at the direct-lighting level; any light seen is from
    # the diffuse bounce, which is tiny here.
    assert under.max() < 0.05


def test_stack_clamp_bit_identical():
    """The provable stack-depth bound (max_mirror_bounces + 1): clamping
    the path stack from cfg.path_stack_size (16) to the bound (3) is
    bit-identical on a transparency-heavy scene — nested glass shells
    exercise the deepest reachable push chain (trace.py derivation)."""
    s = SceneBuilder("nested_glass")
    s.bg_top, s.bg_bottom = (0.3, 0.4, 0.9), (0.9, 0.8, 0.7)
    s.add_plane((0, 0, 0), (0, 1, 0), Material.solid((0.7, 0.6, 0.5)))
    # Concentric shells: every refraction event immediately hits another
    # transparent surface, maximizing push pressure.
    for rad in (1.4, 1.0, 0.6):
        s.add_sphere((0, 1.5, -3), rad,
                     Material.glass(transmission=(0.9, 0.95, 1.0)))
    s.add_sphere((0, 1.5, -3), 0.3,
                 Material.solid((1, 1, 1), reflectivity=1.0))
    s.add_light((2, 5, -1), (1, 1, 1), 80.0)
    sc = s.build()
    ys, xs = np.mgrid[-0.5:0.5:12j, -0.5:0.5:12j]
    o = np.stack([xs, ys + 1.5, np.zeros_like(xs)], -1).reshape(-1, 3)
    d = np.broadcast_to(np.asarray([0.0, 0.0, -1.0]), o.shape)
    assert trace.STACK_CLAMP
    clamped = np.asarray(trace_rays(sc, o, d).radiance)
    trace.STACK_CLAMP = False
    try:
        full = np.asarray(trace_rays(sc, o, d).radiance)
    finally:
        trace.STACK_CLAMP = True
    np.testing.assert_array_equal(clamped, full)
