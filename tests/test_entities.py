"""Scene entity layer + showcase scenes (museum / exhibit ring)."""

import numpy as np

from yetanotherconsolegameengine_tpu.scene.entities import (
    BobbingSphereEntity, DynamicScene, OrbitingLightEntity,
    PulsingLightEntity, UVWobbleEntity)
from yetanotherconsolegameengine_tpu.scene.showcase_scenes import (
    build_exhibit_ring, build_museum)


def test_bobbing_sphere_patches_row():
    from yetanotherconsolegameengine_tpu.scene.builders import build_test_scene
    scene = build_test_scene()
    ent = BobbingSphereEntity(index=0, base_center=(-1.2, 0.9, -2.2),
                              amplitude=0.5, freq_hz=0.25)
    s1 = ent.apply(scene, t=1.0)  # sin(pi/2) = 1 -> y = 1.4
    c = np.asarray(s1.spheres.center)
    np.testing.assert_allclose(c[0], [-1.2, 1.4, -2.2], atol=1e-6)
    # Other rows untouched.
    np.testing.assert_array_equal(c[1:], np.asarray(scene.spheres.center)[1:])


def test_orbiting_and_pulsing_lights():
    from yetanotherconsolegameengine_tpu.scene.builders import build_test_scene
    scene = build_test_scene()
    orb = OrbitingLightEntity(index=0, pivot=(0, 0, 0), radius=2.0,
                              height=3.0, period_s=4.0)
    s1 = orb.apply(scene, t=1.0)  # quarter turn
    p = np.asarray(s1.lights.pos)[0]
    np.testing.assert_allclose(p, [0.0, 3.0, 2.0], atol=1e-6)
    pul = PulsingLightEntity(index=0, base_intensity=100.0, depth=0.5,
                             freq_hz=0.25)
    s2 = pul.apply(scene, t=1.0)  # sin(pi/2) = 1 -> 150
    np.testing.assert_allclose(float(np.asarray(s2.lights.intensity)[0]),
                               150.0, atol=1e-4)


def test_uv_wobble():
    from yetanotherconsolegameengine_tpu.scene.builders import build_texture_test
    scene = build_texture_test()
    ent = UVWobbleEntity(mat_id=1, base_scale=2.0, depth=0.5, freq_hz=0.25)
    s1 = ent.apply(scene, t=1.0)
    np.testing.assert_allclose(float(np.asarray(s1.materials.uv_scale)[1]),
                               3.0, atol=1e-5)


def test_dynamic_scene_advances():
    ring = build_exhibit_ring()
    s0 = ring.at_time(0.0)
    s1 = ring.update(0.5)
    assert not np.array_equal(np.asarray(s0.lights.pos),
                              np.asarray(s1.lights.pos))
    assert not np.array_equal(np.asarray(s0.spheres.center),
                              np.asarray(s1.spheres.center))
    # Table shapes never change (no recompiles).
    assert s0.lights.pos.shape == s1.lights.pos.shape


def test_museum_builds_and_renders():
    import jax
    from yetanotherconsolegameengine_tpu.render.renderer import (
        frame_step, init_state)

    scene = build_museum()
    # Big static meshes (the 69k-tri bunny asset when present) build cluster
    # tables; small stand-ins build the skip-link BVH. Either accel must be
    # there.
    assert scene.mesh is not None or scene.mesh_clusters is not None
    assert np.asarray(scene.rects.mask).sum() >= 12  # three rooms of walls
    out, _ = jax.jit(lambda s, c, st: frame_step(s, c, st, fb_w=20, fb_h=12,
                                                 ss=1))(
        scene, scene.default_pose, init_state(20, 12, 1))
    top = np.asarray(out.top_rgb)
    assert np.isfinite(top).all() and top.max() > 0.0


def test_exhibit_ring_renders_two_frames():
    import jax
    from yetanotherconsolegameengine_tpu.render.renderer import (
        frame_step, init_state)

    ring = build_exhibit_ring()
    step = jax.jit(lambda s, c, st: frame_step(s, c, st, fb_w=16, fb_h=10,
                                               ss=1))
    state = init_state(16, 10, 1)
    s0 = ring.update(1 / 30)
    out, state = step(s0, s0.default_pose, state)
    s1 = ring.update(1 / 30)
    out2, state = step(s1, s1.default_pose, state)
    assert np.isfinite(np.asarray(out2.top_rgb)).all()


def test_spinning_mesh_rebuilds_lbvh_per_frame():
    """The dynamic-mesh scene: per-frame on-device LBVH rebuild
    (SpinningMeshEntity -> ops/lbvh.build_lbvh), the reference's
    Scene.RebuildBVH capability (Scenes/Scene.cs:66-69,122-127)."""
    import jax
    from yetanotherconsolegameengine_tpu.render.renderer import (
        frame_step, init_state)
    from yetanotherconsolegameengine_tpu.scene.showcase_scenes import (
        build_spinning_mesh)

    dyn = build_spinning_mesh()
    s0 = dyn.at_time(0.0)
    s1 = dyn.at_time(2.0)
    # Same T every frame -> identical pytree shapes -> one compiled step.
    assert jax.tree_util.tree_map(lambda x: x.shape, s0.mesh) == \
        jax.tree_util.tree_map(lambda x: x.shape, s1.mesh)
    # The rotated tree must differ (the rebuild actually ran).
    assert not np.allclose(np.asarray(s0.mesh.bmin),
                           np.asarray(s1.mesh.bmin))

    step = jax.jit(lambda s, c, st: frame_step(s, c, st, fb_w=20, fb_h=12,
                                               ss=1))
    state = init_state(20, 12, 1)
    out0, state = step(s0, s0.default_pose, state)
    out1, state = step(s1, s1.default_pose, state)
    a = np.asarray(out0.top_rgb)
    b = np.asarray(out1.top_rgb)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.max() > 0.0
    # The spin must be visible.
    assert np.abs(a - b).max() > 0.01
