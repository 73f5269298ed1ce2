"""Regenerate golden images for test_golden.py.

Run on the CPU backend (same as CI): renders every static bundled scene at
48x28 cells for 4 frames and stores the final top/bot RGB planes in
tests/goldens.npz. The 16-scene table as regression fixtures is the
reference's own de-facto test strategy (SURVEY.md §4), done properly with
the ToPng/golden idea (Framebuffer.cs:51-100) the reference never wired up.

    python tests/golden_gen.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_SCENES = ["test", "cornell", "mirror_spheres", "primitives", "boxes",
                 "texture_test", "glass", "glass_gem", "voxel_test"]
FB_W, FB_H, FRAMES = 48, 28, 4


def render_scene(name: str):
    from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer
    from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS

    r = RaytraceRenderer(SCENE_BUILDERS[name](), fb_w=FB_W, fb_h=FB_H, ss=1)
    for _ in range(FRAMES):
        out = r.render()
    return np.asarray(out.top_rgb), np.asarray(out.bot_rgb)


def main():
    data = {}
    for name in GOLDEN_SCENES:
        top, bot = render_scene(name)
        data[f"{name}_top"] = top
        data[f"{name}_bot"] = bot
        print(f"{name}: mean {top.mean():.4f}")
    path = os.path.join(os.path.dirname(__file__), "goldens.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
