"""Frame-level A/B of cluster-trace lane-order knobs on the dragon.

Runs the real frame step (render_many scans) under config variants and
prints sustained fps per variant. Usage:

    python tools/ab_dragon.py [variant ...]   # default: base block

Config variants (RenderConfig fields, independent runs): base | block |
noblock | nosortP | nosortS | lmajorS | sortS.

Kernel-constant variants (exitN | nbufN | tileN | nonewton) patch
module globals in ops.mesh_clusters that are read at jit TRACE time, so
they apply to ALL runs in this invocation and MUST precede the first
compile — list them anywhere on the command line, they are consumed
before any config variant runs.
"""
import dataclasses, sys, time
import numpy as np

sys.path.insert(0, ".")
from yetanotherconsolegameengine_tpu.config import DEFAULT_CONFIG
from yetanotherconsolegameengine_tpu.scene.builders import SCENE_BUILDERS
from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer

VARIANTS = {
    "base": {},            # current defaults (block order ON)
    "block": dict(block_order_primary=True),
    "noblock": dict(block_order_primary=False),
    "nosortP": dict(block_order_primary=False, presort_primary=False),
    "nosortS": dict(presort_shadow=False, lmajor_shadow=False),
    "lmajorS": dict(lmajor_shadow=True),
    "sortS": dict(lmajor_shadow=False),
}


def run(scene, name, batch=48, n_batches=2):
    cfg = dataclasses.replace(DEFAULT_CONFIG, **VARIANTS[name])
    r = RaytraceRenderer(scene, fb_w=240, fb_h=135, cfg=cfg)
    grids, out = r.render_many(batch)
    np.asarray(grids[0][-1, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_batches):
        grids, out = r.render_many(batch)
    np.asarray(grids[0][-1, 0, 0])
    dt = (time.perf_counter() - t0) / (n_batches * batch)
    print(f"{name:10s} {1.0/dt:6.2f} fps  ({dt*1000:.2f} ms/frame)",
          flush=True)


def main():
    names = sys.argv[1:] or ["base", "block"]
    # Kernel-constant variants (module-level knobs, patched before the
    # first trace compiles): exitN / nbufN.
    from yetanotherconsolegameengine_tpu.ops import mesh_clusters as mcmod
    cfg_names = []
    for name in names:
        if name.startswith("exit"):
            mcmod.EXIT_CHUNK = int(name[4:])
        elif name.startswith("vb"):
            mcmod.VISIT_BATCH = int(name[2:])
        elif name.startswith("nbuf"):
            mcmod.NBUF = int(name[4:])
        elif name.startswith("tile"):
            mcmod.TILE = int(name[4:])
        elif name == "nonewton":
            mcmod.NEWTON_RCP = False
        else:
            cfg_names.append(name)
    import dataclasses as _dc
    scene = SCENE_BUILDERS["dragon"]()
    if "noshad" in cfg_names:      # strip the coarse occlusion proxy
        cfg_names.remove("noshad")
        scene = _dc.replace(scene, mesh_clusters_shadow=None)
    for name in cfg_names or ["base"]:
        run(scene, name)


if __name__ == "__main__":
    main()
