"""Benchmark: Cornell Box @160x90 terminal cells on one TPU chip.

Reproduces BASELINE.json config #1 (the default reference scene at the
reference's cell geometry: 160x90 cells = 160x180 traced pixels, 1 diffuse
bounce + per-light shadow rays, TAA + à-trous + tone map + ANSI quantize
all on device). Frames are rendered through the real multi-frame API
(``render_many`` — lax.scan over the frame step, the TAA/exposure state
threading through exactly as in the interactive loop). Prints ONE JSON
line:

    {"metric": ..., "value": Mrays/s/chip, "unit": "Mray/s",
     "vs_baseline": value / 500}

The 500 Mray/s denominator is the BASELINE.json north-star target (the
reference itself publishes no numbers, BASELINE.md).
"""

import json
import time

import jax
import numpy as np


def _sync(x):
    """Force completion of the chained computation.

    jax.block_until_ready() does NOT reliably block on the axon-tunneled
    TPU backend (verified: 100 chained 4096^3 matmuls "ready" in 0.16 ms,
    actual compute 6.9 s) — only a host readback of a dependent value
    synchronizes, so every timed region here ends with a 1-element
    device->host transfer. render_many calls chain through the renderer's
    TAA/exposure state, so syncing the last output syncs them all.
    """
    np.asarray(x[-1, 0, 0] if getattr(x, "ndim", 0) >= 3 else x)


def wait_for_device(max_wait_s: float = 2700, poll_s: float = 120) -> bool:
    """Block until the TPU backend answers a trivial probe (or time out).

    The axon tunnel drops its lease for tens of minutes at a time (and a
    client killed mid-program wedges the worker until lease timeout, ~30-40
    min). The driver runs this benchmark unattended at round end, so wait
    for the backend instead of failing. Each probe runs in a FRESH
    subprocess: a backend-init failure poisons the importing process, and a
    probe against a mid-recovery worker can hang for 20+ min — the
    subprocess gets its own timeout.
    """
    import subprocess
    import sys

    probe = ("import jax, jax.numpy as jnp, numpy as np;"
             "np.asarray((jnp.ones((8, 128)) @ jnp.ones((128, 128))).sum())")
    deadline = time.time() + max_wait_s
    while True:
        try:
            if subprocess.run([sys.executable, "-c", probe],
                              capture_output=True,
                              timeout=600).returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            return False
        time.sleep(min(poll_s, max(1.0, deadline - time.time())))


def main():
    from yetanotherconsolegameengine_tpu.render.renderer import RaytraceRenderer
    from yetanotherconsolegameengine_tpu.scene.builders import build_cornell_box

    fb_w, fb_h = 160, 90
    # Sustained-throughput config: the axon tunnel costs ~7-25 ms PER
    # DISPATCH, so small batches measure dispatch latency, not the chip
    # (batch=30 reads ~0.45 ms/frame when the device program is ~0.2 ms;
    # batch=300 still carries ~65 us/frame of it — measured 190.6 vs
    # 160.0 us/frame at batch=2000, scan-differencing says the device
    # program itself is ~128 us). 2000 frames per scan amortizes the
    # dispatch to ~10 us/frame; the interactive-latency story is the app
    # HUD's job and bench_suite's interactive_fps column.
    batch = 2000
    scene = build_cornell_box()
    r = RaytraceRenderer(scene, fb_w=fb_w, fb_h=fb_h, ss=1)

    # Warmup: compile the scan + let TAA history settle.
    grids, out = r.render_many(batch)
    _sync(grids[0])
    rays_per_frame = int(out.rays_traced)

    n_batches = 3
    t0 = time.perf_counter()
    for _ in range(n_batches):
        grids, out = r.render_many(batch)
    _sync(grids[0])
    dt = (time.perf_counter() - t0) / (n_batches * batch)

    fps = 1.0 / dt
    mrays = rays_per_frame * fps / 1e6
    result = {
        "metric": (f"Mrays/s/chip, Cornell Box @{fb_w}x{fb_h} cells "
                   f"({fb_w}x{fb_h*2} px, {rays_per_frame} rays/frame, "
                   f"{fps:.1f} fps)"),
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / 500.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    wait_for_device()
    main()
