"""yetanotherconsolegameengine_tpu — a TPU-native terminal ray-tracing engine.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
NullandKale/YetAnotherConsoleGameEngine (a C# CPU console path tracer):
the whole frame — jittered primary-ray generation, path tracing over
structure-of-arrays scene tables, temporal AA, edge-aware à-trous
denoising, auto-exposure/ACES tone mapping, half-block downsampling and
ANSI-256 quantization — compiles into a single jitted device program.
Only the encoded terminal cell stream crosses back to the host.

Layout:
  core/     — integer hashing RNG, blue-noise sampler, camera math
  scene/    — material bank + SoA scene tables + bundled scene builders
  ops/      — the compute kernels (intersect, trace, taa, atrous, tonemap, ansi)
  render/   — device-resident frame state + the jitted frame step
  term/     — framebuffer, ANSI terminal backends, raw-mode input
  engine/   — main loop, entities, scene-table controller
  world/    — voxel world generation, chunk streaming, persistence
  parallel/ — multi-chip pixel-space sharding, scene sync
  utils/    — OBJ loader, PNG export
"""

__version__ = "0.1.0"
