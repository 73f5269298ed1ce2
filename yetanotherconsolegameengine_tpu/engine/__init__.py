"""Engine shell: chexel framebuffers, terminal backends, input, main loop
(the reference's L6/L7 layers, Renderer/ + Entities/ + RaytraceEntity)."""
