from .renderer import FrameOutput, FrameState, RaytraceRenderer, frame_step, init_state  # noqa: F401
