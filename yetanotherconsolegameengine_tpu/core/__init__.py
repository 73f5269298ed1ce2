from . import camera, sampler, u64  # noqa: F401
