from . import trace_kernel  # noqa: F401
