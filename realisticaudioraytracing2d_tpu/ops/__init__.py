from . import convolve, geometry, ir, rng, trace  # noqa: F401
