from . import air, convolve, geometry, ir, rng, trace  # noqa: F401
