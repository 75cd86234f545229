from . import air, convolve, diffraction, geometry, ir, rng, trace  # noqa: F401
