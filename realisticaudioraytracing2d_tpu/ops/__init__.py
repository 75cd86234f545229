from . import air, convolve, diffraction, directivity, geometry, ir, rng, trace  # noqa: F401
