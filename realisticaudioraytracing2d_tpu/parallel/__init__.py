from . import mesh, multisource, rays, sweep  # noqa: F401
