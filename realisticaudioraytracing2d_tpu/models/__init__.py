from . import materials, rooms, scene  # noqa: F401
