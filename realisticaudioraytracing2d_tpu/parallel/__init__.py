from . import (frames, mesh, multisource, rays, seq,  # noqa: F401
               sweep)
