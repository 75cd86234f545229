from . import audio_io, checkpoint, png, profiling, viz  # noqa: F401
