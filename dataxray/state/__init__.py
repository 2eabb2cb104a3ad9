from . import checkpoint, manifest  # noqa: F401
