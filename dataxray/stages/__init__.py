from . import decode, merge, partition  # noqa: F401
