from . import wal  # noqa: F401
