from . import lie, keys, eigh3  # noqa: F401
