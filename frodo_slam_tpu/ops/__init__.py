from . import lie, geometry, robust  # noqa: F401
