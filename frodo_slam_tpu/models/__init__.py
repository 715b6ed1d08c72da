from . import layers, dpt, mast3r, convert  # noqa: F401
