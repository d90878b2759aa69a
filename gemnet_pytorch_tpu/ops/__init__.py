from . import bilinear, geometry, segment  # noqa: F401
