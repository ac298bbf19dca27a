from . import aabb, renderer  # noqa: F401
