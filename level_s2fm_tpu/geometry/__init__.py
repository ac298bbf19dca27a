from . import lie, transforms  # noqa: F401
