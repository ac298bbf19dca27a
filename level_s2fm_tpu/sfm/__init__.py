from . import entities  # noqa: F401
