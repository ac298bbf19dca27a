from . import embedder, hashgrid, mlp, radiance, sdf  # noqa: F401
