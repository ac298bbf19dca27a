from .mesh import (constrain, get_mesh, make_mesh, replicate,  # noqa: F401
                   set_mesh, shard_leading, use_mesh)
