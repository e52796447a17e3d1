from .mesh import create_mesh, replicate, shard_batch  # noqa: F401
