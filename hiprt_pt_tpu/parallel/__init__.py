from .mesh import make_mesh, shard_render_state, replicate, init_sharded_render_state, distributed_render

__all__ = [
    "make_mesh",
    "shard_render_state",
    "replicate",
    "init_sharded_render_state",
    "distributed_render",
]
