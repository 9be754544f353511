from .mesh import (
    distributed_render,
    init_sample_dp_state,
    init_sharded_render_state,
    make_mesh,
    make_sample_mesh,
    merge_sample_dp,
    replicate,
    sample_dp_render,
    shard_render_state,
)

__all__ = [
    "make_mesh",
    "make_sample_mesh",
    "shard_render_state",
    "replicate",
    "init_sharded_render_state",
    "init_sample_dp_state",
    "sample_dp_render",
    "merge_sample_dp",
    "distributed_render",
]
