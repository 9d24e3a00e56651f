"""Device-mesh parallelism (greenfield — the reference is single-GPU)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch_spec,
)
