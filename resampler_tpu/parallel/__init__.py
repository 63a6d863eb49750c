from .sharding import replicate, shard_batch, stream_mesh, stream_sharding

__all__ = ["replicate", "shard_batch", "stream_mesh", "stream_sharding"]
