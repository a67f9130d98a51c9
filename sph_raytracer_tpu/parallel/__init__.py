"""Multi-chip / multi-host parallelism.

The reference is a single-process, single-device library (SURVEY §2:
no torch.distributed anywhere); this package supplies the TPU-native
distribution layer (SURVEY N1-N3, §5.7/§5.8):

* :func:`make_mesh` / :class:`ShardSpec` — device mesh over the ray axis
  (ICI within a slice, DCN across hosts).
* :class:`ShardedOperator` — rays sharded across chips, volume
  replicated; forward is embarrassingly parallel, the backward's density
  gradient is ``psum``-reduced across the mesh inside the custom
  partitioned projection.
* :func:`distributed_init` — ``jax.distributed.initialize`` wrapper for
  multi-host launch.
"""
from .mesh import distributed_init, make_mesh
from .sharded import ShardedOperator, shard_rays
from .vol_sharded import VolShardedOperator

__all__ = ["make_mesh", "distributed_init", "ShardedOperator",
           "shard_rays", "VolShardedOperator"]
