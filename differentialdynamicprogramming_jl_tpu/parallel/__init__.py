"""Parallel execution layer.

- :mod:`.mesh` — single-process device meshes: vmap/shard_map scenario-batch
  data parallelism for both solver tiers.
- :mod:`.distributed` — multi-host: `jax.distributed` bring-up, global
  meshes spanning every process, per-process fleet shard assembly.
"""
from .mesh import (make_mesh, ilqg_batched, ilqg_sharded,  # noqa: F401
                   ilqg_batch_sharded)
from .distributed import (init_distributed, is_multiprocess,  # noqa: F401
                          global_mesh, distribute_batch, replicate,
                          local_slice)

__all__ = [
    "make_mesh", "ilqg_batched", "ilqg_sharded", "ilqg_batch_sharded",
    "init_distributed", "is_multiprocess", "global_mesh",
    "distribute_batch", "replicate", "local_slice",
]
