from vqgan_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    init_distributed,
    param_shardings,
    replicated,
    state_shardings,
)

__all__ = [
    "create_mesh",
    "init_distributed",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "state_shardings",
]
