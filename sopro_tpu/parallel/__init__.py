"""Multi-chip execution: device meshes, sharding rules, and the sharded
training/serving step builders.

The reference is strictly single-device (SURVEY.md §2.4: no DDP/NCCL/MPI
anywhere); parallelism here is TPU-native by design: a `jax.sharding.Mesh`
with ("dp", "tp") axes, `NamedSharding` parameter/batch layouts, and GSPMD
inserting the ICI collectives.
"""

from sopro_tpu.parallel.mesh import make_mesh, param_shardings, batch_sharding

__all__ = ["make_mesh", "param_shardings", "batch_sharding"]
