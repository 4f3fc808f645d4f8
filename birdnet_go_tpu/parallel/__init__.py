"""Device meshes and sharding rules.

The reference is single-process/single-node (SURVEY.md §2.7); its
goroutine-per-stream concurrency maps to the batch dimension of a single
jitted step here. Scaling beyond one chip is expressed the JAX way: a
`jax.sharding.Mesh` with named axes, `NamedSharding` annotations, and XLA
collectives inserted by the compiler — not hand-written NCCL/MPI.

Axes:
- "data"  — stream/window batch (data parallel; the 2,000-streams axis)
- "model" — species axis of the classifier heads (tensor parallel; only the
  14,795-wide Perch head is big enough to care, but the rule is generic)
"""

from birdnet_go_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    param_pspec_tree,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
    "param_pspec_tree",
]
