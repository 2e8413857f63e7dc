"""Multi-chip distribution: meshes and modular collectives.

The reference's protocol-level parallelism axes (SURVEY.md §2.8) map onto
mesh axes here:

- P1 participants  -> data axis ``"p"`` (rows of the participation matrix)
- P2 clerks/shares -> share axis ``"c"`` (columns; per-clerk combine)
- P3 packed batches-> dimension axis ``"d"`` (independent NTT batches)
- P5 transposition -> ``all_to_all`` over ICI instead of a Mongo pipeline
- P6 communication -> XLA collectives (modular psum / reduce-scatter built
  from ``ppermute`` + limb adds), not JSON-over-HTTP
"""

from sda_tpu.parallel.collectives import psum_mod, reduce_scatter_mod
from sda_tpu.parallel.mesh import ShardedAggregationPipeline, make_mesh

__all__ = ["psum_mod", "reduce_scatter_mod", "make_mesh", "ShardedAggregationPipeline"]
