"""Mesh construction and the sharded aggregation pipeline.

The full multi-chip training-equivalent step: participants sharded over
``"p"`` (data parallel), packed batches over ``"d"`` (dimension/tensor
parallel), committee shares over ``"c"`` (the clerk/expert axis). One step:

1. local share generation (modular matmul, no communication);
2. ``all_to_all`` regrouping shares so each chip column owns its clerks'
   slices (the server-side transposition, SURVEY.md §3.3, over ICI);
3. local combine over resident participants + ``psum_mod`` over ``"p"``
   (the clerk combine, SURVEY.md §3.2);
4. all-gather the clerk axis + local reconstruction matmul (SURVEY.md §3.4).

Everything is a ``shard_map`` over a ``jax.sharding.Mesh`` — scaling to a
pod slice is a mesh-shape change, not a code change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sda_tpu.engine import TpuAggregationEngine
from sda_tpu.ops.modmat import modmat, uniform_limbs
from sda_tpu.parallel.collectives import psum_mod

__all__ = ["make_mesh", "ShardedAggregationPipeline"]


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Create a named mesh, e.g. ``make_mesh({"p": 2, "d": 2, "c": 2})``."""
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    return jax.make_mesh(shape, names, devices=devices)


class ShardedAggregationPipeline:
    """Multi-chip aggregation step over a ``(p, d, c)`` mesh."""

    def __init__(self, engine: TpuAggregationEngine, mesh: Mesh):
        self.engine = engine
        self.mesh = mesh
        self.axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        spec = engine.spec
        ctx = engine.ctx
        n_c = self.axes.get("c", 1)
        if spec.share_count % n_c != 0:
            raise ValueError("clerk axis size must divide share_count")

        share_mat = engine.share_mat  # [k+r, n, L] (replicated)
        rec_mat = engine.rec_mat  # [n, k, L] (replicated)

        def step(secrets, randomness):
            """Block-local view: secrets [P_loc, nb_loc, k, L] with the
            participant axis sharded over ("p", "c") jointly."""
            ext = jnp.concatenate([secrets, randomness], axis=2)
            # 1. local share generation
            shares = modmat(ctx, ext, share_mat)  # [P_loc, nb_loc, n, L]
            # 2. transposition: regroup the clerk axis over "c" so each chip
            #    column holds only its clerks' shares for n_c x more
            #    participants (P5 as all_to_all over ICI)
            if n_c > 1:
                shares = jax.lax.all_to_all(
                    shares, "c", split_axis=2, concat_axis=0, tiled=True
                )  # [P_loc*n_c, nb_loc, n/n_c, L]
            # 3. clerk combine: resident participants, then across the "p" ring
            local = ctx.sum_mod(shares, axis=0)  # [nb_loc, n/n_c, L]
            combined = psum_mod(ctx, local, "p")
            # 4. reassemble the full clerk axis for reconstruction
            if n_c > 1:
                combined = jax.lax.all_gather(
                    combined, "c", axis=1, tiled=True
                )  # [nb_loc, n, L]
            out = modmat(ctx, combined, rec_mat)  # [nb_loc, k, L]
            return out

        pspec_in = P(("p", "c"), "d", None, None)
        pspec_out = P("d", None, None)
        # check_vma=False: the output IS replicated over "p"/"c" by
        # construction (psum_mod all-reduces them), but it is built from
        # ppermute rings the static varying-axes checker can't see through.
        self._step = jax.jit(
            jax.shard_map(
                step,
                mesh=mesh,
                in_specs=(pspec_in, pspec_in),
                out_specs=pspec_out,
                check_vma=False,
            )
        )

        def step_from_key(secrets, key):
            rand_shape = secrets.shape[:2] + (spec.randomness_count,)
            randomness = uniform_limbs(ctx, key, rand_shape)
            return self._step(secrets, randomness)

        self._step_from_key = jax.jit(step_from_key)

        self.in_sharding = NamedSharding(mesh, pspec_in)
        self.out_sharding = NamedSharding(mesh, pspec_out)

    def aggregate(self, secrets_limbs, randomness_limbs):
        """``[P, nb, k, L]`` + randomness -> combined ``[nb, k, L]``."""
        return self._step(secrets_limbs, randomness_limbs)

    def aggregate_from_key(self, secrets_limbs, key):
        return self._step_from_key(secrets_limbs, key)

    def shard_inputs(self, secrets_limbs):
        return jax.device_put(secrets_limbs, self.in_sharding)
