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
import numpy as np
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

        # ---------------------------------------- MXU-kernel sharded step
        # Each chip runs the fused int8 share+combine kernel on its resident
        # participants (sda_tpu/ops/mxu_kernel.py), producing per-clerk
        # partial sums for ALL clerks; the cross-chip clerk combine is then
        # a modular all-reduce over ("p", "c") — on this path the
        # transposition collective is replaced by a reduction, which is the
        # natural mapping once combine is fused into share generation.
        if engine.mxu is not None:
            from sda_tpu.ops.mxu_kernel import fused_share_combine_mxu

            mxu = engine.mxu
            k_ = spec.secret_count
            r_ = spec.randomness_count
            n_ = spec.share_count
            L7 = mxu.L7
            n_shards = self.axes.get("p", 1) * n_c

            def _mxu_local(sec7_loc, seed, p_loc, lanes):
                idx = jax.lax.axis_index("p") * n_c + jax.lax.axis_index("c")
                # collision-free per-(seed, shard, block) PRNG offsets: the
                # in-kernel offset is seed + program_id (< grid_n), so give
                # every shard a disjoint grid_n-wide window and every seed a
                # disjoint n_shards*grid_n-wide window. The caller seed is
                # folded into [0, 2^31 // stride) FIRST (static arithmetic,
                # shapes are known at trace time), so a large e.g.
                # time-derived seed can never wrap int32 and silently
                # re-overlap windows; distinct seeds stay window-disjoint
                # up to that (documented) period.
                grid_n = sec7_loc.shape[1] // lanes
                windows = min(max(1, (1 << 31) // (n_shards * grid_n)),
                              (1 << 31) - 1)  # int32-representable
                local_seed = (
                    (seed % jnp.int32(windows)) * jnp.int32(n_shards)
                    + idx.astype(jnp.int32)
                ) * jnp.int32(grid_n)
                # slot count (k vs k+r) is auto-detected from the row count:
                # k slots -> on-chip PRNG randomness, k+r -> caller-supplied
                comb16 = fused_share_combine_mxu(
                    mxu, spec.share_matrix, sec7_loc, p_loc,
                    k_, r_,
                    seed=local_seed, lanes=lanes, out7=False,
                )  # [n, L16, NBP_loc]
                x = jnp.moveaxis(comb16, 1, -1)  # limb-last for add_mod
                x = psum_mod(ctx, x, "p")
                x = psum_mod(ctx, x, "c")
                comb16 = jnp.moveaxis(x, -1, 1)
                # local reconstruction (replicated over p/c after the psum)
                c7 = mxu.limbs7_from_16(jnp.moveaxis(comb16, 1, -1))
                c7 = jnp.moveaxis(c7, -1, 1).reshape(-1, comb16.shape[-1])
                rec = fused_share_combine_mxu(
                    mxu, spec.reconstruct_matrix, c7, 1, n_, 0, lanes=lanes,
                )  # [k, L16, NBP_loc]
                return jnp.transpose(rec, (2, 0, 1))  # [NBP_loc, k, L16]

            pspec_planar = P(("p", "c"), "d")

            def _make_mxu_step(with_prng):
                def body(sec7_loc, seed):
                    slots = k_ if with_prng else k_ + r_
                    p_loc = sec7_loc.shape[0] // (slots * L7)
                    lanes = min(512, sec7_loc.shape[1])
                    return _mxu_local(sec7_loc, seed, p_loc, lanes)

                return jax.jit(
                    jax.shard_map(
                        body,
                        mesh=mesh,
                        in_specs=(pspec_planar, P()),
                        out_specs=P("d", None, None),
                        check_vma=False,
                    )
                )

            self._mxu_step = _make_mxu_step(True)
            self._mxu_step_ext = _make_mxu_step(False)
            self.planar_sharding = NamedSharding(mesh, pspec_planar)

            def aggregate_mxu(sec7, seed):
                """``sec7``: ``[P*k*L7, NBP]`` int8 planar secrets, sharded
                by :meth:`shard_planar`; randomness from the on-chip PRNG
                (decorrelated per shard). Returns ``[NBP, k, L16]``
                (slice to ``engine.nb`` rows for the revealed batches)."""
                return self._mxu_step(sec7, jnp.asarray(seed, dtype=jnp.int32))

            def aggregate_mxu_ext(ext7):
                """Caller-randomness variant: ``[P*(k+r)*L7, NBP]`` planar
                (host-CSPRNG canonical randomness; runs on any backend)."""
                return self._mxu_step_ext(ext7, jnp.asarray(0, dtype=jnp.int32))

            self.aggregate_mxu = aggregate_mxu
            self.aggregate_mxu_ext = aggregate_mxu_ext

            # ----------------------- streaming x sharded (BASELINE config 5)
            # 100k participants x 1M dim exceeds HBM even sharded, so the
            # participant axis streams in chunks: each chip fuses
            # share-gen+combine over its resident slice of a chunk and
            # accumulates LOCAL per-clerk partial sums (no collectives in
            # the chunk loop — the linearity of the combine lets every
            # cross-chip exchange wait). One finish step pays the modular
            # all-reduce over ("p", "c") and reconstructs. This composes the
            # protocol's P1 streaming with P2/P5 sharding (SURVEY.md §2.8).
            def _chunk_body(sec7_loc, seed, slots):
                idx = jax.lax.axis_index("p") * n_c + jax.lax.axis_index("c")
                p_loc = sec7_loc.shape[0] // (slots * L7)
                lanes = min(512, sec7_loc.shape[1])
                # same disjoint-window seed schedule as _mxu_local (incl.
                # the int32-wrap-safe fold): callers pass consecutive chunk
                # indices, not pre-scaled seeds
                grid_n = sec7_loc.shape[1] // lanes
                windows = min(max(1, (1 << 31) // (n_shards * grid_n)),
                              (1 << 31) - 1)  # int32-representable
                local_seed = (
                    (seed % jnp.int32(windows)) * jnp.int32(n_shards)
                    + idx.astype(jnp.int32)
                ) * jnp.int32(grid_n)
                comb16 = fused_share_combine_mxu(
                    mxu, spec.share_matrix, sec7_loc, p_loc,
                    k_, r_, seed=local_seed, lanes=lanes, out7=False,
                )  # [n, L16, NBP_loc]
                # limb-last, leading shard axis for the (p, c) partial sums
                return jnp.moveaxis(comb16, 1, -1)[None]

            pspec_partial = P(("p", "c"), None, "d", None)

            def _make_chunk_step(with_prng):
                slots = k_ if with_prng else k_ + r_
                return jax.jit(
                    jax.shard_map(
                        lambda sec7_loc, seed: _chunk_body(sec7_loc, seed, slots),
                        mesh=mesh,
                        in_specs=(pspec_planar, P()),
                        out_specs=pspec_partial,
                        check_vma=False,
                    )
                )

            self._mxu_chunk_step = _make_chunk_step(True)
            self._mxu_chunk_step_ext = _make_chunk_step(False)

            def _finish_body(acc_loc):
                x = acc_loc[0]  # [n, NBP_loc, L16] this shard's partial sum
                x = psum_mod(ctx, x, "p")
                x = psum_mod(ctx, x, "c")
                c7 = mxu.limbs7_from_16(x)  # [n, NBP_loc, L7]
                c7 = jnp.moveaxis(c7, -1, 1).reshape(-1, x.shape[1])
                lanes = min(512, x.shape[1])
                rec = fused_share_combine_mxu(
                    mxu, spec.reconstruct_matrix, c7, 1, n_, 0, lanes=lanes,
                )  # [k, L16, NBP_loc]
                return jnp.transpose(rec, (2, 0, 1))  # [NBP_loc, k, L16]

            self._mxu_stream_finish = jax.jit(
                jax.shard_map(
                    _finish_body,
                    mesh=mesh,
                    in_specs=(pspec_partial,),
                    out_specs=P("d", None, None),
                    check_vma=False,
                )
            )
            self._add_mod_sharded = jax.jit(ctx.add_mod)

            def aggregate_mxu_streaming(chunks, seed0: int = 0, ext: bool = False):
                """Streaming + sharded aggregation (config-5 shape).

                ``chunks``: iterable of planar int8 tensors ``[P_chunk*slots*
                L7, NBP]`` (or callables ``f(i) -> tensor``); each is sharded
                participant-rows over ("p","c") and lanes over "d". ``ext``
                selects caller-supplied (host-CSPRNG) randomness slots —
                the canonical protocol path. With ``ext=False`` sharing
                randomness comes from the in-kernel PRNG with per-chunk/
                per-shard seeds derived by a linear integer schedule: a
                decorrelation device for benchmarks and scaling tests, NOT
                a CSPRNG — production shares must use ``ext=True``.
                Returns ``[NBP, k, L16]`` — slice to ``engine.nb`` rows.
                """
                step = self._mxu_chunk_step_ext if ext else self._mxu_chunk_step
                acc = None
                for i, chunk in enumerate(chunks):
                    sec7 = chunk(i) if callable(chunk) else chunk
                    sec7 = self.shard_planar(sec7)
                    part = step(sec7, jnp.asarray(seed0 + 7919 * i, jnp.int32))
                    acc = part if acc is None else self._add_mod_sharded(acc, part)
                if acc is None:
                    raise ValueError(
                        "aggregate_mxu_streaming requires at least one chunk"
                    )
                return self._mxu_stream_finish(acc)

            self.aggregate_mxu_streaming = aggregate_mxu_streaming

        # ------------------------------- byte-limb (gen-4) sharded step
        # Same collective structure as the mxu path — per-chip fused
        # share+combine, modular all-reduce over ("p","c"), local
        # reconstruction — on sda_tpu/ops/mxu8.py's biased-digit kernel.
        if getattr(engine, "mxu8", None) is not None:
            from sda_tpu.ops.mxu8 import fused_share_combine_mxu8

            mxu8 = engine.mxu8
            k_ = spec.secret_count
            r_ = spec.randomness_count
            n_ = spec.share_count
            L8 = mxu8.L8
            L16 = ctx.L
            n_shards = self.axes.get("p", 1) * n_c  # mxu block may be absent
            pspec_planar = P(("p", "c"), "d")
            # partial sums stay in the kernel's limb-major planar layout
            # ([L16*n, NBP_loc] per shard, leading stacked shard axis), so
            # the accumulate-in-kernel streaming step can alias them
            # straight back into the next launch's output
            pspec_partial8 = P(("p", "c"), None, "d")

            def _comb_to_limb_last(comb):  # [L16*n, NBP] -> [n, NBP, L16]
                return jnp.transpose(
                    comb.reshape(L16, n_, comb.shape[-1]), (1, 2, 0)
                )

            def _recon_local(x, lanes):  # [n, NBP_loc, L16] canonical
                bytes_ = [
                    (((x[..., j // 2] >> (8 * (j % 2))) & 0xFF) ^ 0x80).astype(
                        jnp.int8
                    )
                    for j in range(L8)
                ]
                c8 = jnp.stack(bytes_, axis=1).reshape(n_ * L8, x.shape[1])
                rec = fused_share_combine_mxu8(
                    mxu8, spec.reconstruct_matrix, c8, 1, n_, 0, lanes=lanes,
                )  # [L16*k, NBP_loc]
                return jnp.transpose(
                    rec.reshape(L16, k_, x.shape[1]), (2, 1, 0)
                )  # [NBP_loc, k, L16]

            def _mxu8_chunk_body(sec8_loc, seed, slots, acc_loc=None):
                idx = jax.lax.axis_index("p") * n_c + jax.lax.axis_index("c")
                p_loc = sec8_loc.shape[0] // (slots * L8)
                lanes = min(512, sec8_loc.shape[1])
                # disjoint per-(seed, shard, block) PRNG windows (same
                # int32-wrap-safe schedule as the 7-bit path): callers pass
                # consecutive chunk indices
                grid_n = sec8_loc.shape[1] // lanes
                windows = min(max(1, (1 << 31) // (n_shards * grid_n)),
                              (1 << 31) - 1)  # int32-representable
                local_seed = (
                    (seed % jnp.int32(windows)) * jnp.int32(n_shards)
                    + idx.astype(jnp.int32)
                ) * jnp.int32(grid_n)
                comb = fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, sec8_loc, p_loc, k_, r_,
                    seed=local_seed, lanes=lanes,
                    acc_in=None if acc_loc is None else acc_loc[0],
                )
                return comb[None]

            def _make_chunk_step8(with_prng, with_acc=False):
                slots = k_ if with_prng else k_ + r_
                if with_acc:
                    body = lambda s, acc, seed: _mxu8_chunk_body(  # noqa: E731
                        s, seed, slots, acc_loc=acc
                    )
                    in_specs = (pspec_planar, pspec_partial8, P())
                    donate = (1,)
                else:
                    body = lambda s, seed: _mxu8_chunk_body(s, seed, slots)  # noqa: E731
                    in_specs = (pspec_planar, P())
                    donate = ()
                return jax.jit(
                    jax.shard_map(
                        body,
                        mesh=mesh,
                        in_specs=in_specs,
                        out_specs=pspec_partial8,
                        check_vma=False,
                    ),
                    donate_argnums=donate,
                )

            self._mxu8_chunk_step = _make_chunk_step8(True)
            self._mxu8_chunk_step_ext = _make_chunk_step8(False)
            self._mxu8_chunk_step_acc = _make_chunk_step8(True, with_acc=True)
            self._mxu8_chunk_step_ext_acc = _make_chunk_step8(False, with_acc=True)
            self.planar_sharding = NamedSharding(mesh, pspec_planar)

            def _finish_body8(acc_loc):
                x = _comb_to_limb_last(acc_loc[0])  # [n, NBP_loc, L16]
                x = psum_mod(ctx, x, "p")
                x = psum_mod(ctx, x, "c")
                return _recon_local(x, min(512, x.shape[1]))

            self._mxu8_stream_finish = jax.jit(
                jax.shard_map(
                    _finish_body8,
                    mesh=mesh,
                    in_specs=(pspec_partial8,),
                    out_specs=P("d", None, None),
                    check_vma=False,
                )
            )

            def aggregate_mxu8(sec8, seed):
                """Single-pass gen-4 sharded step: ``sec8`` ``[P*k*L8, NBP]``
                biased planar bytes (engine.planar8_secrets), randomness
                from the on-chip PRNG decorrelated per shard. Returns
                ``[NBP, k, L16]`` (slice to ``engine.nb`` rows)."""
                part = self._mxu8_chunk_step(
                    self.shard_planar(sec8), jnp.asarray(seed, jnp.int32)
                )
                return self._mxu8_stream_finish(part)

            def aggregate_mxu8_streaming(chunks, seed0: int = 0, ext: bool = False,
                                         indices=None, subset_matrix=None):
                """Streaming + sharded gen-4 aggregation (config-5 shape).

                Semantics identical to :meth:`aggregate_mxu_streaming`
                (per-chunk local fused combines, no collectives in the
                loop, one modular all-reduce + reconstruction at the end);
                the planar chunks are biased byte limbs ``[P_chunk*slots*
                L8, NBP]``. ``ext=True`` = caller-supplied host-CSPRNG
                randomness (the protocol path); the in-kernel PRNG seed
                schedule is a benchmark decorrelation device only.
                ``indices`` + ``subset_matrix``: finish from a degraded
                committee (see :meth:`aggregate_mxu8_degraded`).
                """
                step = self._mxu8_chunk_step_ext if ext else self._mxu8_chunk_step
                step_acc = (
                    self._mxu8_chunk_step_ext_acc if ext else self._mxu8_chunk_step_acc
                )
                acc = None
                for i, chunk in enumerate(chunks):
                    sec8 = chunk(i) if callable(chunk) else chunk
                    sec8 = self.shard_planar(sec8)
                    seed_i = jnp.asarray(seed0 + i, jnp.int32)
                    if acc is None:
                        acc = step(sec8, seed_i)
                    else:
                        # accumulate inside the kernel (acc aliased to the
                        # launch's output): one launch per chunk
                        acc = step_acc(sec8, acc, seed_i)
                if acc is None:
                    raise ValueError(
                        "aggregate_mxu8_streaming requires at least one chunk"
                    )
                if indices is not None:
                    return aggregate_mxu8_degraded(acc, indices, subset_matrix)
                return self._mxu8_stream_finish(acc)

            # ---------------- degraded-committee reconstruction (P4)
            # The protocol's failure-tolerance claim on the mesh: any
            # reconstruction_threshold-sized clerk subset reconstructs the
            # same aggregate (crypto.rs:147-153, packed_shamir.rs:73-77).
            # The subset Lagrange matrix is applied with the SAME fused
            # kernel as the full-set finish, on the surviving clerk rows.
            finish_cache: dict = {}

            def _finish_subset8(indices, subset_matrix):
                key = tuple(int(i) for i in indices)
                fn = finish_cache.get(key)
                if fn is not None:
                    return fn
                s = len(key)
                idx_arr = np.asarray(key, dtype=np.int32)

                def body(acc_loc):
                    x = _comb_to_limb_last(acc_loc[0])  # [n, NBP_loc, L16]
                    x = psum_mod(ctx, x, "p")
                    x = psum_mod(ctx, x, "c")
                    xs = x[idx_arr]  # surviving clerks only [s, NBP_loc, L16]
                    bytes_ = [
                        (((xs[..., j // 2] >> (8 * (j % 2))) & 0xFF) ^ 0x80
                         ).astype(jnp.int8)
                        for j in range(L8)
                    ]
                    c8 = jnp.stack(bytes_, axis=1).reshape(s * L8, xs.shape[1])
                    rec = fused_share_combine_mxu8(
                        mxu8, subset_matrix, c8, 1, s, 0,
                        lanes=min(512, xs.shape[1]),
                    )  # [L16*k2, NBP_loc]
                    k2 = rec.shape[0] // L16
                    return jnp.transpose(
                        rec.reshape(L16, k2, xs.shape[1]), (2, 1, 0)
                    )

                fn = jax.jit(
                    jax.shard_map(
                        body,
                        mesh=mesh,
                        in_specs=(pspec_partial8,),
                        out_specs=P("d", None, None),
                        check_vma=False,
                    )
                )
                finish_cache[key] = fn
                return fn

            def aggregate_mxu8_degraded(part, indices, subset_matrix):
                """Finish a gen-4 sharded step from a DEGRADED committee:
                reconstruct from only the ``indices`` clerk shards (any
                ``reconstruction_threshold`` of ``share_count``) using the
                scheme's subset Lagrange matrix
                (``PackedShamirScheme.reconstruct_matrix(indices)``).
                ``part`` is the partial-sum output of a chunk step (what
                :meth:`aggregate_mxu8_streaming` accumulates). Returns
                ``[NBP, k, L16]``."""
                return _finish_subset8(indices, subset_matrix)(part)

            self.aggregate_mxu8_degraded = aggregate_mxu8_degraded

            self._add_mod_sharded = jax.jit(ctx.add_mod)
            self.aggregate_mxu8 = aggregate_mxu8
            self.aggregate_mxu8_streaming = aggregate_mxu8_streaming

    def shard_planar(self, sec7):
        """Shard a planar int8 tensor: participant rows over ("p","c"),
        lane blocks over "d"."""
        return jax.device_put(sec7, self.planar_sharding)

    def aggregate(self, secrets_limbs, randomness_limbs):
        """``[P, nb, k, L]`` + randomness -> combined ``[nb, k, L]``."""
        return self._step(secrets_limbs, randomness_limbs)

    def aggregate_from_key(self, secrets_limbs, key):
        return self._step_from_key(secrets_limbs, key)

    def shard_inputs(self, secrets_limbs):
        return jax.device_put(secrets_limbs, self.in_sharding)
