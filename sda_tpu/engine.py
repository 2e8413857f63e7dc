"""The TPU executor for bulk secure aggregation.

Single-device jitted pipeline over limb arrays; the multi-chip variants live
in :mod:`sda_tpu.parallel`. The pipeline mirrors the protocol call stacks
(SURVEY.md §3) with the host/device boundary drawn exactly at the field math:

- participant side: mask + share generation (the per-participant NTT pipeline
  folded into one modular matmul, P3/P7);
- clerk side: the combine (modular segment-sum over participants, P2);
- recipient side: reconstruction (inverse transform matmul) + unmask.

Wire encryption/decryption (sealed boxes) stays host-side; this engine is
what a clerk/recipient runs between decrypt and encrypt when the batch is
large, and what the benchmark configs measure.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sda_tpu.ops.limbs import LimbContext
from sda_tpu.ops.modmat import combine, modmat, uniform_limbs
from sda_tpu.ops.mxu import MxuContext, mxu_modmat
from sda_tpu.sharing import DeviceSchemeSpec

__all__ = ["TpuAggregationEngine", "device_combine"]


@functools.lru_cache(maxsize=32)
def _pairs_sum_for_modulus(modulus: int):
    """``(ctx, jitted pairs-sum)`` for one modulus, cached so repeat
    :func:`device_combine` calls reuse both the limb context and the
    compiled executable instead of retracing (a fresh closure per call
    costs ~0.7 s of jit overhead per chunk on this host). Bounded: the
    modulus is client-chosen per aggregation, so an unbounded cache would
    grow for the life of a serving process under diverse (or hostile)
    moduli."""
    ctx = LimbContext.create_add_only(modulus, L=4)
    two64_minus_p = [
        (int(((1 << 64) - modulus) >> (16 * j)) & 0xFFFF) for j in range(4)
    ]

    @jax.jit
    def _pairs_sum(pairs):  # [C, d, 2] uint32 -> [d, 4] canonical limbs
        lo, hi = pairs[..., 0], pairs[..., 1]
        lanes = [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16]
        neg = (hi >> 31).astype(jnp.int32)  # 1 where the i64 was negative
        out, borrow = [], jnp.zeros_like(neg)
        for j in range(4):
            t = lanes[j].astype(jnp.int32) - neg * two64_minus_p[j] - borrow
            out.append((t & 0xFFFF).astype(jnp.uint32))
            borrow = (t >> 31) & 1
        x = jnp.stack(out, axis=-1)  # [C, d, 4] canonical
        return ctx.sum_mod(x, axis=0)

    return ctx, _pairs_sum


def device_combine(modulus: int, share_vectors, chunk_size: int = 256) -> np.ndarray:
    """Bulk clerk combine on the accelerator.

    Clerk-side modular sum of many participants' share vectors
    (the clerk.rs:84-86 hot loop). Returns canonical ``[0, p)`` values —
    protocol-equivalent to the reference's signed fold (representatives may
    differ; reveal-side ``positive()`` agrees). Odd or even modulus, any
    width below 2**63 on the int64 fast path.

    ``share_vectors`` may be any iterable (including a generator draining
    decryptions): vectors stream through the device accumulator in
    ``chunk_size``-participant chunks, so peak host memory is
    O(chunk_size x dimension) — not O(participants x dimension) — the same
    streaming answer to clerk.rs:71-72 the server-side transpose uses.

    Staging: each int64 chunk ships to the device as its raw little-endian
    (lo, hi) uint32 pairs (a zero-copy numpy view — no host limb encode, no
    host ``% p``, half the transfer bytes of u32 limbs); the device splits
    16-bit lanes and canonicalises trunc-domain negatives by subtracting
    ``2^64 - p`` with borrow. Values outside ``(-p, p)`` (never produced by
    the protocol, possible from a hostile wire) fall back to a host
    floor-mod for that chunk.
    """
    import sys as _sys

    ctx, _pairs_sum = _pairs_sum_for_modulus(modulus)
    le = _sys.byteorder == "little"
    acc = None

    def flush(acc, buf):
        if acc is not None and len(buf) < chunk_size:
            # zero-pad the tail chunk: zeros are the additive identity, and
            # a single chunk shape means a single jit compilation
            buf = buf + [np.zeros_like(buf[0])] * (chunk_size - len(buf))
        arr = np.ascontiguousarray(np.asarray(buf, dtype=np.int64))
        if le:
            # min/max (not abs: abs(INT64_MIN) wraps) guard the (-p, p) domain
            if arr.size and not (
                int(arr.min()) > -modulus and int(arr.max()) < modulus
            ):
                # hostile-wire magnitudes: exact host floor-mod first,
                # then the same device pair path (values now canonical)
                arr = np.ascontiguousarray(arr % modulus)
            pairs = arr.view(np.uint32).reshape(arr.shape + (2,))
            part = _pairs_sum(jnp.asarray(pairs))
        else:
            limbs = jnp.asarray(ctx.encode_i64(arr))
            part = ctx.sum_mod(limbs, axis=0)
        return part if acc is None else ctx.add_mod(acc, part)

    buf: list[np.ndarray] = []
    for v in share_vectors:
        buf.append(np.asarray(v, dtype=np.int64))
        if len(buf) == chunk_size:
            acc = flush(acc, buf)
            buf = []
    if buf:
        acc = flush(acc, buf)
    if acc is None:
        raise ValueError("device_combine requires at least one share vector")
    return ctx.decode_i64(np.asarray(acc))


class TpuAggregationEngine:
    """Compiled bulk executor for one (scheme, dimension) configuration.

    Data layout: secrets ``[P, d]`` become ``[P, nb, k, L]`` limb tensors
    (``nb = ceil(d/k)`` batches of ``k`` packed secrets — the reference's
    batching layer, batched.rs:18-53, as a reshape). Shares are
    ``[P, nb, n, L]``; the clerk axis ``n`` is the distribution axis.
    """

    def __init__(self, spec: DeviceSchemeSpec, dimension: int):
        self.spec = spec
        self.dimension = dimension
        self.ctx = LimbContext.create(spec.modulus)
        k = spec.secret_count
        self.nb = -(-dimension // k)
        # Montgomery-form matrices on device; mont_mul(normal, mont) = product
        self.share_mat = jnp.asarray(self.ctx.encode_mont(spec.share_matrix))
        self.rec_mat = jnp.asarray(self.ctx.encode_mont(spec.reconstruct_matrix))

        ctx = self.ctx

        def _share(ext):  # [P, nb, k+r, L] -> [P, nb, n, L]
            return modmat(ctx, ext, self.share_mat)

        def _combine(shares):  # [P, nb, n, L] -> [nb, n, L]
            return combine(ctx, shares, axis=0)

        def _reconstruct(combined):  # [nb, n, L] -> [nb, k, L]
            return modmat(ctx, combined, self.rec_mat)

        def _aggregate(secrets, randomness):
            ext = jnp.concatenate([secrets, randomness], axis=2)
            return _reconstruct(_combine(_share(ext)))

        def _aggregate_from_key(secrets, key):
            rand = uniform_limbs(
                ctx, key, secrets.shape[:2] + (spec.randomness_count,)
            )
            return _aggregate(secrets, rand)

        self.share = jax.jit(_share)
        self.combine = jax.jit(_combine)
        self.reconstruct = jax.jit(_reconstruct)
        self.aggregate = jax.jit(_aggregate)
        self.aggregate_from_key = jax.jit(_aggregate_from_key)

        @partial(jax.jit, static_argnums=(2, 3))
        def _fused(x, seed, rows, interpret):
            from sda_tpu.ops.pallas_kernels import (
                batched_from_planar,
                fused_share_combine_planar,
                planar_from_batched,
            )

            planar = planar_from_batched(x, rows)
            combined_planar = fused_share_combine_planar(
                ctx, planar, self.share_mat, spec.randomness_count,
                seed=seed, rows=rows, interpret=interpret,
            )
            return _reconstruct(batched_from_planar(combined_planar, self.nb))

        def _aggregate_fused(secrets, seed, rows=8, interpret=False):
            """Pallas fast path: share+combine fused (randomness on-chip)."""
            return _fused(secrets, jnp.asarray(seed, dtype=jnp.int32), rows, interpret)

        def _aggregate_fused_ext(ext, rows=8, interpret=False):
            """Pallas fast path with caller (host-CSPRNG) randomness."""
            return _fused(ext, jnp.asarray(0, dtype=jnp.int32), rows, interpret)

        self.aggregate_fused = _aggregate_fused
        self.aggregate_fused_ext = _aggregate_fused_ext

        @partial(jax.jit, static_argnums=(2, 3))
        def _fused_combined_only(x, seed, rows, interpret):
            """One chunk -> combined shares in batched [nb, n, L] layout."""
            from sda_tpu.ops.pallas_kernels import (
                batched_from_planar,
                fused_share_combine_planar,
                planar_from_batched,
            )

            planar = planar_from_batched(x, rows)
            out = fused_share_combine_planar(
                ctx, planar, self.share_mat, spec.randomness_count,
                seed=seed, rows=rows, interpret=interpret,
            )
            return batched_from_planar(out, self.nb)

        def _aggregate_fused_streaming(chunks, seed0: int = 0, rows=8, interpret=False):
            """Participant-streaming aggregation (BASELINE config 4 scale).

            ``chunks``: iterable of ``[P_chunk, nb, k, L]`` secret tensors
            (host arrays or device arrays, or callables ``f(i) -> tensor``
            for device-side generation). The per-clerk combined sums
            accumulate across chunks mod p, so the participation matrix
            never needs to be HBM-resident at once.
            """
            acc = None
            for i, chunk in enumerate(chunks):
                x = chunk(i) if callable(chunk) else jnp.asarray(chunk)
                part = _fused_combined_only(
                    x, jnp.asarray(seed0 + i, dtype=jnp.int32), rows, interpret
                )
                acc = part if acc is None else ctx.add_mod(acc, part)
            return self.reconstruct(acc)

        self.aggregate_fused_streaming = _aggregate_fused_streaming

        # ------------------------------------------------ MXU int8 path
        # Fold share-gen + combine into one int8 systolic matmul (see
        # sda_tpu/ops/mxu.py). Available for odd moduli wider than 7 bits.
        self.mxu: MxuContext | None = None
        if spec.modulus % 2 == 1 and spec.modulus.bit_length() > 7:
            mxu = MxuContext.create(self.ctx)
            self.mxu = mxu
            L7 = mxu.L7
            k_, r_, n_ = spec.secret_count, spec.randomness_count, spec.share_count
            self._slots_raw = [L7] * k_ + [2 * L7] * r_
            self._slots_can = [L7] * (k_ + r_)
            self._big_raw = mxu.matrix_int8(spec.share_matrix, self._slots_raw)
            self._big_can = mxu.matrix_int8(spec.share_matrix, self._slots_can)
            self._cols_raw = mxu.out_cols(self._slots_raw)
            self._cols_can = mxu.out_cols(self._slots_can)
            big_cache: dict[tuple[str, int], jnp.ndarray] = {}

            def _tiled_big(kind: str, p_count: int):
                got = big_cache.get((kind, p_count))
                if got is None:
                    one = self._big_raw if kind == "raw" else self._big_can
                    got = jnp.asarray(np.concatenate([one] * p_count, axis=0))
                    big_cache[(kind, p_count)] = got
                return got

            @jax.jit
            def _mxu_combined_from_key(secrets, key, big):
                # secrets [P, nb, k, L16] -> per-clerk combined [nb, n, L16]
                P = secrets.shape[0]
                s7 = mxu.limbs7_from_16(secrets).reshape(P, self.nb, k_ * L7)
                bits = jax.random.bits(
                    key, (P, self.nb, r_, mxu.raw_words), dtype=jnp.uint32
                )
                r7 = mxu.raw_limbs(bits).reshape(P, self.nb, r_ * 2 * L7)
                ext = jnp.concatenate([s7, r7], axis=-1)  # [P, nb, S]
                extT = jnp.transpose(ext, (1, 0, 2)).reshape(self.nb, -1)
                return mxu_modmat(mxu, extT, big, n_, self._cols_raw)

            @jax.jit
            def _mxu_combined_ext(ext, big):
                # caller-randomness (canonical) path: ext [P, nb, k+r, L16]
                P = ext.shape[0]
                e7 = mxu.limbs7_from_16(ext).reshape(P, self.nb, (k_ + r_) * L7)
                extT = jnp.transpose(e7, (1, 0, 2)).reshape(self.nb, -1)
                return mxu_modmat(mxu, extT, big, n_, self._cols_can)

            def _aggregate_mxu(secrets, key):
                """MXU fast path: share+combine as one int8 matmul, then
                reconstruct. Sharing randomness is drawn double-width raw
                (bias <= 2^-(7*L7)); the protocol path with host-CSPRNG
                randomness is :meth:`aggregate_mxu_ext`."""
                big = _tiled_big("raw", secrets.shape[0])
                return self.reconstruct(_mxu_combined_from_key(secrets, key, big))

            def _aggregate_mxu_ext(ext):
                big = _tiled_big("can", ext.shape[0])
                return self.reconstruct(_mxu_combined_ext(ext, big))

            def _aggregate_mxu_streaming(chunks, key):
                """Participant-streaming MXU aggregation (config-4 scale):
                per-chunk combined sums accumulate mod p across chunks."""
                acc = None
                for i, chunk in enumerate(chunks):
                    x = chunk(i) if callable(chunk) else jnp.asarray(chunk)
                    big = _tiled_big("raw", x.shape[0])
                    part = _mxu_combined_from_key(
                        x, jax.random.fold_in(key, i), big
                    )
                    acc = part if acc is None else ctx.add_mod(acc, part)
                return self.reconstruct(acc)

            self.mxu_combined_from_key = _mxu_combined_from_key
            self.aggregate_mxu = _aggregate_mxu
            self.aggregate_mxu_ext = _aggregate_mxu_ext
            self.aggregate_mxu_streaming = _aggregate_mxu_streaming

            # -------------------------------------- MXU Pallas kernels
            # The fastest path: secrets stream as compact int8 limbs,
            # randomness is drawn in VMEM, the share+combine runs on the
            # systolic array, and reconstruction is a second tiny call of
            # the same kernel (sda_tpu/ops/mxu_kernel.py).
            from sda_tpu.ops.mxu_kernel import (
                batched_from_planar16,
                fused_share_combine_mxu,
                planar7_from_batched,
            )

            def _planar7_secrets(secrets, lanes=1024):
                """``[P, nb, k, L16] u32 -> [P*k*L7, NBP] int8`` (jit-safe)."""
                return planar7_from_batched(mxu, secrets, lanes)

            def _planar7_ext(ext, lanes=1024):
                """Caller-randomness layout: ``[P, nb, k+r, L16] -> planar``."""
                return planar7_from_batched(mxu, ext, lanes)

            @partial(jax.jit, static_argnums=(2, 3))
            def _kernel_step(sec7, seed, p_count, lanes):
                # share+combine+reconstruct in ONE kernel dispatch: the
                # combined share tensor never exists in HBM
                rec = fused_share_combine_mxu(
                    mxu, spec.share_matrix, sec7, p_count,
                    k_, r_, seed=seed, lanes=lanes,
                    reconstruct_matrix=spec.reconstruct_matrix,
                )
                return batched_from_planar16(rec, self.nb)

            def _aggregate_mxu_kernel(sec7, seed, p_count, lanes=1024):
                """Full pipeline on the MXU kernels: ``sec7`` from
                :meth:`planar7_secrets`; returns ``[nb, k, L16]``."""
                return _kernel_step(
                    sec7, jnp.asarray(seed, dtype=jnp.int32), p_count, lanes
                )

            @partial(jax.jit, static_argnums=(2, 3))
            def _kernel_combined(sec7, seed, p_count, lanes):
                return fused_share_combine_mxu(
                    mxu, spec.share_matrix, sec7, p_count,
                    k_, r_, seed=seed, lanes=lanes, out7=False,
                )

            @jax.jit
            def _add_mod_planar(a, b):  # [n, L16, NBP] u32 canonical
                lanes = self.ctx.add_mod_lanes(
                    [a[:, l] for l in range(self.ctx.L)],
                    [b[:, l] for l in range(self.ctx.L)],
                )
                return jnp.stack(lanes, axis=1)

            @partial(jax.jit, static_argnums=(1,))
            def _reconstruct_planar16(comb16, lanes):
                # [n, L16, NBP] u32 -> [nb, k, L16] via the MXU kernel
                c7 = mxu.limbs7_from_16(jnp.moveaxis(comb16, 1, -1))
                c7 = jnp.moveaxis(c7, -1, 1).reshape(-1, comb16.shape[-1])
                rec = fused_share_combine_mxu(
                    mxu, spec.reconstruct_matrix, c7, 1, n_, 0, lanes=lanes,
                )
                return batched_from_planar16(rec, self.nb)

            def _aggregate_mxu_kernel_streaming(
                chunks, p_chunk, seed0=0, lanes=1024
            ):
                """Config-4 scale: ``chunks`` yield ``[P_chunk*k*L7, NBP]``
                planar secret tensors (or callables ``f(i)``); per-chunk
                combined sums accumulate canonically mod p on device.
                Per-chunk PRNG seeds follow a linear schedule (a
                decorrelation device for benchmarks — host-CSPRNG
                randomness via the ext layouts is the protocol path)."""
                acc = None
                for i, chunk in enumerate(chunks):
                    sec7 = chunk(i) if callable(chunk) else jnp.asarray(chunk)
                    part = _kernel_combined(
                        sec7, jnp.asarray(seed0 + 7919 * i, dtype=jnp.int32),
                        p_chunk, lanes,
                    )
                    acc = part if acc is None else _add_mod_planar(acc, part)
                if acc is None:
                    raise ValueError(
                        "aggregate_mxu_kernel_streaming requires at least one chunk"
                    )
                return _reconstruct_planar16(acc, lanes)

            self.planar7_secrets = _planar7_secrets
            self.planar7_ext = _planar7_ext
            self.aggregate_mxu_kernel = _aggregate_mxu_kernel
            self.mxu_kernel_combined = _kernel_combined
            self.aggregate_mxu_kernel_streaming = _aggregate_mxu_kernel_streaming

            # ------------------------------- byte-limb MXU kernel (gen 4)
            # Base-256 biased-digit generation (sda_tpu/ops/mxu8.py): the
            # HBM stream is the field's information floor (2 bytes per
            # 16-bit limb), randomness accumulates as u16 fields, and the
            # per-lane epilogue amortises over participants — run it with
            # the largest P the int32 accumulator bound admits.
            from sda_tpu.ops.mxu8 import (
                Mxu8Context,
                batched_from_planar_lm,
                fused_share_combine_mxu8,
                planar8_from_batched,
            )

            mxu8 = Mxu8Context.create(self.ctx)
            self.mxu8 = mxu8

            def _planar8_secrets(secrets, lanes=1024):
                """``[P, nb, k, L16] u32 -> [P*k*L8, NBP] int8`` biased."""
                return planar8_from_batched(mxu8, secrets, lanes)

            def _planar8_ext(ext, lanes=1024):
                """Caller-randomness layout: ``[P, nb, k+r, L16] -> planar``."""
                return planar8_from_batched(mxu8, ext, lanes)

            @partial(jax.jit, static_argnums=(2, 3))
            def _kernel8_step(sec8, seed, p_count, lanes):
                rec = fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, sec8, p_count, k_, r_,
                    seed=seed, lanes=lanes,
                    reconstruct_matrix=spec.reconstruct_matrix,
                )
                return batched_from_planar_lm(rec, self.nb, k_)

            @partial(jax.jit, static_argnums=(2, 3))
            def _kernel8_raw(sec8, seed, p_count, lanes):
                # untruncated limb-major output [L*k, NBP] — the lane-batch
                # serving entry point splits it per job
                return fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, sec8, p_count, k_, r_,
                    seed=seed, lanes=lanes,
                    reconstruct_matrix=spec.reconstruct_matrix,
                )

            @partial(jax.jit, static_argnums=(2, 3))
            def _kernel8_raw_rp1(sec8, seed, p_count, lanes):
                # combined-draw serving mode: one equivalent randomness
                # draw per slot (see aggregate_mxu8_kernel_jobs)
                return fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, sec8, p_count, k_, r_,
                    seed=seed, lanes=lanes,
                    reconstruct_matrix=spec.reconstruct_matrix,
                    rand_participants=1,
                )

            self._kernel8_raw = _kernel8_raw
            self._kernel8_raw_rp1 = _kernel8_raw_rp1

            def _aggregate_mxu8_kernel(sec8, seed, p_count, lanes=1024):
                """Full share+combine+reconstruct in ONE byte-limb kernel
                dispatch; ``sec8`` from :meth:`planar8_secrets`; returns
                ``[nb, k, L16]``."""
                return _kernel8_step(
                    sec8, jnp.asarray(seed, dtype=jnp.int32), p_count, lanes
                )

            @partial(jax.jit, static_argnums=(2, 3))
            def _kernel8_combined(sec8, seed, p_count, lanes):
                return fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, sec8, p_count, k_, r_,
                    seed=seed, lanes=lanes,
                )

            @partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1,))
            def _kernel8_combined_acc(sec8, acc, seed, p_count, lanes):
                # accumulate-in-kernel streaming step: acc is donated (the
                # pallas call aliases it to the output buffer)
                return fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, sec8, p_count, k_, r_,
                    seed=seed, lanes=lanes, acc_in=acc,
                )

            @partial(jax.jit, static_argnums=(1,))
            def _reconstruct_planar8(comb, lanes):
                # [L16*n, NBP] u32 canonical -> [nb, k, L16] via the kernel
                # (reconstruction = the same modular matmul, p_count=1,
                # slots=n, no randomness)
                L = self.ctx.L
                bytes_ = [
                    (
                        (
                            (comb[(j // 2) * n_ : (j // 2 + 1) * n_] >> (8 * (j % 2)))
                            & 0xFF
                        )
                        ^ 0x80
                    ).astype(jnp.int8)
                    for j in range(mxu8.L8)
                ]
                # rows must be slot-major (i, j): [n, L8, NBP]
                c8 = jnp.stack(bytes_, axis=1).reshape(n_ * mxu8.L8, -1)
                rec = fused_share_combine_mxu8(
                    mxu8, spec.reconstruct_matrix, c8, 1, n_, 0, lanes=lanes,
                )
                return batched_from_planar_lm(rec, self.nb, k_)

            def _aggregate_mxu8_kernel_streaming(
                chunks, p_chunk, seed0=0, lanes=1024
            ):
                """Config-4 scale on the byte-limb kernel: ``chunks`` yield
                ``[P_chunk*k*L8, NBP]`` planar tensors (or callables
                ``f(i)``); canonical per-clerk sums accumulate mod p.
                Per-chunk PRNG seed stride is the lane-block grid size, so
                chunk i block t and chunk j block u never share a seed
                (benchmark decorrelation — host-CSPRNG ext layouts are the
                protocol path)."""
                acc = None
                grid_size = None
                for i, chunk in enumerate(chunks):
                    sec8 = chunk(i) if callable(chunk) else jnp.asarray(chunk)
                    if grid_size is None:
                        grid_size = sec8.shape[-1] // lanes
                    seed_i = jnp.asarray(seed0 + grid_size * i, dtype=jnp.int32)
                    if acc is None:
                        acc = _kernel8_combined(sec8, seed_i, p_chunk, lanes)
                    else:
                        # accumulate inside the kernel (acc aliased to the
                        # output): one launch per chunk, no separate add,
                        # no extra accumulator HBM round trip
                        acc = _kernel8_combined_acc(
                            sec8, acc, seed_i, p_chunk, lanes
                        )
                if acc is None:
                    raise ValueError(
                        "aggregate_mxu8_kernel_streaming requires at least one chunk"
                    )
                return _reconstruct_planar8(acc, lanes)

            @partial(jax.jit, static_argnums=(2, 3, 4))
            def _kernel8_chunked(sec8_stacked, seed, n_chunks, p_chunk, lanes):
                rec = fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, sec8_stacked, p_chunk, k_, r_,
                    seed=seed, lanes=lanes, n_chunks=n_chunks,
                    reconstruct_matrix=spec.reconstruct_matrix,
                )
                return batched_from_planar_lm(rec, self.nb, k_)

            def _aggregate_mxu8_kernel_chunked(
                sec8_stacked, n_chunks, p_chunk, seed=0, lanes=1024
            ):
                """Whole multi-chunk job in ONE launch: ``sec8_stacked``
                stacks ``n_chunks`` planar chunks row-wise; the kernel runs
                a (lane_blocks, chunk) reduction grid with a VMEM canonical
                accumulator and fused reconstruction — the single-launch
                form of :meth:`aggregate_mxu8_kernel_streaming` for jobs
                whose stacked chunks fit HBM. Returns ``[nb, k, L16]``."""
                return _kernel8_chunked(
                    sec8_stacked, jnp.asarray(seed, dtype=jnp.int32),
                    n_chunks, p_chunk, lanes,
                )

            self.planar8_secrets = _planar8_secrets
            self.planar8_ext = _planar8_ext
            self.aggregate_mxu8_kernel = _aggregate_mxu8_kernel
            self.mxu8_kernel_combined = _kernel8_combined
            self.aggregate_mxu8_kernel_streaming = _aggregate_mxu8_kernel_streaming
            self.aggregate_mxu8_kernel_chunked = _aggregate_mxu8_kernel_chunked

            @jax.jit
            def _share_mxu(ext):
                """Per-participant canonical shares on the MXU (the protocol
                bulk path: each participant's shares are encrypted and
                uploaded separately, participate.rs:74-101). ``ext``
                [P, nb, k+r, L16] -> [P, nb, n, L16]."""
                P = ext.shape[0]
                e7 = mxu.limbs7_from_16(ext).reshape(P * self.nb, (k_ + r_) * L7)
                out = mxu_modmat(
                    mxu, e7, jnp.asarray(self._big_can), n_, self._cols_can
                )
                return out.reshape(P, self.nb, n_, self.ctx.L)

            self.share_mxu = _share_mxu

    # ------------------------------------------------------ host edges

    def encode_secrets(self, secrets) -> np.ndarray:
        """``[P, d]`` ints -> ``[P, nb, k, L]`` canonical limb tensor
        (zero-padding the tail batch, batched.rs:37-43)."""
        secrets = np.asarray(secrets, dtype=object)
        p_count, d = secrets.shape
        if d != self.dimension:
            raise ValueError("dimension mismatch")
        k = self.spec.secret_count
        padded = np.zeros((p_count, self.nb * k), dtype=object)
        padded[:, :d] = secrets
        return self.ctx.encode(padded.reshape(p_count, self.nb, k))

    def random_ext(self, p_count: int, rng: np.random.Generator | None = None) -> np.ndarray:
        """Host-CSPRNG randomness block ``[P, nb, r, L]`` (protocol path)."""
        from sda_tpu.fields import PrimeField

        f = PrimeField(self.spec.modulus)
        r = f.sample((p_count, self.nb, self.spec.randomness_count), rng=rng)
        return self.ctx.encode(r)

    def decode_output(self, out_limbs) -> np.ndarray:
        """``[nb, k, L]`` -> the revealed ``[d]`` vector (truncating padding,
        batched.rs:94)."""
        vals = self.ctx.decode(np.asarray(out_limbs))
        return vals.reshape(-1)[: self.dimension]

    def decode_shares(self, shares_limbs) -> np.ndarray:
        """``[..., n, L]`` -> object ints (for wire encoding per clerk)."""
        return self.ctx.decode(np.asarray(shares_limbs))

    # ------------------------------------------------- lane-batch serving

    @staticmethod
    def concat_jobs_lanes(planar_jobs):
        """Concatenate same-shape planar jobs along the lane (batch) axis.

        The serving answer for small jobs (docs/SERVING.md): single-launch
        latency is floor-bound (LATENCY_FLOOR.json), but per-lane
        independence makes every job's result exact when many same-scheme
        jobs share one launch. All jobs must have IDENTICAL shapes (same
        participant count, slot layout, and lane padding) — a width
        mismatch would make the uniform per-job split slice across job
        boundaries, so it is rejected here.
        """
        planar_jobs = list(planar_jobs)
        shape = planar_jobs[0].shape
        if any(j.shape != shape for j in planar_jobs):
            raise ValueError("lane-batched jobs must share the planar shape")
        return jnp.concatenate(planar_jobs, axis=1)

    def aggregate_mxu8_kernel_jobs(
        self, sec8_batched, seed, p_count: int, n_jobs: int, lanes: int = 1024,
        combined_randomness: bool = False,
    ):
        """Run ``n_jobs`` lane-concatenated jobs (from
        :meth:`concat_jobs_lanes`) through ONE fused kernel launch and
        return ONE stacked ``[n_jobs, nb, k, L16]`` reveal-ready tensor
        (row ``i`` is job ``i`` — a free reshape + one slice, not
        ``n_jobs`` dispatches; measured: per-job slicing cost 0.3 ms on a
        512-job batch).

        This is the supported way to consume a lane batch: the plain
        ``aggregate_mxu8_kernel`` truncates its output to the first job's
        ``nb`` rows, so its result cannot be split per job.

        ``combined_randomness``: draw ONE equivalent randomness value per
        slot instead of ``p_count`` independent ones — distributionally
        identical for the combined output (a sum of uniforms mod p is
        uniform) and sound within this kernel's fused-combine trust model,
        where per-participant shares never exist; it removes the binding
        PRNG+accumulate stream at small P (LANE_BATCH_FLOOR.json,
        docs/SERVING.md). Leave False for workload-parity benchmarks.
        """
        from sda_tpu.ops.mxu8 import fused_share_combine_mxu8

        nbp_total = sec8_batched.shape[1]
        if nbp_total % n_jobs:
            raise ValueError("batched lane width must divide evenly into jobs")
        nbp_job = nbp_total // n_jobs
        spec = self.spec
        if combined_randomness:
            rec = self._kernel8_raw_rp1(
                sec8_batched, jnp.asarray(seed, jnp.int32), p_count, lanes
            )
        else:
            rec = self._kernel8_raw(sec8_batched, jnp.asarray(seed, jnp.int32),
                                    p_count, lanes)
        # limb-major [L*k, NBP_total] -> [NBP_total, k, L] -> one reshape
        # to [n_jobs, nbp_job, k, L] and ONE truncating slice to nb rows
        k = spec.secret_count
        full = jnp.transpose(rec.reshape(self.ctx.L, k, nbp_total), (2, 1, 0))
        return full.reshape(n_jobs, nbp_job, k, self.ctx.L)[:, : self.nb]
