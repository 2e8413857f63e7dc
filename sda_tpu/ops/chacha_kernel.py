"""On-device ChaCha mask expansion (bit-exact rand-0.3 streams).

The recipient-side hot path for the ChaCha masking scheme re-expands every
participant's uploaded seed into a full d-dim mask and folds them
(/root/reference/client/src/crypto/masking/chacha.rs:56-77). At federated
scale (10k+ participants x 1M dim) that is ~10^10 keystream words — a
device workload.

Pipeline:

1. Pallas kernel: ChaCha20 keystream blocks, vectorised so each of the 16
   state words is a ``[rows, 128]`` lane array over (seed, block) pairs —
   pure u32 add/xor/rotate on the VPU, exactly rand 0.3's core (20 rounds,
   128-bit counter in words 12..15, key = seed words zero-padded).
2. XLA epilogue: pair words into 64-bit draws (hi = first word), apply the
   rand-0.3 ``gen_range`` reduction ``v % m`` via exact 16-bit-limb
   Montgomery math, and fold the per-participant masks mod m.
3. Rejection accounting: rand 0.3 *skips* draws in the zone
   ``v >= 2^64 - (2^64 % m)`` (probability ~ m/2^64). The kernel output
   includes a per-seed rejection count; callers re-expand the (expected
   ~zero) affected seeds with the exact host path to stay bit-identical.

Requires an odd modulus for the limb reduction (even moduli fall back to
the host path in :mod:`sda_tpu.chacha`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sda_tpu.ops.limbs import LimbContext

__all__ = ["chacha_keystream", "expand_masks_device", "combine_masks_device"]

_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def _rotl(x, k):
    return (x << k) | (x >> (32 - k))


def _quarter(x, a, b, c, d):
    x[a] = x[a] + x[b]
    x[d] = _rotl(x[d] ^ x[a], 16)
    x[c] = x[c] + x[d]
    x[b] = _rotl(x[b] ^ x[c], 12)
    x[a] = x[a] + x[b]
    x[d] = _rotl(x[d] ^ x[a], 8)
    x[c] = x[c] + x[d]
    x[b] = _rotl(x[b] ^ x[c], 7)


def _chacha_kernel(block_tile, key_ref, out_ref):
    """One program per (block-tile, seed-tile): ``block_tile`` keystream
    blocks for ``rows`` x 128 seeds.

    - ``key_ref``: VMEM ``[8, rows, 128]`` key words (seed tile).
    - ``out_ref``: VMEM ``[block_tile, 16, rows, 128]`` keystream words.
    """
    rows = key_ref.shape[1]
    lane = (rows, 128)
    key = [key_ref[w] for w in range(8)]
    base = pl.program_id(0) * block_tile

    def block(b, carry):
        x = [jnp.full(lane, c, dtype=jnp.uint32) for c in _CONSTANTS]
        x += key
        # 128-bit counter = global block index (words 12..15); < 2^31 here
        counter = (base + b).astype(jnp.uint32)
        x.append(jnp.full(lane, 0, dtype=jnp.uint32) + counter)
        x += [jnp.zeros(lane, dtype=jnp.uint32) for _ in range(3)]
        init = list(x)
        for _ in range(10):  # 20 rounds
            _quarter(x, 0, 4, 8, 12)
            _quarter(x, 1, 5, 9, 13)
            _quarter(x, 2, 6, 10, 14)
            _quarter(x, 3, 7, 11, 15)
            _quarter(x, 0, 5, 10, 15)
            _quarter(x, 1, 6, 11, 12)
            _quarter(x, 2, 7, 8, 13)
            _quarter(x, 3, 4, 9, 14)
        for w in range(16):
            out_ref[b, w] = x[w] + init[w]
        return carry

    jax.lax.fori_loop(0, block_tile, block, 0)


def chacha_keystream(seed_words, nblocks: int, rows: int = 8, block_tile: int = 32,
                     interpret: bool = False):
    """Keystream for many seeds: ``[S, 8]`` u32 keys -> ``[S, nblocks, 16]``.

    Seeds are padded to a multiple of ``rows * 128`` per kernel tile; the
    block axis is tiled by ``block_tile`` to bound VMEM (a
    ``[block_tile, 16, rows, 128]`` output block).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    seeds = jnp.asarray(seed_words, dtype=jnp.uint32)
    s = seeds.shape[0]
    sp = -(-s // (rows * 128)) * rows * 128
    if sp != s:
        seeds = jnp.pad(seeds, ((0, sp - s), (0, 0)))
    nbp = -(-nblocks // block_tile) * block_tile
    # planar: [8, S/128, 128]
    planar = jnp.transpose(seeds, (1, 0)).reshape(8, sp // 128, 128)
    kernel = functools.partial(_chacha_kernel, block_tile)
    out = pl.pallas_call(
        kernel,
        grid=(nbp // block_tile, sp // (rows * 128)),
        in_specs=[
            pl.BlockSpec((8, rows, 128), lambda tb, t: (0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_tile, 16, rows, 128),
            lambda tb, t: (tb, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nbp, 16, sp // 128, 128), jnp.uint32),
        interpret=interpret,
    )(planar)
    # [nbp, 16, S] -> [S, nblocks, 16]
    words = out.reshape(nbp, 16, sp)
    return jnp.transpose(words, (2, 0, 1))[:s, :nblocks]


def _genrange_reduce(ctx: LimbContext, hi, lo):
    """Exact ``(hi * 2^32 + lo) mod p`` on u32 arrays via limb Montgomery.

    Returns the result as an L-lane list of canonical limbs.
    """
    L = ctx.L
    r2 = [np.uint32(w) for w in ctx.r2]
    one = [np.uint32(1)] + [np.uint32(0)] * (L - 1)
    zeros = jnp.zeros_like(hi)
    v4 = [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16]
    if L == 2:
        # v = x1 * R + x0 with R = 2^32: two halves of two limbs each
        x0, x1 = v4[:2], v4[2:]
        a = ctx.mont_mul_lanes(x1, r2)  # x1 * R mod p
        y = ctx.mont_mul_lanes(x0, r2)
        b = ctx.mont_mul_lanes(y, one)  # x0 mod p
        return ctx.add_mod_lanes(a, b)
    if L == 4:
        # v < R = 2^64: reduce directly with two Montgomery multiplies
        y = ctx.mont_mul_lanes(v4, r2)
        return ctx.mont_mul_lanes(y, one)
    # L == 8: p >= 2^64 > v, already canonical
    return v4 + [zeros] * (L - 4)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _expand_masks_jit(ctx, dimension, rows, interpret, seeds):
    nblocks = -(-2 * dimension // 16)
    stream = chacha_keystream(seeds, nblocks, rows=rows, interpret=interpret)
    words = stream.reshape(seeds.shape[0], nblocks * 16)
    hi = words[:, 0::2][:, :dimension]
    lo = words[:, 1::2][:, :dimension]
    # rejection zone: v >= 2^64 - (2^64 mod m)  (rand 0.3 accept test)
    modulus = ctx.p
    zone = ((1 << 64) - ((1 << 64) % modulus)) & ((1 << 64) - 1)
    zone_hi, zone_lo = np.uint32(zone >> 32), np.uint32(zone & 0xFFFFFFFF)
    rejected = (hi > zone_hi) | ((hi == zone_hi) & (lo >= zone_lo))
    reject_counts = jnp.sum(rejected.astype(jnp.int32), axis=1)
    out_lanes = _genrange_reduce(ctx, hi, lo)
    masks = jnp.stack(out_lanes, axis=-1)  # [S, d, L] canonical limbs
    return masks, reject_counts


def expand_masks_device(seed_words, dimension: int, modulus: int, rows: int = 8,
                        interpret: bool = False):
    """Device mask expansion: ``[S]`` seeds -> (masks ``[S, d]`` i64-limb,
    per-seed rejection counts ``[S]``).

    Bit-exact with :func:`sda_tpu.chacha.expand_masks` for every seed whose
    rejection count is zero (callers re-do the rare others on host).
    The full pipeline (kernel + reduction) runs as one jit program.
    """
    if modulus % 2 == 0:
        raise ValueError("device expansion requires an odd modulus")
    interpret = interpret or jax.default_backend() == "cpu"
    ctx = LimbContext.create(modulus)
    seeds = np.asarray(
        [list(w) + [0] * (8 - len(w)) for w in seed_words], dtype=np.uint32
    )
    return _expand_masks_jit(ctx, dimension, rows, interpret, jnp.asarray(seeds))


def combine_masks_device(seed_words, dimension: int, modulus: int, rows: int = 8,
                         interpret: bool = False, fixup_host: bool = True):
    """Recipient-side combine: fold all participants' masks mod m.

    Returns (combined mask ``[d]`` as canonical python ints, list of seed
    indices whose streams hit a gen_range rejection). With ``fixup_host``
    (default) the combined mask is ALREADY exact: the device's no-skip
    masks for just the affected seeds are subtracted and the exact host
    expansion (which skips rejected draws, :mod:`sda_tpu.chacha`) of those
    same seeds is added back — per-bad-seed cost, not an all-seeds redo
    (rejection probability is ~m/2^64 per draw, so ``bad`` is expected
    empty; the fix-up path is pinned by a forced-rejection modulus in
    tests/test_chacha_device.py). With ``fixup_host=False`` the caller
    owns the (device-expansion, no-skip) semantics for the bad seeds.
    """
    ctx = LimbContext.create(modulus)
    masks, rejects = expand_masks_device(
        seed_words, dimension, modulus, rows=rows, interpret=interpret
    )
    combined = ctx.sum_mod(masks, axis=0)
    bad = [int(i) for i in np.nonzero(np.asarray(rejects))[0]]
    out = np.asarray(
        [int(v) for v in ctx.decode(np.asarray(combined))], dtype=object
    )
    if bad and fixup_host:
        from sda_tpu import chacha

        wrong = np.asarray(ctx.decode(np.asarray(masks[np.asarray(bad)])))
        exact = chacha.expand_masks(
            [seed_words[i] for i in bad], dimension, modulus
        )
        for j in range(len(bad)):
            out = (out - np.asarray(wrong[j], dtype=object)
                   + np.asarray(exact[j], dtype=object)) % modulus
    return out, bad
