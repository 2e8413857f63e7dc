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
        compiler_params=pltpu.CompilerParams(
            # the 16 MB scoped-VMEM default strangles Mosaic's buffering
            # (lifting it was a 3.8x unlock on the fused fold kernel)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
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


def _chacha_fold_kernel(block_tile, n_seed_tiles, zone_hi, zone_lo,
                        key_ref, mask_ref, out_ref, rej_ref, acc_ref):
    """Fused keystream + draw-limb accumulation: NO HBM intermediates.

    Grid ``(dim_tiles, seed_tiles)``, seed axis innermost. Each step
    computes ``block_tile`` keystream blocks for one 1,024-seed tile and
    accumulates the raw 64-bit draws' four u16 limbs into a VMEM scratch
    ``[block_tile*8 dims, 4, 8, 128]`` — the combine is mod p, and
    ``v mod p ≡ v``, so summing RAW draws and reducing once at the end is
    congruent to summing ``v mod p`` per draw (the per-draw reduction the
    seed-chunk path pays is pure overhead here). At the last seed tile the
    lane axes reduce (sums < n_seeds * 2^16 < 2^32) and the ``[dims, 4]``
    u32 limb sums emit. Rejection-zone hits accumulate per seed lane in
    ``rej_ref`` (constant block: lives in VMEM until the kernel ends).
    ``mask_ref`` zeroes the padding seed lanes.
    """
    t = pl.program_id(0)
    c = pl.program_id(1)
    lane = (8, 128)
    key = [key_ref[w] for w in range(8)]
    m = mask_ref[0]  # [8, 128] u32: 0xFFFFFFFF for real seeds, 0 for pad

    @pl.when((t == 0) & (c == 0))
    def _init_rej():
        rej_ref[...] = jnp.zeros_like(rej_ref)

    @pl.when(c == 0)
    def _init_acc():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rej = jnp.zeros(lane, dtype=jnp.uint32)
    zh = jnp.uint32(zone_hi)
    zl = jnp.uint32(zone_lo)

    def block(b, rej):
        x = [jnp.full(lane, cst, dtype=jnp.uint32) for cst in _CONSTANTS]
        x += key
        counter = (t * block_tile + b).astype(jnp.uint32)
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
        limbs = [[], [], [], []]
        for j in range(8):  # 8 draws per block: hi = word 2j, lo = word 2j+1
            hi = (x[2 * j] + init[2 * j]) & m
            lo = (x[2 * j + 1] + init[2 * j + 1]) & m
            limbs[0].append(lo & 0xFFFF)
            limbs[1].append(lo >> 16)
            limbs[2].append(hi & 0xFFFF)
            limbs[3].append(hi >> 16)
            rejected = (hi > zh) | ((hi == zh) & (lo >= zl))
            rej = rej + (rejected.astype(jnp.uint32) & m & 1)
        sl = pl.ds(b * 8, 8)
        for limb in range(4):
            acc_ref[sl, limb] = acc_ref[sl, limb] + jnp.stack(limbs[limb])
        return rej

    rej = jax.lax.fori_loop(0, block_tile, block, rej)
    rej_ref[c] = rej_ref[c] + rej

    @pl.when(c == n_seed_tiles - 1)
    def _emit():
        # fold the sublane axis with explicit adds (multi-axis vector
        # reductions have no Mosaic lowering); the 128-lane reduction
        # happens in XLA outside the kernel on the [d, 4, 128] output
        # (~2 GB of extra HBM traffic, ~5 ms — noise at this scale)
        v = acc_ref[...]  # [dims_tile, 4, 8, 128]
        s = v[:, :, 0, :]
        for q in range(1, 8):
            s = s + v[:, :, q, :]
        out_ref[...] = s


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _fold_masks_jit(dimension, modulus, n_seed_tiles, interpret, block_tile,
                    seeds_planar, lane_mask):
    dims_tile = block_tile * 8
    n_dim_tiles = -(-dimension // dims_tile)
    d_pad = n_dim_tiles * dims_tile
    zone = ((1 << 64) - ((1 << 64) % modulus)) & ((1 << 64) - 1)
    kernel = functools.partial(
        _chacha_fold_kernel, block_tile, n_seed_tiles,
        np.uint32(zone >> 32), np.uint32(zone & 0xFFFFFFFF),
    )
    lane_partials, rejects = pl.pallas_call(
        kernel,
        grid=(n_dim_tiles, n_seed_tiles),
        in_specs=[
            pl.BlockSpec((8, 8, 128), lambda t, c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((dims_tile, 4, 128), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seed_tiles, 8, 128), lambda t, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_pad, 4, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_seed_tiles, 8, 128), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((dims_tile, 4, 8, 128), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seeds_planar, lane_mask)
    # per-(dim, limb, lane) partials < n_seeds * 2^16 < 2^31: signed sum
    # is exact
    limb_sums = jnp.sum(lane_partials.astype(jnp.int32), axis=2).astype(
        jnp.uint32
    )

    # finalize: limb sums (each < 2^32) -> canonical value mod the
    # pseudo-Mersenne p = 2^e - c via carry propagation + one fold
    e = modulus.bit_length()
    cp = (1 << e) - modulus
    l16 = []
    carry = jnp.zeros_like(limb_sums[:, 0])
    for j in range(4):
        tt = limb_sums[:, j] + carry
        l16.append(tt & 0xFFFF)
        carry = tt >> 16
    # value = l16[0..3] + carry*2^64; K = 2^64 mod p = cp * 2^(64-e) is
    # < 2^32 for every 4-limb pseudo-Mersenne this path accepts (e >= 49
    # -> p > K), and with the 16384-seed cap limb sums are < 2^30 so
    # carry < 2^15. carry*K can still reach ~2^47, far past u32 — compute
    # it as two u16-half products and carry-propagate into u16 limbs
    # (every intermediate < 2^31; a direct u32 multiply silently wrapped
    # for e < ~60, caught in the r5 self-review).
    K = cp * (1 << (64 - e))
    p_lo = carry * jnp.uint32(K & 0xFFFF)  # < 2^15 * 2^16 = 2^31
    p_hi = carry * jnp.uint32(K >> 16)  # < 2^31
    e0 = p_lo & 0xFFFF
    r1 = (p_lo >> 16) + (p_hi & 0xFFFF)
    e1 = r1 & 0xFFFF
    r2 = (r1 >> 16) + (p_hi >> 16)
    ev = [e0, e1, r2 & 0xFFFF, r2 >> 16]
    # fold bits >= e of the 64-bit part: hi = value64 >> e (at e=63: 1 bit
    # from l16[3] top) -> + hi*cp
    from sda_tpu.ops.limbs import LimbContext

    ctx = LimbContext.create(modulus)
    lanes = [l16[0], l16[1], l16[2], l16[3]]
    summed = ctx.add_mod_lanes(_fold_e_bits(ctx, lanes, e, cp),
                               _fold_e_bits(ctx, ev, e, cp))
    return jnp.stack(summed, axis=-1)[:dimension], rejects


def _fold_e_bits(ctx, lanes, e, cp):
    """Canonicalise a 4-u16-limb value < 2^64 mod p = 2^e - cp (e <= 63):
    two rounds of ``lo + cp * hi`` then a conditional subtract."""
    zero = jnp.zeros_like(lanes[0])
    wE, sh = e // 16, e % 16
    for _ in range(2):
        hi = lanes[wE] >> sh
        bits = 16 - sh
        for w in range(wE + 1, 4):
            hi = hi | (lanes[w] << bits)
            bits += 16
        lanes = lanes[:wE] + [lanes[wE] & ((1 << sh) - 1)]
        lanes += [zero] * (4 - len(lanes))
        add = hi * jnp.uint32(cp)  # hi < 2^(64-e+16) small; cp small
        incoming = (add & 0xFFFF, add >> 16)
        carry = zero
        for w in range(4):
            t = lanes[w] + (incoming[w] if w < 2 else zero) + carry
            lanes[w] = t & 0xFFFF
            carry = t >> 16
    return ctx._cond_sub(lanes, zero)


def fold_masks_device(seed_words, dimension: int, modulus: int,
                      interpret: bool = False, block_tile: int = 32):
    """Fused federated-scale ChaCha mask fold for pseudo-Mersenne moduli.

    ``[S]`` seeds -> (combined canonical limb array ``[d, L16=4]`` u32 on
    device, per-seed rejection counts ``[S]``). The keystream, draw
    pairing, and the seed-fold all happen inside ONE Pallas kernel with
    full (8, 128) seed vregs and no HBM intermediates — the ~16 bytes/draw
    the seed-chunk path streams through HBM never exist. Requires
    ``p = 2^e - c`` with ``e <= 63`` (the flagship field family,
    fields.find_special_prime_field); callers fall back to
    :func:`combine_masks_device`'s chunk path otherwise.
    """
    from sda_tpu.ops.limbs import LimbContext

    e = modulus.bit_length()
    cp = (1 << e) - modulus
    if (e > 63 or cp >= (1 << 14) or modulus % 2 == 0
            or LimbContext.create(modulus).L != 4):
        raise ValueError("fold_masks_device requires an odd pseudo-Mersenne "
                         "modulus with e <= 63 (4 u16 limbs)")
    interpret = interpret or jax.default_backend() == "cpu"
    S = len(seed_words)
    # exactness bound: the emit-time lane reduction runs in int32, so the
    # per-(dim, limb) sum S * 0xFFFF must stay < 2^31 -> S < 32768. The
    # caller-facing cap is 16384 (one pad granule of headroom); larger
    # seed sets are grouped in combine_masks_device.
    if S > 16384:
        raise ValueError("fold_masks_device caps at 16384 seeds per call "
                         "(int32 lane-reduce bound); group larger sets")
    s_pad = -(-S // 1024) * 1024
    seeds = np.zeros((s_pad, 8), dtype=np.uint32)
    for i, w in enumerate(seed_words):
        seeds[i, : min(8, len(w))] = [int(np.uint32(x)) for x in w[:8]]
    planar = np.ascontiguousarray(
        seeds.T.reshape(8, s_pad // 128, 128)
    )
    mask = np.zeros(s_pad, dtype=np.uint32)
    mask[:S] = 0xFFFFFFFF
    lane_mask = mask.reshape(s_pad // 1024, 8, 128)
    limbs, rejects = _fold_masks_jit(
        dimension, modulus, s_pad // 1024, interpret, block_tile,
        jnp.asarray(planar), jnp.asarray(lane_mask),
    )
    rej = np.asarray(rejects).reshape(-1)[:S]
    return limbs, rej


def combine_masks_device(seed_words, dimension: int, modulus: int,
                         rows: int | None = None, interpret: bool = False,
                         fixup_host: bool = True,
                         seed_chunk: int | None = None):
    """Recipient-side combine: fold all participants' masks mod m.

    Seeds stream through the device in ``seed_chunk``-sized blocks (sized
    so the per-chunk keystream + mask intermediates stay ~2 GB — at
    federated scale, 10k seeds x 1M dim is 80+ GB of masks that must
    never exist at once; only the running ``[d, L]`` canonical sum does).

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
    S = len(seed_words)
    if S == 0:
        return np.zeros(dimension, dtype=object), []
    e = modulus.bit_length()
    cp = (1 << e) - modulus
    if (seed_chunk is None and rows is None and S >= 512
            and e <= 63 and cp < (1 << 14) and modulus % 2 == 1
            and ctx.L == 4
            and not interpret and jax.default_backend() != "cpu"):
        # federated scale on the flagship pseudo-Mersenne field: the fused
        # fold kernel (full seed vregs, zero HBM intermediates) replaces
        # the chunked expand+sum pipeline. Groups of <=16384 seeds respect
        # the kernel's int32 lane-reduce bound; group results fold via the
        # overflow-safe host add (canonical operands < 2^63).
        from sda_tpu.fields import trunc_add_mod

        group = 16384
        out = None
        bad = []
        for start in range(0, S, group):
            chunk_words = seed_words[start : start + group]
            limbs, rej = fold_masks_device(
                chunk_words, dimension, modulus, interpret=interpret
            )
            bad.extend(start + int(i) for i in np.nonzero(rej)[0])
            # canonical < 2^63 on this path: vectorised int64 limb
            # recombine (a python-int decode of a 1M-dim vector costs
            # seconds of host time — visible in the chacha_reveal row)
            la = np.asarray(limbs).astype(np.int64)
            part = (la[:, 0] | (la[:, 1] << 16) | (la[:, 2] << 32)
                    | (la[:, 3] << 48))
            out = part if out is None else trunc_add_mod(out, part, modulus)
        if bad and fixup_host:
            from sda_tpu import chacha

            wrong = chacha.expand_masks_noskip(
                [seed_words[i] for i in bad], dimension, modulus
            )
            exact = chacha.expand_masks(
                [seed_words[i] for i in bad], dimension, modulus
            )
            # python-int object arithmetic: the intermediate sums cross
            # 2^63, so int64 element types would silently wrap
            o = np.array(out.tolist(), dtype=object)
            for j in range(len(bad)):
                o = (o - np.array(wrong[j].tolist(), dtype=object)
                     + np.array(exact[j].tolist(), dtype=object)) % modulus
            return o, bad
        return out, bad
    if seed_chunk is None:
        # keep the [chunk, d, L] mask block (the largest intermediate)
        # around 2 GB; kernel seed tiles are rows*128 wide
        budget = 2 * 10**9
        seed_chunk = max(128, budget // max(1, dimension * 4 * ctx.L))
    seed_chunk = min(seed_chunk, max(1, S))
    if rows is None:
        rows = max(1, min(8, seed_chunk // 128))
    acc = None
    bad: list[int] = []
    wrong_rows: list[np.ndarray] = []
    for start in range(0, S, seed_chunk):
        block = seed_words[start : start + seed_chunk]
        masks, rejects = expand_masks_device(
            block, dimension, modulus, rows=rows, interpret=interpret
        )
        partial = ctx.sum_mod(masks, axis=0)
        acc = partial if acc is None else ctx.add_mod(acc, partial)
        for i in np.nonzero(np.asarray(rejects))[0]:
            bad.append(start + int(i))
            if fixup_host:
                wrong_rows.append(np.asarray(masks[int(i)]))
    out = np.asarray(
        [int(v) for v in ctx.decode(np.asarray(acc))], dtype=object
    )
    if bad and fixup_host:
        from sda_tpu import chacha

        exact = chacha.expand_masks(
            [seed_words[i] for i in bad], dimension, modulus
        )
        for j in range(len(bad)):
            wrong = np.asarray(ctx.decode(wrong_rows[j]), dtype=object)
            out = (out - wrong + np.asarray(exact[j], dtype=object)) % modulus
    return out, bad
