"""Device ChaCha expansion vs the exact host implementation."""

import numpy as np
import pytest

from sda_tpu import chacha
from sda_tpu.ops.chacha_kernel import chacha_keystream, combine_masks_device, expand_masks_device


def test_keystream_matches_host_core():
    seeds = np.arange(24, dtype=np.uint32).reshape(3, 8)
    got = np.asarray(chacha_keystream(seeds, nblocks=4, rows=1, interpret=True))
    for s in range(3):
        rng = chacha.ChaChaRng(list(seeds[s]))
        expect = [rng.next_u32() for _ in range(4 * 16)]
        assert got[s].reshape(-1).tolist() == expect


def test_keystream_zero_seed_rfc_vector():
    got = np.asarray(chacha_keystream(np.zeros((1, 8), np.uint32), nblocks=1, rows=1, interpret=True))
    assert got[0, 0, :4].tolist() == [0xADE0B876, 0x903DF1A0, 0xE56A5D40, 0x28BD8653]


@pytest.mark.parametrize("modulus", [433, (1 << 31) - 1, (1 << 61) - 1])
def test_expand_masks_matches_host(modulus):
    seeds = [chacha.new_seed(128) for _ in range(5)]
    host = chacha.expand_masks(seeds, dimension=40, modulus=modulus)
    masks, rejects = expand_masks_device(seeds, 40, modulus, rows=1, interpret=True)
    from sda_tpu.ops.limbs import LimbContext

    ctx = LimbContext.create(modulus)
    dev = ctx.decode(np.asarray(masks))
    for s in range(5):
        if int(rejects[s]) == 0:
            assert [int(x) for x in dev[s]] == host[s].tolist()


def test_combine_matches_host_masker():
    from sda_tpu.masking import ChaChaMasker

    modulus, d = 433, 64
    seeds = [chacha.new_seed(128) for _ in range(7)]
    combined, bad = combine_masks_device(seeds, d, modulus, rows=1, interpret=True)
    if not bad:
        masker = ChaChaMasker(modulus, d, 128)
        host = masker.combine([np.array(s, dtype=np.int64) for s in seeds])
        from sda_tpu.fields import positive

        assert [int(x) for x in combined] == positive(host, modulus).tolist()


def test_combine_seed_chunk_streaming_matches_one_pass():
    """The chunked seed-streaming fold (federated scale: masks never all
    materialise) is bit-identical to the one-pass fold, ragged tail chunk
    included."""
    modulus, d = (1 << 61) - 1, 96
    seeds = [chacha.new_seed(128) for _ in range(11)]
    one, bad1 = combine_masks_device(seeds, d, modulus, rows=1, interpret=True,
                                     seed_chunk=len(seeds))
    chunked, bad2 = combine_masks_device(seeds, d, modulus, rows=1,
                                         interpret=True, seed_chunk=4)
    assert bad1 == bad2 == []
    assert [int(x) for x in one] == [int(x) for x in chunked]


@pytest.mark.tpu
def test_fused_fold_matches_host_and_pads_exactly():
    """The federated-scale fused fold kernel (raw-draw limb accumulation,
    v mod p ≡ v congruence, zero HBM intermediates) is bit-identical to
    the host expand+fold — across two seed tiles (padding lanes masked)
    and a ragged dim tile. Real-chip lane (interpret emulation of this
    kernel is impractically slow on CPU, so the dispatch itself excludes
    the CPU backend — pinned below)."""
    import jax

    from sda_tpu.fields import find_special_prime_field, trunc_add_mod

    if jax.default_backend() == "cpu":
        pytest.skip("fused fold kernel runs on real accelerators only")
    p, _, _ = find_special_prime_field(63, 8, 9)
    S, d = 1100, 264  # pads to 2048 seeds / 2 tiles; ragged dim tile
    seeds = [chacha.new_seed(128) for _ in range(S)]
    out, bad = combine_masks_device(seeds, d, p)
    assert bad == []
    host = chacha.expand_masks(seeds, d, p)
    acc = np.zeros(d, dtype=np.int64)
    for row in host:
        acc = trunc_add_mod(acc, row, p)
    assert [int(x) for x in out] == [int(x) for x in acc]


def test_fused_dispatch_skipped_on_cpu():
    """On the CPU backend large-S combines stay on the (tested) chunk
    path — the fused kernel's interpret emulation is impractically slow,
    so the dispatch must never pick it without a real accelerator."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("pin is about the CPU backend")
    from unittest import mock

    from sda_tpu.fields import find_special_prime_field
    from sda_tpu.ops import chacha_kernel as ck

    p, _, _ = find_special_prime_field(63, 8, 9)
    seeds = [chacha.new_seed(128) for _ in range(520)]
    with mock.patch.object(
        ck, "fold_masks_device",
        side_effect=AssertionError("fused path must not run on cpu"),
    ):
        out, bad = ck.combine_masks_device(seeds, 16, p, seed_chunk=None)
    assert len(out) == 16 and bad == []


def test_fused_fold_requires_pseudo_mersenne():
    from sda_tpu.ops.chacha_kernel import fold_masks_device

    with pytest.raises(ValueError, match="pseudo-Mersenne"):
        fold_masks_device([chacha.new_seed(128)], 8, (1 << 62) + 1,
                          interpret=True)


def test_fused_fold_seed_cap_enforced():
    """The kernel's int32 lane reduce bounds one call at 16384 seeds;
    combine_masks_device groups above it (grouping pinned on-chip below)."""
    from sda_tpu.fields import find_special_prime_field
    from sda_tpu.ops.chacha_kernel import fold_masks_device

    p, _, _ = find_special_prime_field(63, 8, 9)
    with pytest.raises(ValueError, match="16384 seeds"):
        fold_masks_device([[0] * 4] * 16385, 8, p, interpret=True)


@pytest.mark.tpu
def test_fused_fold_sub63_bit_modulus_exact():
    """e < 63 pseudo-Mersenne: the 2^64-carry term K = cp*2^(64-e) grows
    to ~2^29, and carry*K to ~2^44 — the r5 self-review found a u32
    multiply silently wrapping here for every e below ~60 (only e = 63
    stayed under the bound, so flagship-prime tests passed). Pins the
    u16-half product fix against the exact host fold."""
    import jax

    from sda_tpu.fields import find_special_prime_field, trunc_add_mod

    if jax.default_backend() == "cpu":
        pytest.skip("fused fold kernel runs on real accelerators only")
    p, _, _ = find_special_prime_field(55, 8, 9)
    assert p.bit_length() == 55 and ((1 << 55) - p) < (1 << 14)
    S, d = 1100, 96
    seeds = [chacha.new_seed(128) for _ in range(S)]
    out, bad = combine_masks_device(seeds, d, p)
    host = chacha.expand_masks(seeds, d, p)
    acc = np.zeros(d, dtype=np.int64)
    for row in host:
        acc = trunc_add_mod(acc, row, p)
    # any rejection-hit seed is fixed up inside (prob ~cp*2^9/2^64 per
    # draw at e=55 — effectively zero here)
    assert [int(x) for x in out] == [int(x) for x in acc]


@pytest.mark.tpu
def test_fused_fold_grouping_above_cap():
    """>16384 seeds split into kernel-bound groups whose canonical partial
    sums fold exactly (overflow-safe host add) — same reveal as the host
    expansion."""
    import jax

    from sda_tpu.fields import find_special_prime_field, trunc_add_mod

    if jax.default_backend() == "cpu":
        pytest.skip("fused fold kernel runs on real accelerators only")
    p, _, _ = find_special_prime_field(63, 8, 9)
    S, d = 16_500, 16  # crosses the 16384 cap -> two groups
    seeds = [chacha.new_seed(128) for _ in range(S)]
    out, bad = combine_masks_device(seeds, d, p)
    assert bad == []
    host = chacha.expand_masks(seeds, d, p)
    acc = np.zeros(d, dtype=np.int64)
    for row in host:
        acc = trunc_add_mod(acc, row, p)
    assert [int(x) for x in out] == [int(x) for x in acc]


def test_even_modulus_rejected():
    with pytest.raises(ValueError):
        expand_masks_device([[1, 2, 3, 4]], 8, 256, interpret=True)
