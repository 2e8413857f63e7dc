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


def test_even_modulus_rejected():
    with pytest.raises(ValueError):
        expand_masks_device([[1, 2, 3, 4]], 8, 256, interpret=True)
