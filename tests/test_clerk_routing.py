"""Size-aware clerk combine routing (clerk.rs:63-107, FIXME at 71-72).

Pins SdaClient.process_clerking_job's three routes and their agreement:

- no ``device_bulk_threshold``: the reference's sequential
  decrypt-then-signed-fold, bit-for-bit;
- bulk below ``DEVICE_COMBINE_CROSSOVER`` elements: ONE fused native
  open+combine call (ShareDecryptor.open_combine);
- bulk above the crossover: streamed decrypt + device_combine.

All three reveal identically after ``positive()``.
"""

import numpy as np
import pytest

import sda_tpu.client as client_mod
from sda_tpu import protocol as proto
from sda_tpu.client.crypto import ShareDecryptor
from sda_tpu.fields import positive

from .fixtures import make_client, with_service


def _setup_job(service, participants=4, dimension=6):
    recipient = make_client(service)
    rk = recipient.new_encryption_key()
    recipient.upload_agent()
    recipient.upload_encryption_key(rk)
    agg = proto.Aggregation(
        id=proto.new_id(),
        title="routing",
        vector_dimension=dimension,
        modulus=433,
        recipient=recipient.agent.id,
        recipient_key=rk,
        masking_scheme=proto.NoMasking(),
        committee_sharing_scheme=proto.AdditiveSharing(share_count=3, modulus=433),
    )
    recipient.upload_aggregation(agg)
    clerks = [make_client(service) for _ in range(3)]
    for c in clerks:
        key = c.new_encryption_key()
        c.upload_agent()
        c.upload_encryption_key(key)
    recipient.begin_aggregation(agg.id)
    for i in range(participants):
        p = make_client(service)
        p.upload_agent()
        p.participate(np.arange(dimension) + i, agg.id)
    recipient.end_aggregation(agg.id)
    # the recipient's key is also a committee candidate, so not every clerk
    # necessarily made the committee — take the first one holding a job
    for clerk in clerks:
        job = clerk.service.get_clerking_job(clerk.agent, clerk.agent.id)
        if job is not None:
            return clerk, job, agg
    raise AssertionError("no clerk received a job")


def _spy(monkeypatch, clerk):
    calls = {"fused": 0, "device": 0}
    real_fused = ShareDecryptor.open_combine

    def spy_fused(self, encs, modulus, dim, workers=None):
        calls["fused"] += 1
        return real_fused(self, encs, modulus, dim, workers)

    def spy_device(modulus, share_vectors, chunk_size=256):
        calls["device"] += 1
        # avoid requiring an accelerator in this unit test: exact host fold
        acc = None
        for v in share_vectors:
            v = np.asarray(v, dtype=np.int64) % modulus
            acc = v if acc is None else (acc + v) % modulus
        return acc

    monkeypatch.setattr(ShareDecryptor, "open_combine", spy_fused)
    import sda_tpu.engine

    monkeypatch.setattr(sda_tpu.engine, "device_combine", spy_device)
    return calls


def test_routing_sequential_by_default(monkeypatch):
    with with_service("memory") as service:
        clerk, job, agg = _setup_job(service)
        calls = _spy(monkeypatch, clerk)
        clerk.device_bulk_threshold = None
        result = clerk.process_clerking_job(job)
        assert calls == {"fused": 0, "device": 0}
        assert result.job == job.id


def test_routing_fused_below_crossover(monkeypatch):
    with with_service("memory") as service:
        clerk, job, agg = _setup_job(service)
        calls = _spy(monkeypatch, clerk)
        clerk.device_bulk_threshold = 1
        seq = clerk.process_clerking_job(job)
        assert calls["fused"] == 1 and calls["device"] == 0


def test_routing_device_fallback_without_native_above_crossover(monkeypatch):
    """The streamed-device route is the no-native fallback for big jobs:
    fused is always preferred when available (CROSSOVER.json showed it
    winning at every size), so the device fires only when open_combine
    cannot run."""
    with with_service("memory") as service:
        clerk, job, agg = _setup_job(service)
        calls = _spy(monkeypatch, clerk)
        monkeypatch.setattr(
            ShareDecryptor, "open_combine",
            lambda self, encs, modulus, dim, workers=None: None,
        )
        clerk.device_bulk_threshold = 1
        monkeypatch.setattr(client_mod, "DEVICE_COMBINE_CROSSOVER", 10)
        clerk.process_clerking_job(job)
        assert calls["device"] == 1


def test_routing_fused_preferred_even_above_crossover(monkeypatch):
    with with_service("memory") as service:
        clerk, job, agg = _setup_job(service)
        calls = _spy(monkeypatch, clerk)
        clerk.device_bulk_threshold = 1
        monkeypatch.setattr(client_mod, "DEVICE_COMBINE_CROSSOVER", 10)
        clerk.process_clerking_job(job)
        assert calls["fused"] == 1 and calls["device"] == 0


def test_fused_combine_congruent_to_sequential_fold():
    """The fused route's canonical combine equals the sequential signed fold
    after ``positive()`` — representatives may differ, field elements not."""
    with with_service("memory") as service:
        clerk, job, agg = _setup_job(service)
        agg_obj = clerk.service.get_aggregation(clerk.agent, job.aggregation)
        decryptor = clerk.crypto.new_share_decryptor(
            next(
                key
                for cid, key in clerk.service.get_committee(
                    clerk.agent, job.aggregation
                ).clerks_and_keys
                if cid == clerk.agent.id
            ),
            agg_obj.committee_encryption_scheme,
        )
        vecs = [decryptor.decrypt(e) for e in job.encryptions]
        from sda_tpu.sharing import AdditiveScheme

        seq = AdditiveScheme(share_count=3, modulus=433).combine(vecs)
        fused = decryptor.open_combine(job.encryptions, 433, len(vecs[0]))
        if fused is None:
            pytest.skip("native library unavailable")
        assert positive(seq, 433).tolist() == fused.tolist()


def test_bulk_routing_falls_back_without_native(monkeypatch):
    """With the native library unavailable, the bulk route degrades to the
    sequential decrypt+fold instead of failing (open_combine returns None)."""
    import sda_tpu.utils.varint as varint_mod

    with with_service("memory") as service:
        clerk, job, agg = _setup_job(service)
        monkeypatch.setattr(varint_mod, "_NATIVE", None)
        clerk.device_bulk_threshold = 1
        result = clerk.process_clerking_job(job)
        assert result.job == job.id


def test_streamed_decrypt_rejects_uniformly_wrong_length():
    """A job where EVERY share vector has the wrong (but self-consistent)
    length must fail on the device route too: the scheme-derived
    expected_len is enforced, not just cross-vector consistency."""
    from sda_tpu import sodium
    from sda_tpu.client import _streamed_decrypt
    from sda_tpu.client.crypto import ShareDecryptor
    from sda_tpu.utils.errors import Invalid
    from sda_tpu.utils.varint import encode_varints

    ek, dk = sodium.box_keypair()
    encs = [
        proto.Encryption(data=sodium.seal(encode_varints(np.arange(9, dtype=np.int64)), ek))
        for _ in range(4)
    ]
    dec = ShareDecryptor(ek, dk)
    with pytest.raises(Invalid, match="Wrong dimension"):
        list(_streamed_decrypt(dec, encs, expected_len=8, chunk=2))
    # and the honest length passes
    assert len(list(_streamed_decrypt(dec, encs, expected_len=9, chunk=2))) == 4
