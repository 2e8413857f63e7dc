"""Client crypto module: key management, sealed boxes, signatures, schemes.

The CryptoModule factory equivalent
(/root/reference/client/src/crypto/mod.rs:58-66): constructs maskers, share
generators/combiners/reconstructors, encryptors/decryptors and signing
helpers from the scheme descriptors carried inside an Aggregation.
"""

from __future__ import annotations

import numpy as np

from sda_tpu import protocol as proto
from sda_tpu import sodium
from sda_tpu.masking import masker_for_scheme
from sda_tpu.utils.errors import Invalid
from sda_tpu.utils.varint import decode_varints, encode_varints

__all__ = ["Keystore", "CryptoModule", "ShareEncryptor", "ShareDecryptor"]


class Keystore:
    """Key storage over a client store (crypto/mod.rs:38-52).

    Encryption keypairs are stored as ``{"ek": b64, "dk": b64}`` and
    signature keypairs as ``{"vk": b64, "sk": b64}``, keyed by key id.
    """

    def __init__(self, store):
        self.store = store

    def put_encryption_keypair(self, key_id: str, ek: bytes, dk: bytes) -> None:
        self.store.put(f"ekey:{key_id}", {"ek": ek.hex(), "dk": dk.hex()})

    def get_encryption_keypair(self, key_id: str):
        obj = self.store.get(f"ekey:{key_id}")
        if obj is None:
            return None
        return bytes.fromhex(obj["ek"]), bytes.fromhex(obj["dk"])

    def put_signature_keypair(self, key_id: str, vk: bytes, sk: bytes) -> None:
        self.store.put(f"skey:{key_id}", {"vk": vk.hex(), "sk": sk.hex()})

    def get_signature_keypair(self, key_id: str):
        obj = self.store.get(f"skey:{key_id}")
        if obj is None:
            return None
        return bytes.fromhex(obj["vk"]), bytes.fromhex(obj["sk"])


class ShareEncryptor:
    """Varint-encode then seal shares for one recipient key (sodium.rs:33-46)."""

    def __init__(self, encryption_key: proto.EncryptionKey):
        self._pk = encryption_key.data

    def encrypt(self, shares) -> proto.Encryption:
        encoded = encode_varints(np.asarray(shares, dtype=np.int64))
        return proto.Encryption(data=sodium.seal(encoded, self._pk))


class ShareDecryptor:
    """Open a sealed box and varint-decode shares (sodium.rs:72-92)."""

    def __init__(self, ek: bytes, dk: bytes):
        self._ek = ek
        self._dk = dk

    def decrypt(self, encryption: proto.Encryption) -> np.ndarray:
        raw = sodium.seal_open(encryption.data, self._ek, self._dk)
        return decode_varints(raw)

    def open_combine(
        self, encryptions, modulus: int, dim: int, workers: int | None = None
    ):
        """Fused clerk combine: open + decode + modular-accumulate in ONE
        native call, never materialising the decoded share matrix
        (native/sealed_batch.cpp — the streaming answer to clerk.rs:71-72).

        Returns the combined vector with canonical ``[0, p)`` representatives
        (protocol-equivalent to the reference's signed fold, same convention
        as :func:`sda_tpu.engine.device_combine`), or ``None`` when the
        native library is unavailable (caller falls back to
        ``decrypt_many`` + ``combine``). ``dim`` is the per-clerk share
        count every box must decode to; a mismatch raises ``Invalid`` like
        the sequential combine's dimension check, a tampered box raises
        ``Invalid`` like ``decrypt`` and a malformed varint stream raises
        ``ValueError`` like ``decode_varints``.
        """
        import ctypes

        fn = _native_fn(
            "sda_sealed_open_combine",
            [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_size_t, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_size_t),
            ],
            ctypes.c_int,
        )
        if fn is None or not (0 < modulus < (1 << 63)):
            return None
        staged = _stage_boxes(encryptions)
        if staged is None:
            # empty job: the additive identity at the declared dimension
            # (the documented contract — a combined dim-length vector)
            return np.zeros(dim, dtype=np.int64)
        blob, offs, count = staged
        combined = np.empty(dim, dtype=np.int64)
        fail = ctypes.c_size_t(0)
        rc = fn(
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
            count, self._ek, self._dk,
            ctypes.c_uint64(modulus),
            combined.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dim,
            _default_workers(workers),
            ctypes.byref(fail),
        )
        if rc == 0:
            return combined
        if rc == -1:
            return None  # libsodium not resolvable: fall back
        if rc == -2:
            raise Invalid("sodium seal_open failure (tampered or wrong key)")
        if rc == -3:
            raise ValueError("malformed varint stream")
        raise Invalid("Wrong dimension")

    def decrypt_many(self, encryptions, workers: int | None = None) -> list:
        """Parallel bulk decryption of a clerking job's share vectors.

        The reference opens every participation's sealed box sequentially
        inside the clerk hot loop (clerk.rs:78-82, with the FIXME at 71-72
        about exactly this). Preferred path: ONE native call
        (native/sealed_batch.cpp) runs seal_open + varint decode for the
        whole job on a C++ thread pool, no per-box interpreter overhead.
        Fallback: a Python thread pool (both halves of decrypt release the
        GIL under ctypes), or the sequential loop below 3 cores where pool
        overhead beats X25519 parallelism. Order is preserved; any tampered
        box raises ``Invalid`` exactly as the sequential path does.
        """
        import os

        encryptions = list(encryptions)
        if len(encryptions) >= 8:
            got = _native_open_batch(encryptions, self._ek, self._dk, workers)
            if got is not None:
                return got
        n_cores = os.cpu_count() or 1
        if len(encryptions) < 8 or (workers or n_cores) <= 2:
            # pool overhead beats X25519 parallelism below ~3 cores
            return [self.decrypt(e) for e in encryptions]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=_default_workers(workers)) as ex:
            return list(ex.map(self.decrypt, encryptions, chunksize=32))


_SEAL_BYTES = 48  # crypto_box_SEALBYTES


def _native_fn(name: str, argtypes, restype):
    """Resolve a libsda_native symbol, setting its ctypes signature once.

    One latch per symbol (kept on this function) so both native entry
    points share the staging/signature plumbing — the next ABI change is
    made in exactly one place.
    """
    from sda_tpu.utils.varint import _NATIVE

    if _NATIVE is None or not hasattr(_NATIVE, name):
        return None
    typed = _native_fn.__dict__.setdefault("_typed", set())
    fn = getattr(_NATIVE, name)
    if name not in typed:
        fn.restype = restype
        fn.argtypes = argtypes
        typed.add(name)
    return fn


def _stage_boxes(encryptions):
    """Contiguous (blob, offsets, count) staging for a list of sealed
    boxes, shared by both native entry points. ``None`` for an empty job."""
    datas = [e.data for e in encryptions]
    if not datas:
        return None
    offs = np.zeros(len(datas) + 1, dtype=np.uintp)
    offs[1:] = np.cumsum([len(d) for d in datas], dtype=np.uint64)
    blob = np.frombuffer(b"".join(datas), dtype=np.uint8)
    return blob, offs, len(datas)


def _default_workers(workers):
    import os

    return workers or min(32, os.cpu_count() or 1)


def _native_open_batch(encryptions, ek: bytes, dk: bytes, workers):
    """Whole-job sealed-box open via native/sealed_batch.cpp, or ``None``
    when the native library (or its libsodium) is unavailable.

    Decoded values land in ONE flat buffer at per-box offsets derived from
    each box's plaintext size (a plaintext byte yields at most one varint),
    so the allocation is bounded by 8x the job's wire size and a single
    oversized box cannot inflate every row.
    """
    import ctypes

    fn = _native_fn(
        "sda_sealed_open_batch",
        [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_size_t, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ],
        ctypes.c_int,
    )
    if fn is None:
        return None
    staged = _stage_boxes(encryptions)
    if staged is None:
        return []
    blob, offs, count = staged
    # per-box output capacity = plaintext bytes (box minus the 48-byte seal)
    out_offs = np.zeros(count + 1, dtype=np.uintp)
    out_offs[1:] = np.cumsum(
        [max(len(e.data) - _SEAL_BYTES, 0) for e in encryptions],
        dtype=np.uint64,
    )
    out = np.empty(int(out_offs[-1]), dtype=np.int64)
    lens = np.empty(count, dtype=np.uintp)
    rc = fn(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        count, ek, dk,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        _default_workers(workers),
    )
    if rc != 0:
        return None
    open_failed = np.uintp((1 << 64) - 1)  # SIZE_MAX
    decode_failed = np.uintp((1 << 64) - 2)  # SIZE_MAX - 1
    result = []
    for i in range(count):
        if lens[i] == open_failed:
            raise Invalid("sodium seal_open failure (tampered or wrong key)")
        if lens[i] == decode_failed:
            raise ValueError("malformed varint stream")
        start = int(out_offs[i])
        result.append(out[start : start + int(lens[i])].copy())
    return result


class CryptoModule:
    def __init__(self, keystore: Keystore):
        self.keystore = keystore

    # ------------------------------------------------------------ keygen

    def new_signature_key(self) -> proto.Labelled:
        """Fresh Ed25519 keypair, stored; returns the labelled public part
        (signing/mod.rs:28-60)."""
        vk, sk = sodium.sign_keypair()
        key_id = proto.new_id()
        self.keystore.put_signature_keypair(key_id, vk, sk)
        return proto.Labelled(id=key_id, body=proto.VerificationKey(vk))

    def new_encryption_key(self) -> str:
        """Fresh X25519 keypair, stored; returns the key id (sodium.rs:95-109)."""
        ek, dk = sodium.box_keypair()
        key_id = proto.new_id()
        self.keystore.put_encryption_keypair(key_id, ek, dk)
        return key_id

    # ----------------------------------------------------------- signing

    def sign_export(self, signer: proto.Agent, key_id: str):
        """Sign the canonical JSON of a labelled encryption key
        (signing/mod.rs:72-103)."""
        pair = self.keystore.get_encryption_keypair(key_id)
        if pair is None:
            return None
        ek, _ = pair
        labelled = proto.Labelled(id=key_id, body=proto.EncryptionKey(ek))
        sig_pair = self.keystore.get_signature_keypair(signer.verification_key.id)
        if sig_pair is None:
            return None
        _, sk = sig_pair
        signature = sodium.sign_detached(proto.canonical(labelled), sk)
        return proto.Signed(
            signature=proto.Signature(signature), signer=signer.id, body=labelled
        )

    @staticmethod
    def signature_is_valid(agent: proto.Agent, signed: proto.Signed) -> bool:
        """Verify signer id + detached signature (signing/mod.rs:106-132)."""
        if signed.signer != agent.id:
            raise Invalid("Agent differs from claimed signer")
        return sodium.verify_detached(
            signed.signature.data,
            proto.canonical(signed.body),
            agent.verification_key.body.data,
        )

    # -------------------------------------------------------- encryption

    def new_share_encryptor(self, encryption_key, scheme) -> ShareEncryptor:
        if not isinstance(scheme, proto.SodiumEncryptionScheme):
            raise Invalid(f"unsupported encryption scheme {scheme!r}")
        return ShareEncryptor(encryption_key)

    def new_share_decryptor(self, key_id: str, scheme) -> ShareDecryptor:
        if not isinstance(scheme, proto.SodiumEncryptionScheme):
            raise Invalid(f"unsupported encryption scheme {scheme!r}")
        pair = self.keystore.get_encryption_keypair(key_id)
        if pair is None:
            raise Invalid("Could not load keypair for decryption")
        return ShareDecryptor(*pair)

    # ----------------------------------------------------------- schemes

    @staticmethod
    def new_secret_masker(scheme, device_bulk_threshold: int | None = None,
                          routing=None):
        return masker_for_scheme(
            scheme, device_bulk_threshold=device_bulk_threshold, routing=routing
        )

    @staticmethod
    def new_share_generator(scheme):
        return scheme.engine()

    @staticmethod
    def new_share_combiner(scheme):
        return scheme.engine()

    @staticmethod
    def new_secret_reconstructor(scheme):
        return scheme.engine()
