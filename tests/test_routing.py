"""Measured routing policy (sda_tpu/routing.py): decisions pinned against
recorded probe values, masker integration, and the deprecation of bare
``device_bulk_threshold`` direction-forcing (VERDICT r4 weak #5).

Recorded probes:
- the r4 tunneled dev box (BENCH_r04 fullmask_reveal + CROSSOVER.json):
  host fold ~2.5 GB/s aggregate, host->device link ~0.025 GB/s;
- a PCIe-attached production host: link ~16 GB/s.
"""

import numpy as np
import pytest

from sda_tpu.masking import ChaChaMasker, FullMasker
from sda_tpu.routing import Probe, RoutingPolicy, default_policy, set_probe

TUNNEL = Probe(host_fold_gbs=2.5, link_gbs=0.025, device_backend="axon")
PCIE = Probe(host_fold_gbs=2.5, link_gbs=16.0, device_backend="tpu")
NO_DEV = Probe(host_fold_gbs=2.5, link_gbs=None, device_backend=None)
CPU_ONLY = Probe(host_fold_gbs=2.5, link_gbs=40.0, device_backend="cpu")

BULK = 1 << 24  # comfortably above the default floor


def test_fullmask_route_follows_link_vs_fold():
    # slow tunnel: the P x d mask bytes would cross a 0.025 GB/s link --
    # host fold wins (the r4 auto-pessimisation this module removes)
    assert RoutingPolicy(TUNNEL).fullmask_combine(10_000, BULK) == "host"
    # PCIe link outruns the fold: device wins
    assert RoutingPolicy(PCIE).fullmask_combine(10_000, BULK) == "device"
    # no device at all
    assert RoutingPolicy(NO_DEV).fullmask_combine(10_000, BULK) == "host"
    # a cpu "device" is a memcpy measured as a link, never a route target
    assert RoutingPolicy(CPU_ONLY).fullmask_combine(10_000, BULK) == "host"


def test_chacha_route_ignores_link_rate():
    # only seeds cross the link, so even the slow tunnel routes to device
    assert RoutingPolicy(TUNNEL).chacha_combine(10_000, BULK) == "device"
    assert RoutingPolicy(PCIE).chacha_combine(10_000, BULK) == "device"
    # ... but a cpu "device" is not an accelerator
    assert RoutingPolicy(CPU_ONLY).chacha_combine(10_000, BULK) == "host"
    assert RoutingPolicy(NO_DEV).chacha_combine(10_000, BULK) == "host"


def test_clerk_fallback_same_comparison_as_fullmask():
    assert RoutingPolicy(TUNNEL).clerk_fallback_combine(BULK) == "host"
    assert RoutingPolicy(PCIE).clerk_fallback_combine(BULK) == "device"
    assert RoutingPolicy(CPU_ONLY).clerk_fallback_combine(BULK) == "host"
    assert RoutingPolicy(NO_DEV).clerk_fallback_combine(BULK) == "host"


def test_size_floor_keeps_small_jobs_on_host():
    pol = RoutingPolicy(PCIE, bulk_floor=1 << 20)
    assert pol.fullmask_combine(10, 100) == "host"
    assert pol.chacha_combine(10, 100) == "host"
    assert pol.clerk_fallback_combine(1000) == "host"


def test_forced_policies():
    dev = RoutingPolicy.force("device")
    host = RoutingPolicy.force("host")
    assert dev.fullmask_combine(1, 1) == "device"
    assert dev.chacha_combine(1, 1) == "device"
    assert host.fullmask_combine(1 << 20, 1 << 10) == "host"
    assert host.chacha_combine(1 << 20, 1 << 10) == "host"
    with pytest.raises(ValueError):
        RoutingPolicy.force("sideways")


def test_deprecated_threshold_no_longer_forces_direction(monkeypatch):
    """A threshold tuned for clerk bulk must not push Full-mask reveals
    onto a slow link: with the tunnel probe injected, the legacy
    ``device_bulk_threshold=1`` masker stays on the host fold."""
    set_probe(TUNNEL)
    try:
        masker = FullMasker(10_007, device_bulk_threshold=1)
        called = []
        import sda_tpu.engine as engine

        monkeypatch.setattr(
            engine, "device_combine",
            lambda *a, **k: called.append(1) or np.zeros(4, dtype=np.int64),
        )
        rng = np.random.default_rng(0)
        masks = [rng.integers(0, 10_007, size=4, dtype=np.int64) for _ in range(3)]
        out = masker.combine(masks)
        assert not called  # device route not taken on the slow link
        assert out.tolist() == (np.sum(masks, axis=0) % 10_007).tolist()
        # the policy-free default probes lazily and reaches the same answer
        assert default_policy(bulk_floor=1).fullmask_combine(3, 4) == "host"
    finally:
        set_probe(None)


def test_fullmask_device_parity_forced():
    """Forced-device Full-mask combine is bit-identical to the host fold
    (canonical masks, no representative divergence)."""
    p = (1 << 61) - 1
    rng = np.random.default_rng(1)
    masks = [rng.integers(0, p, size=33, dtype=np.int64) for _ in range(9)]
    host = FullMasker(p).combine(masks)
    dev = FullMasker(p, routing=RoutingPolicy.force("device")).combine(masks)
    assert dev.tolist() == host.tolist()


def test_chacha_device_parity_forced_with_rejections():
    """Forced-device ChaCha combine with a modulus chosen to FORCE
    gen_range rejections (m = 2^62 + 1: reject probability ~0.25/draw):
    the per-bad-seed host fix-up must make the device result bit-identical
    to the exact host expansion — no all-seeds redo, no divergence."""
    from sda_tpu import chacha
    from sda_tpu.ops.chacha_kernel import combine_masks_device

    m, d = (1 << 62) + 1, 48
    seeds = [chacha.new_seed(128) for _ in range(6)]
    # prove the modulus actually forces rejections for these seeds
    _, bad = combine_masks_device(seeds, d, m, rows=1, interpret=True,
                                  fixup_host=False)
    assert bad, "modulus was supposed to force gen_range rejections"
    dev_m = ChaChaMasker(m, d, 128, routing=RoutingPolicy.force("device"))
    host_m = ChaChaMasker(m, d, 128)
    seeds_i64 = [np.array(s, dtype=np.int64) for s in seeds]
    got = dev_m.combine(seeds_i64)
    want = host_m.combine(seeds_i64)
    assert got.tolist() == want.tolist()


def test_probe_env_override(monkeypatch):
    set_probe(None)
    monkeypatch.setenv("SDA_HOST_FOLD_GBS", "2.5")
    monkeypatch.setenv("SDA_LINK_GBS", "16.0")
    try:
        from sda_tpu import routing

        probe = routing.current_probe()
        assert probe.source == "env"
        assert probe.link_gbs == 16.0 and probe.host_fold_gbs == 2.5
        assert RoutingPolicy(probe).fullmask_combine(10_000, BULK) == "device"
    finally:
        set_probe(None)


def test_probe_env_fold_only_still_measures_link(monkeypatch):
    """Pinning only the fold rate must NOT imply 'no accelerator': the
    link is still probed (on this CPU test host that honestly yields no
    device — but via measurement, not assumption)."""
    set_probe(None)
    monkeypatch.setenv("SDA_HOST_FOLD_GBS", "2.5")
    monkeypatch.delenv("SDA_LINK_GBS", raising=False)
    try:
        from sda_tpu import routing

        measured = []
        real = routing._measure_link
        monkeypatch.setattr(
            routing, "_measure_link",
            lambda *a, **k: measured.append(1) or real(*a, **k),
        )
        probe = routing.current_probe()
        assert measured, "_measure_link was not called for a fold-only config"
        assert probe.host_fold_gbs == 2.5
    finally:
        set_probe(None)
