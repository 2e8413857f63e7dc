"""Device-time measurement and roofline reporting.

The reference framework ships no tracing or metrics at all (SURVEY.md §5);
this module is the TPU-native observability layer the BASELINE
"speed-of-light per chip" target requires:

- :func:`device_time` measures the *on-device* execution time of a step via
  the JAX profiler trace. Wall-clock timing is untrustworthy on remote /
  tunneled TPU backends: dispatch RTT inflates per-call timing by ~10 ms,
  while execution pipelining and result caching can deflate loop-and-block
  timing to near zero. Device trace events record the real execution span
  of every compiled module, so the number survives both failure modes.
  Every iteration should be fed a fresh seed/input so no execution can be
  deduplicated.
- :func:`roofline` turns (bytes moved, int8 MXU ops, VPU u32 ops) into the
  achieved fraction of each hardware ceiling and names the binding
  resource, so a kernel's distance from speed-of-light is one function
  call away.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import tempfile
import time
from dataclasses import dataclass

__all__ = ["device_time", "roofline", "ChipSpec", "V5E", "detect_chip"]


def device_time(fn, iters: int = 10, warmup: int = 1, _base: int = 2000):
    """Per-step device seconds for ``fn(i)``; falls back to wall clock.

    ``fn`` must accept an integer it folds into the step's seed/inputs so
    every timed execution is distinct (``_base`` offsets the integers so
    nested callers like :func:`device_time_samples` never repeat one).
    Returns ``(seconds, last_output)``.
    """
    import jax

    out = fn(0)
    jax.block_until_ready(out)
    for i in range(warmup):
        out = fn(1000 + i)
    jax.block_until_ready(out)

    d = tempfile.mkdtemp(prefix="sda_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(d):
        for i in range(iters):
            out = fn(_base + i)
        jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / iters

    device_us = _sum_device_events(d)
    return (device_us / 1e6 / iters if device_us else wall), out


def device_time_samples(fn, samples: int = 5, iters: int = 3, warmup: int = 1):
    """Per-step device seconds with run-to-run spread.

    Runs ``samples`` INDEPENDENT profiler traces of ``iters`` steps each
    (the r4 lesson: single-shot numbers through this environment's
    compile-helper/tunnel quirks are untrustworthy — VERDICT r5 #3) and
    returns ``({"median", "min", "max", "n"}, last_output)``. ``fn`` takes
    an integer folded into the step's inputs so no execution dedups.
    """
    import statistics

    import jax

    out = fn(0)
    jax.block_until_ready(out)
    for i in range(warmup):
        out = fn(500 + i)
    jax.block_until_ready(out)
    vals = []
    for s in range(samples):
        dt, out = device_time(fn, iters=iters, warmup=0, _base=1000 * (s + 2))
        vals.append(dt)
    return {
        "median": statistics.median(vals),
        "min": min(vals),
        "max": max(vals),
        "n": samples,
    }, out


def device_breakdown(fn, iters: int = 5):
    """Per-module device milliseconds: ``{event_name: ms_per_iter}``."""
    import jax

    out = fn(0)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="sda_trace_")
    with jax.profiler.trace(d):
        for i in range(iters):
            out = fn(3000 + i)
        jax.block_until_ready(out)
    per = collections.defaultdict(float)
    for tr in glob.glob(d + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(tr) as f:
            data = json.load(f)
        pids = _tpu_pids(data)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and e.get("pid") in pids:
                per[e["name"]] += e.get("dur", 0)
    return {k: v / 1e3 / iters for k, v in sorted(per.items(), key=lambda kv: -kv[1])}


def _tpu_pids(data):
    return {
        e["pid"]
        for e in data.get("traceEvents", [])
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))
    }


def _sum_device_events(trace_dir: str) -> float:
    total = 0.0
    for tr in glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(tr) as f:
            data = json.load(f)
        pids = _tpu_pids(data)
        for e in data.get("traceEvents", []):
            if (
                e.get("ph") == "X"
                and e.get("pid") in pids
                and str(e.get("name", "")).startswith("jit_")
            ):
                total += e.get("dur", 0)
    return total


@dataclass(frozen=True)
class ChipSpec:
    """Peak ceilings of one chip (marketing numbers; derate as measured)."""

    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    int8_tops: float  # MXU int8 throughput, Tops/s
    vpu_gops: float  # VPU 32-bit vector ops, Gops/s (approx)
    prng_gbps: float = 3850.0  # on-core PRNG output, GB/s (measured v5e:
    # one (8,128) u32 vreg per cycle ~= 4 KB x 940 MHz; other chips scaled
    # by clock — secure-aggregation kernels draw multiple random bytes per
    # data byte, so the PRNG is a first-class roofline resource here)


V5E = ChipSpec(
    name="TPU v5e", hbm_gbps=819.0, int8_tops=394.0, vpu_gops=3760.0,
    prng_gbps=3850.0,
)

# Published peaks per generation (int8 = 2x bf16 where the MXU supports it;
# v4 and earlier have no int8 fast path so bf16 peak is used). VPU numbers
# are rough scalings of the v5e figure by ALU count x clock.
_CHIP_SPECS = {
    "v4": ChipSpec(name="TPU v4", hbm_gbps=1228.0, int8_tops=275.0, vpu_gops=4300.0, prng_gbps=4300.0),
    "v5 lite": V5E,
    "v5e": V5E,
    "v5p": ChipSpec(name="TPU v5p", hbm_gbps=2765.0, int8_tops=918.0, vpu_gops=7000.0, prng_gbps=7200.0),
    "v5": ChipSpec(name="TPU v5p", hbm_gbps=2765.0, int8_tops=918.0, vpu_gops=7000.0, prng_gbps=7200.0),
    "v6 lite": ChipSpec(name="TPU v6e", hbm_gbps=1640.0, int8_tops=1836.0, vpu_gops=7400.0, prng_gbps=7600.0),
    "v6e": ChipSpec(name="TPU v6e", hbm_gbps=1640.0, int8_tops=1836.0, vpu_gops=7400.0, prng_gbps=7600.0),
}


def detect_chip() -> ChipSpec:
    """ChipSpec for the attached accelerator (``device_kind`` lookup).

    Longest-matching key in the spec table wins (e.g. "TPU v5 lite" must hit
    "v5 lite", not "v5"). Unknown chips fall back to v5e ceilings with the
    real name preserved, so reported fractions are visibly approximate.
    """
    import jax

    kind = jax.devices()[0].device_kind.lower()
    best = None
    for key, spec in _CHIP_SPECS.items():
        if key in kind and (best is None or len(key) > len(best[0])):
            best = (key, spec)
    if best:
        return best[1]
    from dataclasses import replace

    return replace(V5E, name=f"{kind} (unknown; v5e ceilings)")


def roofline(
    seconds: float,
    hbm_bytes: float = 0.0,
    mxu_int8_ops: float = 0.0,
    vpu_u32_ops: float = 0.0,
    prng_bytes: float = 0.0,
    chip: ChipSpec | None = None,
) -> dict:
    """Achieved fraction of each ceiling + the binding resource.

    ``mxu_int8_ops`` counts multiply-adds as 2 ops (matmul convention).
    ``prng_bytes`` is on-core random output consumed (sharing randomness).
    ``chip=None`` detects the attached chip's ceilings.
    """
    if chip is None:
        chip = detect_chip()
    util = {
        "hbm": hbm_bytes / seconds / 1e9 / chip.hbm_gbps if hbm_bytes else 0.0,
        "mxu_int8": mxu_int8_ops / seconds / 1e12 / chip.int8_tops if mxu_int8_ops else 0.0,
        "vpu": vpu_u32_ops / seconds / 1e9 / chip.vpu_gops if vpu_u32_ops else 0.0,
        "prng": prng_bytes / seconds / 1e9 / chip.prng_gbps if prng_bytes else 0.0,
    }
    binding = max(util, key=util.get)
    floor_s = max(
        hbm_bytes / 1e9 / chip.hbm_gbps,
        mxu_int8_ops / 1e12 / chip.int8_tops,
        vpu_u32_ops / 1e9 / chip.vpu_gops,
        prng_bytes / 1e9 / chip.prng_gbps,
    )
    return {
        "chip": chip.name,
        "seconds": seconds,
        "utilization": {k: round(v, 4) for k, v in util.items()},
        "binding_resource": binding,
        "speed_of_light_s": floor_s,
        "fraction_of_sol": round(floor_s / seconds, 4) if seconds else 0.0,
    }
