"""Compose SCALING_r{N}.json: measured splits + the analytic pod model.

Runs bench_scaling.py twice —

1. on the attached accelerator (1 real chip): the config-5 streaming x
   sharded step's chunk-loop vs finish split, i.e. the compute/(compute +
   finish) ratio on real silicon with the gen-4 kernel;
2. on the virtual 8-device host mesh: validates the collective structure
   (modular psum ring + all-gather) end-to-end with XLA collectives;

then derives the v5p-16 weak-scaling projection for BASELINE config 5
(100k participants x 1M dim) from the measured single-chip numbers and the
chip datasheets. The model is deliberately simple and fully shown in the
artifact: per-chunk compute is HBM-bound (measured fraction of the v5e
ceiling, rescaled to v5p bandwidth), the finish is ONE ring all-reduce of
the per-clerk partial sums over ICI plus the tiny reconstruction.

Usage: python tools/make_scaling_artifact.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(extra_env: dict, args: list[str]) -> dict:
    env = dict(os.environ, **extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench_scaling.py"), *args],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        raise RuntimeError(f"bench_scaling failed: {out.stderr[-500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "SCALING_r03.json")

    # 1. real chip (devices=1 keeps the mesh on the single attached TPU);
    # 100k-dim keeps the u32 limb intermediates inside HBM next to the
    # planar stream — the model rescales to the config-5 dimension
    real = run_bench({}, [
        "--devices", "1", "--dim-per-device", "33334",
        "--participants-per-device", "768", "--streaming-chunks", "4",
    ])
    # 2. virtual 8-device mesh — CORRECTNESS-ONLY: it validates that the
    # collective structure (modular psum ring + all-gather) compiles and
    # executes over 8 XLA devices. Its timings are N processes timeslicing
    # one shared host CPU, where collectives cost nothing like ICI, so no
    # efficiency or comm-fraction numbers are derived from it (r3's were
    # noise and are dropped from the artifact).
    virt = run_bench({}, [
        "--devices", "8", "--cpu-mesh", "--dim-per-device", "2048",
        "--participants-per-device", "8", "--streaming-chunks", "3",
    ])
    virt_summary = {
        "purpose": "correctness-only: collective structure executes on 8 "
                   "virtual XLA devices; CPU-mesh timings carry no "
                   "scaling signal (one shared host CPU)",
        "devices_validated": sorted(int(k) for k in virt["results"]),
        "streaming_sharded_ran": bool(virt.get("streaming_sharded")),
    }

    s = real["streaming_sharded"]
    chunk_ms = s["chunk_loop_ms"] / s["chunks"]
    payload_mb = s["allreduce_payload_mb"]

    # ---- analytic v5p-16 projection (BASELINE config 5) ----------------
    # Datasheet ceilings (sda_tpu/utils/profiling.py): v5e 819 GB/s HBM,
    # v5p 2765 GB/s HBM, ICI ~90 GB/s per link x 6 links/chip on the 3D
    # torus; a p-axis ring all-reduce moves 2*(N-1)/N * payload per chip
    # and rides one link pair, so we budget 100 GB/s effective per chip.
    v5e_hbm, v5p_hbm, ici_gbps = 819.0, 2765.0, 100.0
    chips = 16
    participants, dim = 100_000, 1_000_002
    p_chunk = 768  # per-chip chunk (headline operating point)
    # measured per-chunk seconds scale with resident bytes / HBM ceiling;
    # rescale the v5e measurement to v5p bandwidth
    meas_dim = 3 * 33334
    chunk_s_v5p = (chunk_ms / 1e3) * (v5e_hbm / v5p_hbm) * (dim / meas_dim)
    # mesh p=16: each chip streams participants/16 rows in 1024-chunks
    chunks_per_chip = -(-participants // (chips * p_chunk))
    compute_s = chunks_per_chip * chunk_s_v5p
    # finish: ring all-reduce of [n, nb, L16] u32 partial sums (full dim
    # per chip on a pure-p mesh) + reconstruction (negligible, measured
    # inside finish_ms on the real chip)
    payload_bytes = payload_mb * 1e6 * (dim / meas_dim)
    finish_local_s = (s["finish_ms"] / 1e3) * (v5e_hbm / v5p_hbm) * (dim / meas_dim)

    def project(ici):
        ar = 2 * (chips - 1) / chips * payload_bytes / (ici * 1e9)
        tot = compute_s + ar + finish_local_s
        return ar, tot, compute_s / tot

    allreduce_s, total_s, efficiency = project(ici_gbps)
    # the model's ONE load-bearing assumption is the effective per-chip ICI
    # bandwidth; show how the projection moves across a 3x range of it
    sensitivity = {
        f"{int(g)}_GBps": {
            "allreduce_s": round(project(g)[0], 5),
            "total_s": round(project(g)[1], 4),
            "weak_scaling_efficiency": round(project(g)[2], 4),
        }
        for g in (50.0, 100.0, 150.0)
    }

    artifact = {
        "metric": "config-5 scaling: measured splits + v5p-16 projection",
        "real_chip": real,
        "virtual_8dev_mesh": virt_summary,
        "model": {
            "assumptions": {
                "v5p_hbm_gbps": v5p_hbm,
                "ici_effective_gbps_per_chip": ici_gbps,
                "chips": chips,
                "participants": participants,
                "dimension": dim,
                "p_chunk": p_chunk,
            },
            "per_chip_chunk_s_v5p": round(chunk_s_v5p, 5),
            "chunks_per_chip": chunks_per_chip,
            "compute_s": round(compute_s, 4),
            "allreduce_payload_mb_per_chip": round(payload_bytes / 1e6, 2),
            "allreduce_s": round(allreduce_s, 5),
            "finish_local_s": round(finish_local_s, 5),
            "total_s": round(total_s, 4),
            "aggregations_per_s": round(participants / total_s, 1),
            "weak_scaling_efficiency": round(efficiency, 4),
            "ici_bandwidth_sensitivity": sensitivity,
        },
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {out_path}; projected v5p-16 efficiency "
          f"{efficiency:.1%} ({participants/total_s:.0f} aggregations/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
