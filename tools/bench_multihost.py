#!/usr/bin/env python3
"""Shard-ingest scaling benchmark: reconstruct wall-clock at N processes.

BASELINE.md's scaling target asks for measured efficiency at 1 and N>=2
workers.  This tool builds the WGS-scale sample from tools/bench_wgs.py
(8.66M records by default), splits it into N contiguous shards
(`parallel.multihost.split_bam` — the per-host staging of a multi-host
deployment), and times `multihost_reconstruct_graphs` at each N.  The
scan stage fans out one process per shard; everything downstream is the
single-process code on deterministically merged products, so outputs are
byte-identical across N (pinned by tests/test_multihost.py).

Caveat from CLAUDE.md: first-touch page faults in this microVM cost
~38 s/GB and make single-run timings vary ~3x; each N is therefore run
``--reps`` times (default 2) and the MIN is reported.

Usage: python tools/bench_multihost.py [workdir] [reps]
Prints one JSON line per N plus a scaling summary line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_multihost"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    os.makedirs(workdir, exist_ok=True)

    from bench_wgs import build

    bam, cns, seeds, n_amp = build(os.path.join(workdir, "input"))

    from coral_tpu.parallel.multihost import (
        multihost_reconstruct_graphs, split_bam)

    results = {}
    for n in (1, 2, 4):
        if n == 1:
            shards = [bam]
        else:
            shards = split_bam(bam, [
                os.path.join(workdir, f"shard{n}_{k}.bam")
                for k in range(n)])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            rec = multihost_reconstruct_graphs(
                shards, seeds, cns,
                os.path.join(workdir, f"out_n{n}"))
            best = min(best, time.perf_counter() - t0)
        results[n] = best
        print(json.dumps({
            "metric": "multihost reconstruct (scan fan-out)",
            "processes": n, "wall_s": round(best, 2),
            "amplicons": len(rec.graphs),
            "speedup_vs_1": round(results[1] / best, 2),
        }), flush=True)
    print(json.dumps({
        "metric": "shard-ingest scaling efficiency",
        "eff_2": round(results[1] / results[2] / 2, 2),
        "eff_4": round(results[1] / results[4] / 4, 2),
        "host_cpus": os.cpu_count(),
        "note": "this microVM has few cores and the native scan is "
                "already multithreaded, so process fan-out cannot beat "
                "it locally; the value measured here is the per-shard "
                "overhead of the multi-host ingest model (whose N-shard "
                "outputs are byte-identical to 1-shard, "
                "tests/test_multihost.py)",
    }))


if __name__ == "__main__":
    main()
