#!/usr/bin/env python3
"""End-to-end reconstruct benchmark report.

Measures wall-clock for each pipeline stage on a simulated ecDNA sample at
a chosen scale, writing a JSON report.  The reference cannot run in this
environment (pysam/cvxopt/gurobipy absent), so no direct A/B; BASELINE.md
records the comparison obligations.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_e2e"
    n_junction = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    from coral_tpu.io.bam import BamFile
    from coral_tpu.reconstruct import Reconstruction, reconstruct_cycles
    from coral_tpu.sim import simulate_ecdna

    bam_p, cns_p, seeds_p = simulate_ecdna(
        out_dir, jitter=2, n_junction_reads=n_junction,
        bg_read_len=5000, amp_read_len=5000)

    stages = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        stages[name] = round(time.time() - t0, 3)
        return out

    bam = timed("bam_scan", lambda: BamFile(bam_p))
    rec = Reconstruction(bam, seeds_p)
    timed("read_cns", lambda: rec.read_cns(cns_p))
    timed("collect_chimeras", rec.collect)
    timed("hash_to_segments", rec.hash_to_segments)
    timed("find_amplicon_intervals", rec.find_amplicon_intervals)
    timed("find_smalldel_breakpoints", rec.find_smalldel_breakpoints)
    timed("find_breakpoints", rec.find_breakpoints)
    timed("build_graph", rec.build_graph)
    timed("assign_cov", rec.assign_cov)
    timed("compute_cn", rec.compute_cn)
    timed("cycles_stage", lambda: reconstruct_cycles(
        rec, os.path.join(out_dir, "bench")))

    report = {
        "n_records": bam.n_records,
        "n_chimeras": len(rec.chimeras),
        "n_breakpoints": len(rec.new_bp_list),
        "stages_s": stages,
        "total_s": round(sum(stages.values()), 3),
        "records_per_s": round(bam.n_records / max(sum(stages.values()), 1e-9)),
    }
    print(json.dumps(report, indent=1))
    with open(os.path.join(out_dir, "bench_e2e.json"), "w") as fp:
        json.dump(report, fp, indent=1)


if __name__ == "__main__":
    main()
