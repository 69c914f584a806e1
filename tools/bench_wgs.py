#!/usr/bin/env python3
"""Whole-genome-scale end-to-end benchmark: replicate a simulated ecDNA
amplicon across 10 real chromosome names (~8.7M records), then run the
FULL reconstruction pipeline — scan, chimera collect, interval search,
breakpoint calling, graph build, CN balance, cycle decomposition — over
all 10 amplicons and report per-stage wall time.

Real chromosome names are required because breakpoint canonicalization
keys on the hg38 chromosome order (reference ``global_names.py:5-25``);
only 4-character names can replace the template's embedded "chr7" SA
rnames in place, so chr1..chr9 + chrX are used.

Flags (round 4):
  --engine auto|numpy|jax|pallas   scoring engine for find_breakpoints
  --repeat N                       min-of-N per stage (first-touch paging
                                   varies timings ~3x; report the min)
  --junction-heavy                 junction-dominated variant (~1.5M
                                   chimeric pairs — past the auto-route
                                   device threshold) used by bench.py's
                                   e2e_wgs device-vs-host comparison
"""
import argparse
import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from coral_tpu.io.bgzf import BGZF_EOF, iter_blocks, write_bgzf
from coral_tpu.sim import simulate_ecdna

CHROMS = [f"chr{i}" for i in range(1, 10)] + ["chrX"]
CHR_LEN = 159_345_973


def build(out_dir, read_len=1500, n_junction_reads=2000, junction_flank=10_000,
          bg_cov=20, name="wgs"):
    bam, cns, seeds = simulate_ecdna(
        out_dir, jitter=2, n_junction_reads=n_junction_reads,
        bg_read_len=read_len, amp_read_len=read_len,
        junction_flank=junction_flank, bg_cov=bg_cov)
    raw = open(bam, "rb").read()
    payload = b"".join(b for _, b in iter_blocks(raw))
    l_text = struct.unpack_from("<i", payload, 4)[0]
    p = 8 + l_text
    n_ref = struct.unpack_from("<i", payload, p)[0]
    p += 4
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", payload, p)[0]
        p += 8 + l_name
    body_start = p
    offs = []
    while p < len(payload):
        offs.append(p)
        p += 4 + struct.unpack_from("<i", payload, p)[0]
    body = bytearray(payload[body_start:])
    rel = [o - body_start for o in offs]

    hdr_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{c}\tLN:{CHR_LEN}\n" for c in CHROMS)
    ht = hdr_text.encode()
    header = b"BAM\x01" + struct.pack("<i", len(ht)) + ht
    header += struct.pack("<i", len(CHROMS))
    for c in CHROMS:
        nb = c.encode() + b"\x00"
        header += struct.pack("<i", len(nb)) + nb + struct.pack("<i", CHR_LEN)

    big_path = os.path.join(out_dir, f"{name}.bam")
    with open(big_path, "wb") as fp:
        write_bgzf(fp, bytes(header), level=1)
        for ci, c in enumerate(CHROMS):
            n0, n1 = 48 + ci // 10, 48 + ci % 10
            for r in rel:
                struct.pack_into("<i", body, r + 4, ci)
                body[r + 36] = n0
                body[r + 37] = n1
            blob = bytes(body).replace(b"chr7,", f"{c},".encode())
            write_bgzf(fp, blob, level=1)
        fp.write(BGZF_EOF)

    # CN segments + seeds replicated per chromosome
    cns_rows = [ln for ln in open(cns).read().splitlines()[1:]]
    cns_path = os.path.join(out_dir, f"{name}.cns")
    with open(cns_path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        for c in CHROMS:
            for row in cns_rows:
                fp.write(c + row[row.index("\t"):] + "\n")
    seeds_path = os.path.join(out_dir, f"{name}_seeds.bed")
    with open(seeds_path, "w") as fp:
        for c in CHROMS:
            fp.write(f"{c}\t55000000\t55399999\n")
    return big_path, cns_path, seeds_path, len(rel) * len(CHROMS)


def build_junction_heavy(out_dir):
    """Junction-dominated 10-chromosome sample: ~1.5M chimeric reads
    (one adjacent pair each — past the 1M-pair auto-route device
    threshold), modest background so the scoring stage, not the scan,
    dominates.  ~4.3M records."""
    return build(out_dir, read_len=1500, n_junction_reads=150_000,
                 junction_flank=50, bg_cov=4, name="wgs_hvy")


def run_staged(bam, cns, seeds, prefix, engine="auto", skip_cycles=False):
    """One staged reconstruct run; returns (stages dict, route log lines,
    output file map, n_amplicons, route records).

    Route records are the API-level :class:`coral_tpu.ops.pairs
    .RouteRecord` entries this run appended (engine, pair count, measured
    scoring seconds, decision reason) — the bench consumes these instead
    of scraping log-line formats."""
    import logging

    from coral_tpu.config import DEFAULT_CONFIG
    import dataclasses

    from coral_tpu.io.bam import BamFile
    from coral_tpu.ops import pairs as pairs_mod
    from coral_tpu.reconstruct import Reconstruction, reconstruct_cycles

    cfg = DEFAULT_CONFIG.replace(
        engine=dataclasses.replace(DEFAULT_CONFIG.engine, engine=engine))
    routes = []
    rec_seq = pairs_mod.last_route_seq()

    class Capture(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "pair scoring route" in msg:
                routes.append(msg)

    lg = logging.getLogger("coral_tpu.ops.pairs")
    handler = Capture(level=logging.INFO)
    old_level = lg.level
    lg.addHandler(handler)
    lg.setLevel(logging.INFO)
    stages = {}
    try:
        t_all = time.time()
        t0 = time.time()
        bamf = BamFile(bam)
        rec = Reconstruction(bamf, seeds, cfg=cfg)
        rec.read_cns(cns)
        rec.collect()
        stages["scan+collect"] = round(time.time() - t0, 2)
        t0 = time.time()
        rec.hash_to_segments()
        rec.find_amplicon_intervals()
        stages["interval_search"] = round(time.time() - t0, 2)
        t0 = time.time()
        rec.find_smalldel_breakpoints()
        stages["smalldel"] = round(time.time() - t0, 2)
        t0 = time.time()
        rec.find_breakpoints()
        stages["breakpoints"] = round(time.time() - t0, 2)
        t0 = time.time()
        rec.build_graph()
        rec.assign_cov()
        rec.compute_cn()
        stages["graph+cn"] = round(time.time() - t0, 2)
        if not skip_cycles:
            t0 = time.time()
            reconstruct_cycles(rec, prefix)
            stages["cycles"] = round(time.time() - t0, 2)
        else:
            from coral_tpu.graph.breakpoint_graph import write_graph_file

            t0 = time.time()
            for gi, g in enumerate(rec.graphs):
                write_graph_file(g, f"{prefix}_amplicon{gi + 1}_graph.txt")
            stages["write_graphs"] = round(time.time() - t0, 2)
        stages["total"] = round(time.time() - t_all, 2)
        n_amp = len(rec.graphs)
        bamf.close()
    finally:
        lg.removeHandler(handler)
        lg.setLevel(old_level)
    files = {}
    d = os.path.dirname(prefix)
    base = os.path.basename(prefix)
    for f in sorted(os.listdir(d)):
        if f.startswith(base + "_") and f.endswith(
                ("_graph.txt", "_cycles.txt")):
            with open(os.path.join(d, f)) as fh:
                files[f] = fh.read()
    return stages, routes, files, n_amp, \
        pairs_mod.route_records_since(rec_seq)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/wgs")
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--junction-heavy", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    if args.junction_heavy:
        bam, cns, seeds, n_rec = build_junction_heavy(args.out)
    else:
        bam, cns, seeds, n_rec = build(args.out)
    build_s = round(time.time() - t0, 2)

    best = None
    runs = []
    for r in range(max(args.repeat, 1)):
        prefix = os.path.join(args.out, f"wgs_out_r{r}")
        stages, routes, files, n_amp, _ = run_staged(
            bam, cns, seeds, prefix, engine=args.engine,
            skip_cycles=args.junction_heavy)
        runs.append(stages)
        if best is None or stages["total"] < best["total"]:
            best = stages
    ok = 0
    last_prefix = os.path.join(args.out, f"wgs_out_r{len(runs) - 1}")
    for i in range(1, n_amp + 1):
        path = f"{last_prefix}_amplicon{i}_cycles.txt"
        if os.path.exists(path) and "Cycle=" in open(path).read():
            ok += 1
    stages_min = {k: min(s[k] for s in runs) for k in runs[0]}
    print(json.dumps({
        "n_records": n_rec,
        "n_amplicons": n_amp,
        "amplicons_with_cycles": ok,
        "build_input_s": build_s,
        "engine": args.engine,
        "repeats": len(runs),
        "stages_s_min_of_n": stages_min,
        "stages_s_runs": runs,
        "reconstruct_total_s": best["total"],
        "records_per_s": round(n_rec / best["total"]),
    }, indent=1))


if __name__ == "__main__":
    main()
