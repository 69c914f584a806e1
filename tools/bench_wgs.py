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
"""
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


def build(out_dir, read_len=1500):
    bam, cns, seeds = simulate_ecdna(
        out_dir, jitter=2, n_junction_reads=2000,
        bg_read_len=read_len, amp_read_len=read_len)
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

    big_path = os.path.join(out_dir, "wgs.bam")
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
    cns_path = os.path.join(out_dir, "wgs.cns")
    with open(cns_path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        for c in CHROMS:
            for row in cns_rows:
                fp.write(c + row[row.index("\t"):] + "\n")
    seeds_path = os.path.join(out_dir, "wgs_seeds.bed")
    with open(seeds_path, "w") as fp:
        for c in CHROMS:
            fp.write(f"{c}\t55000000\t55399999\n")
    return big_path, cns_path, seeds_path, len(rel) * len(CHROMS)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgs"
    os.makedirs(out, exist_ok=True)
    stages = {}
    t0 = time.time()
    bam, cns, seeds, n_rec = build(out)
    stages["build_input"] = round(time.time() - t0, 2)

    from coral_tpu.io.bam import BamFile
    from coral_tpu.reconstruct import Reconstruction, reconstruct_cycles

    prefix = os.path.join(out, "wgs_out")
    t_all = time.time()
    t0 = time.time()
    bamf = BamFile(bam)
    rec = Reconstruction(bamf, seeds)
    rec.read_cns(cns)
    rec.collect()
    stages["scan+collect"] = round(time.time() - t0, 2)
    t0 = time.time()
    rec.hash_to_segments()
    rec.find_amplicon_intervals()
    stages["interval_search"] = round(time.time() - t0, 2)
    t0 = time.time()
    rec.find_smalldel_breakpoints()
    rec.find_breakpoints()
    stages["breakpoints"] = round(time.time() - t0, 2)
    t0 = time.time()
    rec.build_graph()
    rec.assign_cov()
    rec.compute_cn()
    stages["graph+cn"] = round(time.time() - t0, 2)
    t0 = time.time()
    reconstruct_cycles(rec, prefix)
    stages["cycles"] = round(time.time() - t0, 2)
    total = round(time.time() - t_all, 2)

    n_amp = len(rec.graphs)
    ok = 0
    for i in range(1, n_amp + 1):
        path = f"{prefix}_amplicon{i}_cycles.txt"
        if os.path.exists(path) and "Cycle=" in open(path).read():
            ok += 1
    print(json.dumps({
        "n_records": n_rec,
        "n_amplicons": n_amp,
        "amplicons_with_cycles": ok,
        "stages_s": stages,
        "reconstruct_total_s": total,
        "records_per_s": round(n_rec / total),
    }, indent=1))


if __name__ == "__main__":
    main()
