"""Whole-sample flow: seed mode output feeds reconstruct; multiple
independent amplicons on different chromosomes (BASELINE configs #1/#5)."""
import math
import os

import pytest

from coral_tpu.cli import main
from coral_tpu.io.bamwrite import BamRecord, write_bam

CHRS = [("chr7", 159_345_973), ("chr8", 145_138_636)]
AMP1 = ("chr7", 55_000_000, 55_400_000, 220)   # ecDNA (head-to-tail)
AMP2 = ("chr8", 127_000_000, 127_300_000, 120)  # second ecDNA


def build_sample(tmp_path):
    recs = []
    bg_cov, rl = 20, 50_000
    step = rl // bg_cov
    for chrom, dstart, dend in [("chr7", 0, 60_000_000),
                                ("chr8", 120_000_000, 132_000_000)]:
        for i, start in enumerate(range(dstart, dend - rl, step)):
            recs.append(BamRecord(f"bg_{chrom}_{i:06d}", 0, chrom, start, 60,
                                  f"{rl}M", seq="*", tags={"NM": 100}))
    for (chrom, s, e, cov) in (AMP1, AMP2):
        arl = 10_000
        astep = max(arl // (cov - 20), 1)
        for i, start in enumerate(range(s, e - arl, astep)):
            recs.append(BamRecord(f"amp_{chrom}_{i:06d}", 0, chrom, start, 60,
                                  f"{arl}M", seq="*", tags={"NM": 20}))
        flank = 10_000
        for i in range(60):
            p1 = e - flank
            sa1 = f"{chrom},{p1 + 1},+,{flank}M{flank}S,60,50;"
            sa2 = f"{chrom},{s + 1},+,{flank}S{flank}M,60,50;"
            recs.append(BamRecord(f"jx_{chrom}_{i:04d}", 0, chrom, p1, 60,
                                  f"{flank}M{flank}S", seq="A" * (2 * flank),
                                  tags={"NM": 50, "SA": sa2}))
            recs.append(BamRecord(f"jx_{chrom}_{i:04d}", 0x800, chrom, s, 60,
                                  f"{flank}S{flank}M", seq="*",
                                  tags={"NM": 50, "SA": sa1}))
    bam_p = str(tmp_path / "sample.bam")
    write_bam(bam_p, CHRS, recs)

    cns_p = str(tmp_path / "sample.cns")
    with open(cns_p, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        for chrom, dstart, dend, (amps, ampe, amp_cov) in [
            ("chr7", 0, 60_000_000, (AMP1[1], AMP1[2], AMP1[3])),
            ("chr8", 120_000_000, 132_000_000, (AMP2[1], AMP2[2], AMP2[3])),
        ]:
            pos = dstart
            while pos < amps:
                end = min(pos + 5_000_000, amps)
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t20\n")
                pos = end
            cn = 2.0 * amp_cov / 20
            fp.write(f"{chrom}\t{amps}\t{ampe}\t-\t{math.log2(cn / 2)}\t{amp_cov}\n")
            pos = ampe
            while pos < dend:
                end = min(pos + 5_000_000, dend)
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t20\n")
                pos = end
    return bam_p, cns_p


def test_seed_to_cycles_whole_sample(tmp_path):
    bam_p, cns_p = build_sample(tmp_path)

    # stage 1: seed mode discovers both amplified intervals from the .cns
    seeds_p = str(tmp_path / "seeds.bed")
    assert main(["seed", "--cn_seg", cns_p, "--out", seeds_p]) == 0
    rows = [ln.split("\t") for ln in open(seeds_p).read().splitlines()]
    assert [(r[0]) for r in rows] == ["chr7", "chr8"]
    assert int(rows[0][1]) == AMP1[1] and int(rows[1][1]) == AMP2[1]

    # stage 2: reconstruct + cycles from those seeds
    prefix = str(tmp_path / "out")
    rc = main(["reconstruct", "--lr_bam", bam_p, "--cnv_seed", seeds_p,
               "--cn_seg", cns_p, "--output_prefix", prefix,
               "--log_fn", str(tmp_path / "run.log")])
    assert rc == 0
    for i, (chrom, s, e, cov) in enumerate((AMP1, AMP2), 1):
        gtxt = open(f"{prefix}_amplicon{i}_graph.txt").read()
        assert gtxt.count("sequence\t") == 3
        assert gtxt.count("discordant\t") == 1
        assert chrom in gtxt
        ctxt = open(f"{prefix}_amplicon{i}_cycles.txt").read()
        cyc_lines = [ln for ln in ctxt.splitlines() if ln.startswith("Cycle=")]
        assert len(cyc_lines) == 2
        w1 = float(cyc_lines[0].split(";")[1].split("=")[1])
        expect = 2.0 * cov / 20 - 2.0
        assert w1 == pytest.approx(expect, rel=0.15)
    # trace log written with #TIME prefixes
    log = open(tmp_path / "run.log").read()
    assert "#TIME" in log
