"""Synthetic ecDNA data simulation.

Generates coordinate-sorted BAMs + CN-segment + seed files describing a
simple circular amplification, used by the test suite, the benchmark
harness, and the compile-check entry point.  No reference-code analog (the
reference ships no test data); read geometry follows the nanopore
split-read conventions the reference consumes (SA:Z tags naming the
partner alignments).
"""
from __future__ import annotations

import math
import os
import random
from typing import List, Tuple

from .io.bamwrite import BamRecord, write_bam

CHR = "chr7"
CHR_LEN = 159_345_973
CHR2 = "chr8"
CHR2_LEN = 145_138_636
CHR3 = "chr5"
CHR3_LEN = 181_538_259


def simulate_ecdna(
    out_dir: str,
    amp_start: int = 55_000_000,
    amp_end: int = 55_400_000,        # exclusive
    bg_cov: int = 20,
    amp_extra_cov: int = 200,
    n_junction_reads: int = 60,
    bg_read_len: int = 50_000,
    amp_read_len: int = 10_000,
    junction_flank: int = 10_000,
    jitter: int = 2,
    seed: int = 0,
    emit_seq: bool = False,
    domain_end: int = 60_400_000,
    n_integration_reads: int = 0,
    integration_pos: int = 58_000_000,
) -> Tuple[str, str, str]:
    """Write (bam, cns, seed_bed) for one head-to-tail circular amplicon.

    The amplicon is a single segment [amp_start, amp_end) at total coverage
    ``bg_cov + amp_extra_cov`` whose 3' end joins back to its 5' start —
    the canonical single-cycle ecDNA.
    """
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    recs: List[BamRecord] = []
    # emit_seq: realistic SEQ-bearing primaries (real nanopore primaries
    # always carry SEQ; '*' models are compact but make pysam-semantics
    # consumers divide by query_length == 0)
    sq = "" if emit_seq else "*"

    # background: tiled long reads, sequence omitted (SEQ '*')
    step = bg_read_len // bg_cov
    for i, start in enumerate(range(0, domain_end - bg_read_len, step)):
        recs.append(BamRecord(f"bg{i:07d}", 0, CHR, start, 60,
                              f"{bg_read_len}M", seq=sq, tags={"NM": 100}))
    # amplified interior coverage
    astep = max(amp_read_len // amp_extra_cov, 1)
    for i, start in enumerate(range(amp_start, amp_end - amp_read_len, astep)):
        recs.append(BamRecord(f"amp{i:07d}", 0, CHR, start, 60,
                              f"{amp_read_len}M", seq=sq, tags={"NM": 20}))
    # junction reads: [end-flank, end) -> [start, start+flank)
    for i in range(n_junction_reads):
        j1 = rng.randint(-jitter, jitter)
        j2 = rng.randint(-jitter, jitter)
        p1 = amp_end - junction_flank + j1          # part 1 ref start
        p2 = amp_start + j2                         # part 2 ref start
        rl = 2 * junction_flank
        sa1 = f"{CHR},{p1 + 1},+,{junction_flank}M{junction_flank}S,60,50;"
        sa2 = f"{CHR},{p2 + 1},+,{junction_flank}S{junction_flank}M,60,50;"
        recs.append(BamRecord(
            f"jx{i:04d}", 0, CHR, p1, 60,
            f"{junction_flank}M{junction_flank}S",
            seq="A" * rl, tags={"NM": 50, "SA": sa2}))
        recs.append(BamRecord(
            f"jx{i:04d}", 0x800, CHR, p2, 60,
            f"{junction_flank}S{junction_flank}M",
            seq="*", tags={"NM": 50, "SA": sa1}))

    # optional HSR-like integration chimeras: ecDNA interior -> chromosome
    for i in range(n_integration_reads):
        p1 = amp_start + 50_000 + i          # inside the amplicon
        p2 = integration_pos + (i % 3)       # chromosomal side
        rl = 2 * junction_flank
        sa1 = f"{CHR},{p1 + 1},+,{junction_flank}M{junction_flank}S,60,50;"
        sa2 = f"{CHR},{p2 + 1},+,{junction_flank}S{junction_flank}M,60,50;"
        recs.append(BamRecord(
            f"hsr{i:04d}", 0, CHR, p1, 60,
            f"{junction_flank}M{junction_flank}S",
            seq="A" * rl, tags={"NM": 50, "SA": sa2}))
        recs.append(BamRecord(
            f"hsr{i:04d}", 0x800, CHR, p2, 60,
            f"{junction_flank}S{junction_flank}M",
            seq="*", tags={"NM": 50, "SA": sa1}))

    bam_path = os.path.join(out_dir, "sim_ecdna.bam")
    write_bam(bam_path, [(CHR, CHR_LEN)], recs)

    # CN segments: 5 Mb diploid tiles + the amplified segment
    cns_path = os.path.join(out_dir, "sim_ecdna.cns")
    amp_cn = 2.0 * (bg_cov + amp_extra_cov) / bg_cov
    with open(cns_path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        pos = 0
        while pos < amp_start:
            end = min(pos + 5_000_000, amp_start)
            fp.write(f"{CHR}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
            pos = end
        fp.write(f"{CHR}\t{amp_start}\t{amp_end}\t-\t"
                 f"{math.log2(amp_cn / 2.0)}\t{bg_cov + amp_extra_cov}\n")
        fp.write(f"{CHR}\t{amp_end}\t{domain_end}\t-\t0.0\t{bg_cov}\n")

    seed_path = os.path.join(out_dir, "sim_ecdna_seeds.bed")
    with open(seed_path, "w") as fp:
        fp.write(f"{CHR}\t{amp_start}\t{amp_end - 1}\n")
    return bam_path, cns_path, seed_path


def simulate_translocated_ecdna(
    out_dir: str,
    amp_a=(55_000_000, 55_300_000),     # chr7 segment
    amp_b=(127_000_000, 127_200_000),   # chr8 segment
    bg_cov: int = 20,
    amp_extra_cov: int = 150,
    n_junction_reads: int = 60,
    bg_read_len: int = 50_000,
    amp_read_len: int = 10_000,
    junction_flank: int = 10_000,
    seed: int = 0,
    emit_seq: bool = False,
    n_through_reads: int = 0,
) -> Tuple[str, str, str]:
    """Two-chromosome circular amplicon: chr7:A+ -> chr8:B+ -> back to A.

    Only the chr7 segment is seeded; the chr8 segment must be DISCOVERED
    through the breakpoint-connected interval search (the reference's BFS
    over chimeric alignments, ``find_interval_i``).

    ``n_through_reads`` adds three-part chimeras that traverse the WHOLE
    chr8 segment in one read ([A_end-flank) -> B -> [A_start+flank)),
    covering both junctions — the geometry that produces >= 3-sequence-edge
    subpath constraints (``compute_path_constraints``); pass a small
    ``amp_b`` so the middle part fits in a read.
    """
    os.makedirs(out_dir, exist_ok=True)
    recs: List[BamRecord] = []
    # emit_seq: realistic SEQ-bearing primaries (real nanopore primaries
    # always carry SEQ; '*' models are compact but make pysam-semantics
    # consumers divide by query_length == 0)
    sq = "" if emit_seq else "*"
    domains = [(CHR, 0, 60_000_000), (CHR2, 120_000_000, 132_000_000)]
    step = bg_read_len // bg_cov
    i = 0
    for (chrom, dstart, dend) in domains:
        for start in range(dstart, dend - bg_read_len, step):
            recs.append(BamRecord(f"bg{i:07d}", 0, chrom, start, 60,
                                  f"{bg_read_len}M", seq=sq, tags={"NM": 100}))
            i += 1
    astep = max(amp_read_len // amp_extra_cov, 1)
    i = 0
    for (chrom, (s, e)) in [(CHR, amp_a), (CHR2, amp_b)]:
        for start in range(s, e - amp_read_len, astep):
            recs.append(BamRecord(f"amp{i:07d}", 0, chrom, start, 60,
                                  f"{amp_read_len}M", seq=sq, tags={"NM": 20}))
            i += 1

    def junctions(tag, c1, p1, c2, p2):
        """Chimeric reads: [p1-flank, p1) on c1 then [p2, p2+flank) on c2."""
        rl = 2 * junction_flank
        for k in range(n_junction_reads):
            a = p1 - junction_flank
            sa1 = f"{c1},{a + 1},+,{junction_flank}M{junction_flank}S,60,50;"
            sa2 = f"{c2},{p2 + 1},+,{junction_flank}S{junction_flank}M,60,50;"
            recs.append(BamRecord(f"{tag}{k:04d}", 0, c1, a, 60,
                                  f"{junction_flank}M{junction_flank}S",
                                  seq="A" * rl, tags={"NM": 50, "SA": sa2}))
            recs.append(BamRecord(f"{tag}{k:04d}", 0x800, c2, p2, 60,
                                  f"{junction_flank}S{junction_flank}M",
                                  seq="*", tags={"NM": 50, "SA": sa1}))

    junctions("jab", CHR, amp_a[1], CHR2, amp_b[0])   # A end -> B start
    junctions("jba", CHR2, amp_b[1], CHR, amp_a[0])   # B end -> A start

    # three-part through reads: [A_end-f, A_end) + whole B + [A_start, A_start+f)
    f = junction_flank
    blen = amp_b[1] - amp_b[0]
    for k in range(n_through_reads):
        rl = 2 * f + blen
        a1 = amp_a[1] - f                 # part 1 ref start (chr7)
        b0 = amp_b[0]                     # part 2 ref start (chr8)
        a0 = amp_a[0]                     # part 3 ref start (chr7)
        sa1 = f"{CHR},{a1 + 1},+,{f}M{blen + f}S,60,50;"
        sa2 = f"{CHR2},{b0 + 1},+,{f}S{blen}M{f}S,60,50;"
        sa3 = f"{CHR},{a0 + 1},+,{f + blen}S{f}M,60,50;"
        recs.append(BamRecord(f"thr{k:04d}", 0, CHR, a1, 60,
                              f"{f}M{blen + f}S",
                              seq="A" * rl, tags={"NM": 50, "SA": sa2 + sa3}))
        recs.append(BamRecord(f"thr{k:04d}", 0x800, CHR2, b0, 60,
                              f"{f}S{blen}M{f}S",
                              seq="*", tags={"NM": 50, "SA": sa1 + sa3}))
        recs.append(BamRecord(f"thr{k:04d}", 0x800, CHR, a0, 60,
                              f"{f + blen}S{f}M",
                              seq="*", tags={"NM": 50, "SA": sa1 + sa2}))

    bam_path = os.path.join(out_dir, "sim_tx.bam")
    write_bam(bam_path, [(CHR, CHR_LEN), (CHR2, CHR2_LEN)], recs)

    cns_path = os.path.join(out_dir, "sim_tx.cns")
    amp_cn = 2.0 * (bg_cov + amp_extra_cov) / bg_cov
    with open(cns_path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        for (chrom, dstart, dend), (amps, ampe) in zip(
                domains, [amp_a, amp_b]):
            pos = dstart
            while pos < amps:
                end = min(pos + 5_000_000, amps)
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
                pos = end
            fp.write(f"{chrom}\t{amps}\t{ampe}\t-\t"
                     f"{math.log2(amp_cn / 2.0)}\t{bg_cov + amp_extra_cov}\n")
            pos = ampe
            while pos < dend:
                end = min(pos + 5_000_000, dend)
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
                pos = end

    seed_path = os.path.join(out_dir, "sim_tx_seeds.bed")
    with open(seed_path, "w") as fp:
        fp.write(f"{CHR}\t{amp_a[0]}\t{amp_a[1] - 1}\n")
    return bam_path, cns_path, seed_path


def simulate_multichrom_inverted_ecdna(
    out_dir: str,
    amp_a=(55_000_000, 55_300_000),     # chr7 segment, traversed '+'
    amp_b=(127_000_000, 127_200_000),   # chr8 segment, traversed '-'
    amp_c=(90_000_000, 90_150_000),     # chr5 segment, traversed '+'
    bg_cov: int = 20,
    amp_extra_cov: int = 150,
    n_junction_reads: int = 60,
    bg_read_len: int = 50_000,
    amp_read_len: int = 10_000,
    junction_flank: int = 10_000,
    jitter: int = 0,
    seed: int = 0,
    emit_seq: bool = False,
) -> Tuple[str, str, str]:
    """Three-chromosome circular amplicon with one INVERTED segment:

        chr7:A+  -->  chr8:B-  -->  chr5:C+  -->  back to A+

    Only the chr7 segment is seeded, so the interval search must discover
    chr8 through junction 1 and then chr5 through junction 2 — a
    two-hop transitive BFS (every other sim discovers at most one hop).
    The B segment is traversed on the MINUS strand: the A->B junction
    enters B at its RIGHT end moving left, and the B->C junction leaves B
    at its LEFT end, producing mixed-strand split reads that are NOT
    foldbacks (distinct positions and chromosomes), the one discordant
    orientation class the single-strand sims and the BFB fold sims never
    emit together.
    """
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    recs: List[BamRecord] = []
    # emit_seq: realistic SEQ-bearing primaries (real nanopore primaries
    # always carry SEQ; '*' models are compact but make pysam-semantics
    # consumers divide by query_length == 0)
    sq = "" if emit_seq else "*"
    domains = [(CHR, 50_000_000, 60_000_000),
               (CHR2, 122_000_000, 132_000_000),
               (CHR3, 85_000_000, 95_000_000)]
    step = bg_read_len // bg_cov
    i = 0
    for (chrom, dstart, dend) in domains:
        for start in range(dstart, dend - bg_read_len, step):
            recs.append(BamRecord(f"bg{i:07d}", 0, chrom, start, 60,
                                  f"{bg_read_len}M", seq=sq, tags={"NM": 100}))
            i += 1
    astep = max(amp_read_len // amp_extra_cov, 1)
    i = 0
    for (chrom, (s, e)) in [(CHR, amp_a), (CHR2, amp_b), (CHR3, amp_c)]:
        for start in range(s, e - amp_read_len, astep):
            recs.append(BamRecord(f"amp{i:07d}", 0, chrom, start, 60,
                                  f"{amp_read_len}M", seq=sq, tags={"NM": 20}))
            i += 1

    f = junction_flank
    rl = 2 * f

    def j():
        return rng.randint(-jitter, jitter) if jitter else 0

    for k in range(n_junction_reads):
        # junction 1: A+ end -> B- right end (read enters B moving LEFT).
        # part 1 = query [0,f) on '+' ending at A_end; part 2 = query
        # [f,2f) on '-' covering [B_end-f, B_end) — stored (reference-
        # orientation) CIGAR of the reversed segment is fMfS.
        a1 = amp_a[1] - f + j()
        b2 = amp_b[1] - f + j()
        sa1 = f"{CHR},{a1 + 1},+,{f}M{f}S,60,50;"
        sa2 = f"{CHR2},{b2 + 1},-,{f}M{f}S,60,50;"
        recs.append(BamRecord(f"jab{k:04d}", 0, CHR, a1, 60, f"{f}M{f}S",
                              seq="A" * rl, tags={"NM": 50, "SA": sa2}))
        recs.append(BamRecord(f"jab{k:04d}", 0x810, CHR2, b2, 60,
                              f"{f}M{f}S", seq="*",
                              tags={"NM": 50, "SA": sa1}))
        # junction 2: B- left end -> C+ start.  part 1 = query [0,f) on
        # '-' covering [B_start, B_start+f) (stored CIGAR fSfM); part 2 =
        # query [f,2f) on '+' from C_start.
        b1 = amp_b[0] + j()
        c2 = amp_c[0] + j()
        sa1 = f"{CHR2},{b1 + 1},-,{f}S{f}M,60,50;"
        sa2 = f"{CHR3},{c2 + 1},+,{f}S{f}M,60,50;"
        recs.append(BamRecord(f"jbc{k:04d}", 0x10, CHR2, b1, 60,
                              f"{f}S{f}M", seq="A" * rl,
                              tags={"NM": 50, "SA": sa2}))
        recs.append(BamRecord(f"jbc{k:04d}", 0x800, CHR3, c2, 60,
                              f"{f}S{f}M", seq="*",
                              tags={"NM": 50, "SA": sa1}))
        # junction 3: C+ end -> A+ start (plain head-to-tail).
        c1 = amp_c[1] - f + j()
        a2 = amp_a[0] + j()
        sa1 = f"{CHR3},{c1 + 1},+,{f}M{f}S,60,50;"
        sa2 = f"{CHR},{a2 + 1},+,{f}S{f}M,60,50;"
        recs.append(BamRecord(f"jca{k:04d}", 0, CHR3, c1, 60, f"{f}M{f}S",
                              seq="A" * rl, tags={"NM": 50, "SA": sa2}))
        recs.append(BamRecord(f"jca{k:04d}", 0x800, CHR, a2, 60,
                              f"{f}S{f}M", seq="*",
                              tags={"NM": 50, "SA": sa1}))

    bam_path = os.path.join(out_dir, "sim_mc.bam")
    write_bam(bam_path, [(CHR3, CHR3_LEN), (CHR, CHR_LEN), (CHR2, CHR2_LEN)],
              recs)

    cns_path = os.path.join(out_dir, "sim_mc.cns")
    amp_cn = 2.0 * (bg_cov + amp_extra_cov) / bg_cov
    with open(cns_path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        for (chrom, dstart, dend), (amps, ampe) in zip(
                domains, [amp_a, amp_b, amp_c]):
            pos = dstart
            while pos < amps:
                end = min(pos + 5_000_000, amps)
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
                pos = end
            fp.write(f"{chrom}\t{amps}\t{ampe}\t-\t"
                     f"{math.log2(amp_cn / 2.0)}\t{bg_cov + amp_extra_cov}\n")
            pos = ampe
            while pos < dend:
                end = min(pos + 5_000_000, dend)
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
                pos = end

    seed_path = os.path.join(out_dir, "sim_mc_seeds.bed")
    with open(seed_path, "w") as fp:
        fp.write(f"{CHR}\t{amp_a[0]}\t{amp_a[1] - 1}\n")
    return bam_path, cns_path, seed_path


def simulate_bfb(
    out_dir: str,
    amp_start: int = 55_000_000,
    amp_end: int = 55_400_000,        # exclusive
    bg_cov: int = 20,
    amp_extra_cov: int = 200,
    n_fold_reads: int = 60,
    bg_read_len: int = 50_000,
    amp_read_len: int = 10_000,
    junction_flank: int = 10_000,
    jitter: int = 2,
    seed: int = 0,
    emit_seq: bool = False,
    domain_end: int = 60_400_000,
) -> Tuple[str, str, str]:
    """Write (bam, cns, seed_bed) for a BFB-like foldback amplicon.

    Two foldback-inversion breakpoints close the doubled segment into a
    cycle: ``S+ --fold(right, ++)--> S- --fold(left, --)--> S+``.  A
    foldback read covers the same reference window twice, once per strand
    (split-read halves share one fold position), producing the '++'/'--'
    self-loop discordant edges the reference derives from same-position
    opposite-strand SA pairs (``breakpoint_utilities.py:289-295``).
    """
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    recs: List[BamRecord] = []
    # emit_seq: realistic SEQ-bearing primaries (real nanopore primaries
    # always carry SEQ; '*' models are compact but make pysam-semantics
    # consumers divide by query_length == 0)
    sq = "" if emit_seq else "*"

    step = bg_read_len // bg_cov
    for i, start in enumerate(range(0, domain_end - bg_read_len, step)):
        recs.append(BamRecord(f"bg{i:07d}", 0, CHR, start, 60,
                              f"{bg_read_len}M", seq=sq, tags={"NM": 100}))
    astep = max(amp_read_len // amp_extra_cov, 1)
    for i, start in enumerate(range(amp_start, amp_end - amp_read_len, astep)):
        recs.append(BamRecord(f"amp{i:07d}", 0, CHR, start, 60,
                              f"{amp_read_len}M", seq=sq, tags={"NM": 20}))

    f = junction_flank
    rl = 2 * f
    # right foldback: read half 1 on '+' ending at the fold, half 2 on '-'
    # covering the same window (query [f, 2f) maps reversed onto it)
    for i in range(n_fold_reads):
        a = amp_end - f + rng.randint(-jitter, jitter)
        sa_plus = f"{CHR},{a + 1},+,{f}M{f}S,60,50;"
        sa_minus = f"{CHR},{a + 1},-,{f}M{f}S,60,50;"
        recs.append(BamRecord(f"fr{i:04d}", 0, CHR, a, 60, f"{f}M{f}S",
                              seq="A" * rl, tags={"NM": 50, "SA": sa_minus}))
        recs.append(BamRecord(f"fr{i:04d}", 0x810, CHR, a, 60, f"{f}M{f}S",
                              seq="*", tags={"NM": 50, "SA": sa_plus}))
    # left foldback: half 1 on '-' exiting at the fold (ref start), half 2
    # on '+' re-entering at the same position
    for i in range(n_fold_reads):
        p = amp_start + rng.randint(-jitter, jitter)
        sa_minus = f"{CHR},{p + 1},-,{f}S{f}M,60,50;"
        sa_plus = f"{CHR},{p + 1},+,{f}S{f}M,60,50;"
        recs.append(BamRecord(f"fl{i:04d}", 0x10, CHR, p, 60, f"{f}S{f}M",
                              seq="A" * rl, tags={"NM": 50, "SA": sa_plus}))
        recs.append(BamRecord(f"fl{i:04d}", 0x800, CHR, p, 60, f"{f}S{f}M",
                              seq="*", tags={"NM": 50, "SA": sa_minus}))

    bam_path = os.path.join(out_dir, "sim_bfb.bam")
    write_bam(bam_path, [(CHR, CHR_LEN)], recs)

    cns_path = os.path.join(out_dir, "sim_bfb.cns")
    amp_cn = 2.0 * (bg_cov + amp_extra_cov) / bg_cov
    with open(cns_path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        pos = 0
        while pos < amp_start:
            end = min(pos + 5_000_000, amp_start)
            fp.write(f"{CHR}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
            pos = end
        fp.write(f"{CHR}\t{amp_start}\t{amp_end}\t-\t"
                 f"{math.log2(amp_cn / 2.0)}\t{bg_cov + amp_extra_cov}\n")
        fp.write(f"{CHR}\t{amp_end}\t{domain_end}\t-\t0.0\t{bg_cov}\n")

    seed_path = os.path.join(out_dir, "sim_bfb_seeds.bed")
    with open(seed_path, "w") as fp:
        fp.write(f"{CHR}\t{amp_start}\t{amp_end - 1}\n")
    return bam_path, cns_path, seed_path


def simulate_mixed_sample(
    out_dir: str,
    bg_cov: int = 20,
    amp_extra_cov: int = 200,
    n_junction_reads: int = 60,
    bg_read_len: int = 50_000,
    amp_read_len: int = 10_000,
    junction_flank: int = 10_000,
    jitter: int = 2,
    seed: int = 0,
    emit_seq: bool = False,
) -> Tuple[str, str, str]:
    """One sample carrying all three amplicon classes in separate regions:

      * ecDNA cycle          chr7:55.0-55.4M   (head-to-tail '+-' junction)
      * BFB foldback cycle   chr7:58.0-58.3M   ('++'/'--' self-folds)
      * translocated ecDNA   chr7:50.0-50.2M <-> chr8:127.0-127.2M

    Regions are separated by megabases so the breakpoint-connected BFS
    must keep them in distinct connected components (ccids) and emit one
    amplicon per class.
    """
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    recs: List[BamRecord] = []
    # emit_seq: realistic SEQ-bearing primaries (real nanopore primaries
    # always carry SEQ; '*' models are compact but make pysam-semantics
    # consumers divide by query_length == 0)
    sq = "" if emit_seq else "*"
    f = junction_flank
    rl = 2 * f

    # background tiling over both chromosome domains
    step = bg_read_len // bg_cov
    i = 0
    for (chrom, dstart, dend) in [(CHR, 45_000_000, 60_400_000),
                                  (CHR2, 120_000_000, 132_000_000)]:
        for start in range(dstart, dend - bg_read_len, step):
            recs.append(BamRecord(f"bg{i:07d}", 0, chrom, start, 60,
                                  f"{bg_read_len}M", seq=sq, tags={"NM": 100}))
            i += 1

    regions = [(CHR, 55_000_000, 55_400_000),   # ecDNA
               (CHR, 58_000_000, 58_300_000),   # BFB
               (CHR, 50_000_000, 50_200_000),   # translocation, chr7 side
               (CHR2, 127_000_000, 127_200_000)]  # translocation, chr8 side
    astep = max(amp_read_len // amp_extra_cov, 1)
    i = 0
    for (chrom, s, e) in regions:
        for start in range(s, e - amp_read_len, astep):
            recs.append(BamRecord(f"amp{i:07d}", 0, chrom, start, 60,
                                  f"{amp_read_len}M", seq=sq, tags={"NM": 20}))
            i += 1

    def junction(tag, k, c1, p1, c2, p2):
        """[p1-flank, p1) on c1:'+' then [p2, p2+flank) on c2:'+'."""
        a = p1 - f
        sa1 = f"{c1},{a + 1},+,{f}M{f}S,60,50;"
        sa2 = f"{c2},{p2 + 1},+,{f}S{f}M,60,50;"
        recs.append(BamRecord(f"{tag}{k:04d}", 0, c1, a, 60, f"{f}M{f}S",
                              seq="A" * rl, tags={"NM": 50, "SA": sa2}))
        recs.append(BamRecord(f"{tag}{k:04d}", 0x800, c2, p2, 60,
                              f"{f}S{f}M", seq="*", tags={"NM": 50, "SA": sa1}))

    for k in range(n_junction_reads):
        j1, j2 = rng.randint(-jitter, jitter), rng.randint(-jitter, jitter)
        # ecDNA head-to-tail
        junction("jec", k, CHR, 55_400_000 + j1, CHR, 55_000_000 + j2)
        # translocated ecDNA: chr7 end -> chr8 start, chr8 end -> chr7 start
        junction("jab", k, CHR, 50_200_000 + j1, CHR2, 127_000_000 + j2)
        junction("jba", k, CHR2, 127_200_000 + j1, CHR, 50_000_000 + j2)
        # BFB right fold (read half 2 on '-')
        a = 58_300_000 - f + rng.randint(-jitter, jitter)
        sa_p = f"{CHR},{a + 1},+,{f}M{f}S,60,50;"
        sa_m = f"{CHR},{a + 1},-,{f}M{f}S,60,50;"
        recs.append(BamRecord(f"fr{k:04d}", 0, CHR, a, 60, f"{f}M{f}S",
                              seq="A" * rl, tags={"NM": 50, "SA": sa_m}))
        recs.append(BamRecord(f"fr{k:04d}", 0x810, CHR, a, 60, f"{f}M{f}S",
                              seq="*", tags={"NM": 50, "SA": sa_p}))
        # BFB left fold (read half 1 on '-')
        p = 58_000_000 + rng.randint(-jitter, jitter)
        sa_m = f"{CHR},{p + 1},-,{f}S{f}M,60,50;"
        sa_p = f"{CHR},{p + 1},+,{f}S{f}M,60,50;"
        recs.append(BamRecord(f"fl{k:04d}", 0x10, CHR, p, 60, f"{f}S{f}M",
                              seq="A" * rl, tags={"NM": 50, "SA": sa_p}))
        recs.append(BamRecord(f"fl{k:04d}", 0x800, CHR, p, 60, f"{f}S{f}M",
                              seq="*", tags={"NM": 50, "SA": sa_m}))

    bam_path = os.path.join(out_dir, "sim_mixed.bam")
    write_bam(bam_path, [(CHR, CHR_LEN), (CHR2, CHR2_LEN)], recs)

    amp_cn = 2.0 * (bg_cov + amp_extra_cov) / bg_cov
    cns_path = os.path.join(out_dir, "sim_mixed.cns")
    with open(cns_path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        for (chrom, dstart, dend), amps in [
            ((CHR, 45_000_000, 60_400_000),
             [(50_000_000, 50_200_000), (55_000_000, 55_400_000),
              (58_000_000, 58_300_000)]),
            ((CHR2, 120_000_000, 132_000_000),
             [(127_000_000, 127_200_000)]),
        ]:
            pos = dstart
            for (s, e) in amps:
                while pos < s:
                    end = min(pos + 2_000_000, s)
                    fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
                    pos = end
                fp.write(f"{chrom}\t{s}\t{e}\t-\t"
                         f"{math.log2(amp_cn / 2.0)}\t{bg_cov + amp_extra_cov}\n")
                pos = e
            while pos < dend:
                end = min(pos + 2_000_000, dend)
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
                pos = end

    seed_path = os.path.join(out_dir, "sim_mixed_seeds.bed")
    with open(seed_path, "w") as fp:
        fp.write(f"{CHR}\t50000000\t50199999\n")
        fp.write(f"{CHR}\t55000000\t55399999\n")
        fp.write(f"{CHR}\t58000000\t58299999\n")
    return bam_path, cns_path, seed_path
