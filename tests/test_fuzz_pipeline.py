"""Randomized pipeline robustness: arbitrary chimera soups must not crash
reconstruct/cycles, and outputs must stay parseable."""
import math
import os
import random

import pytest

from coral_tpu.cycle2bed import convert_cycles_to_bed
from coral_tpu.graph.breakpoint_graph import parse_graph_file
from coral_tpu.io.bamwrite import BamRecord, write_bam
from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs

CHRS = [("chr7", 159_345_973), ("chr8", 145_138_636)]


def random_sample(tmp_path, seed):
    rng = random.Random(seed)
    recs = []
    # background
    for chrom, dstart, dend in [("chr7", 50_000_000, 60_000_000),
                                ("chr8", 120_000_000, 130_000_000)]:
        for i, start in enumerate(range(dstart, dend - 20_000, 1000)):
            recs.append(BamRecord(f"bg_{chrom}_{i:06d}", 0, chrom, start, 60,
                                  "20000M", seq="*"))
    # random junction archetypes, each with enough supporting reads to form
    # a cluster (plus jitter), in random orientations and chromosomes
    k = 0
    for arch in range(rng.randint(2, 6)):
        c1 = rng.choice(["chr7", "chr8"])
        st1 = rng.choice("++-")            # occasional '-'-strand first part
        if rng.random() < 0.25:
            # foldback archetype: same chrom, (near-)same position,
            # opposite strands (BFB-like '++'/'--' self-edges)
            c2 = c1
            st2 = "-" if st1 == "+" else "+"
        else:
            c2 = rng.choice(["chr7", "chr8"])
            st2 = rng.choice("+-")
        base1 = 55_000_000 if c1 == "chr7" else 125_000_000
        base2 = 55_000_000 if c2 == "chr7" else 125_000_000
        p1 = base1 + rng.randrange(0, 390_000)
        p2 = p1 if (c2 == c1 and st2 != st1 and rng.random() < 0.5) \
            else base2 + rng.randrange(0, 390_000)
        m = rng.randrange(2000, 8000)
        support = rng.randint(25, 45)
        for _ in range(support):
            j1 = p1 + rng.randint(-3, 3)
            j2 = p2 + rng.randint(-3, 3)
            mq1 = rng.choice([60, 60, 60, 30])
            mq2 = rng.choice([60, 60, 60, 30])
            # query [0, m) on side 1, [m, 2m) on side 2; '-'-strand CIGARs
            # are in reference orientation
            cig1 = f"{m}M{m}S" if st1 == "+" else f"{m}S{m}M"
            cig2 = f"{m}S{m}M" if st2 == "+" else f"{m}M{m}S"
            sa1 = f"{c1},{j1 + 1},{st1},{cig1},{mq1},{rng.randrange(0, 200)};"
            sa2 = f"{c2},{j2 + 1},{st2},{cig2},{mq2},{rng.randrange(0, 200)};"
            f1 = 0x10 if st1 == "-" else 0
            f2 = 0x800 | (0x10 if st2 == "-" else 0)
            recs.append(BamRecord(f"cx{k:05d}", f1, c1, j1, mq1, cig1,
                                  seq="A" * (2 * m), tags={"SA": sa2, "NM": 9}))
            recs.append(BamRecord(f"cx{k:05d}", f2, c2, j2, mq2, cig2,
                                  seq="*", tags={"SA": sa1, "NM": 9}))
            k += 1
    # random large-deletion reads
    for k in range(rng.randint(0, 40)):
        chrom = rng.choice(["chr7", "chr8"])
        base = 55_000_000 if chrom == "chr7" else 125_000_000
        s = base + rng.randrange(0, 300_000)
        d = rng.randrange(700, 60_000)
        recs.append(BamRecord(f"dx{k:05d}", 0, chrom, s,
                              rng.choice([60, 40, 10]),
                              f"5000M{d}D5000M", seq="*"))
    bam_p = str(tmp_path / f"fuzz{seed}.bam")
    write_bam(bam_p, CHRS, recs)
    cns_p = str(tmp_path / f"fuzz{seed}.cns")
    with open(cns_p, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\n")
        for chrom, dstart, dend in [("chr7", 50_000_000, 60_000_000),
                                    ("chr8", 120_000_000, 130_000_000)]:
            pos = dstart
            while pos < dend:
                end = min(pos + 2_000_000, dend)
                amp = (pos <= 55_000_000 < end) or (pos <= 125_000_000 < end)
                log2 = math.log2(8.0 / 2) if amp and rng.random() < 0.8 else 0.0
                fp.write(f"{chrom}\t{pos}\t{end}\t-\t{log2}\n")
                pos = end
    seeds_p = str(tmp_path / f"fuzz{seed}_seeds.bed")
    with open(seeds_p, "w") as fp:
        fp.write("chr7\t55000000\t55399999\n")
    return bam_p, cns_p, seeds_p


def _check_cycle_invariants(graph, cycles_fn):
    """Decomposition invariants: cycles reference real segments, weights
    are positive and sorted descending, and total per-sequence-edge usage
    respects the edge's CN cap (up to the greedy resolution floor)."""
    segments = {}
    weights = []
    usage = {}
    for ln in open(cycles_fn):
        f = ln.rstrip("\n").split("\t")
        if f[0] == "Segment":
            segments[f[1]] = (f[2], int(f[3]), int(f[4]))
        elif ln.startswith("Cycle="):
            fields = dict(kv.split("=", 1) for kv in ln.strip().split(";"))
            w = float(fields["Copy_count"])
            assert w > 0
            weights.append(w)
            toks = [t for t in fields["Segments"].split(",") if t]
            for t in toks:
                sid, ori = t[:-1], t[-1]
                assert ori in "+-"
                assert sid == "0" or sid in segments, f"unknown segment {sid}"
                if sid != "0":
                    usage[sid] = usage.get(sid, 0.0) + w
    assert weights == sorted(weights, reverse=True)
    # map file segments back to graph sequence edges by coordinates
    edge_cn = {}
    for e in graph.sequence_edges:
        edge_cn[(e.chrom, e.start, e.end)] = e.cn
    for sid, used in usage.items():
        chrom, s, e = segments[sid]
        if (chrom, s, e) in edge_cn:
            assert used <= edge_cn[(chrom, s, e)] + 0.1 + 1e-6, \
                f"segment {sid} usage {used} exceeds CN {edge_cn[(chrom, s, e)]}"


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_fuzz_pipeline_no_crash(tmp_path, seed):
    bam_p, cns_p, seeds_p = random_sample(tmp_path, seed)
    prefix = str(tmp_path / f"out{seed}")
    rec = reconstruct_graphs(bam_p, seeds_p, cns_p, prefix)
    reconstruct_cycles(rec, prefix)
    for gi in range(len(rec.graphs)):
        gf = f"{prefix}_amplicon{gi + 1}_graph.txt"
        assert os.path.exists(gf)
        parsed = parse_graph_file(gf)   # output parses back
        assert len(parsed.sequence_edges) >= 1
        cf = f"{prefix}_amplicon{gi + 1}_cycles.txt"
        assert os.path.exists(cf)
        _check_cycle_invariants(rec.graphs[gi], cf)
        convert_cycles_to_bed(cf, f"{prefix}_a{gi}.bed")
