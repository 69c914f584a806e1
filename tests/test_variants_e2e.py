"""End-to-end tests for deletion (CIGAR-gap) and inversion breakpoints,
plus pipeline determinism."""
import filecmp
import os

import pytest

from coral_tpu.io.bamwrite import BamRecord, write_bam
from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs

CHR = "chr7"
CHR_LEN = 159_345_973


def write_cns(path, amp_start, amp_end, amp_cn, bg_cov=20, domain_end=60_400_000):
    import math
    with open(path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        pos = 0
        while pos < amp_start:
            end = min(pos + 5_000_000, amp_start)
            fp.write(f"{CHR}\t{pos}\t{end}\t-\t0.0\t{bg_cov}\n")
            pos = end
        fp.write(f"{CHR}\t{amp_start}\t{amp_end}\t-\t"
                 f"{math.log2(amp_cn / 2.0)}\t{bg_cov}\n")
        fp.write(f"{CHR}\t{amp_end}\t{domain_end}\t-\t0.0\t{bg_cov}\n")


def background(recs, bg_cov=20, read_len=50_000, domain_end=60_400_000):
    step = read_len // bg_cov
    for i, start in enumerate(range(0, domain_end - read_len, step)):
        recs.append(BamRecord(f"bg{i:07d}", 0, CHR, start, 60,
                              f"{read_len}M", seq="*", tags={"NM": 100}))


def test_smalldel_breakpoint_e2e(tmp_path):
    """An amplified region whose reads carry a 50 kb deletion in their
    CIGARs: the deletion breakpoint must come from the small-del path
    (no SA tags involved) and split the graph."""
    amp_start, amp_end = 55_000_000, 55_400_000
    del_start, del_end = 55_150_000, 55_200_000   # 50 kb deletion
    recs = []
    background(recs)
    # amplified reads spanning the deletion: 40M ... 50000D ... 40M
    n_amp = 60
    for i in range(n_amp):
        off = i * 600
        s = del_start - 40_000 + off
        cig = f"{del_start - s}M{del_end - del_start}D{40_000 - off + 10_000}M"
        recs.append(BamRecord(f"del{i:04d}", 0, CHR, s, 60, cig, seq="*",
                              tags={"NM": 60}))
    bam_p = str(tmp_path / "del.bam")
    write_bam(bam_p, [(CHR, CHR_LEN)], recs)
    cns_p = str(tmp_path / "del.cns")
    write_cns(cns_p, amp_start, amp_end, 8.0)
    seeds_p = str(tmp_path / "seeds.bed")
    open(seeds_p, "w").write(f"{CHR}\t{amp_start}\t{amp_end - 1}\n")

    rec = reconstruct_graphs(bam_p, seeds_p, cns_p, str(tmp_path / "o"))
    assert len(rec.new_bp_list) == 1
    bp = rec.new_bp_list[0]
    # deletion breakpoint: (del_end, -, del_start, +) orientation
    assert bp[2] == "-" and bp[5] == "+"
    assert abs(bp[1] - del_end) <= 1 and abs(bp[4] - del_start) <= 1
    assert len(bp[-1]) == n_amp
    g = rec.graphs[0]
    assert len(g.sequence_edges) == 3
    assert len(g.discordant_edges) == 1


def test_inversion_breakpoint_e2e(tmp_path):
    """Chimeric reads whose second part aligns '-': a foldback-like
    inversion junction (++ orientation after canonicalization)."""
    amp_start, amp_end = 55_000_000, 55_400_000
    flank = 10_000
    recs = []
    background(recs)
    n_inv = 60
    for i in range(n_inv):
        # part1: [inv-flank, inv) on '+'; part2: [inv, inv+flank) on '-'
        inv = 55_200_000
        p1 = inv - flank
        rl = 2 * flank
        sa1 = f"{CHR},{p1 + 1},+,{flank}M{flank}S,60,50;"
        # '-'-strand SA CIGAR is in reference orientation: the read's
        # second half maps with M leading and the first half soft-clipped
        sa2 = f"{CHR},{inv + 1},-,{flank}M{flank}S,60,50;"
        recs.append(BamRecord(f"inv{i:04d}", 0, CHR, p1, 60,
                              f"{flank}M{flank}S", seq="A" * rl,
                              tags={"NM": 50, "SA": sa2}))
        recs.append(BamRecord(f"inv{i:04d}", 0x810, CHR, inv, 60,
                              f"{flank}M{flank}S", seq="*",
                              tags={"NM": 50, "SA": sa1}))
    bam_p = str(tmp_path / "inv.bam")
    write_bam(bam_p, [(CHR, CHR_LEN)], recs)
    cns_p = str(tmp_path / "inv.cns")
    write_cns(cns_p, amp_start, amp_end, 8.0)
    seeds_p = str(tmp_path / "seeds.bed")
    open(seeds_p, "w").write(f"{CHR}\t{amp_start}\t{amp_end - 1}\n")

    rec = reconstruct_graphs(bam_p, seeds_p, cns_p, str(tmp_path / "o"))
    assert len(rec.new_bp_list) == 1
    bp = rec.new_bp_list[0]
    # inversion: both sides '+' after canonicalization
    assert bp[2] == "+" and bp[5] == "+"
    assert len(bp[-1]) == n_inv


def test_pipeline_deterministic(tmp_path):
    from coral_tpu.sim import simulate_ecdna
    bam, cns, seeds = simulate_ecdna(str(tmp_path / "s"), jitter=2)
    for run in ("a", "b"):
        rec = reconstruct_graphs(bam, seeds, cns, str(tmp_path / run))
        reconstruct_cycles(rec, str(tmp_path / run))
    for suffix in ("_amplicon1_graph.txt", "_amplicon1_cycles.txt"):
        assert filecmp.cmp(str(tmp_path / ("a" + suffix)),
                           str(tmp_path / ("b" + suffix)), shallow=False), suffix


def test_mesh_sharded_pipeline_identical(tmp_path):
    """BASELINE config #5: data-parallel breakpoint scoring over an
    8-device mesh produces byte-identical outputs to the default path."""
    from coral_tpu.io.bam import BamFile
    from coral_tpu.parallel import make_mesh
    from coral_tpu.reconstruct import Reconstruction
    from coral_tpu.sim import simulate_ecdna

    bam_p, cns_p, seeds_p = simulate_ecdna(str(tmp_path / "s"), jitter=2)

    def run(mesh, tag):
        rec = Reconstruction(BamFile(bam_p), seeds_p)
        rec.read_cns(cns_p)
        rec.collect()
        rec.hash_to_segments()
        rec.find_amplicon_intervals()
        rec.find_smalldel_breakpoints()
        rec.find_breakpoints(mesh=mesh)
        rec.build_graph()
        rec.assign_cov()
        rec.compute_cn()
        from coral_tpu.graph.breakpoint_graph import write_graph_file
        out = str(tmp_path / f"{tag}_graph.txt")
        write_graph_file(rec.graphs[0], out)
        return out

    a = run(None, "single")
    b = run(make_mesh(8), "mesh8")
    c = run(make_mesh(2), "mesh2")
    assert open(a).read() == open(b).read() == open(c).read()


def test_through_reads_produce_path_constraints(tmp_path):
    """Three-part through reads (A_end -> whole B -> A_start) must surface
    as >= 3-sequence-edge subpath constraints in cycles.txt, marked
    Satisfied by the decomposition (the cyclic walk traverses them)."""
    from coral_tpu.sim import simulate_translocated_ecdna

    bam, cns, seeds = simulate_translocated_ecdna(
        str(tmp_path / "sim"), seed=9,
        amp_b=(127_000_000, 127_030_000),
        bg_cov=2, amp_extra_cov=30, n_junction_reads=30,
        bg_read_len=8_000, amp_read_len=8_000, n_through_reads=8)
    prefix = str(tmp_path / "out")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    text = open(prefix + "_amplicon1_cycles.txt").read()
    pc_lines = [l for l in text.splitlines() if l.startswith("Path constraint")]
    assert pc_lines, text
    assert any("Satisfied" in l for l in pc_lines), pc_lines
    # the through-read constraint spans >= 3 segments
    assert any(l.split("\t")[2].count(",") >= 2 for l in pc_lines), pc_lines
