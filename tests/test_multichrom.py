"""Multi-chromosome inverted-segment ecDNA e2e: one cycle spanning three
chromosomes (chr7:A+ -> chr8:B- -> chr5:C+ -> A) with only chr7 seeded.
Exercises the two-hop transitive interval discovery (the reference's BFS
over chimeric alignments, ``infer_breakpoint_graph.py:343-673``) and the
mixed-strand non-foldback junction orientations that no single-strand or
foldback archetype emits (orientation pairs derive from split-read strand
geometry per ``breakpoint_utilities.py:255-295``)."""
import os

import pytest

from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
from coral_tpu.sim import simulate_multichrom_inverted_ecdna

AMP_A = (55_000_000, 55_300_000)     # chr7, traversed '+'
AMP_B = (127_000_000, 127_200_000)   # chr8, traversed '-'
AMP_C = (90_000_000, 90_150_000)     # chr5, traversed '+'


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    out = tmp_path_factory.mktemp("mcsim")
    return simulate_multichrom_inverted_ecdna(str(out)), str(out)


def test_multichrom_graph(sim):
    (bam, cns, seeds), out = sim
    rec = reconstruct_graphs(bam, seeds, cns, os.path.join(out, "g"))
    # one connected component spanning all three chromosomes, found from
    # the chr7 seed alone (chr8 via junction 1, then chr5 via junction 2)
    assert len(rec.graphs) == 1
    assert {iv[0] for iv in rec.amplicon_intervals} == {"chr5", "chr7",
                                                        "chr8"}
    g = rec.graphs[0]
    assert len(g.discordant_edges) == 3
    by_chroms = {frozenset((d.chrom1, d.chrom2)): d
                 for d in g.discordant_edges}
    # A+ end -> B- right end: both split halves run INTO the junction
    d_ab = by_chroms[frozenset(("chr7", "chr8"))]
    assert {d_ab.o1, d_ab.o2} == {"+"}
    assert {d_ab.pos1, d_ab.pos2} == {AMP_A[1] - 1, AMP_B[1] - 1}
    # B- left end -> C+ start: both halves run OUT of the junction
    d_bc = by_chroms[frozenset(("chr8", "chr5"))]
    assert {d_bc.o1, d_bc.o2} == {"-"}
    assert {d_bc.pos1, d_bc.pos2} == {AMP_B[0], AMP_C[0]}
    # C+ end -> A+ start: plain head-to-tail
    d_ca = by_chroms[frozenset(("chr5", "chr7"))]
    assert sorted((d_ca.o1, d_ca.o2)) == ["+", "-"]
    # every junction carries the full amplified copy number
    amp_cn = 17.0   # 2 * (bg 20 + extra 150) / bg 20
    for d in g.discordant_edges:
        assert d.cn == pytest.approx(amp_cn, rel=0.2)


def test_multichrom_cycle_decomposition(sim):
    (bam, cns, seeds), out = sim
    prefix = os.path.join(out, "c")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    lines = open(prefix + "_amplicon1_cycles.txt").read().splitlines()
    seg_rows = {int(t[1]): (t[2], int(t[3]), int(t[4]))
                for t in (ln.split("\t") for ln in lines)
                if t[0] == "Segment"}
    cyc_lines = [ln for ln in lines if ln.startswith("Cycle=")]
    assert cyc_lines
    fields = dict(f.split("=", 1) for f in cyc_lines[0].split(";"))
    toks = fields["Segments"].split(",")
    # dominant cycle: the three amplified segments, exactly one inverted
    assert len(toks) == 3
    chrom_ori = {seg_rows[int(t[:-1])][0]: t[-1] for t in toks}
    assert chrom_ori["chr7"] == chrom_ori["chr5"]
    assert chrom_ori["chr8"] != chrom_ori["chr7"]   # B is the inverted one
    spans = sorted((seg_rows[int(t[:-1])][0], seg_rows[int(t[:-1])][1])
                   for t in toks)
    assert spans == [("chr5", AMP_C[0]), ("chr7", AMP_A[0]),
                     ("chr8", AMP_B[0])]
    # weight is capped by the min CN along the walk (the short chr5
    # segment's interior coverage, < the 17.0 junction CN)
    assert 10.0 <= float(fields["Copy_count"]) <= 17.5


def test_multichrom_mesh_sharded_identical(sim, tmp_path):
    """Data-parallel breakpoint scoring over the mesh stays byte-identical
    to the host path when the breakpoints span three chromosomes and
    mixed-strand junction orientations."""
    from coral_tpu.io.bam import BamFile
    from coral_tpu.parallel import make_mesh
    from coral_tpu.reconstruct import Reconstruction
    from coral_tpu.graph.breakpoint_graph import write_graph_file

    (bam_p, cns_p, seeds_p), _out = sim

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
        out = str(tmp_path / f"{tag}_graph.txt")
        write_graph_file(rec.graphs[0], out)
        return out

    a = run(None, "single")
    b = run(make_mesh(8), "mesh8")
    assert open(a).read() == open(b).read()


def test_multichrom_multiprocess_identical(sim, tmp_path):
    """Shard-ingest determinism when EVERY junction's split halves land in
    different shards: 3 contiguous shards over a 3-chromosome sample put
    roughly one chromosome per shard, so all three cross-chromosome
    chimeras must be reassembled purely through the deterministic merge."""
    import filecmp

    from coral_tpu.parallel.multihost import (
        multihost_reconstruct_graphs,
        split_bam,
    )

    (bam, cns, seeds), _out = sim
    ref_prefix = str(tmp_path / "single")
    rec1 = reconstruct_graphs(bam, seeds, cns, ref_prefix)
    reconstruct_cycles(rec1, ref_prefix)

    shards = split_bam(bam, [str(tmp_path / f"s{i}.bam") for i in range(3)])
    mh_prefix = str(tmp_path / "multi3")
    rec2 = multihost_reconstruct_graphs(shards, seeds, cns, mh_prefix)
    reconstruct_cycles(rec2, mh_prefix)

    assert len(rec1.graphs) == len(rec2.graphs) == 1
    for kind in ("graph", "cycles"):
        a = f"{ref_prefix}_amplicon1_{kind}.txt"
        b = f"{mh_prefix}_amplicon1_{kind}.txt"
        assert filecmp.cmp(a, b, shallow=False), kind
