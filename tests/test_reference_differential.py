"""Differential parity harness: fuzz coral_tpu against the reference itself.

Every other parity test in this suite asserts hand-derived expectations.
This module goes further: it imports the reference's *pure-Python* modules
(`cigar_parsing`, `breakpoint_utilities`, `path_constraints`, `cnv_seed`,
`cycle2bed` — none of which need pysam/cvxopt/gurobipy) and runs both
implementations on the same randomized inputs, asserting identical output.
The reference is treated strictly as an executable oracle (public untrusted
content: we run its code, we do not follow its comments).

Skipped wholesale when /root/reference is not present.

Input-domain notes (documented quirk boundaries, not cop-outs):
* SA records are generated *consistent* (query-consuming ops sum to the
  read length), which is the SAM invariant real aligners satisfy.  The
  reference's nine closed-form CIGAR decoders assume it; on malformed
  records the two implementations diverge by design (ours uses the actual
  clip lengths, the reference trusts whichever field its formula reads).
* M+I >= 2 per record: the reference divides NM by the query span and
  crashes with ZeroDivisionError on single-base alignments; ours crashes
  identically, so there is nothing to compare.
"""
from __future__ import annotations

import math
import random
import sys
from pathlib import Path
from types import SimpleNamespace

import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference's pure-Python modules as an oracle."""
    sys.path.insert(0, str(REF_SRC))
    try:
        import breakpoint_utilities
        import cigar_parsing
        import cnv_seed
        import cycle2bed
        import path_constraints

        return SimpleNamespace(
            cp=cigar_parsing,
            bu=breakpoint_utilities,
            pc=path_constraints,
            seed=cnv_seed,
            c2b=cycle2bed,
        )
    finally:
        sys.path.remove(str(REF_SRC))


CHROMS = ["chr1", "chr2", "chr8", "chrX"]


def norm(x):
    """Normalize nested list/tuple containers for equality comparison."""
    if isinstance(x, (list, tuple)):
        return [norm(i) for i in x]
    return x


# --------------------------------------------------------------------------
# SA-record / chimera generation
# --------------------------------------------------------------------------

SHAPES = ["SM", "MS", "SMS", "SMD", "MDS", "SMDS", "SMI", "MIS", "SMIS"]


def rand_sa_record(rng, rl):
    """One consistent SA record with a random reference-supported shape."""
    shape = rng.choice(SHAPES)
    n_clip = shape.count("S")
    ins = rng.randint(1, 200) if "I" in shape else 0
    dele = rng.randint(1, 400) if "D" in shape else 0
    if rl - ins - n_clip < 3:
        return None
    m = rng.randint(2, rl - ins - n_clip)
    clips = rl - ins - m
    if clips < n_clip:
        return None
    mi = shape.index("M")
    if n_clip == 2:
        left = rng.randint(1, clips - 1)
        right = clips - left
    elif shape[0] == "S":
        left, right = clips, 0
    else:
        left, right = 0, clips
    parts = []
    for i, op in enumerate(shape):
        if op == "S":
            parts.append(f"{left}S" if i < mi else f"{right}S")
        elif op == "M":
            parts.append(f"{m}M")
        elif op == "D":
            parts.append(f"{dele}D")
        else:
            parts.append(f"{ins}I")
    return (
        f"{rng.choice(CHROMS)},{rng.randint(1, 1_000_000)},{rng.choice('+-')},"
        f"{''.join(parts)},{rng.randint(0, 60)},{round(rng.uniform(0, 300), 2)}"
    )


def sa_for_segment(chrom, pos1, strand, qs, qe, rl, mapq, nm, rng):
    """A consistent SA record mapping query [qs, qe] at 1-based pos1.

    Returns None for combinations the reference rejects (no clip at all).
    """
    m = qe - qs + 1
    if m < 2:
        return None
    dele = rng.randint(1, 400) if rng.random() < 0.3 else 0
    left = qs if strand == "+" else rl - 1 - qe
    right = rl - 1 - qe if strand == "+" else qs
    if left == 0 and right == 0:
        return None
    parts = []
    if left:
        parts.append(f"{left}S")
    parts.append(f"{m}M")
    if dele:
        parts.append(f"{dele}D")
    if right:
        parts.append(f"{right}S")
    return f"{chrom},{pos1},{strand},{''.join(parts)},{mapq},{nm}"


def junction_chimera(rng, hotspots, rl=None):
    """A realistic chimeric read: query-tiling segments mapped near hotspots.

    Query segments tile [0, rl) with small inter-segment gaps/overlaps so the
    reference's query-gap gate (>= -min_bp_match_cutoff) actually fires, and
    reference positions cluster around shared loci so interval overlap and
    breakpoint clustering see dense data.
    """
    rl = rl or rng.randint(3000, 30000)
    k = rng.randint(2, 5)
    cuts = sorted(rng.sample(range(300, rl - 300), k - 1))
    bounds = [0] + cuts + [rl - 1]
    sas = []
    for i in range(k):
        qs = bounds[i] + (rng.randint(0, 150) if i else rng.randint(1, 120))
        qe = bounds[i + 1] - (rng.randint(0, 150) if i < k - 1 else rng.randint(1, 120))
        if qe - qs < 2:
            return None
        chrom, base = rng.choice(hotspots)
        pos1 = max(1, base + rng.randint(-40_000, 40_000))
        mapq = rng.choice([60, 60, 60, 40, 22, 20, 8, 2])
        nm = round(rng.uniform(0, (qe - qs + 1) * 0.3), 2)
        rec = sa_for_segment(chrom, pos1, rng.choice("+-"), qs, qe, rl, mapq, nm, rng)
        if rec is None:
            return None
        sas.append(rec)
    return rl, sas


# --------------------------------------------------------------------------
# Tier 1: CIGAR/SA decoding
# --------------------------------------------------------------------------

def test_alignment_from_satags_differential(ref):
    from coral_tpu.ops import chimera as oc

    rng = random.Random(1)
    trials = 0
    while trials < 1500:
        rl = rng.randint(500, 20000)
        want = rng.randint(1, 6)
        sas, guard = [], 0
        while len(sas) < want and guard < 60:
            rec = rand_sa_record(rng, rl)
            guard += 1
            if rec:
                sas.append(rec)
        if len(sas) < want:
            continue
        trials += 1
        got_ref = ref.cp.alignment_from_satags(sas, rl)
        got = oc.alignment_from_sa(sas, rl)
        assert got_ref[0] == got.q, (sas, rl)
        assert got_ref[1] == got.r
        assert got_ref[2] == got.mapq
        assert got_ref[3] == got.nm


def test_alignment_from_satags_rejects_clipless(ref):
    from coral_tpu.ops import chimera as oc

    sas = ["chr1,100,+,500M,60,3.0"]
    assert ref.cp.alignment_from_satags(sas, 500) == ([], [], [])
    assert oc.alignment_from_sa(sas, 500) is None


# --------------------------------------------------------------------------
# Tier 1: interval predicates and canonicalization
# --------------------------------------------------------------------------

def test_interval_predicates_differential(ref):
    from coral_tpu.ops import breakpoints as ob

    rng = random.Random(2)
    for _ in range(4000):
        a = [rng.choice(CHROMS), rng.randint(0, 1000), rng.randint(0, 1000)]
        b = [rng.choice(CHROMS), rng.randint(0, 1000), rng.randint(0, 1000)]
        assert ref.bu.interval_overlap(a, b) == ob.interval_overlap(a, b)
        assert ref.bu.interval_include(a, b) == ob.interval_include(a, b)
        assert ref.bu.interval_adjacent(a, b) == ob.interval_adjacent(a, b)
        intl = [
            [rng.choice(CHROMS), rng.randint(0, 1000), rng.randint(0, 1000)]
            for _ in range(rng.randint(0, 5))
        ]
        assert ref.bu.interval_overlap_l(a, intl) == ob.interval_overlap_l(a, intl)
        assert ref.bu.interval_include_l(a, intl) == ob.interval_include_l(a, intl)
        ro, rp = ref.bu.interval_exclusive(a, intl)
        oo, op_ = ob.interval_exclusive(a, intl)
        assert ro == oo and norm(rp) == norm(op_)


def test_interval2bp_differential(ref):
    from coral_tpu.ops import breakpoints as ob

    rng = random.Random(3)
    for t in range(4000):
        def rint():
            chrom = rng.choice(CHROMS)
            s = rng.randint(0, 2_000_000)
            e = s + rng.randint(0, 100_000)
            strand = rng.choice("+-")
            return [chrom, s, e, strand] if strand == "+" else [chrom, e, s, strand]

        r1, r2 = rint(), rint()
        r = (f"read{t}", 0, 1)
        rgap = rng.randint(-200, 500)
        assert norm(ref.bu.interval2bp(r1, r2, r, rgap)) == norm(
            ob.interval_to_bp(r1, r2, r, rgap)
        )


def test_sort_chrom_names_differential(ref):
    from coral_tpu.constants import sort_chrom_names

    rng = random.Random(4)
    pool = [f"chr{i}" for i in range(1, 23)] + ["chrX", "chrY", "chrM"]
    for _ in range(200):
        sample = rng.sample(pool, rng.randint(1, len(pool)))
        assert ref.bu.sort_chrom_names(sample) == sort_chrom_names(sample)


# --------------------------------------------------------------------------
# Tier 1: breakpoint extraction / clustering / consensus
# --------------------------------------------------------------------------

class _ChimAdapter:
    """Duck-typed Chimera over a reference (qint, rint, qual, nm) tuple."""

    def __init__(self, t):
        self.q, self.r, self.mapq, self.nm = t

    def __len__(self):
        return len(self.q)


def _bp_population(ref, rng, n_reads):
    """Junction-rich bp rows produced identically by both implementations.

    Asserts alignment2bp{,_nm,_l,_nm_l} parity along the way and returns the
    reference-produced rows for the clustering stages.
    """
    from coral_tpu.ops import breakpoints as ob

    hotspots = [
        ("chr1", 500_000), ("chr1", 900_000),
        ("chr8", 300_000), ("chrX", 700_000),
    ]
    intervals = [[c, b - 120_000, b + 120_000] for c, b in hotspots]
    bps = []
    made = 0
    while made < n_reads:
        out = junction_chimera(rng, hotspots)
        if out is None:
            continue
        rl, sas = out
        ca = ref.cp.alignment_from_satags(sas, rl)
        if len(ca) == 3:
            continue
        made += 1
        rn = f"rd{made}"
        chim = _ChimAdapter(ca)
        i1, i2 = rng.choice(intervals), rng.choice(intervals)
        mq = rng.choice([20, 20, 20, 30])
        mnm = rng.choice([0.05, 0.15, 1000.0])
        gap_ = rng.choice([100.0, 40.0])

        r1 = ref.bu.alignment2bp((rn), (ca[0], ca[1], ca[2]), 100, mq, i1, i2)
        o1 = ob.chimera_to_bps(rn, chim, 100, mq, i1, i2)
        assert norm(r1) == norm(o1), (sas, i1, i2)
        r2 = ref.bu.alignment2bp_nm(rn, ca, 100, mq, mnm, i1, i2)
        o2 = ob.chimera_to_bps(rn, chim, 100, mq, i1, i2, max_nm=mnm)
        assert norm(r2) == norm(o2)
        r3 = ref.bu.alignment2bp_l(rn, (ca[0], ca[1], ca[2]), 100, mq, gap_, intervals)
        o3 = ob.chimera_to_bps_l(rn, chim, 100, mq, gap_, intervals)
        assert norm(r3) == norm(o3), (sas,)
        r4 = ref.bu.alignment2bp_nm_l(rn, ca, 100, mq, mnm, gap_, intervals)
        o4 = ob.chimera_to_bps_l(rn, chim, 100, mq, gap_, intervals, max_nm=mnm)
        assert norm(r4) == norm(o4)
        bps.extend(r1)
        bps.extend(r3)
    return bps


def test_alignment2bp_and_clustering_differential(ref):
    from coral_tpu.ops import breakpoints as ob

    rng = random.Random(5)
    bps = _bp_population(ref, rng, 800)
    assert len(bps) > 250, "generator must produce a junction-rich population"

    for mcs in (1, 2, 3):
        got_ref = ref.bu.cluster_bp_list(bps, mcs, 2000)
        got = ob.cluster_breakpoints(bps, mcs, 2000, engine="host")
        assert norm(got_ref) == norm(got), mcs

    clusters = ref.bu.cluster_bp_list(bps, 1, 2000)
    assert any(len(c) >= 3 for c in clusters), "need multi-member clusters"
    for cl in clusters:
        for cutoff in (200, 2000):
            rb, rr, rs, rleft = ref.bu.bpc2bp([list(x) for x in cl], cutoff)
            obp, orr, ost, oleft = ob.call_consensus_bp([list(x) for x in cl], cutoff)
            assert norm(rb) == norm(obp), (cl, cutoff)
            assert norm(rr) == norm(orr)
            assert all(abs(a - b) < 1e-9 for a, b in zip(rs, ost)), (rs, ost)
            assert norm(rleft) == norm(oleft)


def test_bp_match_differential(ref):
    from coral_tpu.ops import breakpoints as ob

    rng = random.Random(6)
    for _ in range(5000):
        def rbp():
            return [
                rng.choice(CHROMS), rng.randint(0, 5000), rng.choice("+-"),
                rng.choice(CHROMS), rng.randint(0, 5000), rng.choice("+-"),
                (), rng.randint(-100, 400), 0,
            ]

        b1, b2 = rbp(), rbp()
        if rng.random() < 0.5:
            b2 = list(b1)
            b2[1] += rng.randint(-3000, 3000)
            b2[4] += rng.randint(-3000, 3000)
        rgap = rng.randint(-100, 3000)
        cutoffs = [rng.choice([100, 200, 2000]), rng.choice([100, 200, 2000])]
        assert ref.bu.bp_match(b1, b2, rgap, cutoffs) == ob.bp_match(
            b1, b2, rgap, cutoffs
        )


# --------------------------------------------------------------------------
# Tier 2: path-constraint family over a shared graph
# --------------------------------------------------------------------------

class _RefGraphShim:
    """Reference-layout view of a coral_tpu BreakpointGraph.

    The reference path functions index edges as lists (sequence edge
    ``[chr, l, r, _, _, lr_count, lr_nc, size, cn]``, breakpoint edges
    ``[chr1, pos1, o1, chr2, pos2, o2, ...]``, ``breakpoint_graph.py:176-238``)
    and nodes as {node: [[seq],[conc],[disc],[src]]}.
    """

    def __init__(self, g):
        self.nodes = g.nodes
        self.sequence_edges = [
            [e.chrom, e.start, e.end, -1, -1, e.lr_count, e.lr_nc,
             e.end - e.start + 1, e.cn]
            for e in g.sequence_edges
        ]
        self.concordant_edges = [
            [e.chrom1, e.pos1, e.o1, e.chrom2, e.pos2, e.o2, -1, "None",
             e.lr_count, e.reads, e.cn]
            for e in g.concordant_edges
        ]
        self.discordant_edges = [
            [e.chrom1, e.pos1, e.o1, e.chrom2, e.pos2, e.o2, -1, "None",
             -1, e.lr_count, e.reads, e.cn]
            for e in g.discordant_edges
        ]
        self.endnodes = g.endnodes
        self.source_edges = [
            ["source", -1, "-", e.chrom, e.pos, e.o, -1, "None", e.lr_cn,
             e.cn]
            for e in g.source_edges
        ]


def _random_chain_graph(rng, n_segs=6, chrom="chr1"):
    """A contiguous chain of sequence edges + concordant joins + random
    discordant edges, in both our representation and the reference shim."""
    from coral_tpu.graph.breakpoint_graph import BreakpointGraph

    g = BreakpointGraph()
    start = rng.randint(10_000, 50_000)
    bounds = [start]
    for _ in range(n_segs):
        bounds.append(bounds[-1] + rng.randint(2_000, 60_000))
    for i in range(n_segs):
        s, e = bounds[i], bounds[i + 1] - 1
        g.add_node((chrom, s, "-"))
        g.add_node((chrom, e, "+"))
        g.add_sequence_edge(chrom, s, e, lr_count=rng.randint(1, 50),
                            lr_nc=rng.randint(100, 10_000))
        if i:
            g.add_concordant_edge(chrom, bounds[i] - 1, "+", chrom, bounds[i], "-",
                                  lr_count=rng.randint(1, 30))
    nodes = list(g.nodes)
    for _ in range(rng.randint(1, 3)):
        n1, n2 = rng.choice(nodes), rng.choice(nodes)
        try:
            g.add_discordant_edge(n1[0], n1[1], n1[2], n2[0], n2[1], n2[2],
                                  lr_count=rng.randint(1, 20))
        except (ValueError, KeyError):
            continue
    return g, _RefGraphShim(g), bounds


def test_valid_path_differential(ref):
    from coral_tpu.cycles import path_constraints as opc

    rng = random.Random(7)
    for _ in range(60):
        g, shim, bounds = _random_chain_graph(rng)
        rint = [
            "chr1",
            rng.randint(bounds[0], bounds[-1]),
            rng.randint(bounds[0], bounds[-1]),
        ]
        rint[1], rint[2] = min(rint[1], rint[2]), max(rint[1], rint[2])
        path = ref.pc.alignment_to_path(shim, rint)
        ours = opc.alignment_to_path(g, rint)
        assert norm(path) == norm(ours), (bounds, rint)
        assert ref.pc.valid_path(shim, path) == opc.valid_path(g, path)
        # corrupted variants must be judged identically
        for _ in range(5):
            mut = list(path)
            if not mut:
                break
            op = rng.randint(0, 2)
            if op == 0 and len(mut) > 1:
                del mut[rng.randrange(len(mut))]
            elif op == 1:
                mut[rng.randrange(len(mut))] = ("s", 999)
            else:
                mut.append(("c", 0))
            assert ref.pc.valid_path(shim, mut) == opc.valid_path(g, mut), mut


def test_traverse_through_sequence_edge_differential(ref):
    from coral_tpu.cycles import path_constraints as opc

    rng = random.Random(8)
    for _ in range(80):
        g, shim, _ = _random_chain_graph(rng)
        nodes = list(g.nodes)
        n1 = rng.choice(nodes)
        others = [n for n in nodes if n[2] != n1[2]]
        n2 = rng.choice(others)
        got_ref = ref.pc.traverse_through_sequence_edge(shim, n1, n2)
        got = opc.traverse_through_sequence_edge(g, n1, n2)
        assert norm(got_ref) == norm(got), (n1, n2)


def test_chimeric_alignment_to_path_differential(ref):
    from coral_tpu.cycles import path_constraints as opc

    rng = random.Random(9)
    checked = 0
    for _ in range(120):
        g, shim, bounds = _random_chain_graph(rng)
        if not g.discordant_edges:
            continue
        di = rng.randrange(len(g.discordant_edges))
        d = g.discordant_edges[di]
        node1 = (d.chrom1, d.pos1, d.o1)
        node2 = (d.chrom2, d.pos2, d.o2)
        # rints roughly covering the two breakpoint sides
        def rint_near(node):
            lo = max(bounds[0], node[1] - rng.randint(1_000, 30_000))
            hi = min(bounds[-1], node[1] + rng.randint(1_000, 30_000))
            strand = rng.choice("+-")
            return ([node[0], lo, hi, strand] if strand == "+"
                    else [node[0], hi, lo, strand])

        rints = [rint_near(node1), rint_near(node2)]
        ai1, ai2 = (0, 1) if rng.random() < 0.5 else (1, 0)
        got_ref = ref.pc.chimeric_alignment_to_path_i(shim, rints, ai1, ai2, di)
        got = opc.chimeric_alignment_to_path_i(g, rints, ai1, ai2, di)
        assert norm(got_ref) == norm(got), (rints, ai1, ai2, di)

        got_ref_l = ref.pc.chimeric_alignment_to_path_l(shim, rints, ai1, node1)
        got_l = opc.chimeric_alignment_to_path_l(g, rints, ai1, node1)
        assert norm(got_ref_l) == norm(got_l)
        got_ref_r = ref.pc.chimeric_alignment_to_path_r(shim, rints, ai2, node2)
        got_r = opc.chimeric_alignment_to_path_r(g, rints, ai2, node2)
        assert norm(got_ref_r) == norm(got_r)

        if len(g.discordant_edges) >= 2:
            di2 = rng.randrange(len(g.discordant_edges))
            d2 = g.discordant_edges[di2]
            # the walk enters edge 2 at its node1 coming out of edge 1's
            # node2; the reference asserts those orientations differ
            # (real callers order bp hits along the read, guaranteeing it)
            if d.o2 == d2.o1:
                checked += 1
                continue
            rints3 = [rint_near(node1), rint_near(node2),
                      rint_near((d2.chrom2, d2.pos2, d2.o2))]
            ai_list = [[0, 1], [1, 2]]
            bp_list = [di, di2]
            got_ref_m = ref.pc.chimeric_alignment_to_path(shim, rints3, ai_list, bp_list)
            got_m = opc.chimeric_alignment_to_path(g, rints3, ai_list, bp_list)
            assert norm(got_ref_m) == norm(got_m)
        checked += 1
    assert checked > 60


def test_longest_path_dict_differential(ref):
    from coral_tpu.cycles import path_constraints as opc

    rng = random.Random(10)
    for _ in range(300):
        npaths = rng.randint(1, 8)
        paths, supports = [], []
        for _ in range(npaths):
            L = rng.randrange(3, 12, 2)
            path = []
            for i in range(L):
                if i % 2 == 0:
                    path.append((rng.choice("scd"), rng.randint(0, 5)))
                else:
                    path.append(("chr1", rng.randint(0, 9), rng.choice("+-")))
            paths.append(path)
            supports.append(rng.randint(1, 40))
        got_ref = ref.pc.longest_path_dict([list(paths), list(supports)])
        got = opc.longest_path_dict([list(paths), list(supports)])
        assert got_ref == got, (paths, supports)


# --------------------------------------------------------------------------
# Tier 3: file->file modes (seed, cycle2bed)
# --------------------------------------------------------------------------

def _write_random_cns(rng, path, fmt):
    """Sorted CN-segment file with arm-safe segments around real centromeres."""
    from coral_tpu.annotations import GRCH38_CENTROMERES
    from coral_tpu.constants import CHR_SIZES

    lines = ["chromosome\tstart\tend\tgene\tlog2\tdepth\n"] if fmt == "cns" else []
    for chrom in ("chr1", "chr8"):
        cen_s, cen_e = GRCH38_CENTROMERES[chrom]
        for arm_lo, arm_hi in ((10_000, cen_s - 10_000),
                               (cen_e + 10_000, CHR_SIZES[chrom] - 10_000)):
            pos = arm_lo
            for _ in range(rng.randint(3, 12)):
                seg_len = rng.randint(30_000, 2_000_000)
                gap = rng.choice([1, 1000, 250_000, 400_000, 2_000_000])
                start = pos + gap
                end = start + seg_len
                if end >= arm_hi:
                    break
                cn = rng.choice([1.0, 2.0, 2.5, 6.0, 6.5, 8.0, 12.0, 40.0])
                if fmt == "cns":
                    log2 = math.log2(cn / 2.0)
                    lines.append(f"{chrom}\t{start}\t{end}\tgene\t{log2:.6f}\t100\n")
                else:
                    lines.append(f"{chrom}\t{start}\t{end}\t{cn}\n")
                pos = end
    path.write_text("".join(lines))


@pytest.mark.parametrize("fmt", ["cns", "bed"])
def test_seed_mode_differential(ref, tmp_path, fmt):
    from coral_tpu.config import SeedConfig
    from coral_tpu.seed import run_seeding

    rng = random.Random(11)
    for case in range(12):
        cn_file = tmp_path / f"case{case}.{fmt}"
        _write_random_cns(rng, cn_file, fmt)
        gain = rng.choice([6.0, 4.5, 8.0])
        min_seed = rng.choice([99999, 50_000])
        max_gap = rng.choice([300001, 150_000])
        ref_out = tmp_path / f"ref{case}.bed"
        our_out = tmp_path / f"ours{case}.bed"
        ref.seed.run_seeding(SimpleNamespace(
            cn_seg=str(cn_file), out=str(ref_out),
            gain=gain, min_seed_size=min_seed, max_seg_gap=max_gap,
        ))
        run_seeding(str(cn_file), str(our_out), SeedConfig(
            gain=gain, min_seed_size=min_seed, max_seg_gap=max_gap,
        ))
        assert our_out.read_text() == ref_out.read_text(), (case, fmt)


def _write_random_cycles(rng, path):
    n_segs = rng.randint(2, 7)
    chroms = ["chr1", "chr8"]
    lines = []
    pos = 100_000
    segs = []
    for i in range(1, n_segs + 1):
        chrom = rng.choice(chroms)
        start = pos + rng.choice([1, 500, 10_000])
        end = start + rng.randint(1_000, 400_000)
        pos = end
        segs.append((str(i), chrom, start, end))
        lines.append(f"Segment\t{i}\t{chrom}\t{start}\t{end}\n")
    for cid in range(1, rng.randint(2, 4)):
        k = rng.randint(1, min(4, n_segs))
        toks = [f"{rng.randint(1, n_segs)}{rng.choice('+-')}" for _ in range(k)]
        if rng.random() < 0.5:
            toks = ["0+"] + toks + ["0-"]
        w = round(rng.uniform(1.0, 90.0), 6)
        lines.append(
            f"Cycle={cid};Copy_count={w};Segments={','.join(toks)}\n"
        )
    path.write_text("".join(lines))


def test_cycle2bed_differential(ref, tmp_path):
    from coral_tpu.cycle2bed import convert_cycles_to_bed

    rng = random.Random(12)
    for case in range(25):
        cyc = tmp_path / f"c{case}.txt"
        _write_random_cycles(rng, cyc)
        ref_out = tmp_path / f"ref{case}.bed"
        our_out = tmp_path / f"ours{case}.bed"
        num = rng.choice([None, 1, 2])
        ref.c2b.convert_cycles_to_bed(str(cyc), str(ref_out), False, num)
        convert_cycles_to_bed(str(cyc), str(our_out), False, num)
        assert our_out.read_text() == ref_out.read_text(), case


def test_cycle2bed_double_wrap_merge_differential(ref, tmp_path):
    """Both wrap-around merges firing on one cycle (the reference applies
    them as TWO sequential ifs, cycle2bed.py:43-48: after the '+' merge
    deletes the last segment, the '-' test re-reads the NEW last).  The
    randomized differential never generated this geometry; round-2 review
    found our elif skipped the second merge."""
    from coral_tpu.cycle2bed import convert_cycles_to_bed

    cyc = tmp_path / "dw.txt"
    cyc.write_text(
        "Segment\t1\tchr1\t100\t200\n"
        "Segment\t2\tchr1\t201\t400\n"
        "Segment\t3\tchr1\t50\t99\n"
        "Cycle=1;Copy_count=3.25;Segments=1+,2-,3+\n")
    ref_out = tmp_path / "dw_ref.bed"
    our_out = tmp_path / "dw_ours.bed"
    ref.c2b.convert_cycles_to_bed(str(cyc), str(ref_out), False, None)
    convert_cycles_to_bed(str(cyc), str(our_out), False, None)
    assert our_out.read_text() == ref_out.read_text()
