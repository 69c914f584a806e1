"""End-to-end differential: run the REFERENCE's reconstruct_graph on our
BAM engine and compare its outputs file-for-file with ours.

The reference's whole BAM->breakpoints pipeline (``reconstruct_graph``
with ``--output_bp``: read_cns -> fetch -> hash_alignment_to_seg ->
find_amplicon_intervals/find_interval_i -> find_smalldel_breakpoints ->
find_breakpoints -> build_graph -> breakpoints writer) touches native
dependencies only through pysam and intervaltree.  We inject
``coral_tpu.io.pysam_compat``'s facades as those modules, point the
reference at coral_tpu's simulated BAMs, and assert the emitted
``*_breakpoints.txt`` files are byte-identical to the ones our pipeline
writes for the same inputs.

This is the strongest available parity artifact for the orchestrator
(SURVEY §7 hard part 2: the 330-line ``find_interval_i`` cascade): both
implementations execute end to end on identical data through identical
I/O semantics, so any behavioral divergence anywhere in seeding
expansion, BFS, clustering, consensus, dedup, interval refinement, small
deletions, or graph assembly changes the bytes.

Skipped when /root/reference is absent.  The cvxopt-needing graph stage
(compute_cn_lr) is out of scope here — ``--output_bp`` is the
reference's own pre-CN stage checkpoint (CoRAL.py:87-88).
"""
from __future__ import annotations

import glob
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_ibg():
    """Reference infer_breakpoint_graph with coral_tpu facades injected."""
    import coral_tpu.io.pysam_compat as compat

    fake_pysam = types.ModuleType("pysam")
    fake_pysam.AlignmentFile = compat.AlignmentFile
    fake_itree = types.ModuleType("intervaltree")
    fake_itree.IntervalTree = compat.IntervalTree
    fake_itree.Interval = compat.Interval
    # a WORKING cvxopt facade (matrix arithmetic + solvers.cp), so the
    # reference's full graph mode (compute_cn_lr) runs too
    import coral_tpu.graph.cvxopt_compat as cvx

    sys.modules["cvxopt"] = cvx
    sys.modules["cvxopt.modeling"] = cvx.modeling
    had_pysam = sys.modules.get("pysam")
    had_itree = sys.modules.get("intervaltree")
    sys.modules["pysam"] = fake_pysam
    sys.modules["intervaltree"] = fake_itree
    sys.path.insert(0, str(REF_SRC))
    try:
        import infer_breakpoint_graph

        yield infer_breakpoint_graph
    finally:
        sys.path.remove(str(REF_SRC))
        if had_pysam is None:
            sys.modules.pop("pysam", None)
        else:
            sys.modules["pysam"] = had_pysam
        if had_itree is None:
            sys.modules.pop("intervaltree", None)
        else:
            sys.modules["intervaltree"] = had_itree


def _reset_reference_state(ref_ibg):
    """The reference class keeps ALL pipeline state in mutable class-level
    dicts/lists (infer_breakpoint_graph.py:35-61) — fine for its
    one-instance-per-process CLI, but state leaks across instantiations
    in-process.  Reset them so each differential run starts clean."""
    cls = ref_ibg.bam_to_breakpoint_nanopore
    for name, val in list(vars(cls).items()):
        if isinstance(val, dict):
            setattr(cls, name, dict())
        elif isinstance(val, list):
            setattr(cls, name, [])
    cls.nm_stats = [0.0, 0.0, 0]
    cls.min_cluster_cutoff = 3
    cls.normal_cov = 0.0


def _run_both(ref_ibg, tmp_path, bam, cns, seeds, tag, min_bp_support=1.0):
    import dataclasses

    from coral_tpu.config import DEFAULT_CONFIG
    from coral_tpu.reconstruct import reconstruct_graphs

    _reset_reference_state(ref_ibg)
    ref_prefix = str(tmp_path / f"ref_{tag}")
    our_prefix = str(tmp_path / f"ours_{tag}")
    args = SimpleNamespace(
        lr_bam=bam, cnv_seed=seeds, cn_seg=cns,
        output_prefix=ref_prefix, min_bp_support=min_bp_support,
        output_bp=True, log_fn=str(tmp_path / f"ref_{tag}.log"),
    )
    ref_ibg.reconstruct_graph(args)
    cfg = DEFAULT_CONFIG.replace(bp=dataclasses.replace(
        DEFAULT_CONFIG.bp, min_bp_cov_factor=min_bp_support))
    reconstruct_graphs(bam, seeds, cns, our_prefix, cfg=cfg, output_bp=True)

    ref_files = sorted(glob.glob(ref_prefix + "_amplicon*_breakpoints.txt"))
    our_files = sorted(glob.glob(our_prefix + "_amplicon*_breakpoints.txt"))
    assert ref_files, "reference produced no breakpoint files"
    assert len(ref_files) == len(our_files), (ref_files, our_files)
    for rf, of in zip(ref_files, our_files):
        assert Path(rf).name.replace("ref_", "") == \
            Path(of).name.replace("ours_", "")
        ref_lines = Path(rf).read_text().splitlines(keepends=True)
        our_lines = Path(of).read_text().splitlines(keepends=True)
        assert our_lines[0] == ref_lines[0]
        # ROW ORDER is not part of the contract: the reference iterates a
        # SET of read-name strings when collecting junctions
        # (infer_breakpoint_graph.py:428-434, ``for r in nint_[-1]``), so
        # its own row order flips with PYTHONHASHSEED (verified: seeds
        # 0/7 vs 42/123 swap rows on this very sample).  Rows themselves
        # must match byte-for-byte.
        assert sorted(our_lines[1:]) == sorted(ref_lines[1:]), (rf, of)
    return len(ref_files)


# Compact SEQ-bearing geometry: the reference divides NM by query_length
# (SEQ length) on mapq-60 primaries (infer_breakpoint_graph.py:154), so the
# sims must emit real SEQ; coverage/read lengths are scaled down to keep
# the BAMs small.
_GEOM = dict(bg_cov=2, amp_extra_cov=30, n_junction_reads=30,
             bg_read_len=8_000, amp_read_len=8_000, emit_seq=True)


def test_e2e_breakpoints_ecdna(ref_ibg, tmp_path):
    from coral_tpu.sim import simulate_ecdna

    bam, cns, seeds = simulate_ecdna(str(tmp_path / "sim"), seed=3, **_GEOM)
    n = _run_both(ref_ibg, tmp_path, bam, cns, seeds, "ecdna")
    assert n == 1


def test_e2e_breakpoints_mixed(ref_ibg, tmp_path):
    """Three amplicon classes in one sample: ecDNA, BFB foldbacks, and a
    cross-chromosome translocated ecDNA — exercises multi-ccid BFS,
    foldback orientations, and inter-chromosome canonicalization."""
    from coral_tpu.sim import simulate_mixed_sample

    bam, cns, seeds = simulate_mixed_sample(str(tmp_path / "sim"), seed=11,
                                            **_GEOM)
    n = _run_both(ref_ibg, tmp_path, bam, cns, seeds, "mixed")
    assert n >= 3


def _parse_graph_rows(text):
    """{(kind, position-descriptor): [numeric fields]} per data row."""
    rows = {}
    for line in text.splitlines():
        t = line.split("\t")
        if t[0] in ("sequence", "concordant", "discordant", "source"):
            key = (t[0],) + tuple(t[1:3] if t[0] == "sequence" else t[1:2])
            rows[key] = [float(v) for v in t[3 if t[0] == "sequence" else 2:]]
    return rows


def test_e2e_graph_mode_full(ref_ibg, tmp_path):
    """FULL graph mode: the reference's compute_cn_lr runs on our
    cvxopt-cp facade (coral_tpu/graph/cvxopt_compat.py) and its
    *_graph.txt must match ours — structure and counts exactly, CN and
    coverage numerics within solver tolerance (two independent interior
    solvers converging to the same unique stationary point)."""
    from coral_tpu.reconstruct import reconstruct_graphs
    from coral_tpu.sim import simulate_ecdna

    bam, cns, seeds = simulate_ecdna(str(tmp_path / "sim"), seed=7, **_GEOM)
    _reset_reference_state(ref_ibg)
    ref_prefix = str(tmp_path / "ref_graph")
    args = SimpleNamespace(
        lr_bam=bam, cnv_seed=seeds, cn_seg=cns,
        output_prefix=ref_prefix, min_bp_support=1.0,
        output_bp=False, log_fn=str(tmp_path / "ref_graph.log"),
    )
    ref_ibg.reconstruct_graph(args)
    our_prefix = str(tmp_path / "ours_graph")
    rec = reconstruct_graphs(bam, seeds, cns, our_prefix)

    ref_files = sorted(glob.glob(ref_prefix + "_amplicon*_graph.txt"))
    our_files = sorted(glob.glob(our_prefix + "_amplicon*_graph.txt"))
    assert ref_files and len(ref_files) == len(our_files)
    for rf, of in zip(ref_files, our_files):
        ref_rows = _parse_graph_rows(Path(rf).read_text())
        our_rows = _parse_graph_rows(Path(of).read_text())
        assert set(ref_rows) == set(our_rows), (rf, of)
        for key, ref_vals in ref_rows.items():
            our_vals = our_rows[key]
            assert len(ref_vals) == len(our_vals)
            for a, b in zip(ref_vals, our_vals):
                assert b == pytest.approx(a, rel=1e-4, abs=1e-4), (key, ref_vals, our_vals)


def test_e2e_breakpoints_translocated(ref_ibg, tmp_path):
    from coral_tpu.sim import simulate_translocated_ecdna

    geom = dict(_GEOM)
    geom.pop("jitter", None)
    bam, cns, seeds = simulate_translocated_ecdna(str(tmp_path / "sim"),
                                                  seed=5, **geom)
    _run_both(ref_ibg, tmp_path, bam, cns, seeds, "transloc")


def test_e2e_breakpoints_min_support_filter(ref_ibg, tmp_path):
    """--min_bp_support ABOVE the default: the support filter (cluster
    cutoff raised to min_bp_support * normal coverage,
    infer_breakpoint_graph.py:135) must drop the 8-read integration
    cluster while keeping the 30-read ecDNA junction, identically on
    both sides.  Every other differential runs at the default 1.0, so
    this is the only coverage of the raised-threshold path."""
    from coral_tpu.sim import simulate_ecdna

    bam, cns, seeds = simulate_ecdna(
        str(tmp_path / "sim"), seed=17, **_GEOM,
        n_integration_reads=8, integration_pos=58_000_000)
    # control at the default: the integration cluster is reported
    _run_both(ref_ibg, tmp_path, bam, cns, seeds, "ctl")
    ctl = Path(glob.glob(str(tmp_path / "ours_ctl_amplicon*_breakpoints.txt")
                         )[0]).read_text()
    assert "58000000" in ctl
    # raised threshold: 5.0 * normal_cov(2) = 10 > 8-read support
    _run_both(ref_ibg, tmp_path, bam, cns, seeds, "hi", min_bp_support=5.0)
    hi = Path(glob.glob(str(tmp_path / "ours_hi_amplicon*_breakpoints.txt")
                        )[0]).read_text()
    assert "58000000" not in hi
    assert len(hi.splitlines()) < len(ctl.splitlines())


def test_e2e_breakpoints_multichrom_inverted(ref_ibg, tmp_path):
    """Three chromosomes in ONE cycle with an inverted middle segment
    (chr7:A+ -> chr8:B- -> chr5:C+ -> A): only chr7 is seeded, so the
    interval search must discover chr8 and then chr5 transitively (a
    two-hop BFS), and the A->B / B->C junctions are mixed-strand
    non-foldback chimeras no other archetype emits."""
    from coral_tpu.sim import simulate_multichrom_inverted_ecdna

    bam, cns, seeds = simulate_multichrom_inverted_ecdna(
        str(tmp_path / "sim"), seed=1, **_GEOM)
    n = _run_both(ref_ibg, tmp_path, bam, cns, seeds, "multichrom")
    assert n == 1  # one connected component spanning all three chromosomes


# --------------------------------------------------------------------------
# Cycles writer + Eulerian digestion of identical solutions
# --------------------------------------------------------------------------

def test_e2e_cycles_writer_same_solution(ref_ibg, tmp_path):
    """Feed OUR decomposition solution to the REFERENCE's output_cycles
    (its Eulerian traversal + AA writer) and compare cycles.txt with
    ours: everything byte-identical except the Segments strings, which
    must be AA-equivalent realizations of the same edge multiset (the
    traversal representative is RNG-dependent in the reference).

    This separates writer/traversal parity (proven here) from solver
    parity (covered by the GBM39 reference-model harness)."""
    import random as pyrandom
    import types as _t

    if "gurobipy" not in sys.modules:
        sys.modules["gurobipy"] = _t.ModuleType("gurobipy")
    if not hasattr(sys.modules["gurobipy"], "GRB"):
        sys.modules["gurobipy"].GRB = type("GRB", (), {})
    sys.path.insert(0, str(REF_SRC))
    try:
        import cycle_decomposition as ref_cd
    finally:
        sys.path.remove(str(REF_SRC))

    from test_reference_differential import _RefGraphShim

    from coral_tpu.cycles.refmodel import segments_to_solution
    from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
    from coral_tpu.sim import simulate_translocated_ecdna

    bam, cns, seeds = simulate_translocated_ecdna(
        str(tmp_path / "sim"), seed=9,
        amp_b=(127_000_000, 127_030_000),
        bg_cov=2, amp_extra_cov=30, n_junction_reads=30,
        bg_read_len=8_000, amp_read_len=8_000,
        emit_seq=True, n_through_reads=8)
    our_prefix = str(tmp_path / "ours_cyc")
    rec = reconstruct_graphs(bam, seeds, cns, our_prefix)
    reconstruct_cycles(rec, our_prefix)

    bb = SimpleNamespace(
        lr_graph=[_RefGraphShim(g) for g in rec.graphs],
        amplicon_intervals=rec.amplicon_intervals,
        ccid2id=rec.ccid2id,
        path_constraints=rec.path_constraints,
        longest_path_constraints=rec.longest_path_constraints,
        cycles=rec.cycles,
        cycle_weights=rec.cycle_weights,
        path_constraints_satisfied=rec.path_constraints_satisfied,
    )
    ref_prefix = str(tmp_path / "ref_cyc")
    pyrandom.seed(0)
    ref_cd.output_cycles(bb, ref_prefix)

    def parse(text):
        head, cyc = [], []
        for line in text.splitlines():
            if line.startswith("Cycle="):
                cyc.append(dict(f.split("=", 1) for f in line.split(";")))
            elif not line.startswith("#"):
                head.append(line)
        return head, cyc

    n_cycle_lines = 0
    for amp in range(len(rec.graphs)):
        ref_text = Path(f"{ref_prefix}_amplicon{amp + 1}_cycles.txt").read_text()
        our_text = Path(f"{our_prefix}_amplicon{amp + 1}_cycles.txt").read_text()
        ref_head, ref_cyc = parse(ref_text)
        our_head, our_cyc = parse(our_text)
        assert our_head == ref_head, amp
        assert len(our_cyc) == len(ref_cyc)
        for rc, oc in zip(ref_cyc, our_cyc):
            assert oc["Cycle"] == rc["Cycle"]
            assert oc["Copy_count"] == rc["Copy_count"]
            assert oc["Path_constraints_satisfied"] == \
                rc["Path_constraints_satisfied"]
            g = rec.graphs[amp]
            ref_sol, ref_is_cyc, ref_viol = segments_to_solution(
                g, rc["Segments"].split(","))
            our_sol, our_is_cyc, our_viol = segments_to_solution(
                g, oc["Segments"].split(","))
            assert ref_viol == [] and our_viol == []
            assert ref_is_cyc == our_is_cyc
            assert ref_sol == our_sol, (amp, rc, oc)
            n_cycle_lines += 1
    assert n_cycle_lines >= 2


def _sim_ecdna_full(path):
    from coral_tpu.sim import simulate_ecdna

    return simulate_ecdna(str(path / "sim"), seed=7, **_GEOM)


def _sim_transloc_full(path):
    from coral_tpu.sim import simulate_translocated_ecdna

    return simulate_translocated_ecdna(
        str(path / "sim"), seed=9, amp_b=(127_000_000, 127_030_000),
        n_through_reads=8, **_GEOM)


def _sim_bfb_full(path):
    from coral_tpu.sim import simulate_bfb

    geom = {k: v for k, v in _GEOM.items() if k != "n_junction_reads"}
    return simulate_bfb(str(path / "sim"), seed=11,
                        n_fold_reads=_GEOM["n_junction_reads"], **geom)


def _sim_mixed_full(path):
    from coral_tpu.sim import simulate_mixed_sample

    return simulate_mixed_sample(str(path / "sim"), seed=13, **_GEOM)


def _sim_multichrom_full(path):
    from coral_tpu.sim import simulate_multichrom_inverted_ecdna

    return simulate_multichrom_inverted_ecdna(str(path / "sim"), seed=1,
                                              **_GEOM)


@pytest.mark.parametrize(
    "sim_factory",
    [_sim_ecdna_full, _sim_transloc_full, _sim_bfb_full, _sim_mixed_full,
     _sim_multichrom_full],
    ids=["ecdna", "transloc", "bfb", "mixed", "multichrom"])
def test_e2e_full_pipeline_cycles(ref_ibg, tmp_path, sim_factory):
    """Capstone differential: the reference's ENTIRE reconstruct mode —
    BAM scan + graph inference (pysam facade), CN balance (cvxopt-cp
    facade), subpath constraints, MIQP cycle decomposition solved to
    global optimality (gurobipy facade), Eulerian traversal and the AA
    writer — against our pipeline on the same simulated sample.

    Compared by the decomposition's model INVARIANTS (the copy-count
    split between decompositions is degenerate in the reference model —
    proven on GBM39, docs/GBM39_PARITY.md): identical header metadata,
    identical canonical segment multisets per decomposition, weight
    within solver tolerance where the optimum is unique, and identical
    total length-weighted coverage.
    """
    from coral_tpu.cycles.refmodel import canonical_tokens, parse_cycles_text
    from coral_tpu.reconstruct import reconstruct_cycles as our_cycles
    from coral_tpu.reconstruct import reconstruct_graphs

    sys.path.insert(0, str(REF_SRC))
    try:
        import cycle_decomposition as ref_cd
    finally:
        sys.path.remove(str(REF_SRC))
    import coral_tpu.graph.gurobi_compat as gp_facade

    assert ref_cd.gp is gp_facade  # the real MIQP oracle, not a stub

    bam, cns, seeds = sim_factory(tmp_path)
    _reset_reference_state(ref_ibg)
    ref_prefix = str(tmp_path / "ref_full")
    args = SimpleNamespace(
        lr_bam=bam, cnv_seed=seeds, cn_seg=cns,
        output_prefix=ref_prefix, min_bp_support=1.0,
        output_bp=False, log_fn=str(tmp_path / "ref_full.log"),
        cycle_decomp_alpha=None, postprocess_greedy_sol=False,
        cycle_decomp_threads=None, cycle_decomp_time_limit=300,
        output_all_path_constraints=False,
    )
    bb = ref_ibg.reconstruct_graph(args)
    import random as pyrandom

    pyrandom.seed(0)
    ref_cd.reconstruct_cycles(args, bb)

    our_prefix = str(tmp_path / "ours_full")
    rec = reconstruct_graphs(bam, seeds, cns, our_prefix)
    our_cycles(rec, our_prefix)

    ref_files = sorted(glob.glob(ref_prefix + "_amplicon*_cycles.txt"))
    our_files = sorted(glob.glob(our_prefix + "_amplicon*_cycles.txt"))
    assert ref_files and len(ref_files) == len(our_files)
    for rf, of in zip(ref_files, our_files):
        ref = parse_cycles_text(Path(rf).read_text())
        ours = parse_cycles_text(Path(of).read_text())
        # header metadata: identical segment coordinates
        assert ours["segments"] == ref["segments"], (rf, of)
        # subpath constraints: identical token/support multisets
        # (file order is PYTHONHASHSEED-dependent in the reference)
        norm = lambda cs: sorted(
            (canonical_tokens(c["tokens"], is_cycle=False), c["support"])
            for c in cs)
        assert norm(ours["constraints"]) == norm(ref["constraints"])
        assert len(ours["entries"]) == len(ref["entries"])

        def seg_len(sid):
            c, s, e = ref["segments"][sid]
            return e - s + 1

        def cov(entry):
            toks = [t for t in entry["tokens"] if t not in ("0+", "0-")]
            return entry["copy_count"] * sum(
                seg_len(int(t[:-1])) for t in toks)

        # the model's optimum is DEGENERATE in both the copy-count split
        # AND the decomposition structure (proven on GBM39 and again on
        # the mixed sample: the facade's solver returns a different —
        # equal-objective — edge multiset than ours).  The invariants all
        # optima share: every entry realizes a feasible walk on the same
        # graph, the decomposition COUNT is equal (an extra z costs +1 in
        # the objective vs a coverage gain < 1), and total length-weighted
        # coverage is equal (same objective value at same count).
        amp = int(Path(rf).name.split("amplicon")[1].split("_")[0])
        g = rec.graphs[amp - 1]
        from coral_tpu.cycles.refmodel import segments_to_solution

        for entry in ref["entries"] + ours["entries"]:
            sol, _is_cyc, viol = segments_to_solution(g, entry["tokens"])
            assert viol == [] and sol, (rf, entry)
        assert len(ours["entries"]) == len(ref["entries"])
        total_ref = sum(cov(e) for e in ref["entries"])
        total_our = sum(cov(e) for e in ours["entries"])
        assert total_our == pytest.approx(total_ref, rel=1e-4)


# --------------------------------------------------------------------------
# HSR mode
# --------------------------------------------------------------------------

@pytest.mark.parametrize("bp_cutoff,cl_cutoff", [(100, 2000), (3, 4)],
                         ids=["default", "tight"])
def test_e2e_hsr_sites(ref_ibg, tmp_path, monkeypatch, capsys,
                       bp_cutoff, cl_cutoff):
    """HSR integration-site detection: the reference's locate_hsrs runs on
    the pysam facade and must report the same breakpoint sites (stdout
    ``Breakpoint ... Support = ...`` lines are its machine-readable
    output) as ours, given the same BAM + cycles bed + CN file."""
    sys.path.insert(0, str(REF_SRC))
    try:
        import hsr as ref_hsr
    finally:
        sys.path.remove(str(REF_SRC))
    from coral_tpu.hsr import locate_hsrs as our_hsr
    from coral_tpu.sim import simulate_ecdna

    bam, cns, _seeds = simulate_ecdna(
        str(tmp_path / "sim"), seed=13, **_GEOM,
        n_integration_reads=8, integration_pos=58_000_000)
    cycles_bed = tmp_path / "ecdna_cycles.bed"
    cycles_bed.write_text("chr7\t55000000\t55399999\t+\t1\tTrue\t20.0\n")
    # the reference saves its scatter to a RELATIVE "integration_sites_<prefix>"
    # path (hsr.py:219-220, crashes on absolute prefixes — our build fixed
    # that); run from tmp_path with relative prefixes for both
    monkeypatch.chdir(tmp_path)

    def fig_lines():
        """Data-space geometry of the current pyplot figure: Line2D
        xy-data (chromosome separators + 'bo' site markers), limits,
        tick positions."""
        import matplotlib.pyplot as plt

        ax = plt.gcf().axes[0]
        r4 = lambda v: round(float(v), 4)
        lines = sorted(
            tuple((r4(x), r4(y)) for x, y in zip(*ln.get_data()))
            for ln in ax.lines)
        return {
            "lines": lines,
            "xlim": tuple(map(r4, ax.get_xlim())),
            "ylim": tuple(map(r4, ax.get_ylim())),
            "xticks": [r4(t) for t in ax.get_xticks()],
        }

    def run(fn, prefix):
        import matplotlib.pyplot as plt

        plt.close("all")
        args = SimpleNamespace(
            lr_bam=bam, cycles=str(cycles_bed), cn_seg=cns,
            output_prefix=prefix, normal_cov="4",
            bp_match_cutoff=bp_cutoff, bp_match_cutoff_clustering=cl_cutoff)
        geom = {}
        real_savefig = plt.savefig

        def cap(fn_, *a, **kw):
            geom.update(fig_lines())
            return real_savefig(fn_, *a, **kw)

        plt.savefig = cap
        try:
            fn(args)
        finally:
            plt.savefig = real_savefig
        out = capsys.readouterr().out
        sites = sorted(l for l in out.splitlines() if l.startswith("Breakpoint"))
        found = [l for l in out.splitlines() if l.startswith("Found ")]
        return sites, found, geom

    ref_sites, ref_found, ref_geom = run(ref_hsr.locate_hsrs, "refh")
    our_sites, our_found, our_geom = run(our_hsr, "oursh")
    assert ref_sites, "integration sim must produce reported sites"
    assert our_sites == ref_sites
    assert our_found == ref_found
    # the integration-sites scatter draws the same geometry (separators,
    # site markers, log-scale limits, chromosome ticks)
    assert our_geom == ref_geom
    assert (tmp_path / "integration_sites_refh.png").exists()
    assert (tmp_path / "integration_sites_oursh.png").exists()


# --------------------------------------------------------------------------
# Path constraints (the last pre-solver stage)
# --------------------------------------------------------------------------

def _canon_pc_edge(el, dis):
    """('d', idx) -> ('d', 6-tuple): discordant indices are insertion-
    ordered (hash-dependent in the reference), so canonicalize by edge
    identity; 's'/'c' indices are sort_edges-deterministic on both sides."""
    if isinstance(el, tuple) and len(el) == 2 and el[0] == "d":
        return ("d",) + tuple(dis[el[1]])
    return tuple(el)


def _canon_path(path, dis):
    fwd = tuple(repr(_canon_pc_edge(el, dis)) for el in path)
    return min(fwd, fwd[::-1])


def test_e2e_path_constraints(ref_ibg, tmp_path):
    """Both implementations derive identical subpath constraints from the
    same BAM: three-part through reads traverse A_end -> whole B ->
    A_start, the geometry that yields >= 3-sequence-edge walks."""
    from collections import Counter

    from coral_tpu.reconstruct import reconstruct_graphs
    from coral_tpu.sim import simulate_translocated_ecdna

    bam, cns, seeds = simulate_translocated_ecdna(
        str(tmp_path / "sim"), seed=9,
        amp_b=(127_000_000, 127_030_000),
        bg_cov=2, amp_extra_cov=30, n_junction_reads=30,
        bg_read_len=8_000, amp_read_len=8_000,
        emit_seq=True, n_through_reads=8)
    _reset_reference_state(ref_ibg)
    args = SimpleNamespace(
        lr_bam=bam, cnv_seed=seeds, cn_seg=cns,
        output_prefix=str(tmp_path / "ref_pc"), min_bp_support=1.0,
        output_bp=False, log_fn=str(tmp_path / "ref_pc.log"),
    )
    b2bn = ref_ibg.reconstruct_graph(args)
    b2bn.compute_path_constraints()
    rec = reconstruct_graphs(bam, seeds, cns, str(tmp_path / "ours_pc"))
    rec.compute_path_constraints()

    assert len(b2bn.lr_graph) == len(rec.graphs)
    total_pcs = 0
    for amp in range(len(rec.graphs)):
        ref_dis = [tuple(de[:6]) for de in b2bn.lr_graph[amp].discordant_edges]
        our_dis = [(d.chrom1, d.pos1, d.o1, d.chrom2, d.pos2, d.o2)
                   for d in rec.graphs[amp].discordant_edges]
        ref_pcs = b2bn.path_constraints[amp]
        our_pcs = rec.path_constraints[amp]
        got_ref = Counter(
            (_canon_path(p, ref_dis), s)
            for p, s in zip(ref_pcs[0], ref_pcs[1]))
        got = Counter(
            (_canon_path(p, our_dis), s)
            for p, s in zip(our_pcs[0], our_pcs[1]))
        assert got == got_ref, amp
        # longest (maximal) constraints: edge-count dicts + supports
        def canon_dict(d, dis):
            return frozenset((repr(_canon_pc_edge(e, dis)), c)
                             for e, c in d.items())
        ref_l = Counter(
            (canon_dict(d, ref_dis), s)
            for d, s in zip(b2bn.longest_path_constraints[amp][0],
                            b2bn.longest_path_constraints[amp][2]))
        our_l = Counter(
            (canon_dict(d, our_dis), s)
            for d, s in zip(rec.longest_path_constraints[amp][0],
                            rec.longest_path_constraints[amp][2]))
        assert our_l == ref_l, amp
        total_pcs += len(ref_pcs[0])
    assert total_pcs > 0, "through reads must produce path constraints"


def test_e2e_cycles_writer_source_edge_path(ref_ibg, tmp_path):
    """Writer/traversal parity for SOURCE-EDGE paths: feed a decomposition
    whose path enters through a source edge to the REFERENCE's
    output_cycles (its eulerian_path_t source branch,
    cycle_decomposition.py:1773-1800) and to ours; everything must match
    except the traversal representative, which must realize the same
    edge multiset."""
    import random as pyrandom

    sys.path.insert(0, str(REF_SRC))
    try:
        import cycle_decomposition as ref_cd
    finally:
        sys.path.remove(str(REF_SRC))
    from test_reference_differential import _RefGraphShim
    from test_reference_miqp import _source_edge_graph, _total_weights, \
        _our_setup
    from coral_tpu.config import CycleConfig
    from coral_tpu.cycles.decomposition import joint_minimize
    from coral_tpu.cycles.output import output_cycles
    from coral_tpu.cycles.refmodel import segments_to_solution

    g = _source_edge_graph(pyrandom.Random(97))
    tw = _total_weights(g)
    status, total, _n, cycles, weights, sat = joint_minimize(
        g, _our_setup(g), 2, tw, [], CycleConfig())
    assert status == 2
    assert any(k[0] in ("s", "t")
               for slot in (0, 1) for c in cycles[slot] for k in c)

    rec = SimpleNamespace(
        graphs=[g], amplicon_intervals=[
            ["chr1", g.sequence_edges[0].start,
             g.sequence_edges[-1].end, 0]],
        ccid2id={0: 0}, path_constraints={0: [[], [], []]},
        longest_path_constraints={0: [[], [], []]},
        cycles={0: cycles}, cycle_weights={0: weights},
        path_constraints_satisfied={0: sat})
    our_prefix = str(tmp_path / "ours")
    output_cycles(rec, our_prefix)

    bb = SimpleNamespace(
        lr_graph=[_RefGraphShim(g)],
        amplicon_intervals=rec.amplicon_intervals, ccid2id=rec.ccid2id,
        path_constraints=rec.path_constraints,
        longest_path_constraints=rec.longest_path_constraints,
        cycles=rec.cycles, cycle_weights=rec.cycle_weights,
        path_constraints_satisfied=rec.path_constraints_satisfied)
    ref_prefix = str(tmp_path / "ref")
    pyrandom.seed(0)
    ref_cd.output_cycles(bb, ref_prefix)

    ref_text = Path(ref_prefix + "_amplicon1_cycles.txt").read_text()
    our_text = Path(our_prefix + "_amplicon1_cycles.txt").read_text()

    def parse(text):
        head, cyc = [], []
        for line in text.splitlines():
            if line.startswith("Cycle="):
                cyc.append(dict(f.split("=", 1) for f in line.split(";")))
            else:
                head.append(line)
        return head, cyc

    ref_head, ref_cyc = parse(ref_text)
    our_head, our_cyc = parse(our_text)
    assert our_head == ref_head
    assert len(our_cyc) == len(ref_cyc) == 2
    for rc, oc in zip(ref_cyc, our_cyc):
        assert oc["Copy_count"] == rc["Copy_count"]
        ref_sol, ref_is_cyc, rv = segments_to_solution(
            g, rc["Segments"].split(","), allow_free_terminals=False)
        our_sol, our_is_cyc, ov = segments_to_solution(
            g, oc["Segments"].split(","), allow_free_terminals=False)
        assert rv == [] and ov == []
        assert ref_is_cyc == our_is_cyc
        assert ref_sol == our_sol


def test_e2e_cycles_writer_all_paths_mode(ref_ibg, tmp_path):
    """--output_all_path_constraints: the writer prints EVERY subpath
    constraint (node-walk format, reference output_cycles
    cycle_decomposition.py:1954-1974) instead of the longest set, and
    drops the per-cycle Path_constraints_satisfied suffix (:2027,2053).
    Same-solution differential, byte-identical except Segments."""
    import random as pyrandom

    sys.path.insert(0, str(REF_SRC))
    try:
        import cycle_decomposition as ref_cd
    finally:
        sys.path.remove(str(REF_SRC))
    from test_reference_differential import _RefGraphShim
    from coral_tpu.cycles.refmodel import segments_to_solution
    from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
    from coral_tpu.sim import simulate_translocated_ecdna

    bam, cns, seeds = simulate_translocated_ecdna(
        str(tmp_path / "sim"), seed=9, amp_b=(127_000_000, 127_030_000),
        n_through_reads=8, **_GEOM)
    our_prefix = str(tmp_path / "ours_ap")
    rec = reconstruct_graphs(bam, seeds, cns, our_prefix)
    reconstruct_cycles(rec, our_prefix, output_all_path_constraints=True)

    bb = SimpleNamespace(
        lr_graph=[_RefGraphShim(g) for g in rec.graphs],
        amplicon_intervals=rec.amplicon_intervals,
        ccid2id=rec.ccid2id,
        path_constraints=rec.path_constraints,
        longest_path_constraints=rec.longest_path_constraints,
        cycles=rec.cycles,
        cycle_weights=rec.cycle_weights,
        path_constraints_satisfied=rec.path_constraints_satisfied,
    )
    ref_prefix = str(tmp_path / "ref_ap")
    pyrandom.seed(0)
    ref_cd.output_cycles(bb, ref_prefix, output_all_paths=True)

    n_pc_lines = 0
    for amp in range(len(rec.graphs)):
        ref_text = Path(f"{ref_prefix}_amplicon{amp + 1}_cycles.txt").read_text()
        our_text = Path(f"{our_prefix}_amplicon{amp + 1}_cycles.txt").read_text()
        ref_lines = ref_text.splitlines()
        our_lines = our_text.splitlines()
        assert len(ref_lines) == len(our_lines), amp
        for rl, ol in zip(ref_lines, our_lines):
            if rl.startswith("Cycle="):
                rd = dict(f.split("=", 1) for f in rl.split(";"))
                od = dict(f.split("=", 1) for f in ol.split(";"))
                assert od["Copy_count"] == rd["Copy_count"]
                assert "Path_constraints_satisfied" not in rd
                assert "Path_constraints_satisfied" not in od
                g = rec.graphs[amp]
                rs, ric, rv = segments_to_solution(g, rd["Segments"].split(","))
                os_, oic, ov = segments_to_solution(g, od["Segments"].split(","))
                assert rv == [] and ov == [] and ric == oic and rs == os_
            else:
                assert ol == rl, (amp, rl, ol)
                if rl.startswith("Path constraint"):
                    n_pc_lines += 1
    assert n_pc_lines >= 1  # the all-paths section must be exercised
