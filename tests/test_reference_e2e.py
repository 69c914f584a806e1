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


def _run_both(ref_ibg, tmp_path, bam, cns, seeds, tag):
    from coral_tpu.reconstruct import reconstruct_graphs

    _reset_reference_state(ref_ibg)
    ref_prefix = str(tmp_path / f"ref_{tag}")
    our_prefix = str(tmp_path / f"ours_{tag}")
    args = SimpleNamespace(
        lr_bam=bam, cnv_seed=seeds, cn_seg=cns,
        output_prefix=ref_prefix, min_bp_support=1.0,
        output_bp=True, log_fn=str(tmp_path / f"ref_{tag}.log"),
    )
    ref_ibg.reconstruct_graph(args)
    reconstruct_graphs(bam, seeds, cns, our_prefix, output_bp=True)

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
