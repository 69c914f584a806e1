"""GBM39 golden-parity harness against the reference's published artifact.

The reference README's "Expected output" block (the project's ONLY
published golden artifact) reports for GBM39/EGFR:

    Cycle=1;Copy_count=82.34616279663038;Segments=2+,4+,6+
    Cycle=2;Copy_count=2.8436550275157644;Segments=0+,2+,3+,4+,5+,6+,0-

Our decomposition of the very same published graph yields

    Cycle=1;Copy_count=85.189818;Segments=2+,4+,6+
    Cycle=2;Copy_count=2.697741;Segments=0+,1+,2+,3+,4+,5+,6+,7+,0-

These tests contain the written reconciliation (see docs/GBM39_PARITY.md):
the PUBLISHED solution is INFEASIBLE under the reference snapshot's own
MIQP (src/cycle_decomposition.py:14-360) in two independent ways —

1. (weight) published Cycle 2 (w = 2.84366) traverses the concordant
   edges chr7:55609190+->55609191- and chr7:55610094+->55610095-, whose
   published CNs are 2.697741; the model caps Σ_i w_i·x_e,i at the edge
   CN (ref :127-131).  Violation margin 0.1459 — 5 orders of magnitude
   beyond 6-decimal rounding.
2. (structure) published Cycle 2 is written as a path, but its terminals
   (chr7:54763282- and chr7:56049369+) are interior breakpoint nodes:
   the model's only s/t attachments are endnodes and source edges
   (ref :92-119), and this graph's endnodes are the interval ends
   54659673-/56149664+ with no source edges.  An endnode's s/t usage is
   tied to its own sequence edge (x_s + x_t == x_seq, ref :92-97) and
   published Cycle 2 uses neither segment 1 nor 7, so x_s = x_t = 0.

The artifact was evidently produced by an earlier CoRAL version (the
README also prints "Support<=", while the snapshot's writer emits
"Support=", cycle_decomposition.py:1973,1999).  Per the snapshot's model
our solution dominates it: feasible under EVERY reference constraint,
strictly more length-weighted CN coverage, equal path-constraint
satisfaction (2/2), equal decomposition count (2), and the shared EGFR
ecDNA cycle is identical after canonicalization with the provably maximum
feasible weight (the discordant-edge cap 85.189818).
"""
from types import SimpleNamespace

import pytest

from coral_tpu.config import CycleConfig
from coral_tpu.cycles.decomposition import cycle_decomposition
from coral_tpu.cycles.output import output_cycles
from coral_tpu.cycles.path_constraints import longest_path_dict
from coral_tpu.cycles.refmodel import (
    canonical_tokens,
    decomposition_coverage,
    parse_cycles_text,
    segments_to_solution,
    verify_reference_model,
)

from test_aa_interchange import GBM39_CYCLES, GBM39_GRAPH
from test_cycle_decomposition import (
    SEGS,
    gbm39_graph,
    gbm39_path_constraints,
)

PUB_W1 = 82.34616279663038
PUB_W2 = 2.8436550275157644


def _published():
    return parse_cycles_text(GBM39_CYCLES)


def _our_solution(tmp_path):
    """Run the full decomposition on the published graph; return
    (graph, rec, parsed cycles.txt)."""
    g = gbm39_graph()
    rec = SimpleNamespace(
        graphs=[g],
        amplicon_intervals=[["chr7", SEGS[0][1], SEGS[-1][2], 0]],
        ccid2id={0: 1},
        path_constraints={0: gbm39_path_constraints(g)},
        longest_path_constraints={},
        cycles={}, cycle_weights={}, path_constraints_satisfied={})
    cycle_decomposition(rec, CycleConfig())
    output_cycles(rec, str(tmp_path / "g"))
    parsed = parse_cycles_text((tmp_path / "g_amplicon1_cycles.txt").read_text())
    return g, rec, parsed


def test_parse_published_graph_and_cycles(tmp_path):
    p = tmp_path / "graph.txt"
    p.write_text(GBM39_GRAPH)
    from coral_tpu.graph.breakpoint_graph import parse_graph_file

    g = parse_graph_file(str(p))
    assert len(g.sequence_edges) == 7
    pub = _published()
    assert [e["copy_count"] for e in pub["entries"]] == [PUB_W1, PUB_W2]
    # README's "Support<=" variant parses too (older-writer artifact)
    assert [c["support"] for c in pub["constraints"]] == [6, 34]


def test_published_cycle1_is_the_egfr_ecdna_cycle():
    g = gbm39_graph()
    pub = _published()
    edges, is_cycle, viol = segments_to_solution(g, pub["entries"][0]["tokens"])
    assert viol == [] and is_cycle
    assert edges == {("e", 1): 1, ("e", 3): 1, ("e", 5): 1,
                     ("d", 0): 1, ("d", 1): 1, ("d", 2): 1}


def test_published_cycle2_structurally_infeasible():
    """Published Cycle 2's path terminals have no s/t attachment in the
    reference model (infeasibility proof, part 2)."""
    g = gbm39_graph()
    pub = _published()
    edges, is_cycle, viol = segments_to_solution(g, pub["entries"][1]["tokens"])
    assert not is_cycle and edges is None
    assert sum("neither an endnode nor a source-edge node" in v
               for v in viol) == 2  # both terminals invalid


def test_published_solution_violates_cn_caps():
    """Even granting free path terminals (the pre-snapshot model),
    published Cycle 2's weight exceeds two concordant-edge CN caps it
    traverses (infeasibility proof, part 1)."""
    g = gbm39_graph()
    pub = _published()
    c1, _, v1 = segments_to_solution(g, pub["entries"][0]["tokens"])
    c2, _, _ = segments_to_solution(g, pub["entries"][1]["tokens"],
                                    allow_free_terminals=True)
    assert v1 == [] and c2 is not None
    viol = verify_reference_model(
        g, [[c1], [c2]], [[PUB_W1], [PUB_W2]])
    cn_viols = [v for v in viol if v.startswith("concordant edge")]
    # exactly the two 2.697741-cap edges between segments 4-5 and 5-6
    assert len(cn_viols) == 2
    assert any("55609190" in v for v in cn_viols)
    assert any("55610094" in v for v in cn_viols)
    # margin is ~0.1459: far beyond the 6-decimal rounding of graph.txt
    assert PUB_W2 - 2.697741 > 0.14
    # and the structural defect shows up as Eulerian imbalance at the
    # free terminals
    assert any("Eulerian imbalance" in v for v in viol)


def test_published_weight_even_reduced_cannot_reach_published_coverage():
    """No reweighting of the published STRUCTURE is feasible at the
    published coverage: capping w2 at the concordant cap 2.697741 (the
    max feasible) and raising w1 to the discordant cap 85.189818 yields
    exactly our solution's weights — the published numbers are not an
    alternative optimum but an artifact of a different (older) model."""
    g = gbm39_graph()
    conc_cap = min(e.cn for e in g.concordant_edges)
    disc_cap = min(d.cn for d in g.discordant_edges)
    assert conc_cap == pytest.approx(2.697741)
    assert disc_cap == pytest.approx(85.189818)
    assert PUB_W2 > conc_cap + 0.14          # published w2 infeasible
    assert PUB_W1 < disc_cap - 2.8           # published w1 leaves CN unused


def test_our_solution_feasible_under_reference_model(tmp_path):
    g, rec, _ = _our_solution(tmp_path)
    pc_list = rec.longest_path_constraints[0][0]
    viol = verify_reference_model(
        g, rec.cycles[0], rec.cycle_weights[0], pc_list=pc_list,
        require_all_pc=True)
    assert viol == [], f"our solution violates the reference model: {viol}"


def test_our_solution_dominates_published(tmp_path):
    g, rec, parsed = _our_solution(tmp_path)
    ours_cov = decomposition_coverage(g, rec.cycles[0], rec.cycle_weights[0])
    # published coverage under its own (infeasible) weights
    pub = _published()
    pub_cycles = [[], []]
    for e in pub["entries"]:
        edges, is_cycle, _ = segments_to_solution(
            g, e["tokens"], allow_free_terminals=True)
        pub_cycles[0 if is_cycle else 1].append(edges)
    pub_cov = decomposition_coverage(
        g, pub_cycles, [[PUB_W1], [PUB_W2]])
    assert ours_cov > pub_cov  # strictly more CN explained
    # equal decomposition count, equal pc satisfaction
    n_ours = len(rec.cycle_weights[0][0]) + len(rec.cycle_weights[0][1])
    assert n_ours == len(pub["entries"]) == 2
    ours_sat = {pi for lists in rec.path_constraints_satisfied[0]
                for pcs in lists for pi in pcs}
    assert len(ours_sat) == 2 == sum(c["satisfied"]
                                     for c in pub["constraints"])


def test_canonicalized_cycle_matches_published(tmp_path):
    """The shared EGFR ecDNA cycle is identical after rotation/reflection
    canonicalization, and our weight is the provable maximum (d2's cap)."""
    g, rec, parsed = _our_solution(tmp_path)
    ours = {canonical_tokens(e["tokens"]): e["copy_count"]
            for e in parsed["entries"]}
    pub = {canonical_tokens(e["tokens"]): e["copy_count"]
           for e in _published()["entries"]}
    shared = set(ours) & set(pub)
    assert canonical_tokens(["2+", "4+", "6+"]) in shared
    key = canonical_tokens(["2+", "4+", "6+"])
    d2_cap = g.discordant_edges[1].cn
    assert ours[key] == pytest.approx(d2_cap, abs=1e-4)
    assert ours[key] > pub[key]  # strictly more weight on the same cycle


def test_canonical_tokens_invariance():
    a = canonical_tokens(["2+", "4+", "6+"])
    assert a == canonical_tokens(["4+", "6+", "2+"])        # rotation
    assert a == canonical_tokens(["6-", "4-", "2-"])        # reflection
    p = canonical_tokens(["0+", "1+", "2+", "0-"])
    assert p == canonical_tokens(["0+", "2-", "1-", "0-"])  # path reversal
