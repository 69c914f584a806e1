"""AA-compatible ``*_cycles.txt`` writer.

Behavioral port of ``output_cycles`` (``src/cycle_decomposition.py:
1937-2063``): intervals, segment list, (longest or all) subpath
constraints with Support/Satisfied annotations, then cycles sorted by
weight descending with ``Cycle=i;Copy_count=w;Segments=...`` rows; paths
are wrapped ``0+,...,0-``.
"""
from __future__ import annotations

import logging

from ..constants import CHR_IDX
from .eulerian import eulerian_cycle, eulerian_path

logger = logging.getLogger(__name__)


def _write_path_tokens(fp, path_):
    if path_[0][1] > path_[-1][1]:
        path_ = path_[::-1]
    for i in range(len(path_)):
        if i % 4 == 0:
            if i < len(path_) - 1:
                if path_[i + 1][2] == "+":
                    fp.write("%d+," % (path_[i][1] + 1))
                else:
                    fp.write("%d-," % (path_[i][1] + 1))
            else:
                if path_[i - 1][2] == "+":
                    fp.write("%d-\t" % (path_[i][1] + 1))
                else:
                    fp.write("%d+\t" % (path_[i][1] + 1))


def output_cycles(rec, prefix: str, output_all_paths: bool = False,
                  eulerian_seed: int = 0, max_trials: int = 1000) -> None:
    for amplicon_idx, g in enumerate(rec.graphs):
        out_fn = f"{prefix}_amplicon{amplicon_idx + 1}_cycles.txt"
        with open(out_fn, "w") as fp:
            # visible degradation marker (no reference analog: the Gurobi
            # search never truncates; our candidate pool can — the driver
            # records any residual truncation + coverage miss here so the
            # output is never silently suboptimal)
            note = getattr(rec, "decomposition_notes", {}).get(amplicon_idx)
            if note:
                fp.write(f"# WARNING: {note}\n")
            interval_num = 1
            ai_amplicon = [ai for ai in rec.amplicon_intervals
                           if rec.ccid2id[ai[3]] == amplicon_idx + 1]
            ai_amplicon.sort(key=lambda ai: (CHR_IDX[ai[0]], ai[1]))
            for ai in ai_amplicon:
                fp.write("Interval\t%d\t%s\t%d\t%d\n"
                         % (interval_num, ai[0], ai[1], ai[2]))
                interval_num += 1
            fp.write("List of cycle segments\n")
            for seqi, e in enumerate(g.sequence_edges):
                fp.write("Segment\t%d\t%s\t%d\t%d\n"
                         % (seqi + 1, e.chrom, e.start, e.end))
            if output_all_paths:
                fp.write("List of all subpath constraints\n")
                for pathi, path_ in enumerate(rec.path_constraints[amplicon_idx][0]):
                    fp.write("Path constraint\t%d\t" % (pathi + 1))
                    _write_path_tokens(fp, path_)
                    fp.write("Support=%d\n"
                             % rec.path_constraints[amplicon_idx][1][pathi])
            else:
                fp.write("List of longest subpath constraints\n")
                satisfied_indices = []
                for lists in (rec.path_constraints_satisfied[amplicon_idx][0]
                              + rec.path_constraints_satisfied[amplicon_idx][1]):
                    for pathi in lists:
                        if pathi not in satisfied_indices:
                            satisfied_indices.append(pathi)
                longest = rec.longest_path_constraints[amplicon_idx]
                for ci in range(len(longest[1])):
                    fp.write("Path constraint\t%d\t" % (ci + 1))
                    path_ = rec.path_constraints[amplicon_idx][0][longest[1][ci]]
                    _write_path_tokens(fp, path_)
                    fp.write("Support=%d\t" % longest[2][ci])
                    fp.write("Satisfied\n" if ci in satisfied_indices
                             else "Unsatisfied\n")

            weights = rec.cycle_weights[amplicon_idx]
            cycle_indices = sorted(
                [(0, i) for i in range(len(weights[0]))]
                + [(1, i) for i in range(len(weights[1]))],
                key=lambda it: weights[it[0]][it[1]], reverse=True)
            for rank, cycle_i in enumerate(cycle_indices):
                slot, idx = cycle_i
                pcs_sat = rec.path_constraints_satisfied[amplicon_idx][slot][idx]
                pcs_paths = []
                pcs_support = []
                longest = rec.longest_path_constraints[amplicon_idx]
                for pathi in pcs_sat:
                    pcs_paths.append(
                        rec.path_constraints[amplicon_idx][0][longest[1][pathi]])
                    pcs_support.append(longest[2][pathi])
                edges = rec.cycles[amplicon_idx][slot][idx]
                if slot == 0:
                    tokens = eulerian_cycle(g, edges, pcs_paths, pcs_support,
                                            max_trials,
                                            seed=eulerian_seed + rank)
                    # traversal closes on the starting segment: first token
                    # repeats at the end and is dropped (ref :2020-2026)
                    if not tokens or tokens[0] != tokens[-1]:
                        # all randomized trials dead-ended: refuse to emit
                        # a malformed "Segments=" row (and unlike assert,
                        # this survives python -O), mirroring the path
                        # branch below
                        raise RuntimeError(
                            "no Eulerian cycle realizes decomposition %d "
                            "of amplicon %d" % (rank + 1, amplicon_idx + 1))
                    fp.write("Cycle=%d;" % (rank + 1))
                    fp.write("Copy_count=%s;" % str(weights[slot][idx]))
                    fp.write("Segments=")
                    fp.write(",".join(tokens[:-1]))
                else:
                    tokens = eulerian_path(g, edges, pcs_paths, pcs_support,
                                           max_trials,
                                           seed=eulerian_seed + rank)
                    if not tokens:
                        # every randomized trial dead-ended: refuse to emit
                        # a malformed "Segments=0+,,0-" row (the reference
                        # IndexErrors here rather than corrupt the file)
                        raise RuntimeError(
                            "no Eulerian path realizes decomposition %d of "
                            "amplicon %d" % (rank + 1, amplicon_idx + 1))
                    fp.write("Cycle=%d;" % (rank + 1))
                    fp.write("Copy_count=%s;" % str(weights[slot][idx]))
                    fp.write("Segments=0+,")
                    fp.write(",".join(tokens))
                    fp.write(",0-")
                if not output_all_paths:
                    fp.write(";Path_constraints_satisfied=")
                    fp.write(",".join(str(p + 1) for p in pcs_sat))
                    fp.write("\n")
                else:
                    fp.write("\n")
        logger.info("wrote %s", out_fn)
