"""Randomized Eulerian traversal-class sweep.

Random planted graphs -> every enumerated cycle/path candidate (bounded)
-> exhaustively enumerate its complete traversals with the golden
harness -> the product's seeded traversal must be one of them (and in
the canonical AA class) for several seeds."""
import random

import pytest


from test_eulerian_golden import (  # noqa: E402
    all_cycle_traversals, all_path_traversals)
from test_reference_miqp import (  # noqa: E402
    _mult2_graph, _planted_graph, _two_cycle_graph)

from coral_tpu.cycles.candidates import enumerate_candidates  # noqa: E402
from coral_tpu.cycles.eulerian import eulerian_cycle, eulerian_path  # noqa: E402
from coral_tpu.cycles.refmodel import canonical_tokens  # noqa: E402


@pytest.mark.parametrize("seed", [163, 167, 173, 179, 181, 191, 193, 197])
def test_random_traversal_classes(seed):
    rng = random.Random(seed)
    kind = rng.choice(["planted", "two_cycle", "mult2"])
    if kind == "planted":
        g = _planted_graph(rng, n_segs=rng.randint(3, 4))
    elif kind == "two_cycle":
        g = _two_cycle_graph(rng, n_segs=rng.randint(4, 6))
    else:
        g = _mult2_graph(rng)
    cands = list(enumerate_candidates(g))
    rng.shuffle(cands)
    checked_c = checked_p = 0
    for c in cands:
        if checked_c >= 4 and checked_p >= 4:
            break
        edges = c.edge_dict()
        if c.is_cycle:
            if checked_c >= 4:
                continue
            allts = all_cycle_traversals(g, edges)
            if not allts or len(allts) > 2000:
                continue
            strings = {tuple(t) for t, _ in allts}
            classes = {canonical_tokens(t[:-1]) for t, _ in allts}
            for s2 in range(4):
                tokens = eulerian_cycle(g, dict(edges), [], [], seed=s2)
                assert tuple(tokens) in strings, (seed, kind, edges, tokens)
                assert canonical_tokens(tokens[:-1]) in classes
            checked_c += 1
        else:
            if checked_p >= 4:
                continue
            allts = all_path_traversals(g, edges)
            if not allts or len(allts) > 2000:
                continue
            strings = {tuple(t) for t, _ in allts}
            for s2 in range(4):
                tokens = eulerian_path(g, dict(edges), [], [], seed=s2)
                assert tuple(tokens) in strings, (seed, kind, edges, tokens)
            checked_p += 1
    assert checked_c + checked_p >= 2, (seed, kind)
