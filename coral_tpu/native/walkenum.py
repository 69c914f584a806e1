"""ctypes bindings for the native walk enumerator (``walkenum.cpp``)."""
from __future__ import annotations

import ctypes as C
import os
from typing import List, Optional

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "libwalkenum.so")
_lib = None

# key type codes (Python key space: ('e'|'c'|'d'|'s'|'t'|'ns'|'nt', idx))
TYPE_CODES = {"e": 0, "c": 1, "d": 2, "s": 3, "t": 4, "ns": 5, "nt": 6}
TYPE_NAMES = {v: k for k, v in TYPE_CODES.items()}


def available() -> bool:
    return os.path.exists(_SO_PATH)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = C.CDLL(_SO_PATH)
    i32p = C.POINTER(C.c_int32)
    lib.we_create.restype = C.c_void_p
    lib.we_create.argtypes = [
        C.c_int32, C.c_int32, i32p, i32p, C.POINTER(C.c_int64), i32p,
        C.c_int32, i32p, i32p, i32p, i32p,
        i32p, i32p, C.POINTER(C.c_uint8),
        C.c_int32, i32p, i32p, i32p,
        C.c_int32, C.c_int32, C.c_int64,
    ]
    lib.we_run.argtypes = [C.c_void_p]
    lib.we_free.argtypes = [C.c_void_p]
    lib.we_n_candidates.restype = C.c_int64
    lib.we_n_candidates.argtypes = [C.c_void_p]
    lib.we_truncated.restype = C.c_int32
    lib.we_truncated.argtypes = [C.c_void_p]
    for fn, ty in [("we_cand_off", C.c_int64), ("we_keys", C.c_int32),
                   ("we_counts", C.c_int32), ("we_iscycle", C.c_uint8),
                   ("we_seqweight", C.c_double)]:
        getattr(lib, fn).restype = C.POINTER(ty)
        getattr(lib, fn).argtypes = [C.c_void_p]
    _lib = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(C.POINTER(ctype))


def enumerate_native(
    g,
    caps: dict,
    max_multiplicity: int,
    max_bp_steps: int,
    max_states: int,
):
    """Run the native enumerator over a BreakpointGraph.

    Returns (candidates, truncated) where candidates is a list of
    (edge_dict, is_cycle, seq_weight) tuples in the native emission order.
    """
    from ..graph.breakpoint_graph import CONC, DISC, SEQ

    lib = _load()
    nodes = list(g.nodes.keys())
    node_id = {n: i for i, n in enumerate(nodes)}
    n_nodes = len(nodes)
    n_seq = len(g.sequence_edges)
    seq_left = np.asarray(
        [node_id[(e.chrom, e.start, "-")] for e in g.sequence_edges], np.int32)
    seq_right = np.asarray(
        [node_id[(e.chrom, e.end, "+")] for e in g.sequence_edges], np.int32)
    seq_len = np.asarray([e.size for e in g.sequence_edges], np.int64)
    node_seq = np.full(n_nodes, -1, np.int32)
    for i, n in enumerate(nodes):
        adj = g.nodes[n][SEQ]
        node_seq[i] = adj[0] if adj else -1

    # bp edges: concordant first, then discordant (key space matches)
    lc = len(g.concordant_edges)
    bp_n1, bp_n2, bp_cap_arr, bp_key = [], [], [], []
    for ci, e in enumerate(g.concordant_edges):
        bp_n1.append(node_id[e.node1()])
        bp_n2.append(node_id[e.node2()])
        bp_cap_arr.append(caps[("c", ci)])
        bp_key.append((TYPE_CODES["c"] << 24) | ci)
    for di, e in enumerate(g.discordant_edges):
        bp_n1.append(node_id[e.node1()])
        bp_n2.append(node_id[e.node2()])
        bp_cap_arr.append(caps[("d", di)])
        bp_key.append((TYPE_CODES["d"] << 24) | di)
    n_bp = len(bp_n1)

    # adjacency in the Python _bp_edges_at order: conc ids then disc ids,
    # first occurrence only
    adj_off = [0]
    adj_ids: List[int] = []
    for n in nodes:
        seen = set()
        for ci in g.nodes[n][CONC]:
            if ci not in seen:
                seen.add(ci)
                adj_ids.append(ci)
        for di in g.nodes[n][DISC]:
            if (lc + di) not in seen:
                seen.add(lc + di)
                adj_ids.append(lc + di)
        adj_off.append(len(adj_ids))

    is_endnode = np.asarray(
        [1 if n in g.endnodes else 0 for n in nodes], np.uint8)
    endnode_list = list(g.endnodes.keys())
    term_node, term_skey, term_tkey = [], [], []
    for i, n in enumerate(endnode_list):
        term_node.append(node_id[n])
        term_skey.append((TYPE_CODES["ns"] << 24) | i)
        term_tkey.append((TYPE_CODES["nt"] << 24) | i)
    for i, s in enumerate(g.source_edges):
        term_node.append(node_id[s.node()])
        term_skey.append((TYPE_CODES["s"] << 24) | i)
        term_tkey.append((TYPE_CODES["t"] << 24) | i)

    arrs = dict(
        seq_left=seq_left, seq_right=seq_right, seq_len=seq_len,
        node_seq=node_seq,
        bp_n1=np.asarray(bp_n1, np.int32), bp_n2=np.asarray(bp_n2, np.int32),
        bp_cap=np.asarray(bp_cap_arr, np.int32),
        bp_key=np.asarray(bp_key, np.int32),
        adj_off=np.asarray(adj_off, np.int32),
        adj_ids=np.asarray(adj_ids, np.int32),
        is_endnode=is_endnode,
        term_node=np.asarray(term_node, np.int32),
        term_skey=np.asarray(term_skey, np.int32),
        term_tkey=np.asarray(term_tkey, np.int32),
    )
    h = lib.we_create(
        n_nodes, n_seq,
        _ptr(arrs["seq_left"], C.c_int32), _ptr(arrs["seq_right"], C.c_int32),
        _ptr(arrs["seq_len"], C.c_int64), _ptr(arrs["node_seq"], C.c_int32),
        n_bp, _ptr(arrs["bp_n1"], C.c_int32), _ptr(arrs["bp_n2"], C.c_int32),
        _ptr(arrs["bp_cap"], C.c_int32), _ptr(arrs["bp_key"], C.c_int32),
        _ptr(arrs["adj_off"], C.c_int32), _ptr(arrs["adj_ids"], C.c_int32),
        _ptr(arrs["is_endnode"], C.c_uint8),
        len(term_node), _ptr(arrs["term_node"], C.c_int32),
        _ptr(arrs["term_skey"], C.c_int32), _ptr(arrs["term_tkey"], C.c_int32),
        max_multiplicity, max_bp_steps, max_states,
    )
    try:
        lib.we_run(h)
        n_cand = lib.we_n_candidates(h)
        truncated = bool(lib.we_truncated(h))
        if n_cand == 0:
            # empty pool: the column pointers are empty-vector data()
            # (NULL), which np.ctypeslib.as_array rejects even for a
            # dummy shape — a tiny budget / degenerate graph must yield
            # an empty (possibly truncated) pool like the python engine,
            # not a ValueError
            return [], truncated
        off = np.ctypeslib.as_array(lib.we_cand_off(h), shape=(n_cand + 1,))
        total_keys = int(off[-1])
        keys = np.ctypeslib.as_array(lib.we_keys(h), shape=(max(total_keys, 1),))
        counts = np.ctypeslib.as_array(lib.we_counts(h), shape=(max(total_keys, 1),))
        iscycle = np.ctypeslib.as_array(lib.we_iscycle(h), shape=(n_cand,))
        weight = np.ctypeslib.as_array(lib.we_seqweight(h), shape=(n_cand,))
        out = []
        for k in range(n_cand):
            edges = {}
            for p in range(int(off[k]), int(off[k + 1])):
                key = int(keys[p])
                edges[(TYPE_NAMES[key >> 24], key & 0xFFFFFF)] = int(counts[p])
            out.append((edges, bool(iscycle[k]), float(weight[k])))
        return out, truncated
    finally:
        lib.we_free(h)
