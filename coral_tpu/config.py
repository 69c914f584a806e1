"""Typed configuration for the whole engine.

The reference scatters its tunables across argparse defaults
(``src/CoRAL.py``), class attributes (``src/infer_breakpoint_graph.py:25-33``)
and keyword defaults (``src/cycle_decomposition.py:14-15,980-982``), plus
inline magic numbers (mapq gates, 500 bp min_overlap, 6 kb CN-boundary
windows).  Here every knob lives in one frozen dataclass tree so host code,
jitted kernels, and the CLI all read the same values.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SeedConfig:
    """CN-gain seeding (reference ``src/cnv_seed.py:6-9``)."""
    gain: float = 6.0                 # absolute CN threshold for seeds
    min_seed_size: int = 99999        # CNSIZE_MIN
    max_seed_size: int = 5000001      # CNSIZE_MAX (not CLI-exposed upstream)
    max_seg_gap: int = 300001         # CNGAP_MAX


@dataclass(frozen=True)
class BreakpointConfig:
    """Breakpoint extraction + clustering
    (reference ``src/infer_breakpoint_graph.py:25-33`` and call sites)."""
    min_mapq: float = 20.0            # mapq gate on both sides of a pair
    gap_mapq: float = 10.0            # low-mapq middle rescue threshold
    min_bp_match_cutoff: int = 100    # query-gap tolerance / match window
    max_bp_distance_cutoff: int = 2000  # cluster linkage distance
    min_cluster_cutoff: int = 3       # hard floor on cluster size
    min_bp_cov_factor: float = 1.0    # support >= factor * normal_cov
    min_del_len: int = 600            # CIGAR deletion length -> breakpoint
    addbp_merge_window: int = 200     # dedup window in addbp (ref :329)
    same_strand_gap_frac: float = 0.2  # ref/read gap discrepancy fraction
    nm_filter: bool = False           # edit-distance filter (suppressed)


@dataclass(frozen=True)
class IntervalConfig:
    """Amplicon interval search (reference ``infer_breakpoint_graph.py:25-33``)."""
    max_seq_len: int = 2_000_000
    cn_gain: float = 5.0
    interval_delta: int = 100_000
    seg_index_gap: int = 2            # CN-segment index jump that splits runs


@dataclass(frozen=True)
class CnSolverConfig:
    """Convex CN-balance solve (replaces cvxopt ``solvers.cp``;
    reference ``src/breakpoint_graph.py:495-606``)."""
    max_iters: int = 1000
    tol: float = 1e-10                # gradient/KKT residual tolerance
    init_value: float = 1.0           # cvxopt F(None) starting point
    min_x: float = 1e-12              # positivity floor during line search


@dataclass(frozen=True)
class PathConstraintConfig:
    """Read->walk conversion (reference ``src/path_constraints.py:48,214,234``)."""
    min_overlap: int = 500            # bp overlap with terminal seq edges
    min_path_edges: int = 3           # >=3 sequence edges to keep a path


@dataclass(frozen=True)
class CycleConfig:
    """Cycle decomposition (reference ``src/cycle_decomposition.py:14-15,
    980-1002,1495-1533``)."""
    alpha: float = 0.01
    p_total_weight: float = 0.9
    p_bp_cn: float = 0.9
    resolution: float = 0.1
    cn_tol: float = 0.005
    p_subpaths: float = 0.9
    max_edge_multiplicity: int = 10   # ub on x variables
    max_disc_multiplicity: int = 5    # cap in multiplicity inference
    time_limit_s: int = 7200
    threads: int = -1
    postprocess: bool = False
    # our solver's own knobs (no reference analog)
    max_walk_candidates: int = 200_000  # candidate pool bound
    eulerian_seed: int = 0            # seeded Eulerian traversal RNG
    eulerian_max_trials: int = 1000   # ref :1627
    # escalation fallback when the pool truncates / coverage is missed:
    # (cap_mode, budget_factor) attempts tried in order — 'same' keeps the
    # inference-based concordant cap (addresses truncation), 'wide' lifts
    # it to max_edge_multiplicity (addresses cap-pruned coverage) — and
    # the pool size up to which the joint MILP (not greedy) is re-solved
    pool_escalation: tuple = (("same", 10), ("same", 100), ("wide", 100))
    joint_milp_pool_limit: int = 10_000
    # even when the narrow pool solved with full coverage, run ONE
    # wide-caps verification pass: a pool complete under the inference
    # caps (conc_cap = max_mult+1 + its derived walk-depth bound) can
    # miss lower-DECOMPOSITION-COUNT solutions the reference model's
    # ub-10 search admits (found by the gurobipy-facade differential on
    # a dense uniform-CN graph: reference 1 decomposition, narrow pool 2)
    pool_verify_wide: bool = True
    # column generation over walks (cycles/colgen.py) when the walk
    # space was not provably exhausted: price walks against the master
    # LP duals, extend the pool, re-solve, and record a numeric
    # optimality_gap_upper_bound in *_model.json (reference contrast:
    # Gurobi's implicit edge-multiset search + MIPGap)
    colgen: bool = True
    colgen_rounds: int = 8
    colgen_pricing_states: int = 200_000
    # branch-and-price (cycles/colgen.branch_and_price): when the LP
    # gap after column generation stays positive, branch on fractional
    # master columns to bound/certify the INTEGER optimum (the
    # reference contrast is Gurobi's in-solver branch-and-bound)
    branch_and_price: bool = True
    bnp_max_nodes: int = 24


@dataclass(frozen=True)
class EngineConfig:
    """Compute-engine routing for the scoring and CN hot paths (no
    reference analog; SURVEY §2.1 — the TPU kernels are pipeline
    components, not bench-only artifacts).

    ``engine`` picks the junction-predicate evaluator in
    ``ops.pairs.score_pairs_l``: ``numpy`` (host), ``jax`` (XLA device
    program; on a TPU backend with the NM gate off this self-routes to
    the Pallas kernel), ``pallas`` (force the Mosaic kernel), or ``auto``.
    ``auto`` resolves through the measured cost model
    (``ops.routing.decide``): host rate and host→device transfer
    bandwidth are measured once per process, a cold accelerator compile
    (measured 48–271 s/shape on the remote axon backend; ~20–40 s
    directly attached) is priced in unless the bucketed kernel shape is
    already warm in-process, and the device wins only when
    ``move_bytes/put_bw + rtt + dispatch + compile < n_pairs/host_rate``.
    Round 4 used a fixed 1M-pair threshold instead; BENCH_r04 recorded
    it flipping to the device into an unpriced cold compile (26 s →
    305 s end-to-end) — the cost model exists so `auto` can never lose
    that way.  Set ``device_pair_threshold`` to a pair count to restore
    the fixed-threshold rule (tests and calibrated deployments).

    ``cn_engine`` picks the CN-balance solver engine
    (``graph.cn_solver``): ``numpy`` (f64 damped-Newton), ``jax``
    (CPU-f64 jit), ``batch`` (padded vmap over amplicons,
    mesh-shardable; digit-exact on every backend since round 5 — f64
    working precision with f32-LU + f64-iterative-refinement KKT
    solves where the backend lacks f64 LU), or ``auto`` (resolved by
    ``cn_solver.resolve_cn_engine``: the batch engine at >=
    ``cn_batch_threshold`` amplicons on f64 backends, jax-f64 below it,
    numpy f64 on a TPU-only process for compile economics — tiny
    systems solve in microseconds on host while a remote-backend
    compile costs minutes).
    """
    engine: str = "auto"              # auto | numpy | jax | pallas
    cn_engine: str = "auto"           # auto | numpy | jax | batch
    # None = measured cost-model routing (ops.routing); an int restores
    # the legacy fixed-threshold rule
    device_pair_threshold: "int | None" = None
    # conservative cold-compile estimate priced into the auto route when
    # the kernel bucket has not yet compiled in this process
    compile_cold_s: float = 240.0
    cn_batch_threshold: int = 32


@dataclass(frozen=True)
class ParallelConfig:
    """TPU sharding (no reference analog; SURVEY §2.1)."""
    dp_axis: str = "dp"
    read_batch: int = 1 << 16         # reads per device batch
    pair_batch: int = 1 << 17         # alignment pairs per device batch


@dataclass(frozen=True)
class Config:
    seed: SeedConfig = field(default_factory=SeedConfig)
    bp: BreakpointConfig = field(default_factory=BreakpointConfig)
    interval: IntervalConfig = field(default_factory=IntervalConfig)
    cn: CnSolverConfig = field(default_factory=CnSolverConfig)
    pc: PathConstraintConfig = field(default_factory=PathConstraintConfig)
    cycles: CycleConfig = field(default_factory=CycleConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)


DEFAULT_CONFIG = Config()
