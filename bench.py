"""Benchmark harness: breakpoint + coverage scoring throughput per chip.

Times the engine's flagship device step — junction predicates + support
histogram + exact interval-coverage lookups — imported from the PRODUCT
module ``coral_tpu.ops.scoring`` (the same ``pair_predicate`` /
``coverage_prefix_eval`` code every pipeline path runs; no inline
re-implementation).  Coverage prefix TABLES build once per read batch
(exactly as the pipeline amortizes them across its many interval/bin
queries) and their build cost is reported separately
(``coverage_table_build_ms``) — an earlier bench folded the 2M-element
sort+cumsum into every dispatch and the headline measured the sort, not
the scoring.  The baseline is the identical math executed by
single-thread numpy through the same product functions; the reference's
own architecture is pure single-thread Python, so this is a conservative
lower bound on the true speedup.

Timing methodology (axon): on this remote-TPU backend
``jax.block_until_ready`` returns when the dispatch RPC is acknowledged,
NOT when device execution finishes (measured: a 1 GiB reduction "completes"
in 31 us = 34 TB/s, 40x the chip's HBM), and a host fetch pays a ~25 ms
tunnel round-trip.  Every timing here therefore enqueues a chain of N
dispatches, forces ONE host fetch, and takes the slope between two chain
lengths — per-dispatch device time with both the RPC ack and the fetch
latency cancelled.  Calibration: a 1 GiB HBM reduction times at ~736 GB/s
(90% of v5e speed-of-light) under this scheme.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N, ...}
Extra keys: bytes-roofline utilization for the scoring dispatch, the
XLA-engine secondary number, the amortized table-build time, and an
end-to-end reconstruct wall-clock on a simulated multi-amplicon sample.
"""
from __future__ import annotations

import json
import time

import numpy as np




def synth_scoring_batch(n_reads: int, n_intervals: int = 16, seed: int = 0):
    rng = np.random.default_rng(seed)
    n_pairs = n_reads  # ~one junction candidate pair per chimeric read
    starts = rng.integers(0, 200_000_000, n_reads).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n_reads)).astype(np.int32)
    cols = dict(
        qi_end=rng.integers(0, 30_000, n_pairs).astype(np.int32),
        qj_start=rng.integers(0, 30_000, n_pairs).astype(np.int32),
        chrom_i=rng.integers(0, 24, n_pairs).astype(np.int32),
        r1_i=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        r2_i=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        strand_i=rng.choice([-1, 1], n_pairs).astype(np.int32),
        mapq_i=rng.integers(0, 61, n_pairs).astype(np.int32),
        nm_i=(rng.random(n_pairs) * 0.2).astype(np.float32),
        chrom_j=rng.integers(0, 24, n_pairs).astype(np.int32),
        r1_j=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        r2_j=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        strand_j=rng.choice([-1, 1], n_pairs).astype(np.int32),
        mapq_j=rng.integers(0, 61, n_pairs).astype(np.int32),
        nm_j=(rng.random(n_pairs) * 0.2).astype(np.float32),
    )
    int_chrom = (np.arange(n_intervals) % 24).astype(np.int32)
    int_start = (np.arange(n_intervals) * 3_000_000).astype(np.int32)
    int_end = (int_start + 2_000_000).astype(np.int32)
    return starts, ends, cols, int_chrom, int_start, int_end


from coral_tpu.ops.scoring import COL_ORDER  # canonical order


def roofline_utilization(n_reads: int, t_dev: float,
                         bytes_per_read: int = 12) -> float:
    """Fraction of v5e HBM speed-of-light the scoring dispatch achieves.

    IMPORTANT CAVEAT: for the FUSED predicate+histogram kernel this is a
    **bytes-moved account, not an HBM-saturation claim** — that dispatch
    is VPU-bound (the per-interval support histogram costs ~2-3 compare/
    select ops per interval per pair, structurally, on a compare-select
    vector unit; op/byte model in docs/ARCHITECTURE.md "round 4"), so
    its fraction reads low precisely BECAUSE the v3 layout moves so few
    bytes.  The saturation-meaningful number is the product hit-mask
    route (``hitmask_roofline_frac``): 12 B/pair read + 4 B/pair
    written, measured ~0.27 of the 819 GB/s THEORETICAL peak — which is
    the full attainable per-dispatch streaming ceiling of this regime
    (a zero-compute control op over the same shapes attains the same
    ~225 GB/s; docs/ARCHITECTURE.md "round 4").

    Layout bytes: v3 = 3 int32 columns = 12 B/pair (interval+MAPQ gates
    resolved at pack time, reference jump pre-derived); v2 = 16 B/pair;
    round-2 6-column = 24 B/pair; XLA unpacked = 56 B/pair.  Table
    builds are timed separately — they amortize across the pipeline's
    many queries per read batch.
    """
    hbm_bw = 819e9
    t_light = n_reads * bytes_per_read / hbm_bw
    return t_light / t_dev


def slope_time_ms(fn, *args, n1=8, n2=96, rounds=7, scalar_fetch=False):
    """Per-dispatch device time via the chain-slope method (see module
    docstring): median over ``rounds`` of a length-N dispatch chain ended
    by one host fetch, slope between N=n1 and N=n2.

    ``scalar_fetch`` reduces the chain-end output to one scalar ON
    DEVICE before fetching (one extra reduce per measurement — constant,
    cancels in the slope).  Use it when the output is large: fetching an
    8 MB hit mask per measurement puts ~100 ms of tunnel variance
    against a few ms of slope signal (observed as a negative-slope
    artifact on the hit-mask kernel)."""
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + compile

    def fetch(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        if scalar_fetch:
            return np.asarray(jnp.sum(leaf))
        return np.asarray(leaf)

    def run(N):
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            o = None
            for _ in range(N):
                o = fn(*args)
            fetch(o)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (run(n2) - run(n1)) / (n2 - n1) * 1e3


def slope_pair_ms(fn_a, args_a, fn_b, args_b, n1=16, n2=256, rounds=5):
    """Chain-slope times of TWO programs measured INTERLEAVED (A@n1,
    B@n1, A@n2, B@n2 within each round) so tunnel/clock drift hits both
    alike and their RATIO is stable — the kernel-vs-control ceiling
    ratio measured minutes apart showed the kernel 'beating' a
    zero-compute op purely from drift.  Scalar-fetch chain ends (see
    ``slope_time_ms``)."""
    import jax
    import jax.numpy as jnp

    for fn, args in ((fn_a, args_a), (fn_b, args_b)):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # warm

    def chain(fn, args, N):
        t0 = time.perf_counter()
        o = None
        for _ in range(N):
            o = fn(*args)
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        return time.perf_counter() - t0

    a1s, b1s, a2s, b2s = [], [], [], []
    for _ in range(rounds):
        a1s.append(chain(fn_a, args_a, n1))
        b1s.append(chain(fn_b, args_b, n1))
        a2s.append(chain(fn_a, args_a, n2))
        b2s.append(chain(fn_b, args_b, n2))
    dn = n2 - n1
    t_a = (float(np.median(a2s)) - float(np.median(a1s))) / dn * 1e3
    t_b = (float(np.median(b2s)) - float(np.median(b1s))) / dn * 1e3
    return t_a, t_b


def synth_alignment_table(cols: dict):
    """Interleave the synthetic pair columns into a product-shaped flat
    ALIGNMENT table (pair k = alignments (2k, 2k+1)) so the bench packs
    through the exact product route (native ``bamcore.bc_pack_pairs``
    gather+pack from flat columns, as ``score_pairs_l`` does)."""
    n = len(cols["qi_end"])

    def interleave(a, b, dtype):
        out = np.empty(2 * n, dtype)
        out[0::2] = a
        out[1::2] = b
        return out

    qs = interleave(np.zeros(n, np.int64), cols["qj_start"], np.int64)
    qe = interleave(cols["qi_end"], np.zeros(n, np.int64), np.int64)
    r1 = interleave(cols["r1_i"], cols["r1_j"], np.int64)
    r2 = interleave(cols["r2_i"], cols["r2_j"], np.int64)
    chrom = interleave(cols["chrom_i"], cols["chrom_j"], np.int32)
    strand = interleave(cols["strand_i"], cols["strand_j"], np.int8)
    mapq = interleave(cols["mapq_i"], cols["mapq_j"], np.int32)
    pi = (2 * np.arange(n)).astype(np.int64)
    return pi, qs, qe, r1, r2, chrom, strand, mapq


def e2e_reconstruct(cfg=None) -> dict:
    """Full product pipeline (scan -> cycles.txt) on a simulated
    multi-amplicon mixed sample; runs the same `reconstruct` code path
    users run.  Returns stage timings and the output file contents so the
    device-forced run can be proven byte-identical to the host run."""
    import os
    import tempfile

    from coral_tpu.sim import simulate_mixed_sample
    from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs

    with tempfile.TemporaryDirectory() as td:
        bam, cns, seeds = simulate_mixed_sample(td, seed=7)
        prefix = os.path.join(td, "out")
        t0 = time.perf_counter()
        kw = {} if cfg is None else {"cfg": cfg}
        rec = reconstruct_graphs(bam, seeds, cns, prefix, **kw)
        t_graph = time.perf_counter() - t0
        t1 = time.perf_counter()
        reconstruct_cycles(rec, prefix)
        t_cycles = time.perf_counter() - t1
        rec.bam.close()
        files = {}
        for f in sorted(os.listdir(td)):
            if f.startswith("out_") and f.endswith(
                    ("_graph.txt", "_cycles.txt")):
                with open(os.path.join(td, f)) as fh:
                    files[f] = fh.read()
        return {"total_s": t_graph + t_cycles, "graph_s": t_graph,
                "cycles_s": t_cycles, "files": files}


def e2e_device_vs_host() -> dict:
    """Round-3 directive: one forced-device end-to-end per round.  The
    same mixed sample runs once on the host default and twice with the
    device engine forced (``engine='pallas'`` routes every
    ``score_pairs_l`` dispatch through the Mosaic kernel on real
    pipeline-derived chimera tables — ragged pair counts, bucketed
    padding, small interval tables).  cn_engine stays 'auto' (numpy f64;
    the TPU backend has no f64 LU — the product default for the same
    reason).  Asserts graph/cycles outputs byte-identical; reports cold
    (includes the kernel compile) and warm device wall-clocks."""
    import dataclasses

    from coral_tpu.config import DEFAULT_CONFIG

    e2e_reconstruct()          # warm imports/solver state for both arms
    host = e2e_reconstruct()
    cfg = DEFAULT_CONFIG.replace(
        engine=dataclasses.replace(DEFAULT_CONFIG.engine, engine="pallas"))
    dev_cold = e2e_reconstruct(cfg)   # cold = includes the kernel compile
    dev_warm = e2e_reconstruct(cfg)
    identical = host["files"] == dev_warm["files"]
    out = {
        "e2e_reconstruct_host_s": round(host["total_s"], 2),
        "e2e_reconstruct_device_s": round(dev_warm["total_s"], 2),
        "e2e_reconstruct_device_cold_s": round(dev_cold["total_s"], 2),
        "e2e_stage_split_s": {
            "host_graph": round(host["graph_s"], 2),
            "host_cycles": round(host["cycles_s"], 2),
            "device_graph": round(dev_warm["graph_s"], 2),
            "device_cycles": round(dev_warm["cycles_s"], 2),
        },
        "e2e_device_outputs_identical": identical,
    }
    if not identical:
        diff = [k for k in host["files"]
                if host["files"].get(k) != dev_warm["files"].get(k)]
        out["e2e_device_diff_files"] = diff
    return out


def e2e_wgs() -> dict:
    """Round-5 directive 1: WGS-scale reconstruct, auto vs forced-host,
    with the warm/cold split the round-4 bench lacked.  BENCH_r04
    recorded the fixed-threshold auto rule flipping to the device into
    an unpriced 280 s axon cold compile (26.3 s → 305.0 s end-to-end);
    auto now routes by the measured cost model
    (``coral_tpu.ops.routing``), and this bench records all three
    regimes honestly:

      host      — engine=numpy forced.
      auto/cold — engine=auto with the kernel-bucket registry cold: the
                  cost model must keep the route on host (a 48–271 s
                  compile can never amortize inside this stage) —
                  asserted.
      auto/warm — after warming the device bucket through the product
                  dispatch (one ``score_pairs_l(engine='jax')`` call,
                  paid OUTSIDE the timed arms, reported as
                  ``e2e_wgs_warmup_s``), auto re-decides on measured
                  transfer bandwidth vs measured host rate.  Whichever
                  way it routes, the decision reason is recorded and
                  outputs stay byte-identical.

    Route/scoring sub-times come from the API route records
    (``ops.pairs.ROUTE_RECORDS``), not log-string scraping.  Cycle
    decomposition is skipped (engine-independent host work).
    """
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import bench_wgs
    import numpy as _np

    from coral_tpu.ops import routing

    out = {}
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        bam, cns, seeds, n_rec = bench_wgs.build_junction_heavy(td)
        out["e2e_wgs_records"] = n_rec
        out["e2e_wgs_build_s"] = round(time.perf_counter() - t0, 1)
        # throwaway warm-up scan so neither timed arm pays the file-cache
        # and first-touch-paging cold costs (they differ 3x on this
        # microVM and would confound the host-vs-device comparison);
        # likewise pre-measure the route calibration (a once-per-process
        # product cost) so the arms compare like-for-like
        from coral_tpu.io.bam import BamFile

        BamFile(bam).close()
        # the bench process has already dispatched to the chip (headline
        # kernels), so measuring the link here is fast — the ~200 s
        # first-transfer session cost is not re-paid
        cal = routing.get_calibration(measure_device=True)
        out["e2e_wgs_route_calibration"] = {
            "host_Mpairs_per_s": round(cal.host_pairs_per_s / 1e6, 2),
            "pack_Mpairs_per_s": round(cal.pack_pairs_per_s / 1e6, 1),
            "put_MB_per_s": round(cal.put_bytes_per_s / 1e6, 1),
            "rtt_ms": round(cal.rpc_latency_s * 1e3, 1),
            "measured": cal.measured,
            "transfer_measured": cal.transfer_measured,
        }

        host_stages, _, host_files, _, host_recs = bench_wgs.run_staged(
            bam, cns, seeds, os.path.join(td, "host"), engine="numpy",
            skip_cycles=True)
        routing._warm_buckets.clear()   # deterministic cold state
        cold_stages, _, cold_files, _, cold_recs = bench_wgs.run_staged(
            bam, cns, seeds, os.path.join(td, "cold"), engine="auto",
            skip_cycles=True)

        def main_rec(recs):
            # the whole-table find_breakpoints pass (largest pair count)
            return max(recs, key=lambda r: r.n_pairs) if recs else None

        cold_main = main_rec(cold_recs)
        # warm the exact bucket the auto route would dispatch, through
        # the product path, outside the timed arms
        t0 = time.perf_counter()
        n_pairs = cold_main.n_pairs if cold_main else 1_500_000
        rng = _np.random.default_rng(0)
        n_aln = 2 * n_pairs
        from coral_tpu.ops.pairs import ChimeraTable, score_pairs_l

        tb = ChimeraTable(
            ["w%d" % i for i in range(n_pairs)],
            _np.arange(0, n_aln + 1, 2, dtype=_np.int32),
            rng.integers(0, 30000, n_aln).astype(_np.int64),
            rng.integers(30000, 60000, n_aln).astype(_np.int64),
            rng.integers(0, 24, n_aln).astype(_np.int32),
            rng.integers(0, 2 * 10**8, n_aln).astype(_np.int64),
            rng.integers(0, 2 * 10**8, n_aln).astype(_np.int64),
            rng.choice(_np.array([-1, 1], _np.int8), n_aln),
            rng.integers(0, 61, n_aln).astype(_np.int32),
            _np.zeros(n_aln, _np.float32))
        # twice: the first call compiles + warms the bucket, the second
        # records a clean observed warm-dispatch cost that the route
        # decision then uses directly
        score_pairs_l(tb, [["chr1", 0, 3_000_000]], 100, 20, 100,
                      np.inf, engine="jax")
        score_pairs_l(tb, [["chr1", 0, 3_000_000]], 100, 20, 100,
                      np.inf, engine="jax")
        out["e2e_wgs_warmup_s"] = round(time.perf_counter() - t0, 1)

        warm_stages, _, warm_files, _, warm_recs = bench_wgs.run_staged(
            bam, cns, seeds, os.path.join(td, "warm"), engine="auto",
            skip_cycles=True)
        warm_main = main_rec(warm_recs)
        host_main = main_rec(host_recs)

        identical = (list(host_files.values()) == list(cold_files.values())
                     == list(warm_files.values()))
        host_s = host_stages["total"]
        # never-loses is judged on the ENGINE-ATTRIBUTABLE scoring
        # sub-times: totals carry up to 2x of scan/paging noise between
        # arms (environmental), while the route decision can only win or
        # lose the scoring sub-stage — a cliff there (the BENCH_r04
        # failure was +279 s) is what this key guards against
        sc_host = host_main.seconds if host_main else 0.0
        never_loses = all(
            rec is None or rec.seconds <= sc_host + 2.0
            for rec in (cold_main, warm_main))
        out.update({
            "e2e_wgs_host_s": host_s,
            "e2e_wgs_auto_cold_s": cold_stages["total"],
            "e2e_wgs_auto_warm_s": warm_stages["total"],
            "e2e_wgs_device_warm_s": (
                warm_stages["total"]
                if warm_main and warm_main.engine != "numpy" else None),
            "e2e_wgs_scoring_host_s": round(host_main.seconds, 3)
            if host_main else None,
            "e2e_wgs_scoring_cold_s": round(cold_main.seconds, 3)
            if cold_main else None,
            "e2e_wgs_scoring_warm_s": round(warm_main.seconds, 3)
            if warm_main else None,
            "e2e_wgs_cold_engine": cold_main.engine if cold_main else None,
            "e2e_wgs_cold_reason": cold_main.reason if cold_main else None,
            "e2e_wgs_warm_engine": warm_main.engine if warm_main else None,
            "e2e_wgs_warm_reason": warm_main.reason if warm_main else None,
            "e2e_wgs_stages_host": host_stages,
            "e2e_wgs_stages_auto_cold": cold_stages,
            "e2e_wgs_stages_auto_warm": warm_stages,
            # the round-5 contract: the cold auto arm must have stayed
            # on host (cost model pricing the compile), and no auto arm
            # may lose materially to the forced-host arm
            "e2e_wgs_cold_stayed_host": (
                cold_main.engine == "numpy" if cold_main else None),
            "e2e_wgs_auto_never_loses": never_loses,
            "e2e_wgs_outputs_identical": identical,
        })
    return out


def main() -> None:
    import jax

    n_reads = 1 << 21  # 2M reads per dispatch
    starts, ends, cols, ic, is_, ie = synth_scoring_batch(n_reads)
    from coral_tpu.ops.scoring import (make_batch_scorer_jax,
                                       make_pipelined_scorer_jax)

    # headline: the fused Pallas route over the fully RESOLVED v3 layout
    # (the engine score_pairs_l uses for TPU dispatches); the round-3 v2
    # kernel and the XLA engine reported as same-process A/B secondaries
    build, score = make_batch_scorer_jax(ic, is_, ie, engine="pallas")
    _, score_p2 = make_batch_scorer_jax(ic, is_, ie, engine="pallas2")
    _, score_xla = make_batch_scorer_jax(ic, is_, ie, engine="xla")
    d_starts = jax.device_put(starts)
    d_ends = jax.device_put(ends)
    d_cols = [jax.device_put(cols[k]) for k in COL_ORDER]
    # the pallas engine takes the resolved 3-column v3 layout; the
    # product route emits it with ONE native first_overlap+gate+pack
    # pass straight from the flat alignment columns
    # (bamcore.bc_pack_pairs3), timed through the same product-shaped
    # path (min-of-3; first-touch paging varies)
    from coral_tpu.native.bamcore import pack_pairs2, pack_pairs3

    aln = synth_alignment_table(cols)
    pack_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        packed = pack_pairs3(*aln, ic, is_, ie, min_mapq=20)
        pack_times.append(time.perf_counter() - t0)
    t_pack = min(pack_times)
    d_packed = [jax.device_put(p) for p in packed]
    d_packed2 = [jax.device_put(p) for p in pack_pairs2(*aln, ic, is_, ie)]
    tables = build(d_starts, d_ends)  # compile + build
    jax.block_until_ready(tables)

    # table build cost (amortized across the pipeline's many queries)
    t_build = slope_time_ms(build, d_starts, d_ends, n1=4, n2=32) / 1e3
    # scoring dispatch (the headline) — slope-timed, see module
    # docstring; long chains (n2=256) because sub-ms dispatches need
    # ~50+ ms of slope signal to rise above tunnel fetch variance
    t_dev = slope_time_ms(lambda *c: score(tables, *c), *d_packed,
                          n1=16, n2=256) / 1e3
    t_p2 = slope_time_ms(lambda *c: score_p2(tables, *c), *d_packed2,
                         n1=16, n2=256) / 1e3
    t_xla = slope_time_ms(lambda *c: score_xla(tables, *c), *d_cols) / 1e3

    # the product hit-mask route (score_pairs_l engine='pallas'): the
    # saturation-meaningful roofline number — 12 B/pair read + 4 B/pair
    # hit mask written, no histogram loop.  The timed program appends a
    # device-side sum so the chain-end fetch is one scalar: fetching the
    # 8 MB mask per measurement put ~100 ms of tunnel variance against a
    # ~6 ms slope signal (a negative-slope artifact in one validation
    # run); the added reduce reads the mask once from HBM and is charged
    # to the kernel (a conservative bias against it).
    from coral_tpu.ops.pallas_kernels import (LANES, _bucket_rows,
                                              make_pair3_pallas_fn)
    import jax.numpy as jnp

    rows = _bucket_rows(n_reads)
    fn_hm = make_pair3_pallas_fn(rows, 100, 100.0, False)
    blocks3 = [jnp.asarray(np.asarray(p).reshape(rows, LANES))
               for p in packed]
    t_hm = slope_time_ms(fn_hm, *blocks3, n1=16, n2=256,
                         scalar_fetch=True) / 1e3

    # --- self-normalizing ceilings (round-5 directive 2) --------------
    # (a) zero-compute control op over the kernel's EXACT shapes AND
    # block structure (a Pallas copy-add with the same grid — an XLA
    # elementwise a+b+c measured ~12-30% SLOWER than the hand-scheduled
    # kernel, i.e. not a ceiling): reads the same three int32 blocks,
    # writes one.  Kernel and control are measured INTERLEAVED
    # (slope_pair_ms) so their ratio cancels tunnel drift;
    # (b) the 1 GiB read-only reduction — the HBM calibration point the
    # docs quote (736 GB/s = 90% of v5e speed-of-light historically).
    from coral_tpu.ops.pallas_kernels import make_stream_control_fn

    ctrl = make_stream_control_fn(rows)
    # the interleaved ratio still varies ~1.5-2x BETWEEN runs on this
    # tunnel (within-run medians are tight); repeat the pair measurement
    # and report the median ratio plus the spread so a single lucky or
    # contended window cannot set the record
    pair_runs = [slope_pair_ms(fn_hm, blocks3, ctrl, blocks3,
                               n1=16, n2=256, rounds=3)
                 for _ in range(3)]
    ratios = sorted(tc / th for th, tc in pair_runs)
    # ceiling rate from the fastest control window (ratios stay
    # within-window paired)
    t_ctrl = min(tc for _, tc in pair_runs) / 1e3
    big = jax.device_put(np.ones(1 << 28, np.float32))
    red = jax.jit(jnp.sum)
    t_red = slope_time_ms(red, big, n1=4, n2=16) / 1e3

    # --- transfer vs dispatch split (round-4 directive 2) -------------
    # transfer alone: chain N put-rounds of alternating pre-packed
    # buffers, fetch one element of the last put (RPC/fetch constants
    # cancel in the slope)
    copies = [packed, pack_pairs3(*aln, ic, is_, ie, min_mapq=20)]
    state = [0]

    def put_only():
        c = copies[state[0] % 2]
        state[0] += 1
        return [jax.device_put(p) for p in c]

    t_put = slope_time_ms(put_only, n1=2, n2=8, rounds=3) / 1e3

    def put_and_score():
        c = copies[state[0] % 2]
        state[0] += 1
        return score(tables, *[jax.device_put(p) for p in c])

    t_put_dispatch = slope_time_ms(put_and_score, n1=2, n2=8, rounds=3) / 1e3

    # chunked double-buffered pipeline (product
    # scoring.make_pipelined_scorer_jax): device_put of chunk k+1 issued
    # before chunk k's dispatch so transfer overlaps compute
    chunk = 1 << 18
    buildp, score_stream = make_pipelined_scorer_jax(ic, is_, ie,
                                                     chunk=chunk)
    out0 = score_stream(tables, packed)        # compile chunk kernel
    jax.block_until_ready(out0)
    # identical outputs to the monolithic engine
    mono = score(tables, *d_packed)
    stream_ok = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(mono, out0))

    def stream_once():
        c = copies[state[0] % 2]
        state[0] += 1
        return score_stream(tables, c)

    t_stream = slope_time_ms(stream_once, n1=2, n2=6, rounds=3) / 1e3
    # the all-in pipeline takes whichever transfer strategy measured
    # faster THIS run: on the tunnel-attached chip the per-put RPC
    # latency can make 24 small chunked puts lose to one monolithic put
    # (chunked overlap only hides the ~0.3 ms dispatch); on a
    # directly-attached chip the chunked stream wins.  Both are
    # reported; the e2e analysis lives in docs/ARCHITECTURE.md.
    t_pipeline = t_pack + min(t_stream, t_put_dispatch)

    # numpy single-thread baseline: the same product scoring math
    # (pair_predicate + support histogram + table lookups) with
    # xp=numpy and prebuilt tables, scaled to the device batch size
    from coral_tpu.ops.scoring import (
        coverage_prefix_eval, coverage_prefix_tables, pair_predicate)

    n_base = 1 << 18
    b_starts, b_ends, b_cols, *_ = synth_scoring_batch(n_base)
    np_tables = coverage_prefix_tables(np, b_starts, b_ends)
    t0 = time.perf_counter()
    hits, io_i = pair_predicate(
        np, *(b_cols[k] for k in COL_ORDER), ic, is_, ie,
        100, 20, 100.0, np.inf)
    np.bincount(np.clip(io_i, 0, None), weights=hits, minlength=len(ic))
    coverage_prefix_eval(np, np_tables, ie)
    coverage_prefix_eval(np, np_tables, is_)
    t_np = (time.perf_counter() - t0) * (n_reads / n_base)

    reads_per_s = n_reads / t_dev
    payload = {
        "metric": "breakpoint+coverage scoring throughput per chip",
        "value": round(reads_per_s),
        "unit": "reads/s",
        "vs_baseline": round(t_np / t_dev, 2),
        # bytes-moved account for the fused dispatch (VPU-bound; see
        # roofline_utilization docstring) — the saturation number is
        # hitmask_roofline_frac below
        "hbm_roofline_frac": round(
            roofline_utilization(n_reads, t_dev, 12), 3),
        "engine": "pallas-fused-packed3",
        "pallas2_engine_reads_per_s": round(n_reads / t_p2),
        "xla_engine_reads_per_s": round(n_reads / t_xla),
        "hitmask_reads_per_s": round(n_reads / t_hm),
        # convention: *_roofline_frac divides by the 819 GB/s v5e
        # THEORETICAL peak; the attainable/self-normalized numbers are
        # the *_GBs and *_vs_ceiling keys below (one denominator each,
        # labeled — round-5 directive 5)
        "hitmask_roofline_frac": round(
            roofline_utilization(n_reads, t_hm, 16), 3),
        # self-normalizing ceilings (round-5 directive 2): the in-run
        # 1 GiB HBM calibration, the zero-compute streaming control op
        # over the kernel's exact shapes, and the kernel/control ratio
        # (stable under tunnel variance — the ARCHITECTURE 'at the
        # attainable ceiling' claim, now self-verifying every run)
        "calibrated_hbm_GBs": round(2**30 / t_red / 1e9, 1),
        "streaming_ceiling_GBs": round(n_reads * 16 / t_ctrl / 1e9, 1),
        "hitmask_GBs": round(n_reads * 16 / t_hm / 1e9, 1),
        # ratio from INTERLEAVED pairs (drift-cancelled), median of 3
        # repetitions with the spread — ~1.0 = kernel at the ceiling;
        # the tunnel cannot resolve this ratio tighter than ~1.5x
        # across windows, so the spread is part of the record
        "hitmask_vs_ceiling": round(ratios[1], 3),
        "hitmask_vs_ceiling_spread": [round(ratios[0], 3),
                                      round(ratios[2], 3)],
        "hitmask_frac_of_calibrated": round(
            (n_reads * 16 / t_hm) / (2**30 / t_red), 3),
        "coverage_table_build_ms": round(t_build * 1e3, 3),
        # threaded native pack; core-count-bound (this microVM has 2
        # cores — a production host with N cores scales it ~linearly)
        "host_pack_ms": round(t_pack * 1e3, 3),
        # split transfer vs dispatch (directive 2): the monolithic
        # put+dispatch, its put-only component, and the chunked
        # double-buffered product pipeline
        "transfer_ms": round(t_put * 1e3, 3),
        "dispatch_ms": round(t_dev * 1e3, 3),
        "transfer_dispatch_ms": round(t_put_dispatch * 1e3, 3),
        "pipelined_stream_ms": round(t_stream * 1e3, 3),
        "pipelined_outputs_identical": stream_ok,
        # all-in per-batch rate incl. native pack + tunnel transfer +
        # dispatch, with the chunked overlap (transfer rides this
        # environment's TPU tunnel; on a directly-attached chip the
        # transfer term shrinks ~two orders)
        "pipeline_reads_per_s": round(n_reads / t_pipeline),
    }
    try:
        payload.update(e2e_device_vs_host())
    except Exception as exc:  # never let the e2e add-on break the headline
        payload["e2e_reconstruct_error"] = f"{type(exc).__name__}: {exc}"
    try:
        payload.update(e2e_wgs())
    except Exception as exc:
        payload["e2e_wgs_error"] = f"{type(exc).__name__}: {exc}"
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
