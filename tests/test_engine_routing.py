"""Engine routing: the TPU engines are reachable from the PRODUCT path.

Round-2 review finding: every product run landed in
``score_pairs_l(engine='numpy')`` with no way to select the device
engines from the CLI or config.  These tests pin the routing contract:

* ``resolve_engine`` auto-dispatch rules (size threshold + backend),
* ``find_breakpoints_device(engine=...)`` produces identical rows on
  every engine and logs the chosen route,
* the CLI ``--engine``/``--cn_engine`` flags land in the config and the
  config drives ``Reconstruction.find_breakpoints`` / ``compute_cn``.
"""
from __future__ import annotations

import dataclasses
import logging
import os

import numpy as np
import pytest

from coral_tpu.ops.pairs import find_breakpoints_device, resolve_engine


@pytest.fixture(autouse=True)
def _restore_pkg_logger():
    """cli.reconstruct_mode (here or in any earlier test module) installs
    a file handler and disables propagation on the package logger
    (tracing.setup_file_logging); force a propagating, handler-free state
    for these caplog-based tests and restore afterwards."""
    pkg = logging.getLogger("coral_tpu")
    state = (pkg.level, list(pkg.handlers), pkg.propagate)
    pkg.handlers[:] = []
    pkg.propagate = True
    pkg.setLevel(logging.NOTSET)
    yield
    for h in pkg.handlers:
        if h not in state[1]:
            h.close()
    pkg.level, pkg.handlers[:], pkg.propagate = state


def test_resolve_engine_rules():
    # explicit engines pass through untouched
    for eng in ("numpy", "jax", "pallas"):
        assert resolve_engine(eng, 10) == eng
    # auto: host below threshold
    assert resolve_engine("auto", 100, device_pair_threshold=1000) == "numpy"
    # auto above threshold: device iff an accelerator backend exists
    # (tests run with the CPU backend forced)
    assert resolve_engine("auto", 10_000, device_pair_threshold=1000) \
        == "numpy"


def test_resolve_engine_auto_picks_device_on_accelerator(monkeypatch):
    import jax

    from coral_tpu.ops import routing

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # the cheap platform sniff must also say accelerator (it avoids a
    # ~10 s remote backend init on host-routed decisions)
    monkeypatch.setattr(routing, "backend_hint", lambda: "tpu")
    assert resolve_engine("auto", 10_000, device_pair_threshold=1000) == "jax"
    assert resolve_engine("auto", 100, device_pair_threshold=1000) == "numpy"


def _junction_chimeras(n=40):
    from coral_tpu.ops.chimera import Chimera

    intervals = [["chr7", 55_000_000, 55_400_000, 0]]
    chimeras = {}
    for k in range(n):
        a = 55_000_000 + 977 * k
        chimeras[f"r{k:03d}"] = Chimera(
            q=[[0, 5000], [5100, 9900]],
            r=[["chr7", a, a + 5000, "+"],
               ["chr7", a + 40_000 + 4800, a + 40_000, "-"]],
            mapq=[60, 60], nm=[0.01, 0.01])
    return chimeras, intervals


@pytest.mark.parametrize("engine", ["numpy", "jax", "pallas"])
def test_find_breakpoints_device_engine_parity_and_log(engine, caplog):
    chimeras, intervals = _junction_chimeras()
    with caplog.at_level(logging.INFO, logger="coral_tpu.ops.pairs"):
        rows = find_breakpoints_device(
            chimeras, intervals, min_bp_match_cutoff=100, min_mapq=20,
            gap_=100, engine=engine)
    base = find_breakpoints_device(
        chimeras, intervals, min_bp_match_cutoff=100, min_mapq=20,
        gap_=100, engine="numpy")
    assert rows == base and len(rows) == len(chimeras)
    assert any(f"engine={engine}" in r.message for r in caplog.records), \
        "route log line missing"


def test_cli_engine_flags_reach_config(monkeypatch, tmp_path):
    """--engine/--cn_engine/--shard_devices parse and land in the Config
    handed to reconstruct_graphs."""
    from coral_tpu import cli

    seen = {}

    def fake_reconstruct_graphs(lr_bam, cnv_seed, cn_seg, output_prefix,
                                cfg=None, output_bp=False, scan_cache=False,
                                mesh=None):
        seen["cfg"] = cfg
        seen["mesh"] = mesh

        class _Rec:
            class bam:
                @staticmethod
                def close():
                    pass
        return _Rec()

    import coral_tpu.reconstruct as rmod

    monkeypatch.setattr(rmod, "reconstruct_graphs", fake_reconstruct_graphs)
    argv = ["reconstruct", "--lr_bam", "x.bam", "--cnv_seed", "s.bed",
            "--cn_seg", "c.cns", "--output_prefix",
            str(tmp_path / "o"), "--skip_cycle_decomp",
            "--engine", "pallas", "--cn_engine", "batch",
            "--shard_devices", "2",
            "--log_fn", str(tmp_path / "log.txt")]
    cli.main(argv)
    cfg = seen["cfg"]
    assert cfg.engine.engine == "pallas"
    assert cfg.engine.cn_engine == "batch"
    assert seen["mesh"] is not None and seen["mesh"].devices.size == 2


def test_reconstruction_routes_cfg_engine(tmp_path, caplog):
    """A forced-device reconstruct provably executes the jax/pallas pair
    engine and the batch CN engine, with byte-identical outputs to the
    host default."""
    from coral_tpu.config import DEFAULT_CONFIG
    from coral_tpu.reconstruct import reconstruct_graphs
    from coral_tpu.sim import simulate_ecdna

    bam, cns, seeds = simulate_ecdna(str(tmp_path), jitter=0)

    out_host = str(tmp_path / "host")
    rec = reconstruct_graphs(bam, seeds, cns, out_host)
    rec.bam.close()

    cfg = DEFAULT_CONFIG.replace(
        engine=dataclasses.replace(DEFAULT_CONFIG.engine,
                                   engine="jax", cn_engine="batch"))
    out_dev = str(tmp_path / "dev")
    with caplog.at_level(logging.INFO):
        rec = reconstruct_graphs(bam, seeds, cns, out_dev, cfg=cfg)
    rec.bam.close()
    msgs = [r.message for r in caplog.records]
    assert any("engine=jax" in m for m in msgs)
    assert any("engine=batch" in m for m in msgs)

    host_files = sorted(f for f in os.listdir(tmp_path)
                        if f.startswith("host"))
    assert host_files
    for hf in host_files:
        df = "dev" + hf[len("host"):]
        a = (tmp_path / hf).read_text()
        b = (tmp_path / df).read_text()
        # CN solves use different engines (f64 Newton vs batched vmap);
        # graph CNs must agree to the printed digits on this sample
        assert a == b, f"{hf} != {df}"


def test_cn_auto_routes_to_batch_above_threshold(caplog):
    """Round-4 directive: cn_engine='auto' must pick the batched vmap
    engine above the amplicon-count threshold on f64 backends, with
    results identical to the per-graph numpy-f64 engine."""
    import numpy as np

    from coral_tpu.graph.cn_solver import resolve_cn_engine

    assert resolve_cn_engine("numpy", 100) == "numpy"
    assert resolve_cn_engine("batch", 1) == "batch"
    # conftest pins the CPU backend: f64 available
    assert resolve_cn_engine("auto", 31) == "jax"
    assert resolve_cn_engine("auto", 32) == "batch"
    assert resolve_cn_engine("auto", 5, batch_threshold=4) == "batch"

    # the route is taken from the product method and is value-identical
    from types import SimpleNamespace

    from coral_tpu.config import DEFAULT_CONFIG
    from coral_tpu.graph.breakpoint_graph import BreakpointGraph
    from coral_tpu.reconstruct import Reconstruction

    rng = np.random.default_rng(0)
    graphs = []
    for k in range(32):
        g = BreakpointGraph()
        base = 1_000_000 * (k + 1)
        mid = base + 50_000
        end = base + 99_999
        for nd in [(
            "chr1", base, "-"), ("chr1", mid - 1, "+"),
                ("chr1", mid, "-"), ("chr1", end, "+")]:
            g.add_node(nd)
        g.add_sequence_edge("chr1", base, mid - 1, cn=0.0, lr_count=400,
                            lr_nc=int(rng.integers(2_000_000, 9_000_000)))
        g.add_sequence_edge("chr1", mid, end, cn=0.0, lr_count=400,
                            lr_nc=int(rng.integers(2_000_000, 9_000_000)))
        g.add_concordant_edge("chr1", mid - 1, "+", "chr1", mid, "-",
                              cn=0.0, lr_count=int(rng.integers(100, 500)))
        g.add_endnode(("chr1", base, "-"))
        g.add_endnode(("chr1", end, "+"))
        graphs.append(g)
    self = SimpleNamespace(graphs=graphs, normal_cov=10.0,
                           cfg=DEFAULT_CONFIG)
    with caplog.at_level(logging.INFO):
        Reconstruction.compute_cn(self)
    assert any("engine=batch (32 amplicons)" in r.message
               for r in caplog.records)
    batch_cns = [[e.cn for e in g.sequence_edges] for g in graphs]

    import copy

    graphs2 = copy.deepcopy(graphs)
    self2 = SimpleNamespace(graphs=graphs2, normal_cov=10.0,
                            cfg=DEFAULT_CONFIG)
    Reconstruction.compute_cn(self2, engine="numpy")
    numpy_cns = [[e.cn for e in g.sequence_edges] for g in graphs2]
    # identical at the graph.txt writer's %f precision (the engines
    # agree to ~1e-10 relative; byte-identical FILE outputs are pinned
    # by test_reconstruction_routes_cfg_engine above)
    fmt = [["%f" % c for c in row] for row in batch_cns]
    fmt2 = [["%f" % c for c in row] for row in numpy_cns]
    assert fmt == fmt2


def test_cost_model_routing(monkeypatch):
    """Round-5 directive 1: auto resolves through the measured cost
    model — cold compiles are priced in (host wins at WGS pair counts),
    warm buckets flip to the device, and enormous inputs amortize even
    a cold compile."""
    import jax

    from coral_tpu.ops import routing
    from coral_tpu.ops.pairs import resolve_engine_ex

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(routing, "backend_hint", lambda: "tpu")
    monkeypatch.setenv("CORAL_TPU_NO_COMPILE_CACHE", "1")
    cal = routing.RouteCalibration(
        host_pairs_per_s=3e6, put_bytes_per_s=75e6, rpc_latency_s=25e-3,
        transfer_measured=True)
    routing.set_calibration(cal)
    try:
        routing._warm_buckets.clear()
        # the BENCH_r04 shape: 1.5M pairs, cold bucket -> host (the cold
        # compile can never be paid inside a ~0.5s host-equivalent stage)
        eng, reason = resolve_engine_ex("auto", 1_500_000)
        assert eng == "numpy" and "cold" in reason
        # warm bucket -> device wins on the measured transfer numbers
        key = routing.route_key(1_500_000, 100, 100.0, np.inf, 16,
                                backend="tpu")
        routing.mark_warm(key)
        eng, reason = resolve_engine_ex("auto", 1_500_000)
        assert eng == "jax" and "warm" in reason
        # below the floor: no calibration needed, host
        eng, reason = resolve_engine_ex("auto", 1000)
        assert eng == "numpy" and "floor" in reason
        # cold but enormous: compile amortizes, device
        routing._warm_buckets.clear()
        eng, reason = resolve_engine_ex("auto", 3_000_000_000)
        assert eng == "jax" and "cold" in reason
        # slow host / fast link flips the warm decision point downward
        routing.set_calibration(routing.RouteCalibration(
            host_pairs_per_s=1e6, put_bytes_per_s=1e9,
            rpc_latency_s=1e-3, transfer_measured=True))
        routing.mark_warm(key)
        eng, _ = resolve_engine_ex("auto", 1_500_000)
        assert eng == "jax"
    finally:
        routing.set_calibration(None)
        routing._warm_buckets.clear()


def test_xla_engine_marks_bucket_warm(monkeypatch):
    """The product XLA dispatch records its bucket so a later auto
    decision sees it warm; chunk padding keeps results identical (the
    parity test above already pins rows; here the registry)."""
    from coral_tpu.ops import routing

    routing._warm_buckets.clear()
    chimeras, intervals = _junction_chimeras()
    find_breakpoints_device(
        chimeras, intervals, min_bp_match_cutoff=100, min_mapq=20,
        gap_=100, engine="jax")
    assert any(k[0] == "xla" for k in routing._warm_buckets)
    routing._warm_buckets.clear()


def test_route_records_api():
    """find_breakpoints_device appends API-level route records (bench
    reads these instead of scraping log strings)."""
    from coral_tpu.ops import pairs as pairs_mod

    pairs_mod.clear_route_records()
    chimeras, intervals = _junction_chimeras()
    find_breakpoints_device(
        chimeras, intervals, min_bp_match_cutoff=100, min_mapq=20,
        gap_=100, engine="numpy")
    assert len(pairs_mod.ROUTE_RECORDS) == 1
    rec = pairs_mod.ROUTE_RECORDS[0]
    assert rec.engine == "numpy" and rec.n_pairs == len(chimeras)
    assert rec.seconds >= 0 and rec.reason == "forced"
    pairs_mod.clear_route_records()
