"""Measured cost-model routing for the ``auto`` scoring engine.

Round-4's ``auto`` rule was a fixed pair-count threshold (1M pairs →
device).  BENCH_r04 recorded the failure mode: at 1.5M pairs the route
flipped to the device and the FIRST dispatch paid the axon backend's
cold XLA compile (measured 48–271 s per program shape on this
environment) inside a 26 s pipeline — the device arm lost 11.6×
end-to-end.  A fixed threshold cannot be right: the decision depends on
measured host throughput, measured host→device transfer bandwidth (two
orders slower through a tunnel than on a directly-attached chip), and
whether the bucketed kernel shape is already compiled.

This module replaces the threshold with a cost model, both sides
measured in-process:

    t_host   = n_pairs / host_pairs_per_s
    t_device = (put_bytes + fetch_bytes) / put_bytes_per_s
               + 2 * rpc_latency_s + dispatch_s
               + (0 if bucket warm else compile_cold_s)

and routes to the device only when ``t_device < t_host``.  Host and
pack rates are measured once per process (lazy, ~1 s, no device
contact); the link is measured only once the process has already
dispatched to the device, because the FIRST transfer of a process pays
a ~200 s axon session cost (measured round 5) that must never land on
a host-only run — conservative tunnel-class defaults stand in before
that.  ``compile_cold_s`` is a deliberately conservative constant
because cold compile time on a remote backend is long-tailed and
unmeasurable in advance.  Bucket warmness is tracked by the dispatch
wrappers (:mod:`coral_tpu.ops.pairs` marks a bucket after its first
successful product dispatch), so within a process a later large scoring
call can flip to the device while the first stays host — `auto` never
pays a compile cliff it didn't price in.

Cold-start design decision (documented, deliberate): a cold bucket is
NOT warmed in the background while the host path runs.  The dominant
product mode is a one-shot CLI reconstruct whose whole-table scoring
happens once — a background compile could not land in time to help the
call that triggered it, while its RPC/CPU load would slow the very host
path it races; and warming at WGS bucket shapes materializes
hundreds of MB of synthetic columns.  Long-running services that want
the flip can pre-warm explicitly (one ``score_pairs_l(engine='jax')``
call at their working shape, as ``bench.py::e2e_wgs`` does).

The persistent JAX compilation cache (:mod:`coral_tpu.compile_cache`)
is enabled before any device route so backends that support executable
serialization (CPU, directly-attached TPU) collapse the cold cost across
processes.  Measured here (round 5): the axon remote backend does NOT
serve it — the cache directory stays empty and a second process pays a
fresh (server-amortized, 38 s) compile — which is exactly why warmness
is tracked per process rather than assumed from a cache directory.

Reference contrast: none (the reference is single-threaded Python with
no device; SURVEY §2.1).
"""
from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# v3 resolved layout: 3 int32 columns host->device, 1 bool/pair back
PUT_BYTES_PER_PAIR = 12
FETCH_BYTES_PER_PAIR = 1
# conservative cold-compile estimate for a remote accelerator backend
# (axon measured 48-271 s/shape round 5, plus a ~200 s one-time
# first-transfer session cost per process; directly-attached TPUs
# compile in ~20-40 s).  Overridable via EngineConfig.compile_cold_s.
DEFAULT_COMPILE_COLD_S = 240.0
# tunnel-class transfer defaults used until the link is actually
# measured — measuring requires touching the device, and the FIRST
# device fetch in a process costs ~200 s on the axon backend (session
# establishment, measured round 5), so the calibration only measures
# the link once the process has already dispatched to the device (a
# warm bucket implies exactly that)
DEFAULT_PUT_BW = 50e6
DEFAULT_RTT_S = 25e-3
# below this, numpy wins under ANY plausible calibration (host scores
# >=1 M pairs/s single-thread; one tunnel round-trip alone is ~25 ms) —
# skip even the lazy calibration
MIN_DEVICE_PAIRS = 1 << 18


@dataclass
class RouteCalibration:
    """Per-process measured routing inputs."""
    host_pairs_per_s: float
    put_bytes_per_s: float
    rpc_latency_s: float
    pack_pairs_per_s: float = float("inf")   # host-side v3 pack rate
    dispatch_s: float = 1e-3
    measured: bool = True
    transfer_measured: bool = False

    def host_time_s(self, n_pairs: int) -> float:
        return n_pairs / self.host_pairs_per_s

    def device_time_s(self, n_pairs: int, warm: bool,
                      compile_cold_s: float = DEFAULT_COMPILE_COLD_S) -> float:
        move = n_pairs * (PUT_BYTES_PER_PAIR + FETCH_BYTES_PER_PAIR)
        t = move / self.put_bytes_per_s + 2 * self.rpc_latency_s \
            + self.dispatch_s + n_pairs / self.pack_pairs_per_s
        if not warm:
            t += compile_cold_s
        return t


_calibration: Optional[RouteCalibration] = None
_warm_buckets: set = set()
_observed_device_s: dict = {}


def backend_hint() -> Optional[str]:
    """The platform JAX will use, WITHOUT initializing the backend.

    Initializing a remote PJRT client costs ~10 s (measured round 5);
    a decision that resolves to the host must never pay it.  The
    requested-platforms config/env names the plugin ("cpu", "tpu",
    "axon", "cuda", ...); anything that is not "cpu" is treated as an
    accelerator whose platform, once initialized, presents as the
    canonical name (the axon plugin presents platform "tpu").  Returns
    None when nothing is configured (caller falls back to
    ``jax.default_backend()``)."""
    import os

    try:
        import jax

        # attribute access, not config.read(): "jax_platforms" is a
        # contextmanager-backed flag for which read() raises, which
        # silently disabled this path and misclassified processes that
        # force CPU via jax.config.update (the repo's documented method)
        # while JAX_PLATFORMS=axon is exported (round-5 review finding)
        p = jax.config.jax_platforms
    except Exception:
        p = None
    if not p:
        p = os.environ.get("JAX_PLATFORMS", "")
    if not p:
        return None
    first = p.split(",")[0].strip().lower()
    if first == "cpu":
        return "cpu"
    # remote/plugin TPUs present platform "tpu" after init
    if first in ("tpu", "axon"):
        return "tpu"
    return first


def mark_warm(key: tuple, observed_s: Optional[float] = None,
              n_pairs: Optional[int] = None) -> None:
    """Record that the compiled program for ``key`` has executed in this
    process (called by the dispatch wrappers in :mod:`.pairs` after a
    successful device call).  ``observed_s`` feeds the measured
    wall-clock of that warm end-to-end call (pack + transfer + dispatch
    + fetch) back into the cost model, with the pair count it was
    observed at: once a bucket has a real observation, :func:`decide`
    trusts it over the analytic estimate — the estimate cannot see
    python/reshape overheads or day-to-day tunnel variance, the
    observation is exactly the quantity being predicted."""
    _warm_buckets.add(key)
    if observed_s is not None:
        # keep the fastest observation: early calls may fold one-time
        # costs (session, lazy imports) that later calls won't pay.
        # XLA keys compare CHUNK-NORMALIZED cost — that is how the
        # observation is consumed (review: comparing raw seconds across
        # different pair counts could keep the worse per-chunk rate)
        n = n_pairs if n_pairs else 0
        prev = _observed_device_s.get(key)
        if prev is None:
            _observed_device_s[key] = (observed_s, n)
        else:
            if key[0] == "xla" and n > 0 and prev[1] > 0:
                bucket = int(key[1])
                better = observed_s / -(-n // bucket) \
                    < prev[0] / -(-prev[1] // bucket)
            else:
                better = observed_s < prev[0]
            if better:
                _observed_device_s[key] = (observed_s, n)


def is_warm(key: tuple) -> bool:
    return key in _warm_buckets


def observed_device_s(key: tuple, n_pairs: int) -> Optional[float]:
    """The recorded observation for ``key``, scaled to ``n_pairs``.

    Bucketed Pallas keys already pin the dispatch shape (same-bucket
    pair counts differ by < 2x and the cost is shape-determined), so the
    observation applies as-is.  The XLA key collapses every call at >=
    one full chunk into one bucket while its cost scales with the CHUNK
    COUNT — scale the observation by the chunk ratio there (round-5
    review: an observation from a 1.5M-pair call must not price a
    150M-pair call verbatim)."""
    rec = _observed_device_s.get(key)
    if rec is None:
        return None
    obs_s, obs_n = rec
    if key[0] == "xla" and obs_n > 0:
        # the chunk size IS the key's bucket (collapsed xla keys carry
        # the batch; smaller pow2 buckets give ratio 1) — no duplicated
        # batch constant (review)
        bucket = int(key[1])
        return obs_s * (-(-n_pairs // bucket)) / (-(-obs_n // bucket))
    return obs_s


def route_key(n_pairs: int, min_bp_match_cutoff: int, gap_: float,
              max_nm: float, n_intervals: int,
              backend: Optional[str] = None) -> tuple:
    """The compiled-shape bucket the device route would dispatch for
    these arguments — mirrors ``score_pairs_l``'s self-routing: the v3
    Pallas kernel on a TPU backend with the NM gate off and a meta2-sized
    interval table, the 6-column kernel beyond that, the bucket-padded
    XLA program otherwise."""
    import jax

    from .layout import _bucket_rows
    from .scoring import MAX_PACKED2_INTERVALS

    if backend is None:
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
    if backend == "tpu" and np.isinf(max_nm):
        rows = _bucket_rows(n_pairs)
        if n_intervals <= MAX_PACKED2_INTERVALS:
            return ("pair3", rows, int(min_bp_match_cutoff), float(gap_))
        return ("pair6", rows, int(min_bp_match_cutoff), float(gap_))
    return ("xla", _xla_bucket(n_pairs), n_intervals)


def _xla_bucket(n_pairs: int, batch: int = 1 << 18) -> int:
    """Padded chunk size of the XLA engine (see ``score_pairs_l``):
    power-of-two up to ``batch``, so the engine compiles at most
    ~log2(batch) shapes ever."""
    if n_pairs >= batch:
        return batch
    return 1 << max(int(n_pairs) - 1, 0).bit_length()


def _measure_host_rate(n: int = 1 << 16) -> float:
    """Single-thread numpy pairs/s through the product predicate."""
    from .scoring import COL_ORDER, pair_predicate

    rng = np.random.default_rng(0)
    cols = dict(
        qi_end=rng.integers(0, 30_000, n).astype(np.int64),
        qj_start=rng.integers(0, 30_000, n).astype(np.int64),
        chrom_i=rng.integers(0, 24, n).astype(np.int32),
        r1_i=rng.integers(0, 200_000_000, n).astype(np.int64),
        r2_i=rng.integers(0, 200_000_000, n).astype(np.int64),
        strand_i=rng.choice(np.array([-1, 1], np.int32), n),
        mapq_i=rng.integers(0, 61, n).astype(np.int32),
        nm_i=np.zeros(n, np.float32),
        chrom_j=rng.integers(0, 24, n).astype(np.int32),
        r1_j=rng.integers(0, 200_000_000, n).astype(np.int64),
        r2_j=rng.integers(0, 200_000_000, n).astype(np.int64),
        strand_j=rng.choice(np.array([-1, 1], np.int32), n),
        mapq_j=rng.integers(0, 61, n).astype(np.int32),
        nm_j=np.zeros(n, np.float32),
    )
    ic = (np.arange(16) % 24).astype(np.int32)
    is_ = (np.arange(16) * 3_000_000).astype(np.int64)
    ie = is_ + 2_000_000
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        pair_predicate(np, *(cols[k] for k in COL_ORDER), ic, is_, ie,
                       100, 20, 100.0, np.inf)
        best = min(best, time.perf_counter() - t0)
    return n / best


def _measure_transfer() -> Tuple[float, float]:
    """(link_bytes_per_s, rpc_latency_s) via two put+fetch round trips —
    the shared latency cancels in the difference.

    The round trip is a bare ``device_put`` + full host fetch: NO device
    computation, so calibration compiles nothing (any jitted
    forcing-op — even a scalar reduce — would pay the very remote-compile
    cliff this model exists to price; measured 48–271 s/shape on axon).
    The fetch both forces the put to completion (a bare put returns at
    RPC ack on this backend) and doubles the moved bytes, so the
    returned bandwidth is the round-trip aggregate — which is exactly
    what :meth:`RouteCalibration.device_time_s` charges (put bytes +
    fetch bytes through one link number)."""
    import jax

    sizes = (1 << 20, 1 << 23)

    def rt_s(nbytes: int) -> float:
        buf = np.zeros(nbytes // 4, np.int32)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            d = jax.device_put(buf)
            np.asarray(d)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = rt_s(sizes[0])
    t2 = rt_s(sizes[1])
    dt = max(t2 - t1, 1e-4)
    bw = 2 * (sizes[1] - sizes[0]) / dt
    latency = max((t1 - 2 * sizes[0] / bw) / 2, 1e-4)
    return bw, latency


def _measure_pack_rate(n: int = 1 << 16) -> float:
    """Host-side v3 pack pairs/s through the same packer the device route
    uses (native when built, numpy twin otherwise)."""
    rng = np.random.default_rng(1)
    n_aln = 2 * n
    pi = (2 * np.arange(n)).astype(np.int64)
    qs = rng.integers(0, 30_000, n_aln).astype(np.int64)
    qe = qs + rng.integers(100, 5000, n_aln)
    r1 = rng.integers(0, 200_000_000, n_aln).astype(np.int64)
    r2 = r1 + rng.integers(1000, 50000, n_aln)
    chrom = rng.integers(0, 24, n_aln).astype(np.int32)
    strand = rng.choice(np.array([-1, 1], np.int8), n_aln)
    mapq = rng.integers(0, 61, n_aln).astype(np.int32)
    ic = (np.arange(16) % 24).astype(np.int32)
    is_ = (np.arange(16) * 3_000_000).astype(np.int64)
    ie = is_ + 2_000_000
    from .layout import LANES, _bucket_rows

    n_out = _bucket_rows(n) * LANES
    try:
        from ..native.bamcore import pack_pairs3 as pk
        pk(pi, qs, qe, r1, r2, chrom, strand, mapq, ic, is_, ie,
           min_mapq=20, n_out=n_out)
    except Exception:
        from .scoring import pack_pairs3_host as pk
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        pk(pi, qs, qe, r1, r2, chrom, strand, mapq, ic, is_, ie,
           min_mapq=20, n_out=n_out)
        best = min(best, time.perf_counter() - t0)
    return n / best


def get_calibration(measure_device: bool = False) -> RouteCalibration:
    """The per-process calibration.

    Host and pack rates are measured on first use (cheap, no device
    contact).  The device link is measured only when ``measure_device``
    is set AND not yet done — the caller passes True once the process
    has already dispatched to the device (warm bucket), because the
    first transfer of a process pays the ~200 s axon session cost that
    must never land on a host-only run.  Until then, conservative
    tunnel-class defaults stand in."""
    global _calibration
    if _calibration is None:
        try:
            host_rate = _measure_host_rate()
            pack_rate = _measure_pack_rate()
            _calibration = RouteCalibration(
                host_rate, DEFAULT_PUT_BW, DEFAULT_RTT_S,
                pack_pairs_per_s=pack_rate)
            logger.info(
                "route calibration: host %.2f Mpairs/s, pack %.1f "
                "Mpairs/s (link defaults %d MB/s until first device "
                "use)", host_rate / 1e6, pack_rate / 1e6,
                DEFAULT_PUT_BW / 1e6)
        except Exception as exc:  # never let calibration kill scoring
            logger.warning("route calibration failed (%s); auto stays "
                           "on host", exc)
            _calibration = RouteCalibration(3e6, DEFAULT_PUT_BW,
                                            DEFAULT_RTT_S, measured=False)
    if measure_device and not _calibration.transfer_measured:
        try:
            bw, latency = _measure_transfer()
            _calibration.put_bytes_per_s = bw
            _calibration.rpc_latency_s = latency
            _calibration.transfer_measured = True
            logger.info("route calibration: link %.1f MB/s, rtt %.1f ms",
                        bw / 1e6, latency * 1e3)
        except Exception as exc:
            logger.warning("link measurement failed (%s); keeping "
                           "defaults", exc)
    return _calibration


def set_calibration(cal: Optional[RouteCalibration]) -> None:
    """Test/override hook."""
    global _calibration
    _calibration = cal


def decide(n_pairs: int, min_bp_match_cutoff: int, gap_: float,
           max_nm: float, n_intervals: int,
           compile_cold_s: float = DEFAULT_COMPILE_COLD_S,
           backend: Optional[str] = None) -> Tuple[str, str]:
    """Cost-model resolution of ``engine='auto'`` → (engine, reason).

    Called only when an accelerator backend is present (the caller
    short-circuits CPU-only processes to numpy)."""
    if n_pairs < MIN_DEVICE_PAIRS:
        return "numpy", f"n_pairs {n_pairs} < {MIN_DEVICE_PAIRS} floor"
    from ..compile_cache import enable_persistent_cache

    enable_persistent_cache()
    key = route_key(n_pairs, min_bp_match_cutoff, gap_, max_nm,
                    n_intervals, backend=backend)
    warm = is_warm(key)
    cal = get_calibration(measure_device=warm)
    t_host = cal.host_time_s(n_pairs)
    obs = observed_device_s(key, n_pairs) if warm else None
    if obs is not None:
        t_dev, basis = obs, "observed"
    else:
        t_dev = cal.device_time_s(n_pairs, warm, compile_cold_s)
        basis = "modelled"
    state = "warm" if warm else "cold"
    link = "measured" if cal.transfer_measured else "default"
    reason = (f"cost model: host {t_host:.2f}s vs device {t_dev:.2f}s "
              f"{basis} ({state} bucket {key}; {link} link "
              f"{cal.put_bytes_per_s/1e6:.0f} MB/s, host "
              f"{cal.host_pairs_per_s/1e6:.1f} Mpairs/s)")
    return ("jax" if t_dev < t_host else "numpy"), reason
