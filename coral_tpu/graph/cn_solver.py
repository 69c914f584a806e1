"""JAX-native convex copy-number balancing.

Replaces the reference's cvxopt ``solvers.cp`` call
(``src/breakpoint_graph.py:495-606``).  The program is

    minimize    f(x) = sum_i wlrseg_i / x_i + wcn_i * x_i - wlncn_i * log x_i
    subject to  A x = 0,  x > 0

where x is CN/2 per edge and A is the per-node flow-balance matrix
(sequence = concordant + discordant + source at every non-end node).  The
objective is the Poisson-style negative log-likelihood the reference
assembles at ``breakpoint_graph.py:511-525``; its gradient/Hessian match
the reference's ``F_normal`` closure exactly.

Solver: equality-constrained damped Newton on the KKT system with a
Levenberg-style clamp on the (diagonal) Hessian and backtracking line
search keeping x strictly positive — the same fixed-point cvxopt's
interior-point reaches, jit-compiled for TPU/CPU.  Amplicon systems are
tiny (tens to hundreds of edges), so one dense KKT solve per iteration is
optimal on the MXU.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _kkt_solve(K: jnp.ndarray, rhs: jnp.ndarray, mixed: bool) -> jnp.ndarray:
    """Solve one (symmetric) KKT system at working precision.

    ``mixed=False``: native LU at the working dtype (CPU f64 — the
    round-≤4 path, unchanged).

    ``mixed=True``: f32 LU factorization + f64 iterative refinement
    (round-5 directive 4).  The TPU backend has no f64 LU
    (``LuDecomposition`` supports F32 only) but does support f64
    elementwise/matvec arithmetic, so: symmetrically equilibrate K
    (Jacobi scaling — the KKT blocks span ~16 decades between the
    1e-10 regularizer and coverage-scale Hessian entries, far beyond
    f32 range), factor the scaled system in f32, then run 5 refinement
    steps computing residuals against the ORIGINAL f64 K.  Each step
    multiplies the error by ~cond(K_scaled)·eps_f32; five steps recover
    full f64 accuracy for these tiny clamped systems (digit-exactness
    vs the f64 direct solve is pinned by ``tests/test_cn_solver.py``).
    Reference contrast: cvxopt factors in f64 on the host
    (``breakpoint_graph.py:558-563``); this is the on-chip equivalent
    meeting the same digit contract.
    """
    if not mixed:
        return jnp.linalg.solve(K, rhs)
    # Ruiz equilibration (iterated symmetric row-max scaling): one-shot
    # Jacobi is not enough when the Hessian block reaches ~1e10 (real
    # WGS amplicons: wlrseg = 0.5*lr_nc^2/(cov*size) ~ 1e10) against
    # the 1e-10 regularizer — the scaled matrix still overflowed f32
    # conditioning and iterative refinement stalled Newton at a wrong
    # fixed point (caught by test_mixed_refinement_ill_conditioned).
    s = jnp.ones_like(rhs)

    def ruiz(s, _):
        Ks_ = (K * s[:, None]) * s[None, :]
        m = jnp.max(jnp.abs(Ks_), axis=1)
        return s / jnp.sqrt(jnp.maximum(m, 1e-300)), None

    s, _ = jax.lax.scan(ruiz, s, None, length=4)
    Ks = (K * s[:, None]) * s[None, :]
    lu, piv = jax.scipy.linalg.lu_factor(Ks.astype(jnp.float32))

    def scaled_solve(r):
        rs = (r * s).astype(jnp.float32)
        return jax.scipy.linalg.lu_solve((lu, piv), rs).astype(K.dtype) * s

    x0 = scaled_solve(rhs)
    rhs_n = jnp.linalg.norm(rhs)

    # residual-driven refinement: loop until float64-level relative
    # residual or no further progress (cap 15; each step is one matvec
    # + one triangular solve pair — cheap next to the factor)
    def cond(state):
        x, r_n, r_prev, it = state
        return (it < 15) & (r_n > 1e-14 * (rhs_n + 1e-300)) \
            & (r_n < r_prev * 0.5)

    def body(state):
        x, r_n, _, it = state
        r = rhs - K @ x
        x = x + scaled_solve(r)
        r2 = rhs - K @ x
        return x, jnp.linalg.norm(r2), r_n, it + 1

    r0 = rhs - K @ x0
    x, _, _, _ = jax.lax.while_loop(
        cond, body,
        (x0, jnp.linalg.norm(r0), jnp.asarray(jnp.inf, K.dtype), 0))
    return x


@partial(jax.jit, static_argnames=("max_iters", "mixed_lu"))
def _solve_kkt_newton(
    wlrseg: jnp.ndarray,
    wcn: jnp.ndarray,
    wlncn: jnp.ndarray,
    A: jnp.ndarray,
    max_iters: int = 1000,
    tol: float = 1e-9,
    mixed_lu: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = wcn.shape[0]
    m = A.shape[0]
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32

    def grad(x):
        return wcn - wlncn / x - wlrseg / (x * x)

    def kkt_residual(x, y):
        return jnp.concatenate([grad(x) + A.T @ y, A @ x])

    def body(state):
        x, y, it, _, _ = state
        g = grad(x)
        h = wlncn / (x * x) + 2.0 * wlrseg / (x * x * x)
        h = jnp.maximum(h, 1e-8)           # Levenberg clamp for stray concavity
        # KKT: [diag(h) A^T; A -delta*I] [dx; y+] = [-g; -A x]
        K = jnp.zeros((n + m, n + m), dtype)
        K = K.at[:n, :n].set(jnp.diag(h))
        K = K.at[:n, n:].set(A.T)
        K = K.at[n:, :n].set(A)
        K = K.at[n:, n:].set(-1e-10 * jnp.eye(m, dtype=dtype))
        rhs = jnp.concatenate([-g, -(A @ x)])
        sol = _kkt_solve(K, rhs, mixed_lu)
        dx = sol[:n]
        y_new = sol[n:]
        # backtracking: largest t in {1, 1/2, ...} keeping x+t*dx > 0 and
        # reducing the KKT residual
        r0 = jnp.linalg.norm(kkt_residual(x, y))

        def shrink(carry):
            t, _ = carry
            return t * 0.5, False

        def ls_cond(carry):
            t, done = carry
            x_t = x + t * dx
            ok = (jnp.min(x_t) > 0) & (
                jnp.linalg.norm(kkt_residual(x_t, y_new)) <= (1 - 0.01 * t) * r0 + tol
            )
            return (~ok) & (t > 1e-12) & (~done)

        t, _ = jax.lax.while_loop(ls_cond, shrink, (jnp.asarray(1.0, dtype), False))
        x_new = jnp.where(t > 1e-12, x + t * dx, x)
        res = jnp.linalg.norm(kkt_residual(x_new, y_new))
        return x_new, y_new, it + 1, res, r0

    def cond(state):
        _, _, it, res, res_prev = state
        # absolute tol, or plateau (coverage-scale systems bottom out far
        # above an absolute 1e-9)
        return (it < max_iters) & (res > tol) & (res < res_prev * (1 - 1e-4))

    x0 = jnp.ones(n, dtype)
    y0 = jnp.zeros(m, dtype)
    res0 = jnp.linalg.norm(kkt_residual(x0, y0)) + 1.0
    x, y, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, y0, jnp.asarray(0), res0, jnp.asarray(jnp.inf, dtype)))
    return x, y


def _newton_numpy(wlrseg, wcn, wlncn, A, max_iters=1000, tol=1e-9):
    """float64 host implementation of the same damped-Newton KKT iteration.

    The default engine: amplicon systems are tiny (n <= ~1000) so a host
    dense solve is already speed-of-light, and the TPU backend lacks f64
    LU (``LuDecomposition`` supports F32 only), which these
    coverage-scale numbers require.
    """
    n = len(wcn)
    m = A.shape[0]

    def grad(x):
        return wcn - wlncn / x - wlrseg / (x * x)

    def residual(x, y):
        return np.concatenate([grad(x) + A.T @ y, A @ x])

    x = np.ones(n)
    y = np.zeros(m)
    r_prev = np.inf
    for _ in range(max_iters):
        r = np.linalg.norm(residual(x, y))
        # absolute tol, or residual plateau: coverage-scale systems bottom
        # out at ~1e-17 relative, far above an absolute 1e-9
        if r <= tol or r >= r_prev * (1 - 1e-4):
            break
        r_prev = r
        h = np.maximum(wlncn / x ** 2 + 2.0 * wlrseg / x ** 3, 1e-8)
        K = np.zeros((n + m, n + m))
        K[:n, :n] = np.diag(h)
        K[:n, n:] = A.T
        K[n:, :n] = A
        K[n:, n:] = -1e-10 * np.eye(m)
        rhs = np.concatenate([-grad(x), -(A @ x)])
        sol = np.linalg.solve(K, rhs)
        dx, y_new = sol[:n], sol[n:]
        t = 1.0
        while t > 1e-12:
            x_t = x + t * dx
            if np.min(x_t) > 0 and np.linalg.norm(residual(x_t, y_new)) \
                    <= (1 - 0.01 * t) * r + tol:
                break
            t *= 0.5
        if t <= 1e-12:
            break
        x = x + t * dx
        y = y_new
    return x


_F64_JAX = None


def _have_f64_jax() -> bool:
    global _F64_JAX
    if _F64_JAX is None:
        # platform sniff first: jax.default_backend() INITIALIZES the
        # backend, and a remote PJRT client init costs ~10 s — measured
        # landing inside the graph+CN stage of a host-only reconstruct
        # (round-5 profile), just to decide that the engine should be
        # numpy anyway
        from ..ops.routing import backend_hint

        hint = backend_hint()
        if hint is not None:
            _F64_JAX = hint == "cpu"
        else:
            try:
                _F64_JAX = jax.default_backend() == "cpu"
            except Exception:
                _F64_JAX = False
    return _F64_JAX


def resolve_cn_engine(engine: str, n_graphs: int,
                      batch_threshold: int = 32) -> str:
    """Resolve an ``auto`` CN-engine request to a concrete engine.

    ``auto`` on an f64-capable backend (CPU) picks the **batched vmap
    engine** when the amplicon count reaches ``batch_threshold`` — one
    padded device dispatch replaces ``n`` sequential KKT solves, and the
    f64 results stay digit-exact to the per-graph engines (route-tested
    byte-identical in ``tests/test_engine_routing.py``) — and the
    per-graph jitted f64 solve below it.  On a TPU-only process ``auto``
    resolves to numpy f64 — not for accuracy (since round 5 the batch
    engine is digit-exact on every backend: f64 working precision with
    f32-LU + f64-iterative-refinement KKT solves where the backend
    lacks f64 LU, ``_kkt_solve``) but for compile economics: amplicon
    systems are tiny, the host solves them in microseconds, and a
    remote-backend compile costs minutes (the same reasoning as
    ``ops.routing``).  ``cn_engine='batch'`` on TPU is a supported,
    digit-exact choice (dry-run cross-check exact; was rtol 1e-4 with
    the old f32 batch)."""
    if engine != "auto":
        return engine
    if not _have_f64_jax():
        return "numpy"
    return "batch" if n_graphs >= batch_threshold else "jax"


def solve_cn_balance(wlrseg, wcn, wlncn, A, max_iters: int = 1000,
                     engine: str = "auto") -> np.ndarray:
    """Solve the balance program; returns x (CN/2 per edge).

    ``engine``: 'numpy' (f64 host, default on TPU-only processes), 'jax'
    (f64, CPU backend), or 'auto'.
    """
    wlrseg = np.asarray(wlrseg, np.float64)
    wcn = np.asarray(wcn, np.float64)
    wlncn = np.asarray(wlncn, np.float64)
    A = np.asarray(A, np.float64).reshape(-1, len(wcn))
    if engine == "auto":
        engine = "jax" if _have_f64_jax() else "numpy"
    if engine == "numpy":
        return _newton_numpy(wlrseg, wcn, wlncn, A, max_iters)
    with jax.enable_x64(True):
        x, _ = _solve_kkt_newton(
            jnp.asarray(wlrseg), jnp.asarray(wcn), jnp.asarray(wlncn),
            jnp.asarray(A), max_iters=max_iters)
        return np.asarray(x)


def compute_cn_hybrid(
    g,
    normal_cov_sr: float,
    sr_length: float,
    normal_cov_lr: float,
    downsample_factor: float = 1.0,
    min_sr_alignment_length: int = 30,
    max_iters: int = 1000,
) -> None:
    """Hybrid short-read + long-read CN estimation.

    Intent implementation of the reference's dead ``compute_cn_sr_lr``
    (``breakpoint_graph.py:366-492``, which carries ``lseg``/``lseq``
    NameErrors): the same balance program with short-read likelihood terms
    added (weights per ``:383-412``).
    """
    lseq = len(g.sequence_edges)
    lc = len(g.concordant_edges)
    ld = len(g.discordant_edges)
    lsrc = len(g.source_edges)

    def sr_scaled(count, flag):
        return count * downsample_factor if flag == "d" else count

    wcn = [normal_cov_sr * e.size / sr_length + 0.5 * normal_cov_lr * e.size
           for e in g.sequence_edges]
    wcn += [normal_cov_sr * (sr_length - 1.0) / sr_length + normal_cov_lr] * lc
    wcn += [normal_cov_sr * (sr_length - 2 * min_sr_alignment_length)
            / sr_length + normal_cov_lr] * ld
    wcn += [normal_cov_sr * (sr_length - 2 * min_sr_alignment_length)
            / sr_length] * lsrc
    wlncn = [sr_scaled(e.sr_count, e.sr_flag) - 0.5 for e in g.sequence_edges]
    wlncn += [sr_scaled(e.sr_count, e.sr_flag) + e.lr_count
              for e in g.concordant_edges]
    wlncn += [sr_scaled(e.sr_count, e.sr_flag) + e.lr_count
              for e in g.discordant_edges]
    wlncn += [max(e.lr_cn, 0.1) for e in g.source_edges]
    wlrseg = [0.5 * e.lr_nc ** 2 / (normal_cov_lr * e.size)
              for e in g.sequence_edges]
    wlrseg += [0.0] * (lc + ld + lsrc)

    g.del_discordant_endnodes()
    if not _assign_solution(g, wlrseg, wcn, wlncn, max_iters):
        # no balance constraints: raw-count CN per segment (ref :481-491)
        for e in g.sequence_edges:
            if e.sr_flag == "d":
                cn = (sr_length * e.sr_count) / (10.0 * e.size)
            else:
                cn = (sr_length * e.sr_count) / (normal_cov_sr * e.size)
            cn += e.lr_nc / (normal_cov_lr * e.size)
            e.cn = cn
            g.max_cn = max(g.max_cn, cn)
        g.max_cn += 1.0


def _balance_matrix(g, nvars: int):
    """Per-node flow-balance matrix (None when no non-end nodes exist)."""
    lseq = len(g.sequence_edges)
    lc = len(g.concordant_edges)
    ld = len(g.discordant_edges)
    balance_nodes = [nd for nd in g.nodes if nd not in g.endnodes]
    if not balance_nodes:
        assert lc == 0 and ld == 0 and len(g.source_edges) == 0
        return None
    A = np.zeros((len(balance_nodes), nvars))
    for ci, nd in enumerate(balance_nodes):
        adj = g.nodes[nd]
        for si in adj[0]:
            A[ci][si] = 1
        for eci in adj[1]:
            A[ci][lseq + eci] = -1
        for edi in adj[2]:
            A[ci][lseq + lc + edi] = -1
        for srci in adj[3]:
            A[ci][lseq + lc + ld + srci] = -1
    return A


def _write_cn(g, x) -> None:
    """Write a solution x (CN/2 per edge) back onto the graph's edges."""
    lseq = len(g.sequence_edges)
    lc = len(g.concordant_edges)
    ld = len(g.discordant_edges)
    for i, e in enumerate(g.sequence_edges):
        e.cn = float(x[i] * 2)
        g.max_cn = max(g.max_cn, e.cn)
    for i, e in enumerate(g.concordant_edges):
        e.cn = float(x[lseq + i] * 2)
        g.max_cn = max(g.max_cn, e.cn)
    for i, e in enumerate(g.discordant_edges):
        scale = 1 if e.is_self_loop() else 2
        e.cn = float(x[lseq + lc + i] * scale)
        g.max_cn = max(g.max_cn, e.cn)
    for i, e in enumerate(g.source_edges):
        e.cn = float(x[lseq + lc + ld + i] * 2)
        g.max_cn = max(g.max_cn, e.cn)
    g.max_cn += 1.0


def _assign_solution(g, wlrseg, wcn, wlncn, max_iters,
                     engine: str = "auto") -> bool:
    """Build the balance matrix, solve, write CNs back (shared tail of the
    LR-only and hybrid paths).  Returns False when there are no balance
    constraints (caller applies its raw-coverage fallback)."""
    A = _balance_matrix(g, len(wcn))
    if A is None:
        return False
    x = solve_cn_balance(wlrseg, wcn, wlncn, A, max_iters, engine=engine)
    _write_cn(g, x)
    return True


def _lr_weights(g, normal_cov: float):
    """Long-read NLL weights (reference ``breakpoint_graph.py:511-525``)."""
    lseq = len(g.sequence_edges)
    lc = len(g.concordant_edges)
    ld = len(g.discordant_edges)
    lsrc = len(g.source_edges)
    wcn = ([0.5 * normal_cov * e.size for e in g.sequence_edges]
           + [normal_cov] * lc + [normal_cov] * ld
           + [0.5 * normal_cov] * lsrc)
    wlncn = ([-0.5] * lseq
             + [float(e.lr_count) for e in g.concordant_edges]
             + [float(e.lr_count) for e in g.discordant_edges]
             + [-0.5] * lsrc)
    wlrseg = ([0.5 * e.lr_nc ** 2 / (normal_cov * e.size) for e in g.sequence_edges]
              + [0.0] * lc + [0.0] * ld
              + [0.5 * e.cn ** 2 / normal_cov for e in g.source_edges])
    return wlrseg, wcn, wlncn


def _raw_coverage_fallback(g, normal_cov: float) -> None:
    # no balance constraints: raw-coverage CN per segment (ref :597-605)
    for e in g.sequence_edges:
        e.cn = e.lr_nc * 2.0 / (normal_cov * e.size)
        g.max_cn = max(g.max_cn, e.cn)
    g.max_cn += 1.0


def compute_cn(g, normal_cov: float, max_iters: int = 1000,
               engine: str = "auto") -> None:
    """Estimate CN for every edge of a BreakpointGraph in place
    (reference ``compute_cn_lr``, ``breakpoint_graph.py:495-606``).
    Self-loop discordant edges are NOT doubled (ref :583-592).
    ``engine`` selects the Newton solve backend ('auto' = jax CPU-f64
    when the backend is CPU, else numpy f64 — the TPU backend has no
    f64 LU)."""
    wlrseg, wcn, wlncn = _lr_weights(g, normal_cov)
    if not _assign_solution(g, wlrseg, wcn, wlncn, max_iters, engine=engine):
        _raw_coverage_fallback(g, normal_cov)


def solve_cn_balance_batch(systems, max_iters: int = 1000, mesh=None,
                           axis: str = "dp"):
    """Solve many balance programs in ONE batched device dispatch.

    ``systems``: list of (wlrseg, wcn, wlncn, A) tuples of ragged sizes.
    Systems are padded to a uniform (n_max, m_max): padded variables get
    (wlrseg, wcn, wlncn) = (0, 1, 1) — optimum x = 1, unit Hessian — and
    zero constraint coupling, so real solutions are unchanged; padded
    constraint rows are all-zero and absorbed by the KKT system's
    -1e-10 I regularization block.  The jitted Newton KKT solve is vmapped
    over the batch; with ``mesh``, the batch axis is sharded over
    ``axis`` so amplicons solve on different chips (the TPU-native
    replacement for looping cvxopt per amplicon).

    Returns a list of x arrays trimmed to each system's size.
    """
    if not systems:
        return []
    n_max = max(len(s[1]) for s in systems)
    m_max = max(s[3].shape[0] for s in systems)
    B = len(systems)
    wlrseg = np.zeros((B, n_max))
    wcn = np.ones((B, n_max))
    wlncn = np.ones((B, n_max))
    A = np.zeros((B, m_max, n_max))
    for b, (w2, w1, w0, Ab) in enumerate(systems):
        n = len(w1)
        m = Ab.shape[0]
        wlrseg[b, :n] = w2
        wcn[b, :n] = w1
        wlncn[b, :n] = w0
        A[b, :m, :n] = Ab
    # f64 working precision on EVERY backend (round-5 directive 4): the
    # TPU backend lacks f64 LU but supports f64 arithmetic, so the KKT
    # solves route through the f32-factor + f64-iterative-refinement
    # path there (``_kkt_solve(mixed=True)``) — digit-exact to the f64
    # host engine instead of the old opt-in f32 batch (rtol 1e-4)
    try:
        mixed = jax.default_backend() != "cpu"
    except Exception:
        mixed = False
    with jax.enable_x64(True):
        solve = jax.vmap(
            lambda a, b_, c, d: _solve_kkt_newton(a, b_, c, d,
                                                  max_iters=max_iters,
                                                  mixed_lu=mixed)[0])
        args = [jnp.asarray(wlrseg), jnp.asarray(wcn), jnp.asarray(wlncn),
                jnp.asarray(A)]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(axis))
            solve = jax.jit(solve,
                            in_shardings=(sh, sh, sh, sh),
                            out_shardings=sh)
            args = [jax.device_put(a, sh) for a in args]
        xs = np.asarray(solve(*args))
    return [xs[b, : len(s[1])] for b, s in enumerate(systems)]


def compute_cn_batch(graphs, normal_cov: float, max_iters: int = 1000,
                     mesh=None, axis: str = "dp") -> None:
    """Batched ``compute_cn`` over many amplicon graphs: one padded vmap
    (optionally mesh-sharded) Newton solve instead of a per-graph loop."""
    systems = []
    solvable = []
    for g in graphs:
        wlrseg, wcn, wlncn = _lr_weights(g, normal_cov)
        A = _balance_matrix(g, len(wcn))
        if A is None:
            _raw_coverage_fallback(g, normal_cov)
            continue
        systems.append((np.asarray(wlrseg, np.float64),
                        np.asarray(wcn, np.float64),
                        np.asarray(wlncn, np.float64), A))
        solvable.append(g)
    if mesh is not None and len(systems) % mesh.shape[axis] != 0:
        # pad the batch to a multiple of the mesh axis with copies of the
        # first system (discarded after the solve)
        pad = mesh.shape[axis] - len(systems) % mesh.shape[axis]
        systems = systems + [systems[0]] * pad
    xs = solve_cn_balance_batch(systems, max_iters, mesh=mesh, axis=axis)
    for g, x in zip(solvable, xs):
        _write_cn(g, x)
