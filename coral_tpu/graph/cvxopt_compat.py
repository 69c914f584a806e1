"""cvxopt-compatible facade: the ``solvers.cp`` surface the reference uses.

The reference's CN balancing (``breakpoint_graph.py:495-606``) builds its
objective through cvxopt matrix arithmetic and hands a standard cvxopt
``F(x, z)`` oracle to ``cvxopt.solvers.cp`` with equality constraints
``A x = b`` (node flow balance).  This module re-implements exactly that
surface on numpy + an infeasible-start damped-Newton KKT solver (Boyd &
Vandenberghe §10.3), so the REFERENCE's own compute_cn_lr can run
end-to-end against coral_tpu (tests/test_reference_e2e.py) without cvxopt
installed — and so any cvxopt-cp-style workload can ride coral_tpu's
solver stack.

Notes:
* The CN objective is not globally convex: sequence/source edges carry
  ``wlncn = -0.5`` (``breakpoint_graph.py:518``), making
  ``H_ii = wlncn/x^2 + 2 wlrseg/x^3`` indefinite for large x.  cvxopt's
  LDL KKT factorization tolerates this; we use a Levenberg clamp
  (H_ii >= eps) which converges to the same interior stationary point.
* Only the pieces the reference touches are implemented: ``matrix``
  (column vectors + dense 2-D), elementwise ``mul``/``log``/``**``,
  ``spdiag``, ``modeling.dot``, and ``solvers.cp(F, A=, b=, kktsolver=,
  options=)`` returning the cvxopt result-dict fields the reference reads
  (``status / x / primal objective / dual objective / gap / relative gap /
  primal infeasibility / dual infeasibility``).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np


class matrix:
    """Dense column-major matrix, numpy-backed (cvxopt.matrix-alike)."""

    def __init__(self, data, size: Optional[tuple] = None):
        if isinstance(data, matrix):
            arr = data._a.copy()
        elif isinstance(data, (int, float)):
            if size is None:
                arr = np.asarray([[float(data)]])
            else:
                arr = np.full(size, float(data))
        else:
            arr = np.asarray(data, dtype=np.float64)
            if arr.ndim == 1:
                arr = arr.reshape(-1, 1)
        if size is not None and arr.shape != tuple(size):
            arr = arr.reshape(size, order="F")
        self._a = arr

    # -- container protocol ------------------------------------------------

    @property
    def size(self):
        return self._a.shape

    def __len__(self):
        return self._a.size

    def __iter__(self):
        return iter(self._a.ravel(order="F"))

    def __getitem__(self, i):
        return float(self._a.ravel(order="F")[i])

    # -- arithmetic ---------------------------------------------------------

    def _wrap(self, arr):
        m = matrix.__new__(matrix)
        m._a = np.asarray(arr, dtype=np.float64)
        return m

    def __add__(self, other):
        return self._wrap(self._a + _arr(other))

    def __radd__(self, other):
        return self._wrap(_arr(other) + self._a)

    def __sub__(self, other):
        return self._wrap(self._a - _arr(other))

    def __rsub__(self, other):
        return self._wrap(_arr(other) - self._a)

    def __mul__(self, other):
        if isinstance(other, (int, float)):
            return self._wrap(self._a * other)
        return self._wrap(self._a @ _arr(other))   # cvxopt '*' is matmul

    def __rmul__(self, other):
        if isinstance(other, (int, float)):
            return self._wrap(self._a * other)
        return self._wrap(_arr(other) @ self._a)

    def __neg__(self):
        return self._wrap(-self._a)

    def __pow__(self, p):
        return self._wrap(self._a ** p)

    @property
    def T(self):
        return self._wrap(self._a.T)


def _arr(x):
    return x._a if isinstance(x, matrix) else np.asarray(x, dtype=np.float64)


def mul(a, b):
    """Elementwise product (cvxopt.mul)."""
    m = matrix.__new__(matrix)
    m._a = _arr(a) * _arr(b)
    return m


def log(x):
    m = matrix.__new__(matrix)
    m._a = np.log(_arr(x))
    return m


class _SpDiag(matrix):
    """Diagonal matrix wrapper; carries its diagonal for the KKT solve."""

    def __init__(self, diag_vec):
        self.diag = np.asarray(_arr(diag_vec)).ravel()
        self._a = np.diag(self.diag)


def spdiag(v):
    return _SpDiag(v)


class _Modeling:
    @staticmethod
    def dot(a, b):
        m = matrix.__new__(matrix)
        m._a = np.asarray([[float(_arr(a).ravel() @ _arr(b).ravel())]])
        return m


modeling = _Modeling()


class _Solvers:
    """cvxopt.solvers namespace: just cp() with equality constraints."""

    options: dict = {}

    @staticmethod
    def cp(F, A=None, b=None, kktsolver=None, options=None):
        opts = dict(options or {})
        maxiters = int(opts.get("maxiters", 100))
        tol = 1e-10

        _f0, x0 = F()
        x = _arr(x0).ravel().copy()
        n = x.size
        A_np = _arr(A).reshape(-1, n) if A is not None else np.zeros((0, n))
        b_np = _arr(b).ravel() if b is not None else np.zeros(0)
        m = A_np.shape[0]
        nu = np.zeros(m)
        one = matrix(1.0, (1, 1))

        def oracle(xv):
            out = F(matrix(xv.reshape(-1, 1)), one)
            if out is None:
                return None
            f, Df, H = out
            grad = _arr(Df).ravel()
            hdiag = (H.diag if isinstance(H, _SpDiag)
                     else np.diag(_arr(H))).copy()
            return float(_arr(f).ravel()[0]), grad, hdiag

        status = "unknown"
        f_val = float("nan")
        res_norm = float("inf")
        for _ in range(maxiters):
            got = oracle(x)
            if got is None:
                raise ValueError("cp: initial/current point left the domain")
            f_val, grad, hdiag = got
            r_dual = grad + A_np.T @ nu
            r_pri = A_np @ x - b_np
            res_norm = math.sqrt(float(r_dual @ r_dual + r_pri @ r_pri))
            if res_norm < tol:
                status = "optimal"
                break
            # Levenberg clamp for the indefinite rows (see module notes)
            hclamp = np.maximum(hdiag, 1e-12)
            # KKT via block elimination: H dx + A^T dnu = -r_dual,
            #                            A dx            = -r_pri
            # Newton system via block elimination (H diagonal):
            #   H dx + A^T dnu = -r_dual ;  A dx = -r_pri
            #   => (A H^-1 A^T) dnu = r_pri - A H^-1 r_dual
            Hinv_At = A_np.T / hclamp[:, None]
            Hinv_rd = r_dual / hclamp
            S = A_np @ Hinv_At                      # m x m (PSD)
            rhs = r_pri - A_np @ Hinv_rd
            try:
                dnu_step = np.linalg.solve(S, rhs) if m else np.zeros(0)
            except np.linalg.LinAlgError:
                dnu_step = np.linalg.lstsq(S, rhs, rcond=None)[0]
            dx = -(Hinv_rd + Hinv_At @ dnu_step)
            # backtracking on the residual norm with domain guard
            t = 1.0
            for _bt in range(60):
                x_new = x + t * dx
                nu_new = nu + t * dnu_step
                got_new = oracle(x_new) if np.all(x_new > 0) else None
                if got_new is not None:
                    f_n, grad_n, _h = got_new
                    rd_n = grad_n + A_np.T @ nu_new
                    rp_n = A_np @ x_new - b_np
                    rn_n = math.sqrt(float(rd_n @ rd_n + rp_n @ rp_n))
                    if rn_n <= (1.0 - 0.01 * t) * res_norm or rn_n < tol:
                        break
                t *= 0.5
            else:
                status = "unknown"
                break
            x = x + t * dx
            nu = nu + t * dnu_step

        sol_x = matrix(x.reshape(-1, 1))
        return {
            "status": status,
            "x": sol_x,
            "primal objective": f_val,
            "dual objective": f_val,
            "gap": res_norm,
            "relative gap": res_norm / max(1.0, abs(f_val)),
            "primal infeasibility": float(np.linalg.norm(A_np @ x - b_np))
            if m else 0.0,
            "dual infeasibility": res_norm,
        }


solvers = _Solvers()
