"""gurobipy facade: the reference's nonconvex MIQPs solved exactly via MILP.

The reference's cycle decomposition (`/root/reference/src/cycle_decomposition.py`)
builds Gurobi models (``gp.Model`` / ``addVars`` / ``LinExpr`` / ``QuadExpr`` /
``addConstr`` / ``addQConstr`` / ``setObjective`` / ``setParam`` / ``write`` /
``optimize`` / ``Status`` / ``SolCount`` / ``getAttr('X', vars)`` — the exact
surface catalogued from `cycle_decomposition.py:57-366,517-885,1062-1343`) and
solves them with ``NonConvex=2``.  Gurobi is not available here by design; this
module is a drop-in ``gurobipy`` replacement that solves the SAME models to
global optimality.

Why this is exact, not approximate: every quadratic term in those models is a
product with at least one binary or bounded-integer factor —

* ``x · w``   (edge multiplicity, integer in [0,10] × cycle weight, continuous
  in [0, max_cn]) — objective `:77-82`, coverage `:85-89`, CN caps `:122-143`;
* ``c · x``   (binary cycle-start × integer multiplicity) `:171-177`;
* ``y · d``   (binary spanning-tree arc × integer BFS order in [0, n+2])
  `:229-332`;
* ``r · const`` (binary, already linear) `:349-353`.

A product of a BINARY b with a bounded variable v ∈ [lo, hi] is replaced by an
auxiliary P with the exact McCormick envelope (exact because b is 0/1):
``P ≤ hi·b``, ``P ≥ lo·b``, ``P ≤ v − lo·(1−b)``, ``P ≥ v − hi·(1−b)``.
A product of a bounded INTEGER with anything is first binary-expanded
(``v = Σ 2^t·b_t``) and distributed.  The resulting model is a pure MILP with
identical feasible set and objective, handed to HiGHS (`scipy.optimize.milp`)
with a 1e-9 relative gap — i.e. solved to global optimality, which is exactly
what Gurobi's ``NonConvex=2`` spatial branch-and-bound certifies.

Used by the Tier-1 differential tests (`tests/test_reference_miqp.py`) to run
the reference's own `minimize_cycles` / `maximize_weights_greedy` /
`minimize_cycles_post` / `cycle_decomposition` as executable oracles against
`coral_tpu.cycles.decomposition`.
"""
from __future__ import annotations

import math


class _Param:
    """Gurobi parameter names (`m.setParam(GRB.Param.X, v)`)."""

    LogToConsole = "LogToConsole"
    Threads = "Threads"
    NonConvex = "NonConvex"
    TimeLimit = "TimeLimit"
    Heuristics = "Heuristics"
    LogFile = "LogFile"
    MIPGap = "MIPGap"


class GRB:
    BINARY = "B"
    CONTINUOUS = "C"
    INTEGER = "I"
    MINIMIZE = 1
    MAXIMIZE = -1
    # status codes (gurobipy numeric values; reference logs/compares these)
    LOADED = 1
    OPTIMAL = 2
    INFEASIBLE = 3
    INF_OR_UNBD = 4
    UNBOUNDED = 5
    TIME_LIMIT = 9
    SUBOPTIMAL = 13
    INFINITY = 1e100
    Param = _Param


class Var:
    """Decision variable.  Arithmetic builds Expr; comparisons build TempConstr.

    ``__eq__`` is a constraint constructor (gurobipy semantics), so Vars must
    never be used as dict/set keys on the hash-collision path; expressions key
    coefficients by the integer ``vid`` instead.
    """

    __slots__ = ("vid", "lb", "ub", "vtype", "name", "start", "_x")

    def __init__(self, vid, lb, ub, vtype, name):
        self.vid = vid
        self.lb = lb
        self.ub = ub
        self.vtype = vtype
        self.name = name
        self.start = None
        self._x = None

    @property
    def X(self):
        return self._x

    @property
    def VarName(self):
        return self.name

    # --- arithmetic -------------------------------------------------------
    def __mul__(self, other):
        if isinstance(other, Var):
            e = Expr(0.0)
            e._add_quad(self.vid, other.vid, 1.0)
            return e
        if isinstance(other, Expr):
            return other._mul_var(self)
        e = Expr(0.0)
        e.lin[self.vid] = float(other)
        return e

    __rmul__ = __mul__

    def __add__(self, other):
        return _as_expr(self).__iadd__(other)

    __radd__ = __add__

    def __sub__(self, other):
        return _as_expr(self).__isub__(other)

    def __rsub__(self, other):
        e = _as_expr(other)
        return e.__isub__(self)

    def __neg__(self):
        e = Expr(0.0)
        e.lin[self.vid] = -1.0
        return e

    def __truediv__(self, other):
        return self * (1.0 / float(other))

    # --- comparisons → constraints ---------------------------------------
    def __le__(self, other):
        return TempConstr(_diff(self, other), "<")

    def __ge__(self, other):
        return TempConstr(_diff(self, other), ">")

    def __eq__(self, other):  # noqa: D105  (gurobipy semantics)
        return TempConstr(_diff(self, other), "=")

    __hash__ = object.__hash__


class Expr:
    """Linear + quadratic expression: const + Σ lin[v]·v + Σ quad[(a,b)]·a·b."""

    __slots__ = ("const", "lin", "quad")

    def __init__(self, const=0.0):
        self.const = float(const)
        self.lin = {}
        self.quad = {}

    def copy(self):
        e = Expr(self.const)
        e.lin = dict(self.lin)
        e.quad = dict(self.quad)
        return e

    def _add_quad(self, a, b, coef):
        key = (a, b) if a <= b else (b, a)
        self.quad[key] = self.quad.get(key, 0.0) + coef

    def _mul_var(self, var):
        """self * Var — requires self to be linear (holds for the reference:
        products are always Var*(LinExpr) as in ``y1[...] * (d[a] - d[b])``,
        cycle_decomposition.py:229-256)."""
        if self.quad:
            raise ValueError("cubic terms are not representable")
        e = Expr(0.0)
        if self.const:
            e.lin[var.vid] = self.const
        for vid, c in self.lin.items():
            e._add_quad(var.vid, vid, c)
        return e

    # --- in-place (gurobipy LinExpr/QuadExpr += semantics) ----------------
    def __iadd__(self, other):
        if isinstance(other, Var):
            self.lin[other.vid] = self.lin.get(other.vid, 0.0) + 1.0
        elif isinstance(other, Expr):
            self.const += other.const
            for vid, c in other.lin.items():
                self.lin[vid] = self.lin.get(vid, 0.0) + c
            for key, c in other.quad.items():
                self.quad[key] = self.quad.get(key, 0.0) + c
        else:
            self.const += float(other)
        return self

    def __isub__(self, other):
        if isinstance(other, Var):
            self.lin[other.vid] = self.lin.get(other.vid, 0.0) - 1.0
        elif isinstance(other, Expr):
            self.const -= other.const
            for vid, c in other.lin.items():
                self.lin[vid] = self.lin.get(vid, 0.0) - c
            for key, c in other.quad.items():
                self.quad[key] = self.quad.get(key, 0.0) - c
        else:
            self.const -= float(other)
        return self

    def __add__(self, other):
        return self.copy().__iadd__(other)

    __radd__ = __add__

    def __sub__(self, other):
        return self.copy().__isub__(other)

    def __rsub__(self, other):
        e = _as_expr(other)
        return e.__isub__(self)

    def __mul__(self, other):
        if isinstance(other, Var):
            return self._mul_var(other)
        if isinstance(other, Expr):
            raise ValueError("Expr*Expr is not used by the reference")
        s = float(other)
        e = Expr(self.const * s)
        e.lin = {v: c * s for v, c in self.lin.items()}
        e.quad = {k: c * s for k, c in self.quad.items()}
        return e

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self * (1.0 / float(other))

    def __neg__(self):
        return self * -1.0

    # --- comparisons → constraints ---------------------------------------
    def __le__(self, other):
        return TempConstr(_diff(self, other), "<")

    def __ge__(self, other):
        return TempConstr(_diff(self, other), ">")

    def __eq__(self, other):  # noqa: D105
        return TempConstr(_diff(self, other), "=")

    __hash__ = None

    def getValue(self):
        raise NotImplementedError


def LinExpr(const=0.0):
    return Expr(const)


def QuadExpr(const=0.0):
    return Expr(const)


def _as_expr(o):
    if isinstance(o, Expr):
        return o.copy()
    e = Expr(0.0)
    if isinstance(o, Var):
        e.lin[o.vid] = 1.0
    else:
        e.const = float(o)
    return e


def _diff(lhs, rhs):
    e = _as_expr(lhs)
    return e.__isub__(rhs)


def quicksum(items):
    e = Expr(0.0)
    for it in items:
        e += it
    return e


class TempConstr:
    __slots__ = ("expr", "sense")

    def __init__(self, expr, sense):
        self.expr = expr  # lhs - rhs
        self.sense = sense  # '<' | '>' | '='


class tupledict(dict):
    pass


class Model:
    def __init__(self, name=""):
        self.ModelName = name
        self._vars = []  # Var, by vid
        self._constrs = []  # TempConstr
        self._obj = Expr(0.0)
        self._sense = GRB.MINIMIZE
        self._params = {}
        self.Status = GRB.LOADED
        self.SolCount = 0
        self.ObjVal = None

    # --- model building ---------------------------------------------------
    def addVar(self, lb=0.0, ub=GRB.INFINITY, obj=0.0, vtype=GRB.CONTINUOUS, name=""):
        if vtype == GRB.BINARY:
            lb, ub = 0.0, 1.0
        v = Var(len(self._vars), float(lb), float(ub), vtype, name)
        self._vars.append(v)
        return v

    def addVars(self, count, lb=0.0, ub=GRB.INFINITY, vtype=GRB.CONTINUOUS, name=None):
        td = tupledict()
        for i in range(int(count)):
            nm = name[i] if isinstance(name, (list, tuple)) else (
                f"{name}[{i}]" if name else f"v{len(self._vars)}"
            )
            td[i] = self.addVar(lb=lb, ub=ub, vtype=vtype, name=nm)
        return td

    def addConstr(self, tc, name=""):
        if not isinstance(tc, TempConstr):
            raise TypeError("addConstr expects a comparison expression")
        self._constrs.append(tc)
        return tc

    addQConstr = addConstr

    def setObjective(self, expr, sense=GRB.MINIMIZE):
        self._obj = _as_expr(expr)
        self._sense = sense

    def setParam(self, name, value):
        self._params[str(name)] = value

    def getAttr(self, attr, td=None):
        if attr in ("X", "x"):
            if td is None:
                return [v._x for v in self._vars]
            return {k: v._x for k, v in td.items()}
        raise AttributeError(attr)

    def update(self):
        pass

    # --- LP dump (reference writes *_model.lp for observability) ----------
    def write(self, fn):
        def term(vid, c):
            return f"{'+' if c >= 0 else '-'} {abs(c):g} {self._vars[vid].name} "

        with open(fn, "w") as f:
            f.write("\\ " + self.ModelName + " (gurobi_compat facade dump)\n")
            f.write("Minimize\n" if self._sense == GRB.MINIMIZE else "Maximize\n")
            line = f" obj: {self._obj.const:g} "
            for vid, c in self._obj.lin.items():
                line += term(vid, c)
            for (a, b), c in self._obj.quad.items():
                line += (
                    f"{'+' if c >= 0 else '-'} {abs(c):g} "
                    f"{self._vars[a].name} * {self._vars[b].name} "
                )
            f.write(line + "\nSubject To\n")
            for i, tc in enumerate(self._constrs):
                line = f" c{i}: "
                for vid, c in tc.expr.lin.items():
                    line += term(vid, c)
                for (a, b), c in tc.expr.quad.items():
                    line += (
                        f"{'+' if c >= 0 else '-'} {abs(c):g} "
                        f"{self._vars[a].name} * {self._vars[b].name} "
                    )
                op = {"<": "<=", ">": ">=", "=": "="}[tc.sense]
                f.write(line + f"{op} {-tc.expr.const:g}\n")
            f.write("Bounds\n")
            for v in self._vars:
                f.write(f" {v.lb:g} <= {v.name} <= {v.ub:g}\n")
            f.write("End\n")

    # --- solve ------------------------------------------------------------
    def optimize(self):
        import numpy as np
        from scipy import sparse
        from scipy.optimize import Bounds, LinearConstraint, milp

        lb = [v.lb for v in self._vars]
        ub = [v.ub for v in self._vars]
        integ = [1 if v.vtype in (GRB.BINARY, GRB.INTEGER) else 0 for v in self._vars]
        rows = []  # (coef dict, lo, hi)

        def new_var(lo, hi, integer):
            vid = len(lb)
            lb.append(lo)
            ub.append(hi)
            integ.append(1 if integer else 0)
            return vid

        bits_cache = {}

        def bits(vid):
            """Binary expansion of a bounded integer var.  Requires
            lb == 0 (true of every integer var in the reference models:
            x ub 10, d ub nnodes+2, both lb 0) — raises otherwise."""
            got = bits_cache.get(vid)
            if got is not None:
                return got
            lo, hi = lb[vid], ub[vid]
            if not (lo == 0.0 and hi < GRB.INFINITY):
                raise ValueError(f"cannot binarize var bounds [{lo},{hi}]")
            nb = max(1, int(math.floor(math.log2(hi))) + 1) if hi >= 1 else 1
            bvids = [new_var(0.0, 1.0, True) for _ in range(nb)]
            row = {vid: 1.0}
            for t, b in enumerate(bvids):
                row[b] = -float(2**t)
            rows.append((row, 0.0, 0.0))
            out = [(b, float(2**t)) for t, b in enumerate(bvids)]
            bits_cache[vid] = out
            return out

        def bin_prod(bvid, ovid):
            """P = b·v exactly, b binary, v ∈ [lo,hi] (McCormick, exact)."""
            lo, hi = lb[ovid], ub[ovid]
            p = new_var(min(0.0, lo), max(0.0, hi), integ[ovid] == 1)
            rows.append(({p: 1.0, bvid: -hi}, -math.inf, 0.0))  # P ≤ hi·b
            rows.append(({p: 1.0, bvid: -lo}, 0.0, math.inf))  # P ≥ lo·b
            rows.append(({p: 1.0, ovid: -1.0, bvid: -lo}, -math.inf, -lo))
            rows.append(({p: 1.0, ovid: -1.0, bvid: -hi}, -hi, math.inf))
            return p

        prod_cache = {}

        def product(a, b):
            """Exact linear form (dict vid→coef) equal to var_a · var_b."""
            key = (a, b)
            got = prod_cache.get(key)
            if got is not None:
                return got
            va, vb = self._vars[a], self._vars[b]

            def is_bin(v):
                return v.vtype == GRB.BINARY or (
                    integ[v.vid] and v.lb >= 0.0 and v.ub <= 1.0
                )

            if is_bin(va):
                out = {bin_prod(a, b): 1.0}
            elif is_bin(vb):
                out = {bin_prod(b, a): 1.0}
            else:
                cand = [
                    v.vid
                    for v in (va, vb)
                    if v.vtype == GRB.INTEGER and v.ub < GRB.INFINITY
                ]
                if not cand:
                    raise ValueError(
                        "product of two continuous vars is genuinely nonconvex"
                    )
                ivid = min(cand, key=lambda vid: ub[vid])
                other = b if ivid == a else a
                out = {}
                for bvid, wgt in bits(ivid):
                    p = bin_prod(bvid, other)
                    out[p] = out.get(p, 0.0) + wgt
            prod_cache[key] = out
            return out

        def linearize(expr):
            row = dict(expr.lin)
            for (a, b), q in expr.quad.items():
                if a == b:
                    # v² with v integer: binarize and expand (never emitted by
                    # the reference, but exact if it were); bit² = bit.
                    for b1, w1 in bits(a):
                        for b2, w2 in bits(a):
                            p = b1 if b1 == b2 else bin_prod(b1, b2)
                            row[p] = row.get(p, 0.0) + q * w1 * w2
                    continue
                for vid, c in product(a, b).items():
                    row[vid] = row.get(vid, 0.0) + q * c
            return row

        for tc in self._constrs:
            row = linearize(tc.expr)
            rhs = -tc.expr.const
            if tc.sense == "<":
                rows.append((row, -math.inf, rhs))
            elif tc.sense == ">":
                rows.append((row, rhs, math.inf))
            else:
                rows.append((row, rhs, rhs))

        obj_row = linearize(self._obj)
        nv = len(lb)
        c = np.zeros(nv)
        for vid, co in obj_row.items():
            c[vid] = co
        if self._sense == GRB.MAXIMIZE:
            c = -c

        ri, ci, vals, clo, chi = [], [], [], [], []
        for i, (row, lo, hi) in enumerate(rows):
            for vid, co in row.items():
                if co != 0.0:
                    ri.append(i)
                    ci.append(vid)
                    vals.append(co)
            clo.append(lo)
            chi.append(hi)
        A = sparse.csr_matrix(
            (vals, (ri, ci)), shape=(len(rows), nv)
        )

        options = {"mip_rel_gap": 1e-9, "presolve": True}
        tl = self._params.get("TimeLimit")
        if tl is not None:
            options["time_limit"] = float(tl)
        res = milp(
            c=c,
            constraints=LinearConstraint(A, np.array(clo), np.array(chi)),
            integrality=np.array(integ),
            bounds=Bounds(np.array(lb), np.array(ub)),
            options=options,
        )

        if res.status == 0:
            self.Status = GRB.OPTIMAL
        elif res.status == 2:
            self.Status = GRB.INFEASIBLE
        elif res.status == 3:
            self.Status = GRB.UNBOUNDED
        elif res.status == 1:
            self.Status = GRB.TIME_LIMIT
        else:
            self.Status = GRB.INF_OR_UNBD
        self.SolCount = 1 if res.x is not None else 0
        if res.x is not None:
            for v in self._vars:
                x = float(res.x[v.vid])
                if integ[v.vid]:
                    x = float(round(x))
                v._x = x
            self.ObjVal = float(res.x @ (c if self._sense == GRB.MINIMIZE else -c)) + (
                self._obj.const
            )
