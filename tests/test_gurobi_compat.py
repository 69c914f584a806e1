"""Unit tests for the gurobipy facade itself (`graph/gurobi_compat.py`).

The reference-MIQP differentials (test_reference_miqp.py) exercise the
facade through the reference's model builders; these tests pin its core
solver semantics directly: exact bilinear linearization (integer x
continuous, binary x integer, Var x LinExpr), status codes, maximize /
minimize senses, bounds, warm-start attribute tolerance, getAttr, and the
LP dump.
"""
import numpy as np
import pytest

import coral_tpu.graph.gurobi_compat as gp

GRB = gp.GRB


def test_bilinear_int_times_continuous_global_optimum():
    # max w*x  s.t. w in [0,5], x int in [0,3], w*x <= 10, x >= 1
    # optimum 10 exactly (nonconvex: spatial optimum on the cap boundary)
    m = gp.Model("t")
    w = m.addVars(1, lb=0.0, ub=5.0, vtype=GRB.CONTINUOUS, name=["w0"])
    x = m.addVars(1, lb=0.0, ub=3.0, vtype=GRB.INTEGER, name=["x0"])
    obj = gp.QuadExpr(0.0)
    obj += w[0] * x[0]
    m.setObjective(obj, GRB.MAXIMIZE)
    m.addQConstr(w[0] * x[0] <= 10.0)
    m.addConstr(x[0] >= 1.0)
    m.optimize()
    assert m.Status == GRB.OPTIMAL and m.SolCount == 1
    assert w[0].X * x[0].X == pytest.approx(10.0, abs=1e-6)


def test_var_times_linexpr_product():
    # y binary, d0/d1 int in [0,7]; y*(d0-d1) >= 3, min d0 -> d0=3, d1=0
    m = gp.Model("t")
    y = m.addVars(1, vtype=GRB.BINARY, name=["y"])
    d = m.addVars(2, lb=0.0, ub=7.0, vtype=GRB.INTEGER, name=["d0", "d1"])
    e = gp.QuadExpr(0.0)
    e += y[0] * (d[0] - d[1])
    m.addConstr(e >= 3.0)
    o = gp.LinExpr(0.0)
    o += d[0]
    m.setObjective(o, GRB.MINIMIZE)
    m.optimize()
    assert m.Status == GRB.OPTIMAL
    assert (y[0].X, d[0].X, d[1].X) == (1.0, 3.0, 0.0)


def test_infeasible_status_and_solcount():
    m = gp.Model("t")
    a = m.addVars(1, vtype=GRB.BINARY, name=["a"])
    m.addConstr(a[0] >= 0.5)
    m.addConstr(a[0] <= 0.4)
    m.optimize()
    assert m.Status == GRB.INFEASIBLE and m.SolCount == 0


def test_expr_arithmetic_and_getattr(tmp_path):
    m = gp.Model("t")
    z = m.addVars(3, vtype=GRB.BINARY, name=[f"z{i}" for i in range(3)])
    w = m.addVars(1, lb=0.0, ub=4.0, vtype=GRB.CONTINUOUS, name=["w"])
    expr = gp.LinExpr(0.0)
    for i in range(3):
        expr += z[i]
    m.addConstr(expr * 2 >= 4.0)          # LinExpr * int comparison
    m.addConstr(w[0] <= z[0] * 4.0)       # Var <= LinExpr
    m.addConstr(z[1] + z[2] == 2.0)       # Var + Var == const
    obj = gp.QuadExpr(1.0)                # constant offset tolerated
    obj -= w[0] / 2.0
    m.setObjective(obj, GRB.MINIMIZE)
    z[0].start = 1                        # warm-start attr accepted
    m.setParam(GRB.Param.LogToConsole, 0)
    m.setParam(GRB.Param.NonConvex, 2)
    m.setParam(GRB.Param.TimeLimit, 60)
    lp = tmp_path / "m.lp"
    m.write(str(lp))
    assert "Subject To" in lp.read_text()
    m.optimize()
    assert m.Status == GRB.OPTIMAL
    sol_z = m.getAttr("X", z)
    assert set(sol_z) == {0, 1, 2}
    assert sol_z[1] == 1.0 and sol_z[2] == 1.0
    assert sol_z[0] == 1.0  # needed: sum z >= 2 and w=4 requires z0
    assert w[0].X == pytest.approx(4.0)
    # ObjVal includes the constant offset
    assert m.ObjVal == pytest.approx(1.0 - 2.0)


def test_randomized_bilinear_vs_bruteforce():
    """Small random bilinear programs: facade optimum == brute force over
    the integer lattice with the continuous var set to its per-x optimum."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        ux = int(rng.integers(1, 4))
        uw = float(rng.uniform(1.0, 5.0))
        cap = float(rng.uniform(1.0, ux * uw))
        c_lin = float(rng.uniform(-1.0, 1.0))
        m = gp.Model("r")
        w = m.addVars(1, lb=0.0, ub=uw, vtype=GRB.CONTINUOUS, name=["w"])
        x = m.addVars(1, lb=0.0, ub=float(ux), vtype=GRB.INTEGER, name=["x"])
        obj = gp.QuadExpr(0.0)
        obj += w[0] * x[0]
        obj += x[0] * c_lin
        m.setObjective(obj, GRB.MAXIMIZE)
        m.addQConstr(w[0] * x[0] <= cap)
        m.optimize()
        assert m.Status == GRB.OPTIMAL
        got = w[0].X * x[0].X + c_lin * x[0].X
        best = 0.0
        for xv in range(ux + 1):
            wv = uw if xv == 0 else min(uw, cap / xv)
            best = max(best, wv * xv + c_lin * xv)
        assert got == pytest.approx(best, abs=1e-6)
