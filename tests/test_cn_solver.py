"""CN-balance solver tests: against scipy on random instances + structure."""
import numpy as np
import pytest
from scipy.optimize import NonlinearConstraint, minimize

from coral_tpu.graph.breakpoint_graph import BreakpointGraph
from coral_tpu.graph.cn_solver import compute_cn, solve_cn_balance


def scipy_reference(wlrseg, wcn, wlncn, A):
    n = len(wcn)

    def f(x):
        return np.sum(wlrseg / x) + np.sum(wcn * x) - np.sum(wlncn * np.log(x))

    def fgrad(x):
        return wcn - wlncn / x - wlrseg / x ** 2

    res = minimize(
        f, np.ones(n), jac=fgrad, method="SLSQP",
        bounds=[(1e-9, None)] * n,
        constraints=[{"type": "eq", "fun": lambda x: A @ x, "jac": lambda x: A}],
        options={"maxiter": 500, "ftol": 1e-12},
    )
    return res.x


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_scipy_on_random_instances(seed):
    rng = np.random.default_rng(seed)
    # synthetic chain graph: k segments alternating with k-1 'junction' vars
    k = 5
    n = 2 * k - 1
    wcn = np.abs(rng.normal(50, 10, n)) + 5
    wlncn = np.concatenate([
        np.full(k, -0.5), np.abs(rng.normal(300, 50, k - 1))
    ])
    wlrseg = np.concatenate([
        np.abs(rng.normal(5e4, 1e4, k)), np.zeros(k - 1)
    ])
    # flow balance: segment i and i+1 both connect to junction i
    A = np.zeros((2 * (k - 1), n))
    for j in range(k - 1):
        A[2 * j][j] = 1
        A[2 * j][k + j] = -1
        A[2 * j + 1][j + 1] = 1
        A[2 * j + 1][k + j] = -1
    x = solve_cn_balance(wlrseg, wcn, wlncn, A)
    x_ref = scipy_reference(wlrseg, wcn, wlncn, A)
    assert np.all(x > 0)
    assert np.max(np.abs(A @ x)) < 1e-6
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def _toy_ecdna_graph(ncov=20.0, amp_cov=400.0, bg_cov=40.0):
    """3-segment interval where the middle segment is on an ecDNA cycle:
    discordant edge from middle-end(+) back to middle-start(-)."""
    g = BreakpointGraph()
    coords = [(1000, 9999), (10000, 19999), (20000, 29999)]
    for (s, e) in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    for (s, e) in coords:
        cov = amp_cov if s == 10000 else bg_cov
        g.add_sequence_edge("chr1", s, e, lr_count=100,
                            lr_nc=int(cov * (e - s + 1)))
    g.add_concordant_edge("chr1", 9999, "+", "chr1", 10000, "-",
                          lr_count=int(bg_cov / 10))
    g.add_concordant_edge("chr1", 19999, "+", "chr1", 20000, "-",
                          lr_count=int(bg_cov / 10))
    g.add_endnode(("chr1", 1000, "-"))
    g.add_endnode(("chr1", 29999, "+"))
    g.add_discordant_edge("chr1", 19999, "+", "chr1", 10000, "-",
                          lr_count=int(amp_cov - bg_cov))
    return g


def test_compute_cn_ecdna_structure():
    g = _toy_ecdna_graph()
    compute_cn(g, normal_cov=20.0)
    cn = [e.cn for e in g.sequence_edges]
    # middle segment amplified ~40x, flanks ~4x
    assert cn[1] == pytest.approx(2 * 400 / 20, rel=0.1)
    assert cn[0] == pytest.approx(2 * 40 / 20, rel=0.2)
    # flow balance at the junction nodes: seq = conc + disc
    d = g.discordant_edges[0].cn
    c1 = g.concordant_edges[0].cn
    assert cn[1] == pytest.approx(c1 + d, rel=1e-5)
    assert g.max_cn == pytest.approx(max(cn + [d, c1, g.concordant_edges[1].cn]) + 1.0)


def test_compute_cn_no_constraints():
    g = BreakpointGraph()
    g.add_node(("chr1", 100, "-"))
    g.add_node(("chr1", 1099, "+"))
    g.add_sequence_edge("chr1", 100, 1099, lr_count=10, lr_nc=30000)
    g.add_endnode(("chr1", 100, "-"))
    g.add_endnode(("chr1", 1099, "+"))
    compute_cn(g, normal_cov=30.0)
    assert g.sequence_edges[0].cn == pytest.approx(30000 * 2 / (30.0 * 1000))
    assert g.max_cn == pytest.approx(2.0 + 1.0)


def test_self_loop_not_doubled():
    g = BreakpointGraph()
    g.add_node(("chr1", 1000, "-"))
    g.add_node(("chr1", 9999, "+"))
    g.add_sequence_edge("chr1", 1000, 9999, lr_count=100, lr_nc=200 * 9000)
    g.add_endnode(("chr1", 1000, "-"))
    # self-loop discordant edge at the right end: head-to-tail circle would
    # be (9999,+)->(1000,-), but here use a foldback at the same node
    g.add_discordant_edge("chr1", 9999, "+", "chr1", 9999, "+", lr_count=100)
    compute_cn(g, normal_cov=20.0)
    d = g.discordant_edges[0]
    seq_cn = g.sequence_edges[0].cn
    # balance at (9999,+): x_seq = coefficient-1 * x_disc (self loop counted
    # once in the balance row), and the reported disc CN is x (not 2x)
    assert d.cn == pytest.approx(seq_cn / 2, rel=1e-4)


def test_numpy_and_jax_engines_agree():
    import numpy as np
    from coral_tpu.graph.cn_solver import solve_cn_balance
    rng = np.random.default_rng(5)
    k = 4
    n = 2 * k - 1
    wcn = np.abs(rng.normal(50, 10, n)) + 5
    wlncn = np.concatenate([np.full(k, -0.5), np.abs(rng.normal(300, 50, k - 1))])
    wlrseg = np.concatenate([np.abs(rng.normal(5e4, 1e4, k)), np.zeros(k - 1)])
    A = np.zeros((2 * (k - 1), n))
    for j in range(k - 1):
        A[2 * j][j] = 1
        A[2 * j][k + j] = -1
        A[2 * j + 1][j + 1] = 1
        A[2 * j + 1][k + j] = -1
    x_np = solve_cn_balance(wlrseg, wcn, wlncn, A, engine="numpy")
    x_jx = solve_cn_balance(wlrseg, wcn, wlncn, A, engine="jax")
    np.testing.assert_allclose(x_np, x_jx, rtol=1e-6, atol=1e-8)


def test_compute_cn_hybrid():
    from coral_tpu.graph.cn_solver import compute_cn_hybrid
    g = _toy_ecdna_graph()
    for e in g.sequence_edges:
        e.sr_count = int(e.lr_nc / 9000 * 3)  # ~short-read counts
        e.sr_flag = "f"
    for e in g.concordant_edges + g.discordant_edges:
        e.sr_count = e.lr_count
        e.sr_flag = "f"
    compute_cn_hybrid(g, normal_cov_sr=30.0, sr_length=150.0,
                      normal_cov_lr=20.0)
    cn = [e.cn for e in g.sequence_edges]
    # hybrid estimate should land near the LR-only structure (middle ~40x)
    assert cn[1] == pytest.approx(2 * 400 / 20, rel=0.3)
    assert cn[0] < cn[1] / 3


def _random_system(rng, k):
    n = 2 * k - 1
    wcn = np.abs(rng.normal(50, 10, n)) + 5
    wlncn = np.concatenate([
        np.full(k, -0.5), np.abs(rng.normal(300, 50, k - 1))
    ])
    wlrseg = np.concatenate([
        np.abs(rng.normal(5e4, 1e4, k)), np.zeros(k - 1)
    ])
    A = np.zeros((2 * (k - 1), n))
    for j in range(k - 1):
        A[2 * j][j] = 1
        A[2 * j][k + j] = -1
        A[2 * j + 1][j + 1] = 1
        A[2 * j + 1][k + j] = -1
    return wlrseg, wcn, wlncn, A


def test_batched_solve_matches_sequential():
    """Padded vmap batch solve == per-system solve, across ragged sizes."""
    from coral_tpu.graph.cn_solver import solve_cn_balance_batch

    rng = np.random.default_rng(3)
    systems = [_random_system(rng, k) for k in (3, 5, 8, 4)]
    xs = solve_cn_balance_batch(systems)
    for (w2, w1, w0, A), x in zip(systems, xs):
        x_ref = solve_cn_balance(w2, w1, w0, A, engine="numpy")
        np.testing.assert_allclose(x, x_ref, rtol=1e-5, atol=1e-6)


def test_batched_solve_sharded_mesh():
    """Batch axis sharded over an 8-device mesh produces the same CNs."""
    from coral_tpu.graph.cn_solver import compute_cn_batch
    from coral_tpu.parallel.mesh import make_mesh

    graphs_a = [_toy_ecdna_graph(amp_cov=c) for c in
                (200.0, 300.0, 400.0, 500.0, 250.0)]
    graphs_b = [_toy_ecdna_graph(amp_cov=c) for c in
                (200.0, 300.0, 400.0, 500.0, 250.0)]
    for g in graphs_a:
        compute_cn(g, 20.0)
    mesh = make_mesh(8, axis="dp")
    compute_cn_batch(graphs_b, 20.0, mesh=mesh, axis="dp")
    for ga, gb in zip(graphs_a, graphs_b):
        for ea, eb in zip(ga.sequence_edges, gb.sequence_edges):
            assert eb.cn == pytest.approx(ea.cn, rel=1e-5, abs=1e-5)
        for ea, eb in zip(ga.discordant_edges, gb.discordant_edges):
            assert eb.cn == pytest.approx(ea.cn, rel=1e-5, abs=1e-5)
        assert gb.max_cn == pytest.approx(ga.max_cn, rel=1e-5)


def test_mixed_precision_refinement_digit_exact():
    """Round-5 directive 4: the f32-LU + f64-iterative-refinement KKT
    path (the on-TPU batch route — the TPU backend has no f64 LU) must
    be digit-exact vs the f64 host engine.  Exercised here on CPU by
    forcing mixed_lu=True; the graph.txt %f-digit contract plus a tight
    relative check."""
    import jax

    from coral_tpu.graph.cn_solver import _solve_kkt_newton

    rng = np.random.default_rng(11)
    for k in (3, 5, 8, 12):
        w2, w1, w0, A = _random_system(rng, k)
        x_ref = solve_cn_balance(w2, w1, w0, A, engine="numpy")
        with jax.enable_x64(True):
            x_mixed, _ = _solve_kkt_newton(
                np.asarray(w2), np.asarray(w1), np.asarray(w0),
                np.asarray(A), mixed_lu=True)
            x_mixed = np.asarray(x_mixed)
        np.testing.assert_allclose(x_mixed, x_ref, rtol=1e-9, atol=1e-9)
        # the emitted-digit contract (graph.txt writes %f = 6 decimals;
        # CN = 2x): every digit equal
        assert ["%f" % (2 * v) for v in x_mixed] == \
               ["%f" % (2 * v) for v in x_ref]


def test_batch_engine_f64_everywhere():
    """solve_cn_balance_batch now runs f64 working precision on every
    backend; results must match the per-system f64 numpy engine to
    emitted digits (was rtol 1e-4 with the old f32 opt-in batch)."""
    from coral_tpu.graph.cn_solver import solve_cn_balance_batch

    rng = np.random.default_rng(17)
    systems = [_random_system(rng, k) for k in (3, 7, 12, 5, 9)]
    xs = solve_cn_balance_batch(systems)
    for (w2, w1, w0, A), x in zip(systems, xs):
        x_ref = solve_cn_balance(w2, w1, w0, A, engine="numpy")
        np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-9)
        assert ["%f" % (2 * v) for v in x] == \
               ["%f" % (2 * v) for v in x_ref]


def test_mixed_refinement_ill_conditioned():
    """Mixed-precision refinement stays digit-exact on systems with
    wide coefficient spreads (heavy wlrseg vs tiny wlncn — the KKT
    diagonal then spans many decades, stressing the f32 factor that the
    Jacobi equilibration protects)."""
    import jax

    from coral_tpu.graph.cn_solver import _solve_kkt_newton

    rng = np.random.default_rng(42)
    for scale in (1e2, 1e6, 1e9):
        k = 6
        n = 2 * k - 1
        wcn = np.abs(rng.normal(50, 10, n)) + 5
        wlncn = np.concatenate([np.full(k, -0.5),
                                np.abs(rng.normal(300, 50, k - 1))])
        wlrseg = np.concatenate([np.abs(rng.normal(scale, scale / 5, k)),
                                 np.zeros(k - 1)])
        A = np.zeros((2 * (k - 1), n))
        for j in range(k - 1):
            A[2 * j][j] = 1
            A[2 * j][k + j] = -1
            A[2 * j + 1][j + 1] = 1
            A[2 * j + 1][k + j] = -1
        x_ref = solve_cn_balance(wlrseg, wcn, wlncn, A, engine="numpy")
        with jax.enable_x64(True):
            x_mixed, _ = _solve_kkt_newton(
                wlrseg, wcn, wlncn, A, mixed_lu=True)
            x_mixed = np.asarray(x_mixed)
        assert ["%f" % (2 * v) for v in x_mixed] == \
               ["%f" % (2 * v) for v in x_ref], f"scale {scale}"
