"""Quadratic-programming (QUADS extension) end-to-end tests.

The reference parses QUADS into the LP (iolp.c:583-645) but its shipped
solvers never consume Q; here the QP path actually optimizes it."""

import numpy as np
import pytest

import vanderbei_tpu as vt
from vanderbei_tpu.core.status import Status
from tests.test_mps import row, write_mps


def test_qp_projection(tmp_path):
    """min (x1^2 + x2^2)/2 s.t. x1 + x2 >= 2  ->  x = (1,1), obj = 1."""
    lines = [
        "NAME          QP1",
        "ROWS",
        row("N", "obj"),
        row("G", "r"),
        "COLUMNS",
        row("", "x1", "r", 1.0),
        row("", "x2", "r", 1.0),
        "RHS",
        row("", "rhs", "r", 2.0),
        "QUADS",
        row("", "x1", "x1", 1.0),
        row("", "x2", "x2", 1.0),
        "ENDATA",
    ]
    lp = vt.read_mps(write_mps(tmp_path, lines))
    assert lp.qnz == 2
    sol = vt.solve(lp, method="intpt")
    assert sol.status == int(Status.OPTIMAL)
    np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-5)
    assert sol.primal_obj == pytest.approx(1.0, abs=1e-5)


def test_qp_with_linear_term(tmp_path):
    """min x1 + (x1^2 + 4 x2^2)/2 + cross s.t. x1 + x2 >= 1.

    Q = [[1, .5], [.5, 4]]; solved KKT by hand: minimize over the line
    x1+x2=1 (interior constraint active): objective g(t) with x1=t, x2=1-t:
    t + (t^2 + 4(1-t)^2)/2 + t(1-t)/2... use numeric reference instead.
    """
    lines = [
        "NAME          QP2",
        "ROWS",
        row("N", "obj"),
        row("G", "r"),
        "COLUMNS",
        row("", "x1", "obj", 1.0, "r", 1.0),
        row("", "x2", "r", 1.0),
        "RHS",
        row("", "rhs", "r", 1.0),
        "QUADS",
        row("", "x1", "x1", 1.0, "x1", 0.0),
        row("", "x1", "x2", 0.5),
        row("", "x2", "x2", 4.0),
        "ENDATA",
    ]
    lp = vt.read_mps(write_mps(tmp_path, lines))
    Q = lp.dense_Q()
    np.testing.assert_allclose(Q, [[1.0, 0.5], [0.5, 4.0]])
    sol = vt.solve(lp, method="hsd")       # auto-routes to intpt
    assert sol.status == int(Status.OPTIMAL)

    # brute-force reference on a fine grid over the active constraint and
    # the interior (x >= 0, x1 + x2 >= 1)
    def obj(x):
        return lp.c @ x + 0.5 * x @ Q @ x
    best = None
    for t in np.linspace(0, 1, 20001):
        x = np.array([t, 1 - t])
        v = obj(x)
        if best is None or v < best[0]:
            best = (v, x)
    assert sol.primal_obj == pytest.approx(best[0], abs=1e-4)
    np.testing.assert_allclose(sol.x, best[1], atol=1e-3)


def test_qp_with_bounds_shift(tmp_path):
    """QP with a nonzero lower bound exercises the Q l folding."""
    lines = [
        "NAME          QP3",
        "ROWS",
        row("N", "obj"),
        row("G", "r"),
        "COLUMNS",
        row("", "x1", "r", 1.0),
        "RHS",
        row("", "rhs", "r", 0.0),
        "BOUNDS",
        row("LO", "BND", "x1", 2.0),
        "QUADS",
        row("", "x1", "x1", 1.0),
        "ENDATA",
    ]
    lp = vt.read_mps(write_mps(tmp_path, lines))
    sol = vt.solve(lp, method="intpt")
    # min x^2/2 s.t. x >= 2 -> x = 2, obj = 2
    assert sol.status == int(Status.OPTIMAL)
    assert sol.primal_obj == pytest.approx(2.0, abs=1e-5)
    assert sol.x[0] == pytest.approx(2.0, abs=1e-4)
