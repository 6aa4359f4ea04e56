"""Canonicalizer unit tests (reference solvelp algebra, solve.c:28-205)."""

import numpy as np
import pytest

from vanderbei_tpu.core.lp import LP, INF
from vanderbei_tpu.core.canonicalize import canonicalize, recover_solution
from vanderbei_tpu.core.status import Status


def make_lp(A, b, c, r=None, l=None, u=None, maximize=False):
    A = np.asarray(A, float)
    m, n = A.shape
    # CSC from dense
    vals, rows, kA = [], [], [0]
    for j in range(n):
        nzi = np.nonzero(A[:, j])[0]
        vals.extend(A[nzi, j])
        rows.extend(nzi)
        kA.append(len(vals))
    return LP(
        name="t", m=m, n=n,
        A=np.array(vals), iA=np.array(rows, dtype=np.int64),
        kA=np.array(kA, dtype=np.int64),
        b=np.asarray(b, float), c=np.asarray(c, float), f=0.0,
        r=np.full(m, INF) if r is None else np.asarray(r, float),
        l=np.zeros(n) if l is None else np.asarray(l, float),
        u=np.full(n, INF) if u is None else np.asarray(u, float),
        rowlab=[f"r{i}" for i in range(m)],
        collab=[f"x{j}" for j in range(n)],
        maximize=maximize,
    )


def test_plain_rows_negated():
    # b <= Ax (G rows) become -Ax <= -b
    lp = make_lp([[1.0, 2.0]], [3.0], [1.0, 1.0])
    canon = canonicalize(lp)
    np.testing.assert_allclose(canon.A[: canon.m], [[-1.0, -2.0]])
    np.testing.assert_allclose(canon.b[: canon.m], [-3.0])
    # min -> max negates c
    np.testing.assert_allclose(canon.c[: canon.n], [-1.0, -1.0])


def test_equality_becomes_pair():
    lp = make_lp([[1.0, 1.0]], [2.0], [1.0, 0.0], r=[0.0])
    canon = canonicalize(lp)
    assert canon.m == 2
    np.testing.assert_allclose(canon.A[:2], [[-1.0, -1.0], [1.0, 1.0]])
    np.testing.assert_allclose(canon.b[:2], [-2.0, 2.0])


def test_range_row_pair():
    # 1 <= x1 + x2 <= 4
    lp = make_lp([[1.0, 1.0]], [1.0], [1.0, 0.0], r=[3.0])
    canon = canonicalize(lp)
    np.testing.assert_allclose(canon.b[:2], [-1.0, 4.0])


def test_bound_shift_and_ub_rows():
    lp = make_lp([[1.0]], [2.0], [3.0], l=[1.0], u=[5.0])
    canon = canonicalize(lp)
    # shifted: b - A l = 2 - 1 = 1 -> row -x <= -1; ub row x <= u-l = 4
    assert canon.m == 2
    np.testing.assert_allclose(canon.b[:2], [-1.0, 4.0])
    np.testing.assert_allclose(canon.A[1, 0], 1.0)
    # f picked up c'l = 3 (negated for min)
    assert canon.f == pytest.approx(-3.0)


def test_free_variable_rejected():
    lp = make_lp([[1.0]], [1.0], [1.0], l=[-INF])
    canon = canonicalize(lp)
    assert canon.status == int(Status.DUAL_UNBOUNDED)


def test_padding_benign():
    lp = make_lp([[1.0, 2.0]], [3.0], [1.0, 1.0])
    canon = canonicalize(lp, pad_to=8)
    assert canon.A.shape == (8, 8)
    # padding rows: 0'x <= 1
    np.testing.assert_allclose(canon.b[canon.m:], 1.0)
    np.testing.assert_allclose(canon.A[canon.m:], 0.0)
    np.testing.assert_allclose(canon.c[canon.n:], 0.0)


def test_recover_roundtrip_min():
    # min x1 + x2 s.t. x1 + x2 >= 2, x >= 0 -> optimum 2
    lp = make_lp([[1.0, 1.0]], [2.0], [1.0, 1.0])
    canon = canonicalize(lp)
    # canonical: max -x1 -x2 s.t. -x1 -x2 <= -2; take x = (2, 0), y = (1,)
    x, y, w, z, pobj, dobj, b_canon = recover_solution(
        canon, np.array([2.0, 0.0]), np.array([1.0]), np.array([0.0]),
        np.array([0.0, 0.0]))
    assert pobj == pytest.approx(2.0)
    assert dobj == pytest.approx(2.0)
    np.testing.assert_allclose(x, [2.0, 0.0])
    # min problem: duals negated back
    np.testing.assert_allclose(y, [-1.0])


def test_bc_normalization_roundtrip():
    """scale='geometric' normalizes ||b||,||c|| to ~1 by power-of-two
    scalars; recover_solution must undo it exactly (x, duals, objectives,
    b_canon all in original units)."""
    import numpy as np
    from vanderbei_tpu.core.builder import LPBuilder
    from vanderbei_tpu.core.canonicalize import canonicalize, recover_solution
    from vanderbei_tpu.models.registry import solve

    b = LPBuilder("normtest", maximize=False)
    b.var("x1", obj=3.0e3)
    b.var("x2", obj=2.0e3, upper=4.0e7)
    b.constraint("r1", {"x1": 1.0, "x2": 1.0}, lo=1.0e8, hi=1.0e8)
    b.constraint("r2", {"x1": 2.0, "x2": 1.0}, hi=1.7e8)
    lp = b.build()
    canon = canonicalize(lp, pad_to=1, scale="geometric")
    assert canon.b_scale > 1.0 and abs(np.abs(canon.b[:canon.m]).max() - 1.0) < 1.0
    sol = solve(lp, method="hsd")
    # optimum: x2 at its bound 4e7, x1 = 6e7 -> 3e3*6e7 + 2e3*4e7 = 2.6e11
    assert sol.status == 0
    assert abs(sol.primal_obj - 2.6e11) / 2.6e11 < 1e-8
    assert abs(sol.x[0] - 6.0e7) / 6.0e7 < 1e-6
    assert abs(sol.x[1] - 4.0e7) / 4.0e7 < 1e-6
    # duals in original units: strong duality b'y (over original rows)
    assert abs(sol.dual_obj - sol.primal_obj) / 2.6e11 < 1e-7
