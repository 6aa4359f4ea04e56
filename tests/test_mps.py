"""MPS reader unit tests against the reference parser's semantics
(src/common/iolp.c:145-838).

The reference is a FIXED-COLUMN parser (fields at columns 2-3, 5-12, 15-22,
25-36, 40-47, 50-61, 1-based; iolp.c:237-245); `row()` builds correctly
aligned data lines.
"""

import numpy as np
import pytest

from vanderbei_tpu.io.mps import read_mps
from vanderbei_tpu.core.lp import INF, VAR_INTEGER, VAR_SEMICONT


def row(typ="", l0="", l1="", v1="", l2="", v2=""):
    return f" {typ:<3s}{l0:<10s}{l1:<10s}{str(v1):<15s}{l2:<10s}{str(v2)}"


def write_mps(tmp_path, lines, name="t.mps"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def simple_lines():
    return [
        "NAME          TINY",
        "ROWS",
        row("N", "COST"),
        row("L", "LIM1"),
        row("G", "LIM2"),
        row("E", "EQ1"),
        "COLUMNS",
        row("", "X1", "COST", 1.0, "LIM1", 2.0),
        row("", "X1", "EQ1", 1.0),
        row("", "X2", "COST", 2.0, "LIM1", 1.0),
        row("", "X2", "LIM2", 1.0),
        row("", "X3", "COST", -1.0, "LIM2", 1.0),
        row("", "X3", "EQ1", 1.0),
        "RHS",
        row("", "RHS", "LIM1", 4.0, "LIM2", 1.0),
        row("", "RHS", "EQ1", 7.0),
        "BOUNDS",
        row("UP", "BND", "X1", 4.0),
        row("LO", "BND", "X2", 1.0),
        "ENDATA",
    ]


def test_simple_parse(tmp_path):
    lp = read_mps(write_mps(tmp_path, simple_lines()))
    assert lp.name == "TINY"
    assert lp.m == 3 and lp.n == 3
    assert lp.rowlab == ["LIM1", "LIM2", "EQ1"]
    assert lp.collab == ["X1", "X2", "X3"]
    np.testing.assert_allclose(lp.c, [1.0, 2.0, -1.0])
    # L row LIM1 negated: -2 x1 - 1 x2 >= -4
    A = lp.dense_A()
    np.testing.assert_allclose(A[0], [-2.0, -1.0, 0.0])
    np.testing.assert_allclose(A[1], [0.0, 1.0, 1.0])
    np.testing.assert_allclose(A[2], [1.0, 0.0, 1.0])
    np.testing.assert_allclose(lp.b, [-4.0, 1.0, 7.0])
    # ranges: L/G rows inf, E rows 0
    np.testing.assert_allclose(lp.r, [np.inf, np.inf, 0.0])
    np.testing.assert_allclose(lp.l, [0.0, 1.0, 0.0])
    np.testing.assert_allclose(lp.u, [4.0, np.inf, np.inf])
    assert not lp.maximize


def test_header_keywords(tmp_path):
    lines = [
        "MAX",
        "SIGFIG        6",
        "INFTOL        1e-7",
        "ITNLIM        500",
        "NAME          K",
        "ROWS",
        row("N", "obj"),
        row("G", "r1"),
        "COLUMNS",
        row("", "x", "obj", 1.0, "r1", 1.0),
        "RHS",
        row("", "rhs", "r1", 2.0),
        "ENDATA",
    ]
    lp = read_mps(write_mps(tmp_path, lines))
    assert lp.maximize
    assert lp.sf_req == 6
    assert lp.inftol == pytest.approx(1e-7)
    assert lp.itnlim == 500
    assert "MAX" in lp.params


def test_bound_types(tmp_path):
    lines = [
        "NAME          B",
        "ROWS",
        row("N", "obj"),
        row("G", "r"),
        "COLUMNS",
    ]
    for v in "abcdef":
        lines.append(row("", v, "obj", 1.0, "r", 1.0))
    lines += [
        "RHS",
        "BOUNDS",
        row("FX", "BND", "a", 3.0),
        row("FR", "BND", "b"),
        row("MI", "BND", "c"),
        row("BV", "BND", "d"),
        row("LI", "BND", "e", 2.0),
        row("SC", "BND", "f", 9.0),
        "ENDATA",
    ]
    lp = read_mps(write_mps(tmp_path, lines))
    a, b, c, d, e, f = range(6)
    assert lp.l[a] == 3.0 and lp.u[a] == 3.0
    assert lp.l[b] == -INF and lp.u[b] == INF
    # MI quirk: upper becomes the previous lower (0.0) — iolp.c:560-562
    assert lp.l[c] == -INF and lp.u[c] == 0.0
    assert lp.l[d] == 0.0 and lp.u[d] == 1.0 and lp.varsgn[d] == VAR_INTEGER
    assert lp.l[e] == 2.0 and lp.varsgn[e] == VAR_INTEGER
    assert lp.u[f] == 9.0 and lp.varsgn[f] == VAR_SEMICONT


def test_ranges_and_marker(tmp_path):
    lines = [
        "NAME          R",
        "ROWS",
        row("N", "obj"),
        row("G", "r1"),
        row("L", "r2"),
        "COLUMNS",
        row("", "x", "obj", 1.0, "r1", 1.0),
        row("", "x", "r2", 1.0),
        row("", "MARKER1", "'MARKER'", "", "", ""),
        row("", "y", "obj", 1.0, "r1", 2.0),
        row("", "MARKER2", "'MARKER'", "", "", ""),
        row("", "z", "obj", 1.0, "r2", 1.0),
        "RHS",
        row("", "rhs", "r1", 1.0, "r2", 5.0),
        "RANGES",
        row("", "rng", "r1", 2.0),
        "ENDATA",
    ]
    lp = read_mps(write_mps(tmp_path, lines))
    assert lp.varsgn.tolist() == [1, 2, 1]
    assert lp.r[0] == 2.0          # ranged G row: 1 <= a'x <= 3
    assert lp.b[1] == -5.0         # negated L row


def test_quads(tmp_path):
    lines = [
        "NAME          Q",
        "ROWS",
        row("N", "obj"),
        row("G", "r"),
        "COLUMNS",
        row("", "x", "obj", 1.0, "r", 1.0),
        row("", "y", "obj", 1.0, "r", 1.0),
        "RHS",
        row("", "rhs", "r", 1.0),
        "QUADS",
        row("", "x", "x", 2.0),
        row("", "x", "y", 1.0),
        row("", "y", "y", 4.0),
        "ENDATA",
    ]
    lp = read_mps(write_mps(tmp_path, lines))
    Q = lp.dense_Q()
    np.testing.assert_allclose(Q, [[2.0, 1.0], [1.0, 4.0]])


def test_objective_from_first_n_row(tmp_path):
    lines = [
        "NAME          N2",
        "ROWS",
        row("N", "obj1"),
        row("N", "obj2"),
        row("G", "r"),
        "COLUMNS",
        row("", "x", "obj1", 5.0, "obj2", 7.0),
        row("", "x", "r", 1.0),
        "RHS",
        "ENDATA",
    ]
    lp = read_mps(write_mps(tmp_path, lines))
    # first N row is the objective; other N rows dropped
    assert lp.m == 1
    np.testing.assert_allclose(lp.c, [5.0])


def test_netlib_afiro_dims():
    import os
    path = "/root/reference/problems/netlib/afiro.mps"
    if not os.path.exists(path):
        pytest.skip("netlib corpus not mounted")
    lp = read_mps(path)
    # golden dims: 28 rows (incl. objective), 32 cols, 88 nz (incl. obj row)
    assert lp.n == 32
    assert lp.m == 27              # 28 - objective row
    assert lp.nz == 83             # 88 - 5 objective coefficients
