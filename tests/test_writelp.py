"""write_lp -> read_mps roundtrip (reference writelp iolp.c:840-974)."""

import os

import numpy as np
import pytest

from vanderbei_tpu.io.mps import read_mps
from vanderbei_tpu.io.writer import write_lp
from vanderbei_tpu.io import netlib

NETLIB = "/root/reference/problems/netlib"


@pytest.mark.skipif(not os.path.isdir(NETLIB), reason="corpus absent")
@pytest.mark.parametrize("name", ["AFIRO", "BOEING2", "FORPLAN"])
def test_roundtrip_netlib(name, tmp_path):
    lp = netlib.load(name)
    p = str(tmp_path / "out.mps")
    write_lp(lp, p)
    lp2 = read_mps(p, engine="python")
    assert lp2.m == lp.m and lp2.n == lp.n
    np.testing.assert_allclose(lp2.dense_A(), lp.dense_A(), rtol=1e-10)
    np.testing.assert_allclose(lp2.b, lp.b, rtol=1e-10)
    np.testing.assert_allclose(lp2.c, lp.c, rtol=1e-10)
    np.testing.assert_allclose(lp2.r, lp.r, rtol=1e-10)
    np.testing.assert_allclose(lp2.l, lp.l, rtol=1e-10)
    np.testing.assert_allclose(lp2.u, lp.u, rtol=1e-10)
    assert lp2.maximize == lp.maximize


def test_roundtrip_quads_and_bounds(tmp_path):
    from tests.test_mps import row, write_mps
    lines = [
        "MAX",
        "NAME          RT",
        "ROWS",
        row("N", "obj"),
        row("G", "r1"),
        row("L", "r2"),
        "COLUMNS",
        row("", "x", "obj", 1.5, "r1", 1.0),
        row("", "x", "r2", 2.0),
        row("", "y", "obj", -2.5, "r2", 1.0),
        "RHS",
        row("", "rhs", "r1", 1.0, "r2", 8.0),
        "RANGES",
        row("", "rng", "r1", 3.0),
        "BOUNDS",
        row("MI", "BND", "x"),
        row("UP", "BND", "x", 7.0),
        row("FR", "BND", "y"),
        "QUADS",
        row("", "x", "x", 2.0),
        row("", "x", "y", 1.0),
        "ENDATA",
    ]
    lp = read_mps(write_mps(tmp_path, lines), engine="python")
    p = str(tmp_path / "rt.mps")
    write_lp(lp, p)
    lp2 = read_mps(p, engine="python")
    np.testing.assert_allclose(lp2.dense_A(), lp.dense_A())
    np.testing.assert_allclose(lp2.b, lp.b)
    np.testing.assert_allclose(lp2.l, lp.l)
    np.testing.assert_allclose(lp2.u, lp.u)
    np.testing.assert_allclose(lp2.r, lp.r)
    Q1, Q2 = lp.dense_Q(), lp2.dense_Q()
    np.testing.assert_allclose(Q2, Q1)
    assert lp2.maximize
