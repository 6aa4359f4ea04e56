"""Native C++ MPS reader: exact equivalence with the Python reader."""

import glob
import os

import numpy as np
import pytest

from vanderbei_tpu.io.mps import read_mps
from vanderbei_tpu.native import available, read_mps_native

pytestmark = pytest.mark.skipif(not available(),
                                reason="native reader unavailable (no g++?)")

NETLIB = "/root/reference/problems/netlib"


def assert_lp_equal(a, b):
    assert a.name == b.name
    assert (a.m, a.n, a.nz, a.qnz) == (b.m, b.n, b.nz, b.qnz)
    for attr in ("A", "iA", "kA", "b", "c", "r", "l", "u", "varsgn",
                 "Q", "iQ", "kQ"):
        np.testing.assert_array_equal(getattr(a, attr), getattr(b, attr),
                                      err_msg=attr)
    assert a.rowlab == b.rowlab
    assert a.collab == b.collab
    assert a.maximize == b.maximize
    assert a.inftol == b.inftol


ALL_NETLIB = sorted(os.path.basename(p)
                    for p in glob.glob(os.path.join(NETLIB, "*.mps")))


@pytest.mark.skipif(not os.path.isdir(NETLIB), reason="corpus absent")
@pytest.mark.parametrize("fname", ALL_NETLIB or ["corpus-absent"])
def test_matches_python_reader(fname):
    """Native reader == Python reader on EVERY on-disk netlib file."""
    path = os.path.join(NETLIB, fname)
    assert_lp_equal(read_mps_native(path), read_mps(path, engine="python"))


@pytest.mark.skipif(not os.path.isdir(NETLIB), reason="corpus absent")
def test_default_engine_is_native_and_solves():
    import vanderbei_tpu as vt
    lp = vt.read_mps(os.path.join(NETLIB, "afiro.mps"))
    sol = vt.solve(lp, method="hsd")
    assert sol.status == 0
    assert sol.primal_obj == pytest.approx(-464.75314286, rel=1e-8)


def test_error_on_missing_file():
    with pytest.raises(ValueError):
        read_mps_native("/nonexistent/file.mps")
