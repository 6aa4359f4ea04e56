"""Double-double arithmetic tests (reference src/Quad/Quad.{h,c} semantics:
error-free two-sum and Dekker-split products)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vanderbei_tpu.ops import quad as q


def test_two_sum_exact():
    a = jnp.float64(1.0)
    b = jnp.float64(1e-20)
    s, e = q.two_sum(a, b)
    assert float(s) == 1.0
    assert float(e) == 1e-20          # the lost bits are captured exactly


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, 100))
    b = jnp.asarray(rng.uniform(-1, 1, 100))
    p, err = q.two_prod(a, b)
    # p + err reproduces the exact product within one DD ulp: check
    # against float128 if numpy provides it, else structural property
    if hasattr(np, "float128"):
        exact = np.asarray(a, np.float128) * np.asarray(b, np.float128)
        got = np.asarray(p, np.float128) + np.asarray(err, np.float128)
        assert float(np.max(np.abs(got - exact))) == 0.0


def test_dd_mul_precision():
    # (1 + 2^-30)^2 = 1 + 2^-29 + 2^-60: the 2^-60 term is invisible to
    # f64 but exactly representable in DD
    x = q.DD(jnp.float64(1.0), jnp.float64(2.0 ** -30))
    y = q.dd_mul(x, x)
    expect_hi = 1.0 + 2.0 ** -29
    assert float(y.hi) == pytest.approx(expect_hi, abs=0)
    assert float(y.lo) == pytest.approx(2.0 ** -60, rel=1e-10)


def test_dd_div_roundtrip():
    x = q.dd(jnp.float64(1.0))
    three = q.dd(jnp.float64(3.0))
    t = q.dd_div(x, three)
    back = q.dd_mul(t, three)
    err = abs(float(back.hi) - 1.0) + abs(float(back.lo))
    assert err < 1e-30


def test_dot2_beats_naive_f32():
    rng = np.random.default_rng(1)
    n = 4096
    a32 = jnp.asarray(rng.normal(size=n), jnp.float32)
    b32 = jnp.asarray(rng.normal(size=n), jnp.float32)
    exact = float(np.asarray(a32, np.float64) @ np.asarray(b32, np.float64))
    naive = float(jnp.dot(a32, b32))
    comp = float(q.dot2(a32, b32))
    assert abs(comp - exact) <= abs(naive - exact)
    assert abs(comp - exact) < 1e-4 * max(1.0, abs(exact))


def test_sum2_ill_conditioned():
    # sum of [1e16, 1, -1e16, 1, ...] style cancellation
    a = jnp.asarray([1e16, 3.14159, -1e16, 2.71828, 1.0, -1.0])
    assert float(q.sum2(a)) == pytest.approx(3.14159 + 2.71828, rel=1e-15)


def test_matvec2_beats_plain_matvec_on_cancellation():
    """matvec2 must survive catastrophic cancellation that wipes out a
    plain f64 matvec (the scenario QuadPrec existed for)."""
    import numpy as np
    import jax.numpy as jnp
    from vanderbei_tpu.ops.quad import matvec2
    A = np.array([[1e16, 1.0, -1e16, 1.0],
                  [3.0, 1e14, 2.0, -1e14]])
    x = np.array([1.0, 1.0, 1.0, 1.0])
    exact = np.array([2.0, 5.0])
    comp = np.asarray(matvec2(jnp.asarray(A), jnp.asarray(x)))
    np.testing.assert_allclose(comp, exact, rtol=0, atol=1e-12)


def test_matvec2_f32_reaches_f64_accuracy():
    import numpy as np
    import jax.numpy as jnp
    from vanderbei_tpu.ops.quad import matvec2
    rng = np.random.default_rng(5)
    A = rng.normal(size=(17, 33))
    x = rng.normal(size=33)
    ref = A @ x                                   # f64 reference
    comp32 = np.asarray(matvec2(jnp.asarray(A, jnp.float32),
                                jnp.asarray(x, jnp.float32)))
    plain32 = np.asarray(jnp.asarray(A, jnp.float32) @ jnp.asarray(x, jnp.float32))
    err_comp = np.max(np.abs(comp32 - ref))
    err_plain = np.max(np.abs(plain32 - ref))
    assert err_comp < 1e-6
    assert err_comp <= err_plain


def test_dd_precision_mode_end_to_end():
    """precision='dd' (QuadPrec-equivalent) solves to the golden optimum."""
    import os
    import pytest as _pytest
    from vanderbei_tpu.io import netlib
    from vanderbei_tpu.core.config import SolverConfig
    from vanderbei_tpu.core.status import Status
    import vanderbei_tpu as vt
    if not os.path.exists(netlib.netlib_dir()):
        _pytest.skip("netlib corpus absent")
    lp = netlib.load("AFIRO")
    sol = vt.solve(lp, config=SolverConfig(precision="dd", hsd_eps=1e-13))
    golden = netlib.golden_objective("AFIRO")
    assert sol.status == int(Status.OPTIMAL)
    assert abs(sol.primal_obj - golden) / abs(golden) < 1e-8


def test_sigfig_header_selects_dd(tmp_path):
    """SIGFIG > 9 in the MPS header auto-selects the compensated mode and
    tightens the stop (config.apply_lp_params)."""
    from vanderbei_tpu.core.config import SolverConfig
    import vanderbei_tpu as vt
    text = "\n".join([
        "SIGFIG        11",
        "NAME          S",
        "ROWS",
        " N  obj",
        " L  r1",
        "COLUMNS",
        "    x         obj       1.0        r1        1.0",
        "RHS",
        "    rhs       r1        4.0",
        "ENDATA",
    ]) + "\n"
    p = tmp_path / "s.mps"
    p.write_text(text)
    lp = vt.read_mps(str(p))
    cfg = SolverConfig().apply_lp_params(lp)
    assert cfg.precision == "dd"
    assert cfg.hsd_eps == 1e-15
