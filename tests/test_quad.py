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
