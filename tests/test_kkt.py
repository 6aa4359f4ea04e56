"""KKT engine unit tests: reduced normal equations vs a dense solve of the
full quasi-definite system (reference ldlt.c semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vanderbei_tpu.ops.kkt import kkt_factor, kkt_solve


@pytest.mark.parametrize("m,n", [(5, 9), (9, 5), (7, 7)])
def test_matches_dense_solve(m, n):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(m, n))
    E = rng.uniform(0.5, 2.0, m)
    D = rng.uniform(0.5, 2.0, n)
    ry = rng.normal(size=m)
    rx = rng.normal(size=n)
    K = np.block([[-np.diag(E), A], [A.T, np.diag(D)]])
    ref = np.linalg.solve(K, np.concatenate([ry, rx]))

    L = kkt_factor(jnp.array(A), jnp.array(E), jnp.array(D), 1e-14)
    dy, dx = kkt_solve(jnp.array(A), jnp.array(E), jnp.array(D), L,
                       jnp.array(ry), jnp.array(rx))
    np.testing.assert_allclose(np.asarray(dy), ref[:m], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dx), ref[m:], rtol=1e-10)


def test_extreme_scaling_survives():
    """Near-convergence D/E spreads (1e-10..1e10) must not NaN the factor;
    refinement recovers accuracy (dense analogue of ldlt.c:293-306)."""
    rng = np.random.default_rng(1)
    m, n = 12, 20
    A = rng.normal(size=(m, n))
    D = 10.0 ** rng.uniform(-10, 10, n)
    E = 10.0 ** rng.uniform(-10, 10, m)
    ry = rng.normal(size=m)
    rx = rng.normal(size=n)
    L = kkt_factor(jnp.array(A), jnp.array(E), jnp.array(D), 1e-14)
    assert not np.any(np.isnan(np.asarray(L.L)))
    dy, dx = kkt_solve(jnp.array(A), jnp.array(E), jnp.array(D), L,
                       jnp.array(ry), jnp.array(rx))
    r1 = ry + E * np.asarray(dy) - A @ np.asarray(dx)
    r2 = rx - A.T @ np.asarray(dy) - D * np.asarray(dx)
    scale = max(np.max(np.abs(ry)), np.max(np.abs(rx))) + 1
    assert np.max(np.abs(np.concatenate([r1, r2]))) < 1e-6 * scale


def test_quadratic_term():
    rng = np.random.default_rng(2)
    m, n = 6, 4
    A = rng.normal(size=(m, n))
    Qh = rng.normal(size=(n, n))
    Q = Qh @ Qh.T + np.eye(n)
    E = rng.uniform(0.5, 2.0, m)
    D = rng.uniform(0.5, 2.0, n)
    ry = rng.normal(size=m)
    rx = rng.normal(size=n)
    K = np.block([[-np.diag(E), A], [A.T, np.diag(D) + Q]])
    ref = np.linalg.solve(K, np.concatenate([ry, rx]))
    L = kkt_factor(jnp.array(A), jnp.array(E), jnp.array(D), 1e-14,
                   Q=jnp.array(Q))
    dy, dx = kkt_solve(jnp.array(A), jnp.array(E), jnp.array(D), L,
                       jnp.array(ry), jnp.array(rx), Q=jnp.array(Q))
    np.testing.assert_allclose(np.asarray(dy), ref[:m], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(dx), ref[m:], rtol=1e-8)


def test_mixed_precision_f32_factor():
    """f32 (MXU-speed) factor + f64 refinement recovers f64-grade accuracy
    on a Jacobi-scaled moderately conditioned system."""
    rng = np.random.default_rng(3)
    m, n = 40, 24
    A = rng.normal(size=(m, n))
    D = 10.0 ** rng.uniform(-4, 4, n)
    E = 10.0 ** rng.uniform(-4, 4, m)
    ry = rng.normal(size=m)
    rx = rng.normal(size=n)
    fac = kkt_factor(jnp.array(A), jnp.array(E), jnp.array(D), 1e-14,
                     factor_dtype=jnp.float32)
    assert fac.L.dtype == jnp.float32
    dy, dx = kkt_solve(jnp.array(A), jnp.array(E), jnp.array(D), fac,
                       jnp.array(ry), jnp.array(rx))
    K = np.block([[-np.diag(E), A], [A.T, np.diag(D)]])
    ref = np.linalg.solve(K, np.concatenate([ry, rx]))
    err = max(np.max(np.abs(np.asarray(dy) - ref[:m])),
              np.max(np.abs(np.asarray(dx) - ref[m:])))
    assert err < 1e-8 * max(1.0, np.max(np.abs(ref)))
