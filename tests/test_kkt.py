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


def test_ub_tail_schur_matches_full_dense():
    """The Schur-eliminated singleton-ub-tail path must equal the dense
    solve of the full system [[-E, Af],[Af', D]] with Af = [A1; S]."""
    from vanderbei_tpu.ops.kkt import UbTail
    rng = np.random.default_rng(7)
    m1, k, n = 9, 6, 14         # 4 real ub rows + 2 padding rows
    A1 = rng.normal(size=(m1, n))
    idx2 = np.array([1, 4, 7, 11, 0, 0], dtype=np.int32)
    w2 = np.array([1.0, 0.5, 2.0, 1.0, 0.0, 0.0])
    S = np.zeros((k, n))
    for i in range(k):
        S[i, idx2[i]] = w2[i]
    Af = np.vstack([A1, S])
    E = rng.uniform(0.5, 2.0, m1 + k)
    D = rng.uniform(0.5, 2.0, n)
    ry = rng.normal(size=m1 + k)
    rx = rng.normal(size=n)
    K = np.block([[-np.diag(E), Af], [Af.T, np.diag(D)]])
    ref = np.linalg.solve(K, np.concatenate([ry, rx]))

    ub = UbTail(jnp.asarray(idx2), jnp.asarray(w2))
    fac = kkt_factor(jnp.asarray(A1), jnp.asarray(E), jnp.asarray(D),
                     1e-14, ub=ub)
    assert fac.L.shape == (m1, m1)       # only the head is factored
    dy, dx = kkt_solve(jnp.asarray(A1), jnp.asarray(E), jnp.asarray(D),
                       fac, jnp.asarray(ry), jnp.asarray(rx), ub=ub)
    np.testing.assert_allclose(np.asarray(dy), ref[:m1 + k], rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(dx), ref[m1 + k:], rtol=1e-9,
                               atol=1e-9)


def test_ub_tail_extreme_scaling():
    """ub-tail path under near-convergence D/E spreads stays finite and
    refinement-accurate (the bounded-variable harmonic diagonal must not
    overflow/cancel)."""
    from vanderbei_tpu.ops.kkt import UbTail, tail_matvec, tail_rmatvec
    rng = np.random.default_rng(8)
    m1, k, n = 12, 10, 20
    A1 = rng.normal(size=(m1, n))
    idx2 = np.asarray(rng.choice(n, size=k, replace=False), dtype=np.int32)
    w2 = np.ones(k)
    E = 10.0 ** rng.uniform(-10, 10, m1 + k)
    D = 10.0 ** rng.uniform(-10, 10, n)
    ry = rng.normal(size=m1 + k)
    rx = rng.normal(size=n)
    ub = UbTail(jnp.asarray(idx2), jnp.asarray(w2))
    fac = kkt_factor(jnp.asarray(A1), jnp.asarray(E), jnp.asarray(D),
                     1e-14, ub=ub)
    dy, dx = kkt_solve(jnp.asarray(A1), jnp.asarray(E), jnp.asarray(D),
                       fac, jnp.asarray(ry), jnp.asarray(rx), ub=ub)
    dy = np.asarray(dy); dx = np.asarray(dx)
    Afdx = np.asarray(tail_matvec(jnp.asarray(A1), ub, jnp.asarray(dx)))
    Afty = np.asarray(tail_rmatvec(jnp.asarray(A1), ub, jnp.asarray(dy)))
    r1 = ry + E * dy - Afdx
    r2 = rx - Afty - D * dx
    scale = max(np.max(np.abs(ry)), np.max(np.abs(rx))) + 1
    assert np.max(np.abs(np.concatenate([r1, r2]))) < 1e-6 * scale
