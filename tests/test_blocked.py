"""Blocked (gemm-built) Cholesky vs the XLA reference factorization.

The blocked kernels (ops/blocked.py) replace XLA's scalar-emulated f64
Cholesky/triangular-solve on TPU; these tests pin their numerics against
jnp.linalg on CPU, including the non-multiple padding path, batching via
vmap, NaN propagation for the Tikhonov retry, and the full kkt_factor/
kkt_solve integration with VANDERBEI_BLOCKED=1.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vanderbei_tpu  # noqa: F401  (x64)
from vanderbei_tpu.ops.blocked import (
    BlockedFactor, blocked_cholesky, blocked_chol_dense, blocked_cho_solve)


def _spd(n, seed=0, cond=1e6, dtype=np.float64):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, -np.log10(cond), n)
    return (Q * d) @ Q.T.astype(dtype)


@pytest.mark.parametrize("n,block", [(8, 4), (64, 16), (100, 32), (130, 64),
                                     (256, 64)])
def test_blocked_matches_lapack(n, block):
    M = jnp.asarray(_spd(n, seed=n))
    L_ref = np.asarray(jnp.linalg.cholesky(M))
    L_blk = np.asarray(blocked_chol_dense(M, block))
    assert np.allclose(L_blk, L_ref, rtol=1e-11, atol=1e-11 * np.abs(L_ref).max())


@pytest.mark.parametrize("n,block,k", [(64, 16, 1), (100, 32, 3), (192, 64, 2)])
def test_blocked_solve(n, block, k):
    M = jnp.asarray(_spd(n, seed=n + 1, cond=1e8))
    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.standard_normal((n, k)))
    fac = blocked_cholesky(M, block)
    u = np.asarray(blocked_cho_solve(fac, t))
    resid = np.asarray(M) @ u - np.asarray(t)
    assert np.abs(resid).max() < 1e-6 * np.abs(np.asarray(t)).max()


def test_blocked_vmap():
    B, n = 3, 96
    Ms = jnp.stack([jnp.asarray(_spd(n, seed=s)) for s in range(B)])
    ts = jnp.asarray(np.random.default_rng(9).standard_normal((B, n, 2)))
    facs = jax.vmap(lambda M: blocked_cholesky(M, 32))(Ms)
    us = jax.vmap(blocked_cho_solve)(facs, ts)
    for j in range(B):
        resid = np.asarray(Ms[j]) @ np.asarray(us[j]) - np.asarray(ts[j])
        assert np.abs(resid).max() < 1e-8


def test_blocked_nan_on_indefinite():
    M = jnp.asarray(_spd(32, seed=3))
    M = M - 10.0 * jnp.eye(32)     # indefinite
    fac = blocked_cholesky(M, 16)
    assert bool(jnp.any(jnp.isnan(fac.Loff)) | jnp.any(jnp.isnan(fac.Winv)))


def test_kkt_blocked_integration(monkeypatch):
    """kkt_factor/kkt_solve through the blocked f64 path (as on TPU)."""
    monkeypatch.setenv("VANDERBEI_BLOCKED", "1")
    from vanderbei_tpu.ops import kkt
    rng = np.random.default_rng(11)
    m, n = 40, 70
    A = jnp.asarray(rng.standard_normal((m, n)))
    E = jnp.asarray(rng.uniform(1e-6, 1e3, m))
    D = jnp.asarray(rng.uniform(1e-6, 1e3, n))
    ry = jnp.asarray(rng.standard_normal(m))
    rx = jnp.asarray(rng.standard_normal(n))
    fac = kkt.kkt_factor(A, E, D, 1e-14)
    assert fac.Winv is not None
    dy, dx = kkt.kkt_solve(A, E, D, fac, ry, rx)
    r1 = np.asarray(ry + E * dy - A @ dx)
    r2 = np.asarray(rx - A.T @ dy - D * dx)
    scale = max(np.abs(np.asarray(ry)).max(), np.abs(np.asarray(rx)).max())
    assert max(np.abs(r1).max(), np.abs(r2).max()) < 1e-9 * (scale + 1)


def test_kkt_blocked_solver_end_to_end(monkeypatch):
    """A whole netlib solve through the forced-blocked f64 factor path."""
    monkeypatch.setenv("VANDERBEI_BLOCKED", "1")
    from vanderbei_tpu.io import netlib
    from vanderbei_tpu.models.registry import solve
    sol = solve(netlib.load("AFIRO"), method="hsd")
    golden = netlib.golden_objective("AFIRO")
    assert sol.status == 0
    assert abs(sol.primal_obj - golden) / abs(golden) < 1e-6
