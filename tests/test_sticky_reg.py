"""Sticky Tikhonov regularization (ops/kkt.kkt_factor reg0) + the HSD
stall detector's near-converged gate."""

import numpy as np
import jax.numpy as jnp

from vanderbei_tpu.ops.kkt import kkt_factor, kkt_solve


def _operands(seed=0, m=24, n=40):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((m, n)))
    E = jnp.asarray(rng.uniform(0.5, 2.0, m))
    D = jnp.asarray(rng.uniform(0.5, 2.0, n))
    return A, E, D


def test_factor_reports_reg_zero_when_clean():
    A, E, D = _operands()
    fac = kkt_factor(A, E, D, 1e-14)
    assert float(fac.reg) == 0.0


def test_reg0_seeds_the_escalation():
    A, E, D = _operands(1)
    fac = kkt_factor(A, E, D, 1e-14, reg0=1e-8)
    # clean matrix: first factor at the seeded level succeeds and the
    # level is carried through, not reset
    assert float(fac.reg) == 1e-8


def test_seeded_factor_still_solves():
    A, E, D = _operands(2)
    rng = np.random.default_rng(3)
    ry = jnp.asarray(rng.standard_normal(A.shape[0]))
    rx = jnp.asarray(rng.standard_normal(A.shape[1]))
    fac = kkt_factor(A, E, D, 1e-14, reg0=1e-10)
    dy, dx = kkt_solve(A, E, D, fac, ry, rx)
    # K [dy; dx] = [ry; rx] with K = [[-E, A], [A', D]]
    r1 = ry + E * dy - A @ dx
    r2 = rx - A.T @ dy - D * dx
    assert float(jnp.max(jnp.abs(r1))) < 1e-8
    assert float(jnp.max(jnp.abs(r2))) < 1e-8


def test_hsd_state_carries_reg_and_stall():
    from vanderbei_tpu.models import hsd
    A = jnp.asarray(np.random.default_rng(0).standard_normal((8, 12)))
    s = hsd.init_state(A)
    assert float(s.reg) == 0.0
    assert float(s.mu_best) == np.inf
    assert int(s.stall) == 0
    s32 = hsd.cast_state(s, jnp.float32)
    assert s32.reg.dtype == jnp.float32 and float(s32.reg) == 0.0
