"""Solver registry and top-level solve().

The reference selects its algorithm at LINK TIME (one solver() per binary,
simpo/makefile:65-67, ipo/makefile:56-58).  Here a runtime registry maps
method names to jitted canonical-form solvers:

    intpt   — path-following primal-dual IPM     (src/ipo/intpt.c)
    hsd     — homogeneous self-dual (default)    (src/ipo/hsd.c)
    hsdls   — HSD long-step                      (src/ipo/hsdls.c)
    pd      — parametric self-dual simplex       (src/simpo/pd.c)
    twophase— two-phase simplex                  (src/simpo/2phase.c)
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from ..core.canonicalize import canonicalize, recover_solution, CanonLP
from ..core.config import SolverConfig
from ..core.lp import LP, Solution
from ..core.status import Status
from . import intpt as _intpt
from . import hsd as _hsd
from . import simplex as _simplex


def _solve_intpt(canon: CanonLP, cfg: SolverConfig):
    max_iter = cfg.max_iter or _intpt.DEFAULT_MAX_ITER
    trace = cfg.verbose >= 2
    if trace:
        print(_intpt.INTPT_BANNER, flush=True)
    A = jnp.asarray(canon.A, cfg.dtype)
    Q = None if canon.Q is None else jnp.asarray(canon.Q, cfg.dtype)
    return _intpt.solve_canon(
        A, jnp.asarray(canon.b, cfg.dtype), jnp.asarray(canon.c, cfg.dtype),
        canon.f, Q=Q, max_iter=max_iter, eps=cfg.ipm_eps, delta=cfg.delta,
        step_factor=cfg.step_factor, epsdiag=cfg.epsdiag,
        refine_tol=cfg.refine_tol, max_refine=cfg.max_refine, trace=trace)


def _solve_hsd(canon: CanonLP, cfg: SolverConfig, long_step=False):
    max_iter = cfg.max_iter or (
        _hsd.DEFAULT_MAX_ITER_LS if long_step else _hsd.DEFAULT_MAX_ITER)
    trace = cfg.verbose >= 2
    if trace:
        print(_hsd.HSD_BANNER, flush=True)
    A = jnp.asarray(canon.A, cfg.dtype)
    return _hsd.solve_canon(
        A, jnp.asarray(canon.b, cfg.dtype), jnp.asarray(canon.c, cfg.dtype),
        canon.f, max_iter=max_iter, eps=cfg.hsd_eps,
        step_factor=cfg.hsd_step_factor, long_step=long_step, beta=cfg.beta,
        epsdiag=cfg.epsdiag, refine_tol=cfg.refine_tol,
        max_refine=cfg.max_refine, trace=trace,
        factor_dtype=cfg.factor_dtype, hybrid_mu=cfg.hybrid_mu)


def _solve_pd(canon: CanonLP, cfg: SolverConfig):
    return _simplex.solve_canon_pd(canon, cfg)


def _solve_twophase(canon: CanonLP, cfg: SolverConfig):
    return _simplex.solve_canon_twophase(canon, cfg)


SOLVERS = {
    "intpt": _solve_intpt,
    "hsd": _solve_hsd,
    "hsdls": lambda canon, cfg: _solve_hsd(canon, cfg, long_step=True),
    "pd": _solve_pd,
    "twophase": _solve_twophase,
}


def get_solver(method: str):
    try:
        return SOLVERS[method]
    except KeyError:
        raise ValueError(
            f"unknown method {method!r}; available: {sorted(SOLVERS)}")


def solve(lp: LP, method: str = "hsd", config: SolverConfig | None = None,
          pad_to: int = 1) -> Solution:
    """Canonicalize and solve an LP; the analogue of solvelp (solve.c:28)."""
    cfg = config or SolverConfig()
    cfg = cfg.with_(method=method)
    if lp.qnz and method != "intpt":
        # the reference's shipped solvers silently ignore Q (its ldltfac
        # builds a private zero-Q LP, ldlt.c:140-144); we instead route
        # quadratic objectives to the QP-capable path-following solver
        if cfg.verbose:
            print(f"QUADS present: routing method {method!r} -> 'intpt' "
                  "(QP-capable)", flush=True)
        method = "intpt"
    canon = canonicalize(lp, pad_to=pad_to, dtype=cfg.dtype,
                         free_vars=cfg.free_vars)
    if canon.status != int(Status.RUNNING):
        n, m0 = lp.n, lp.m
        return Solution(status=canon.status, x=np.zeros(n), y=np.zeros(m0),
                        w=np.zeros(m0), z=np.zeros(n), primal_obj=0.0,
                        dual_obj=0.0)
    t0 = time.perf_counter()
    status, x, y, w, z, iters = get_solver(method)(canon, cfg)
    x = np.asarray(x)
    elapsed = time.perf_counter() - t0
    x, y, w, z, pobj, dobj, b_canon = recover_solution(canon, x, y, w, z)
    return Solution(status=int(status), x=x, y=y, w=w, z=z,
                    primal_obj=pobj, dual_obj=dobj, iterations=int(iters),
                    solve_time_s=elapsed, b_canon=b_canon)
