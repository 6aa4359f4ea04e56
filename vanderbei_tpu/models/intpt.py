"""Path-following primal-dual interior-point method.

Semantics of the reference's ipo METHOD=intpt solver (src/ipo/intpt.c:33-261):
max c'x s.t. Ax + w = b, x,w,y,z > 0; fixed centering delta=0.02, step factor
0.9, divergence-based infeasibility detection, EPS=1e-6, MAX_ITER=200.

TPU-first: a single jitted `lax.while_loop` over a state pytree; the KKT
solve is the dense normal-equations Cholesky in ops/kkt.py; ratio tests are
masked reductions.  Works unchanged under vmap for instance batching and
under shard_map for mesh execution.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.status import Status
from ..ops.kkt import kkt_factor, kkt_solve

DEFAULT_MAX_ITER = 200      # intpt.c:31

INTPT_BANNER = (
    "------------------------------------------------------------------\n"
    "         |           Primal          |            Dual           |\n"
    "  Iter   |  Obj Value       Infeas   |  Obj Value       Infeas   |\n"
    "- - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - ")


def _trace_row(it, pobj, normr, dobj, norms):
    """Host-side printer for one iteration row (intpt.c:163-164 format)."""
    print(f"{int(it):8d}   {float(pobj):14.7e}  {float(normr):8.1e}    "
          f"{float(dobj):14.7e}  {float(norms):8.1e} ", flush=True)


class IntptState(NamedTuple):
    x: jax.Array
    z: jax.Array
    y: jax.Array
    w: jax.Array
    iter: jax.Array
    status: jax.Array
    normr0: jax.Array
    norms0: jax.Array


def _ratio_step(x, dx, z, dz, y, dy, w, dw, r):
    """theta = min(r / max_i(-d/v), 1) over all four vectors (intpt.c:211-220)."""
    t = jnp.maximum(jnp.max(-dx / x), jnp.max(-dz / z))
    t = jnp.maximum(t, jnp.max(-dy / y))
    t = jnp.maximum(t, jnp.max(-dw / w))
    return jnp.where(t > 0.0, jnp.minimum(r / t, 1.0), 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("max_iter", "eps", "delta", "step_factor", "epsdiag",
                     "refine_tol", "max_refine", "trace"),
)
def solve_canon(A, b, c, f, *,
                Q=None,
                max_iter: int = DEFAULT_MAX_ITER,
                eps: float = 1.0e-6,
                delta: float = 0.02,
                step_factor: float = 0.9,
                epsdiag: float = 1.0e-14,
                refine_tol: float = 1.0e-10,
                max_refine: int = 8,
                trace: bool = False):
    """Solve max c'x - x'Qx/2, Ax <= b, x >= 0 (dense canonical).

    Q=None is the pure LP the reference's shipped solvers handle; a PSD Q
    is the QUADS quadratic extension — the reference parses and stores it
    (iolp.c:583-645, lp.h Q fields) and its KKT engine reserves the block
    for it (ldlt.c:253-257), but no shipped solver passes it through; here
    the same Newton system [[-E, A], [A', D+Q]] solves the QP directly.

    Returns (status, x, y, w, z, iterations).
    """
    m, n = A.shape
    dtype = A.dtype
    x = jnp.full((n,), 1000.0, dtype)       # intpt.c:98-106
    z = jnp.full((n,), 1000.0, dtype)
    y = jnp.full((m,), 1000.0, dtype)
    w = jnp.full((m,), 1000.0, dtype)

    inf = jnp.asarray(jnp.inf, dtype)
    state = IntptState(x, z, y, w, jnp.asarray(0),
                       jnp.asarray(int(Status.RUNNING)), inf, inf)

    def cond(s: IntptState):
        return (s.status == int(Status.RUNNING)) & (s.iter < max_iter)

    def body(s: IntptState):
        x, z, y, w = s.x, s.z, s.y, s.w

        rho = b - A @ x - w                  # primal infeasibility
        normr = jnp.sqrt(rho @ rho)
        sigma = c - A.T @ y + z              # dual infeasibility
        if Q is not None:
            sigma = sigma - Q @ x            # QP stationarity: c-Qx-A'y+z
        norms = jnp.sqrt(sigma @ sigma)
        gamma = z @ x + y @ w                # duality gap

        if trace:
            pobj = c @ x + f
            if Q is not None:
                pobj = pobj - 0.5 * (x @ (Q @ x))
            jax.debug.callback(_trace_row, s.iter, pobj, normr,
                               b @ y + f, norms)

        optimal = (normr < eps) & (norms < eps) & (gamma < eps)
        # divergence-based detection the reference itself marks "(unreliable)"
        # (intpt.c:175-182); gated here by the residual still being above
        # tolerance so sub-eps jitter can't trigger a false certificate
        p_infeas = (normr > 10.0 * s.normr0) & (normr > eps)
        d_infeas = (norms > 10.0 * s.norms0) & (norms > eps)
        new_status = jnp.where(
            optimal, int(Status.OPTIMAL),
            jnp.where(p_infeas, int(Status.PRIMAL_INFEASIBLE),
                      jnp.where(d_infeas, int(Status.DUAL_INFEASIBLE),
                                int(Status.RUNNING))))

        def step(_):
            mu = delta * gamma / (n + m)
            D = z / x
            E = w / y
            L = kkt_factor(A, E, D, epsdiag, Q=Q)
            rhs_x = sigma - z + mu / x
            rhs_y = rho + w - mu / y
            dy, dx = kkt_solve(A, E, D, L, rhs_y, rhs_x, Q=Q,
                               epsdiag=epsdiag, refine_tol=refine_tol,
                               max_refine=max_refine)
            dz = mu / x - z - D * dx
            dw = mu / y - w - E * dy
            theta = _ratio_step(x, dx, z, dz, y, dy, w, dw, step_factor)
            return (x + theta * dx, z + theta * dz,
                    y + theta * dy, w + theta * dw)

        keep = new_status != int(Status.RUNNING)
        x2, z2, y2, w2 = jax.lax.cond(
            keep, lambda _: (x, z, y, w), step, operand=None)

        return IntptState(x2, z2, y2, w2, s.iter + 1, new_status,
                          normr, norms)

    out = jax.lax.while_loop(cond, body, state)
    status = jnp.where(out.status == int(Status.RUNNING),
                       int(Status.ITERATION_LIMIT), out.status)
    return status, out.x, out.y, out.w, out.z, out.iter
