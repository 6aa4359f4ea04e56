"""Homogeneous self-dual interior-point methods.

Two variants sharing one jitted loop skeleton:

- "hsd": the reference ipo's default METHOD (src/ipo/hsd.c:27-311) —
  alternating predictor (delta=0 on even iterations) / corrector (delta=1 on
  odd), step factor 0.95, stop at mu < 1e-12 with status decided by the sign
  of phi vs psi and the objectives (hsd.c:155-176).
- "hsdls": the long-step variant (src/ipo/hsdls.c:37-293) — beta=0.8
  neighborhood, delta = 2(1-beta), per-coordinate quadratic linesearch
  keeping every product x_j z_j inside the beta-neighborhood
  (hsdls.c:296-336), extra status 7 (suboptimal/numerical).

The embedding solves max c'x, Ax <= b, x >= 0 homogenized with (phi, psi);
each iteration does ONE KKT factorization and TWO solves (the f- and
g-systems, hsd.c:220-231) combined through the dphi formula (hsd.c:230-238).
De-homogenization divides by phi at exit (hsd.c:277-284).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.status import Status
from ..ops.kkt import kkt_factor, kkt_solve

DEFAULT_MAX_ITER = 200      # hsd.c:25
DEFAULT_MAX_ITER_LS = 600   # hsdls.c:25

HSD_BANNER = (
    "--------------------------------------------------------------------------\n"
    "         |           Primal          |            Dual           |       |\n"
    "  Iter   |  Obj Value       Infeas   |  Obj Value       Infeas   |  mu   |\n"
    "- - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - - ")


def _trace_row(it, pobj, normr, dobj, norms, mu):
    """Host-side printer for one iteration row (hsd.c:206-208 format)."""
    print(f"{int(it):8d}   {float(pobj):14.7e}  {float(normr):8.1e}    "
          f"{float(dobj):14.7e}  {float(norms):8.1e}  {float(mu):8.1e}",
          flush=True)


class HsdState(NamedTuple):
    x: jax.Array
    z: jax.Array
    y: jax.Array
    w: jax.Array
    phi: jax.Array
    psi: jax.Array
    iter: jax.Array
    status: jax.Array


def _hsd_linesearch(v, dv, s, ds, beta, delta, mu):
    """Largest theta keeping (v+t*dv)(s+t*ds) >= (1-beta)*mu*(1+t(1-delta)...)

    Vectorized port of the quadratic-root logic in hsdls.c:296-336: solves
    a t^2 + b t + c = 0 elementwise with the reference's case analysis and
    returns +inf where any step is admissible.
    """
    a = dv * ds
    b = s * dv + v * ds + (1.0 - beta) * (1.0 - delta) * mu
    c = v * s - (1.0 - beta) * mu
    d = b * b - 4.0 * a * c
    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    inf = jnp.asarray(jnp.inf, v.dtype)

    lin = -c / b                                    # a == 0
    stable = 2.0 * c / (-b + sqrt_d)                # root avoiding cancellation
    classic = (-b - sqrt_d) / (2.0 * a)

    pos_a = jnp.where(b < 0.0, jnp.where(d >= 0.0, stable, inf), inf)
    neg_a = jnp.where(b < 0.0, stable, classic)
    return jnp.where(a == 0.0, lin, jnp.where(a > 0.0, pos_a, neg_a))


def init_state(A) -> HsdState:
    """All-ones homogeneous start (hsd.c:98-109)."""
    m, n = A.shape
    dtype = A.dtype
    one = jnp.ones((), dtype)
    return HsdState(jnp.ones((n,), dtype), jnp.ones((n,), dtype),
                    jnp.ones((m,), dtype), jnp.ones((m,), dtype),
                    one, one, jnp.asarray(0),
                    jnp.asarray(int(Status.RUNNING)))


def make_step(A, b, c, *,
              eps: float = 1.0e-12,
              step_factor: float = 0.95,
              long_step: bool = False,
              beta: float = 0.80,
              epsdiag: float = 1.0e-14,
              refine_tol: float = 1.0e-10,
              max_refine: int = 8,
              lu_fallback: bool = True,
              trace: bool = False,
              f: float = 0.0,
              factor_dtype: str = "f64",
              hybrid_mu: float = 1.0e-4):
    """Build the single-iteration step function state -> state.

    This is the framework's flagship 'forward step': one KKT factorization,
    two solves, the dphi combination, the ratio test/linesearch, and the
    update — everything inside one jit-compatible function, reusable by the
    while_loop driver, vmapped batching, and the mesh dry-run.
    """
    m, n = A.shape
    dtype = A.dtype
    ls_delta = 2.0 * (1.0 - beta)               # hsdls.c:113

    def body(s: HsdState):
        x, z, y, w, phi, psi = s.x, s.z, s.y, s.w, s.phi, s.psi

        mu = (z @ x + w @ y + phi * psi) / (n + m + 1)
        if long_step:
            delta = jnp.asarray(ls_delta, dtype)
        else:
            delta = jnp.where(s.iter % 2 == 0, 0.0, 1.0)  # hsd.c:138-142

        primal_obj = c @ x
        dual_obj = b @ y

        # stopping rule (hsd.c:155-176 / hsdls.c:134-154)
        converged = mu < eps
        if long_step:
            opt_test = phi > eps
        else:
            opt_test = phi > psi
        fallback = int(Status.SUBOPTIMAL) if long_step else int(Status.DUAL_INFEASIBLE)
        final = jnp.where(
            opt_test, int(Status.OPTIMAL),
            jnp.where(dual_obj < 0.0, int(Status.PRIMAL_INFEASIBLE),
                      jnp.where(primal_obj > 0.0, int(Status.DUAL_INFEASIBLE),
                                fallback)))
        new_status = jnp.where(converged, final, int(Status.RUNNING))

        # infeasibilities (hsd.c:182-198); computed before stepping, in the
        # reference's order, so the trace row matches its table
        rho = A @ x - b * phi + w
        sigma = -(A.T @ y) + c * phi + z

        if trace:
            normr = jnp.sqrt(rho @ rho) / phi
            norms = jnp.sqrt(sigma @ sigma) / phi
            jax.debug.callback(
                _trace_row, s.iter, primal_obj / phi + f, normr,
                dual_obj / phi + f, norms, mu)

        def step(_):
            # Newton rhs folding (hsd.c:188-200)
            rho_rhs = -(1.0 - delta) * rho + w - delta * mu / y
            sigma_rhs = -(1.0 - delta) * sigma + z - delta * mu / x
            gamma = (-(1.0 - delta) * (dual_obj - primal_obj + psi)
                     + psi - delta * mu / phi)

            D = z / x
            E = w / y

            def solve_dirs(fd, fallback):
                fac = kkt_factor(A, E, D, epsdiag, factor_dtype=fd)
                fy, fx = kkt_solve(A, E, D, fac, rho_rhs, -sigma_rhs,
                                   epsdiag=epsdiag, refine_tol=refine_tol,
                                   max_refine=max_refine,
                                   lu_fallback=fallback)
                gy, gx = kkt_solve(A, E, D, fac, -b, -c,
                                   epsdiag=epsdiag, refine_tol=refine_tol,
                                   max_refine=max_refine,
                                   lu_fallback=fallback)
                return fy, fx, gy, gx

            if factor_dtype == "f32":
                fy, fx, gy, gx = solve_dirs(jnp.float32, lu_fallback)
            elif factor_dtype == "hybrid":
                # MXU-speed f32 factor while far from the central path's
                # end; full-precision factor once mu is small (the regime
                # where direction accuracy limits convergence)
                fy, fx, gy, gx = jax.lax.cond(
                    mu > hybrid_mu,
                    lambda _: solve_dirs(jnp.float32, False),
                    lambda _: solve_dirs(None, lu_fallback),
                    operand=None)
            else:
                fy, fx, gy, gx = solve_dirs(None, lu_fallback)

            dphi = ((c @ fx - b @ fy + gamma)
                    / (c @ gx - b @ gy - psi / phi))   # hsd.c:230-231
            dx = fx - gx * dphi
            dy = fy - gy * dphi
            dz = delta * mu / x - z - D * dx
            dw = delta * mu / y - w - E * dy
            dpsi = delta * mu / phi - psi - (psi / phi) * dphi

            if long_step:
                theta = jnp.minimum(
                    jnp.min(_hsd_linesearch(x, dx, z, dz, beta, delta, mu)),
                    jnp.min(_hsd_linesearch(y, dy, w, dw, beta, delta, mu)))
                theta = jnp.minimum(
                    theta,
                    _hsd_linesearch(phi, dphi, psi, dpsi, beta, delta, mu))
                theta = jnp.minimum(theta, 1.0)
                theta = jnp.where(theta < 1.0, theta * 0.9999, theta)
            else:
                t = jnp.maximum(jnp.max(-dx / x), jnp.max(-dz / z))
                t = jnp.maximum(t, jnp.max(-dy / y))
                t = jnp.maximum(t, jnp.max(-dw / w))
                t = jnp.maximum(t, -dphi / phi)
                t = jnp.maximum(t, -dpsi / psi)
                theta = jnp.where(t > 0.0,
                                  jnp.minimum(step_factor / t, 1.0), 1.0)

            return (x + theta * dx, z + theta * dz,
                    y + theta * dy, w + theta * dw,
                    phi + theta * dphi, psi + theta * dpsi)

        keep = new_status != int(Status.RUNNING)
        x2, z2, y2, w2, phi2, psi2 = jax.lax.cond(
            keep, lambda _: (x, z, y, w, phi, psi), step, operand=None)

        return HsdState(x2, z2, y2, w2, phi2, psi2, s.iter + 1, new_status)

    return body


@functools.partial(
    jax.jit,
    static_argnames=("max_iter", "eps", "step_factor", "long_step", "beta",
                     "epsdiag", "refine_tol", "max_refine", "lu_fallback",
                     "trace", "factor_dtype", "hybrid_mu"),
)
def solve_canon(A, b, c, f, *,
                max_iter: int = DEFAULT_MAX_ITER,
                eps: float = 1.0e-12,
                step_factor: float = 0.95,
                long_step: bool = False,
                beta: float = 0.80,
                epsdiag: float = 1.0e-14,
                refine_tol: float = 1.0e-10,
                max_refine: int = 8,
                lu_fallback: bool = True,
                trace: bool = False,
                factor_dtype: str = "f64",
                hybrid_mu: float = 1.0e-4):
    """Solve max c'x, Ax <= b, x >= 0 via the HSD embedding.

    Returns (status, x, y, w, z, iterations) with x,y,w,z de-homogenized.
    """
    body = make_step(A, b, c, eps=eps, step_factor=step_factor,
                     long_step=long_step, beta=beta, epsdiag=epsdiag,
                     refine_tol=refine_tol, max_refine=max_refine,
                     lu_fallback=lu_fallback, trace=trace, f=f,
                     factor_dtype=factor_dtype, hybrid_mu=hybrid_mu)

    def cond(s: HsdState):
        return (s.status == int(Status.RUNNING)) & (s.iter < max_iter)

    out = jax.lax.while_loop(cond, body, init_state(A))
    status = jnp.where(out.status == int(Status.RUNNING),
                       int(Status.ITERATION_LIMIT), out.status)
    # de-homogenize (hsd.c:277-284)
    phi = out.phi
    return (status, out.x / phi, out.y / phi, out.w / phi, out.z / phi,
            out.iter)
