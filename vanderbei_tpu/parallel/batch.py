"""Instance batching: vmapped solves over padded size classes.

The netlib corpus spans 28..16k rows; batching requires a common padded
shape.  Problems are grouped into size classes (padded-dim buckets), each
class canonicalized with benign padding (core/canonicalize.py) and solved by
ONE vmapped, jitted while_loop — divergent per-instance iteration counts are
handled by the solvers' status masking (a converged lane no-ops its
updates), the run-to-fixpoint pattern from SURVEY.md section 7 hard part #3.

The batched IPM runs the same two-stage f32 -> f64 precision ladder as the
single-instance path (models/registry.py): stage 1 solves every lane in
pure f32 at MXU speed until each lane's mu crosses the stage boundary (the
vmapped while_loop runs until ALL lanes pause), stage 2 resumes the casted
states in f64 to the reference tolerance (hsd.c:24).

With a mesh, the stacked batch is sharded over the "batch" axis
(data parallelism over instances); A's column dim may additionally shard
over "model".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.canonicalize import canonicalize, CanonLP
from ..core.config import SolverConfig
from ..core.status import Status
from ..models import hsd as _hsd
from jax.sharding import NamedSharding, PartitionSpec as P


def _round_up(x: int, mult: int) -> int:
    return ((max(x, 1) + mult - 1) // mult) * mult


def size_class(canon_m: int, n: int, granularity: int = 128) -> tuple:
    """Bucket key: dims rounded up to the granularity."""
    return (_round_up(canon_m, granularity), _round_up(n, granularity))


def group_by_class(lps, granularity: int = 128):
    """Canonicalize each LP and bucket by padded shape.

    Returns {(mp, np): [(index, CanonLP), ...]} over the input order; LPs
    whose canonicalization aborts (free variables) are returned separately
    as [(index, status)].
    """
    classes: dict = {}
    aborted = []
    canons = []
    for idx, lp in enumerate(lps):
        canon = canonicalize(lp, pad_to=1)
        if canon.status != int(Status.RUNNING):
            aborted.append((idx, canon.status))
            continue
        key = size_class(canon.m, canon.n, granularity)
        classes.setdefault(key, []).append((idx, canon))
        canons.append(canon)
    return classes, aborted


def stack_class(entries, mp: int, np_: int, dtype=np.float64):
    """Stack a size class's canonical problems into (B, mp, np_) arrays."""
    B = len(entries)
    A = np.zeros((B, mp, np_), dtype=dtype)
    b = np.ones((B, mp), dtype=dtype)
    c = np.zeros((B, np_), dtype=dtype)
    for k, (_, canon) in enumerate(entries):
        m, n = canon.m, canon.n
        A[k, :m, :n] = canon.A[:m, :n]
        b[k, :m] = canon.b[:m]
        c[k, :n] = canon.c[:n]
    return A, b, c


def _run_batch(A, b, c, init, *, max_iter, eps, step_factor, beta,
               epsdiag, refine_tol, pause_mu, long_step, max_refine,
               factor_dtype):
    def one(Ai, bi, ci, st):
        return _hsd._hsd_loop(
            Ai, bi, ci, 0.0, st, max_iter=max_iter, eps=eps,
            step_factor=step_factor, beta=beta, epsdiag=epsdiag,
            refine_tol=refine_tol, pause_mu=pause_mu,
            long_step=long_step, max_refine=max_refine,
            factor_dtype=factor_dtype)
    return jax.vmap(one)(A, b, c, init)


def solve_batch_hsd(A, b, c, *,
                    max_iter: int = 200,
                    eps: float = 1.0e-12,
                    step_factor: float = 0.95,
                    long_step: bool = False,
                    beta: float = 0.80,
                    epsdiag: float = 1.0e-14,
                    refine_tol: float = 1.0e-10,
                    max_refine: int = 4,
                    precision: str = "mixed",
                    stage1_mu: float = 1.0e-4):
    """Two-stage vmapped HSD over a stacked class (B, mp, np_).

    Returns (status, x, y, w, z, iterations), each batched over B.
    """
    knobs = dict(max_iter=max_iter, eps=eps, step_factor=step_factor,
                 beta=beta, epsdiag=epsdiag, refine_tol=refine_tol,
                 long_step=long_step, max_refine=max_refine)
    if precision == "mixed":
        # the f32 sprint can't hit f64 refinement targets; relax them there
        knobs32 = dict(knobs, epsdiag=max(epsdiag, 1e-8),
                       refine_tol=max(refine_tol, 1e-4))
        A32 = A.astype(jnp.float32)
        st = jax.vmap(_hsd.init_state)(A32)
        st = _run_batch(A32, b.astype(jnp.float32), c.astype(jnp.float32),
                        st, pause_mu=stage1_mu, factor_dtype=None, **knobs32)
        st = _hsd.cast_state(st, jnp.float64)
        # lanes that went non-finite in f32 restart clean in f64
        finite = jnp.all(jnp.isfinite(st.x), axis=1) & jnp.isfinite(st.phi)
        fresh = jax.vmap(_hsd.init_state)(A.astype(jnp.float64))
        st = jax.tree.map(
            lambda warm, cold: jnp.where(
                finite.reshape((-1,) + (1,) * (warm.ndim - 1)), warm, cold),
            st, fresh)
        factor_dtype = None
    elif precision == "f32factor":
        st = jax.vmap(_hsd.init_state)(A)
        factor_dtype = jnp.float32
    else:
        st = jax.vmap(_hsd.init_state)(A)
        factor_dtype = None
    out = _run_batch(A, b, c, st, pause_mu=0.0, factor_dtype=factor_dtype,
                     **knobs)
    return jax.vmap(_hsd.finish_state, in_axes=(0, None))(out, max_iter)


def shard_batch(arrays, mesh, model_axis_dims=()):
    """Place stacked (B, ...) arrays on the mesh, batch-sharded.

    model_axis_dims: per-array tuple position (or None) to additionally
    shard over "model" — e.g. A's column dim.
    """
    out = []
    for i, arr in enumerate(arrays):
        spec = [None] * arr.ndim
        spec[0] = "batch"
        if i < len(model_axis_dims) and model_axis_dims[i] is not None:
            spec[model_axis_dims[i]] = "model"
        sharding = NamedSharding(mesh, P(*spec))
        out.append(jax.device_put(jnp.asarray(arr), sharding))
    return out


@functools.partial(jax.jit, static_argnames=("max_iter", "refresh_every"))
def solve_batch_pd(A, b, c, *, max_iter: int = 20000,
                   refresh_every: int = 64, seed: int = 0):
    """vmapped parametric self-dual simplex over a stacked class.

    Divergent pivot counts across the batch are handled by the chunked
    run-to-fixpoint loop (finished lanes no-op until the slowest converges).
    """
    from ..models.simplex import _pd_loop
    B, mp, np_ = A.shape
    eye = jnp.eye(mp, dtype=A.dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), B)

    def one(Ai, bi, ci, key):
        Afull = jnp.concatenate([Ai, eye], axis=1)
        return _pd_loop(Afull, bi, ci, key, max_iter=max_iter,
                        refresh_every=refresh_every)

    return jax.vmap(one)(A, b, c, keys)
