"""Dense linear-algebra helpers portable across TPU/CPU.

TPU's XLA implements Cholesky, QR and triangular_solve for f64 but NOT LU
(`LuDecomposition` is F32/C64-only), so generic square solves here go
through Householder QR — backward-stable, MXU-friendly, and f64-clean on
TPU.  This is the framework-wide replacement for anything that would have
been `jnp.linalg.solve`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qr_solve(A, B):
    """Solve A X = B for square A via QR (TPU-safe at f64).

    B may be a vector or a matrix.
    """
    q, r = jnp.linalg.qr(A)
    vec = B.ndim == 1
    rhs = q.T @ (B[:, None] if vec else B)
    X = jax.lax.linalg.triangular_solve(
        r, rhs, left_side=True, lower=False)
    return X[:, 0] if vec else X


def inv_qr(A):
    """Dense inverse via QR (used for the simplex basis-inverse refresh)."""
    return qr_solve(A, jnp.eye(A.shape[0], dtype=A.dtype))
