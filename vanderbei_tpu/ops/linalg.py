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


# Threshold above which f64 products against a matrix go through the
# column-chunked scan: TPU f64 gemms are emulated via bf16 split passes,
# and XLA materializes the split stacks of the WHOLE operand as HLO temps
# (4x bf16 + 8x f32 partials) — a 6144x13824 f64 operand costs ~17 GB of
# temps, OOMing the 16 GB chip at compile (evaluate/r4/
# XL_CRASH_ROOTCAUSE.md).  Chunking bounds the temps to one chunk's.
CHUNKED_MATVEC_MIN_ELEMS = 30_000_000
_CHUNK = 2048


def _chunk_count(dim: int) -> int | None:
    """Largest chunk <= _CHUNK that divides dim (padded dims are 128/512
    multiples, so one exists); None if dim itself is small."""
    if dim <= _CHUNK:
        return None
    for c in (_CHUNK, 1024, 512, 256, 128):
        if dim % c == 0:
            return c
    return None


def chunked_matvec(A, v):
    """A @ v with A's columns processed in chunks via lax.scan.

    Semantically identical to A @ v (full f64 accuracy — each chunk is a
    true f64 gemm, partials accumulate in f64); bounds the f64-emulation
    split-stack temps to one (m, chunk) slice.  v may be (n,) or (n, k).
    """
    m, n = A.shape
    c = _chunk_count(n)
    if c is None or A.size < CHUNKED_MATVEC_MIN_ELEMS:
        return A @ v
    nb = n // c
    Ab = A.reshape(m, nb, c)
    vb = v.reshape(nb, c, *v.shape[1:])

    def step(acc, ops):
        Ak, vk = ops
        return acc + Ak @ vk, None

    zero = jnp.zeros((m,) + v.shape[1:], jnp.result_type(A, v))
    out, _ = jax.lax.scan(step, zero, (jnp.moveaxis(Ab, 1, 0), vb))
    return out


def chunked_rmatvec(A, v):
    """A.T @ v with A's rows processed in chunks (see chunked_matvec)."""
    m, n = A.shape
    c = _chunk_count(m)
    if c is None or A.size < CHUNKED_MATVEC_MIN_ELEMS:
        return A.T @ v
    mb = m // c
    Ab = A.reshape(mb, c, n)
    vb = v.reshape(mb, c, *v.shape[1:])

    def step(acc, ops):
        Ak, vk = ops
        return acc + Ak.T @ vk, None

    zero = jnp.zeros((n,) + v.shape[1:], jnp.result_type(A, v))
    out, _ = jax.lax.scan(step, zero, (Ab, vb))
    return out
