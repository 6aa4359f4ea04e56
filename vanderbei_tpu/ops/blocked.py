"""Blocked Cholesky + triangular solves built from matmuls.

Why this exists: TPUs have no native f64 ALU — XLA emulates f64 *matmuls*
efficiently (double-word passes through the MXU, ~hundreds of GFLOP/s) but
lowers `jnp.linalg.cholesky` / `triangular_solve` in f64 to scalar-emulated
sequential loops that run ~1000x slower than their f32 twins (measured on
v5e: 7x512x512 f64 Cholesky 355 ms vs 1 ms in f32).  The reference leans on
LAPACK-class f64 (src/ipo/ldlt.c); the TPU-first substitute is this module:
a right-looking blocked factorization whose O(n^3) bulk is plain f64 gemms,
with only O(n) thin sequential work:

- diagonal blocks: an unblocked fori_loop Cholesky (bs steps of O(bs^2)
  vector ops — cheap at any precision);
- diagonal-block inverses: Newton iteration X <- X(2I - LX), which for a
  triangular L is EXACT after ceil(log2(bs)) squarings (the residual
  I - LX is strictly-lower, hence nilpotent) — log2(bs) small gemms
  instead of a sequential triangular solve;
- panels/updates/solves: gemms.

The factor is returned as (Loff, Winv): L with its block diagonal zeroed,
plus the per-block inverses.  Forward/backward substitution then needs NO
triangular-solve primitive at all — each of the n/bs steps is one gemm and
one (bs x bs) matmul, so multi-rhs solves ride the MXU too.

Everything is vmap-compatible (pure jnp + lax loops) and used for both the
batched netlib classes and the single large-problem path (ops/kkt.py picks
it for f64 on TPU).  Matrices whose dim is not a block multiple are padded
with an identity diagonal (benign: padding decouples exactly).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class BlockedFactor(NamedTuple):
    Loff: jax.Array   # (n, n) lower-triangular factor, block diagonal zeroed
    Winv: jax.Array   # (nb, bs, bs) inverses of the diagonal blocks of L


def _chol_unblocked(Akk):
    """Cholesky of one (bs, bs) SPD block by bs sequential rank-1 steps.

    O(bs) steps of O(bs^2) elementwise work — the only genuinely sequential
    scalar math in the factorization.  A non-SPD pivot yields sqrt(<0) =
    NaN, propagating exactly like jnp.linalg.cholesky so callers' NaN-retry
    (Tikhonov escalation, ops/kkt.py) works unchanged."""
    bs = Akk.shape[-1]
    idx = jnp.arange(bs)

    def step(j, carry):
        A, L = carry
        d = jnp.sqrt(A[j, j])
        colj = jnp.where(idx >= j, A[:, j] / d, jnp.zeros((), A.dtype))
        L = jnp.where(idx[None, :] == j, colj[:, None], L)
        A = A - colj[:, None] * colj[None, :]
        return A, L

    _, L = lax.fori_loop(0, bs, step, (Akk, jnp.zeros_like(Akk)))
    return L


def _tri_inv(Lkk):
    """Inverse of a lower-triangular (bs, bs) block via Newton squaring.

    X <- X (2I - L X) doubles the correct nilpotent depth each step: with
    X0 = diag(1/diag(L)), the residual I - L X0 is strictly lower
    triangular, so ceil(log2(bs)) iterations reach the exact inverse —
    all gemms, no sequential substitution."""
    bs = Lkk.shape[-1]
    eye2 = 2.0 * jnp.eye(bs, dtype=Lkk.dtype)
    X = jnp.diag(1.0 / jnp.diagonal(Lkk))
    for _ in range(max(1, math.ceil(math.log2(bs)))):
        X = X @ (eye2 - Lkk @ X)
    return X


def _pad_spd(M, bs):
    """Pad M to a block multiple with an identity diagonal (decoupled)."""
    n = M.shape[-1]
    npad = (-n) % bs
    if npad == 0:
        return M, n
    Mp = jnp.zeros(M.shape[:-2] + (n + npad, n + npad), M.dtype)
    Mp = Mp.at[..., :n, :n].set(M)
    Mp = Mp.at[..., n:, n:].add(jnp.eye(npad, dtype=M.dtype))
    return Mp, n


def default_block(n: int) -> int:
    """Block size heuristic, measured on v5e (7x512x512 f64 factor):
    bs=64 190 ms, bs=128 40 ms, bs=256 47 ms — per-outer-step overhead
    dominates below 128, update-gemm waste above.  128 wins broadly; 256
    only for very large n where panel gemms want the extra width."""
    if n <= 128:
        return min(n, 64)
    if n <= 4096:
        return 128
    return 256


def blocked_cholesky(M, block: int | None = None) -> BlockedFactor:
    """Right-looking blocked Cholesky of SPD M; all bulk work is gemms.

    Returns BlockedFactor sized to the padded dim; blocked_cho_solve
    understands the padding.  NaNs propagate on indefinite input (for the
    caller's escalation loop)."""
    n_in = M.shape[-1]
    bs = block or default_block(n_in)
    M, _ = _pad_spd(M, bs)
    n = M.shape[-1]
    nb = n // bs

    def step(kb, carry):
        A, L, W = carry
        r = kb * bs
        Akk = lax.dynamic_slice(A, (r, r), (bs, bs))
        Lkk = _chol_unblocked(Akk)
        Wkk = _tri_inv(Lkk)
        colA = lax.dynamic_slice(A, (0, r), (n, bs))
        # panel = colA @ Wkk': rows above r are zero (already eliminated),
        # the diagonal rows reproduce Lkk exactly (Lkk Lkk' Wkk' = Lkk),
        # rows below are the L21 panel
        panel = colA @ Wkk.T
        L = lax.dynamic_update_slice(L, panel, (0, r))
        W = lax.dynamic_update_slice(W, Wkk[None], (kb, 0, 0))
        # full-width symmetric update zeroes the eliminated row/col block
        # and downdates the trailing matrix in one gemm
        A = A - panel @ panel.T
        return A, L, W

    L0 = jnp.zeros_like(M)
    W0 = jnp.zeros((nb, bs, bs), M.dtype)
    _, L, W = lax.fori_loop(0, nb, step, (M, L0, W0))
    # zero the block diagonal: solves use Winv for it, and a unified
    # (Loff, Winv) representation needs no triangular-solve primitive
    blk = jnp.arange(n) // bs
    off = blk[:, None] != blk[None, :]
    return BlockedFactor(jnp.where(off, L, jnp.zeros((), L.dtype)), W)


def blocked_chol_dense(M, block: int | None = None):
    """Convenience: the conventional dense L (diag blocks restored), for
    parity tests against jnp.linalg.cholesky."""
    fac = blocked_cholesky(M, block)
    nb, bs, _ = fac.Winv.shape
    Ldiag = jax.vmap(_tri_inv)(fac.Winv)   # inverse of inverse = Lkk
    n = nb * bs
    full = fac.Loff
    for kb in range(nb):
        full = lax.dynamic_update_slice(full, Ldiag[kb], (kb * bs, kb * bs))
    return full[..., :M.shape[-1], :M.shape[-1]]


def blocked_cho_solve(fac: BlockedFactor, t):
    """Solve (L L') u = t for column-stacked t (n, k) via block
    substitution — every step is a gemm against Loff plus a (bs, bs)
    matmul with the stored diagonal-block inverse."""
    nb, bs, _ = fac.Winv.shape
    n = nb * bs
    n_in, k = t.shape
    if n_in != n:
        tp = jnp.zeros((n, k), t.dtype).at[:n_in, :].set(t)
    else:
        tp = t
    Loff = fac.Loff

    def fwd(kb, y):
        r = kb * bs
        rowL = lax.dynamic_slice(Loff, (r, 0), (bs, n))
        tk = lax.dynamic_slice(tp, (r, 0), (bs, k))
        yk = fac.Winv[kb] @ (tk - rowL @ y)
        return lax.dynamic_update_slice(y, yk, (r, 0))

    y = lax.fori_loop(0, nb, fwd, jnp.zeros((n, k), t.dtype))

    def bwd(i, x):
        kb = nb - 1 - i
        r = kb * bs
        colL = lax.dynamic_slice(Loff, (0, r), (n, bs))
        yk = lax.dynamic_slice(y, (r, 0), (bs, k))
        xk = fac.Winv[kb].T @ (yk - colL.T @ x)
        return lax.dynamic_update_slice(x, xk, (r, 0))

    x = lax.fori_loop(0, nb, bwd, jnp.zeros((n, k), t.dtype))
    return x[:n_in, :]
