"""Pallas TPU kernels for the hot dense ops.

The FLOPs-dominant operation of the IPM path is the normal-equations
assembly M = A diag(s) A' + diag(e) (the dense counterpart of the
reference's per-iteration K assembly + lltnum, ldlt.c:243-282, 517-636).
XLA already emits a good syrk for (A*s)@A.T but materializes the scaled
copy of A in HBM; the Pallas kernel fuses the column scaling into the
MXU matmul's operand load and the diagonal add into the epilogue — one
pass over A per output tile, accumulation in f32 on the MXU.

`scaled_syrk` dispatches to the kernel on TPU and to a jnp reference
implementation elsewhere (also used by the unit tests via interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def scaled_syrk_reference(A, s, e):
    """M = A diag(s) A' + diag(e) — plain jnp (CPU / fallback)."""
    M = (A * s[None, :]) @ A.T
    return M + jnp.diag(e)


def _syrk_kernel(a1_ref, a2_ref, s_ref, e_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a1 = a1_ref[:] * s_ref[:]            # fused column scaling (VPU)
    partial = jax.lax.dot_general(
        a1, a2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += partial

    @pl.when((k == nk - 1) & (i == j))
    def _():
        tm = out_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
        # e_ref is (1, tm): broadcasts over rows, so the (i,i) entry
        # picks up e[i] exactly on the diagonal
        out_ref[:] += jnp.where(rows == cols, e_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("block_m", "block_k",
                                             "interpret"))
def scaled_syrk_pallas(A, s, e, *, block_m: int = 512, block_k: int = 512,
                       interpret: bool = False):
    """Tiled Pallas scaled-syrk (f32 accumulate).

    A: (m, n) f32; s: (n,) f32 column scales; e: (m,) f32 diagonal add.
    Dimensions must be multiples of the block sizes (callers pad — the
    canonicalizer's benign padding already tiles to 128).
    """
    m, n = A.shape
    bm = min(block_m, m)
    bk = min(block_k, n)
    assert m % bm == 0 and n % bk == 0, (m, n, bm, bk)
    s2 = s.reshape(1, n)
    e2 = e.reshape(1, m)

    grid = (m // bm, m // bm, n // bk)
    return pl.pallas_call(
        _syrk_kernel,
        out_shape=jax.ShapeDtypeStruct((m, m), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, bk), lambda i, j, k: (j, k),
                             memory_space=pltpu.VMEM),
                # (k - k) is an i32 zero derived from the program id: a bare
                # Python 0 traces as i64 under jax_enable_x64 (Mosaic rejects
                # the mixed tuple) and index maps may not capture tracers
                pl.BlockSpec((1, bk), lambda i, j, k: (k - k, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm), lambda i, j, k: (i - i, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bm), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * m * n,
            bytes_accessed=4 * (2 * m * n + m * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, A, s2, e2)


def scaled_syrk(A, s, e, *, interpret: bool = False):
    """M = A diag(s) A' + diag(e), Pallas on TPU, jnp elsewhere.

    Set VANDERBEI_NO_PALLAS=1 to force the jnp path everywhere (crash
    bisection / fallback guard)."""
    import os
    if os.environ.get("VANDERBEI_NO_PALLAS"):
        return scaled_syrk_reference(A, s, e)
    if jax.default_backend() != "tpu" and not interpret:
        return scaled_syrk_reference(A, s, e)
    m, n = A.shape
    if m % 128 or n % 128:
        return scaled_syrk_reference(A, s, e)
    if m > 2048 or n > 4096:
        # round-2 bisection: the remote TPU worker died ("kernel fault")
        # compiling/running this kernel at >=2048-class shapes, and at
        # those sizes the syrk is compute-bound anyway so the fused
        # scaling saves little — XLA's syrk takes over above the cutoff
        return scaled_syrk_reference(A, s, e)

    def pick(dim, prefs):
        for p in prefs:
            if dim % p == 0:
                return p
        return 128

    A = A.astype(jnp.float32)
    return scaled_syrk_pallas(A, s.astype(jnp.float32),
                              e.astype(jnp.float32),
                              block_m=pick(m, (256, 128)),
                              block_k=pick(n, (512, 256, 128)),
                              interpret=interpret)
