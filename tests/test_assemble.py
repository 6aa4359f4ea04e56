"""Device-side COO assembly (ops/assemble) — exactness + fallbacks."""

import numpy as np
import jax.numpy as jnp
import pytest

from vanderbei_tpu.ops import assemble


def _rand_sparse(m, n, density, seed):
    rng = np.random.default_rng(seed)
    A = np.zeros((m, n))
    k = int(density * m * n)
    r = rng.integers(0, m, k)
    c = rng.integers(0, n, k)
    A[r, c] = rng.standard_normal(k)
    return A


def test_device_dense_exact():
    A = _rand_sparse(130, 70, 0.05, 0)
    out = np.asarray(assemble.device_dense(A))
    np.testing.assert_array_equal(out, A)


def test_device_dense_padded():
    A = _rand_sparse(130, 70, 0.05, 1)
    out = np.asarray(assemble.device_dense(A, mp=256, np_=128))
    assert out.shape == (256, 128)
    np.testing.assert_array_equal(out[:130, :70], A)
    assert not out[130:, :].any() and not out[:, 70:].any()


def test_device_dense_dense_fallback():
    # near-dense: COO wire encoding loses; must ship dense, same result
    A = np.arange(64 * 32, dtype=np.float64).reshape(64, 32) + 1.0
    assert not assemble.coo_worthwhile(int(np.count_nonzero(A)), 64, 32)
    out = np.asarray(assemble.device_dense(A))
    np.testing.assert_array_equal(out, A)


def test_device_dense_batch_exact():
    blocks = [_rand_sparse(100, 60, 0.04, s) for s in range(4)]
    out = np.asarray(assemble.device_dense_batch(blocks, 4, 128, 64))
    assert out.shape == (4, 128, 64)
    for j, blk in enumerate(blocks):
        np.testing.assert_array_equal(out[j, :100, :60], blk)


def test_nnz_class_padding_is_benign():
    # padding triples add 0.0 at (0, 0) under scatter-ADD: entry (0, 0)
    # must keep its true value
    A = np.zeros((32, 32))
    A[0, 0] = 3.5
    A[5, 7] = -1.25
    out = np.asarray(assemble.device_dense(A))
    assert out[0, 0] == 3.5 and out[5, 7] == -1.25


def test_to_coo_extra_triples():
    A = np.zeros((8, 8))
    A[1, 2] = 2.0
    vals, rows, cols = assemble.to_coo(A, extra_rows=[3], extra_cols=[4],
                                       extra_vals=[7.0])
    M = np.asarray(assemble._densify(jnp.asarray(vals), jnp.asarray(rows),
                                     jnp.asarray(cols), 8, 8))
    assert M[1, 2] == 2.0 and M[3, 4] == 7.0
