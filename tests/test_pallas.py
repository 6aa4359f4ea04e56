"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vanderbei_tpu.ops.pallas_kernels import (
    scaled_syrk_pallas, scaled_syrk_reference)


@pytest.mark.parametrize("m,n", [(256, 512), (128, 1024), (256, 256)])
def test_scaled_syrk_interpret(m, n):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    e = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    ref = scaled_syrk_reference(A, s, e)
    got = scaled_syrk_pallas(A, s, e, block_m=128, block_k=256,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_scaled_syrk_diagonal_only_on_diagonal():
    m, n = 128, 128
    A = jnp.zeros((m, n), jnp.float32)
    s = jnp.ones((n,), jnp.float32)
    e = jnp.arange(m, dtype=jnp.float32)
    got = np.asarray(scaled_syrk_pallas(A, s, e, block_m=128, block_k=128,
                                        interpret=True))
    np.testing.assert_allclose(got, np.diag(np.arange(m, dtype=np.float32)))
