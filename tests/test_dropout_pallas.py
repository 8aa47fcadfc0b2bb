"""Hardware-PRNG dropout mask.

The TPU-PRNG path cannot be validated on CPU (the mosaic interpreter returns
degenerate random bits), so CPU tests cover the threefry fallback and shape
handling; the real-TPU distribution check lives in the benchmark drive
(validated on v5e: rejection rate matches `omit` within 1%).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_sednn.ops.dropout_pallas import dropout_mask_pallas


def test_fallback_distribution_and_determinism():
    assert jax.default_backend() == "cpu"  # conftest forces this
    for omit in (0.1, 0.5):
        m = np.asarray(dropout_mask_pallas(jnp.int32(42), (256, 1024), omit))
        assert set(np.unique(m)) <= {0.0, 1.0}
        assert abs((1.0 - m.mean()) - omit) < 0.01
    a = np.asarray(dropout_mask_pallas(jnp.int32(7), (64, 256), 0.2))
    b = np.asarray(dropout_mask_pallas(jnp.int32(7), (64, 256), 0.2))
    c = np.asarray(dropout_mask_pallas(jnp.int32(8), (64, 256), 0.2))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_fallback_unaligned_shape():
    m = np.asarray(dropout_mask_pallas(jnp.int32(1), (100, 1548), 0.1))
    assert m.shape == (100, 1548)
    assert abs((1.0 - m.mean()) - 0.1) < 0.02
