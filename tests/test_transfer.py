"""Chunked device->host transfer helper."""

import numpy as np
import jax.numpy as jnp

from animsnapbases_tpu.utils.transfer import to_host_chunked


def test_small_array_single_fetch():
    x = jnp.asarray(np.arange(12.0).reshape(3, 4))
    np.testing.assert_array_equal(to_host_chunked(x),
                                  np.arange(12.0).reshape(3, 4))


def test_large_array_chunked_equals_direct():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4096, 7)).astype(np.float32)
    xj = jnp.asarray(x)
    out = to_host_chunked(xj, max_bytes=8 * 7 * 4)   # ~8 rows per chunk
    np.testing.assert_array_equal(out, x)
    assert out.dtype == x.dtype


def test_scalar_and_single_row():
    assert to_host_chunked(jnp.asarray(3.5)) == 3.5
    x = np.ones((1, 100000), np.float64)
    np.testing.assert_array_equal(to_host_chunked(jnp.asarray(x), 16), x)
