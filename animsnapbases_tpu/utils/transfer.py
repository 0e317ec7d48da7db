"""Device->host transfer helpers.

Large single fetches degrade badly on tunneled TPU hosts (measured on the
axon link: ~30 MB/s up to ~32 MB per fetch, collapsing to ~2 MB/s for
100+ MB pulls).  ``to_host_chunked`` slices the leading axis into <=24 MB
pieces so big basis tensors come back at the link's full rate.
"""

from __future__ import annotations

import numpy as np

_CHUNK_BYTES = 24 << 20


def to_host_chunked(x, max_bytes: int = _CHUNK_BYTES) -> np.ndarray:
    """np.asarray(x) in leading-axis chunks of at most ``max_bytes``."""
    nbytes = int(np.prod(x.shape)) * x.dtype.itemsize
    if nbytes <= max_bytes or x.ndim == 0 or x.shape[0] <= 1:
        return np.asarray(x)
    row_bytes = max(nbytes // x.shape[0], 1)
    rows = max(int(max_bytes // row_bytes), 1)
    out = np.empty(x.shape, dtype=x.dtype)
    for start in range(0, x.shape[0], rows):
        out[start:start + rows] = np.asarray(x[start:start + rows])
    return out
