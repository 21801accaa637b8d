"""Sliding-window minimum as ``lax.reduce_window``.

Direct TPU analog of the reference's monotonic-deque sliding minimum
(misnamed ``RMQ``, reference ``src/MakeBloomFilter.cpp:8-22``): for window
width ``w`` over a vector ``v`` it yields ``out[j] = min(v[j : j+w])`` with
``len(out) = len(v) - w + 1``.  The deque is inherently sequential; XLA's
``reduce_window`` runs the same reduction as a data-parallel windowed min
over the whole read batch at once.

Used to turn per-position short-k-mer counts into a conservative coverage
estimate per large k-mer (reference ``src/MakeBloomFilter.cpp:62``):
window width = ``k - short_k + 1``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["window_min"]

_INT32_MAX = np.int32(2**31 - 1)


def window_min(values: jnp.ndarray, window: int) -> jnp.ndarray:
    """Windowed min over the last axis, VALID padding.

    values: ``[..., P]`` int32; returns ``[..., P - window + 1]``.
    """
    assert window >= 1
    if window == 1:
        return values
    ndim = values.ndim
    dims = (1,) * (ndim - 1) + (window,)
    strides = (1,) * ndim
    return jax.lax.reduce_window(
        values, _INT32_MAX, jax.lax.min, dims, strides, padding="VALID"
    )
