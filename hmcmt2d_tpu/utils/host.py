"""Device-to-host transfers that survive runtimes without complex transfers.

The tunneled TPU runtime used in CI executes complex64 fine *inside* jitted
programs but cannot transfer complex buffers to the host
(``UNIMPLEMENTED: TPU backend error`` on ``np.asarray`` of a complex array;
repeated attempts can wedge the device).  :func:`to_host` therefore routes
complex arrays through a tiny jitted split into (real, imag) float pairs —
two ordinary float transfers — and recombines on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


def to_host(x) -> np.ndarray:
    """numpy copy of ``x``; complex device arrays go via an f32/f64 split."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "dtype") and jnp.iscomplexobj(x):
        re, im = _split(x)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(x)


def tree_to_host(tree):
    """``to_host`` over every leaf of a pytree."""
    return jax.tree_util.tree_map(to_host, tree)
