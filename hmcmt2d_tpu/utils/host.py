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


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (jit programs here compile in
    minutes; the cache turns reruns of the driver/bench into sub-second
    loads).  Safe no-op if the backend rejects it.  Call BEFORE the first
    jit execution."""
    import os

    if path is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def real_dtype(dtype) -> np.dtype:
    """Real counterpart of a (possibly complex) dtype, computed HOST-SIDE.

    Never issues a device op — ``jnp.real(jnp.zeros((), dtype))`` executes an
    eager complex op, which this tunneled TPU runtime cannot run outside jit
    (``UNIMPLEMENTED``); that pattern crashed the round-2 benchmark.  Use this
    everywhere a real dtype is derived from a solve dtype.
    """
    return np.zeros(0, np.dtype(dtype)).real.dtype


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


@jax.jit
def _join(re, im):
    from jax import lax

    return lax.complex(re, im)


def from_host(x):
    """Device array from numpy; complex arrays go via two real transfers +
    an in-jit ``lax.complex`` (the reverse of :func:`to_host` — eager
    complex host->device ``device_put`` is UNIMPLEMENTED on this runtime)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        rdt = real_dtype(x.dtype)
        return _join(jnp.asarray(x.real.astype(rdt)),
                     jnp.asarray(x.imag.astype(rdt)))
    return jnp.asarray(x)


def tree_from_host(tree):
    """``from_host`` over every leaf of a pytree."""
    return jax.tree_util.tree_map(from_host, tree)
