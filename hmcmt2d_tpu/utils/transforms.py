"""Model parameterisation transforms and active-cell machinery.

Equivalents of the reference's HMCUtility layer
(HMCMT/src/HMCUtility/HMCUtility.jl): log-conductivity transform
(modelTransform, :69-77), the bounded sigmoid variant of Kim & Kim 2011
(:114-138) with its inverse (:150-158), and fixed/active cell selection
(setActiveElement, :217-258).  Transforms are plain differentiable functions
(no explicit diagonal Jacobians — autodiff supplies them).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def model_transform(m):
    """log-conductivity -> linear conductivity (HMCUtility.jl:69-77)."""
    return jnp.exp(m)


def model_transform_bounded(m, sig_lb, sig_ub, cp: float = 2.0):
    """Bounded sigmoid transform sigma = (a + b*exp(cp*m)) / (1 + exp(cp*m))
    (HMCUtility.jl:114-138; currently unused by the reference's call sites
    but part of its public surface)."""
    e = jnp.exp(cp * m)
    return (sig_lb + sig_ub * e) / (1.0 + e)


def bounded_model(sigma, sig_lb, sig_ub, cp: float = 2.0):
    """Inverse of :func:`model_transform_bounded` (HMCUtility.jl:150-158)."""
    return jnp.log((sigma - sig_lb) / (sig_ub - sigma)) / cp


def active_cells(sigma_flat: np.ndarray, sigma_fixed, fix_index=None):
    """Split cells into inversion-active and fixed-background sets.

    Cells whose conductivity exactly equals any value in ``sigma_fixed`` (air
    at 1e-8 S/m is always included by the reference's startup reader,
    readstartupFile.jl:17) are frozen; optional explicit ``fix_index`` adds
    more.  Returns (active_idx, bg_flat) with ``bg_flat`` holding the frozen
    conductivities and zeros on active cells (setActiveElement,
    HMCUtility.jl:217-258).
    """
    sigma_flat = np.asarray(sigma_flat)
    inactive = np.zeros(sigma_flat.shape, bool)
    for sf in np.atleast_1d(sigma_fixed):
        inactive |= sigma_flat == sf
    if fix_index is not None and len(fix_index):
        inactive[np.asarray(fix_index, int)] = True
    bg = np.where(inactive, sigma_flat, 0.0)
    active_idx = np.nonzero(~inactive)[0]
    return active_idx, bg


def scatter_active(values, active_idx, n_cell: int):
    """Inject active-cell values (..., n_active) into a flat cell vector
    (..., n_cell), zeros elsewhere: the product ``activeCell * v`` of the
    reference; leading batch (chain) axes pass through."""
    out = jnp.zeros(values.shape[:-1] + (n_cell,), values.dtype)
    return out.at[..., jnp.asarray(active_idx)].set(values)
