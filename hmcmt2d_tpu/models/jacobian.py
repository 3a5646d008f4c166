"""Jacobian products and full Jacobians of the predicted data.

Parity surface for the reference's MTSensitivity layer: ``jtv`` replaces
``compJacTMatVec`` (compJacTMatVec.jl:8-329), ``jv`` the forward product, and
``full_jacobian`` replaces ``compJacMat``/``compJacTMat``
(compJacMat.jl:7-381, compJacTMat.jl:9-406).  All are thin autodiff wrappers
around the differentiable forward model — the receiver-side chain rule
(dataFuncSens.jl), the boundary-condition sensitivity (MT1DSensitivity.jl)
and the pseudo-forward adjoint solves all fall out of ``jax.vjp``/``jvp``
with the factorisation reuse provided by ``lax.custom_linear_solve``.

Complex data are handled as stacked real/imaginary parts, matching the
reference's real view of the misfit (0.5*re(r^H r)): J has shape
(2*ndata_complex, n_param) for impedance data and (ndata, n_param) for
rho/phase data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _real_stack(pred):
    if jnp.iscomplexobj(pred):
        return jnp.concatenate([jnp.real(pred), jnp.imag(pred)])
    return pred


def real_predict(problem, m):
    """Predicted data as a real vector (re parts then im parts)."""
    return _real_stack(problem.predict(m))


def jv(problem, m, v):
    """J @ v — directional derivative of the real data vector."""
    _, out = jax.jvp(lambda mm: real_predict(problem, mm), (m,), (v,))
    return out


def jtv(problem, m, w):
    """J' @ w — the adjoint product (one extra solve per (freq, mode)
    reusing the forward factorisation, as compJacTMatVec.jl:224,295)."""
    _, pull = jax.vjp(lambda mm: real_predict(problem, mm), m)
    return pull(w)[0]


def full_jacobian(problem, m):
    """Dense J (n_real_data x n_param) via reverse-mode rows — the
    sensitivity-test entry point (compJacMat.jl)."""
    return jax.jacrev(lambda mm: real_predict(problem, mm))(m)
