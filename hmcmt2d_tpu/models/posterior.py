"""Inverse problem definition: data misfit + smoothness prior on log-sigma.

Equivalent of the reference's ``InvDataModel``/``setupInverseDataModel``
(HMCStruct.jl:75-125) and the misfit/gradient assembly of
``compDataGradient``/``getHamiltonian`` (HMCSampler.jl:277-348,358-397) —
except the gradient of everything (misfit through the PDE solves, boundary
conditions, receiver corrections, and the prior) is one ``jax.value_and_grad``
instead of the reference's hand-rolled adjoint chain.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import mesh as M
from ..utils import transforms as T
from .forward import ForwardOperator, SolveConfig, make_forward
from .data import MTData


@dataclasses.dataclass(frozen=True)
class InverseProblem:
    """Bound inverse problem: survey + observations + parameterisation.

    Static members (numpy) define shapes and gathers; methods are pure
    differentiable functions of the active-cell log-conductivity vector.
    """

    fwd: ForwardOperator
    obs: np.ndarray          # (ndata,) complex or real observations
    weights: np.ndarray      # (ndata,) real 1/|err| (compDataWeightMat)
    active_idx: np.ndarray   # (n_active,) flat cell indices being inverted
    bg_flat: np.ndarray      # (n_cell,) frozen background conductivities

    @property
    def n_param(self) -> int:
        return len(self.active_idx)

    @property
    def mesh(self) -> M.TensorMesh2D:
        return self.fwd.mesh

    # -- parameterisation ----------------------------------------------------
    def sigma2d(self, m: jax.Array) -> jax.Array:
        """active log-sigma -> full conductivity image
        (sigma = activeCell*exp(m) + bg, HMCSampler.jl:289-294).  ``m`` is
        (..., n_param); leading batch (chain) axes flow through to a
        (..., nz, ny) image."""
        msh = self.mesh
        sig = T.scatter_active(T.model_transform(m), self.active_idx, msh.n_cell)
        sig = sig + jnp.asarray(self.bg_flat, m.dtype)
        return sig.reshape(m.shape[:-1] + (msh.nz, msh.ny))

    # -- data terms ----------------------------------------------------------
    def predict(self, m: jax.Array, fac=None) -> jax.Array:
        return self.fwd.predict(self.sigma2d(m), fac=fac)

    def factor_state(self, m: jax.Array):
        """Merged-mode factorisation at model m (trajectory-amortised path);
        constant w.r.t. differentiation (callers pass it back as ``fac``)."""
        return self.fwd.factor_at(self.sigma2d(m))

    def data_misfit(self, m: jax.Array, fac=None):
        """0.5 * || W (F(m) - d) ||^2 and the predicted data
        (getDataMisfit, HMCUtility.jl:200-207).  Per-chain values when ``m``
        carries leading batch axes."""
        pred = self.predict(m, fac=fac)
        res = jnp.asarray(self.weights) * (pred - jnp.asarray(self.obs))
        # complex residuals count re and im separately (0.5 * re(r^H r))
        return 0.5 * jnp.sum(jnp.abs(res) ** 2, axis=-1), pred

    # -- prior ---------------------------------------------------------------
    def _inject(self, v: jax.Array) -> jax.Array:
        msh = self.mesh
        full = T.scatter_active(v, self.active_idx, msh.n_cell)
        return full.reshape(v.shape[:-1] + (msh.nz, msh.ny))

    def model_norm(self, m: jax.Array, m_ref: jax.Array) -> jax.Array:
        """0.5 * (m-mref)' Wm (m-mref) with Wm = (Gc A)'(Gc A)
        (HMCStruct.jl:118-120, HMCSampler.jl:389-392), matrix-free."""
        return 0.5 * M.cell_gradient_sqnorm(self._inject(m - m_ref))

    def wm_matvec(self, v: jax.Array) -> jax.Array:
        """Wm @ v in active space (used by the non-diagonal mass matrix).
        Batched over leading axes of ``v`` like the sibling methods."""
        full = M.cell_gradient_normal(self._inject(v))
        return full.reshape(v.shape[:-1] + (-1,))[..., jnp.asarray(self.active_idx)]

    def wm_dense(self) -> np.ndarray:
        """Dense Wm (n_param x n_param) for the non-diagonal mass matrix
        (setMassMatrix(invParam), HMCSampler.jl:478-489).  Built column-wise;
        only for moderate n_param."""
        eye = jnp.eye(self.n_param)
        return np.asarray(jax.vmap(self.wm_matvec)(eye)).T

    # -- dense-cube data terms (SPMD / frequency-sharded path) ---------------
    def cube_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Observations and weights scattered onto the dense
        (nfreq, nrx, ncomp) cube, zeros where unobserved.  The cube misfit
        with these weights equals the masked-vector misfit exactly, and the
        frequency axis can be sharded across devices."""
        d = self.fwd.data
        shape = (d.n_freq, d.n_rx, d.n_comp)
        obs_cube = np.zeros(shape, self.obs.dtype).reshape(-1)
        w_cube = np.zeros(shape, np.float64).reshape(-1)
        obs_cube[d.flat_index] = self.obs
        w_cube[d.flat_index] = self.weights
        return obs_cube.reshape(shape), w_cube.reshape(shape)

    def factor_state_cube(self, m, freqs):
        """Merged-mode factorisation over a (possibly local) frequency set —
        the sharded-path analogue of :meth:`factor_state`."""
        return self.fwd.factor_at(self.sigma2d(m), freqs)

    def potential_cube(self, m, m_ref, reg, freqs, obs_cube, w_cube,
                       prior_scale: float = 1.0, fac=None):
        """Potential with the data term over a (possibly local) frequency set.

        ``freqs``/``obs_cube``/``w_cube`` are traced arrays (shardable over a
        device-mesh 'freq' axis).  No collectives happen here: for SPMD use,
        pass ``prior_scale = 1/freq_axis_size`` so that psum-reducing the
        *value and gradient* of this local potential over the freq axis
        yields the exact global potential (the prior is replicated across
        freq shards).  See parallel.multichain for the reduction.
        """
        cube = self.fwd.response_cube(self.sigma2d(m), freqs, fac=fac)
        res = w_cube * (cube - obs_cube)
        misfit = 0.5 * jnp.sum(jnp.abs(res) ** 2, axis=(-3, -2, -1))
        mnorm = prior_scale * reg * self.model_norm(m, m_ref)
        return misfit + mnorm, (misfit, mnorm,
                                cube.reshape(cube.shape[:-3] + (-1,)))

    # -- potential -----------------------------------------------------------
    def potential(self, m: jax.Array, m_ref: jax.Array, reg: float, fac=None):
        """U(m) = data misfit + reg * model norm — the HMC potential energy
        (getHamiltonian, HMCSampler.jl:384-393).  Returns (U, (misfit, mnorm,
        pred)).  ``fac``: optional stale factorisation (solved to the same
        accuracy via refinement; see solve_dirichlet)."""
        misfit, pred = self.data_misfit(m, fac=fac)
        mnorm = reg * self.model_norm(m, m_ref)
        return misfit + mnorm, (misfit, mnorm, pred)

    def potential_value_and_grad(self, m, m_ref, reg):
        """(U, aux), dU/dm — one forward + one adjoint solve per (freq, mode),
        the factorisation shared between them (vs. the reference's explicit
        compJacTMatVec adjoint, compJacTMatVec.jl:8-329)."""
        (U, aux), g = jax.value_and_grad(self.potential, has_aux=True)(m, m_ref, reg)
        return (U, aux), g


def build_inverse_problem(mesh: M.TensorMesh2D, data: MTData, obs, err,
                          sigma_start_flat, sigma_fixed=(1e-8,),
                          cfg: SolveConfig | None = None) -> tuple[InverseProblem, np.ndarray]:
    """Assemble the inverse problem and the starting model (active log-sigma).

    Mirrors setupInverseDataModel (HMCStruct.jl:99-125): data weights are
    1/|err|, the start/reference model is log of the starting conductivity on
    active cells.
    """
    fwd = make_forward(mesh, data, cfg)
    active_idx, bg = T.active_cells(sigma_start_flat, sigma_fixed)
    weights = 1.0 / np.abs(np.asarray(err))
    prob = InverseProblem(fwd=fwd, obs=np.asarray(obs), weights=weights,
                          active_idx=active_idx, bg_flat=bg)
    m0 = np.log(np.asarray(sigma_start_flat)[active_idx])
    return prob, m0
