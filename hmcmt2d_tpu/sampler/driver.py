"""High-level inversion driver: config + files -> chains -> posterior.

Equivalent of the reference's runHMCscript.jl / runHMCSampler wiring
(HMCSampler.jl:72-196, examples/*/runHMCscript.jl) with chains batched in
one jitted program instead of one chain per process.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..io.startup import HMCConfig
from ..models.forward import SolveConfig
from ..models.posterior import InverseProblem, build_inverse_problem
from . import adapt as A
from . import hmc as H


@dataclasses.dataclass
class InversionRun:
    problem: InverseProblem
    result: H.HMCResult
    config: HMCConfig
    m_ref: np.ndarray       # (C, P) per-chain reference/start models
    wall_time: float


def make_potential_vg(problem: InverseProblem, reg: float):
    """Batched (chains-leading) potential value-and-grad."""

    def single(m, m_ref):
        return problem.potential(m, m_ref, reg)

    vg_single = jax.value_and_grad(single, has_aux=True)

    def vg(m, m_ref):
        return jax.vmap(vg_single)(m, m_ref)

    return vg


def make_mass(problem: InverseProblem, cfg: HMCConfig) -> H.MassMatrix:
    if cfg.mass_type == "diagonal":
        # reference uses identity scaling 1.0 (HMCSampler.jl:81-84)
        return H.identity_mass(problem.n_param)
    return H.dense_mass(problem.wm_dense() + 1e-8 * np.eye(problem.n_param))


def hmc_options(cfg: HMCConfig) -> H.HMCOptions:
    return H.HMCOptions(
        dt=cfg.dt,
        steps_lo=int(cfg.timestep[0]),
        steps_hi=int(cfg.timestep[1]),
        log_sig_lo=float(np.log(cfg.sig_bounds[0])),
        log_sig_hi=float(np.log(cfg.sig_bounds[1])),
        reg_param=cfg.reg_param,
    )


def run_inversion(cfg: HMCConfig, mesh, sigma2d, data, obs, err,
                  n_chains: int | None = None, key=None,
                  solve_cfg: SolveConfig | None = None,
                  n_samples: int | None = None) -> InversionRun:
    """End-to-end single-host inversion: all chains advance in one jitted
    scan, batched through the PDE solves."""
    n_chains = n_chains or cfg.n_chains
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    n_samples = n_samples or cfg.total_samples

    problem, m0_file = build_inverse_problem(
        mesh, data, obs, err, np.asarray(sigma2d).ravel(),
        sigma_fixed=cfg.sig_fix, cfg=solve_cfg)

    key_start, key_run = jax.random.split(key)
    m_start = H.random_homogeneous_start(key_start, m0_file, n_chains)
    m_ref = m_start  # refModel = strModel (HMCSampler.jl:108-109)

    vg = make_potential_vg(problem, cfg.reg_param)
    mass = make_mass(problem, cfg)
    opts = hmc_options(cfg)

    t0 = time.time()
    if cfg.adapt:
        # warmup phase over the burn-in iterations: dual-averaging step size
        # + diagonal mass adaptation, then a fixed-kernel main phase
        n_warm = min(cfg.burnin, n_samples)
        wopts = A.WarmupOptions(target_accept=cfg.target_accept)
        key_warm, key_main = jax.random.split(key_run)
        wrun = jax.jit(lambda m0, mref, k: A.warmup(vg, opts, m0, mref,
                                                    n_warm, k, wopts))
        wres, state, mass, info = wrun(m_start, m_ref, key_warm)
        jax.block_until_ready(wres.models)
        opts = dataclasses.replace(opts, dt=float(info.dt))
        n_main = n_samples - n_warm
        if n_main > 0:
            run = jax.jit(lambda st, mref, k: H.run_hmc(
                vg, opts, mass, st.m, mref, n_main, k, init_state=st))
            mres = run(state, m_ref, key_main)
            jax.block_until_ready(mres.models)
            result = H.HMCResult(
                models=jnp.concatenate([wres.models, mres.models]),
                stats=jnp.concatenate([wres.stats, mres.stats]),
                accepts=jnp.concatenate([wres.accepts, mres.accepts]),
                pred=jnp.concatenate([wres.pred, mres.pred]),
                final=mres.final, start_stats=wres.start_stats)
        else:
            result = wres
    else:
        run = jax.jit(lambda m0, mref, k: H.run_hmc(vg, opts, mass, m0, mref,
                                                    n_samples, k))
        result = run(m_start, m_ref, key_run)
        jax.block_until_ready(result.models)
    wall = time.time() - t0

    return InversionRun(problem=problem, result=result, config=cfg,
                        m_ref=np.asarray(m_ref), wall_time=wall)
