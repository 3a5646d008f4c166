"""Multi-device / multi-host parallel sampling over a (chains, freq) mesh.

TPU-native replacement for the reference's process-level multi-chain
parallelism (parallelHMC.jl: one Julia worker per chain via
``remotecall_fetch``, zero communication).  Here:

* the **chains** mesh axis is pure data parallelism — each device advances
  its chain shard inside one jitted SPMD program (no collectives in the
  sampling loop, exactly like the reference's embarrassingly parallel
  design);
* the **freq** mesh axis is model parallelism over the PDE solves: each
  device solves its frequency shard of the (freq x mode) systems and the
  data misfit/gradient are ``psum``-reduced over the axis — the axis the
  reference iterates sequentially (MT2DFwdSolver.jl:140-171);
* cross-chain diagnostics (R-hat/ESS) and posterior pooling run on the
  gathered samples.

Multi-host: initialise with :func:`distributed_init` (jax.distributed), the
same code then spans hosts with chains riding DCN and freq riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.posterior import InverseProblem
from ..sampler import hmc as H


def distributed_init(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialise multi-host JAX (jax.distributed.initialize); no-op args on
    single host."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_device_mesh(n_chain_dev: int | None = None, n_freq_dev: int = 1,
                     devices=None) -> Mesh:
    """Device mesh with named axes ('chains', 'freq').

    Defaults to all devices on the chains axis.  The freq axis should stay
    within a host/ICI domain; chains may span hosts (DCN) as the sampling
    loop has no cross-chain communication.
    """
    devices = devices if devices is not None else jax.devices()
    n_chain_dev = n_chain_dev or (len(devices) // n_freq_dev)
    dev = np.asarray(devices[: n_chain_dev * n_freq_dev]).reshape(
        n_chain_dev, n_freq_dev)
    return Mesh(dev, ("chains", "freq"))


def run_sharded_hmc(problem: InverseProblem, opts: H.HMCOptions,
                    mass: H.MassMatrix, m_start: jax.Array, m_ref: jax.Array,
                    n_samples: int, key, mesh: Mesh,
                    sample_dtype=jnp.float32) -> H.HMCResult:
    """Run HMC with chains sharded over mesh axis 'chains' and the PDE
    frequency batch sharded over mesh axis 'freq'.

    ``m_start``/``m_ref`` are global (C, P) with C divisible by the chains
    axis size; the survey's frequency count must be divisible by the freq
    axis size.  Returns globally assembled results (same semantics as
    :func:`hmcmt2d_tpu.sampler.hmc.run_hmc`).
    """
    data = problem.fwd.data
    n_freq_dev = mesh.shape["freq"]
    n_chain_dev = mesh.shape["chains"]
    C = m_start.shape[0]
    if C % n_chain_dev or data.n_freq % n_freq_dev:
        raise ValueError(
            f"chains ({C}) and frequencies ({data.n_freq}) must divide the "
            f"mesh axes {dict(mesh.shape)}")

    obs_cube, w_cube = problem.cube_arrays()
    freqs = jnp.asarray(data.freqs)
    obs_cube = jnp.asarray(obs_cube)
    w_cube = jnp.asarray(w_cube)
    reg = opts.reg_param

    prior_scale = 1.0 / n_freq_dev

    def potential_vg(m, m_ref_, freqs_l, obs_l, w_l):
        """Batched over local chains, reduced over the freq mesh axis.

        The local potential carries this shard's misfit plus 1/k of the
        (replicated) prior; psum of both the value and the gradient over
        'freq' reconstructs the exact global potential and its gradient on
        every shard.  (Inside shard_map, grad-of-psum alone would yield only
        the local contribution — the transpose of psum is identity on a
        replicated cotangent — so the gradient must be psum'd explicitly.)
        """

        def single(mm, mr):
            return problem.potential_cube(mm, mr, reg, freqs_l, obs_l, w_l,
                                          prior_scale=prior_scale)

        (U, (mis, mn, pred)), g = jax.vmap(
            jax.value_and_grad(single, has_aux=True))(m, m_ref_)
        U, mis, mn, g = lax.psum((U, mis, mn, g), "freq")
        return (U, (mis, mn, pred)), g

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("chains"), P("chains"), P("freq"), P("freq"), P("freq"), P()),
             out_specs=H.HMCResult(
                 models=P(None, "chains"), stats=P(None, "chains"),
                 accepts=P(None, "chains"),
                 pred=P(None, "chains", "freq"),
                 final=H.ChainState(m=P("chains"), grad=P("chains"),
                                    misfit=P("chains"), mnorm=P("chains"),
                                    pred=P("chains", "freq")),
                 start_stats=P("chains")),
             check_vma=False)
    def sharded_run(m0_l, mref_l, freqs_l, obs_l, w_l, key):
        # distinct RNG per chains-shard, identical across the freq axis so
        # every freq-shard of a chain sees the same momenta/accept draws
        key_l = jax.random.fold_in(key, lax.axis_index("chains"))
        vg = lambda m, mr: potential_vg(m, mr, freqs_l, obs_l, w_l)
        res = H.run_hmc(vg, opts, mass, m0_l, mref_l, n_samples, key_l,
                        sample_dtype=sample_dtype)
        # reshape pred (.., nfreq_l*nrx*ncomp) to expose the freq axis for
        # global assembly
        nf_l = freqs_l.shape[0]
        def split_pred(p):
            return p.reshape(p.shape[:-1] + (nf_l, -1))
        res = res._replace(pred=split_pred(res.pred),
                           final=res.final._replace(pred=split_pred(res.final.pred)))
        return res

    return sharded_run(m_start, m_ref, freqs, obs_cube, w_cube, key)
