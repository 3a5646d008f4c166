"""Benchmark: HMC sampling throughput on the dprism-scale flagship workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value          = HMC samples/sec/chip with 8 chains batched on one device
                 (each sample = L~[6,10] leapfrog steps; each step = one
                 forward + one adjoint PDE sweep over 11 freqs x 2 modes).
vs_baseline    = ratio vs. a measured CPU reference: scipy sparse LU
                 factorisations + solves for the same per-sample solve
                 counts (the reference's Julia lu/MUMPS pipeline equivalent;
                 the reference publishes no numbers — see BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def measure_tpu(problem, m0, n_chains=8, n_samples=10):
    import jax
    import jax.numpy as jnp

    from hmcmt2d_tpu.sampler import hmc as H
    from hmcmt2d_tpu.sampler.driver import make_potential_vg

    vg = make_potential_vg(problem, 1.0)
    opts = H.HMCOptions(dt=0.03, steps_lo=6, steps_hi=10,
                        log_sig_lo=float(np.log(1e-4)),
                        log_sig_hi=float(np.log(1.0)), reg_param=1.0)
    mass = H.identity_mass(len(m0), jnp.float32)
    m_start = jnp.broadcast_to(jnp.asarray(m0, jnp.float32), (n_chains, len(m0)))

    run = jax.jit(lambda s, k: H.run_hmc(vg, opts, mass, m_start, m_start, s, k),
                  static_argnums=0)
    # warm-up / compile
    jax.block_until_ready(run(2, jax.random.PRNGKey(0)).models)
    t0 = time.time()
    res = run(n_samples, jax.random.PRNGKey(1))
    jax.block_until_ready(res.models)
    dt = time.time() - t0
    assert bool(jnp.all(jnp.isfinite(res.stats))), "non-finite sampler stats"
    return n_chains * n_samples / dt, res


def measure_cpu_baseline(problem, n_freq=11, leapfrog_avg=8.0):
    """Time the reference-equivalent CPU linear-algebra per HMC sample:
    (L+2) forward factorisation sweeps (nfreq x 2 modes sparse LU) plus
    (L+1) adjoint solve sweeps reusing the factors (HMCSampler.jl:136-141,
    216-263, MT2DFwdSolver.jl:140-171)."""
    import scipy.sparse.linalg as spla

    from hmcmt2d_tpu.utils import cpu_reference as R

    mesh = problem.mesh
    dy = np.asarray(mesh.y_len, float)
    dz = np.asarray(mesh.z_len, float)
    sigma = np.zeros(mesh.n_cell)
    sigma[problem.active_idx] = 0.01
    sigma += problem.bg_flat
    ii, _ = R.boundary_index(len(dy), len(dz))
    freqs = np.asarray(problem.fwd.data.freqs)[:n_freq]

    rng = np.random.default_rng(0)
    n = len(ii)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    t0 = time.time()
    for mode in ("TE", "TM"):
        for f in freqs:
            A = R.dense_operator(dy, dz, sigma, mode, 2 * np.pi * f)
            lu = spla.splu(A[np.ix_(ii, ii)].tocsc())
            lu.solve(b)           # forward solve
            lu.solve(b)           # adjoint solve (factor reuse)
    t_sweep = time.time() - t0   # one forward+adjoint sweep incl. assembly

    per_sample = (leapfrog_avg + 1.0) * t_sweep
    return 1.0 / per_sample


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", False)

    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    problem, m0 = g._flagship_problem()

    sps, _ = measure_tpu(problem, m0)
    cpu_sps = measure_cpu_baseline(problem)

    print(json.dumps({
        "metric": "hmc_samples_per_sec_per_chip",
        "value": round(sps, 4),
        "unit": "samples/s (8 chains, dprism-scale: 96x56 mesh, 11 freqs, TE+TM)",
        "vs_baseline": round(sps / cpu_sps, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
