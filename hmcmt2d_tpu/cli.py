"""Command-line driver: run inversions / forward models from a startup file.

Replaces the reference's user-edited REPL scripts
(examples/*/runHMCscript.jl, paraHMCscript.jl) with a proper CLI:

    hmcmt2d run startupfile [--chains N] [--freq-devices K] [--samples S]
    hmcmt2d forward startupfile -o pred.dat

Startup files are the reference's key/value format (readstartupFile.jl) with
optional extensions ``chains:`` and ``seed:``.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _setup_jax(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    return jax


def _solve_cfg(args):
    import jax
    import jax.numpy as jnp

    from .models.forward import SolveConfig, default_config

    if args.precision == "auto":
        return default_config()
    if args.precision == "f64":
        return SolveConfig(jnp.complex128, 0)
    return SolveConfig(jnp.complex64, args.refine)


def cmd_run(args):
    jax = _setup_jax(args)
    import jax.numpy as jnp  # noqa: F401

    from .io.startup import read_startup
    from .parallel.multichain import make_device_mesh, run_sharded_hmc
    from .sampler import diagnostics as D
    from .sampler import outputs as O
    from .sampler.driver import hmc_options, make_mass, run_inversion
    from .models.posterior import build_inverse_problem
    from .sampler import hmc as H

    cfg, mesh, sigma2d, data, obs, err = read_startup(args.startupfile)
    if args.chains:
        cfg.n_chains = args.chains
    if args.samples:
        cfg.total_samples = args.samples
    if args.seed is not None:
        cfg.seed = args.seed
    solve_cfg = _solve_cfg(args)

    n_dev = len(jax.devices())
    print(f"[hmcmt2d] devices={n_dev} chains={cfg.n_chains} "
          f"samples={cfg.total_samples} solve_dtype={solve_cfg.solve_dtype.__name__}")

    t0 = time.time()
    if args.freq_devices > 1 or (n_dev > 1 and cfg.n_chains % n_dev == 0):
        # sharded path over a (chains, freq) device mesh
        problem, m0_file = build_inverse_problem(
            mesh, data, obs, err, np.asarray(sigma2d).ravel(),
            sigma_fixed=cfg.sig_fix, cfg=solve_cfg)
        kf = args.freq_devices
        dev_mesh = make_device_mesh(n_dev // kf, kf)
        key = jax.random.PRNGKey(cfg.seed)
        k_start, k_run = jax.random.split(key)
        m_start = H.random_homogeneous_start(k_start, m0_file, cfg.n_chains)
        result = run_sharded_hmc(problem, hmc_options(cfg), make_mass(problem, cfg),
                                 m_start, m_start, cfg.total_samples, k_run, dev_mesh)
        jax.block_until_ready(result.models)
        wall = time.time() - t0
    else:
        run = run_inversion(cfg, mesh, sigma2d, data, obs, err, solve_cfg=solve_cfg)
        problem, result, wall = run.problem, run.result, run.wall_time

    S, C, P = result.models.shape
    rate = float(np.asarray(result.accepts).mean())
    print(f"[hmcmt2d] done in {wall:.1f}s  ({S * C / wall:.2f} samples/s total, "
          f"accept rate {rate:.2f})")

    O.write_posterior_models(problem, result.models, cfg.burnin, args.outdir)
    for c in range(C):
        O.write_chain_outputs(result.models, result.stats, result.accepts,
                              result.pred, result.start_stats, chain=c,
                              ichain=c + 1, cputime=wall, outdir=args.outdir)
    if C >= 2:
        rhat = np.asarray(D.split_rhat(result.models))
        print(f"[hmcmt2d] split-R-hat: max={rhat.max():.3f} "
              f"median={np.median(rhat):.3f}")
    print(D.misfit_summary(result.stats))
    return 0


def cmd_forward(args):
    jax = _setup_jax(args)
    import jax.numpy as jnp

    from .io.startup import read_startup
    from .io.data_io import write_data
    from .models.forward import make_forward

    cfg, mesh, sigma2d, data, obs, err = read_startup(args.startupfile)
    fwd = make_forward(mesh, data, _solve_cfg(args))
    t0 = time.time()
    pred = np.asarray(jax.jit(fwd.predict)(jnp.asarray(np.asarray(sigma2d))))
    wall = time.time() - t0
    res = pred - obs
    nrms = float(np.sqrt(np.mean(np.abs(res / np.maximum(np.abs(err), 1e-300)) ** 2)))
    print(f"[hmcmt2d] forward: {len(pred)} data in {wall:.2f}s, "
          f"normalised RMS vs observed = {nrms:.3f}")
    write_data(args.output, data, pred, err)
    print(f"[hmcmt2d] wrote {args.output}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hmcmt2d",
                                 description="TPU-native 2D MT Bayesian inversion")
    ap.add_argument("--platform", default="", help="jax platform override (cpu/tpu)")
    ap.add_argument("--x64", action="store_true", help="enable float64")
    ap.add_argument("--precision", choices=["auto", "f32", "f64"], default="auto")
    ap.add_argument("--refine", type=int, default=1,
                    help="iterative-refinement steps for f32 solves")
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run the HMC inversion")
    runp.add_argument("startupfile")
    runp.add_argument("--chains", type=int, default=0)
    runp.add_argument("--samples", type=int, default=0)
    runp.add_argument("--seed", type=int, default=None)
    runp.add_argument("--freq-devices", type=int, default=1)
    runp.add_argument("--outdir", default=".")
    runp.set_defaults(func=cmd_run)

    fwdp = sub.add_parser("forward", help="forward-model the startup model")
    fwdp.add_argument("startupfile")
    fwdp.add_argument("-o", "--output", default="predicted.dat")
    fwdp.set_defaults(func=cmd_forward)

    args = ap.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
