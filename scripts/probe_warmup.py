"""Isolate the C=8 warmup-program kernel fault on the tunneled TPU.

Each invocation runs ONE variant (a fault kills the process):
  python scripts/probe_warmup.py <chains> <n_iters> <adapt_mass 0|1> [amortize 0|1]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    C = int(sys.argv[1])
    n = int(sys.argv[2])
    adapt_mass = bool(int(sys.argv[3]))
    amortize = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True

    import jax
    import jax.numpy as jnp

    from hmcmt2d_tpu.utils.host import enable_compilation_cache
    if jax.default_backend() != "cpu":
        enable_compilation_cache()
    from hmcmt2d_tpu.io.startup import read_startup
    from hmcmt2d_tpu.models.posterior import build_inverse_problem
    from hmcmt2d_tpu.sampler import adapt as A
    from hmcmt2d_tpu.sampler import hmc as H
    from hmcmt2d_tpu.sampler.driver import make_factor_fn, make_potential_vg, hmc_options

    cfg, mesh, sigma2d, data, obs, err = read_startup(
        "/root/reference/HMCMT/examples/dprism3d/startupfile")
    problem, m0 = build_inverse_problem(
        mesh, data, obs, err, np.asarray(sigma2d).ravel(),
        sigma_fixed=cfg.sig_fix)
    vg = make_potential_vg(problem, cfg.reg_param)
    factor_fn = make_factor_fn(problem) if amortize else None
    opts = hmc_options(cfg)
    key = jax.random.PRNGKey(1)
    m_start = H.random_homogeneous_start(key, m0, C)
    wopts = A.WarmupOptions(adapt_mass=adapt_mass)

    carry = jax.jit(lambda m0_, mref: A.warmup_carry_init(vg, opts, m0_, mref))(
        m_start, m_start)
    jax.block_until_ready(carry.state.misfit)
    print(f"[probe] init ok: misfit={np.asarray(carry.state.misfit)[:2]}",
          flush=True)

    ends = np.asarray(A.window_schedule(cfg.burnin, wopts))[:n] if adapt_mass \
        else np.zeros(n, bool)
    seg = jax.jit(lambda c, mref, k, off, e: A.warmup_scan(
        vg, opts, mref, c, A.warmup_keys(k, off, n), e, wopts,
        factor_fn=factor_fn))
    carry, (wm, ws, wa, wp, wl) = seg(carry, m_start, key, 0,
                                      jnp.asarray(ends))
    jax.block_until_ready(wm)
    print(f"[probe] C={C} n={n} adapt_mass={adapt_mass} amortize={amortize} "
          f"OK: misfit={np.asarray(ws)[-1, :2, 0]} "
          f"dt={float(jnp.exp(carry.da.log_eps)):.4g}", flush=True)


if __name__ == "__main__":
    main()
