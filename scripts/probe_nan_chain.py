"""Reproduce the COPROD2 warmup dt-collapse and locate the poison.

Runs the exact production warmup (same seed/engine as `hmcmt2d run`) for
N iterations in seg-8 segments, printing per-chain finiteness of the
carried state (misfit, mnorm, grad), the pooled alpha, and dt after each
segment.  Run on an idle device.

  python scripts/probe_nan_chain.py <startupfile> <n_iters>
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    startup = sys.argv[1]
    n = int(sys.argv[2])
    refine = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax
    import jax.numpy as jnp

    from hmcmt2d_tpu.utils.host import enable_compilation_cache
    if jax.default_backend() != "cpu":
        enable_compilation_cache()

    import dataclasses

    from hmcmt2d_tpu.io.startup import read_startup
    from hmcmt2d_tpu.models.forward import SolveConfig
    from hmcmt2d_tpu.models.posterior import build_inverse_problem
    from hmcmt2d_tpu.sampler import adapt as A
    from hmcmt2d_tpu.sampler import hmc as H
    from hmcmt2d_tpu.sampler.driver import (hmc_options, make_factor_fn,
                                            make_potential_vg)

    cfg, mesh, sigma2d, data, obs, err = read_startup(startup)
    # the hybrid warmup engine: exact thomas refine-1, as cli._warmup_cfg
    wcfg = SolveConfig(jnp.complex64, refine, "thomas")
    problem, m0 = build_inverse_problem(
        mesh, data, obs, err, np.asarray(sigma2d).ravel(),
        sigma_fixed=cfg.sig_fix, cfg=wcfg)
    vg = make_potential_vg(problem, cfg.reg_param)
    factor_fn = make_factor_fn(problem) if cfg.amortize else None
    opts = hmc_options(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    key_start, key_run = jax.random.split(key)
    key_warm, _ = jax.random.split(key_run)
    m_start = H.random_homogeneous_start(key_start, m0, cfg.n_chains)
    wopts = A.WarmupOptions(target_accept=cfg.target_accept)
    ends = np.asarray(A.window_schedule(cfg.burnin, wopts))

    carry = jax.jit(lambda m, mref: A.warmup_carry_init(vg, opts, m, mref))(
        m_start, m_start)

    def report(tag, carry):
        st = carry.state
        gfin = np.asarray(jnp.isfinite(st.grad).all(axis=-1))
        gmax = np.asarray(jnp.max(jnp.abs(st.grad), axis=-1))
        mis = np.asarray(st.misfit)
        print(f"[{tag}] dt={float(jnp.exp(carry.da.log_eps)):.3e} "
              f"misfit={np.array2string(mis, precision=1)} "
              f"grad_finite={gfin.astype(int)} "
              f"grad_max={np.array2string(gmax, precision=2)}", flush=True)

    report("init", carry)
    seg = 8
    wseg = jax.jit(lambda c, mref, k, off, e: A.warmup_scan(
        vg, opts, mref, c, A.warmup_keys(k, off, seg), e, wopts,
        factor_fn=factor_fn))
    done = 0
    while done < n:
        carry, (wm, ws, wa, wp, wl) = wseg(
            carry, m_start, key_warm, done,
            jnp.asarray(ends[done: done + seg]))
        jax.block_until_ready(wm)
        done += seg
        acc = np.asarray(wa)         # (seg, C)
        print(f"  seg accept/chain={acc.mean(axis=0)}", flush=True)
        report(f"it{done}", carry)

    np.savez("/tmp/stuck_state.npz",
             m=np.asarray(carry.state.m, np.float64),
             misfit=np.asarray(carry.state.misfit, np.float64),
             mnorm=np.asarray(carry.state.mnorm, np.float64),
             m_ref=np.asarray(m_start, np.float64))
    print("saved /tmp/stuck_state.npz", flush=True)


if __name__ == "__main__":
    main()
