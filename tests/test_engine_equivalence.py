"""Fused-engine vs exact-engine POSTERIOR equivalence (VERDICT r3 #7).

The fused Pallas engine at refine_iters=3 carries a ~0.5% gradient
inconsistency vs the exact complex128 thomas engine (validation_fused.json).
MH acceptance absorbs potential error, but the statistical closure — that
the two engines sample the SAME posterior within Monte-Carlo error — was
previously asserted only by argument.  Here both engines sample the tiny
realistic posterior from the same warmed-up state and their posterior
moments are compared with per-parameter Vehtari ESS z-scores (the same
methodology as the independent-numpy cross-check).

Runs the Pallas kernels in interpreter mode with a reduced padded block
size (CPU CI); the compiled path is exercised on hardware by bench/driver.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmcmt2d_tpu.models import forward as F
from hmcmt2d_tpu.models.posterior import build_inverse_problem
from hmcmt2d_tpu.ops import pallas_factor as PF
from hmcmt2d_tpu.sampler import adapt as A
from hmcmt2d_tpu.sampler import diagnostics as D
from hmcmt2d_tpu.sampler import hmc as H
from hmcmt2d_tpu.sampler.driver import make_potential_vg
from tests.test_e2e import tiny_setup


@pytest.fixture
def interpret_fused(monkeypatch):
    monkeypatch.setattr(PF, "Q", 16)
    monkeypatch.setattr(PF, "PANEL", 8)
    monkeypatch.setattr(PF, "INTERPRET", True)


def _problem(mesh, data, obs, err, start_sig, cfg):
    problem, m0 = build_inverse_problem(
        mesh, data, obs, err, np.asarray(start_sig).ravel(), cfg=cfg)
    return problem, np.asarray(m0)


def test_fused_posterior_matches_exact(interpret_fused):
    mesh, start_sig, data, obs, err = tiny_setup()
    exact_cfg = F.SolveConfig(jnp.complex128, 0, "bcr")
    fused_cfg = F.SolveConfig(jnp.complex64, 3, "fused")

    p_exact, m0 = _problem(mesh, data, obs, err, start_sig, exact_cfg)
    p_fused, _ = _problem(mesh, data, obs, err, start_sig, fused_cfg)
    vg_e = make_potential_vg(p_exact, 1.0)
    vg_f = make_potential_vg(p_fused, 1.0)

    # consistency spot-check at the start model: the fused potential and
    # gradient must be close to exact (the per-eval bound behind the
    # statistical claim)
    C, P = 2, len(m0)
    m_start = jnp.broadcast_to(jnp.asarray(m0, jnp.float64), (C, P))
    (U_e, _), g_e = jax.jit(vg_e)(m_start, m_start)
    (U_f, _), g_f = jax.jit(vg_f)(m_start, m_start)
    assert np.allclose(np.asarray(U_f), np.asarray(U_e), rtol=1e-3)
    cos = np.sum(np.asarray(g_f) * np.asarray(g_e)) / (
        np.linalg.norm(np.asarray(g_f)) * np.linalg.norm(np.asarray(g_e)))
    assert cos > 0.999, cos

    opts = H.HMCOptions(dt=0.05, steps_lo=2, steps_hi=4,
                        log_sig_lo=float(np.log(1e-4)),
                        log_sig_hi=float(np.log(10.0)), reg_param=1.0)

    # shared warmup under the exact engine (the production hybrid recipe)
    wres, wstate, wmass, winfo = jax.jit(lambda k: A.warmup(
        vg_e, opts, m_start, m_start, 100, k,
        A.WarmupOptions(adapt_mass=False)))(jax.random.PRNGKey(0))
    dt = float(winfo.dt)
    opts_run = dataclasses.replace(opts, dt=dt)
    mass = H.identity_mass(P, jnp.float64)

    S = 260
    run = lambda vg, key: jax.jit(lambda k: H.run_hmc(
        vg, opts_run, mass, wstate.m, m_start, S, k,
        sample_dtype=jnp.float64))(key)
    res_e = run(vg_e, jax.random.PRNGKey(1))
    res_f = run(vg_f, jax.random.PRNGKey(2))     # independent key stream

    acc_e = float(np.asarray(res_e.accepts).mean())
    acc_f = float(np.asarray(res_f.accepts).mean())
    assert acc_e > 0.4, acc_e
    # the fused engine must not collapse acceptance (the round-3 failure
    # mode at refine_iters<3 was accept -> 0)
    assert acc_f > 0.4, acc_f
    assert abs(acc_f - acc_e) < 0.25, (acc_e, acc_f)

    keep = S // 5
    se_mod, sf_mod = res_e.models[keep:], res_f.models[keep:]
    mu_e = np.asarray(se_mod).reshape(-1, P).mean(0)
    mu_f = np.asarray(sf_mod).reshape(-1, P).mean(0)
    sd_e = np.asarray(se_mod).reshape(-1, P).std(0)
    sd_f = np.asarray(sf_mod).reshape(-1, P).std(0)
    ess_e = np.maximum(np.asarray(D.ess(se_mod)), 4.0)
    ess_f = np.maximum(np.asarray(D.ess(sf_mod)), 4.0)

    se = np.sqrt(sd_e**2 / ess_e + sd_f**2 / ess_f)
    z = np.abs(mu_e - mu_f) / np.maximum(se, 1e-12)
    assert np.median(z) < 2.0, (np.median(z), z.max())
    assert z.max() < 6.0, z.max()
    ratio = sd_f / np.maximum(sd_e, 1e-12)
    assert 0.5 < np.median(ratio) < 2.0, np.median(ratio)
