"""The reference's actual example workloads, end-to-end (reduced samples).

The reference's sole integration test is running its examples through the
sampler (examples/dprism3d/runHMCscript.jl:22-33).  Here the REAL startup,
data, and model files from /root/reference/HMCMT/examples are read unchanged
and pushed through forward modelling + a reduced-sample inversion; the full
10k-sample posterior runs on TPU (artifacts + numbers in BASELINE.md).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmcmt2d_tpu.io.startup import read_startup
from hmcmt2d_tpu.models.forward import SolveConfig, make_forward
from hmcmt2d_tpu.sampler.driver import run_inversion

DPRISM = "/root/reference/HMCMT/examples/dprism3d/startupfile"
COPROD = "/root/reference/HMCMT/examples/coprod2/startupfile"

pytestmark = pytest.mark.skipif(not os.path.exists(DPRISM),
                                reason="reference examples not available")


def test_dprism_forward_physics():
    """Forward-model the dprism start model against its observed data: the
    homogeneous 100 Ohm.m start model misfits the prism data at a known
    level (normalised RMS ~ 5.8), and responses are physical."""
    cfg, mesh, sigma2d, data, obs, err = read_startup(DPRISM)
    assert data.n_data == 902 and data.n_freq == 11 and data.n_rx == 41
    assert (mesh.ny, mesh.nz) == (96, 56) and mesh.n_air == 7
    fwd = make_forward(mesh, data, SolveConfig(jnp.complex128, 0))
    pred = np.asarray(jax.jit(fwd.predict)(jnp.asarray(np.asarray(sigma2d))))
    nrms = float(np.sqrt(np.mean(np.abs((pred - obs) / err) ** 2)))
    assert 4.0 < nrms < 8.0, nrms
    # physicality: apparent resistivity from ZXY at the highest frequency
    # over a ~100 Ohm.m background
    from hmcmt2d_tpu.constants import MU0
    cube = pred.reshape(data.n_freq, data.n_rx, data.n_comp)
    om = 2 * np.pi * data.freqs[0]
    rho_a = np.abs(cube[0, :, 0]) ** 2 / (om * MU0)
    assert np.all((rho_a > 20) & (rho_a < 500)), rho_a


def test_dprism_reduced_inversion(tmp_path):
    """Real dprism3d startupfile through the full driver (reduced samples):
    config honoured, sampler moves, outputs written in reference formats."""
    cfg, mesh, sigma2d, data, obs, err = read_startup(DPRISM)
    assert cfg.total_samples == 10000 and cfg.burnin == 100
    assert cfg.dt == 0.03 and cfg.timestep == (6, 10)
    assert cfg.sig_bounds == (1e-4, 1.0) and cfg.reg_param == 1.0

    run = run_inversion(cfg, mesh, sigma2d, data, obs, err, n_chains=2,
                        solve_cfg=SolveConfig(jnp.complex128, 0),
                        n_samples=3, key=jax.random.PRNGKey(0))
    res = run.result
    stats = np.asarray(res.stats)
    assert np.isfinite(stats).all()
    assert res.models.shape == (3, 2, run.problem.n_param)
    # bounds from the file are respected by every sample
    assert float(res.models.max()) <= np.log(1.0) + 1e-5
    assert float(res.models.min()) >= np.log(1e-4) - 1e-5

    from hmcmt2d_tpu.sampler import outputs as O
    O.write_posterior_models(run.problem, res.models, 0, str(tmp_path))
    O.write_chain_outputs(res.models, res.stats, res.accepts, res.pred,
                          res.start_stats, chain=0, ichain=1,
                          outdir=str(tmp_path), start_pred=res.start_pred)
    from hmcmt2d_tpu.io.model_io import read_model
    mesh2, mean_sig = read_model(tmp_path / "meanModel.model")
    assert mean_sig.shape == (mesh.nz, mesh.ny)
    # air rows written back at exactly 1e-8 (writeEMModel2D strips air, our
    # writer mirrors it)
    assert np.allclose(mean_sig[:mesh.n_air], 1e-8)
    data_rows = (tmp_path / "hmcsamples_id1.data").read_text().splitlines()
    assert len(data_rows) == 3 + 1           # S+1 rows incl. start row
    assert len(data_rows[0].split()) == 2 * data.n_data


def test_coprod2_reads_and_forward():
    """COPROD2 field example: real files load, config parsed, forward runs."""
    cfg, mesh, sigma2d, data, obs, err = read_startup(COPROD)
    assert cfg.sig_bounds == (1e-4, 10.0)    # rho in [0.1, 1e4]
    assert cfg.dt == 0.015
    fwd = make_forward(mesh, data, SolveConfig(jnp.complex128, 0))
    pred = np.asarray(jax.jit(fwd.predict)(jnp.asarray(np.asarray(sigma2d))))
    assert pred.shape == (data.n_data,)
    assert np.all(np.isfinite(pred))
    # field data vs the homogeneous start model: large but finite misfit
    # (measured 115.7 with complex128 solves)
    nrms = float(np.sqrt(np.mean(np.abs((pred - obs) / err) ** 2)))
    assert 50.0 < nrms < 200.0, nrms
