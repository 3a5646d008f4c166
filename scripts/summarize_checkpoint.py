"""Produce posterior artifacts (summary.json, mean/std models, chain logs)
from a driver checkpoint .npz — so a long checkpointed TPU run can be
snapshotted into committed artifacts at any segment boundary, and a killed
run loses nothing (the reference writes outputs only at the very end,
HMCSampler.jl:785-828).

Usage:
  JAX_PLATFORMS=cpu python scripts/summarize_checkpoint.py \
      runs/dprism3d_mc/checkpoint.npz runs/dprism3d_mc/startupfile \
      artifacts/dprism3d_mc [--thin 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("startupfile")
    ap.add_argument("outdir")
    ap.add_argument("--status", default="")
    ap.add_argument("--burn", type=int, default=0,
                    help="diagnostics burn-in cut (samples incl. warmup); "
                         "overrides the checkpoint's n_warm when LARGER — "
                         "use when the post-warmup transient (e.g. a long "
                         "field-data misfit descent) must not pollute "
                         "R-hat/ESS/posterior statistics")
    ap.add_argument("--notes", default="")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu — NEVER run this next "
                         "to a live production run on the device: env vars "
                         "are ignored by this environment's startup hook, "
                         "so the platform is forced via jax.config here)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    from hmcmt2d_tpu.io.startup import read_startup
    from hmcmt2d_tpu.models.posterior import build_inverse_problem
    from hmcmt2d_tpu.sampler import checkpoint as C
    from hmcmt2d_tpu.sampler import diagnostics as D
    from hmcmt2d_tpu.sampler import outputs as O

    cfg, mesh, sigma2d, data, obs, err = read_startup(args.startupfile)
    problem, _ = build_inverse_problem(
        mesh, data, obs, err, np.asarray(sigma2d).ravel(),
        sigma_fixed=cfg.sig_fix)
    ck = C.load_checkpoint(args.checkpoint)
    models = ck["models"]          # (S, C, P) incl. warmup rows
    stats = ck["stats"]
    accepts = ck["accepts"]
    n_warm = ck["n_warm"]
    S, Cn, P = models.shape
    os.makedirs(args.outdir, exist_ok=True)

    n_cut = max(n_warm, args.burn)
    O.write_posterior_models(problem, models, n_cut, args.outdir)
    for c in range(Cn):
        O.write_chain_outputs(models, stats, accepts, ck["pred"],
                              ck["start_stats"], chain=c, ichain=c + 1,
                              cputime=ck["wall_time"], outdir=args.outdir,
                              start_pred=ck["start_pred"])
        # drop the bulky per-sample dumps from the artifact dir (the
        # checkpoint retains them); keep the statistics logs only
        for n in (f"hmcsamples_id{c + 1}.model", f"hmcsamples_id{c + 1}.data"):
            p = os.path.join(args.outdir, n)
            if os.path.exists(p):
                os.remove(p)

    post = models[n_cut:]
    ndata = len(np.asarray(problem.obs))
    misfit = stats[..., 0]                          # (S, C)
    rhat = np.asarray(D.split_rhat(post)) if S - n_cut >= 4 else None
    ess = np.asarray(D.ess(post)) if S - n_cut >= 4 else None
    etail = np.asarray(D.ess_tail(post)) if S - n_cut >= 8 else None

    # posterior-mean fit
    mean_m = post.reshape(-1, P).mean(axis=0)
    pred = None
    try:
        import jax
        import jax.numpy as jnp
        pred = np.asarray(jax.jit(problem.predict)(jnp.asarray(mean_m, jnp.float64)))
    except Exception:
        pass

    # anomaly-recovery quantification: per-cell z-score of the posterior
    # mean against the homogeneous start model, in posterior-std units
    mean_full, std_full = O.posterior_mean_std(models, n_cut)
    m_start_log = float(np.median(ck["m_ref"]))
    z = (mean_full - m_start_log) / np.maximum(std_full, 1e-12)
    rho_mean = 1.0 / np.exp(mean_full)

    summary = {
        "samples": int(S),
        "warmup": int(n_warm),
        "diagnostics_burn": int(n_cut),
        "chains": int(Cn),
        "accept_rate": round(float(accepts[n_cut:].mean()), 3),
        "misfit_per_datum_start": round(float(np.asarray(ck["start_stats"])[:, 0].mean()) / ndata * 2, 3),
        "misfit_per_datum_end_per_chain": [
            round(float(misfit[-1, c]) / ndata * 2, 3) for c in range(Cn)],
        "chi2_per_datum_end": round(float(misfit[-1].mean()) / ndata * 2, 3),
        "split_rhat_max": round(float(rhat.max()), 3) if rhat is not None else None,
        "split_rhat_median": round(float(np.median(rhat)), 3) if rhat is not None else None,
        "ess_median": round(float(np.median(ess)), 1) if ess is not None else None,
        "ess_total": round(float(np.sum(ess)), 1) if ess is not None else None,
        "ess_tail_median": (round(float(np.median(etail)), 1)
                            if etail is not None else None),
        "accept_rate_last_quarter": round(
            float(accepts[n_cut + 3 * (S - n_cut) // 4:].mean()), 3),
        "diagnostics": "rank-normalized split-R-hat (bulk+folded max) and "
                       "bulk/tail ESS, Vehtari et al. 2021 "
                       "(sampler/diagnostics.py)",
        "wall_time_s": round(float(ck["wall_time"]), 1),
        "samples_per_sec_total": round(S * Cn / float(ck["wall_time"]), 3),
        "anomaly_zscore_max": round(float(np.abs(z).max()), 2),
        "anomaly_cells_z_gt_2": int(np.sum(np.abs(z) > 2.0)),
        "rho_range_posterior_mean": [round(float(rho_mean.min()), 1),
                                     round(float(rho_mean.max()), 1)],
        "adapted_dt": round(float(ck["dt"]), 5),
        "workload": args.startupfile,
        "status": args.status or
        ("VALID multi-chain posterior run" if Cn >= 2 else "VALID single-chain run"),
        "notes": args.notes,
    }
    if pred is not None:
        res = (pred - np.asarray(problem.obs)) * np.asarray(problem.weights)
        summary["posterior_mean_nrms"] = round(
            float(np.sqrt(np.mean(np.abs(res) ** 2))), 3)
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
