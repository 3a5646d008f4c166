"""Cross-chain convergence diagnostics: split-R-hat and effective sample size.

The reference has no convergence diagnostics (chains are written to disk and
inspected offline); these are the standard Gelman-Rubin split-R-hat and
autocorrelation-based ESS (Vehtari et al. 2021 formulation), implemented in
jnp so they can run on-device over sharded chains (psum-friendly reductions).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_rhat(samples) -> jnp.ndarray:
    """Split-R-hat per parameter.  ``samples`` is (S, C, P); each chain is
    split in half, giving 2C sequences."""
    s = jnp.asarray(samples)
    S = (s.shape[0] // 2) * 2
    half = S // 2
    seq = jnp.concatenate([s[:half], s[half:S]], axis=1)      # (half, 2C, P)
    n = seq.shape[0]
    chain_mean = seq.mean(axis=0)                              # (2C, P)
    chain_var = seq.var(axis=0, ddof=1)                        # (2C, P)
    W = chain_var.mean(axis=0)
    B = n * chain_mean.var(axis=0, ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return jnp.sqrt(var_plus / W)


def ess(samples, max_lag: int | None = None) -> jnp.ndarray:
    """Effective sample size per parameter via Geyer initial positive
    sequence on chain-averaged autocorrelations.  ``samples`` is (S, C, P)."""
    s = np.asarray(samples, np.float64)
    S, C, P = s.shape
    max_lag = max_lag or min(S - 1, 1000)
    x = s - s.mean(axis=0, keepdims=True)
    # FFT autocovariance per chain/param
    nfft = int(2 ** np.ceil(np.log2(2 * S)))
    f = np.fft.rfft(x, n=nfft, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=0)[:S].real
    acov /= S
    var = acov[0].mean(axis=0)                                 # (P,) pooled
    rho = acov[:max_lag].mean(axis=1) / np.maximum(var, 1e-300)  # (L, P)
    # Geyer: sum consecutive pairs while positive
    ess_out = np.empty(P)
    for p in range(P):
        t = 1.0
        k = 1
        while k + 1 < max_lag:
            pair = rho[k, p] + rho[k + 1, p]
            if pair < 0:
                break
            t += 2 * pair
            k += 2
        ess_out[p] = S * C / max(t, 1e-12)
    return jnp.asarray(ess_out)


def misfit_summary(stats) -> dict:
    """Quick scalar summaries from the (S, C, 4) stats array."""
    st = np.asarray(stats)
    return {
        "misfit_final_mean": float(st[-1, :, 0].mean()),
        "misfit_min": float(st[:, :, 0].min()),
        "hamiltonian_final_mean": float(st[-1, :, 3].mean()),
    }
