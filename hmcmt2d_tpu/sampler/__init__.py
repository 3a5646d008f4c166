from .hmc import HMCResult, run_hmc, sample_chain_init  # noqa: F401
