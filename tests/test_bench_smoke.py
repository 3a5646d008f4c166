"""bench.py must always produce its JSON line — guard against BENCH crashes.

Round 2's driver-captured benchmark crashed (rc=1) on an eager complex device
op; this smoke test runs the FULL measurement pipeline (problem build, jitted
observation generation, warmup-free HMC timing, ESS accounting, CPU baseline)
on the tiny flagship problem in a fresh CPU subprocess, so any import-time or
eager-op regression fails CI instead of shipping.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_runs_clean():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-4000:])
    out = json.loads(p.stdout.strip().splitlines()[-1])
    for k in ("metric", "value", "unit", "vs_baseline",
              "ess_per_sec_per_chip", "solves_per_sec", "nfevals"):
        assert k in out, k
    assert out["value"] > 0
    assert out["nfevals"] > 0
