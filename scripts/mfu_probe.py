"""Round-4 MFU probe: gradient-eval cost vs (refine, polish, block_b, chains).

Each invocation runs ONE case (a device fault must not cost other cases):

  python scripts/mfu_probe.py grad <chains> <refine> <polish>
  python scripts/mfu_probe.py sampler <chains> [refine [polish]]
  python scripts/mfu_probe.py factor <block_b> <polish>
  python scripts/mfu_probe.py sweep <block_b>

Prints one JSON line.  Run ONLY on an idle device (never next to the
production run).  Accuracy fields appear when /tmp/acc_cpu.npz (CPU f64
truth from scripts/validate_chains.py) is present.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _flagship():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(REPO, "__graft_entry__.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    return g._flagship_problem()


def _with_cfg(problem, cfg):
    from hmcmt2d_tpu.models.forward import make_forward
    from hmcmt2d_tpu.models.posterior import InverseProblem
    fwd = make_forward(problem.mesh, problem.fwd.data, cfg)
    return InverseProblem(fwd=fwd, obs=problem.obs, weights=problem.weights,
                          active_idx=problem.active_idx,
                          bg_flat=problem.bg_flat)


def case_grad(C, refine, polish):
    import jax
    import jax.numpy as jnp
    from hmcmt2d_tpu.models.forward import SolveConfig
    from hmcmt2d_tpu.ops import pallas_factor as PF
    from hmcmt2d_tpu.sampler.driver import make_potential_vg

    PF.POLISH = polish
    problem, m0 = _flagship()
    p = _with_cfg(problem, SolveConfig(jnp.complex64, refine, "fused"))
    vg = make_potential_vg(p, 1.0)
    m = jnp.broadcast_to(jnp.asarray(m0, jnp.float32), (C, len(m0)))

    def one(mm):
        (U, aux), grad = vg(mm, mm)
        return U[0], grad[0]

    timed = jax.jit(one)
    U, grad = timed(m)
    U = float(U)                          # forces completion (scalar fetch)
    grad = np.asarray(grad, np.float64)
    t0 = time.time()
    for _ in range(4):
        U2, g2 = timed(m)
    _ = float(U2)
    _ = np.asarray(g2)[0]
    ms = (time.time() - t0) / 4 * 1e3
    out = {"case": f"grad_C{C}_r{refine}_p{polish}", "U": round(U, 2),
           "ms_per_eval": round(ms, 1)}
    try:
        truth = np.load("/tmp/acc_cpu.npz")
        Ut, gt = float(truth["U"][0]), np.asarray(truth["grad"])[0]
        out["relU_vs_f64"] = float(abs(U - Ut) / abs(Ut))
        out["relg_vs_f64"] = float(np.linalg.norm(grad - gt)
                                   / np.linalg.norm(gt))
        out["cos_vs_f64"] = float(grad @ gt / (np.linalg.norm(grad)
                                               * np.linalg.norm(gt)))
    except Exception:
        pass
    print(json.dumps(out), flush=True)


def case_sampler(C, refine=3, polish=None):
    import jax
    import jax.numpy as jnp
    from hmcmt2d_tpu.ops import pallas_factor as PF
    if polish is not None:
        PF.POLISH = polish
    sys.path.insert(0, REPO)
    import bench

    seg, n = 8, 32
    factory = lambda: _flagship()
    if refine != 3:
        import dataclasses
        from hmcmt2d_tpu.models.forward import SolveConfig
        base = factory

        def factory():
            p, m0 = base()
            return _with_cfg(p, SolveConfig(jnp.complex64, refine,
                                            "fused")), m0
    problem, run, opts = bench._build(factory, C, seg=seg)
    jax.block_until_ready(run(2 * seg, jax.random.PRNGKey(0)).models)
    t0 = time.time()
    res = run(n, jax.random.PRNGKey(1))
    jax.block_until_ready(res.models)
    dt = time.time() - t0
    print(json.dumps({"case": f"sampler_C{C}_r{refine}_p{PF.POLISH}",
                      "samples_per_sec": round(C * n / dt, 3),
                      "accept": round(float(np.asarray(res.accepts).mean()),
                                      3)}), flush=True)


def _rand_planes(B=176, nzi=55, q=95, seed=0):
    import jax
    import jax.numpy as jnp
    from jax import lax
    rng = np.random.default_rng(seed)
    d_re = (4.0 + 0.1 * rng.standard_normal((B, nzi, q))).astype(np.float32)
    d_im = (0.5 * rng.standard_normal((B, nzi, q))).astype(np.float32)
    oy = (1 + 0.1 * rng.standard_normal((B, nzi, q - 1))).astype(np.float32)
    oz = (1 + 0.1 * rng.standard_normal((B, nzi - 1, q))).astype(np.float32)
    return d_re, d_im, oy, oz


def case_factor(block_b, polish):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from hmcmt2d_tpu.ops import pallas_factor as PF

    PF.POLISH = polish
    d_re, d_im, oy, oz = _rand_planes()
    timed = jax.jit(lambda a, b_, c, d_: jnp.sum(jnp.abs(
        PF.fused_schur_factor_planes(lax.complex(a, b_), c, d_,
                                     block_b=block_b).gr)
    ).astype(jnp.float32))
    float(timed(d_re, d_im, oy, oz))
    t0 = time.time()
    for _ in range(4):
        out = float(timed(d_re, d_im, oy, oz))
    ms = (time.time() - t0) / 4 * 1e3
    print(json.dumps({"case": f"factor_bb{block_b}_p{polish}",
                      "ms": round(ms, 2), "sum": round(out, 1)}), flush=True)


def case_sweep(block_b):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from hmcmt2d_tpu.ops import pallas_factor as PF

    d_re, d_im, oy, oz = _rand_planes()
    fac = jax.jit(lambda a, b_, c, d_: PF.fused_schur_factor_planes(
        lax.complex(a, b_), c, d_, block_b=8))(d_re, d_im, oy, oz)
    jax.block_until_ready(fac.gr)
    rng = np.random.default_rng(1)
    b_re = rng.standard_normal((176, 55, 95)).astype(np.float32)
    b_im = rng.standard_normal((176, 55, 95)).astype(np.float32)
    timed = jax.jit(lambda f, br, bi: jnp.sum(jnp.abs(
        PF.fused_bt_solve(f, lax.complex(br, bi), block_b=block_b))
    ).astype(jnp.float32))
    float(timed(fac, b_re, b_im))
    t0 = time.time()
    for _ in range(4):
        out = float(timed(fac, b_re, b_im))
    ms = (time.time() - t0) / 4 * 1e3
    print(json.dumps({"case": f"sweep_bb{block_b}", "ms": round(ms, 2),
                      "sum": round(out, 1)}), flush=True)


def main():
    import jax
    from hmcmt2d_tpu.utils.host import enable_compilation_cache
    if jax.default_backend() != "cpu":
        enable_compilation_cache()
    kind = sys.argv[1]
    args = [int(a) for a in sys.argv[2:]]
    if kind == "grad":
        case_grad(*args)
    elif kind == "sampler":
        case_sampler(*args)
    elif kind == "factor":
        case_factor(*args)
    elif kind == "sweep":
        case_sweep(*args)
    else:
        raise SystemExit(f"unknown case {kind}")


if __name__ == "__main__":
    main()
