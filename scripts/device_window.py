"""One consolidated on-device diagnostic window (run while the production
run is PAUSED at a checkpoint):

  1. fused-engine (Pallas factor + sweeps) accuracy on the FLAGSHIP problem
     vs the CPU float64 truth saved by scripts' earlier probes
     (/tmp/acc_cpu.npz) and vs the on-device thomas+LU values;
  2. sweep-kernel timing at block_b in {8, 16} plus a pure G-streaming
     baseline, isolating whether the sweeps are DMA- or overhead-bound.

Prints one JSON line per result; every step guarded (a fault must not cost
the remaining steps' printout — though it will kill the process).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hmcmt2d_tpu.utils.host import enable_compilation_cache
    if jax.default_backend() != "cpu":
        enable_compilation_cache()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    from hmcmt2d_tpu.models.forward import SolveConfig, make_forward
    from hmcmt2d_tpu.models.posterior import InverseProblem
    from hmcmt2d_tpu.sampler.driver import make_potential_vg

    problem, m0 = g._flagship_problem()
    C = 4
    m = jnp.broadcast_to(jnp.asarray(m0, jnp.float32), (C, len(m0)))

    def with_cfg(cfg):
        fwd = make_forward(problem.mesh, problem.fwd.data, cfg)
        return InverseProblem(fwd=fwd, obs=problem.obs,
                              weights=problem.weights,
                              active_idx=problem.active_idx,
                              bg_flat=problem.bg_flat)

    try:
        truth = np.load("/tmp/acc_cpu.npz")
        Ut, gt = float(truth["U"][0]), np.asarray(truth["grad"])[0]
    except Exception:
        Ut = gt = None

    # ---- 1. fused accuracy + speed ------------------------------------
    for name, cfg in (("fused_r1", SolveConfig(jnp.complex64, 1, "fused")),
                      ("thomas_lu_r1", SolveConfig(jnp.complex64, 1, "thomas"))):
        try:
            p = with_cfg(cfg)
            vg = make_potential_vg(p, 1.0)

            def one(mm):
                (U, aux), grad = vg(mm, mm)
                return U[0], grad[0]
            timed = jax.jit(one)
            U, grad = timed(m)
            U = float(U)
            grad = np.asarray(grad, np.float64)
            t0 = time.time()
            for _ in range(2):
                U2, g2 = timed(m)
            _ = float(U2)
            ms = (time.time() - t0) / 2 * 1e3
            out = {"case": name, "U": round(U, 1), "ms_per_eval": round(ms, 1)}
            if Ut is not None:
                out["relU_vs_f64"] = float(abs(U - Ut) / abs(Ut))
                out["relg_vs_f64"] = float(np.linalg.norm(grad - gt)
                                           / np.linalg.norm(gt))
                out["cos_vs_f64"] = float(
                    grad @ gt / (np.linalg.norm(grad) * np.linalg.norm(gt)))
            print(json.dumps(out), flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "err": repr(e)[:200]}), flush=True)

    # ---- 2. sweep timing ----------------------------------------------
    from hmcmt2d_tpu.ops import solver as S
    from hmcmt2d_tpu.ops import pallas_factor as PF

    rng = np.random.default_rng(0)
    B, nzi, q = 176, 55, 95
    planes = {}

    def build(block_b):
        d_re = (4.0 + 0.1 * rng.standard_normal((B, nzi, q))).astype(np.float32)
        d_im = (0.5 * rng.standard_normal((B, nzi, q))).astype(np.float32)
        oy = (1 + 0.1 * rng.standard_normal((B, nzi, q - 1))).astype(np.float32)
        oz = (1 + 0.1 * rng.standard_normal((B, nzi - 1, q))).astype(np.float32)
        fac = jax.jit(lambda a, b_, c, d_: PF.fused_schur_factor_planes(
            lax.complex(a, b_), c, d_, block_b=block_b))(d_re, d_im, oy, oz)
        jax.block_until_ready(fac.gr)
        return fac

    b_re = rng.standard_normal((B, nzi, q)).astype(np.float32)
    b_im = rng.standard_normal((B, nzi, q)).astype(np.float32)

    for bb in (8, 16):
        try:
            fac = planes.setdefault(8, build(8))   # factor once at bb=8
            timed = jax.jit(lambda f, br, bi, n=bb: jnp.sum(jnp.abs(
                PF.fused_bt_solve(f, lax.complex(br, bi), block_b=n))
            ).astype(jnp.float32))
            float(timed(fac, b_re, b_im))
            t0 = time.time()
            for _ in range(4):
                timed(fac, b_re, b_im)
            out = float(timed(fac, b_re, b_im))
            print(json.dumps({"case": f"fused_sweep_b{bb}",
                              "ms": round((time.time() - t0) / 5 * 1e3, 2),
                              "sum": round(out, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"case": f"fused_sweep_b{bb}",
                              "err": repr(e)[:200]}), flush=True)

    # XLA bt_solve baseline on the same factors' math (thomas)
    try:
        sys_ = S.InteriorSystem(
            jax.jit(lambda a, b_: lax.complex(a, b_))(
                (4.0 + 0.1 * rng.standard_normal((B, nzi, q))).astype(np.float32),
                (0.5 * rng.standard_normal((B, nzi, q))).astype(np.float32)),
            jnp.asarray((1 + 0.1 * rng.standard_normal((B, nzi, q - 1))).astype(np.float32)),
            jnp.asarray((1 + 0.1 * rng.standard_normal((B, nzi - 1, q))).astype(np.float32)))
        fac2 = jax.jit(lambda s: S.factorize(s, method="thomas"))(sys_)
        jax.block_until_ready(fac2.s)
        timed = jax.jit(lambda f, br, bi: jnp.sum(jnp.abs(
            S.factor_solve(f, lax.complex(br, bi)))).astype(jnp.float32))
        float(timed(fac2, b_re, b_im))
        t0 = time.time()
        for _ in range(4):
            timed(fac2, b_re, b_im)
        out = float(timed(fac2, b_re, b_im))
        print(json.dumps({"case": "xla_bt_solve",
                          "ms": round((time.time() - t0) / 5 * 1e3, 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"case": "xla_bt_solve", "err": repr(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
