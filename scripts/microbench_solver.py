"""Microbenchmark of the factorisation/solve engines at production shape.

The flagship hot op (BASELINE.md): batch B = chains x freq x mode = C*22
systems, q = nyi = 95, nzi = 55.  This script times each engine in its own
invocation (a faulting engine must not cost the others' numbers):

  python scripts/microbench_solver.py factor_lu factor_gj solve ...
  python scripts/microbench_solver.py --chains 8 all

Each result prints as one JSON line {"case", "ms", "ok"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_system(chains, q=95, nzi=55, dtype=None, seed=0):
    import jax.numpy as jnp

    from hmcmt2d_tpu.ops import solver as S

    dtype = dtype or jnp.complex64
    rng = np.random.default_rng(seed)
    B = chains * 22
    # SPD-real-part-dominant like the equilibrated MT operator
    d_re = rng.standard_normal((B, nzi, q)) * 0.1 + 4.0
    d_im = rng.standard_normal((B, nzi, q)) * 0.5
    offy = 1.0 + 0.1 * rng.standard_normal((B, nzi, q - 1))
    offz = 1.0 + 0.1 * rng.standard_normal((B, nzi - 1, q))
    b_re = rng.standard_normal((B, nzi, q))
    b_im = rng.standard_normal((B, nzi, q))

    import jax
    from jax import lax
    rdt = jnp.float32

    # complex arrays must be created INSIDE a jitted program — eager complex
    # device ops are unimplemented on this tunneled runtime
    @jax.jit
    def make(d_re, d_im, offy, offz, b_re, b_im):
        sys_ = S.InteriorSystem(lax.complex(d_re, d_im), offy, offz)
        return sys_, lax.complex(b_re, b_im)

    return make(*(jnp.asarray(a, rdt)
                  for a in (d_re, d_im, offy, offz, b_re, b_im)))


def timeit(fn, *args, reps=5):
    """fn must be jit-compiled; completion is forced by reducing every output
    leaf to ONE real scalar inside an extra jitted wrapper and fetching it to
    host — ``block_until_ready`` alone under-reports on this tunneled
    runtime (observed: a 700 MB-output factorisation 'completing' in 56 us)."""
    import jax
    import jax.numpy as jnp

    def scalarize(*a):
        s = jnp.zeros((), jnp.float32)
        for x in jax.tree_util.tree_leaves(fn(*a)):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
                s += jnp.sum(jnp.abs(x)).astype(jnp.float32)
            elif hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                s += jnp.sum(x).astype(jnp.float32)
        return s

    timed = jax.jit(scalarize)
    float(timed(*args))                    # compile + warm
    t0 = time.time()
    for _ in range(reps - 1):
        timed(*args)
    out = float(timed(*args))              # host fetch drains the queue
    return (time.time() - t0) / reps * 1e3, out


CASES = {}


def case(name):
    def deco(f):
        CASES[name] = f
        return f
    return deco


@case("inv_raw_95")
def inv_raw(sys_, b):
    import jax
    import jax.numpy as jnp
    A = jnp.linalg.inv  # noqa
    from hmcmt2d_tpu.ops.solver import _dense_blocks
    T = _dense_blocks(sys_.diag, sys_.offy)[:, 0]     # (B, q, q)
    return timeit(jax.jit(lambda M: jnp.linalg.inv(M)), T)[0]


@case("inv_raw_128pad")
def inv_raw_pad(sys_, b):
    import jax
    import jax.numpy as jnp
    from hmcmt2d_tpu.ops.solver import _dense_blocks
    T = _dense_blocks(sys_.diag, sys_.offy)[:, 0]
    q = T.shape[-1]
    pad = 128 - q
    eye = jnp.eye(128, dtype=T.dtype)

    def padded_inv(M):
        Mp = jnp.pad(M, ((0, 0), (0, pad), (0, pad))) + eye * jnp.pad(
            jnp.zeros((q,)), (0, pad), constant_values=1.0)
        return jnp.linalg.inv(Mp)[..., :q, :q]

    return timeit(jax.jit(padded_inv), T)[0]


@case("factor_lu")
def factor_lu(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    return timeit(jax.jit(lambda s: S.factorize(s, method="thomas")), sys_)[0]


@case("factor_gj")
def factor_gj(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    return timeit(jax.jit(
        lambda s: S.factorize(s, method="thomas", inv_method="gj")), sys_)[0]


@case("factor_blocked")
def factor_blocked(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    return timeit(jax.jit(
        lambda s: S.factorize(s, method="thomas_blocked")), sys_)[0]


@case("factor_bcr")
def factor_bcr(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    return timeit(jax.jit(lambda s: S.factorize(s, method="bcr")), sys_)[0]


@case("solve_thomas")
def solve_thomas(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    fac = jax.jit(lambda s: S.factorize(s, method="thomas"))(sys_)
    return timeit(jax.jit(S.factor_solve), fac, b)[0]


@case("solve_blocked")
def solve_blocked(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    fac = jax.jit(lambda s: S.factorize(s, method="thomas_blocked"))(sys_)
    return timeit(jax.jit(S.factor_solve), fac, b)[0]


@case("solve_bcr")
def solve_bcr(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    fac = jax.jit(lambda s: S.factorize(s, method="bcr"))(sys_)
    return timeit(jax.jit(S.factor_solve), fac, b)[0]


@case("refined_solve_10")
def refined(sys_, b):
    import jax
    from hmcmt2d_tpu.ops import solver as S
    fac = jax.jit(lambda s: S.factorize(s, method="thomas"))(sys_)
    return timeit(jax.jit(lambda s, f, bb: S.refined_solve(s, f, bb, iters=10)),
                  sys_, fac, b)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cases", nargs="+")
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--q", type=int, default=95)
    ap.add_argument("--nzi", type=int, default=55)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if jax.default_backend() != "cpu":
        from hmcmt2d_tpu.utils.host import enable_compilation_cache
        enable_compilation_cache()

    names = list(CASES) if args.cases == ["all"] else args.cases
    sys_, b = build_system(args.chains, args.q, args.nzi)
    for name in names:
        try:
            ms = CASES[name](sys_, b)
            print(json.dumps({"case": name, "chains": args.chains,
                              "q": args.q, "ms": round(ms, 3), "ok": True}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "chains": args.chains,
                              "q": args.q, "ok": False,
                              "err": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
