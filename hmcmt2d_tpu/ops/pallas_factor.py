"""Fused block-Thomas factorisation as one Pallas TPU kernel.

The production hot op is the Schur recurrence of :func:`ops.solver.bt_factor`:

    G_0 = inv(T_0);   G_j = inv(T_j - diag(c_{j-1}) G_{j-1} diag(c_{j-1}))

executed for nzi ~ 55 z-lines over a batch of B = chains x freq x mode
systems.  The XLA form dispatches one batched ``jnp.linalg.inv`` custom call
per line — a row-pivoted LU whose sequential inner loop leaves the MXU idle
(~15 ms per (176, 95, 95) complex64 call, BASELINE.md) — 55 dispatches and
~825 ms per factorisation.

This kernel fuses the entire recurrence into ONE ``pallas_call``:

* grid = (B / Bb, nzi) with the z-line index as the LAST (fastest, sequential
  on TPU) grid dimension; the carried ``G_prev`` lives in VMEM scratch and
  persists across grid steps of the same batch block;
* complex arithmetic in split real/imaginary float32 planes (Pallas TPU has
  no complex dtype); q is padded to 128 — the MXU tile — with identity
  diagonal / zero couplings so padding never leaks into the true block;
* each line inverts its dense block with **blocked unpivoted Gauss-Jordan**
  (panel = 32): the rank-32 sweeps are batched 128x128-shaped matmuls (MXU
  work at every step), and unpivoted elimination is stable here because the
  equilibrated MT operator has positive-definite real part (see
  ops/blockinv.py and the reference operator it replaces,
  MT2DFwdSolver.jl:140-171 / MUMPS LDL^T).

The caller-facing :func:`fused_schur_factor` takes the same (diag, offy,
offz) interior system as ``bt_factor`` and returns the same stacked inverse
Schur complements G, bit-compatible modulo float32 rounding differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q = 128          # padded block size (MXU tile)
PANEL = 32       # Gauss-Jordan panel width


def _cdot(ar, ai, br, bi):
    """Batched complex matmul in split planes: (..., m, k) @ (..., k, n)."""
    nb = ar.ndim - 2
    dn = (((ar.ndim - 1,), (nb,)), (tuple(range(nb)), tuple(range(nb))))
    dot = functools.partial(lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
    return (dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))


def _base_inv_rows(xr, xi, k0):
    """In-place-style unpivoted GJ of the panel rows.

    ``xr/xi`` are the panel rows (Bb, PANEL, 2Q) of the augmented system;
    entering, columns k0..k0+PANEL hold the pivot block P.  Returns rows
    R = inv(P) @ rows — the classic Gauss-Jordan row sweep restricted to the
    panel (PANEL sequential rank-1 steps on a (Bb, PANEL, 2Q) tile; VPU work
    vectorised over the batch block).
    """
    for t in range(PANEL):
        k = k0 + t
        pr = xr[:, t, k]                               # (Bb,)
        pi = xi[:, t, k]
        d = pr * pr + pi * pi
        inv_r = (pr / d)[:, None]
        inv_i = (-pi / d)[:, None]
        rowr = xr[:, t, :]                             # (Bb, 2Q)
        rowi = xi[:, t, :]
        # scaled pivot row: row / pivot
        sr = rowr * inv_r - rowi * inv_i
        si = rowr * inv_i + rowi * inv_r
        colr = xr[:, :, k][:, :, None]                 # (Bb, PANEL, 1)
        coli = xi[:, :, k][:, :, None]
        xr = xr - (colr * sr[:, None, :] - coli * si[:, None, :])
        xi = xi - (colr * si[:, None, :] + coli * sr[:, None, :])
        # restore row t (zeroed by its own update) to the scaled pivot row
        rowsel = (lax.broadcasted_iota(jnp.int32, (1, PANEL, 1), 1) == t)
        xr = jnp.where(rowsel, sr[:, None, :], xr)
        xi = jnp.where(rowsel, si[:, None, :], xi)
    return xr, xi


def _gj_inverse(sr, si):
    """Blocked unpivoted complex Gauss-Jordan inverse of (Bb, Q, Q)."""
    bb = sr.shape[0]
    eye = jnp.broadcast_to(jnp.eye(Q, dtype=jnp.float32), (bb, Q, Q))
    xr = jnp.concatenate([sr, eye], axis=-1)           # (Bb, Q, 2Q)
    xi = jnp.concatenate([si, jnp.zeros_like(eye)], axis=-1)
    col = lax.broadcasted_iota(jnp.int32, (1, Q, 1), 1)
    for k0 in range(0, Q, PANEL):
        rr, ri = _base_inv_rows(xr[:, k0:k0 + PANEL, :],
                                xi[:, k0:k0 + PANEL, :], k0)
        # U = X[:, k0:k0+PANEL] @ R  (complex, batched MXU matmuls)
        cr = xr[:, :, k0:k0 + PANEL]
        ci = xi[:, :, k0:k0 + PANEL]
        ur, ui = _cdot(cr, ci, rr, ri)
        xr = xr - ur
        xi = xi - ui
        rowsel = (col >= k0) & (col < k0 + PANEL)
        # rows k0..k0+PANEL were zeroed by the update; restore to R
        pad_spec = ((0, 0), (k0, Q - k0 - PANEL), (0, 0))
        xr = jnp.where(rowsel, jnp.pad(rr, pad_spec), xr)
        xi = jnp.where(rowsel, jnp.pad(ri, pad_spec), xi)
    return xr[:, :, Q:], xi[:, :, Q:]


POLISH = 0       # Newton-Schulz steps after each line's GJ inverse.
                 # Interpret-mode validated (1.4-8x lower solve error on the
                 # real operator, best on low-freq TM; tests/test_pallas_factor)
                 # but default-off until hardware-validated via
                 # scripts/mfu_probe.py — this runtime has a miscompile history.


def _ns_polish(sr, si, gr, gi):
    """One Newton-Schulz step G <- G + G (I - S G).

    Quadratically contracts the inversion residual (||I - S G|| ~ 1e-3 ->
    1e-6) for two extra complex (Bb, Q, Q) matmuls per line — pure MXU work
    on operands already resident in VMEM, no extra HBM traffic.  This
    polishes the per-line inverse only; f32 rounding of the Schur-chain
    assembly itself is what downstream iterative refinement corrects.
    """
    sgr, sgi = _cdot(sr, si, gr, gi)
    eye = jnp.eye(Q, dtype=jnp.float32)[None]
    er = eye - sgr
    ei = -sgi
    dgr, dgi = _cdot(gr, gi, er, ei)
    return gr + dgr, gi + dgi


def _factor_kernel(dr_ref, di_ref, oy_ref, ozp_ref, gr_ref, gi_ref,
                   gpr, gpi, *, polish: int):
    """One grid step: line j of batch block bb.

    Refs (blocked): dr/di (Bb, 1, Q) line diagonal; oy (Bb, 1, Q) y-coupling
    (entry i couples i <-> i+1, entry Q-1 = 0); ozp (Bb, 1, Q) the INCOMING
    z-coupling c_{j-1} (zeros at j=0).  Outputs gr/gi (Bb, 1, Q, Q).
    Scratch gpr/gpi (Bb, Q, Q) carries G_{j-1} across the sequential j grid
    dimension.
    """
    j = pl.program_id(1)
    dr = dr_ref[0, :, :]                               # (Bb, Q)
    di = di_ref[0, :, :]
    oy = oy_ref[0, :, :]
    ozp = ozp_ref[0, :, :]

    row = lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    col = lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    on_d = (row == col).astype(jnp.float32)[None]
    on_up = (col == row + 1).astype(jnp.float32)[None]
    on_lo = (row == col + 1).astype(jnp.float32)[None]

    # T_j: tridiagonal assembly (matrix entries of the off-diagonals are -oy)
    sr = dr[:, None, :] * on_d - oy[:, :, None] * on_up - oy[:, None, :] * on_lo
    si = di[:, None, :] * on_d

    def invert(sr_, si_):
        gr, gi = _gj_inverse(sr_, si_)
        for _ in range(polish):
            gr, gi = _ns_polish(sr_, si_, gr, gi)
        return gr, gi

    # Schur downdate S -= diag(c) G_prev diag(c)   (c = incoming z-coupling)
    @pl.when(j > 0)
    def _():
        cc = ozp[:, :, None] * ozp[:, None, :]         # (Bb, Q, Q) rank-1
        sr_ref_val = sr - cc * gpr[...]
        si_ref_val = si - cc * gpi[...]
        gr, gi = invert(sr_ref_val, si_ref_val)
        gpr[...] = gr
        gpi[...] = gi

    @pl.when(j == 0)
    def _():
        gr, gi = invert(sr, si)
        gpr[...] = gr
        gpi[...] = gi

    # q-tight output: only the first R (= q rounded up to the sublane tile)
    # rows are stored.  The q..Q-1 pad block is EXACTLY the identity at every
    # line (pad diag = 1, pad couplings = 0, and the padded system stays
    # block-diagonal through downdate, GJ and polish in f32 — zero times
    # anything is exactly zero), so the sweeps reconstruct the pad rows as
    # zeros for free.  Cuts the bandwidth-bound factor-plane traffic by
    # 1 - R/Q (25% on dprism q=95, 37.5% on coprod2 q=75).
    R = gr_ref.shape[-2]
    gr_ref[0, :, :, :] = gpr[:, :R, :]
    gi_ref[0, :, :, :] = gpi[:, :R, :]


def _round_rows(q: int) -> int:
    """q-tight stored row count: q rounded up to the f32 sublane tile (8)."""
    return min(Q, -(-q // 8) * 8)


def _fused_factor_planes(dr, di, oy, ozp, block_b: int, interpret: bool,
                         polish: int | None = None, rows: int = Q):
    """dr/di/oy/ozp are (nzi, B, Q) float32 planes (z-line axis FIRST so the
    block's last two dims are the (8, 128)-tileable (Bb, Q)); B % block_b
    == 0.  Returns (nzi, B, rows, Q) planes (``rows`` <= Q keeps only the
    true-block rows, see the factor kernel's q-tight output note)."""
    nzi, B, _ = dr.shape
    grid = (B // block_b, nzi)
    spec_line = pl.BlockSpec((1, block_b, Q), lambda b, j: (j, b, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_b, rows, Q), lambda b, j: (j, b, 0, 0),
                            memory_space=pltpu.VMEM)
    gr, gi = pl.pallas_call(
        functools.partial(_factor_kernel,
                          polish=POLISH if polish is None else polish),
        grid=grid,
        in_specs=[spec_line] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((nzi, B, rows, Q), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((block_b, Q, Q), jnp.float32)] * 2,
        interpret=interpret,
    )(dr, di, oy, ozp)
    return gr, gi


def fused_schur_factor(diag, offy, offz, block_b: int = 8,
                       interpret: bool = False, polish: int | None = None):
    """Drop-in Schur-complement chain: returns G with the shape/meaning of
    ``bt_factor(...).G`` — (..., nzi, q, q) complex — computed by the fused
    Pallas kernel.  ``diag`` (..., nzi, q) complex64; ``offy`` (..., nzi,
    q-1) and ``offz`` (..., nzi-1, q) real float32.

    Requires q <= 128 (one MXU tile; every reference workload mesh fits:
    dprism q=95, coprod2 q=75).  Batch dims are collapsed and padded up to a
    multiple of ``block_b`` with identity systems.
    """
    q = diag.shape[-1]
    nzi = diag.shape[-2]
    if q > Q:
        raise ValueError(f"fused factor supports q <= {Q}, got {q}")
    batch = diag.shape[:-2]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1

    dr = jnp.real(diag).astype(jnp.float32).reshape(B, nzi, q)
    di = jnp.imag(diag).astype(jnp.float32).reshape(B, nzi, q)
    oy = offy.astype(jnp.float32).reshape(B, nzi, q - 1)
    oz = offz.astype(jnp.float32).reshape(B, nzi - 1, q)

    # pad q -> Q with identity tail (dr = 1 on the pad diagonal) and zero
    # couplings; pad the incoming z-coupling with a zero row at j = 0
    dr = jnp.pad(dr, ((0, 0), (0, 0), (0, Q - q)), constant_values=1.0)
    di = jnp.pad(di, ((0, 0), (0, 0), (0, Q - q)))
    oy = jnp.pad(oy, ((0, 0), (0, 0), (0, Q - (q - 1))))
    ozp = jnp.pad(oz, ((0, 0), (1, 0), (0, Q - q)))

    Bp = -(-B // block_b) * block_b
    if Bp != B:
        pad_b = ((0, Bp - B), (0, 0), (0, 0))
        dr = jnp.pad(dr, pad_b, constant_values=1.0)
        di = jnp.pad(di, pad_b)
        oy = jnp.pad(oy, pad_b)
        ozp = jnp.pad(ozp, pad_b)

    gr, gi = _fused_factor_planes(
        *(jnp.swapaxes(a, 0, 1) for a in (dr, di, oy, ozp)),
        block_b, interpret, polish, rows=_round_rows(q))
    G = lax.complex(gr[:, :B, :q, :q], gi[:, :B, :q, :q])
    return jnp.moveaxis(G, 0, -3).reshape(batch + (nzi, q, q))


# ---------------------------------------------------------------------------
# Plane-layout factorisation + fused triangular sweeps
# ---------------------------------------------------------------------------
#
# The production path never needs the complex G tensor: storing the factors
# in the kernel's native split-plane layout (nzi, Bp, Q, Q) float32 lets the
# solve stream them straight back through two fused sweep kernels, avoiding
# the ~0.7 GB complex materialisation + transpose per factorisation AND the
# 110 per-line XLA dispatches per solve (measured ~25 ms/solve at production
# batch purely in dispatch+scan latency).

INTERPRET = False     # tests flip this to run the kernels interpreted on CPU


class PlanesFactor:
    """Split-plane block-Thomas factors (pytree).

    gr/gi: (nzi, Bp, R, Q) inverse Schur complements, R = q rounded up to
    the sublane tile (q-tight rows — the Q-pad rows are identity and are
    reconstructed as zeros by the sweeps); ozp: (nzi, Bp, Q) incoming
    z-coupling (zero row at j=0); ozn: outgoing (zero at j=nzi-1).
    """

    def __init__(self, gr, gi, ozp, ozn):
        self.gr, self.gi, self.ozp, self.ozn = gr, gi, ozp, ozn


jax.tree_util.register_pytree_node(
    PlanesFactor,
    lambda f: ((f.gr, f.gi, f.ozp, f.ozn), None),
    lambda _, c: PlanesFactor(*c))


def _prep_planes(diag, offy, offz, block_b):
    """Common input prep: collapse batch, split, pad q->Q and B->Bp, put the
    z-line axis first.  Returns (planes..., B, q, batch_shape)."""
    q = diag.shape[-1]
    nzi = diag.shape[-2]
    if q > Q:
        raise ValueError(f"fused factor supports q <= {Q}, got {q}")
    batch = diag.shape[:-2]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1

    dr = jnp.real(diag).astype(jnp.float32).reshape(B, nzi, q)
    di = jnp.imag(diag).astype(jnp.float32).reshape(B, nzi, q)
    oy = offy.astype(jnp.float32).reshape(B, nzi, q - 1)
    oz = offz.astype(jnp.float32).reshape(B, nzi - 1, q)

    dr = jnp.pad(dr, ((0, 0), (0, 0), (0, Q - q)), constant_values=1.0)
    di = jnp.pad(di, ((0, 0), (0, 0), (0, Q - q)))
    oy = jnp.pad(oy, ((0, 0), (0, 0), (0, Q - (q - 1))))
    ozp = jnp.pad(oz, ((0, 0), (1, 0), (0, Q - q)))
    ozn = jnp.pad(oz, ((0, 0), (0, 1), (0, Q - q)))

    Bp = -(-B // block_b) * block_b
    if Bp != B:
        pad_b = ((0, Bp - B), (0, 0), (0, 0))
        dr = jnp.pad(dr, pad_b, constant_values=1.0)
        di = jnp.pad(di, pad_b)
        oy = jnp.pad(oy, pad_b)
        ozp = jnp.pad(ozp, pad_b)
        ozn = jnp.pad(ozn, pad_b)
    sw = lambda a: jnp.swapaxes(a, 0, 1)
    return sw(dr), sw(di), sw(oy), sw(ozp), sw(ozn), B, q, batch


def fused_schur_factor_planes(diag, offy, offz, block_b: int = 8) -> PlanesFactor:
    """Factorise and keep the factors in kernel plane layout (no complex G)."""
    dr, di, oy, ozp, ozn, _B, q, _batch = _prep_planes(diag, offy, offz,
                                                       block_b)
    gr, gi = _fused_factor_planes(dr, di, oy, ozp, block_b, INTERPRET,
                                  rows=_round_rows(q))
    return PlanesFactor(gr, gi, ozp, ozn)


def _pad_rows_to_Q(y):
    """(Bb, R) -> (Bb, Q): the q-tight factor rows cover the true block; the
    Q-pad entries of the solution are exactly zero (identity pad, zero rhs)."""
    R = y.shape[-1]
    if R == Q:
        return y
    return jnp.concatenate(
        [y, jnp.zeros(y.shape[:-1] + (Q - R,), y.dtype)], axis=-1)


def _sweep_fwd_kernel(gr_ref, gi_ref, c_ref, br_ref, bi_ref,
                      yr_ref, yi_ref, pr, pi):
    """y_j = G_j @ (b_j + c_j * y_{j-1}), scratch carries y across j."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        pr[...] = jnp.zeros_like(pr)
        pi[...] = jnp.zeros_like(pi)

    c = c_ref[0]                                        # (Bb, Q)
    vr = br_ref[0] + c * pr[...]
    vi = bi_ref[0] + c * pi[...]
    gr = gr_ref[0]                                      # (Bb, R, Q)
    gi = gi_ref[0]
    yr = (jnp.sum(gr * vr[:, None, :], axis=-1)
          - jnp.sum(gi * vi[:, None, :], axis=-1))      # (Bb, R)
    yi = (jnp.sum(gr * vi[:, None, :], axis=-1)
          + jnp.sum(gi * vr[:, None, :], axis=-1))
    yr, yi = _pad_rows_to_Q(yr), _pad_rows_to_Q(yi)
    pr[...] = yr
    pi[...] = yi
    yr_ref[0] = yr
    yi_ref[0] = yi


def _sweep_bwd_kernel(gr_ref, gi_ref, c_ref, yr_ref, yi_ref,
                      xr_ref, xi_ref, pr, pi):
    """x_j = y_j + G_j @ (c_j * x_{j+1}); the grid's j runs REVERSED via the
    index maps (block j here is line nzi-1-j)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        pr[...] = jnp.zeros_like(pr)
        pi[...] = jnp.zeros_like(pi)

    c = c_ref[0]
    vr = c * pr[...]
    vi = c * pi[...]
    gr = gr_ref[0]                                      # (Bb, R, Q)
    gi = gi_ref[0]
    xr = yr_ref[0] + _pad_rows_to_Q(
        jnp.sum(gr * vr[:, None, :], axis=-1)
        - jnp.sum(gi * vi[:, None, :], axis=-1))
    xi = yi_ref[0] + _pad_rows_to_Q(
        jnp.sum(gr * vi[:, None, :], axis=-1)
        + jnp.sum(gi * vr[:, None, :], axis=-1))
    pr[...] = xr
    pi[...] = xi
    xr_ref[0] = xr
    xi_ref[0] = xi


def _sweeps(fac: PlanesFactor, br, bi, block_b: int):
    """Both triangular sweeps; br/bi are (nzi, Bp, Q) planes."""
    nzi, Bp, _ = br.shape
    R = fac.gr.shape[-2]
    grid = (Bp // block_b, nzi)
    mat = pl.BlockSpec((1, block_b, R, Q), lambda b, j: (j, b, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, block_b, Q), lambda b, j: (j, b, 0),
                       memory_space=pltpu.VMEM)
    mat_r = pl.BlockSpec((1, block_b, R, Q),
                         lambda b, j, n=nzi: (n - 1 - j, b, 0, 0),
                         memory_space=pltpu.VMEM)
    vec_r = pl.BlockSpec((1, block_b, Q),
                         lambda b, j, n=nzi: (n - 1 - j, b, 0),
                         memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_shape=[jax.ShapeDtypeStruct((nzi, Bp, Q), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((block_b, Q), jnp.float32)] * 2,
        interpret=INTERPRET,
    )
    yr, yi = pl.pallas_call(
        _sweep_fwd_kernel, in_specs=[mat, mat, vec, vec, vec],
        out_specs=[vec, vec], **common)(fac.gr, fac.gi, fac.ozp, br, bi)
    xr, xi = pl.pallas_call(
        _sweep_bwd_kernel, in_specs=[mat_r, mat_r, vec_r, vec_r, vec_r],
        out_specs=[vec_r, vec_r], **common)(fac.gr, fac.gi, fac.ozn, yr, yi)
    return xr, xi


def fused_bt_solve(fac: PlanesFactor, b, block_b: int = 8):
    """Solve with plane-layout factors; ``b`` is (..., nzi, q) complex with
    any leading batch axes (collapsed in C order, exactly as the factor's
    batch was).  Complex-symmetric, so this is also the transpose solve."""
    q = b.shape[-1]
    nzi = b.shape[-2]
    batch = b.shape[:-2]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    Bp = fac.gr.shape[1]

    br = jnp.real(b).astype(jnp.float32).reshape(B, nzi, q)
    bi = jnp.imag(b).astype(jnp.float32).reshape(B, nzi, q)
    pad = ((0, Bp - B), (0, 0), (0, Q - q))
    br = jnp.swapaxes(jnp.pad(br, pad), 0, 1)
    bi = jnp.swapaxes(jnp.pad(bi, pad), 0, 1)
    xr, xi = _sweeps(fac, br, bi, block_b)
    x = lax.complex(xr[:, :B, :q], xi[:, :B, :q])
    return jnp.swapaxes(x, 0, 1).reshape(batch + (nzi, q)).astype(b.dtype)
