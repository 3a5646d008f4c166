"""CPU (numpy/scipy) reference assembly used as a test oracle and CPU baseline.

This module deliberately mirrors the reference's sparse Kronecker-product
construction (HMCMT/src/MTFwdSolver/MT2DOperators.jl and
MT2DFwdSolver.jl:124-161) so the matrix-free TPU stencil in
:mod:`hmcmt2d_tpu.mesh` can be verified entry-by-entry against an
independently assembled sparse matrix.  It is **not** part of the TPU compute
path.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..constants import MU0


def spunit(n):
    return sp.identity(n, format="csr")


def sdiag(v):
    return sp.diags(np.asarray(v))


def ddx(n):
    """1-D node-to-center difference (MT2DOperators.jl:161-163)."""
    return sp.diags([-np.ones(n), np.ones(n)], [0, 1], shape=(n, n + 1))


def av(n):
    """1-D node-to-center averaging (MT2DOperators.jl:172-174)."""
    return sp.diags([0.5 * np.ones(n), 0.5 * np.ones(n)], [0, 1], shape=(n, n + 1))


def avcn(n):
    """1-D center-to-node averaging with unit boundary weights
    (MT2DOperators.jl:183-190)."""
    A = sp.lil_matrix((n + 1, n))
    A[0, 0] = 1.0
    A[n, n - 1] = 1.0
    for k in range(1, n):
        A[k, k - 1] = 0.5
        A[k, k] = 0.5
    return A.tocsr()


def nodal_gradient(dy, dz):
    """Length-scaled nodal gradient [G1; G2] (getNodalGradient2D,
    MT2DOperators.jl:35-48 with meshGeoEdgeInv2D :104-115)."""
    ny, nz = len(dy), len(dz)
    G1 = sp.kron(spunit(nz + 1), ddx(ny))
    G2 = sp.kron(ddx(nz), spunit(ny + 1))
    L1 = sp.kron(spunit(nz + 1), sdiag(1.0 / np.asarray(dy)))
    L2 = sp.kron(sdiag(1.0 / np.asarray(dz)), spunit(ny + 1))
    return sp.vstack([L1 @ G1, L2 @ G2]).tocsr()


def cell_gradient(dy, dz):
    """Unscaled cell gradient (getCellGradient2D, MT2DOperators.jl:52-63)."""
    ny, nz = len(dy), len(dz)
    G1 = sp.kron(spunit(nz), ddx(ny - 1))
    G2 = sp.kron(ddx(nz - 1), spunit(ny))
    return sp.vstack([G1, G2]).tocsr()


def face_area(dy, dz):
    """meshGeoFace2D (MT2DOperators.jl:84-88)."""
    return sp.kron(sdiag(dz), sdiag(dy))


def ave_cell_to_node(ny, nz):
    """aveCell2Node2D (MT2DOperators.jl:118-122)."""
    return sp.kron(avcn(nz), avcn(ny))


def ave_cell_to_face(ny, nz):
    """aveCell2Face2D (MT2DOperators.jl:126-130): [A2; A1] with A2 the
    y-edge (z-averaging) block."""
    A1 = sp.kron(spunit(nz), avcn(ny))
    A2 = sp.kron(avcn(nz), spunit(ny))
    return sp.vstack([A2, A1]).tocsr()


def assemble_mode_matrices(dy, dz, sigma, mode):
    """Real and imaginary full-grid matrices (A = dGrad + i*omega*Mcn) for one
    mode, mirroring MT2DFwdSolver.jl:124-135 (TE) / :150-161 (TM).

    ``sigma`` is the flat cell vector (y-fastest).  Returns (dGrad, Mcn) as
    sparse matrices over all (ny+1)*(nz+1) nodes.
    """
    ny, nz = len(dy), len(dz)
    F = face_area(dy, dz)
    Grad = nodal_gradient(dy, dz)
    AveCN = ave_cell_to_node(ny, nz)
    AveCF = ave_cell_to_face(ny, nz)
    mu = MU0 * np.ones(ny * nz)
    if mode == "TE":
        face_q, node_q = 1.0 / mu, sigma
    elif mode == "TM":
        face_q, node_q = 1.0 / sigma, mu
    else:
        raise ValueError(mode)
    Mface = sdiag(AveCF @ (F @ face_q))
    Mnode = sdiag(AveCN @ (F @ node_q))
    dGrad = (Grad.T @ Mface @ Grad).tocsr()
    return dGrad, Mnode.tocsr()


def boundary_index(ny, nz):
    """Inner/outer node index split (getBoundaryIndex, MT2DFwdSolver.jl:227-248),
    0-based, y-fastest node ordering."""
    idx = np.arange((ny + 1) * (nz + 1)).reshape(nz + 1, ny + 1)
    ii = idx[1:-1, 1:-1].ravel()
    it = idx[0, :]
    il = idx[1:, 0]
    ir = idx[1:, -1]
    ib = idx[-1, 1:-1]
    io = np.concatenate([it, il, ir, ib])
    return ii, io


def dense_operator(dy, dz, sigma, mode, omega):
    """Full complex operator A(omega) over all nodes as a sparse matrix."""
    dGrad, Mnode = assemble_mode_matrices(dy, dz, sigma, mode)
    return (dGrad + 1j * omega * Mnode).tocsr()
