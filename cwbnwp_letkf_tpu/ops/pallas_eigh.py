"""Batched small-k symmetric eigendecomposition as a Pallas TPU kernel.

The LETKF solve needs one k-by-k (k = ensemble size, 20-100) symmetric
eigendecomposition per gridpoint — millions of tiny eigh's per cycle
(/root/reference/module_eigen.f90:37-76 does one LAPACK dsyevd per point).
XLA lowers ``jnp.linalg.eigh`` to a generic QR-based custom call that is not
tuned for huge batches of tiny matrices; this kernel instead runs classic
cyclic two-sided Jacobi **vectorized across the batch**: matrices are held
in VMEM batch-last ``[k, k, 128]`` so every (p, q) rotation is an elementwise
update over 128 lanes — VPU-shaped with zero cross-lane traffic.

Contract matches ``jnp.linalg.eigh`` up to eigenvalue ORDER: returns
``(lam [B, k], v [B, k, k])`` with ``a = v @ diag(lam) @ v.T`` per matrix,
but ``lam`` is NOT sorted.  The LETKF solver only forms ``V f(diag) V^T``
(ops/solver.py), which is order-invariant, so no sort is needed.

Gated behind ``solver_eigh="jacobi"`` / the ``use_pallas_eigh`` flag
(SURVEY.md section 7 step 6: Pallas kernels last, behind flags).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _rotation_pairs(k: int) -> np.ndarray:
    """Cyclic-by-row (p, q) sweep order, p < q (Golub & Van Loan 8.4)."""
    return np.array([(p, q) for p in range(k) for q in range(p + 1, k)],
                    np.int32)


def _jacobi_kernel(pq_ref, a_ref, lam_ref, v_ref, a_s, v_s, *, k: int,
                   sweeps: int):
    """One batch tile: eigendecompose ``a_ref [LANES, k, k]``.

    a_s / v_s: VMEM scratch ``[k, k, LANES]`` batch-last working copies.
    pq_ref: SMEM ``[k*(k-1)/2, 2]`` rotation schedule (scalar-prefetched).
    """
    # Batch-last relayout: every rotation update becomes [*, LANES] slabs.
    a_s[:] = jnp.transpose(a_ref[:], (1, 2, 0))
    # 3-D iota comparison: Mosaic cannot reshape an i1 vector to add a minor
    # dim, so build the broadcast identity directly at [k, k, LANES].
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (k, k, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (k, k, LANES), 1))
    v_s[:] = eye3.astype(a_s.dtype)

    n_rot = (k * (k - 1)) // 2
    tiny = jnp.asarray(1e-30, a_s.dtype)

    def rotate(j, _):
        p = pq_ref[j, 0]
        q = pq_ref[j, 1]
        apq = a_s[p, q, :]                       # [LANES]
        app = a_s[p, p, :]
        aqq = a_s[q, q, :]

        # Symmetric Schur 2x2: zero A[p,q] (Golub & Van Loan alg 8.4.1).
        # Guarded so |apq| ~ 0 yields the identity rotation exactly.
        nz = jnp.abs(apq) > tiny
        apq_safe = jnp.where(nz, apq, 1.0)
        tau = (aqq - app) / (2.0 * apq_safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)        # tau=0 -> t=1 (45 degrees)
        t = jnp.where(nz, t, 0.0)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c

        # Row update: A <- J^T A  (J[p,p]=c, J[q,q]=c, J[p,q]=s, J[q,p]=-s)
        ap = a_s[p, :, :]                        # [k, LANES]
        aq = a_s[q, :, :]
        a_s[p, :, :] = c * ap - s * aq
        a_s[q, :, :] = s * ap + c * aq
        # Column update: A <- A J
        ap = a_s[:, p, :]
        aq = a_s[:, q, :]
        a_s[:, p, :] = c * ap - s * aq
        a_s[:, q, :] = s * ap + c * aq
        # Eigenvector accumulation: V <- V J
        vp = v_s[:, p, :]
        vq = v_s[:, q, :]
        v_s[:, p, :] = c * vp - s * vq
        v_s[:, q, :] = s * vp + c * vq
        return 0

    jax.lax.fori_loop(0, sweeps * n_rot,
                      lambda i, carry: rotate(i % n_rot, carry), 0)

    a_fin = a_s[:]                               # [k, k, LANES]
    diag3 = (jax.lax.broadcasted_iota(jnp.int32, (k, k, LANES), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (k, k, LANES), 1))
    lam = jnp.sum(jnp.where(diag3, a_fin, 0.0), axis=1)            # [k,LANES]
    lam_ref[:] = jnp.transpose(lam, (1, 0))
    v_ref[:] = jnp.transpose(v_s[:], (2, 0, 1))


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret", "polish"))
def jacobi_eigh(a, *, sweeps: int = 10, interpret: bool = False,
                polish: bool = True):
    """Batched symmetric eigendecomposition, Jacobi-in-Pallas.

    Args:
      a: ``[B, k, k]`` float32 symmetric matrices.
      sweeps: cyclic Jacobi sweeps; 10 reaches float32 machine precision for
        k <= 100 (off-diagonal decays quadratically).
      interpret: run in the Pallas interpreter (CPU testing).
      polish: one Newton orthogonalization of V (``V(3I - V^T V)/2``) plus a
        Rayleigh recompute of the eigenvalues (``diag(V^T A V)``) after the
        sweeps.  The k*(k-1)/2-per-sweep sequential rotations accumulate
        float32 (and on TPU, low-precision rsqrt) rounding in V; the polish
        is 4 batched MXU matmuls and cuts the reconstruction error ~10x
        (measured), at negligible cost next to the sweeps.

    Returns ``(lam [B, k], v [B, k, k])``, unsorted; ``a ~= v diag(lam) v^T``.
    """
    b, k, k2 = a.shape
    assert k == k2, a.shape
    b_pad = -(-b // LANES) * LANES
    if b_pad != b:
        pad = jnp.broadcast_to(jnp.eye(k, dtype=a.dtype), (b_pad - b, k, k))
        a = jnp.concatenate([a, pad], axis=0)

    pq = jnp.asarray(_rotation_pairs(k))
    grid = (b_pad // LANES,)
    lam, v = pl.pallas_call(
        functools.partial(_jacobi_kernel, k=k, sweeps=sweeps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((LANES, k, k), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((LANES, k), lambda i, *_: (i, 0)),
                pl.BlockSpec((LANES, k, k), lambda i, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((k, k, LANES), a.dtype),
                pltpu.VMEM((k, k, LANES), a.dtype),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k), a.dtype),
            jax.ShapeDtypeStruct((b_pad, k, k), a.dtype),
        ],
        interpret=interpret,
    )(pq, a)
    lam, v = lam[:b], v[:b]
    if polish:
        # Full-f32 multiplies: TPU matmuls default to bf16 inputs, which
        # would *undo* the sweeps' precision instead of refining it.
        hi = jax.lax.Precision.HIGHEST
        a = a[:b]
        eye = jnp.eye(k, dtype=a.dtype)
        vtv = jnp.einsum("bki,bkj->bij", v, v, precision=hi,
                         preferred_element_type=a.dtype)
        v = jnp.einsum("bij,bjk->bik", v, 1.5 * eye - 0.5 * vtv,
                       precision=hi, preferred_element_type=a.dtype)
        av = jnp.einsum("bij,bjk->bik", a, v, precision=hi,
                        preferred_element_type=a.dtype)
        lam = jnp.einsum("bki,bki->bi", v, av, precision=hi,
                         preferred_element_type=a.dtype)
    return lam, v
