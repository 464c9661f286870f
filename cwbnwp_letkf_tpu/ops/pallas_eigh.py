"""Batched small-k symmetric eigendecomposition as a Pallas TPU kernel.

The LETKF solve needs one k-by-k (k = ensemble size, 20-100) symmetric
eigendecomposition per gridpoint — millions of tiny eigh's per cycle
(/root/reference/module_eigen.f90:37-76 does one LAPACK dsyevd per point).
XLA lowers ``jnp.linalg.eigh`` to a generic QR-based custom call that is not
tuned for huge batches of tiny matrices; this kernel instead runs classic
cyclic two-sided Jacobi **vectorized across the batch**: matrices are held
in VMEM batch-last ``[k, k, 128]`` so every (p, q) rotation is an elementwise
update over 128 lanes — VPU-shaped with zero cross-lane traffic.

VMEM discipline (the round-1 kernel OOMed the 16 MB scoped limit at k=40):
the ``[B, k, k] <-> [k, k, B]`` batch-last relayout happens OUTSIDE the
kernel as an XLA transpose, so (a) the kernel contains no Mosaic relayout
transposes (whose stack temporaries dominated the old footprint) and (b) the
in/out blocks have a native 128-lane minor dimension instead of a k-wide
minor padded to 128 lanes (3.2x waste at k=40).  ``vmem_limit_bytes`` is
raised to the measured need with headroom, and :func:`jacobi_vmem_bytes`
lets callers fall back to XLA eigh when k is too large for the kernel.

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
_SUBLANES = 8

#: Usable VMEM per core with headroom (v5e/v5p have 128 MB; leave room for
#: Mosaic stack temporaries, which the block estimate cannot see).
VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def _pad8(n: int) -> int:
    return -(-n // _SUBLANES) * _SUBLANES


def jacobi_vmem_bytes(k: int, dtype_bytes: int = 4) -> int:
    """Estimated VMEM footprint of one kernel instance at ensemble size k.

    Counts double-buffered in/out blocks plus scratch, all batch-last with a
    128-lane minor dim (sublane dim padded to 8).  Stack temporaries are
    covered by the budget headroom, not the estimate.
    """
    blk = _pad8(k) * k * LANES * dtype_bytes          # [k, k, LANES] block
    lam = _pad8(k) * LANES * dtype_bytes              # wrong orient, tiny
    in_out = 2 * blk + 2 * blk + 2 * lam              # double-buffered a, v
    if k >= 4 and k % 2 == 0:
        m = k // 2
        scratch = 4 * (m * _pad8(m) * LANES * dtype_bytes)
        scratch += 2 * (k * _pad8(m) * LANES * dtype_bytes)
    else:
        scratch = 2 * blk
    return in_out + scratch


def _rotation_pairs(k: int) -> np.ndarray:
    """Cyclic-by-row (p, q) sweep order, p < q (Golub & Van Loan 8.4)."""
    return np.array([(p, q) for p in range(k) for q in range(p + 1, k)],
                    np.int32)


def _jacobi_kernel(pq_ref, a_ref, lam_ref, v_ref, a_s, v_s, *, k: int,
                   sweeps: int):
    """One batch tile: eigendecompose ``a_ref [k, k, LANES]`` (batch-last).

    a_s / v_s: VMEM scratch ``[k, k, LANES]`` working copies.
    pq_ref: SMEM ``[k*(k-1)/2, 2]`` rotation schedule (scalar-prefetched).
    """
    a_s[:] = a_ref[:]
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
        return jnp.int32(0)

    # int32 bounds, carry AND modulus: under jax_enable_x64 Python ints trace
    # as i64, which Mosaic cannot legalize (the round-2 bench crash —
    # "func.return ... (i64, i64, i32)"; a Python-int modulus likewise
    # promotes `i % n_rot` to i64 and recurses Mosaic's convert lowering).
    # The kernel must compile under x64 because the bench/parity configs
    # enable it globally for the f64 measurements.
    n_rot32 = jnp.int32(n_rot)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(sweeps * n_rot),
                      lambda i, carry: rotate(jax.lax.rem(i, n_rot32), carry),
                      jnp.int32(0))

    a_fin = a_s[:]                               # [k, k, LANES]
    diag3 = (jax.lax.broadcasted_iota(jnp.int32, (k, k, LANES), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (k, k, LANES), 1))
    lam_ref[:] = jnp.sum(jnp.where(diag3, a_fin, 0.0), axis=1)     # [k,LANES]
    v_ref[:] = v_s[:]


def _parallel_jacobi_kernel(a_ref, lam_ref, v_ref, att_s, atb_s, abt_s,
                            abb_s, vt_s, vb_s, *, k: int, sweeps: int):
    """One batch tile, parallel-order (round-robin) cyclic Jacobi.

    Input/output blocks are batch-last ``[k, k, LANES]``.  Where
    :func:`_jacobi_kernel` applies the k(k-1)/2 rotations of a sweep
    one at a time, this kernel pairs the k rows/columns into m = k/2
    disjoint (top_i, bot_i) couples and applies all m rotations of a round
    simultaneously as full-block elementwise updates — a sweep is k-1
    rounds instead of k(k-1)/2 sequential slab updates, the classic
    Brent-Luk systolic arrangement.  Between rounds the pairing advances by
    the round-robin tournament permutation, realized physically: rows and
    columns are moved so the current couples are always (top_i, bot_i),
    i.e. the working matrix is stored as four [m, m, LANES] blocks
    (top/bot rows x top/bot cols) and the permutation is three static-slice
    concatenations per block axis.  Eigenpairs come out in the accumulated
    permutation order — unsorted, like the sequential kernel, but V's
    columns are permuted consistently so (lam_j, v_j) always match.
    """
    m = k // 2
    dtype = att_s.dtype
    # block split, already batch-last — plain static-slice copies
    att_s[:] = a_ref[:m, :m, :]
    atb_s[:] = a_ref[:m, m:, :]
    abt_s[:] = a_ref[m:, :m, :]
    abb_s[:] = a_ref[m:, m:, :]
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (k, m, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (k, m, LANES), 1))
    vt_s[:] = eye3.astype(dtype)                    # columns 0..m-1 of I
    eye3b = (jax.lax.broadcasted_iota(jnp.int32, (k, m, LANES), 0)
             == (jax.lax.broadcasted_iota(jnp.int32, (k, m, LANES), 1) + m))
    vb_s[:] = eye3b.astype(dtype)                   # columns m..k-1 of I

    diag_mask = (jax.lax.broadcasted_iota(jnp.int32, (m, m, LANES), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (m, m, LANES), 1))
    tiny = jnp.asarray(1e-30, dtype)

    def round_fn(_, carry):
        # Full-value round: read the six blocks once, rotate and permute as
        # values, write each block once.  (The round-1 kernel rotated and
        # permuted in place via 10 read-modify-write pairs per round to stay
        # under the 16 MB scoped-VMEM stack; with the relayouts hoisted out
        # and vmem_limit_bytes raised, the value form compiles and roughly
        # halves VMEM block traffic.)
        a_tt, a_tb = att_s[:], atb_s[:]
        a_bt, a_bb = abt_s[:], abb_s[:]
        v_t, v_b = vt_s[:], vb_s[:]

        # m simultaneous symmetric Schur 2x2 solves from the block diagonals
        app = jnp.sum(jnp.where(diag_mask, a_tt, 0.0), axis=1)      # [m, L]
        aqq = jnp.sum(jnp.where(diag_mask, a_bb, 0.0), axis=1)
        apq = jnp.sum(jnp.where(diag_mask, a_tb, 0.0), axis=1)
        nz = jnp.abs(apq) > tiny
        apq_safe = jnp.where(nz, apq, 1.0)
        tau = (aqq - app) / (2.0 * apq_safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(nz, t, 0.0)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        c_r = c[:, None, :]                         # rotate rows   [m,1,L]
        s_r = s[:, None, :]
        c_c = c[None, :, :]                         # rotate cols   [1,m,L]
        s_c = s[None, :, :]

        # A <- J^T A (row couples), then A <- A J (column couples)
        r_tt = c_r * a_tt - s_r * a_bt
        r_bt = s_r * a_tt + c_r * a_bt
        r_tb = c_r * a_tb - s_r * a_bb
        r_bb = s_r * a_tb + c_r * a_bb
        a_tt = c_c * r_tt - s_c * r_tb
        a_tb = s_c * r_tt + c_c * r_tb
        a_bt = c_c * r_bt - s_c * r_bb
        a_bb = s_c * r_bt + c_c * r_bb
        # V <- V J (column couples only)
        n_vt = c_c * v_t - s_c * v_b
        n_vb = s_c * v_t + c_c * v_b

        # round-robin advance (player 0 fixed), fused into the writes:
        #   new_top = [top0, bot0, top1..top_{m-2}]
        #   new_bot = [bot1..bot_{m-1}, top_{m-1}]
        if m > 1:
            def prow(t, b):
                return (jnp.concatenate([t[:1], b[:1], t[1:m - 1]], 0),
                        jnp.concatenate([b[1:], t[m - 1:]], 0))

            def pcol(t, b):
                return (jnp.concatenate([t[:, :1], b[:, :1],
                                         t[:, 1:m - 1]], 1),
                        jnp.concatenate([b[:, 1:], t[:, m - 1:]], 1))

            p_tt, p_bt = prow(a_tt, a_bt)   # top-col halves of row couples
            p_tb, p_bb = prow(a_tb, a_bb)   # bot-col halves
            a_tt, a_tb = pcol(p_tt, p_tb)   # top-row halves of col couples
            a_bt, a_bb = pcol(p_bt, p_bb)   # bot-row halves
            n_vt, n_vb = pcol(n_vt, n_vb)

        att_s[:], atb_s[:] = a_tt, a_tb
        abt_s[:], abb_s[:] = a_bt, a_bb
        vt_s[:], vb_s[:] = n_vt, n_vb
        return carry

    # int32 bounds/carry: Python ints trace as i64 under jax_enable_x64 and
    # fail Mosaic legalization (the round-2 bench crash; see _jacobi_kernel).
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(sweeps * (k - 1)), round_fn,
                      jnp.int32(0))

    lam_t = jnp.sum(jnp.where(diag_mask, att_s[:], 0.0), axis=1)  # [m, LANES]
    lam_b = jnp.sum(jnp.where(diag_mask, abb_s[:], 0.0), axis=1)
    lam_ref[:m, :] = lam_t
    lam_ref[m:, :] = lam_b
    v_ref[:, :m, :] = vt_s[:]
    v_ref[:, m:, :] = vb_s[:]


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret", "polish"))
def jacobi_eigh(a, *, sweeps: int = 7, interpret: bool = False,
                polish: bool = True):
    """Batched symmetric eigendecomposition, Jacobi-in-Pallas.

    Args:
      a: ``[B, k, k]`` float32 symmetric matrices.
      sweeps: cyclic Jacobi sweeps; 7 reaches float32 machine precision for
        k <= 100 (off-diagonal decays quadratically; measured 1.3e-6 max
        relative reconstruction error at k=40 on LETKF-spectrum matrices,
        identical to 10 sweeps).
      interpret: run in the Pallas interpreter (CPU testing).
      polish: one Newton orthogonalization of V (``V(3I - V^T V)/2``) plus a
        Rayleigh recompute of the eigenvalues (``diag(V^T A V)``) after the
        sweeps.  The sequential rotations accumulate float32 (and on TPU,
        low-precision rsqrt) rounding in V; the polish is 4 batched MXU
        matmuls and cuts the reconstruction error ~10x (measured), at
        negligible cost next to the sweeps.

    Even k >= 4 dispatches to the parallel-order kernel
    (:func:`_parallel_jacobi_kernel`: k-1 block rounds per sweep); odd or
    tiny k uses the sequential-rotation kernel.

    Returns ``(lam [B, k], v [B, k, k])``, unsorted; ``a ~= v diag(lam) v^T``.
    """
    b, k, k2 = a.shape
    assert k == k2, a.shape
    b_pad = -(-b // LANES) * LANES
    if b_pad != b:
        pad = jnp.broadcast_to(jnp.eye(k, dtype=a.dtype), (b_pad - b, k, k))
        a_in = jnp.concatenate([a, pad], axis=0)
    else:
        a_in = a

    # Batch-last relayout OUTSIDE the kernel: XLA handles the [B,k,k] ->
    # [k,k,B] transpose in HBM; the kernel sees native 128-lane blocks and
    # needs no Mosaic relayouts (which blew the scoped-VMEM stack at k=40).
    at = jnp.transpose(a_in, (1, 2, 0))              # [k, k, b_pad]

    grid = (b_pad // LANES,)
    # index_map zeros must be int32: under jax_enable_x64 a Python-int 0
    # returned from a traced index_map becomes an i64 constant, and Mosaic
    # fails to legalize the map's func.return (the round-2 bench crash:
    # '"func.return"(%0, %0, %arg0) : (i64, i64, i32)').
    z32 = np.int32(0)
    out_shape = [
        jax.ShapeDtypeStruct((k, b_pad), a.dtype),
        jax.ShapeDtypeStruct((k, k, b_pad), a.dtype),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET_BYTES)
    if k >= 4 and k % 2 == 0:
        m = k // 2
        lam_t, v_t = pl.pallas_call(
            functools.partial(_parallel_jacobi_kernel, k=k, sweeps=sweeps),
            grid=grid,
            in_specs=[pl.BlockSpec((k, k, LANES), lambda i: (z32, z32, i))],
            out_specs=[
                pl.BlockSpec((k, LANES), lambda i: (z32, i)),
                pl.BlockSpec((k, k, LANES), lambda i: (z32, z32, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((m, m, LANES), a.dtype),
                pltpu.VMEM((m, m, LANES), a.dtype),
                pltpu.VMEM((m, m, LANES), a.dtype),
                pltpu.VMEM((m, m, LANES), a.dtype),
                pltpu.VMEM((k, m, LANES), a.dtype),
                pltpu.VMEM((k, m, LANES), a.dtype),
            ],
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(at)
    else:
        pq = jnp.asarray(_rotation_pairs(k))
        lam_t, v_t = pl.pallas_call(
            functools.partial(_jacobi_kernel, k=k, sweeps=sweeps),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((k, k, LANES), lambda i, *_: (z32, z32, i)),
                ],
                out_specs=[
                    pl.BlockSpec((k, LANES), lambda i, *_: (z32, i)),
                    pl.BlockSpec((k, k, LANES), lambda i, *_: (z32, z32, i)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((k, k, LANES), a.dtype),
                    pltpu.VMEM((k, k, LANES), a.dtype),
                ],
            ),
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(pq, at)
    lam = jnp.transpose(lam_t, (1, 0))[:b]
    v = jnp.transpose(v_t, (2, 0, 1))[:b]
    if polish:
        # Full-f32 multiplies: TPU matmuls default to bf16 inputs, which
        # would *undo* the sweeps' precision instead of refining it.
        hi = jax.lax.Precision.HIGHEST
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
