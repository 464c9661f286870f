"""Pallas TPU kernel: batched Newton-Schulz inverse square root.

The production LETKF cycle is SOLVE-bound (round-5 profile,
PROFILE_CYCLE_r05.json: the Z-builds are 3.4 s of the 4.7 s fused-cycle
wall at 327,680 points x 16 variables), and the solve is ``ns_invsqrt``
(ops/solver.py) — batched ``[B, k, k]`` matmuls with k = ensemble size
= 40.  On the 128x128 MXU a 40x40x40 matmul pads its contraction and lane
dimensions to 128, capping utilization at (40/128)^2 ~ 9.8%; XLA's
batched-gemm lowering achieves 4.3% measured (BENCH_r03.json), i.e. the
solve runs at ~1/20 of the chip's matmul rate.

This kernel restructures the iteration around two facts:

1. **Every iterate is a polynomial in A.**  The coupled iteration
   (Higham alg. 6.21; see ops/solver.ns_invsqrt) tracks ``Y -> sqrt(A_c)``
   and ``Z -> A_c^(-1/2)``; all of ``Y, Z, T, W = ZY`` commute and are
   symmetric.  Tracking ``W`` and ``Z`` directly gives a step whose every
   product has the SAME left operand ``T = (3I - W)/2``:

       W_0 = A_c,   Z_0 = I
       T   = (3I - W) / 2
       Z' <- T Z
       W' <- T (T W)          (= T W T by commutation = Z'Y')

   (The matrix multiplied from the left is always T, which is what makes
   the element packing below possible.)

2. **Row-of-blocks x block-diagonal packing fills the MXU.**  With
   m = 128 // k elements per pack (m=3 at k=40), the LHS
   ``[T_1 T_2 ... T_m]`` is a dense ``[k, m*k]`` row of blocks and the RHS
   ``blkdiag(X_1, ..., X_m)`` is ``[m*k, m*k]``; their product's column
   block e is exactly ``T_e X_e``.  The matmul's padded cost is
   ``k * 128 * pad(m*k)`` for ``m`` products' useful work — utilization
   rises to ``m * k^2 * k / (k * 128 * 128) = m * (k/128)^2`` ~ 29% at
   k=40, a 3x higher ceiling than per-element batching, with the M
   dimension (unpadded sublanes) carrying the k output rows.

   Both RHS uses per step (the ``W`` and ``Z`` block-diagonals) share the
   left operand, so round A packs them side by side in one
   ``[k, m*k] @ [m*k, 256]`` matmul; round B is ``[k, m*k] @ [m*k, m*k]``.

The whole iteration runs in VMEM (one HBM read of A, one write of Z per
element); a block-level ``while_loop`` reproduces ops/solver.ns_invsqrt's
tolerance semantics (stop when ``max|W - I| <= tol`` over the block, cap at
``max_iters``), and the final per-block residual is returned as the same
convergence certificate the XLA path emits.

Replaces the reference's per-gridpoint LAPACK ``dsyevd``
(/root/reference/module_eigen.f90:37-108, called from
module_letkf_core.f90:655-668) on the TPU fast path; the XLA
Newton-Schulz/eigh paths remain as fallbacks (k > 64, float64, CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

#: lane width of the TPU vector unit / MXU.
_LANES = 128


def pack_width(k: int) -> int:
    """Elements per row-of-blocks pack: how many k-blocks fit in 128 lanes."""
    return max(1, _LANES // k)


def _manual_axis_names():
    """Names of the enclosing shard_map manual mesh axes (empty outside).

    Uses the private ``jax._src.core.get_axis_env()`` probe — no public API
    exposes this.  Returns ``None`` when the probe itself is broken (a JAX
    upgrade moved the symbol): :func:`ns_invsqrt_pallas` then raises a
    RuntimeError, which ops/solver._ns_z catches to fall back to the XLA
    NS path with a warning — a graceful degradation instead of an
    import/trace-time crash of the production solve.
    """
    try:
        from jax._src import core as _core

        return tuple(_core.get_axis_env().axis_sizes)
    except Exception:  # pragma: no cover - exercised via monkeypatch test
        return None


def supports(k: int) -> bool:
    """Dispatch gate: k % 8 == 0 and >= 2 elements per pack (k <= 64).

    The k=96 production ensemble size (/root/reference/input.nml:6) was
    MEASURED on the chip (round 5) through an m=1 degenerate pack — the
    whole iteration VMEM-resident, no packing win — and LOST to the XLA
    NS iteration: 148,795 vs 170,455 solves/s at [1024, 96, 96].  At
    k=96 the XLA batched gemm already runs at (96/128)^2 = 56% pad
    efficiency (~49% of the padded-f32 ceiling measured), so the kernel's
    remaining edge (VMEM residency) is smaller than its per-pack
    loop/weight-load overhead.  k=96 therefore takes the XLA NS path by
    evidence, not omission; the kernel dispatches only where the
    row-of-blocks packing (m >= 2) pays: k <= 64.
    """
    return pack_width(k) >= 2 and k % 8 == 0


def _ns_kernel(a_ref, z_ref, err_ref, w_s, z_s, blk_ab, blk_b, blk_ab2,
               blk_b2, c_s, *, k: int, m: int, n_packs: int, inflat: float,
               tol: float, max_iters: int):
    """One grid block: G = m * n_packs matrices held and iterated in VMEM.

    Refs:
      a_ref:   [G, k, k] input a_obs block (A = a_obs + inflat*I).
      z_ref:   [G, k, k] output Z ~= A^(-1/2).
      err_ref: [8, 128] final block residual max|W - I| (broadcast to the
               minimum legal tile; all entries equal).
      w_s:     [n_packs*k, m*k] W state, pack p at rows [p*k, (p+1)*k),
               element e of the pack at columns [e*k, (e+1)*k).
      z_s:     same layout for Z.
      blk_ab:  [m*k, 256] RHS scratch: blkdiag(W_e) at columns [0, m*k),
               blkdiag(Z_e) at columns [128, 128+m*k).
      blk_b:   [m*k, m*k] RHS scratch for round B (blkdiag of T W products).
      c_s:     [n_packs, m] SMEM per-element Gershgorin scales.
    """
    s = m * k
    dt = w_s.dtype
    eye = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(dt)
    # [I I ... I]: identity of each element's column block.  All index math
    # stays int32: under the bench's jax_enable_x64 a bare Python-int
    # modulus promotes to int64, which Mosaic cannot legalize (the exact
    # round-2 failure class this file must never reintroduce).
    eye_h = (jax.lax.broadcasted_iota(jnp.int32, (k, s), 0)
             == jnp.remainder(
                 jax.lax.broadcasted_iota(jnp.int32, (k, s), 1),
                 jnp.asarray(k, jnp.int32))
             ).astype(dt)

    # zero the off-diagonal-block regions once; the per-pack loops only ever
    # rewrite the diagonal blocks, so the zeros persist for the whole block
    blk_ab[:] = jnp.zeros_like(blk_ab)
    blk_b[:] = jnp.zeros_like(blk_b)
    blk_ab2[:] = jnp.zeros_like(blk_ab2)
    blk_b2[:] = jnp.zeros_like(blk_b2)

    # every dynamic index stays int32 (m/k as int32 scalars): Python-int
    # literals in index arithmetic lower as i64 constants under x64, which
    # Mosaic refuses to mix with the i32 loop counters
    m_i = jnp.asarray(m, jnp.int32)
    k_i = jnp.asarray(k, jnp.int32)

    # ---- init: W = (a_obs + inflat*I) / c, Z = I ----
    # fori_loop bounds are int32 scalars: Python-int bounds make the loop
    # counter int64 under x64, poisoning every index expression below
    def init_pack(p, _):
        for e in range(m):
            a_e = a_ref[p * m_i + jnp.asarray(e, jnp.int32)] + inflat * eye
            # Gershgorin bound / 1.9 (same slack as ops/solver.ns_invsqrt:
            # spectrum(A/c) in (0, 1.9] keeps the iteration contractive
            # while growing lam_min faster)
            c = jnp.max(jnp.sum(jnp.abs(a_e), axis=1)) / 1.9
            c = jnp.maximum(c, jnp.finfo(dt).tiny)
            c_s[p, e] = c
            w_s[pl.ds(p * k_i, k), e * k:(e + 1) * k] = a_e / c
        z_s[pl.ds(p * k_i, k), :] = eye_h
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_packs), init_pack,
                      jnp.int32(0))

    # ---- coupled iteration, all packs per step ----
    # The block's stopping residual is accumulated inside the pack loop
    # (max over packs of this step's |W' - I|), reproducing the XLA path's
    # while-on-residual semantics at block granularity.
    #
    # PRECISION EXPERIMENTS (round 5, all measured on chip and rejected):
    # (a) manual bf16_3x hi/lo-split iterations: 631,944 vs 722,180
    #     solves/s — three separate dots pay three weight fills;
    # (b) a full three-phase scheme (HIGHEST until the spectrum bottom
    #     clears bf16's perturbation radius, one-pass-bf16 contraction,
    #     W := Z A_c Z resync + endgame) was built and then abandoned on
    #     TWO findings: the W-form endgame after any off-manifold drift
    #     converges W -> I WITHOUT Z -> A^(-1/2) (post-drift Z no longer
    #     commutes with A, so T(ZAZ)T != (TZ)A(TZ); an uncoupled-Newton
    #     endgame fixes that but converges only linearly in the drift's
    #     asymmetric part), and — decisively — a 9-fixed-iteration speed
    #     probe measured pure-bf16 iterations only 10% faster than pure
    #     HIGHEST (8.8 vs 9.7 ms at [4096,40,40]): the kernel is bound by
    #     per-pack scratch serialization, not MXU passes, so no precision
    #     scheme can pay.
    def make_step(mm):
        def one_pack_with(p, acc, ab, bb):
            rows = pl.ds(p * k_i, k)
            w = w_s[rows, :]
            t = 1.5 * eye_h - 0.5 * w
            for e in range(m):
                cols = slice(e * k, (e + 1) * k)
                ab[pl.ds(e * k, k), cols] = w[:, cols]
                ab[pl.ds(e * k, k),
                   _LANES + e * k:_LANES + (e + 1) * k] = z_s[rows, cols]
            out = mm(t, ab[:])
            z_s[rows, :] = out[:, _LANES:_LANES + s]
            for e in range(m):
                bb[pl.ds(e * k, k), e * k:(e + 1) * k] = (
                    out[:, e * k:(e + 1) * k])
            w_new = mm(t, bb[:])
            w_s[rows, :] = w_new
            # running residual of this pack (stored via max into err
            # scratch is handled by the caller loop below)
            return jnp.maximum(acc, jnp.max(jnp.abs(w_new - eye_h)))

        def step2(state):
            it, _ = state

            # packs in PAIRS on alternating scratch buffers: with one
            # shared buffer, pack p+1's stores must wait for pack p's
            # matmuls to consume it, serializing VPU stores against the
            # MXU (the 9-fixed-iteration probe showed matmuls are only
            # ~10% of kernel time).  Double buffering lets Mosaic overlap
            # the next pack's blkdiag stores with the current matmuls.
            def pack_pair(q, acc):
                p0 = 2 * q
                acc = one_pack_with(p0, acc, blk_ab, blk_b)
                acc = one_pack_with(p0 + jnp.int32(1), acc, blk_ab2,
                                    blk_b2)
                return acc

            err = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_packs // 2),
                                    pack_pair, jnp.zeros((), dt))
            if n_packs % 2:
                err = one_pack_with(jnp.int32(n_packs - 1), err, blk_ab,
                                    blk_b)
            return it + 1, err

        return step2

    def make_cond(stop_tol, iter_cap):
        def cond(state):
            it, err = state
            return jnp.logical_and(err > stop_tol, it < iter_cap)

        return cond

    def mm_hi(lhs, rhs):
        return jnp.dot(lhs, rhs, precision=_HI, preferred_element_type=dt)

    _, err = jax.lax.while_loop(
        make_cond(jnp.asarray(tol, dt), max_iters), make_step(mm_hi),
        (jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dt)))
    # smallest legal output tile is (8, 128); every entry carries the block
    # residual and the wrapper max-reduces over all of them
    err_ref[:] = jnp.broadcast_to(err, err_ref.shape)

    # ---- finalize: z_e = Z_e / sqrt(c_e) ----
    def out_pack(p, _):
        for e in range(m):
            z_e = z_s[pl.ds(p * k_i, k), e * k:(e + 1) * k]
            z_ref[p * m_i + jnp.asarray(e, jnp.int32)] = (
                z_e * jax.lax.rsqrt(c_s[p, e]))
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_packs), out_pack,
                      jnp.int32(0))


def _ns_kernel_rmul(a_ref, z_ref, err_ref, w_s, z_s, blk, lhs, c_s,
                    *, k: int, m: int, n_packs: int, inflat: float,
                    tol: float, max_iters: int):
    """Right-multiplication variant: one shared blkdiag(T) weight per pack.

    Every NS iterate is a polynomial in A, so W, Z and T = (3I - W)/2 all
    COMMUTE and are symmetric; the step can therefore run entirely as
    right-multiplications by one block-diagonal weight:

        U  = W T   (= T W),    Z' = Z T   (= T Z)       [one matmul,
                                                          lhs = [W; Z]]
        W' = U T   (= T W T)                            [one matmul]

    Two matmuls per pack-iteration against the SAME stationary
    ``blkdiag(T_e)`` [s, s] tile (vs the trio kernel's three weight-tile
    loads: [s, 256] round A counts twice), and the streamed LHS carries
    2k/k rows instead of k — fewer weight fills per useful row, which is
    what the trio kernel is bound by (the bf16_3x experiment showed
    pass-count is NOT the binding resource).  Commutativity holds exactly
    in exact arithmetic; f32 rounding breaks it at O(eps) per step, the
    same class of drift the coupled iteration already self-corrects.

    Scratch: w_s/z_s as in _ns_kernel; blk [s, s] the shared weight; lhs
    [2k, s] the stacked stream.
    """
    dt = w_s.dtype
    eye = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(dt)
    s = m * k
    eye_h = (jax.lax.broadcasted_iota(jnp.int32, (k, s), 0)
             == jnp.remainder(
                 jax.lax.broadcasted_iota(jnp.int32, (k, s), 1),
                 jnp.asarray(k, jnp.int32))
             ).astype(dt)
    blk[:] = jnp.zeros_like(blk)

    m_i = jnp.asarray(m, jnp.int32)
    k_i = jnp.asarray(k, jnp.int32)
    k2 = 2 * k

    def init_pack(p, _):
        for e in range(m):
            a_e = a_ref[p * m_i + jnp.asarray(e, jnp.int32)] + inflat * eye
            c = jnp.max(jnp.sum(jnp.abs(a_e), axis=1)) / 1.9
            c = jnp.maximum(c, jnp.finfo(dt).tiny)
            c_s[p, e] = c
            w_s[pl.ds(p * k_i, k), e * k:(e + 1) * k] = a_e / c
        z_s[pl.ds(p * k_i, k), :] = eye_h
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_packs), init_pack,
                      jnp.int32(0))

    def mm(a_, b_):
        return jnp.dot(a_, b_, precision=_HI, preferred_element_type=dt)

    def step(state):
        it, _ = state

        def one_pack(p, acc):
            rows = pl.ds(p * k_i, k)
            w = w_s[rows, :]
            for e in range(m):
                cols = slice(e * k, (e + 1) * k)
                blk[pl.ds(e * k, k), cols] = 1.5 * eye - 0.5 * w[:, cols]
            lhs[pl.ds(0, k), :] = w
            lhs[pl.ds(k, k), :] = z_s[rows, :]
            out = mm(lhs[:], blk[:])            # [2k, s]: [U; Z']
            z_s[rows, :] = out[k:k2, :]
            w_new = mm(out[:k, :], blk[:])      # W' = U T
            w_s[rows, :] = w_new
            return jnp.maximum(acc, jnp.max(jnp.abs(w_new - eye_h)))

        err = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_packs), one_pack,
                                jnp.zeros((), dt))
        return it + 1, err

    def cond(state):
        it, err = state
        return jnp.logical_and(err > tol, it < max_iters)

    _, err = jax.lax.while_loop(
        cond, step, (jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dt)))
    err_ref[:] = jnp.broadcast_to(err, err_ref.shape)

    def out_pack(p, _):
        for e in range(m):
            z_e = z_s[pl.ds(p * k_i, k), e * k:(e + 1) * k]
            z_ref[p * m_i + jnp.asarray(e, jnp.int32)] = (
                z_e * jax.lax.rsqrt(c_s[p, e]))
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_packs), out_pack,
                      jnp.int32(0))


@functools.partial(jax.jit, static_argnames=(
    "inflat", "tol", "max_iters", "packing", "interpret", "return_info"))
def ns_invsqrt_pallas(a_obs, inflat, *, tol: float = 1e-4,
                      max_iters: int = 24, packing: str = "trio",
                      interpret: bool = False, return_info: bool = False):
    """Batched ``Z ~= (a_obs + inflat*I)^(-1/2)``, packed Pallas kernel.

    Drop-in for :func:`ops.solver.ns_invsqrt` on float32 TPU batches with
    ``supports(k)`` true (k <= 64, k % 8 == 0).  ``packing`` selects the
    iteration kernel for A/B measurement: ``"trio"`` = shared-LHS
    row-of-blocks (_ns_kernel), ``"rmul"`` = shared-weight
    right-multiplication (_ns_kernel_rmul).

    Returns ``z`` or ``(z, iters, residual)``; ``iters`` is the max over
    blocks (blocks stop independently), ``residual`` the max final
    ``|W - I|``.
    """
    if packing not in ("trio", "rmul"):
        raise ValueError(f"unknown packing {packing!r}")
    a = jnp.asarray(a_obs)
    if a.dtype != jnp.float32 or a.ndim != 3:
        raise ValueError("pallas NS kernel handles float32 [B, k, k] only")
    b, k, k2 = a.shape
    if k != k2 or not supports(k):
        raise ValueError(f"unsupported k={k} (need k%8==0 and k<=128)")
    m = pack_width(k)
    s = m * k
    # ~768 KB of W state per block at k=40 — deep enough to amortize the
    # grid, small enough that W/Z/A/out blocks fit VMEM comfortably
    n_packs = max(1, (3 << 18) // (k * s * 4))
    # scoped-VMEM guard: the [G, k, k] input/output grid blocks are lane-
    # PADDED to [G, k, 128] and the pallas pipeline double-buffers both,
    # so 4 padded copies must fit the ~16 MB scoped budget.  At small k
    # the padding factor (128/k) dominates — k=24 with the state-sized
    # n_packs alone compiled to 17.9 MB and failed the CLI drive
    # (round 5); cap the block depth by the padded-block budget.
    g_cap = max(m, (11 << 20) // (4 * k * _LANES * 4))
    n_packs = max(1, min(n_packs, g_cap // m))
    g = m * n_packs
    nb = -(-b // g)
    b_pad = nb * g
    if b_pad != b:
        # zero-pad: A = inflat*I converges in one step, output discarded
        a = jnp.concatenate(
            [a, jnp.zeros((b_pad - b, k, k), a.dtype)], axis=0)

    kernel = functools.partial(
        _ns_kernel_rmul if packing == "rmul" else _ns_kernel,
        k=k, m=m, n_packs=n_packs, inflat=float(inflat),
        tol=float(tol), max_iters=int(max_iters))
    scratch = [
        pltpu.VMEM((n_packs * k, s), a.dtype),      # W
        pltpu.VMEM((n_packs * k, s), a.dtype),      # Z
    ]
    if packing == "rmul":
        scratch += [
            pltpu.VMEM((s, s), a.dtype),            # shared blkdiag(T)
            pltpu.VMEM((2 * k, s), a.dtype),        # [W; Z] stream
        ]
    else:
        scratch += [
            pltpu.VMEM((s, 256), a.dtype),          # round-A RHS (even p)
            pltpu.VMEM((s, s), a.dtype),            # round-B RHS (even p)
            pltpu.VMEM((s, 256), a.dtype),          # round-A RHS (odd p)
            pltpu.VMEM((s, s), a.dtype),            # round-B RHS (odd p)
        ]
    scratch.append(pltpu.SMEM((n_packs, m), a.dtype))   # scales
    # index_map zeros must be int32 (same x64 i64-legalization class as
    # ops/pallas_eigh.py:299-303); np.int32, not jnp — index maps must not
    # capture traced constants
    z32 = np.int32(0)
    # Under shard_map (the SPMD production path) pallas_call out_shapes must
    # declare how outputs vary over the manual mesh axes or the
    # varying-manual-axes check rejects the trace; per-shard solves vary
    # over every manual axis.  No public API exposes the enclosing manual
    # axes, hence the _src.core probe (empty outside shard_map -> None).
    axes = _manual_axis_names()
    if axes is None:
        raise RuntimeError(
            "jax._src.core.get_axis_env() probe unavailable (JAX internals "
            "moved?): cannot declare manual-axis variance for the packed NS "
            "kernel; use the XLA NS path")
    vma = frozenset(axes) or None
    z, err = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((g, k, k), lambda i: (i, z32, z32),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((g, k, k), lambda i: (i, z32, z32),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, z32),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k, k), a.dtype, vma=vma),
            jax.ShapeDtypeStruct((nb * 8, 128), a.dtype, vma=vma),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(a)
    z = z[:b]
    if return_info:
        # per-block while_loops stop independently; report the worst
        return z, jnp.zeros((), jnp.int32), jnp.max(err)
    return z
