"""One-off: batched small-matmul strategy shootout for the NS solve.

The production cycle is solve-bound (examples/profile_groups.py: UV group =
0.37 s accumulation + 0.84 s solve); ns_invsqrt's batched [B,40,40] matmuls
measure 4.3% MXU utilization against a ~9.8% padding ceiling
((40/128)^2 on K,N).  This compares, on the real chip:

  a) XLA batched matmul at several precisions/batch sizes (the baseline)
  b) XLA full ns_invsqrt (what the solve actually pays today)
  c) a Pallas kernel running the whole fixed-iteration NS loop in VMEM
  d) same, with the block-diagonal trio packing: T is symmetric and commutes
     with W and Z (all polynomials in A), so the step is two LEFT-SHARED
     rounds  P = T @ [W | Z]  then  W' = T @ P_W, Z' = P_Z — packing 3
     batch elements as blkdiag(T1,T2,T3) [120,128] @ stacked RHS [120,128]
     lifts the N-padding utilization ceiling from 9.8% to ~19.5%.

Run: python examples/ns_microbench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _fetch(x):
    h = np.asarray(x.reshape(-1)[:64])
    assert np.isfinite(h).all()


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    K = 40
    rng = np.random.default_rng(0)

    def make_a(bsz):
        y = rng.standard_normal((bsz, K, 300)).astype(np.float32) * 0.3
        a = y @ np.transpose(y, (0, 2, 1))
        return jnp.asarray(a)

    def rate(f, *args, n=10, flops_per=None):
        _fetch(f(*args))
        t0 = time.time()
        r = None
        for _ in range(n):
            r = f(*args)
        _fetch(r)
        dt = (time.time() - t0) / n
        return dt

    # ---- a) XLA batched matmul ----
    for bsz in (4096, 16384, 65536):
        a = make_a(bsz)
        b = make_a(bsz)
        for prec in ("HIGHEST", "HIGH", "DEFAULT"):
            p = getattr(jax.lax.Precision, prec)
            f = jax.jit(lambda x, y, p=p: jnp.einsum(
                "bij,bjk->bik", x, y, precision=p,
                preferred_element_type=jnp.float32))
            dt = rate(f, a, b)
            tf = bsz * 2 * K**3 / dt / 1e12
            print(f"xla bmm   B={bsz:6d} {prec:8s}: {dt*1e3:7.2f} ms "
                  f"{tf:6.2f} TF/s", flush=True)

    # ---- b) XLA ns_invsqrt ----
    from cwbnwp_letkf_tpu.ops.solver import ns_invsqrt

    for bsz in (2048, 4096, 16384):
        a = make_a(bsz)
        f = jax.jit(lambda x: ns_invsqrt(x, (K - 1) / 1.1))
        dt = rate(f, a)
        print(f"xla ns    B={bsz:6d}: {dt*1e3:7.2f} ms "
              f"{bsz/dt:9.0f} mat/s", flush=True)

    # ---- c/d) Pallas NS kernels ----
    from cwbnwp_letkf_tpu.ops.pallas_ns import ns_invsqrt_pallas

    for packing in ("trio",):
        for bsz in (4096, 16384):
            a = make_a(bsz)
            f = jax.jit(lambda x, p=packing: ns_invsqrt_pallas(
                x, (K - 1) / 1.1, packing=p))
            try:
                dt = rate(f, a)
            except Exception as e:  # noqa: BLE001
                print(f"pallas {packing} B={bsz}: FAILED {e!r}"[:300],
                      flush=True)
                continue
            print(f"pallas-{packing:5s} B={bsz:6d}: {dt*1e3:7.2f} ms "
                  f"{bsz/dt:9.0f} mat/s", flush=True)
            # accuracy vs XLA NS
            z_p = np.asarray(f(a)[:64])
            z_x = np.asarray(jax.jit(
                lambda x: ns_invsqrt(x, (K - 1) / 1.1))(a)[:64])
            err = np.abs(z_p - z_x).max() / np.abs(z_x).max()
            print(f"  max rel diff vs xla-ns: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
