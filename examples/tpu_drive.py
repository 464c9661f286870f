"""End-to-end TPU drive: synthetic analysis on the real chip.

Synthetic ensemble with spatially-correlated perturbations, biased
background, observations of truth near the domain center.  Checks:
RMSE near stations drops sharply, far points stay at background,
rerun is bit-identical, both weight functions finite.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from cwbnwp_letkf_tpu.config import MAX_VARS
from cwbnwp_letkf_tpu.obs.base import PlatformStatic, make_platform_obs
from cwbnwp_letkf_tpu.ops.update import prepare_platform, update_points

print("devices:", jax.devices())

rng = np.random.default_rng(0)
k = 40
nx = ny = 64
dx = 4000.0  # m

# Grid points at z=500 m.
xs = np.arange(nx) * dx
ys = np.arange(ny) * dx
X, Y = np.meshgrid(xs, ys, indexing="ij")
pts = np.stack([X.ravel(), Y.ravel(), np.full(nx * ny, 500.0)], -1)
B = pts.shape[0]

# Truth: smooth field. Background: biased + correlated perturbations.
def smooth_field(seed, scale=1.0):
    r = np.random.default_rng(seed)
    f = r.normal(size=(8, 8))
    fb = np.kron(f, np.ones((nx // 8, ny // 8)))
    return scale * fb

truth = smooth_field(1, 3.0)
xb = np.empty((B, k), np.float32)
for m in range(k):
    pert = smooth_field(100 + m, 1.5)
    xb[:, m] = (truth + 2.0 + pert).ravel()  # bias +2

# Obs: 60 stations near domain center, obs = truth + small noise.
ns = 60
six = rng.integers(nx // 4, 3 * nx // 4, ns)
siy = rng.integers(ny // 4, 3 * ny // 4, ns)
sxyz = np.stack([xs[six], ys[siy], np.full(ns, 500.0)], -1)
yobs = truth[six, siy] + rng.normal(0, 0.2, ns)
# H(xb) per member: background at station gridpoint.
hdxb = xb.reshape(nx, ny, k)[six, siy, :]
err = np.full(ns, 0.5, np.float32)

po = make_platform_obs(sxyz, yobs, hdxb, error=err)
# Cutoff radius is gc1999 (~3.65) x hclr, so 10 km reaches ~37 km; the
# (0,0) corner is >= 90 km from every station and must stay background.
hclr = tuple([10.0] + [0.0] * (MAX_VARS - 1))
vclr = tuple([-1.0] * MAX_VARS)
st = PlatformStatic(
    name="synop", kind="gts", nvar=1, max_lz_pts=100,
    hclr=hclr, vclr=vclr, err_muti=(1.0,), err_rej=(1e9,),
    is_assim=((True,) + (False,) * (MAX_VARS - 1),),
)

dp = prepare_platform(st, po)
rho = 1.2
for wf in (0, 1):
    t0 = time.time()
    xa = update_points(
        np.asarray(xb), np.asarray(pts, np.float32), [dp], 0,
        inflat=(k - 1) / rho, weight_function=wf, chunk=2048)
    xa = np.asarray(jax.block_until_ready(xa))
    t1 = time.time()
    assert np.all(np.isfinite(xa)), f"non-finite analysis wf={wf}"
    xa2 = np.asarray(jax.block_until_ready(update_points(
        np.asarray(xb), np.asarray(pts, np.float32), [dp], 0,
        inflat=(k - 1) / rho, weight_function=wf, chunk=2048)))
    assert np.array_equal(xa, xa2), "rerun not bit-identical"

    xam = xa.mean(-1).reshape(nx, ny)
    xbm = xb.mean(-1).reshape(nx, ny)
    near = np.zeros((nx, ny), bool)
    near[six, siy] = True
    rmse_b = np.sqrt(((xbm - truth) ** 2)[near].mean())
    rmse_a = np.sqrt(((xam - truth) ** 2)[near].mean())
    # Far corner (0,0) is > hclr from all stations -> untouched.
    far_same = np.array_equal(xa.reshape(nx, ny, k)[0, 0], xb.reshape(nx, ny, k)[0, 0])
    spread_b = xb.reshape(nx, ny, k)[near].std(-1).mean()
    spread_a = xa.reshape(nx, ny, k)[near].std(-1).mean()
    print(f"wf={wf}: rmse {rmse_b:.3f} -> {rmse_a:.3f}, "
          f"spread {spread_b:.3f} -> {spread_a:.3f}, far_identical={far_same}, "
          f"wall={t1-t0:.1f}s")
    assert rmse_a < 0.5 * rmse_b, "RMSE did not drop near stations"
    assert far_same, "far points modified"
    assert spread_a < spread_b, "spread did not shrink"

# Fused multi-variable group: same obs/localization, three "variables"
# (the field, a scaled copy, a shifted copy) with different inflation and
# relaxation. Each fused slice must match its per-variable solve.
from cwbnwp_letkf_tpu.ops.update import update_points_group

xb3 = np.stack([xb, 0.5 * xb, xb + 3.0], axis=1)  # [B, 3, k]
ivars = (0, 0, 0)
inflats = ((k - 1) / 1.2, (k - 1) / 1.0, (k - 1) / 1.5)
rtpp = (0.0, 0.8, 0.0)
rtps = (0.9, 0.0, 0.0)
t0 = time.time()
xa3 = np.asarray(jax.block_until_ready(update_points_group(
    np.asarray(xb3), np.asarray(pts, np.float32), [dp], ivars,
    inflats=inflats, weight_function=0,
    rtpp_alpha=rtpp, rtps_alpha=rtps, chunk=2048)))
t1 = time.time()
assert np.all(np.isfinite(xa3)), "non-finite fused analysis"
for vi in range(3):
    single = np.asarray(jax.block_until_ready(update_points(
        np.asarray(xb3[:, vi]), np.asarray(pts, np.float32), [dp], 0,
        inflat=inflats[vi], weight_function=0,
        use_rtpp=rtpp[vi] > 0, rtpp_alpha=rtpp[vi],
        use_rtps=rtps[vi] > 0, rtps_alpha=rtps[vi], chunk=2048)))
    err = np.abs(xa3[:, vi] - single).max()
    print(f"fused var {vi}: max |fused - single| = {err:.2e}")
    assert err < 1e-3, "fused path diverges from per-variable path"
print(f"fused 3-var update wall={t1-t0:.1f}s")
print("TPU DRIVE OK")
