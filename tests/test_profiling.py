"""Profiling layer: named scopes, trace capture, device-time breakdown."""
import os

import numpy as np
import pytest

from cwbnwp_letkf_tpu.obs.synthetic import (correlated_ensemble,
                                            idealized_grid,
                                            synthetic_gts_platform)
from cwbnwp_letkf_tpu.ops.update import prepare_platform
from cwbnwp_letkf_tpu.profiling import device_breakdown, maybe_trace


def _case(k=8, nobs=60):
    rng = np.random.default_rng(3)
    pts = idealized_grid(12, 12, 4)
    truth, xb = correlated_ensemble(rng, pts, k)
    st, po = synthetic_gts_platform(rng, pts, truth, xb, nobs=nobs,
                                    max_lz_pts=16)
    return pts, xb, [prepare_platform(st, po)]


def test_device_breakdown_stages_positive_and_additive():
    pts, xb, plats = _case()
    out = device_breakdown(xb, pts, plats, 0, sample=256, reps=1)
    stages = ["localize_accumulate", "eigh", "weight_apply"]
    for s in stages:
        assert out[f"{s}_s"] > 0.0
        assert 0.0 <= out[f"{s}_frac"] <= 1.0
    assert out["total_s"] == pytest.approx(
        sum(out[f"{s}_s"] for s in stages))
    assert abs(sum(out[f"{s}_frac"] for s in stages) - 1.0) < 1e-9
    assert out["points"] == 256


def test_device_breakdown_requires_active_platform():
    pts, xb, plats = _case()
    with pytest.raises(ValueError):
        device_breakdown(xb, pts, [], 0, sample=64, reps=1)


def test_maybe_trace_noop_and_capture(tmp_path):
    with maybe_trace(None):
        pass  # no-op path

    import jax
    import jax.numpy as jnp

    trace_dir = str(tmp_path / "trace")
    with maybe_trace(trace_dir):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # jax.profiler.trace writes a plugins/profile/<run>/ tree
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_named_scopes_do_not_break_jit():
    import jax
    import jax.numpy as jnp

    from cwbnwp_letkf_tpu.ops.update import update_points

    pts, xb, plats = _case()
    xa = jax.jit(
        lambda x, p: update_points(x, p, plats, 0, inflat=7.0,
                                   weight_function=0, chunk=64)
    )(jnp.asarray(xb), jnp.asarray(pts))
    assert np.isfinite(np.asarray(xa)).all()
