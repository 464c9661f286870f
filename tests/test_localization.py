"""Localization weight functions vs scalar reference transcriptions."""
import jax.numpy as jnp
import numpy as np

from cwbnwp_letkf_tpu.constants import GC1999
from cwbnwp_letkf_tpu.localization import (
    WEIGHT_GAUSSIAN,
    WEIGHT_GC1999,
    gaspari_cohn_1999,
    obs_error_inv_weight,
)

from . import reference_impl as ref


def test_gc1999_matches_reference_pointwise():
    xs = np.linspace(0.0, 1.2 * GC1999, 400)
    got = np.asarray(gaspari_cohn_1999(jnp.asarray(xs)))
    expected = np.array([ref.gaspari_cohn_1999(float(x)) for x in xs])
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_gc1999_properties():
    assert float(gaspari_cohn_1999(jnp.asarray(0.0))) == 1.0
    # compact support: exactly zero at/beyond gc1999 = 2*sqrt(10/3)
    assert float(gaspari_cohn_1999(jnp.asarray(GC1999))) <= 1e-12
    assert float(gaspari_cohn_1999(jnp.asarray(GC1999 * 2))) == 0.0
    xs = jnp.linspace(0.0, GC1999, 100)
    vals = np.asarray(gaspari_cohn_1999(xs))
    assert (np.diff(vals) <= 1e-12).all()  # monotone decreasing


def test_error_inv_weight_matches_reference():
    r2s = np.linspace(0.0, GC1999 ** 2, 57)
    err = 1.7
    for wf in (WEIGHT_GAUSSIAN, WEIGHT_GC1999):
        got = np.asarray(obs_error_inv_weight(jnp.asarray(r2s), err, wf))
        expected = np.array([ref.error_inv(float(r2), err, wf) for r2 in r2s])
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)
