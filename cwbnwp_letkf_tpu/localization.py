"""Distance-based R-localization weight functions, vectorized for JAX.

Re-designs the weighting math of the reference's ``module_localization.f90``
and ``module_letkf_core.f90`` (file:line cites refer to /root/reference/):

* ``gaspari_cohn_1999`` — the 5th-order piecewise-rational compact-support
  correlation function (module_localization.f90:333-364).
* ``obs_error_inv_weight`` — the reference folds localization into the
  observation-error scaling rather than the covariance: the *error* (not the
  variance) is multiplied by the square root of the localization function,
  hence the 0.25 exponent for the Gaussian branch
  (module_letkf_core.f90:439-450,512-523).

All functions take the *squared normalized distance* ``r2`` produced by the
neighbor search (coordinates are pre-divided by the per-variable localization
radii ``hclr``/``vclr`` in meters; module_localization.f90:148-157,234-253).
"""
from __future__ import annotations

import jax.numpy as jnp

from .constants import GC1999

#: Gaussian weight_function id (any value != 1; module_letkf_core.f90:443)
WEIGHT_GAUSSIAN = 0
#: Gaspari-Cohn weight_function id (module_letkf_core.f90:443)
WEIGHT_GC1999 = 1

_A = GC1999 / 2.0  # sqrt(10/3): the GC support half-width in normalized units


def gaspari_cohn_1999(x):
    """Gaspari & Cohn (1999) eq. 4.10 compact correlation function.

    ``x`` is the normalized distance (already divided by the localization
    length scale).  Matches Gaspari_Cohn_1999 (module_localization.f90:333-364)
    including its internal re-normalization ``z = x / sqrt(10/3)`` so the
    support ends at ``x = 2*sqrt(10/3) = gc1999``.
    Vectorized over any array shape.
    """
    x = jnp.asarray(x)
    z = x / jnp.asarray(_A, dtype=x.dtype)
    z2 = z * z
    inner = z2 * (z * (z * (-0.25 * z + 0.5) + 0.625) - 5.0 / 3.0) + 1.0
    zs = jnp.maximum(z, jnp.asarray(1e-30, dtype=x.dtype))  # guard b7/z at z=0
    outer = (
        z * (z * (z * (z * ((1.0 / 12.0) * z - 0.5) + 0.625) + 5.0 / 3.0) - 5.0)
        + 4.0
        - (2.0 / 3.0) / zs
    )
    # the outer polynomial can round to a tiny negative near the support
    # boundary z=2; clamp so sqrt(GC) in the error weighting never NaNs.
    return jnp.maximum(jnp.where(z <= 1.0, inner, jnp.where(z <= 2.0, outer, 0.0)), 0.0)


def obs_error_inv_weight(r2, err, weight_function: int):
    """Localized inverse observation error ``error_inv``.

    Gaussian branch (weight_function != 1, module_letkf_core.f90:443-444)::

        error_inv = 1 / (err * exp(0.25 * r2))

    (variance inflated by ``exp(r2/2)`` — the 0.25 is because the weight is
    applied to the error, not the variance).

    Gaspari-Cohn branch (module_letkf_core.f90:446-450)::

        error_inv = sqrt(GC(sqrt(r2))) / err
    """
    r2 = jnp.asarray(r2)
    if weight_function == WEIGHT_GC1999:
        return jnp.sqrt(gaspari_cohn_1999(jnp.sqrt(r2))) / err
    return 1.0 / (err * jnp.exp(0.25 * r2))


def normalized_r2(dx, dy, dz, hclr_inv, vclr_inv):
    """Squared normalized distance for localization search.

    Horizontal offsets are scaled by ``1/(hclr*1e3)`` and, when vertical
    localization is enabled (``vclr > 0``), the vertical offset by
    ``1/(vclr*1e3)`` — mirroring the kd-tree coordinate normalization
    (module_localization.f90:148-157).  With ``vclr_inv <= 0`` the search is
    2-D (module_localization.f90:151-157).
    """
    r2 = (dx * hclr_inv) ** 2 + (dy * hclr_inv) ** 2
    if vclr_inv is not None:
        r2 = r2 + jnp.where(vclr_inv > 0.0, (dz * vclr_inv) ** 2, 0.0)
    return r2
