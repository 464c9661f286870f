"""CWBNWP-LETKF-TPU: a TPU-native LETKF analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Fortran90+MPI implementation (lopunch/CWBNWP-LETKF): the Hunt et al. (2007)
local ensemble transform Kalman filter for convective-scale WRF ensembles,
with conventional (GTS) and radar observations, distance-based R-localization,
and multiplicative/RTPP/RTPS inflation.

Design at a glance (vs the reference's architecture):

* the per-gridpoint serial solve loop (module_letkf_core.f90:209-240) becomes
  one batched, sharded computation over all gridpoints: a padded fixed-k obs
  gather + whitening followed by a batched k-by-k symmetric eigendecomposition
  on the MXU;
* the kd-tree radius search (module_kdtree2.f90) becomes an on-device
  distance-matmul + top-k neighbor gather (ops/neighbors.py);
* the MPI domain decomposition (module_mpi_util.f90) becomes a
  ``jax.sharding.Mesh`` with gridpoints sharded over all devices and obs
  replicated (parallel/);
* Fortran namelist config is importable verbatim (config.py).
"""

from .config import LetkfConfig
from .projection import LambertProjection

__version__ = "0.1.0"

__all__ = ["LetkfConfig", "LambertProjection", "__version__"]
