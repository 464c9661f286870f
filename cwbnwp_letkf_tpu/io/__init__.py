"""File I/O: WRF NetCDF ensembles and observation text formats."""

from .netcdf import NetcdfReader, NetcdfWriter, open_wrf

__all__ = ["NetcdfReader", "NetcdfWriter", "open_wrf"]
