"""NetCDF reader/writer: header cloning, variable round-trip, NC4 input."""
import numpy as np
import pytest

from cwbnwp_letkf_tpu.io.netcdf import NetcdfReader, NetcdfWriter


def _make_wrf_like(path, nx=6, ny=5, nz=4):
    """A miniature WRF file in classic NetCDF with the reference layout."""
    from scipy.io import netcdf_file

    rng = np.random.default_rng(41)
    f = netcdf_file(path, "w", version=2)
    f.TITLE = "OUTPUT FROM WRF V4"
    f.createDimension("Time", None)
    f.createDimension("west_east", nx)
    f.createDimension("south_north", ny)
    f.createDimension("bottom_top", nz)
    f.createDimension("bottom_top_stag", nz + 1)
    f.createDimension("west_east_stag", nx + 1)
    f.createDimension("DateStrLen", 19)

    times = f.createVariable("Times", "S1", ("Time", "DateStrLen"))
    times[0] = np.frombuffer(b"2026-08-17_00:00:00", dtype="S1")

    def var3(name, dims, shape):
        v = f.createVariable(name, np.float32, ("Time",) + dims)
        v.units = "test"
        data = rng.normal(0, 1, (1,) + shape).astype(np.float32)
        v[:] = data
        return data[0]

    t = var3("T", ("bottom_top", "south_north", "west_east"), (nz, ny, nx))
    ph = var3("PH", ("bottom_top_stag", "south_north", "west_east"),
              (nz + 1, ny, nx))
    u = var3("U", ("bottom_top", "south_north", "west_east_stag"),
             (nz, ny, nx + 1))
    mu = var3("MU", ("south_north", "west_east"), (ny, nx))
    p_top = f.createVariable("P_TOP", np.float32, ("Time",))
    p_top[:] = np.array([5000.0], np.float32)
    f.flush()
    f.close()
    return dict(T=t, PH=ph, U=u, MU=mu)


def test_read_transposed_xyz(tmp_path):
    path = str(tmp_path / "wrfinput_d01")
    raw = _make_wrf_like(path)
    with NetcdfReader(path) as nc:
        assert nc.get_dimension("west_east") == 6
        assert nc.get_dimension("bottom_top_stag") == 5
        assert nc.get_dimension("Time") == 1
        t = nc.get_variable("T")
        assert t.shape == (6, 5, 4)  # (x, y, z) like module_grid.f90:275
        np.testing.assert_array_equal(t, raw["T"].T)
        u = nc.get_variable("U")
        assert u.shape == (7, 5, 4)
        mu = nc.get_variable("MU")
        assert mu.shape == (6, 5)
        assert nc.get_scalar("P_TOP") == 5000.0
        assert nc.get_attribute("TITLE").startswith("OUTPUT FROM WRF")


def test_write_clone_roundtrip(tmp_path):
    src_path = str(tmp_path / "in.nc")
    dst_path = str(tmp_path / "out.nc")
    raw = _make_wrf_like(src_path)
    t_new = (raw["T"].T + 100.0).astype(np.float32)

    with NetcdfReader(src_path) as src:
        with NetcdfWriter(dst_path) as dst:
            dst.copy_header_from(src)
            dst.write_variable("T", t_new)
            dst.write_others(src)

    with NetcdfReader(dst_path) as out:
        np.testing.assert_array_equal(out.get_variable("T"), t_new)
        # untouched vars byte-copied (netcdf_io.f90:325-374)
        np.testing.assert_array_equal(out.get_variable("PH"), raw["PH"].T)
        np.testing.assert_array_equal(out.get_variable("U"), raw["U"].T)
        np.testing.assert_array_equal(out.get_variable("MU"), raw["MU"].T)
        assert out.get_attribute("TITLE").startswith("OUTPUT FROM WRF")
        assert out.get_attribute("units", var="T") == "test"


def test_nc4_hdf5_input(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "wrf_nc4.nc")
    rng = np.random.default_rng(5)
    data = rng.normal(0, 1, (1, 4, 5, 6)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.attrs["TITLE"] = "NC4 WRF"
        ds = f.create_dataset("T", data=data)
        ds.attrs["units"] = "K"
        for i, d in enumerate(("Time", "bottom_top", "south_north",
                               "west_east")):
            ds.dims[i].label = d
    with NetcdfReader(path) as nc:
        t = nc.get_variable("T")
        assert t.shape == (6, 5, 4)
        np.testing.assert_array_equal(t, data[0].T)
        assert nc.get_attribute("TITLE") == "NC4 WRF"
