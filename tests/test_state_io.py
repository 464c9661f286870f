"""WRF ensemble state: read/derive/write semantics vs the reference rules."""
import numpy as np

from cwbnwp_letkf_tpu.config import LetkfConfig
from cwbnwp_letkf_tpu.io.netcdf import NetcdfReader
from cwbnwp_letkf_tpu.models.state import (
    MpScheme,
    read_ensemble,
    write_ensemble,
    write_mean,
)

from .wrf_fixtures import make_wrf_ensemble


def _cfg(k):
    return LetkfConfig(nmember=k, var_update=("T",), wrf_mp_physics=4)


def test_mp_scheme_table():
    # grid.f90:61-224
    assert MpScheme.from_option(2) == MpScheme(True, False)       # LIN
    assert MpScheme.from_option(4) == MpScheme(False, False)      # WSM5
    assert MpScheme.from_option(6, 0).graupel and not MpScheme.from_option(6, 0).hail
    assert MpScheme.from_option(6, 1).hail
    th = MpScheme.from_option(8)
    assert th.moment_r == 2 and th.graupel and not th.hail
    mil = MpScheme.from_option(9)
    assert mil.graupel and mil.hail and mil.moment_h == 2
    assert MpScheme.from_option(10, 0).field_names() == [
        "qr", "qs", "qg", "nqr", "nqs", "nqg"]
    import pytest
    with pytest.raises(ValueError):
        MpScheme.from_option(17)  # NSSL unsupported in reference table too


def test_read_ensemble_full_fields(tmp_path):
    k = 3
    paths = make_wrf_ensemble(str(tmp_path), k)
    ens = read_ensemble(paths, _cfg(k))
    assert ens.nx == 8 and ens.ny == 7 and ens.nz == 5 and ens.k == k
    assert ens.fields["t"].shape == (8, 7, 5, k)
    assert ens.fields["u"].shape == (9, 7, 5, k)
    assert ens.fields["v"].shape == (8, 8, 5, k)
    assert ens.fields["w"].shape == (8, 7, 6, k)

    with NetcdfReader(paths[1]) as nc:
        p_pert = nc.get_variable("P")
        pb = nc.get_variable("PB")
        mu_pert = nc.get_variable("MU")
        mub = nc.get_variable("MUB")
        qr = nc.get_variable("QRAIN")
    # full fields formed (grid.f90:500-502)
    np.testing.assert_allclose(ens.fields["p"][..., 1], p_pert + pb,
                               rtol=1e-6)
    np.testing.assert_allclose(ens.fields["mu"][..., 1], mu_pert + mub,
                               rtol=1e-6)
    # hydrometeors clamped (grid.f90:362-365)
    assert (ens.fields["qr"] >= 0).all()
    assert (qr < 0).any()  # fixture really had negatives


def test_write_roundtrip_subtracts_base(tmp_path):
    k = 2
    paths = make_wrf_ensemble(str(tmp_path), k)
    cfg = _cfg(k)
    ens = read_ensemble(paths, cfg)
    ens.fields["t"][...] += 1.5  # fake analysis increment

    outs = [str(tmp_path / f"wrfout_nc_{m+1:03d}") for m in range(k)]
    write_ensemble(ens, outs)
    with NetcdfReader(outs[0]) as nc:
        t_out = nc.get_variable("T")
        p_out = nc.get_variable("P")  # back to perturbation (grid.f90:521-523)
        ph_out = nc.get_variable("PH")
        hgt = nc.get_variable("HGT")  # untouched var copied through
    np.testing.assert_allclose(t_out, ens.fields["t"][..., 0], rtol=1e-6)
    np.testing.assert_allclose(p_out, ens.fields["p"][..., 0] - ens.pb,
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(ph_out, ens.fields["ph"][..., 0] - ens.phb,
                               rtol=1e-5, atol=1e-2)
    assert (hgt == 50.0).all()

    mean_path = str(tmp_path / "wrfout_nc_mean")
    write_mean(ens, mean_path)
    with NetcdfReader(mean_path) as nc:
        tm = nc.get_variable("T")
    np.testing.assert_allclose(tm, ens.fields["t"].mean(-1), rtol=1e-6)


def test_rhoa_derivation_morrison(tmp_path):
    """2-moment scheme triggers rho_a derivation (grid.f90:369-441)."""
    from .wrf_fixtures import make_wrf_member
    from scipy.io import netcdf_file
    import numpy as np

    rng = np.random.default_rng(7)
    k = 2
    paths = []
    for m in range(k):
        p = str(tmp_path / f"wrfinput_nc_{m+1:03d}")
        make_wrf_member(p, rng, mp_vars=("QRAIN", "QSNOW", "QGRAUP",
                                         "QNRAIN", "QNSNOW", "QNGRAUPEL"))
        # append the base-state scalars Morrison's rho_a needs
        f = netcdf_file(p, "a", version=2)
        nz = 5
        for name, val in [("T00", 290.0), ("P00", 1e5), ("TLP", 50.0),
                          ("TISO", 0.0), ("P_STRAT", 0.0),
                          ("TLP_STRAT", -11.0), ("P_TOP", 5e3)]:
            v = f.createVariable(name, np.float32, ("Time",))
            v[:] = np.array([val], np.float32)
        znw = f.createVariable("ZNW", np.float32, ("Time", "bottom_top_stag"))
        znw[:] = np.linspace(1, 0, nz + 1)[None].astype(np.float32)
        znu = f.createVariable("ZNU", np.float32, ("Time", "bottom_top"))
        znu[:] = ((znw[0][1:] + znw[0][:-1]) * 0.5)[None].astype(np.float32)
        f.flush(); f.close()
        paths.append(p)

    cfg = LetkfConfig(nmember=k, var_update=("T",), wrf_mp_physics=10,
                      wrf_mp_hail_opt=0, wrf_hypsometric_opt=2)
    ens = read_ensemble(paths, cfg)
    assert ens.rhoa is not None
    assert ens.rhoa.shape == (8, 7, 5, k)
    assert np.isfinite(ens.rhoa).all()
    assert "nqg" in ens.fields

    # exact identity for hypsometric opt 2 (grid.f90:427-436):
    # 1/rhoa = alb + al = d(ph_full)/(phm * log(pfd/pfu))
    # (the fixture's base state is not hydrostatically realistic, so check
    # the formula, not physical plausibility)
    from cwbnwp_letkf_tpu.io.netcdf import NetcdfReader
    with NetcdfReader(paths[0]) as nc:
        ph = nc.get_variable("PH")
        phb = nc.get_variable("PHB")
        mu = nc.get_variable("MU")
        mub = nc.get_variable("MUB")
        znw = np.ravel(nc.get_variable("ZNW"))
        znu = np.ravel(nc.get_variable("ZNU"))
        p_top = nc.get_scalar("P_TOP")
    mu_full = mu + mub
    for kk in range(5):
        pfu = mu_full * znw[kk + 1] + p_top
        pfd = mu_full * znw[kk] + p_top
        phm = mu_full * znu[kk] + p_top
        dph = (ph[:, :, kk + 1] - ph[:, :, kk]
               + phb[:, :, kk + 1] - phb[:, :, kk])
        expected = phm * np.log(pfd / pfu) / dph
        np.testing.assert_allclose(ens.rhoa[:, :, kk, 0], expected,
                                   rtol=1e-4)
