"""Obs text parsers: round-trip through the reference file formats."""
import numpy as np

from cwbnwp_letkf_tpu.config import ProjectionConfig
from cwbnwp_letkf_tpu.obs.gts import (
    GtsRecords,
    parse_member_file,
    read_gts_ensemble,
    write_member_file,
)
from cwbnwp_letkf_tpu.obs.radar import (
    parse_radar_file,
    read_radar_ensemble,
    write_radar_file,
)
from cwbnwp_letkf_tpu.projection import LambertProjection


def _mk_records(rng, n, nvar):
    rec = GtsRecords()
    for i in range(n):
        rec.ids.append(f"S{i:04d}")
        rec.lat.append(float(rng.uniform(20, 27)))
        rec.lon.append(float(rng.uniform(118, 123)))
        rec.pre.append(float(rng.uniform(850, 1013)))
        rec.obs.append([float(rng.normal(0, 5)) for _ in range(nvar)])
        rec.omb.append([float(rng.normal(0, 1)) for _ in range(nvar)])
        rec.qc.append([int(rng.integers(-1, 2)) for _ in range(nvar)])
        rec.err.append([float(rng.uniform(0.5, 2)) for _ in range(nvar)])
        rec.level.append(1)
    return rec


def test_gts_roundtrip(tmp_path):
    rng = np.random.default_rng(51)
    families = {"synop": _mk_records(rng, 12, 5),
                "gpspw": _mk_records(rng, 4, 1)}
    path = str(tmp_path / "gts_letkf_001")
    write_member_file(path, families)
    parsed = parse_member_file(path)
    for name, orig in families.items():
        got = parsed[name]
        assert got.ids == orig.ids
        np.testing.assert_allclose(got.lat, orig.lat, atol=0.005)
        np.testing.assert_allclose(got.pre, orig.pre, atol=1e-6)
        np.testing.assert_allclose(got.obs, orig.obs, atol=1e-6)
        np.testing.assert_allclose(got.omb, orig.omb, atol=1e-6)
        assert got.qc == orig.qc


def test_gts_ensemble_hdxb_is_obs_minus_omb(tmp_path):
    rng = np.random.default_rng(52)
    k = 3
    base = _mk_records(rng, 6, 5)
    paths = []
    for m in range(k):
        rec = GtsRecords(**{f: list(getattr(base, f)) for f in
                            ("ids", "lat", "lon", "pre", "obs", "qc", "err",
                             "level")},
                         omb=[[float(rng.normal(0, 1)) for _ in range(5)]
                              for _ in range(6)])
        p = str(tmp_path / f"gts_letkf_{m+1:03d}")
        write_member_file(p, {"synop": rec})
        paths.append((p, rec))
    proj = LambertProjection.from_config(ProjectionConfig())
    out = read_gts_ensemble([p for p, _ in paths], proj)
    po = out["synop"]
    assert po.hdxb.shape == (5, 6, k)
    for m, (_, rec) in enumerate(paths):
        expected = np.asarray(base.obs, np.float32).T - \
            np.round(np.asarray(rec.omb, np.float32).T, 7)
        np.testing.assert_allclose(po.hdxb[:, :, m], expected, atol=1e-5)
    # xyz: lambert projection of lon/lat
    assert po.xyz.shape == (6, 3)
    assert np.isfinite(po.xyz).all()


def test_radar_roundtrip(tmp_path):
    rng = np.random.default_rng(53)
    k, n = 4, 25
    base = np.stack([
        rng.normal(20, 10, n),          # obs
        rng.normal(20, 10, n),          # hdxb member 0 (rewritten per member)
        rng.uniform(118, 123, n),       # lon
        rng.uniform(20, 27, n),         # lat
        rng.uniform(0, 12000, n) / 10,  # alt (f10.4 range)
    ], axis=1).astype(np.float32)
    paths = []
    members_hdxb = []
    for m in range(k):
        data = base.copy()
        data[:, 1] = rng.normal(20, 10, n)
        members_hdxb.append(data[:, 1].copy())
        p = str(tmp_path / f"MR_letkf_{m+1:03d}")
        write_radar_file(p, data)
        paths.append(p)

    single = parse_radar_file(paths[0])
    np.testing.assert_allclose(single[:, 0], base[:, 0], atol=1e-3)

    proj = LambertProjection.from_config(ProjectionConfig())
    po = read_radar_ensemble(paths, proj)
    assert po.hdxb.shape == (1, n, k)
    for m in range(k):
        np.testing.assert_allclose(po.hdxb[0, :, m], members_hdxb[m],
                                   atol=1e-3)
    assert po.qc.shape == (1, n, k)
    assert (po.qc == 0).all()           # radar has no qc -> always passes
    assert (po.error == 1).all()        # error comes from config err_muti


def test_radar_empty_file(tmp_path):
    p = str(tmp_path / "VR_letkf_001")
    with open(p, "w") as fh:
        fh.write("         0\n")
    assert parse_radar_file(p) is None
