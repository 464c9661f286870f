"""Native C++ parsers vs the pure-Python oracles (csrc/gts_parser.cpp).

The Python parsers are the behavioral spec (themselves round-trip-tested in
test_obs_parsers.py); the native ones must produce identical arrays.
"""
import numpy as np
import pytest

from cwbnwp_letkf_tpu.io.native import (get_library, parse_member_file_native,
                                        parse_radar_file_native)
from cwbnwp_letkf_tpu.obs.gts import (GtsRecords, parse_member_file,
                                      write_member_file)
from cwbnwp_letkf_tpu.obs.radar import parse_radar_file, write_radar_file

pytestmark = pytest.mark.skipif(
    get_library() is None, reason="native parser library unavailable")


def _mk_records(rng, n, nvar):
    rec = GtsRecords()
    for i in range(n):
        rec.ids.append(f"S{i:03d}")
        rec.lat.append(float(rng.uniform(20, 26)))
        rec.lon.append(float(rng.uniform(118, 123)))
        rec.pre.append(float(rng.uniform(850, 1015)))
        rec.obs.append([float(rng.normal(0, 5)) for _ in range(nvar)])
        rec.omb.append([float(rng.normal(0, 1)) for _ in range(nvar)])
        rec.qc.append([int(rng.integers(-2, 2)) for _ in range(nvar)])
        rec.err.append([float(rng.uniform(0.5, 2)) for _ in range(nvar)])
        rec.level.append(1)
    return rec


def test_native_gts_matches_python(tmp_path):
    rng = np.random.default_rng(61)
    families = {"synop": _mk_records(rng, 40, 5),
                "sound": _mk_records(rng, 11, 4),
                "gpspw": _mk_records(rng, 5, 1)}
    path = str(tmp_path / "gts_letkf_001")
    write_member_file(path, families)

    py = parse_member_file(path)
    nat = parse_member_file_native(path)
    assert set(py) == set(nat)
    for name in py:
        p, n = py[name], nat[name]
        assert list(n.ids) == p.ids
        np.testing.assert_allclose(n.lat, np.asarray(p.lat, np.float32))
        np.testing.assert_allclose(n.lon, np.asarray(p.lon, np.float32))
        np.testing.assert_allclose(n.pre, np.asarray(p.pre, np.float32))
        np.testing.assert_array_equal(n.level, np.asarray(p.level))
        np.testing.assert_allclose(n.obs, np.asarray(p.obs, np.float32))
        np.testing.assert_allclose(n.omb, np.asarray(p.omb, np.float32))
        np.testing.assert_array_equal(n.qc, np.asarray(p.qc))
        np.testing.assert_allclose(n.err, np.asarray(p.err, np.float32))


def test_native_radar_matches_python(tmp_path):
    rng = np.random.default_rng(62)
    data = np.round(rng.normal(10, 20, (37, 5)).astype(np.float32), 4)
    path = str(tmp_path / "VR_letkf_001")
    write_radar_file(path, data)

    py = parse_radar_file(path)
    nat = parse_radar_file_native(path)
    np.testing.assert_array_equal(nat, py)


def test_native_radar_empty(tmp_path):
    path = str(tmp_path / "VR_letkf_002")
    with open(path, "w") as fh:
        fh.write(f"{0:10d}\n")
    nat = parse_radar_file_native(path)
    assert nat.shape == (0, 5)


def test_native_multilevel_reports(tmp_path):
    """Multi-level reports (sound-style) parse with correct level indices."""
    path = str(tmp_path / "gts_letkf_003")
    lines = [f"{'sound':<20s}{1:8d}", f"{3:8d}{4:8d}"]
    for lev in range(3):
        parts = [f"{1:8d}{lev+1:8d}{'RS001':<5s}{24.0:9.2f}{121.0:9.2f}"
                 f"{850.0 - 100*lev:17.7f}"]
        for v in range(4):
            parts.append(f"{v + lev:17.7f}{0.5:17.7f}{0:8d}{1.0:17.7f}"
                         f"{0.0:17.7f}")
        lines.append("".join(parts))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    py = parse_member_file(path)
    nat = parse_member_file_native(path)
    assert list(nat["sound"].level) == [1, 2, 3] == py["sound"].level
    np.testing.assert_allclose(nat["sound"].obs,
                               np.asarray(py["sound"].obs, np.float32))
