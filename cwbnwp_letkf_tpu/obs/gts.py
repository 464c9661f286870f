"""WRFDA "gts_omboma" conventional-obs parser + station-altitude lookup.

Re-designs ``module_gts_omboma.f90`` (/root/reference/module_gts_omboma.f90).
The reference has every rank read its own member's text file and merge the
per-member ``omb`` columns with ``mpi_iallgatherv`` (gts_omboma.f90:508-611);
here a thread pool reads all member files and stacks the member axis
directly.

File format (gts_omboma.f90:93,132,135): repeated platform sections

    <iv_type:a20><nobs:i8>
    then per report: <nlev:i8><nreq:i8>
    then per level, one fixed-width record line
    '(2i8,a5,2f9.2,f17.7,5(2f17.7,i8,2f17.7))':
      kk(i8) l(i8) id(a5) lat(f9.2) lon(f9.2) pre(f17.7)
      then per observed variable: obs(f17.7) omb(f17.7) qc(i8) err(f17.7) oma(f17.7)

Platform families and their variable counts (gts_omboma.f90:101-500):
surface (synop/ships/buoy/metar/sonde_sfc/tamdar_sfc): 5 vars, 1 level/report;
wind-profile (pilot/profiler/geoamv/qscat/polaramv): 2 vars, multi-level;
gpspw: 1 var (the f17.7 slot holds altitude, not pressure);
upper-air (sound/tamdar/airep): 4 vars, multi-level;
gpsref: 1 var (slot holds altitude).

``hdxb = obs - omb`` (the file stores omb = obs - H(xb); gts_omboma.f90:171).
Station altitude comes from a string-ID join against the WRFDA ``obs_gts``
ASCII file (read_alt_info / get_alt, gts_omboma.f90:704-1049).
"""
from __future__ import annotations

import concurrent.futures as cf
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import GtsType
from .base import PlatformObs

#: family name -> (obs_type enum, nvar, multi-level?, slot-is-altitude?)
FAMILY = {
    "synop": (GtsType.SYNOP, 5, False, False),
    "ships": (GtsType.SHIPS, 5, False, False),
    "buoy": (GtsType.BUOY, 5, False, False),
    "metar": (GtsType.METAR, 5, False, False),
    "sonde_sfc": (GtsType.SONDE_SFC, 5, False, False),
    "tamdar_sfc": (GtsType.TAMDAR_SFC, 5, False, False),
    "pilot": (GtsType.PILOT, 2, True, False),
    "profiler": (GtsType.PROFILER, 2, True, False),
    "geoamv": (GtsType.GEOAMV, 2, True, False),
    "qscat": (GtsType.QSCAT, 2, True, False),
    "polaramv": (GtsType.POLARAMV, 2, True, False),
    "gpspw": (GtsType.GPSPW, 1, False, True),
    "sound": (GtsType.SOUND, 4, True, False),
    "tamdar": (GtsType.TAMDAR, 4, True, False),
    "airep": (GtsType.AIREP, 4, True, False),
    "gpsref": (GtsType.GPSREF, 1, True, True),
}


@dataclass
class GtsRecords:
    """Parsed records of one platform from one member file."""

    ids: List[str] = field(default_factory=list)
    lat: List[float] = field(default_factory=list)
    lon: List[float] = field(default_factory=list)
    pre: List[float] = field(default_factory=list)   # pressure (or altitude)
    obs: List[List[float]] = field(default_factory=list)    # [nvar] per rec
    omb: List[List[float]] = field(default_factory=list)
    qc: List[List[int]] = field(default_factory=list)
    err: List[List[float]] = field(default_factory=list)
    #: per-record level index within its report (1-based) for get_alt
    level: List[int] = field(default_factory=list)


def _parse_record_line(line: str, nvar: int):
    """One fixed-width record line -> (id, lat, lon, slot, per-var tuples)."""
    # widths: 8,8,5,9,9,17 then nvar * (17,17,8,17,17)
    ident = line[16:21]
    lat = float(line[21:30])
    lon = float(line[30:39])
    slot = float(line[39:56])
    pos = 56
    obs, omb, qc, err = [], [], [], []
    for _ in range(nvar):
        obs.append(float(line[pos:pos + 17])); pos += 17
        omb.append(float(line[pos:pos + 17])); pos += 17
        qc.append(int(line[pos:pos + 8])); pos += 8
        err.append(float(line[pos:pos + 17])); pos += 17
        pos += 17  # oma, unused (gts_omboma.f90 reads into scratch)
    return ident, lat, lon, slot, obs, omb, qc, err


def parse_member_file_fast(path: str):
    """Parse one member file, preferring the native C++ parser.

    Returns ``{family: records}`` where records are either
    :class:`~cwbnwp_letkf_tpu.io.native.NativeGtsFamily` (flat numpy arrays)
    or :class:`GtsRecords` — both duck-type for :func:`read_gts_ensemble`.
    """
    from ..io.native import parse_member_file_native

    native = parse_member_file_native(path)
    if native is not None:
        return native
    return parse_member_file(path)


def parse_member_file(path: str) -> Dict[str, GtsRecords]:
    """Parse one member's gts_omboma file into per-family records."""
    out: Dict[str, GtsRecords] = {}
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    n_lines = len(lines)
    while i < n_lines:
        header = lines[i]; i += 1
        if not header.strip():
            continue
        name = header[:20].strip().lower()
        nobs = int(header[20:28])
        fam = FAMILY.get(name)
        if fam is None or nobs <= 0:
            continue
        _, nvar, multilevel, _ = fam
        rec = out.setdefault(name, GtsRecords())
        for _ in range(nobs):
            hdr = lines[i]; i += 1
            nlev = int(hdr[:8])
            for lev in range(nlev):
                (ident, lat, lon, slot, obs, omb, qc, err) = \
                    _parse_record_line(lines[i], nvar)
                i += 1
                rec.ids.append(ident.strip())
                rec.lat.append(lat)
                rec.lon.append(lon)
                rec.pre.append(slot)
                rec.obs.append(obs)
                rec.omb.append(omb)
                rec.qc.append(qc)
                rec.err.append(err)
                rec.level.append(lev + 1)
    return out


# ---------------------------------------------------------------------------
# obs_gts station-altitude file (read_alt_info, gts_omboma.f90:704-1030)
# ---------------------------------------------------------------------------

#: WMO FM code -> (platform enum, single-level?, altitude-from-header?)
_FM_TABLE = {
    **{12: (GtsType.SYNOP, True, False)},
    **{fm: (GtsType.SHIPS, True, False) for fm in (13, 17)},
    **{fm: (GtsType.METAR, True, False) for fm in (15, 16)},
    **{fm: (GtsType.PILOT, False, False) for fm in (32, 33, 34)},
    **{fm: (GtsType.SOUND, False, False) for fm in (35, 36, 37, 38)},
    **{101: (GtsType.TAMDAR, False, False)},
    **{161: (GtsType.MTGIRS, False, False)},
    **{86: (GtsType.SATEM, False, False)},
    **{fm: (GtsType.AIREP, False, False) for fm in (42, 96, 97)},
    **{fm: (GtsType.GPSPW, True, True) for fm in (111, 114)},
    **{116: (GtsType.GPSREF, True, False)},
    **{121: (GtsType.SSMT1, False, False)},
    **{122: (GtsType.SSMT2, False, False)},
    **{281: (GtsType.QSCAT, False, False)},
    **{132: (GtsType.PROFILER, False, False)},
    **{135: (GtsType.BOGUS, False, False)},
    **{fm: (GtsType.BUOY, True, False) for fm in (18, 19)},
    **{133: (GtsType.AIRSR, False, False)},
}


class AltTable:
    """Station-ID -> per-level altitude lookup for each platform."""

    def __init__(self):
        self._tab: Dict[GtsType, Dict[str, List[float]]] = {}

    def add(self, platform: GtsType, ident: str, alts: List[float]):
        self._tab.setdefault(platform, {})[ident.strip()] = alts

    def get(self, platform: GtsType, ident: str, level: int) -> float:
        """get_alt (gts_omboma.f90:1032-1049); raises KeyError if absent."""
        alts = self._tab.get(platform, {}).get(ident.strip())
        if alts is None:
            raise KeyError(
                f"station id {ident!r} not found for {platform.name} "
                "(reference aborts with 'ID not found!!')")
        return alts[min(level, len(alts)) - 1]

    def has(self, platform: GtsType) -> bool:
        return platform in self._tab


_FLOAT_RE = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def parse_obs_gts(path: str) -> AltTable:
    """Parse the WRFDA obs_gts ASCII for station altitudes.

    The reference reads the record formats *from the file itself*
    (gts_omboma.f90:767-770: INFO=/SRFC=/EACH= lines).  WRFDA's writer uses:
      info: '(A12,1X,A19,1X,A40,1X,I6,3(F12.3,11X),6X,A40)'
      each: '(3(F12.3,I4,F7.2),11X,3(F12.3,I4,F7.2))'
    where the 4th (F12.3,I4,F7.2) triple on a level line is the height.
    We parse those two fixed layouts (tolerating whitespace drift by fixed
    slicing, like the Fortran reads).
    """
    table = AltTable()
    with open(path) as fh:
        lines = fh.read().splitlines()
    # skip the count headers until the EACH line, then the 3 format lines,
    # then one header line (gts_omboma.f90:762-772)
    i = 0
    while i < len(lines) and not lines[i].startswith("EACH"):
        i += 1
    i += 1  # past EACH counts line
    fmt_lines = 0
    while i < len(lines) and fmt_lines < 3:
        if "=" in lines[i][:12] or lines[i][:6].strip().endswith("_FMT"):
            fmt_lines += 1
        i += 1
    i += 1  # header line ('#' column header)

    while i < len(lines):
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        # info line: 'FM-12 SYNOP ' etc in cols 1-12
        m = re.match(r"\s*FM-?\s*(\d+)", line[:12])
        if not m:
            i += 1
            continue
        fm = int(m.group(1))
        level_str = line[74:80]
        try:
            nlev = int(level_str)
        except ValueError:
            nums = _FLOAT_RE.findall(line[60:])
            nlev = int(float(nums[0])) if nums else 1
        # elevation: 3rd F12.3 field; id: trailing A40
        elev_field = line[81 + 2 * 23: 81 + 2 * 23 + 12]
        try:
            elv = float(elev_field)
        except ValueError:
            elv = 0.0
        ident = line[-40:].strip().split()[0] if line[-40:].strip() else ""

        entry = _FM_TABLE.get(fm)
        i += 1
        if entry is None:
            continue
        platform, single, alt_from_header = entry
        # skip the SRFC line
        if i < len(lines):
            i += 1
        alts: List[float] = []
        if alt_from_header:
            alts = [elv]
        else:
            count = 1 if single else max(nlev, 1)
            for _ in range(count):
                if i >= len(lines):
                    break
                lev_line = lines[i]; i += 1
                # 4th triple's F12.3 = height: offset 3*23 + 11 skip
                off = 3 * 23 + 11
                try:
                    alts.append(float(lev_line[off:off + 12]))
                except ValueError:
                    nums = _FLOAT_RE.findall(lev_line)
                    alts.append(float(nums[9]) if len(nums) > 9 else 0.0)
        if ident:
            table.add(platform, ident, alts if alts else [0.0])
    return table


# ---------------------------------------------------------------------------
# ensemble assembly
# ---------------------------------------------------------------------------

def read_gts_ensemble(
    member_paths: Sequence[str],
    proj,
    alt_table: Optional[AltTable] = None,
    *,
    max_workers: int = 8,
) -> Dict[str, PlatformObs]:
    """Read all members' omboma files -> {family: PlatformObs}.

    Observation metadata (ids, coords, obs, error) is taken from the first
    member; per-member omb columns become ``hdxb[..., m] = obs - omb``
    (gts_omboma.f90:171) and per-member qc columns are kept (the solver's
    gate is any-member qc >= 0, letkf_core.f90:429).
    """
    import jax.numpy as jnp

    with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        parsed = list(ex.map(parse_member_file_fast, member_paths))
    k = len(parsed)
    out: Dict[str, PlatformObs] = {}
    for name, rec0 in parsed[0].items():
        fam = FAMILY[name]
        obs_type, nvar, _, slot_is_alt = fam
        n = len(rec0.ids)
        obs = np.asarray(rec0.obs, np.float32).T             # [nvar, n]
        err = np.asarray(rec0.err, np.float32).T
        hdxb = np.empty((nvar, n, k), np.float32)
        qc = np.empty((nvar, n, k), np.float32)
        for m, pm in enumerate(parsed):
            rm = pm.get(name)
            if rm is None or len(rm.ids) != n:
                raise ValueError(
                    f"member {m} has inconsistent obs count for {name}")
            omb = np.asarray(rm.omb, np.float32).T
            hdxb[:, :, m] = obs - omb
            qc[:, :, m] = np.asarray(rm.qc, np.float32).T
        lat = np.asarray(rec0.lat, np.float32)
        lon = np.asarray(rec0.lon, np.float32)
        if slot_is_alt:
            alt = np.asarray(rec0.pre, np.float32)
        elif alt_table is not None and alt_table.has(obs_type):
            alt = np.asarray(
                [alt_table.get(obs_type, i, l)
                 for i, l in zip(rec0.ids, rec0.level)], np.float32)
        else:
            alt = np.zeros(n, np.float32)
        x, y = proj.lonlat_to_xy(jnp.asarray(lon), jnp.asarray(lat))
        xyz = np.stack([np.asarray(x, np.float32),
                        np.asarray(y, np.float32), alt], axis=1)
        out[name] = PlatformObs(xyz=xyz, obs=obs, error=err, qc=qc,
                                hdxb=hdxb)
    return out


# ---------------------------------------------------------------------------
# writer (round-trip oracle, the reference's write_gts echo hooks)
# ---------------------------------------------------------------------------

def write_member_file(path: str, families: Dict[str, GtsRecords]):
    """Emit a gts_omboma-format file (single-level reports only)."""
    with open(path, "w") as fh:
        for name, rec in families.items():
            nvar = FAMILY[name][1]
            fh.write(f"{name:<20s}{len(rec.ids):8d}\n")
            for r in range(len(rec.ids)):
                fh.write(f"{1:8d}{nvar:8d}\n")
                parts = [f"{1:8d}{1:8d}{rec.ids[r]:<5.5s}"
                         f"{rec.lat[r]:9.2f}{rec.lon[r]:9.2f}"
                         f"{rec.pre[r]:17.7f}"]
                for v in range(nvar):
                    parts.append(
                        f"{rec.obs[r][v]:17.7f}{rec.omb[r][v]:17.7f}"
                        f"{rec.qc[r][v]:8d}{rec.err[r][v]:17.7f}"
                        f"{0.0:17.7f}")
                fh.write("".join(parts) + "\n")
