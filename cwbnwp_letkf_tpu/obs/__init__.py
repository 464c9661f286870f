"""Observation ingest and device-resident observation containers.

* base.py      — unified flat obs arrays + per-platform static config
* gts.py       — WRFDA "omboma" conventional-obs text parser
* radar.py     — radar retrieval (dbz/vr/zdr/kdp) text parser
* altitude.py  — obs_gts station-altitude lookup
* synthetic.py — synthetic obs generators for tests/benchmarks
"""

from .base import PlatformObs, PlatformStatic, platform_statics_from_config

__all__ = ["PlatformObs", "PlatformStatic", "platform_statics_from_config"]
