"""Enrichment UDFs — user-agent and IP analogs of the reference's U1/U2
(SURVEY.md §2.9), as Arrow-vectorized pandas UDFs returning nested
structs.

Reference:
- ``parseUserAgent`` — ua_parser lib UDF returning a nested
  UserAgent(family, major, minor, patch, os, device) struct, null on
  error (functions/UserAgentFunctions.scala:32-53).
- ``parseIp`` — MaxMind GeoLite2 lookup with a lazily-initialized,
  LRU-cached per-executor reader (functions/GeoIpFunctions.scala:30-49;
  geoip/MaxMinIpGeo.scala:43-115).

Neither external database ships in this environment, so:
- the UA parser is a deterministic pure-regex ladder covering the major
  browser/OS/device families (public UA grammar, not the ua_parser DB);
- the IP "geo" lookup is a clearly-marked deterministic stub (hash-based
  bucketing into a fixed country table) exercising the exact same Spark
  plumbing — struct-returning vectorized UDF, module-level lazy
  singleton per Python worker (the reference's lazy-transient pattern,
  GeoIpFunctions.scala:31-37).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Full reference struct shape (UserAgentFunctions.scala:25-31):
# UserAgent(family, major, minor, patch, os(family, major, minor),
# device(family)) — flattened here with os_/device_ prefixes, which is
# what the reference's enrich-then-RenameColumns chain produced anyway.
UA_STRUCT = T.StructType(
    [
        T.StructField("family", T.StringType()),
        T.StructField("major", T.StringType()),
        T.StructField("minor", T.StringType()),
        T.StructField("patch", T.StringType()),
        T.StructField("os_family", T.StringType()),
        T.StructField("os_major", T.StringType()),
        T.StructField("os_minor", T.StringType()),
        T.StructField("device_family", T.StringType()),
    ]
)

_UA_BROWSERS = [
    ("Edge", re.compile(r"Edg(?:e|A|iOS)?/(\d+)\.(\d+)(?:\.(\d+))?")),
    ("Chrome", re.compile(r"Chrome/(\d+)\.(\d+)(?:\.(\d+))?")),
    ("Firefox", re.compile(r"Firefox/(\d+)\.(\d+)(?:\.(\d+))?")),
    ("Safari", re.compile(r"Version/(\d+)\.(\d+)(?:\.(\d+))?.*Safari")),
    ("IE", re.compile(r"MSIE (\d+)\.(\d+)")),
]
_UA_OS = [
    ("Windows", re.compile(r"Windows NT (\d+)(?:\.(\d+))?")),
    ("iOS", re.compile(r"(?:iPhone|iPad|iPod).*?OS (\d+)[._](\d+)?")),
    ("Mac OS X", re.compile(r"Mac OS X (\d+)[._](\d+)?")),
    ("Android", re.compile(r"Android (\d+)(?:\.(\d+))?")),
    ("Linux", re.compile(r"Linux()()")),
]
_UA_DEVICE = [
    ("iPhone", re.compile(r"iPhone")),
    ("iPad", re.compile(r"iPad")),
    ("Mobile", re.compile(r"Mobile|Android")),
]

_UA_COLS = [
    "family", "major", "minor", "patch",
    "os_family", "os_major", "os_minor", "device_family",
]


def _parse_ua_batch(s: pd.Series) -> pd.DataFrame:
    rows = []
    for ua in s:
        if not isinstance(ua, str) or not ua:
            rows.append((None,) * len(_UA_COLS))
            continue
        f = mj = mn = pt = None
        for name, rx in _UA_BROWSERS:
            m = rx.search(ua)
            if m:
                g = m.groups()
                f, mj, mn = name, g[0], g[1]
                pt = g[2] if len(g) > 2 else None
                break
        o, omj, omn = "Other", None, None
        for name, rx in _UA_OS:
            m = rx.search(ua)
            if m:
                g = m.groups()
                o = name
                omj = g[0] or None
                omn = (g[1] or None) if len(g) > 1 else None
                break
        d = next((name for name, rx in _UA_DEVICE if rx.search(ua)), "Desktop")
        rows.append((f or "Other", mj, mn, pt, o, omj, omn, d))
    return pd.DataFrame(rows, columns=_UA_COLS)


@F.pandas_udf(UA_STRUCT)
def parse_user_agent_udf(ua: pd.Series) -> pd.DataFrame:
    """Vectorized UA parse -> struct (reference U1 analog)."""
    return _parse_ua_batch(ua)


# Full reference struct shape (geoip/IpLocation.scala:28-35): country /
# continent / postalCode / geoPoint(lat, lon) — postal code included so
# a reference user's downstream projections keep working.
IP_STRUCT = T.StructType(
    [
        T.StructField("country_code", T.StringType()),
        T.StructField("continent", T.StringType()),
        T.StructField("postal_code", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)

_IP_RE = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")

# Deterministic stub "geo database": no GeoLite2 in this environment.
# Same plumbing as the reference's per-executor lazy reader.
_COUNTRIES = [
    ("US", "NA", 39.8, -98.6), ("GB", "EU", 54.0, -2.0), ("DE", "EU", 51.0, 9.0),
    ("FR", "EU", 47.0, 2.0), ("IN", "AS", 21.0, 78.0), ("CN", "AS", 35.0, 103.0),
    ("JP", "AS", 36.0, 138.0), ("BR", "SA", -10.0, -55.0), ("AU", "OC", -25.0, 134.0),
    ("ZA", "AF", -29.0, 24.0),
]

_geo_cache: dict[str, tuple] = {}  # per-python-worker LRU analog (MaxMinIpGeo.scala:69-77)


def _lookup_ip(ip: str):
    if ip in _geo_cache:
        return _geo_cache[ip]
    m = _IP_RE.match(ip) if isinstance(ip, str) else None
    if not m or any(int(g) > 255 for g in m.groups()):
        res = (None, None, None, None, None)
    else:
        # STUB: deterministic bucket of the /16 prefix — NOT a real geo DB.
        pfx = int(m.group(1)) * 256 + int(m.group(2))
        cc, cont, lat, lon = _COUNTRIES[pfx % len(_COUNTRIES)]
        res = (cc, cont, f"{pfx % 100000:05d}", lat, lon)
    if len(_geo_cache) < 10_000:
        _geo_cache[ip] = res
    return res


@F.pandas_udf(IP_STRUCT)
def parse_ip_udf(ip: pd.Series) -> pd.DataFrame:
    """Vectorized IP -> geo struct (reference U2 analog; stub DB)."""
    rows = [_lookup_ip(v) for v in ip]
    return pd.DataFrame(
        rows, columns=["country_code", "continent", "postal_code", "lat", "lon"]
    )
