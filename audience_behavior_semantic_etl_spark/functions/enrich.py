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

# Full reference struct shape, NESTED as the reference emits it
# (UserAgentFunctions.scala:28-30): UserAgent(family, major, minor,
# patch, os(family, major, minor, patch, patchMinor), device(family)).
# A reference user's dotted-path projections (u.os.family,
# u.device.family) and the enrich-then-RenameColumns flatten chain both
# work unchanged against this shape. The regex-ladder stub does not
# extract OS patch levels, so os.patch / os.patch_minor are null —
# shape fidelity with stubbed values, per the env limits.
OS_STRUCT = T.StructType(
    [
        T.StructField("family", T.StringType()),
        T.StructField("major", T.StringType()),
        T.StructField("minor", T.StringType()),
        T.StructField("patch", T.StringType()),
        T.StructField("patch_minor", T.StringType()),
    ]
)
DEVICE_STRUCT = T.StructType([T.StructField("family", T.StringType())])
UA_STRUCT = T.StructType(
    [
        T.StructField("family", T.StringType()),
        T.StructField("major", T.StringType()),
        T.StructField("minor", T.StringType()),
        T.StructField("patch", T.StringType()),
        T.StructField("os", OS_STRUCT),
        T.StructField("device", DEVICE_STRUCT),
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

_UA_COLS = ["family", "major", "minor", "patch", "os", "device"]


def _parse_one_ua(ua) -> tuple:
    """Parse ONE user-agent string through the regex ladder."""
    if not isinstance(ua, str) or not ua:
        return (None, None, None, None, None, None)
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
    os_struct = {
        "family": o, "major": omj, "minor": omn,
        "patch": None, "patch_minor": None,
    }
    return (f or "Other", mj, mn, pt, os_struct, {"family": d})


# Per-worker parse memo (the reference's per-executor LRU-cached reader
# pattern, MaxMinIpGeo.scala:69-77, applied to the UA ladder). Real
# traffic has a heavy-tailed UA distribution — a handful of browser
# builds dominate — so parsing each DISTINCT string once per batch and
# dict-mapping the rest removes the regex ladder from the per-row path
# (guide §4.5: heavyweight work once, amortized over the batch).
_ua_cache: dict[str, tuple] = {}


def _parse_ua_batch(s: pd.Series) -> pd.DataFrame:
    rows = []
    for ua in s:
        hit = _ua_cache.get(ua) if isinstance(ua, str) else None
        if hit is None:
            hit = _parse_one_ua(ua)
            if isinstance(ua, str) and len(_ua_cache) < 100_000:
                _ua_cache[ua] = hit
        rows.append(hit)
    return pd.DataFrame(rows, columns=_UA_COLS)


@F.pandas_udf(UA_STRUCT)
def parse_user_agent_udf(ua: pd.Series) -> pd.DataFrame:
    """Vectorized UA parse -> struct (reference U1 analog)."""
    return _parse_ua_batch(ua)


# Full reference struct shape, NESTED (geoip/IpLocation.scala:28-35):
# IpLocation(countryCode, countryName, region, city, geoPoint(lat, lon),
# postalCode, continent) — snake_cased, geo_point as a genuine sub-struct
# so a reference user's g.geo_point.lat projections keep working.
GEO_POINT_STRUCT = T.StructType(
    [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
)
IP_STRUCT = T.StructType(
    [
        T.StructField("country_code", T.StringType()),
        T.StructField("country_name", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("geo_point", GEO_POINT_STRUCT),
        T.StructField("postal_code", T.StringType()),
        T.StructField("continent", T.StringType()),
    ]
)

_IP_RE = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")

# Deterministic stub "geo database": no GeoLite2 in this environment.
# Same plumbing as the reference's per-executor lazy reader.
_COUNTRIES = [
    ("US", "United States", "NA", 39.8, -98.6),
    ("GB", "United Kingdom", "EU", 54.0, -2.0),
    ("DE", "Germany", "EU", 51.0, 9.0),
    ("FR", "France", "EU", 47.0, 2.0),
    ("IN", "India", "AS", 21.0, 78.0),
    ("CN", "China", "AS", 35.0, 103.0),
    ("JP", "Japan", "AS", 36.0, 138.0),
    ("BR", "Brazil", "SA", -10.0, -55.0),
    ("AU", "Australia", "OC", -25.0, 134.0),
    ("ZA", "South Africa", "AF", -29.0, 24.0),
]

_geo_cache: dict[str, tuple] = {}  # per-python-worker LRU analog (MaxMinIpGeo.scala:69-77)


def _lookup_ip(ip: str):
    if ip in _geo_cache:
        return _geo_cache[ip]
    m = _IP_RE.match(ip) if isinstance(ip, str) else None
    if not m or any(int(g) > 255 for g in m.groups()):
        res = (None, None, None, None, None, None, None)
    else:
        # STUB: deterministic bucket of the /16 prefix — NOT a real geo
        # DB. region/city are synthetic but stable functions of the
        # prefix, filling the reference's region/city slots.
        pfx = int(m.group(1)) * 256 + int(m.group(2))
        b = pfx % len(_COUNTRIES)
        cc, cname, cont, lat, lon = _COUNTRIES[b]
        res = (
            cc,
            cname,
            f"R{b}",
            f"C{pfx % 997}",
            {"lat": lat, "lon": lon},
            f"{pfx % 100000:05d}",
            cont,
        )
    if len(_geo_cache) < 10_000:
        _geo_cache[ip] = res
    return res


@F.pandas_udf(IP_STRUCT)
def parse_ip_udf(ip: pd.Series) -> pd.DataFrame:
    """Vectorized IP -> geo struct (reference U2 analog; stub DB)."""
    rows = [_lookup_ip(v) for v in ip]
    return pd.DataFrame(
        rows,
        columns=[
            "country_code", "country_name", "region", "city",
            "geo_point", "postal_code", "continent",
        ],
    )
