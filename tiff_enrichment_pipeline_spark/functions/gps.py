"""GPS/EXIF string parsing as pure column expressions (no Python UDF).

The reference shells out to ``exiftool`` and parses its text output per file
(src/pipeline/utils/gps_utils.py:7-96). In the engine, raw EXIF strings are
ordinary string columns and the parse is a Catalyst regexp pipeline:

- DMS parse        reference: utils/gps_utils.py:7-42
  handles ``52 deg 6' 28.48" N``, ``52.1234N``, plain ``52.1234``;
  S/W hemispheres negate; unparseable → 0.0 (the reference's fallback).
- altitude extract reference: utils/gps_utils.py:73-79
  first float out of ``"26.9 m Above Sea Level"``.
- EXIF timestamp   reference: utils/gps_utils.py:81-86
  ``datetime.strptime(ts, "%Y:%m:%d %H:%M:%S")``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FLOAT_RE = r"[-+]?[0-9]*\.?[0-9]+"
_DMS_RE = r"(\d+(?:\.\d+)?)\s*deg\s*(\d+(?:\.\d+)?)'\s*(\d+(?:\.\d+)?)\"?\s*([NSEWnsew])"
_DEC_HEMI_RE = r"^\s*([-+]?\d+(?:\.\d+)?)\s*([NSEWnsew])\s*$"
_PLAIN_RE = r"^\s*([-+]?\d+(?:\.\d+)?)\s*$"


def parse_dms(coord: Column) -> Column:
    """DMS / decimal+hemisphere / plain-float coordinate string → decimal
    degrees (reference: utils/gps_utils.py:7-42). Fallback 0.0 like the
    reference's ``except: return 0.0``."""
    s = F.trim(coord)

    deg = F.regexp_extract(s, _DMS_RE, 1)
    mins = F.regexp_extract(s, _DMS_RE, 2)
    secs = F.regexp_extract(s, _DMS_RE, 3)
    hemi_dms = F.upper(F.regexp_extract(s, _DMS_RE, 4))
    dms_val = (
        deg.try_cast("double")
        + mins.try_cast("double") / F.lit(60.0)
        + secs.try_cast("double") / F.lit(3600.0)
    )
    dms_signed = F.when(hemi_dms.isin("S", "W"), -dms_val).otherwise(dms_val)

    dec = F.regexp_extract(s, _DEC_HEMI_RE, 1)
    hemi_dec = F.upper(F.regexp_extract(s, _DEC_HEMI_RE, 2))
    dec_val = dec.try_cast("double")
    dec_signed = F.when(hemi_dec.isin("S", "W"), -dec_val).otherwise(dec_val)

    plain = F.regexp_extract(s, _PLAIN_RE, 1).try_cast("double")

    return F.coalesce(
        F.when(deg != "", dms_signed),
        F.when(dec != "", dec_signed),
        plain,
        F.lit(0.0),
    )


def parse_altitude(alt_str: Column) -> Column:
    """First float in an altitude string, e.g. ``"26.9 m Above Sea Level"``
    → 26.9 (reference: utils/gps_utils.py:73-79). Fallback 0.0."""
    return F.coalesce(
        F.regexp_extract(F.trim(alt_str), _FLOAT_RE, 0).try_cast("double"),
        F.lit(0.0),
    )


def parse_exif_timestamp(ts: Column) -> Column:
    """EXIF ``YYYY:MM:DD HH:MM:SS`` → timestamp, NULL on malformed input
    (ANSI-safe; reference: utils/gps_utils.py:81-86)."""
    return F.try_to_timestamp(ts, F.lit("yyyy:MM:dd HH:mm:ss"))
