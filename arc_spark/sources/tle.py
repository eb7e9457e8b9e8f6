"""NORAD Two-Line Element (TLE) ingestion → typed DataFrame.

Reference parity: /root/reference/internal/ingest/tle.go:78-591 (ParseTLEFile,
parseLine1/parseLine2, computeDerivedMetrics, classifyOrbit,
TLERecordsToTypedColumnar). The TLE fixed-column format itself is public
(NORAD/CelesTrak element-set specification); this is a fresh Python
implementation that reproduces the reference's output schema:

    time (timestamp, µs)  norad_id  object_name  classification
    international_designator  orbit_type  inclination_deg  raan_deg
    eccentricity  arg_perigee_deg  mean_anomaly_deg  mean_motion_rev_day
    bstar  mean_motion_dot  mean_motion_ddot  revolution_number
    semi_major_axis_km  period_min  apogee_km  perigee_km

Scale note: a single TLE payload is tiny (edge-ingest shaped), so the parser
is a pure function. For bulk catalogs (many files), :func:`tle_files_to_df`
distributes parsing with ``mapInPandas`` — one Arrow batch of file contents
in, one typed batch of records out, no driver round-trip.
"""

from __future__ import annotations

import datetime as dt
import math
from collections.abc import Iterator

MU_EARTH = 3.986004418e14  # m³/s² (WGS-84 standard gravitational parameter)
RADIUS_EARTH_KM = 6371.0  # mean Earth radius
GEO_ALT_KM = 35786.0


class TLEParseError(ValueError):
    pass


def _checksum_ok(line: str) -> bool:
    """Mod-10 TLE checksum: digits count as value, '-' counts as 1."""
    if len(line) < 69 or not line[68].isdigit():
        return False
    total = 0
    for ch in line[:68]:
        if ch.isdigit():
            total += int(ch)
        elif ch == "-":
            total += 1
    return total % 10 == int(line[68])


def _mod_exp(s: str) -> float:
    """Modified-exponential TLE notation: ' 12345-3' → 0.12345e-3."""
    s = s.strip()
    if not s or s in ("+", "-"):
        return 0.0
    sign = 1.0
    if s[0] in "+-":
        if s[0] == "-":
            sign = -1.0
        s = s[1:]
    # exponent is the trailing signed digit(s)
    exp = 0
    for i in range(len(s) - 1, -1, -1):
        if s[i] in "+-":
            exp = int(s[i:])
            s = s[:i]
            break
    mantissa = float("0." + s.strip()) if s.strip() else 0.0
    return sign * mantissa * (10.0 ** exp)


def _epoch_to_us(year2: int, day_frac: float) -> int:
    """2-digit epoch year + fractional day-of-year → epoch-µs UTC.
    Years ≥57 map to 19xx, else 20xx (the TLE era convention)."""
    year = 1900 + year2 if year2 >= 57 else 2000 + year2
    base = dt.datetime(year, 1, 1, tzinfo=dt.timezone.utc)
    t = base + dt.timedelta(days=day_frac - 1.0)
    return int(t.timestamp() * 1_000_000)


def classify_orbit(perigee_km: float, apogee_km: float, ecc: float) -> str:
    """Altitude/eccentricity orbit class, matching the reference's bands
    (tle.go:476-507): SUB, HEO (e>0.25 & high apogee), GEO (±200 km band),
    LEO (<2000 km), MEO, else HEO."""
    if perigee_km < 0:
        return "SUB"
    if ecc > 0.25 and apogee_km > GEO_ALT_KM:
        return "HEO"
    avg = (perigee_km + apogee_km) / 2
    if GEO_ALT_KM - 200 < avg < GEO_ALT_KM + 200:
        return "GEO"
    if apogee_km < 2000:
        return "LEO"
    if perigee_km >= 2000 and apogee_km <= GEO_ALT_KM:
        return "MEO"
    return "HEO"


def _derived(mm_rev_day: float, ecc: float) -> tuple[float, float, float, float]:
    """(semi_major_axis_km, period_min, apogee_km, perigee_km) from mean
    motion + eccentricity (Kepler's third law, a = (µ/n²)^⅓)."""
    if mm_rev_day <= 0:
        return 0.0, 0.0, 0.0, 0.0
    n = mm_rev_day * 2 * math.pi / 86400.0
    a_km = (MU_EARTH / (n * n)) ** (1.0 / 3.0) / 1000.0
    period_min = 86400.0 / mm_rev_day / 60.0
    perigee = a_km * (1 - ecc) - RADIUS_EARTH_KM
    apogee = a_km * (1 + ecc) - RADIUS_EARTH_KM
    return a_km, period_min, apogee, perigee


def parse_entry(name: str, line1: str, line2: str) -> dict:
    """One TLE entry → record dict (column names = output schema)."""
    if len(line1) < 69 or not line1.startswith("1 "):
        raise TLEParseError("line 1 malformed")
    if len(line2) < 69 or not line2.startswith("2 "):
        raise TLEParseError("line 2 malformed")
    if not _checksum_ok(line1):
        raise TLEParseError("line 1 checksum")
    if not _checksum_ok(line2):
        raise TLEParseError("line 2 checksum")
    norad = line1[2:7].strip()
    if norad != line2[2:7].strip():
        raise TLEParseError("line1/line2 satellite number mismatch")
    try:
        year2 = int(line1[18:20])
        day_frac = float(line1[20:32])
        mm_dot = float(line1[33:43])
        mm_ddot = _mod_exp(line1[44:52])
        bstar = _mod_exp(line1[53:61])
        inc = float(line2[8:16])
        raan = float(line2[17:25])
        ecc = float("0." + line2[26:33].strip())
        arg_p = float(line2[34:42])
        mean_anom = float(line2[43:51])
        mm = float(line2[52:63])
        rev = float(line2[63:68].strip() or 0)
    except ValueError as exc:
        raise TLEParseError(f"numeric field: {exc}") from exc
    a_km, period_min, apogee, perigee = _derived(mm, ecc)
    return {
        "time": _epoch_to_us(year2, day_frac),
        "norad_id": norad,
        "object_name": name.strip(),
        "classification": line1[7],
        "international_designator": line1[9:17].strip(),
        "orbit_type": classify_orbit(perigee, apogee, ecc) if mm > 0 else "",
        "inclination_deg": inc,
        "raan_deg": raan,
        "eccentricity": ecc,
        "arg_perigee_deg": arg_p,
        "mean_anomaly_deg": mean_anom,
        "mean_motion_rev_day": mm,
        "bstar": bstar,
        "mean_motion_dot": mm_dot,
        "mean_motion_ddot": mm_ddot,
        "revolution_number": rev,
        "semi_major_axis_km": a_km,
        "period_min": period_min,
        "apogee_km": apogee,
        "perigee_km": perigee,
    }


def parse_tle(text: str) -> tuple[list[dict], list[str]]:
    """Parse a TLE file body (2-line and 3-line formats, mixed OK).
    Returns (records, warnings) — bad entries are skipped with a warning,
    like the reference (tle.go:78-153, ≤100 warnings retained)."""
    lines = [ln.rstrip() for ln in text.splitlines()]
    lines = [ln for ln in lines if ln]
    records: list[dict] = []
    warnings: list[str] = []
    n_warn = 0
    i = 0
    entry = 0
    while i < len(lines):
        entry += 1
        if lines[i].startswith("1 "):
            if i + 1 >= len(lines):
                break
            name, l1, l2 = "NORAD " + lines[i][2:7].strip(), lines[i], lines[i + 1]
            i += 2
        else:
            if i + 2 >= len(lines):
                break
            name, l1, l2 = lines[i], lines[i + 1], lines[i + 2]
            i += 3
        try:
            records.append(parse_entry(name, l1, l2))
        except TLEParseError as exc:
            n_warn += 1
            if len(warnings) < 100:
                warnings.append(f"entry {entry} ({name.strip()}): {exc}")
    if n_warn > 100:
        warnings.append(f"... and {n_warn - 100} more warnings suppressed")
    return records, warnings


TLE_SCHEMA = (
    "time timestamp, norad_id string, object_name string, "
    "classification string, international_designator string, "
    "orbit_type string, inclination_deg double, raan_deg double, "
    "eccentricity double, arg_perigee_deg double, mean_anomaly_deg double, "
    "mean_motion_rev_day double, bstar double, mean_motion_dot double, "
    "mean_motion_ddot double, revolution_number double, "
    "semi_major_axis_km double, period_min double, apogee_km double, "
    "perigee_km double"
)

_COLS = [f.split()[0] for f in TLE_SCHEMA.split(", ")]


def _records_to_pdf(records: list[dict]):
    import pandas as pd

    pdf = pd.DataFrame.from_records(records, columns=_COLS)
    pdf["time"] = pd.to_datetime(pdf["time"], unit="us", utc=True).dt.tz_localize(None)
    return pdf


def tle_to_df(spark, text: str):
    """Single TLE payload → DataFrame (the ingest-endpoint shape)."""
    records, _ = parse_tle(text)
    return spark.createDataFrame(_records_to_pdf(records), schema=TLE_SCHEMA)


def tle_files_to_df(spark, files_df, content_col: str = "content"):
    """Bulk catalog parse: DataFrame[(…, content)] → record DataFrame.
    Each file parses inside its executor task (mapInPandas, Arrow-batched) —
    a million-file catalog never touches the driver."""
    def gen(batches) -> Iterator:
        for pdf in batches:
            out = []
            for body in pdf[content_col]:
                recs, _ = parse_tle(body)
                out.extend(recs)
            yield _records_to_pdf(out)

    return files_df.mapInPandas(gen, schema=TLE_SCHEMA)
