"""Scalar function library — SURVEY.md §2.7 F1-F18, re-expressed as
JVM-side Column expressions (whole-stage-codegen'd; no Python UDFs).

Each helper cites the reference behavior it re-homes; all are thin,
composable Column→Column functions so Catalyst sees plain expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def regex_extract_id(col: Column | str, pattern: str = "_/id/(.+?)/") -> Column:
    """F1: team-id extraction (`re.search('_/id/(.+?)/', href)`,
    datasources.py:433)."""
    return F.regexp_extract(col, pattern, 1)


def strip_control_chars(col: Column | str) -> Column:
    """F2: `translate({\\r\\n\\t: None})` (datasources.py:341, :715-716)."""
    return F.translate(col, "\r\n\t", "")


def remove_suffix(col: Column | str, suffix: str) -> Column:
    """F3: `removesuffix(' County')` (datasources.py:345) as an anchored
    regexp_replace."""
    import re

    return F.regexp_replace(col, re.escape(suffix) + "$", "")


def clean_stat_cell(col: Column | str) -> Column:
    """F2+F4 composed: strip control chars then trim (datasources.py:713-716)."""
    return F.trim(strip_control_chars(col))


def split_index(col: Column | str, delim: str, index: int) -> Column:
    """F5: `s.split(delim)[i]` (datasources.py:534 gameId split).
    1-based part index, JVM-side."""
    return F.split_part(F.col(col) if isinstance(col, str) else col, F.lit(delim), F.lit(index + 1))


def url_lower(col: Column | str) -> Column:
    """F6: `state.lower()` in URL build (datasources.py:328)."""
    return F.lower(col)


def name_concat(*cols: Column | str, sep: str = " ") -> Column:
    """F7: f-string name building, e.g. `f"{long_name} {short_name}"`
    (datasources.py:725)."""
    return F.concat_ws(sep, *cols)


def b64_decode_utf8(col: Column | str) -> Column:
    """F8: `base64.b64decode(event['data']).decode('utf-8')`
    (functions/main.py:41). try_to_binary, not unbase64: under ANSI a
    single malformed payload would abort the whole batch extract and
    lose every valid payload with it — malformed input decodes to NULL
    (the streaming twin's skip semantics; code-review r6)."""
    return F.try_to_binary(col, F.lit("base64")).cast("string")


def json_day_block(col: Column | str, path: str = "$.forecast.forecastday[0].day") -> Column:
    """F9: nested JSON path addressing (datasources.py:266)."""
    return F.get_json_object(col, path)


def yesterday() -> Column:
    """F11: `date.today() - timedelta(days=1)` (datasources.py:131)."""
    return F.date_sub(F.current_date(), 1)


def month_of(col: Column | str) -> Column:
    """F12: EXTRACT(MONTH FROM Date) (datasources.py:159)."""
    return F.month(col)


def iso_dow(col: Column | str) -> Column:
    """F12: weekday() (datasources.py:609, Monday gate). ISO 1=Mon..7=Sun
    — `F.weekday` is 0=Mon, shifted for cross-engine parity with isodow."""
    return F.weekday(col) + F.lit(1)


def millis_to_date(col: Column | str) -> Column:
    """F13: DATE(TIMESTAMP_MILLIS(last_modified_time)) (datasources.py:394)."""
    return F.to_date(F.timestamp_millis(col))


def add_one_year(col: Column | str) -> Column:
    """F14: datetime(y+1, m, d) annual-refresh arithmetic
    (datasources.py:397, :316)."""
    return F.add_months(col, 12)


def pct_round(num: Column, den: Column, digits: int = 2) -> Column:
    """F15: round((counter/len)*100, 2) (datasources.py:231)."""
    return F.round(num / den * 100, digits)


def in_season(col: Column | str, months=(8, 9, 10, 11, 12, 1)) -> Column:
    """F17: `tdy.month in [8..12,1]` season gate (datasources.py:480, :609)."""
    return F.month(col).isin(list(months))


def fill_unavail(col: Column | str, sentinel: str = "unavail") -> Column:
    """F18: missing stat fields set to 'unavail' (datasources.py:717-720)."""
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(sentinel))


def compound_stat_made(col: Column | str) -> Column:
    """§2.11/§7 helper: '4-12' made-attempted STRING fact → made (INT).
    (Game_Team_Stats ThirdDownEff shape, datasources.py:585-597.)"""
    return F.split_part(F.col(col) if isinstance(col, str) else col, F.lit("-"), F.lit(1)).cast("int")


def compound_stat_att(col: Column | str) -> Column:
    """'4-12' → attempted (INT)."""
    return F.split_part(F.col(col) if isinstance(col, str) else col, F.lit("-"), F.lit(2)).cast("int")


def mmss_to_seconds(col: Column | str) -> Column:
    """'28:36' mm:ss possession clock → seconds (INT)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.split_part(c, F.lit(":"), F.lit(1)).cast("int") * 60
        + F.split_part(c, F.lit(":"), F.lit(2)).cast("int")
    )


def decimal_sum(col: Column | str, scale: int = 4) -> Column:
    """Order-exact SUM for double facts: cast to decimal (exact,
    order-insensitive addition) then back to double. Keeps aggregate
    results bit-identical regardless of partitioning/shuffle order —
    required for cross-engine hash parity and for deterministic results
    on a 1000-executor cluster."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
