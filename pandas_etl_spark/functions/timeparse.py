"""Datetime format translation layers.

1. strptime → Java DateTimeFormatter patterns, so the reference's
   ``parse_dates: {"date_column": {"format": "%d/%m/%y"}}`` YAML
   (/root/reference/README.md:52) drives Spark's ``to_timestamp``.
2. pandas ``Grouper(freq=...)`` aliases (/root/reference/README.md:54-58)
   → Spark time-bucketing expressions (``date_trunc`` / ``F.window``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime directive → Java DateTimeFormatter fragment
_STRPTIME = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%j": "DDD",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%z": "XX",
    "%Z": "zz",
    "%%": "%",
}


def strptime_to_java(fmt: str) -> str:
    """Translate a strptime format string to a Java DateTimeFormatter
    pattern (e.g. ``%d/%m/%y`` → ``dd/MM/yy``). Literal letters are
    single-quoted (Java treats bare letters as pattern chars)."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            directive = fmt[i : i + 2]
            java = _STRPTIME.get(directive)
            if java is None:
                raise ValueError(f"unsupported strptime directive {directive!r}")
            out.append(java)
            i += 2
        elif ch.isalpha():
            out.append(f"'{ch}'")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# pandas offset alias → (unit for date_trunc) for anchor-free frequencies
_FREQ_TRUNC = {
    "D": "day",
    "H": "hour",
    "h": "hour",
    "T": "minute",
    "min": "minute",
    "S": "second",
    "W": "week",  # pandas W == W-SUN label, but trunc-to-week is Monday; see grouper_bucket
    "M": "month",  # pandas M labels month *end*; we bucket by month *start* (documented divergence)
    "MS": "month",
    "Q": "quarter",
    "QS": "quarter",
    "Y": "year",
    "A": "year",
    "YS": "year",
}

_WEEKDAYS = ["MON", "TUE", "WED", "THU", "FRI", "SAT", "SUN"]


def grouper_bucket(col: str | Column, freq: str) -> Column:
    """pandas ``pd.Grouper(key=col, freq=freq)`` → a Spark bucket column.

    Returns the bucket *start* timestamp. Anchored weekly aliases
    (``W-MON`` … ``W-SUN``) bucket weeks *ending on* the anchor day, per
    pandas semantics; we emit the start of that 7-day window.

    Divergence note (documented, SURVEY §2.5): pandas labels some buckets
    by period *end* (``W``, ``M``); we always label by start — a stable,
    join-friendly convention. The pipeline layer can shift labels if
    end-labeling is required.
    """
    c = F.col(col) if isinstance(col, str) else col
    if freq.startswith("W-"):
        anchor = freq[2:].upper()
        if anchor not in _WEEKDAYS:
            raise ValueError(f"bad weekly anchor {freq!r}")
        # date_trunc('week', ts) → Monday start. A week "ending on" anchor
        # day starts the day after: shift so buckets start anchor+1.
        # offset (days) from Monday to the start day of a W-<anchor> week.
        start_idx = (_WEEKDAYS.index(anchor) + 1) % 7  # TUE for W-MON, ...
        # shift ts back by start_idx days, trunc to Monday, shift forward
        shifted = F.to_timestamp(
            F.date_trunc("week", c - F.expr(f"INTERVAL {start_idx} DAYS"))
        )
        return (shifted + F.expr(f"INTERVAL {start_idx} DAYS")).alias("bucket")
    unit = _FREQ_TRUNC.get(freq)
    if unit is None:
        raise ValueError(f"unsupported pandas freq alias {freq!r}")
    return F.date_trunc(unit, c).alias("bucket")


def ts_seconds(col: str | Column) -> Column:
    """Epoch seconds (fractional, microsecond precision preserved) from a
    timestamp column, robust to TIMESTAMP_NTZ inputs.

    ``CAST(ts AS DOUBLE)`` raises DATATYPE_MISMATCH on TIMESTAMP_NTZ
    (parquet TIMESTAMP(NANOS) read natively on Spark 4.1+), so callers
    that receive a raw frame — one that did not pass through
    ``sources.load_table``'s normalization — would crash. Casting through
    TIMESTAMP first is a no-op for already-normalized columns and maps
    NTZ via the session time zone (pinned UTC by the session factory),
    so both representations yield identical seconds. ``F.unix_timestamp``
    is NOT equivalent: it truncates to whole seconds, which would change
    gap-based sessionization on sub-second event streams.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")
