"""Timezone-independent timestamp construction.

``cast(timestamp as timestamp_ntz)`` routes through
``spark.sql.session.timeZone``; the driver runs a vanilla SparkSession
with the host timezone, so correctness must never depend on that cast.
These helpers build TIMESTAMP_NTZ arithmetically from epoch
microseconds (``unix_micros`` is TZ-independent: it reads the
underlying instant), which is exact — ``decimal(20,0)/1000000`` keeps
all 6 fractional digits, where a double division would round µs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ntz_from_epoch_micros(us: Column) -> Column:
    """TIMESTAMP_NTZ for the UTC wall-clock of an epoch-µs instant."""
    secs = us.cast("decimal(20,0)") / F.lit(1000000)
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz") + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), secs
    )


def ntz_from_timestamp(ts: Column) -> Column:
    """TIMESTAMP_NTZ (UTC wall-clock) from a TIMESTAMP column without
    the session-TZ-dependent cast."""
    return ntz_from_epoch_micros(F.unix_micros(ts))


def timestamp_from_ntz(ts: Column) -> Column:
    """TIMESTAMP (instant) from a TIMESTAMP_NTZ column, interpreting the
    naive value as UTC wall-clock — the inverse of ntz_from_timestamp.
    ``cast(ntz as timestamp)`` would route through the session timezone;
    instead extract the NTZ's calendar fields (all TZ-free on NTZ) into
    epoch µs and build the instant with ``timestamp_micros``.
    ``date_part('SECOND')`` yields decimal(8,6) seconds, so the ×1e6 is
    exact to the µs."""
    us = (
        F.unix_date(ts.cast("date")).cast("long") * F.lit(86400000000)
        + F.hour(ts).cast("long") * F.lit(3600000000)
        + F.minute(ts).cast("long") * F.lit(60000000)
        + (F.date_part(F.lit("SECOND"), ts) * 1000000).cast("long")
    )
    return F.timestamp_micros(us)
