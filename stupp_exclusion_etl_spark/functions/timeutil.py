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
