"""Timestamp helpers that tolerate both TIMESTAMP and TIMESTAMP_NTZ.

The driver's parquet fixtures carry plain ``timestamp[us]`` columns
(no UTC-adjustment flag), which Spark 4 reads as TIMESTAMP_NTZ —
and ``F.unix_micros`` rejects NTZ input outright
(DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE).  Every temporal operator
goes through :func:`epoch_us` instead, which widens NTZ to TIMESTAMP
first (a no-op on TIMESTAMP columns).  Correctness REQUIRES the UTC
session timezone the app pins (session.py / the driver recipe set
``spark.sql.session.timeZone=UTC``): the NTZ→TIMESTAMP cast
reinterprets the naive value in the session zone, and under a DST
timezone that mapping is not a uniform offset (ambiguous/skipped
local times), so even differences and range comparisons could shift
across DST transitions.  At UTC the result is bit-identical to
DuckDB's ``epoch_us`` on the same naive column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP *or* TIMESTAMP_NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
