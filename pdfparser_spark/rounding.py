"""Engine-portable rounding for computed doubles — THE one definition.

``floor(x * 10^k + 0.5) / 10^k`` is pure double arithmetic, so Spark and
DuckDB compute the identical value; pairing ``F.round`` with DuckDB
``ROUND`` instead diverges on exact .xxx5 boundaries (Spark rounds
decimal-HALF_UP, DuckDB rounds the double).  Oracles must mirror this form
textually (``FLOOR(x * 100.0 + 0.5) / 100.0``).

Shared by textqc / dedup / ann / events / __spark_entry__ so a future
boundary fix lands in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up(x, k: int) -> Column:
    scale = float(10**k)
    return F.floor(x * scale + 0.5) / scale


def r2(x) -> Column:
    return half_up(x, 2)


def r4(x) -> Column:
    return half_up(x, 4)
