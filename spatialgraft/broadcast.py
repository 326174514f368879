"""Auto-selection between broadcast and shuffled multicast query sides.

Every multicast join in the engine (range, intersects, PIP, kNN ring /
stage-2 cover) takes a `broadcast_queries` flag.  True forces a driver-
side broadcast build — correct for small query sets, a driver hazard for
huge ones; False forces a shuffled join.  The default (None) size-gates:
one cheap count of the PRE-explode query side, multiplied by the
operator's bounded fan-out (ring <= 9 cells, box cover <= ~64 at the
join cell level) and a conservative row width, compared against the
session's spark.sql.autoBroadcastJoinThreshold.  The count is a tiny
column-pruned job (the query side is by construction the small side),
and the decision then matches what a user would pick knowing the size —
no flag knowledge required (VERDICT r2 item 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame

# conservative serialized width of one multicast row (ids + milli bbox)
ROW_BYTES = 64

_UNITS = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
          "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}


def threshold_bytes(spark) -> int:
    """Parse spark.sql.autoBroadcastJoinThreshold ('10MB', '10485760b',
    plain bytes, or -1 = disabled)."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                             "10485760")).strip().lower()
    for suffix, mult in sorted(_UNITS.items(), key=lambda kv: -len(kv[0])):
        if raw.endswith(suffix):
            return int(raw[: -len(suffix)]) * mult
    return int(raw)


def decide(side: DataFrame, flag: bool | None, fanout: int) -> bool:
    """Resolve a broadcast_queries flag: explicit True/False wins; None
    size-gates the exploded multicast estimate against the session
    broadcast threshold."""
    if flag is not None:
        return flag
    thr = threshold_bytes(side.sparkSession)
    if thr <= 0:
        return False
    return side.count() * fanout * ROW_BYTES <= thr
