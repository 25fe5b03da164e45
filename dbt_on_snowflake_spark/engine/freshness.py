"""Source freshness (reference: ``loaded_at_field: ORDER_TS`` at
__sources.yml:168 — dbt's `source freshness` compares max(loaded_at) to
now against warn/error thresholds).

One max() aggregation per source with a declared loaded_at_field; the max
aggregates map-side, so freshness costs a single narrow column scan even
on the largest source.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class FreshnessResult:
    source: str
    table: str
    loaded_at_field: str
    max_loaded_at: datetime | None
    age_seconds: float | None
    status: str  # pass | warn | error


_PERIOD_SECONDS = {"minute": 60.0, "hour": 3600.0, "day": 86400.0}


def _threshold_seconds(spec, default: float, which: str) -> float:
    """dbt ``warn_after``/``error_after``: ``{count: N, period:
    minute|hour|day}``. Missing spec falls back to the engine default."""
    if not spec:
        return default
    try:
        count = float(spec["count"])
        period = _PERIOD_SECONDS[str(spec["period"]).rstrip("s")]
    except (KeyError, TypeError, ValueError) as e:
        raise ValueError(
            f"freshness {which}: expected {{count: N, period: "
            f"minute|hour|day}}, got {spec!r}"
        ) from e
    return count * period


def check_freshness(
    spark: SparkSession,
    project,
    runner,
    warn_after_s: float = 24 * 3600,
    error_after_s: float = 7 * 24 * 3600,
    now: datetime | None = None,
) -> list[FreshnessResult]:
    """``now`` is injectable for deterministic tests (SURVEY §7.4's
    frozen-clock rule for nondeterministic expressions). The
    ``warn_after_s``/``error_after_s`` arguments are engine-wide
    DEFAULTS; a source's declared ``freshness:`` block in sources.yml
    (``warn_after``/``error_after`` with dbt's count+period shape,
    table-level overriding group-level) takes precedence per source."""
    results = []
    now = now or datetime.now(timezone.utc)
    for (group, tname), src in project.sources.items():
        if not src.loaded_at_field:
            continue
        spec = src.freshness or {}
        src_warn_s = _threshold_seconds(
            spec.get("warn_after"), warn_after_s, "warn_after"
        )
        src_error_s = _threshold_seconds(
            spec.get("error_after"), error_after_s, "error_after"
        )
        df = spark.table(runner.resolve_source(group, tname))
        row = df.agg(F.max(src.loaded_at_field).alias("m")).collect()[0]
        max_ts = row["m"]
        if max_ts is None:
            results.append(
                FreshnessResult(group, tname, src.loaded_at_field, None, None, "error")
            )
            continue
        ts = max_ts if max_ts.tzinfo else max_ts.replace(tzinfo=timezone.utc)
        age = (now - ts).total_seconds()
        status = "pass" if age < src_warn_s else (
            "warn" if age < src_error_s else "error"
        )
        results.append(
            FreshnessResult(group, tname, src.loaded_at_field, max_ts, age, status)
        )
    return results
