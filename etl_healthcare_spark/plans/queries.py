"""Q1-Q6: the reference's GraphQL + admin query surface as library functions.

Reference: services/api-query/src/handler.ts (getPatient :40-53,
observationsByPatient :64-108, latestObservation :110-139),
services/audit-list-api/src/handler.ts:23-67, services/health-api/src/
handler.ts:82-130, docs/VALIDATION.md:163-168 tenant scan.

Every function prepends the V6 tenant guard; on a tenant-partitioned store
Catalyst turns it into partition pruning (the reference's GSI access paths are
physical layout here, not code — SURVEY §4).

Deliberate divergence (SURVEY §2.8 Q3): latestObservation implements TRUE
latest-per-(patient,code).  The reference scans only the newest 50 rows and
can return null when >50 rows of other codes are newer
(api-query/src/handler.ts:123-127) — a real bug we do not reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pagination import clamp_limit, keyset_page
from ..operators.validate import tenant_guard


def get_patient(patients: DataFrame, tenant_id: str, patient_id: str) -> DataFrame:
    """Q1: tenant-scoped point lookup, 5-field projection."""
    return (
        tenant_guard(patients, tenant_id)
        .where(F.col("patientId") == patient_id)
        .select("patientId", "tenantId", "name", "birthDate", "updatedAt")
    )


def observations_by_patient(
    obs: DataFrame,
    tenant_id: str,
    patient_id: str,
    code: str | None = None,
    ts_from=None,
    ts_to=None,
    limit: int | None = None,
    token: str | None = None,
    tiebreak_col: str = "entityId",
) -> DataFrame:
    """Q2: ascending timeline range scan with optional code equality and
    time bounds, clamped limit, keyset pagination (handler.ts:64-108)."""
    df = tenant_guard(obs, tenant_id).where(F.col("patientId") == patient_id)
    if code is not None:
        df = df.where(F.col("code") == code)
    if ts_from is not None:
        df = df.where(F.col("effectiveDateTime") >= F.lit(ts_from))
    if ts_to is not None:
        df = df.where(F.col("effectiveDateTime") <= F.lit(ts_to))
    n = clamp_limit(limit)
    return keyset_page(df, ["effectiveDateTime", tiebreak_col], n, token)


def latest_observation(obs: DataFrame, tenant_id: str, patient_id: str, code: str) -> DataFrame:
    """Q3: true newest observation for (patient, code) — max_by form, a single
    partial-aggregable shuffle (no global sort)."""
    df = tenant_guard(obs, tenant_id).where((F.col("patientId") == patient_id) & (F.col("code") == code))
    cols = [c for c in df.columns]
    return (
        df.groupBy("tenantId", "patientId", "code")
        .agg(F.max_by(F.struct(*cols), F.col("effectiveDateTime")).alias("r"))
        .select("r.*")
    )


def latest_per_group(
    obs: DataFrame,
    group_cols: list[str],
    order_col: str = "effectiveDateTime",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """G6 generalized: newest full row per group.  Pass ``tiebreak`` columns
    to make the pick total under order-col ties (otherwise any tied row may
    be returned).

    UNIQUENESS REQUIREMENT (public contract): with ``tiebreak``, the LAST
    tiebreak column must be unique within (group, order_col, preceding
    tiebreaks) — e.g. an event/observation id.  If it is not, this returns
    ALL maximal rows (argmax semantics — possibly >1 row per group), where
    the struct-max fallback returns an arbitrary single one; callers that
    need exactly one row per group must supply a true tiebreak.  Groups
    whose ``order_col`` is all-NULL are returned (NULLs always lose to
    non-NULL order values); see the NULL contract in operators/argmax.py.

    Plan shape: the two-phase hash argmax (operators/argmax.py) when every
    order column is fixed-width — HashAggregate + shuffled-hash join-back,
    never a post-shuffle sort; the max_by(struct, struct) fallback (used
    for non-fixed-width order columns) plans SortAggregate.  Cost model
    per the argmax module docstring: the argmax join wins on LOW
    partial-collapse streams; for HIGH-collapse latest-per-group over a
    packable (timestamp, numeric-id) order with scalar payloads, the
    registry's q3/g6 DECIMAL(38,0)-packed one-pass max is strictly better
    than both — this generic whole-row helper can't pack arbitrary
    payloads, so callers on that fast path should use the packed recipe
    directly (SCALE.md §49)."""
    from ..operators.argmax import argmax_rows

    cols = obs.columns
    if tiebreak:  # argmax returns ALL maximal rows; only total orders qualify
        try:
            return argmax_rows(obs, list(group_cols), [order_col, *tiebreak]).select(*cols)
        except ValueError:
            pass  # non-fixed-width order column: fall through to max_by
    key = F.struct(F.col(order_col), *[F.col(c) for c in (tiebreak or [])])
    return (
        obs.groupBy(*group_cols)
        .agg(F.max_by(F.struct(*cols), key).alias("r"))
        .select("r.*")
    )


def tenant_scan(state: DataFrame, tenant_id: str, entity_type: str = "observation") -> DataFrame:
    """Q6: all items of a type for a tenant (begins_with(SK,...) analog)."""
    return tenant_guard(state, tenant_id).where(F.col("entityType") == entity_type)


def health_report(metrics: DataFrame, window_min: int = 15) -> DataFrame:
    """Q5/G1: per-minute, per-metric sums over a bounded lookback window
    (services/health-api/src/handler.ts:58-80: Period 60 s, Stat Sum,
    window clamped 5..1440 min)."""
    window_min = max(5, min(1440, window_min))
    return (
        metrics.groupBy(F.window("ts", "1 minute").alias("w"), "metric")
        .agg(F.sum("value").alias("value_sum"), F.count("*").alias("n"))
        .select(F.col("w.start").alias("minute"), "metric", "value_sum", "n")
    )
