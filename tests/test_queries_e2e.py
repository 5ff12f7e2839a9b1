"""End-to-end: fixtures -> normalize -> merge -> Q1-Q3 serving queries +
keyset pagination (the reference's VALIDATION.md runbook as a pytest)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_healthcare_spark.operators.normalize import build_normalized_envelope
from etl_healthcare_spark.operators.persist import ParquetStateStore
from etl_healthcare_spark.operators.pagination import (
    clamp_limit,
    encode_token,
    keyset_page,
    next_token_from_rows,
)
from etl_healthcare_spark.plans.queries import (
    latest_observation,
    latest_per_group,
    observations_by_patient,
    tenant_scan,
)
from etl_healthcare_spark.sources.csv_labx import labx_rows_to_dto


def _state(spark, tmp_path):
    rows = [
        ("pat-1", "718-7", "5.6", "mmol/L", "2025-09-30T10:00:00Z"),
        ("pat-1", "718-7", "6.1", "mmol/L", "2025-10-01T10:00:00Z"),
        ("pat-1", "8867-4", "72", "/min", "2025-09-30T10:05:00Z"),
        ("pat-2", "718-7", "4.9", "mmol/L", "2025-09-30T11:00:00Z"),
    ]
    raw = spark.createDataFrame(rows, ["patientId", "code", "value", "unit", "effectiveDateTime"])
    dto = labx_rows_to_dto(raw)
    env = build_normalized_envelope(
        dto, tenant_id=F.lit("t1"), source=F.lit("test"), idempotency_key=F.col("ingestHash")
    )
    batch = env.select(
        "tenantId", "entityType", "entityId", "patientId", "code", "value", "unit",
        "effectiveDateTime", "idempotencyKey",
    )
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    store.merge(batch, updated_at=dt.datetime(2025, 10, 2))
    return store.read()


def test_q2_timeline_scan(spark, tmp_path):
    state = _state(spark, tmp_path)
    rows = observations_by_patient(state, "t1", "pat-1", code="718-7").collect()
    assert [r.value for r in rows] == [5.6, 6.1]  # ascending by effective
    rows = observations_by_patient(
        state, "t1", "pat-1", ts_from=dt.datetime(2025, 10, 1)
    ).collect()
    assert len(rows) == 1 and rows[0].value == 6.1


def test_q3_latest_observation(spark, tmp_path):
    state = _state(spark, tmp_path)
    r = latest_observation(state, "t1", "pat-1", "718-7").collect()
    assert len(r) == 1 and r[0].value == 6.1  # true latest, not 50-row-window
    assert latest_observation(state, "t1", "pat-9", "718-7").collect() == []  # null if absent


def test_q6_tenant_scan_and_guard(spark, tmp_path):
    state = _state(spark, tmp_path)
    assert tenant_scan(state, "t1").count() == 4
    assert tenant_scan(state, "t2").count() == 0  # V6: other tenant sees nothing


def test_latest_per_group(spark, tmp_path):
    state = _state(spark, tmp_path)
    latest = latest_per_group(state, ["patientId", "code"])
    got = {(r.patientId, r.code): r.value for r in latest.collect()}
    assert got[("pat-1", "718-7")] == 6.1
    assert got[("pat-2", "718-7")] == 4.9


def test_keyset_pagination_roundtrip(spark, tmp_path):
    state = _state(spark, tmp_path).select("effectiveDateTime", "entityId", "value")
    n = clamp_limit(2)
    page1 = keyset_page(state, ["effectiveDateTime", "entityId"], n).collect()
    assert len(page1) == 2
    tok = next_token_from_rows([r.asDict() for r in page1], ["effectiveDateTime", "entityId"], n)
    assert tok is not None
    page2 = keyset_page(state, ["effectiveDateTime", "entityId"], n, tok).collect()
    assert len(page2) == 2
    # no overlap, full coverage, order preserved
    ids = [r.entityId for r in page1 + page2]
    assert len(set(ids)) == 4
    times = [r.effectiveDateTime for r in page1 + page2]
    assert times == sorted(times)
    # short page => no next token
    assert next_token_from_rows([r.asDict() for r in page2[:1]], ["effectiveDateTime", "entityId"], n) is None


def test_clamp_limit():
    assert clamp_limit(None) == 25  # default (api-query handler.ts:65)
    assert clamp_limit(0) == 1
    assert clamp_limit(10_000) == 100


def test_load_table_normalizes_nested_ntz(spark, tmp_path):
    """TIMESTAMP_NTZ nested inside struct/array columns must normalize to
    TimestampType at load, not just top-level dtypes (advisor round-2)."""
    from etl_healthcare_spark.datasets import load_table

    spark.sql(
        """
        SELECT 1 AS id,
               TIMESTAMP_NTZ '2026-01-02 03:04:05' AS top,
               named_struct('at', TIMESTAMP_NTZ '2026-01-02 03:04:05', 'n', 7) AS meta,
               array(TIMESTAMP_NTZ '2026-01-02 03:04:05') AS times
        """
    ).write.mode("overwrite").parquet(str(tmp_path / "nested.parquet"))
    df = load_table(spark, str(tmp_path), "nested")
    assert "timestamp_ntz" not in str(df.schema).lower()
    row = df.head()
    # UTC pin makes the NTZ->LTZ cast the wall-clock identity
    assert row.meta.at == row.top and row.times[0] == row.top
    assert row.meta.n == 7
