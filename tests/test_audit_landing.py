"""S5 landing sink + S8/S9 audit sink/listing + O5 newest-write."""

import datetime as dt

from pyspark.sql import functions as F

from etl_healthcare_spark.sources.audit import append_audit, last_audit_write, list_audit
from etl_healthcare_spark.sources.landing import land_raw, read_landing


def test_audit_append_and_list(spark, tmp_path):
    audit_dir = str(tmp_path / "audit")
    lines = spark.createDataFrame(
        [
            (dt.datetime(2025, 1, 1, 9, 30), "ingest.raw.v1", "t1", "tr1", "{}"),
            (dt.datetime(2025, 1, 1, 17, 5), "etl.normalized.v1", "t1", "tr2", "{}"),
            (dt.datetime(2025, 1, 2, 8, 0), "etl.persisted.v1", "t2", "tr3", "{}"),
        ],
        "at timestamp, type string, tenantId string, traceId string, payload string",
    )
    append_audit(lines, audit_dir)

    t1 = list_audit(spark, audit_dir, "t1").collect()
    assert len(t1) == 2 and {r.type for r in t1} == {"ingest.raw.v1", "etl.normalized.v1"}
    assert {r.hour for r in t1} == {"09", "17"}  # zero-padded partition col

    d2 = list_audit(spark, audit_dir, "t2", date="2025-01-02").collect()
    assert len(d2) == 1 and d2[0].traceId == "tr3"
    assert list_audit(spark, audit_dir, "t2", date="2025-01-01").collect() == []

    last = last_audit_write(spark, audit_dir, "t1").collect()
    assert len(last) == 1 and last[0].traceId == "tr2"


def test_landing_roundtrip(spark, tmp_path):
    landing = str(tmp_path / "raw")
    raw = spark.createDataFrame(
        [("t1", '{"a":1}'), ("t2", '{"b":2}')], "tenantId string, payload string"
    )
    land_raw(raw, landing)
    back = read_landing(spark, landing, tenant_id="t1").collect()
    assert len(back) == 1
    assert back[0].content_hash.startswith("sha256:")
    assert back[0].payload == '{"a":1}'
