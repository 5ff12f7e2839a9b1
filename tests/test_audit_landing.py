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


def test_binary_object_source_and_routing(spark, tmp_path):
    from etl_healthcare_spark.operators.normalize import route_content_type
    from etl_healthcare_spark.sources.landing import read_binary_objects

    (tmp_path / "a.csv").write_bytes(b"patientId,code\np1,718-7\n")
    (tmp_path / "b.hl7").write_bytes(b"MSH|^~\\&|x\rPID|1\r")
    (tmp_path / "c.json").write_bytes(b"{}")
    objs = read_binary_objects(spark, str(tmp_path))
    rows = {r.key.rsplit("/", 1)[-1]: r for r in objs.collect()}
    assert rows["a.csv"].byte_len == 24 and bytes(rows["a.csv"].payload).startswith(b"patientId")
    routed = {
        r.key.rsplit("/", 1)[-1]: r.routed
        for r in objs.withColumn(
            "routed", route_content_type(F.lit(None).cast("string"), F.col("key"))
        ).collect()
    }
    assert routed == {"a.csv": "text/csv", "b.hl7": "application/x-hl7", "c.json": "application/json"}
