"""End-to-end write path (SURVEY §3.1) + replay (§3.2): fixtures -> parse ->
validate -> FHIR gate -> envelope -> idempotent merge -> audit -> queries."""

import datetime as dt

from pyspark.sql import functions as F

from etl_healthcare_spark.pipeline import run_batch_pipeline
from etl_healthcare_spark.plans.queries import latest_observation
from etl_healthcare_spark.operators.persist import ParquetStateStore
from tests.test_adapters import LABX_CSV, MINIMAL_HL7


def _write_fixtures(tmp_path):
    csv_p = tmp_path / "labx.csv"
    csv_p.write_text(LABX_CSV)
    hl7_p = tmp_path / "minimal.hl7"
    hl7_p.write_text(MINIMAL_HL7)
    return str(csv_p), str(hl7_p)


def test_write_path_then_replay(spark, tmp_path):
    csv_p, hl7_p = _write_fixtures(tmp_path)
    state = str(tmp_path / "state")
    audit = str(tmp_path / "audit")

    r1 = run_batch_pipeline(
        spark,
        tenant_id="t1",
        state_dir=state,
        csv_path=csv_p,
        hl7_path=hl7_p,
        audit_dir=audit,
        batch_time=dt.datetime(2025, 10, 1, 12, 0),
    )
    assert r1.dto_valid == 4 and r1.dto_invalid == 0 and r1.fhir_invalid == 0
    actions1 = {r.action for r in r1.commit_log.collect()}
    assert actions1 == {"insert"}

    state_rows = ParquetStateStore(spark, state).read().collect()
    assert len(state_rows) == 4
    assert all(r.version == 1 for r in state_rows)
    # both sources landed under one tenant: 2 CSV codes + 2 HL7 codes
    assert {r.code for r in state_rows} == {"718-7", "8867-4"}
    assert {r.patientId for r in state_rows} == {"pat-001", "12345"}

    # audit trail written under tenantId=/date=/hour= partitions
    audited = spark.read.json(audit)
    assert audited.count() == 4
    assert set(audited.columns) >= {"at", "type", "tenantId", "traceId", "payload", "date", "hour"}

    # §3.2 replay: same inputs re-run -> all no-ops, versions unchanged
    r2 = run_batch_pipeline(
        spark,
        tenant_id="t1",
        state_dir=state,
        csv_path=csv_p,
        hl7_path=hl7_p,
        batch_time=dt.datetime(2025, 10, 2, 12, 0),
    )
    assert {r.action for r in r2.commit_log.collect()} == {"noop"}
    assert all(r.version == 1 for r in ParquetStateStore(spark, state).read().collect())

    # read path over the persisted store: true latest per (patient, code)
    latest = latest_observation(
        ParquetStateStore(spark, state).read(), "t1", "pat-001", "718-7"
    ).collect()
    assert len(latest) == 1 and latest[0].value == 5.6
