"""Registry batch: the remaining §2 gate/routing/persist operators —
V1 envelope gate, V3 FHIR conformance gate, P8 format routing, P10 fan-out,
U3+U4 commit-log/key derivation, O5 newest-partition pick, S10 DLQ redrive,
cube grouping, and an IVF-style coarse-quantized similarity search.

Fault injection is deterministic (modulus of the row id) so both engines see
the same invalid rows — the reference's skip-and-count semantics
(services/normalize/handler.ts:102-140) made oracle-checkable.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..datasets import load_table, observations
from ..operators.fhir import map_to_fhir
from ..operators.normalize import route_content_type
from ..operators.validate import envelope_rules, fhir_rules, tag_rejects
from .registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


WITH_OBS_T = """
WITH obs AS (
  SELECT 't' || CAST(user_id % 10 AS VARCHAR) AS tenantId,
         'p' || CAST(user_id AS VARCHAR)      AS patientId,
         event_type                           AS code,
         value,
         '1'                                  AS unit,
         ts                                   AS effectiveDateTime,
         event_id                             AS obsId
  FROM events
)
"""


# ---------------------------------------------------------------------------
# V1: envelope schema gate (AJV analog) with deterministic fault injection
# ---------------------------------------------------------------------------


@register(
    "v1_envelope_gate",
    sql="""
    WITH env AS (
      SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN 'ingest.raw.v2' ELSE 'ingest.raw.v1' END AS schema,
             CASE WHEN event_id % 13 = 0 THEN NULL
                  WHEN event_id % 13 = 1 THEN ''
                  ELSE 't' || CAST(user_id % 10 AS VARCHAR) END AS tenantId,
             CASE WHEN event_id % 17 = 0 THEN NULL ELSE 'http' END AS source,
             CASE WHEN event_id % 19 = 0 THEN 'abc'
                  ELSE 'ev-' || CAST(event_id AS VARCHAR) END AS idempotencyKey
      FROM events WHERE event_id < 20000
    )
    SELECT event_id,
           CASE WHEN NOT (schema = 'ingest.raw.v1') THEN 'schema_mismatch'
                WHEN NOT (tenantId IS NOT NULL AND length(tenantId) > 0) THEN 'tenant_missing'
                WHEN source IS NULL THEN 'source_missing'
                WHEN NOT (idempotencyKey IS NOT NULL AND length(idempotencyKey) >= 4)
                     THEN 'idempotency_missing'
                END AS _reject_reason
    FROM env
    """,
    doc="V1 envelope gate: the AJV ingest.raw.v1 required-field check "
    "(libs/contracts/src/validate.ts:13-27) as a stacked-when reject-reason "
    "column over deterministically-faulted envelopes; first failing rule "
    "names the reason, valid rows get NULL.",
)
def v1_envelope_gate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 20000)
    eid = F.col("event_id")
    env = ev.select(
        "event_id",
        F.when(eid % 11 == 0, "ingest.raw.v2").otherwise("ingest.raw.v1").alias("schema"),
        F.struct(
            F.when(eid % 13 == 0, F.lit(None).cast("string"))
            .when(eid % 13 == 1, F.lit(""))
            .otherwise(F.concat(F.lit("t"), (F.col("user_id") % 10).cast("string")))
            .alias("tenantId"),
            F.when(eid % 17 == 0, F.lit(None).cast("string")).otherwise(F.lit("http")).alias("source"),
            F.when(eid % 19 == 0, F.lit("abc"))
            .otherwise(F.concat(F.lit("ev-"), eid.cast("string")))
            .alias("idempotencyKey"),
        ).alias("metadata"),
    )
    return tag_rejects(env, envelope_rules()).select("event_id", "_reject_reason")


# ---------------------------------------------------------------------------
# V3: FHIR R4 conformance gate over the built struct
# ---------------------------------------------------------------------------


@register(
    "v3_fhir_gate",
    sql=WITH_OBS_T
    + """
    , dto AS (
      SELECT obsId,
             CASE WHEN obsId % 11 = 0 THEN NULL ELSE patientId END AS patientId,
             code,
             CASE WHEN obsId % 13 = 0 THEN NULL ELSE value END AS value,
             unit,
             CASE WHEN obsId % 17 = 0 THEN NULL ELSE effectiveDateTime END AS eff,
             CASE WHEN obsId % 7 = 0 THEN 'registered' ELSE 'final' END AS status,
             CASE WHEN obsId % 19 = 0 THEN 0 ELSE 1 END AS n_coding
      FROM obs WHERE tenantId = 't3'
    )
    SELECT obsId, status,
           'Patient/' || patientId AS reference,
           strftime(eff, '%Y-%m-%dT%H:%M:%SZ') AS eff_str,
           value, n_coding,
           CASE WHEN status NOT IN ('final','amended','corrected','preliminary')
                     THEN 'fhir_status_enum'
                WHEN n_coding < 1 THEN 'fhir_coding_empty'
                WHEN patientId IS NULL THEN 'fhir_subject_missing'
                WHEN eff IS NULL THEN 'fhir_effective_missing'
                WHEN value IS NULL THEN 'fhir_value_missing'
                END AS _reject_reason
    FROM dto
    """,
    doc="V3 FHIR conformance gate: Observation.r4.min.json required fields, "
    "status enum, coding minItems 1 (libs/validation/fhir-ajv.ts:9-14; "
    "skip-and-count at normalize/handler.ts:107-113) as predicates on the "
    "built struct, with deterministic fault injection on each rule.",
)
def v3_fhir_gate(spark, sf_dir):
    oid = F.col("obsId")
    dto = (
        observations(spark, sf_dir)
        .where(F.col("tenantId") == "t3")
        .select(
            "obsId",
            F.when(oid % 11 == 0, F.lit(None).cast("string")).otherwise(F.col("patientId")).alias("patientId"),
            "code",
            F.when(oid % 13 == 0, F.lit(None).cast("double")).otherwise(F.col("value")).alias("value"),
            "unit",
            F.when(oid % 17 == 0, F.lit(None).cast("timestamp"))
            .otherwise(F.col("effectiveDateTime"))
            .alias("effectiveDateTime"),
        )
    )
    fhir = map_to_fhir(dto)
    # post-build corruption of the constant-shaped fields (status / coding)
    fhir = fhir.withColumn(
        "fhir",
        F.when(oid % 7 == 0, F.col("fhir").withField("status", F.lit("registered"))).otherwise(F.col("fhir")),
    ).withColumn(
        "fhir",
        F.when(
            oid % 19 == 0,
            F.col("fhir").withField("code.coding", F.slice(F.col("fhir.code.coding"), 1, 0)),
        ).otherwise(F.col("fhir")),
    )
    tagged = tag_rejects(fhir, fhir_rules("fhir"))
    return tagged.select(
        "obsId",
        F.col("fhir.status").alias("status"),
        F.col("fhir.subject.reference").alias("reference"),
        F.col("fhir.effectiveDateTime").alias("eff_str"),
        F.col("fhir.valueQuantity.value").alias("value"),
        F.size("fhir.code.coding").alias("n_coding"),
        "_reject_reason",
    )


# ---------------------------------------------------------------------------
# P8: content-type / extension routing
# ---------------------------------------------------------------------------


@register(
    "p8_format_routing",
    sql="""
    WITH raw AS (
      SELECT event_id,
             CASE event_id % 5 WHEN 0 THEN 'text/csv' WHEN 1 THEN 'application/x-hl7'
                               WHEN 2 THEN NULL WHEN 3 THEN 'text/plain' ELSE '' END AS contentType,
             CASE event_id % 3 WHEN 0 THEN 'in/f.csv' WHEN 1 THEN 'in/f.HL7'
                               ELSE 'in/f.json' END AS key
      FROM events WHERE event_id < 5000
    )
    SELECT event_id, contentType, key,
           CASE WHEN contains(lower(coalesce(contentType,'')), 'csv')
                     OR ends_with(lower(coalesce(key,'')), '.csv') THEN 'text/csv'
                WHEN contains(lower(coalesce(contentType,'')), 'hl7')
                     OR ends_with(lower(coalesce(key,'')), '.hl7') THEN 'application/x-hl7'
                ELSE 'application/json' END AS routed
    FROM raw
    """,
    doc="P8 format routing: content-type dispatch with file-extension "
    "sniffing fallback and JSON default (services/normalize/handler.ts:60-71)"
    " — in Spark a when-chain, so one scan feeds all three branch pipelines.",
)
def p8_format_routing(spark, sf_dir):
    eid = F.col("event_id")
    raw = (
        _t(spark, sf_dir, "events")
        .where(eid < 5000)
        .select(
            "event_id",
            F.when(eid % 5 == 0, "text/csv")
            .when(eid % 5 == 1, "application/x-hl7")
            .when(eid % 5 == 2, F.lit(None).cast("string"))
            .when(eid % 5 == 3, "text/plain")
            .otherwise("")
            .alias("contentType"),
            F.when(eid % 3 == 0, "in/f.csv")
            .when(eid % 3 == 1, "in/f.HL7")
            .otherwise("in/f.json")
            .alias("key"),
        )
    )
    return raw.withColumn("routed", route_content_type(F.col("contentType"), F.col("key")))


# ---------------------------------------------------------------------------
# P10: fan-out (one document -> N rows)
# ---------------------------------------------------------------------------


@register(
    "p10_fanout",
    sql="""
    SELECT doc_id, u.word
    FROM documents, unnest(string_split(text, ' ')) AS u(word)
    WHERE doc_id < 30
    """,
    doc="P10 fan-out: one ingested payload -> N rows (the adapter-output "
    "loops at normalize/handler.ts:101,157) as explode() — row "
    "multiplication happens inside the scan stage, no shuffle.",
)
def p10_fanout(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


# ---------------------------------------------------------------------------
# U3 + U4: commit-log emission with derived keys
# ---------------------------------------------------------------------------


@register(
    "u3_commit_log",
    sql=WITH_OBS_T
    + """
    , latest AS (
      SELECT *, row_number() OVER (PARTITION BY patientId, code
                                   ORDER BY effectiveDateTime DESC, obsId DESC) AS rn
      FROM obs WHERE tenantId = 't2'
    )
    SELECT 'etl.persisted.v1' AS schema,
           'TENANT#t2' AS pk,
           'ENTITY#observation#' || patientId || ':' || code AS sk,
           'ENTITY#observation#' || patientId || ':' || code AS gsi1pk,
           'TENANT#t2' AS gsi1sk,
           'TENANT#t2#PATIENT#' || patientId AS gsi2pk,
           strftime(effectiveDateTime, '%Y-%m-%dT%H:%M:%SZ') || '#OBS#' || code
             || '#' || CAST(obsId AS VARCHAR) AS gsi2sk,
           'observation' AS entityType, value, 1 AS version
    FROM latest WHERE rn = 1
    """,
    doc="U3+U4 commit log: etl.persisted.v1 emission with the PK/SK/GSI key "
    "templates (services/persist/handler.ts:20-26,83-110; GSI2 layout "
    "api-query/src/handler.ts:66,111).  In the engine the keys are derived "
    "columns over the latest-per-entity state, not stored strings — "
    "partition/sort order supplies the access paths (SURVEY §4).",
)
def u3_commit_log(spark, sf_dir):
    o = observations(spark, sf_dir).where(F.col("tenantId") == "t2")
    w = W.partitionBy("patientId", "code").orderBy(F.desc("effectiveDateTime"), F.desc("obsId"))
    latest = o.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    ent = F.concat_ws(":", "patientId", "code")
    eff = F.date_format("effectiveDateTime", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return latest.select(
        F.lit("etl.persisted.v1").alias("schema"),
        F.lit("TENANT#t2").alias("pk"),
        F.concat(F.lit("ENTITY#observation#"), ent).alias("sk"),
        F.concat(F.lit("ENTITY#observation#"), ent).alias("gsi1pk"),
        F.lit("TENANT#t2").alias("gsi1sk"),
        F.concat(F.lit("TENANT#t2#PATIENT#"), F.col("patientId")).alias("gsi2pk"),
        F.concat(eff, F.lit("#OBS#"), F.col("code"), F.lit("#"), F.col("obsId").cast("string")).alias(
            "gsi2sk"
        ),
        F.lit("observation").alias("entityType"),
        "value",
        F.lit(1).alias("version"),
    )


# ---------------------------------------------------------------------------
# O5: newest-partition pick (the audit "last write" probe)
# ---------------------------------------------------------------------------


@register(
    "o5_newest_partition",
    sql=WITH_OBS_T
    + """
    SELECT tenantId, max(strftime(effectiveDateTime, '%Y-%m-%d/%H')) AS newest_partition,
           count(*) AS n
    FROM obs GROUP BY tenantId
    """,
    doc="O5 newest-object pick: the health probe's last-audit-write check "
    "(services/health-api/src/handler.ts:42-56) — newest Hive partition per "
    "tenant via a max over the partition path string (no listing loop; one "
    "partial-aggregated scan).",
)
def o5_newest_partition(spark, sf_dir):
    o = observations(spark, sf_dir)
    return o.groupBy("tenantId").agg(
        F.max(F.date_format("effectiveDateTime", "yyyy-MM-dd/HH")).alias("newest_partition"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# G8b: cube (multi-grain dashboard in one pass)
# ---------------------------------------------------------------------------


@register(
    "g8b_cube",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="G8 cube: every grain of the alarms dashboard (alarms-stack.ts:94-157)"
    " in one pass — Spark expands grouping sets inside a single shuffle "
    "instead of one job per grain.",
)
def g8b_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "n",
        "sum_qty",
    )


# ---------------------------------------------------------------------------
# S10: DLQ redrive round-trip (filesystem side effects: rows-only)
# ---------------------------------------------------------------------------


@register(
    "s10_dlq_redrive",
    sql=None,  # filesystem side effects: rows-only
    doc="S10 DLQ redrive: quarantine rejects with retry counts, redrive <=100 "
    "eligible rows back to the stage input, rows at MAX_RECEIVES stay parked "
    "(services/dlq-retry-api/src/handler.ts:44-72; messaging-stack.ts:47). "
    "Returns a one-row census (redriven / parked / remaining).",
)
def s10_dlq_redrive(spark, sf_dir):
    from ..streaming.pipeline import MAX_RECEIVES, RETRY_COL, redrive_quarantine

    d = tempfile.mkdtemp(prefix="s10_dlq_")
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 300)
    rejects = ev.select(
        "event_id",
        F.lit("value_not_finite").alias("_reject_reason"),
        # 60 rows already at the receive cap -> parked; the rest eligible
        F.when(F.col("event_id") % 5 == 0, F.lit(MAX_RECEIVES)).otherwise(F.lit(1)).alias(RETRY_COL),
    )
    rejects.write.mode("overwrite").parquet(f"{d}/quarantine")
    n = redrive_quarantine(spark, f"{d}/quarantine", f"{d}/input", max_messages=100)
    remaining = spark.read.parquet(f"{d}/quarantine")
    return remaining.groupBy().agg(
        F.lit(n).alias("redriven"),
        F.sum(F.when(F.col(RETRY_COL) >= MAX_RECEIVES, 1).otherwise(0)).alias("parked"),
        F.count("*").alias("remaining"),
    )


# ---------------------------------------------------------------------------
# IVF-style coarse-quantized similarity search (scale path; rows-only)
# ---------------------------------------------------------------------------


@register(
    "sim_ivf_topk",
    sql="""
    SELECT vec_id AS id
    FROM embeddings
    WHERE vec_id <> 0
    ORDER BY list_cosine_similarity(
      embedding, (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
      vec_id
    LIMIT 10
    """,
    doc="IVF ANN with its exactness gate: deterministic k-means cells "
    "(operators/similarity.ivf_cells), probe cells nearest the query, exact "
    "cosine inside probed cells only.  Registered at nprobe == nlist, where "
    "IVF must equal brute-force top-k for ANY data — the oracle is the exact "
    "query, so the assignment/probe/score/union machinery is hash-verified "
    "(testdata embeddings are isotropic: the true top-10 spans every cell, "
    "so no partial probe can reach recall 1.0 here; partial-probe recall is "
    "covered on planted clusters in test_llm_ops).  At 100 TB the cell id is "
    "a partition column: probes prune to nprobe partitions.",
)
def sim_ivf_topk(spark, sf_dir):
    from ..operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    corpus = emb.where(F.col("vec_id") != 0)
    return ivf_topk(corpus, "embedding", "vec_id", qvec, nlist=8, nprobe=8, k=10, iters=1).select("id")


@register(
    "pipeline_e2e_write_path",
    sql=None,  # filesystem side effects (fixture files + state store): rows-only
    doc="SURVEY §3.1 end-to-end write path as one query: CSV + HL7 fixtures "
    "-> parse -> V2/V3 gates -> envelope -> idempotent merge -> replay "
    "(same inputs re-merged).  Returns the two runs' commit-log censuses: "
    "run 1 all inserts at version 1, run 2 all no-ops — the "
    "VALIDATION.md:198-215 idempotency demo end-to-end.",
)
def pipeline_e2e_write_path(spark, sf_dir):
    import datetime as dt_
    from pathlib import Path

    from ..pipeline import run_batch_pipeline

    d = Path(tempfile.mkdtemp(prefix="pipe_e2e_"))
    (d / "labx.csv").write_text(
        "patientId,code,value,unit,effectiveDateTime\n"
        "pat-001,718-7,5.6,mmol/L,2025-09-30T10:00:00Z\n"
        "pat-001,8867-4,72,/min,2025-09-30T10:05:00Z\n"
    )
    (d / "minimal.hl7").write_text(
        "MSH|^~\\&|LAB|HOSP|ETL|PIPE|20250930101500||ORU^R01|MSG0001|P|2.5\r"
        "PID|1||77777^^^HOSP^MR||ROE^JANE\r"
        "OBR|1|||GLUCOSE^Glucose^LN||20250930100000\r"
        "OBX|1|NM|718-7^Glucose^LN||6.1|mmol/L|3.5-7.8|N|||F|||20250930100000\r"
    )
    logs = []
    for run_no, bt in ((1, dt_.datetime(2025, 10, 1)), (2, dt_.datetime(2025, 10, 2))):
        r = run_batch_pipeline(
            spark,
            tenant_id="t1",
            state_dir=str(d / "state"),
            csv_path=str(d / "labx.csv"),
            hl7_path=str(d / "minimal.hl7"),
            batch_time=bt,
        )
        logs.append(
            r.commit_log.groupBy("action", "version")
            .count()
            .withColumn("run", F.lit(run_no))
        )
    return logs[0].unionByName(logs[1]).orderBy("run", "action", "version")


@register(
    "q4_audit_list",
    sql=None,  # filesystem side effects (audit dir fixture): rows-only
    doc="Q4 GET /audit/list: tenant-guarded, date-pruned audit listing with "
    "the 500-object cap (services/audit-list-api/src/handler.ts:23-67) — "
    "partition discovery does the prefix listing, V6 guard + clamped limit "
    "on top.  Returns the listed lines for one tenant/date.",
)
def q4_audit_list(spark, sf_dir):
    from ..sources.audit import append_audit, list_audit

    d = tempfile.mkdtemp(prefix="q4_audit_")
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 600)
    lines = ev.select(
        F.col("ts").alias("at"),
        F.lit("etl.normalized.v1").alias("type"),
        F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")).alias("tenantId"),
        F.col("event_id").cast("string").alias("traceId"),
        F.col("props").alias("payload"),
    )
    append_audit(lines, f"{d}/audit")
    listed = list_audit(spark, f"{d}/audit", "t0", date="2024-01-01", limit=500)
    return listed.groupBy("tenantId", "date").count().orderBy("date")
