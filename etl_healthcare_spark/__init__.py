"""etl_healthcare_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of buralog/etl-healthcare (reference surveyed in
SURVEY.md), re-expressed Spark-first.

The reference (``/root/reference``) is a serverless healthcare ETL pipeline
(HL7v2 / CSV / FHIR / JSON ingest -> validate -> normalize -> FHIR map ->
idempotent persist -> query API).  This engine provides the same operator
inventory (SURVEY.md §2) as declarative DataFrame transformations so Catalyst
and Tungsten pick the physical plan, plus the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) needed at
100 TB scale.

Layout:
    session     tuned SparkSession factory
    schemas     StructType twins of the reference's JSON-Schema contracts
    datasets    loaders for the driver's synthetic tables
    functions/  column-expression helper libraries (HL7, hashing, text, vectors)
    sources/    S1-S11 sources & sinks (csv, hl7, json, landing, audit, quarantine)
    operators/  P/V/U operators (normalize, validate, persist, dedup, similarity,
                text, multimodal, pagination)
    plans/      the query surface: Q1-Q6 serving queries + G/J/W/O analytics
    streaming/  §2.12 micro-batch pipeline, quarantine retry/redrive
"""

__version__ = "0.1.0"
