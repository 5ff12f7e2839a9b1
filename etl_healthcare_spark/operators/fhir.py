"""P6: Observation DTO -> FHIR R4 Observation struct.

Reference: libs/mappers/observation.ts:3-19 — constant-shape nested struct:
LOINC coding system, ``Patient/<id>`` subject reference, UCUM valueQuantity
(unit doubles as UCUM code), status "final".

One nested `struct()` expression — Catalyst constant-folds the literals and
the whole map is a single projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import LOINC_SYSTEM, UCUM_SYSTEM


def fhir_observation_struct(
    patient_id: Column, code: Column, value: Column, unit: Column, effective: Column
) -> Column:
    return F.struct(
        F.lit("Observation").alias("resourceType"),
        F.lit("final").alias("status"),
        F.struct(
            F.array(
                F.struct(
                    F.lit(LOINC_SYSTEM).alias("system"),
                    code.alias("code"),
                    F.lit(None).cast("string").alias("display"),
                )
            ).alias("coding")
        ).alias("code"),
        F.struct(F.concat(F.lit("Patient/"), patient_id).alias("reference")).alias("subject"),
        F.date_format(effective, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("effectiveDateTime"),
        F.struct(
            value.alias("value"),
            unit.alias("unit"),
            F.lit(UCUM_SYSTEM).alias("system"),
            unit.alias("code"),
        ).alias("valueQuantity"),
    )


def map_to_fhir(dto: DataFrame, out_col: str = "fhir") -> DataFrame:
    """Attach the FHIR struct to a DTO DataFrame."""
    return dto.withColumn(
        out_col,
        fhir_observation_struct(
            F.col("patientId"), F.col("code"), F.col("value"), F.col("unit"), F.col("effectiveDateTime")
        ),
    )


def fhir_json_to_dto(df: DataFrame, json_col: str) -> DataFrame:
    """P6 inverse — ingest a FHIR R4 Observation resource (JSON string) back
    into the flat DTO: the reference accepts FHIR payloads on the generic
    JSON branch (README.md:3-4 ingestion formats; normalize/handler.ts
    generic path); this is the typed parse for them.

    `from_json` against the pruned R4 schema (schemas.FHIR_OBSERVATION) —
    one projection, no UDFs; unparseable JSON yields NULL struct fields that
    the V2/V3 gates then reject.
    """
    from ..schemas import FHIR_OBSERVATION

    r = F.from_json(F.col(json_col), FHIR_OBSERVATION)
    return df.select(
        F.regexp_replace(r["subject"]["reference"], "^Patient/", "").alias("patientId"),
        F.element_at(r["code"]["coding"], 1)["code"].alias("code"),
        r["valueQuantity"]["value"].alias("value"),
        r["valueQuantity"]["unit"].alias("unit"),
        F.to_timestamp(r["effectiveDateTime"], "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("effectiveDateTime"),
        r["status"].alias("status"),
    )
