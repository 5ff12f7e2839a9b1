"""U1-U4: the idempotent versioned state store (the DynamoDB table, rebuilt).

Reference semantics (services/persist/handler.ts:20-80):

* key = (tenant, entityType, entityId)  (PK/SK string templates, handler.ts:20-26;
  in this engine keys are real columns — partition/sort layout replaces the
  GSI key strings, SURVEY §2.6 U4)
* conditional upsert: write only if ``attribute_not_exists(idempotencyKey) OR
  idempotencyKey <> :idk`` (handler.ts:53) — a same-key retry is a no-op
* version = ``if_not_exists(version, 0) + 1`` on every effective write
  (handler.ts:51)
* commit-log emission of what was written (handler.ts:83-110, U3)

Spark-first: MERGE semantics as a full-outer join between current state and
the (deduplicated, U2) batch.  On disk the store is parquet partitioned by
``tenantId``; a merge only reads + rewrites the partitions that appear in the
batch (dynamic partition overwrite), which is the scale story: merging a
tenant's micro-batch into a 100 TB store touches only that tenant's files.
With Delta available this maps 1:1 onto ``MERGE INTO`` — the parquet fallback
is self-contained here (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..functions.materialize import cut_lineage

MERGE_KEYS = ["tenantId", "entityType", "entityId"]
ACTION_COL = "_action"  # insert | update | noop


def dedup_batch(
    batch: DataFrame,
    order_col: str | list[str] = "effectiveDateTime",
    keys: list[str] | None = None,
) -> DataFrame:
    """U2: within-batch dedup — last record per key wins, mirroring the
    sequential overwrite order of the reference's per-record loop under
    at-least-once delivery (SQS maxReceiveCount redelivery).  Pass several
    order columns to make the pick deterministic under timestamp ties."""
    keys = keys or MERGE_KEYS
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in order_cols])
    return batch.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def merge_frames(state: DataFrame, batch: DataFrame, updated_at, keys: list[str] | None = None) -> DataFrame:
    """U1 as a pure DataFrame transform: returns the new state with an
    ``_action`` column (insert/update/noop) for commit-log emission (U3).

    ``state`` must carry ``version`` and ``updatedAt``; ``batch`` must carry
    the same value columns as state minus those two.
    """
    keys = keys or MERGE_KEYS
    value_cols = [c for c in batch.columns if c not in keys]
    s = state.select(*keys, F.struct(*[c for c in state.columns if c not in keys]).alias("_s"))
    b = batch.select(*keys, F.struct(*value_cols).alias("_b"))
    j = s.join(b, keys, "full_outer")

    s_ = lambda c: F.col(f"_s.{c}")  # noqa: E731
    b_ = lambda c: F.col(f"_b.{c}")  # noqa: E731
    has_s = F.col("_s").isNotNull()
    has_b = F.col("_b").isNotNull()
    # the reference's ConditionExpression (handler.ts:53)
    effective_write = has_b & (~has_s | (s_("idempotencyKey") != b_("idempotencyKey")))

    out_cols = [F.col(k) for k in keys]
    for c in value_cols:
        out_cols.append(F.when(effective_write, b_(c)).otherwise(s_(c)).alias(c))
    out_cols.append(
        F.when(~has_s, F.lit(1))
        .when(effective_write, s_("version") + F.lit(1))
        .otherwise(s_("version"))
        .cast("long")
        .alias("version")
    )
    out_cols.append(F.when(effective_write, F.lit(updated_at)).otherwise(s_("updatedAt")).alias("updatedAt"))
    out_cols.append(
        F.when(~has_s, F.lit("insert"))
        .when(effective_write, F.lit("update"))
        .otherwise(F.lit("noop"))
        .alias(ACTION_COL)
    )
    return j.select(*out_cols)


class ParquetStateStore:
    """The serving-store on parquet, partitioned by tenantId.

    GSI2's (patient, time) timeline becomes an in-file sort
    (``sortWithinPartitions``) so parquet min/max stats give data skipping on
    patient/time predicates — the Spark analog of the reference's timeline
    index (SURVEY §4).
    """

    def __init__(self, spark, path: str, keys: list[str] | None = None):
        self.spark = spark
        self.path = path
        self.keys = keys or MERGE_KEYS

    def exists(self) -> bool:
        """True iff an initialized store exists at ``path``.

        Only genuine absence maps to False: PATH_NOT_FOUND (never written) or
        UNABLE_TO_INFER_SCHEMA (an empty directory).  Anything else — corrupt
        footers, permission or transport failures — RAISES: treating a
        damaged store as "absent" would make the next merge silently
        re-initialize (and so destroy) it."""
        from pyspark.errors import AnalysisException

        try:
            self.spark.read.parquet(self.path).limit(0).collect()
            return True
        except AnalysisException as e:
            cond = e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
            if cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                return False
            raise

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def merge(self, batch: DataFrame, updated_at, order_col: str = "effectiveDateTime") -> DataFrame:
        """U1+U2+U3: dedup the batch, merge into the store rewriting only the
        tenant partitions present in the batch; returns the commit log
        (etl.persisted.v1 analog: key cols + version + action)."""
        batch = dedup_batch(batch, order_col=order_col, keys=self.keys)
        if not self.exists():
            new_state = merge_frames(
                self.spark.createDataFrame([], batch.schema)
                .withColumn("version", F.lit(1).cast("long"))
                .withColumn("updatedAt", F.lit(updated_at).cast("timestamp")),
                batch,
                updated_at,
                keys=self.keys,
            )
            (
                new_state.drop(ACTION_COL)
                .repartition("tenantId")
                .sortWithinPartitions("patientId", "effectiveDateTime")
                .write.mode("overwrite")
                .partitionBy("tenantId")
                .parquet(self.path)
            )
            return new_state.select(*self.keys, "version", F.col(ACTION_COL).alias("action"))

        # prune the state scan to the batch's tenants via a BROADCAST SEMI-JOIN
        # on the partition column — dynamic partition pruning reuses the
        # broadcast to skip non-batch tenant directories at the scan, with no
        # driver-side collect: a million-partition batch would have made the
        # old collect+isin build a giant literal list on the driver, while a
        # semi-join prune is shape-identical at any tenant cardinality
        tenant_ids = F.broadcast(batch.select("tenantId").distinct())
        state = self.read().join(tenant_ids, "tenantId", "left_semi")
        # localCheckpoint (eager) BEFORE the overwrite: the merged plan reads
        # the same path it is about to rewrite — without cutting lineage here,
        # any later evaluation (the commit log) would silently re-read the
        # NEW state and report wrong actions
        merged = merge_frames(state, batch, updated_at, keys=self.keys).transform(cut_lineage)
        (
            merged.drop(ACTION_COL)
            .repartition("tenantId")
            .sortWithinPartitions("patientId", "effectiveDateTime")
            .write.mode("overwrite")
            # per-write, NOT session-conf-dependent: under the default static
            # mode this same overwrite would silently delete every non-batch
            # tenant partition of the store
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("tenantId")
            .parquet(self.path)
        )
        return merged.select(*self.keys, "version", F.col(ACTION_COL).alias("action"))

    def delete_subjects(self, subjects: DataFrame) -> DataFrame:
        """Targeted right-to-be-forgotten delete: remove every row whose
        (tenantId, patientId) appears in ``subjects``, rewriting ONLY the
        tenant partitions the delete set touches — the same dynamic-
        partition-overwrite discipline as merge(), so a delete for one
        tenant never rewrites (or even reads) the others at any store size.

        The anti-join is the Delta/Iceberg `DELETE WHERE` shape expressed
        natively: broadcast the (small) subject set, keep non-matching rows,
        overwrite matched partitions.  Returns the tombstone ledger
        (tenantId, patientId, n_deleted) — the auditable record a GDPR
        pipeline must emit; a subject with no rows reports n_deleted = 0
        (proof of absence, not silence)."""
        subj = F.broadcast(subjects.select("tenantId", "patientId").distinct())
        tenants = F.broadcast(subj.select("tenantId").distinct())
        state = self.read().join(tenants, "tenantId", "left_semi")
        # ledger BEFORE the rewrite; checkpoint so it cannot re-read the
        # post-delete files (same lineage hazard as merge())
        ledger = (
            subj.join(
                state.groupBy("tenantId", "patientId").agg(F.count(F.lit(1)).alias("n_deleted")),
                ["tenantId", "patientId"],
                "left",
            )
            .select("tenantId", "patientId", F.coalesce("n_deleted", F.lit(0)).alias("n_deleted"))
            .transform(cut_lineage)
        )
        survivors = state.join(subj, ["tenantId", "patientId"], "left_anti").transform(cut_lineage)
        (
            survivors.repartition("tenantId")
            .sortWithinPartitions("patientId", "effectiveDateTime")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("tenantId")
            .parquet(self.path)
        )
        # dynamic overwrite only replaces partitions PRESENT in the written
        # data: a tenant whose every row was deleted writes nothing and its
        # stale files would survive — the classic leak.  Those directories
        # are removed explicitly (the set is O(|subject tenants|), already
        # driver-small; Delta/Iceberg's DELETE subsumes this transactionally).
        import shutil

        emptied = (
            tenants.join(survivors.select("tenantId").distinct(), "tenantId", "left_anti")
            .collect()
        )
        for r in emptied:
            shutil.rmtree(f"{self.path}/tenantId={r['tenantId']}", ignore_errors=True)
        return ledger


def compact_small_files(
    spark,
    path: str,
    target_rows_per_file: int,
    partition_col: str | None = None,
    sort_cols: list[str] | None = None,
) -> dict:
    """Lake maintenance: rewrite a parquet dataset into ~target-sized files.

    Small-files buildup is the classic failure mode of micro-batch sinks
    (every trigger appends a file per partition; a year of 5-second triggers
    is millions of tiny files whose open/footer cost dominates scans).
    Compaction = one read, one repartition to ceil(rows/target) even chunks
    (hash on a synthetic uniform key — never a key column, which would skew
    chunk sizes), optional in-file sort to restore min/max-stat data
    skipping, one atomic-ish overwrite.  Returns {files_before, files_after,
    rows} so callers can log the effect; at 100 TB this runs per partition
    (pass partition_col) so each rewrite touches one partition's files.
    """
    import math

    df = spark.read.parquet(path)
    rows = df.count()
    files_before = len(df.inputFiles())
    n_files = max(1, math.ceil(rows / max(1, target_rows_per_file)))
    out = df.repartition(n_files, F.sha2(F.concat_ws("\x00", *[F.col(c).cast("string") for c in df.columns]), 256))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    # write-then-swap: parquet cannot atomically overwrite the directory it
    # is being read from, so the rewrite lands beside it and replaces it only
    # after fully committing — a crash mid-compaction leaves the original
    writer.parquet(path + ".compact_tmp")
    import shutil

    shutil.rmtree(path)
    shutil.move(path + ".compact_tmp", path)
    files_after = len(spark.read.parquet(path).inputFiles())
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


class SnapshotStateStore(ParquetStateStore):
    """ParquetStateStore with ATOMIC commits and time travel — the native
    stand-in for a Delta/Iceberg table when neither is on the cluster.

    Layout::

        <path>/v00000001/...parquet     immutable snapshot directories
        <path>/v00000002/...parquet
        <path>/_current                 tiny pointer file naming the live one

    A merge writes the ENTIRE next snapshot beside the live one, then
    replaces the pointer via write-temp + os.replace (atomic on POSIX).
    Readers resolve the pointer once per read, so they always see a complete
    snapshot: a crash mid-write leaves a dangling (unreferenced) directory,
    never a half-visible table — the parquet dynamic-overwrite path cannot
    make that guarantee.  Old snapshots stay readable (``read(version=n)``)
    until ``vacuum(keep_last=...)`` drops them.

    Trade-off vs the partition-overwrite store: commits are whole-table
    copies, so this fits dimension/state tables (the reference's serving
    store) rather than append-heavy facts; at fact scale the same pointer
    discipline is applied per partition (or by a real Delta/Iceberg commit
    log, whose MERGE INTO this merge() maps onto 1:1).
    """

    POINTER = "_current"

    def _pointer_path(self) -> str:
        import os

        return os.path.join(self.path, self.POINTER)

    def current_version(self) -> int:
        """0 = uninitialized; pointer file holds the live snapshot number."""
        import os

        try:
            with open(self._pointer_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0
        except ValueError as e:
            raise RuntimeError(f"corrupt snapshot pointer at {self._pointer_path()}") from e

    def _snap_dir(self, version: int) -> str:
        import os

        return os.path.join(self.path, f"v{version:08d}")

    def exists(self) -> bool:
        return self.current_version() > 0

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v <= 0:
            raise ValueError(f"no snapshot at {self.path}")
        return self.spark.read.parquet(self._snap_dir(v))

    def versions(self) -> list[int]:
        import os
        import re as _re

        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(m.group(1))
            for d in os.listdir(self.path)
            if (m := _re.fullmatch(r"v(\d{8})", d))
        )

    def merge(self, batch: DataFrame, updated_at, order_col: str = "effectiveDateTime") -> DataFrame:
        """U1+U2+U3 with snapshot isolation: same merge semantics as the
        parent, but committed as next-snapshot-then-pointer-flip."""
        import os
        import tempfile

        batch = dedup_batch(batch, order_col=order_col, keys=self.keys)
        v = self.current_version()
        if v == 0:
            state = (
                self.spark.createDataFrame([], batch.schema)
                .withColumn("version", F.lit(1).cast("long"))
                .withColumn("updatedAt", F.lit(updated_at).cast("timestamp"))
            )
        else:
            state = self.read()
        merged = merge_frames(state, batch, updated_at, keys=self.keys).transform(cut_lineage)
        (
            merged.drop(ACTION_COL)
            .repartition("tenantId")
            .sortWithinPartitions("patientId", "effectiveDateTime")
            .write.mode("overwrite")
            .parquet(self._snap_dir(v + 1))
        )
        # atomic pointer flip: readers see v fully, then v+1 fully — never a mix
        os.makedirs(self.path, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="._current.")
        with os.fdopen(fd, "w") as f:
            f.write(str(v + 1))
        os.replace(tmp, self._pointer_path())
        return merged.select(*self.keys, "version", F.col(ACTION_COL).alias("action"))

    def diff(self, v_old: int, v_new: int) -> DataFrame:
        """Snapshot DIFF — what changed between two committed versions, as
        a key-grained change set: action in {added, deleted, changed,
        version_bumped}.  The lakehouse table_changes()/CDF read expressed
        natively: one full-outer join of the two immutable snapshots on the
        merge keys (both sides partitioned identically on tenantId, so at
        scale the join co-partitions), comparing the row version.

        Immutability is what makes this exact: snapshots never mutate, so
        the diff is reproducible forever — the audit answer to "what did
        batch N actually do", computable long after the fact without a
        commit log."""
        old, new = self.read(v_old), self.read(v_new)
        o = old.select(*self.keys, F.col("version").alias("__vo"))
        n = new.select(*self.keys, F.col("version").alias("__vn"))
        j = o.join(n, self.keys, "full_outer")
        action = (
            F.when(F.col("__vo").isNull(), F.lit("added"))
            .when(F.col("__vn").isNull(), F.lit("deleted"))
            .when(F.col("__vn") != F.col("__vo"), F.lit("version_bumped"))
            .otherwise(F.lit("unchanged"))
        )
        return (
            j.select(*self.keys, F.col("__vo").alias("version_old"),
                     F.col("__vn").alias("version_new"), action.alias("action"))
            .where(F.col("action") != "unchanged")
        )

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop snapshots older than the newest ``keep_last``; never the live
        one.  Returns the dropped version numbers."""
        import shutil

        live = self.current_version()
        vs = self.versions()
        drop = [x for x in vs[:-keep_last] if x != live] if keep_last > 0 else []
        for x in drop:
            shutil.rmtree(self._snap_dir(x), ignore_errors=True)
        return drop


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Apply a CDC change stream (I/U/D ops with sequence numbers) to a base
    snapshot — the lakehouse ``MERGE ... WHEN MATCHED DELETE/UPDATE WHEN NOT
    MATCHED INSERT`` semantic, as pure DataFrame ops.

    Latest-op-per-key is the two-phase hash argmax on ``seq_col``
    (operators/argmax.py) — the previous MAX over (seq, op, payload...)
    structs had a non-UnsafeRow-mutable buffer and silently planned
    SORTAGGREGATE over the change stream (the SCALE.md §48 super-linear
    class).  ``seq_col`` must TOTALLY order each key's changes — the
    standard CDC LSN/commit-sequence contract; a duplicated (key, seq)
    pair is upstream log corruption and surfaces as a duplicated output
    key rather than an arbitrary pick.  NULL handling (the argmax NULL
    contract, operators/argmax.py): a NULL ``seq_col`` loses to any
    non-NULL sequence (treated as oldest); a key whose changes are ALL
    NULL-sequenced keeps its change rows (surfacing as duplicates if >1,
    like corrupt duplicated sequences); a NULL change key forms its own
    key group rather than being silently dropped.  The apply is ONE key-grained
    full-outer join, hinted shuffle-hash so neither the snapshot nor the
    resolved batch is sorted.  Keys without changes pass through; 'D' keys
    drop; 'I'/'U' keys take the latest payload.  At 100 TB the base side
    stays partition-pruned exactly like ParquetStateStore.merge (only
    touched partitions rewrite); this function is the resolution kernel of
    that write path.
    """
    from .argmax import argmax_rows

    latest = argmax_rows(
        changes.select(key, seq_col, op_col, *payload_cols), [key], [seq_col]
    ).select(
        F.col(key).alias("__k"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__ch_{c}") for c in payload_cols],
    )
    j = base.join(
        latest.hint("shuffle_hash"), F.col(key) == F.col("__k"), "full_outer"
    )
    no_change = F.col("__k").isNull()
    out_cols = [
        F.when(no_change, F.col(c)).otherwise(F.col(f"__ch_{c}")).alias(c)
        for c in payload_cols
    ]
    return (
        j.where(no_change | (F.col("__op") != F.lit("D")))
        .select(F.coalesce(F.col(key), F.col("__k")).alias(key), *out_cols)
    )
