"""Round-4 classifier-evaluation batch: bucketed ROC curve with exact
trapezoid AUC, a threshold sweep of confusion-matrix metrics (precision /
recall / F1), a reliability-diagram calibration report (ECE), and Gini
information-gain feature ranking.

The reference ships model scores around as opaque payload fields
(services/normalize/handler.ts routes them; it never evaluates them) — at
training-pipeline scale the engine itself must answer "is this classifier
any good / calibrated / which feature carries signal" without collecting
scores to the driver.  Every metric here is an exact integer rational
(cross-multiplied counts, ppm fixed-point — no float ECDFs or log-loss), so
both engines agree to the last bit, and every query is ONE partial-
aggregable scan whose post-aggregate arithmetic touches O(buckets) rows.

The evaluated scorer is synthetic-but-calibrated: p_ppm is a multiplicative
hash of the order key onto [0, 1e6] and the label fires with exactly that
probability via an independent hash — so the calibration report's observed
rates genuinely track the predictions and the ROC/AUC land near the
theoretical 0.75 of a perfectly calibrated uniform scorer.  Feature ranking
uses a real data-derived target (high-value order) instead.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import _t, register

PPM = 1_000_000

# calibrated synthetic scorer: p_ppm uniform on [0, 1e6] (multiplier coprime
# to the modulus, so the map is a bijection on residues), label ~ Bernoulli
# (p_ppm) via an independent integer hash — pure int64 arithmetic in both
# engines, no rand().
_SCORED_SQL = """SELECT (o_orderkey * 7919) % 1000001 AS p_ppm,
           CASE WHEN (o_orderkey * 104729 + 12345) % 1000000
                     < (o_orderkey * 7919) % 1000001
                THEN 1 ELSE 0 END AS label
      FROM orders"""


def _scored(spark, sf_dir):
    p = (F.col("o_orderkey") * 7919) % 1000001
    lab = ((F.col("o_orderkey") * 104729 + 12345) % 1000000 < p).cast("long")
    return _t(spark, sf_dir, "orders").select(p.alias("p_ppm"), lab.alias("label"))


# ---------------------------------------------------------------------------
# bucketed ROC curve + exact trapezoid AUC contributions
# ---------------------------------------------------------------------------

_ROC_W = 50_000  # bucket width in ppm -> 21 curve points


@register(
    "eval_roc_curve",
    sql=f"""
    WITH b AS (
      SELECT p_ppm // {_ROC_W} AS bucket, label
      FROM ({_SCORED_SQL})
    ),
    g AS (
      SELECT bucket, count(*) AS n, sum(label) AS np
      FROM b GROUP BY 1
    ),
    c AS (
      SELECT bucket, n, np,
             sum(np) OVER (ORDER BY bucket DESC) AS tp,
             sum(n - np) OVER (ORDER BY bucket DESC) AS fp,
             sum(np) OVER () AS pos, sum(n - np) OVER () AS neg
      FROM g
    ),
    d AS (
      SELECT bucket, n, tp, fp, pos, neg,
             lag(tp, 1, 0) OVER (ORDER BY bucket DESC) AS tp0,
             lag(fp, 1, 0) OVER (ORDER BY bucket DESC) AS fp0
      FROM c
    )
    SELECT CAST(bucket * {_ROC_W} AS BIGINT) AS thresh_ppm,
           CAST(n AS BIGINT) AS n_bucket,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
           CAST(tp * 1000000 // pos AS BIGINT) AS tpr_ppm,
           CAST(fp * 1000000 // neg AS BIGINT) AS fpr_ppm,
           CAST((fp - fp0) * (tp + tp0) AS BIGINT) AS auc2_num
    FROM d
    """,
    doc="Bucketed ROC CURVE of the calibrated synthetic scorer: one "
    "partial-aggregable 21-bucket scan, then descending-threshold "
    "cumulative TP/FP, TPR/FPR in exact ppm, and each point's DOUBLED "
    "trapezoid area term (fp-fp0)*(tp+tp0) as an exact integer — "
    "sum(auc2_num) = 2*P*N*AUC, so the consumer reads AUC without any "
    "float having crossed an engine boundary (lands near the calibrated-"
    "uniform theoretical 0.75).  All windows run on the 21-row AGGREGATED "
    "frame (the §16 histogram rule), never on raw rows; stat_mann_whitney "
    "is the rank-exact cousin, this is the curve the eval dashboard plots.",
)
def eval_roc_curve(spark, sf_dir):
    s = _scored(spark, sf_dir)
    g = (
        s.select(F.expr(f"p_ppm div {_ROC_W}").alias("bucket"), "label")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("label").alias("np"))
    )
    wd = W.partitionBy(F.lit(0)).orderBy(F.col("bucket").desc())
    wall = W.partitionBy(F.lit(0))
    c = g.select(
        "bucket",
        "n",
        F.sum("np").over(wd).alias("tp"),
        F.sum(F.col("n") - F.col("np")).over(wd).alias("fp"),
        F.sum("np").over(wall).alias("pos"),
        F.sum(F.col("n") - F.col("np")).over(wall).alias("neg"),
    )
    d = c.select(
        "bucket",
        "n",
        "tp",
        "fp",
        "pos",
        "neg",
        F.lag("tp", 1, 0).over(wd).alias("tp0"),
        F.lag("fp", 1, 0).over(wd).alias("fp0"),
    )
    return d.select(
        (F.col("bucket") * _ROC_W).alias("thresh_ppm"),
        F.col("n").alias("n_bucket"),
        "tp",
        "fp",
        F.col("pos").alias("n_pos"),
        F.col("neg").alias("n_neg"),
        F.expr("tp * 1000000 div pos").alias("tpr_ppm"),
        F.expr("fp * 1000000 div neg").alias("fpr_ppm"),
        ((F.col("fp") - F.col("fp0")) * (F.col("tp") + F.col("tp0"))).alias("auc2_num"),
    )


# ---------------------------------------------------------------------------
# threshold sweep: confusion matrix + precision / recall / F1
# ---------------------------------------------------------------------------

_THRESHOLDS = [100_000, 300_000, 500_000, 700_000, 900_000]


def _f1_oracle() -> str:
    cols = ", ".join(
        f"sum(CASE WHEN p_ppm >= {t} THEN 1 ELSE 0 END) AS pp{i}, "
        f"sum(CASE WHEN p_ppm >= {t} THEN label ELSE 0 END) AS tp{i}"
        for i, t in enumerate(_THRESHOLDS)
    )
    reps = "\n      UNION ALL\n      ".join(
        f"SELECT {t} AS thresh_ppm, n, pos, pp{i} AS pp, tp{i} AS tp FROM s"
        for i, t in enumerate(_THRESHOLDS)
    )
    return f"""
    WITH s AS (
      SELECT count(*) AS n, sum(label) AS pos, {cols}
      FROM ({_SCORED_SQL})
    ),
    r AS (
      {reps}
    )
    SELECT CAST(thresh_ppm AS BIGINT) AS thresh_ppm,
           CAST(tp AS BIGINT) AS tp,
           CAST(pp - tp AS BIGINT) AS fp,
           CAST(pos - tp AS BIGINT) AS fn,
           CAST(n - pos - pp + tp AS BIGINT) AS tn,
           CAST(tp * 1000000 // nullif(pp, 0) AS BIGINT) AS precision_ppm,
           CAST(tp * 1000000 // pos AS BIGINT) AS recall_ppm,
           CAST(2 * tp * 1000000 // (pp + pos) AS BIGINT) AS f1_ppm
    FROM r
    """


@register(
    "eval_threshold_f1",
    sql=_f1_oracle(),
    doc="CONFUSION-MATRIX THRESHOLD SWEEP: one scan accumulates predicted-"
    "positive and true-positive counts for all 5 operating points as extra "
    "sum slots in a single partial aggregate (the stat_bootstrap_ci trick "
    "— never 5 scans or a threshold x row expansion), then a 5-row stack "
    "derives TP/FP/FN/TN and exact-ppm precision, recall, and F1 = "
    "2TP/(2TP+FP+FN) per threshold.  The operating-point picker that sits "
    "next to eval_roc_curve's full curve.",
)
def eval_threshold_f1(spark, sf_dir):
    s = _scored(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos")]
    for i, t in enumerate(_THRESHOLDS):
        hit = (F.col("p_ppm") >= t).cast("long")
        aggs.append(F.sum(hit).alias(f"pp{i}"))
        aggs.append(F.sum(hit * F.col("label")).alias(f"tp{i}"))
    one = s.agg(*aggs)
    stack = ", ".join(f"{t}L, pp{i}, tp{i}" for i, t in enumerate(_THRESHOLDS))
    r = one.select(
        "n", "pos", F.expr(f"stack({len(_THRESHOLDS)}, {stack}) AS (thresh_ppm, pp, tp)")
    )
    return r.select(
        "thresh_ppm",
        "tp",
        (F.col("pp") - F.col("tp")).alias("fp"),
        (F.col("pos") - F.col("tp")).alias("fn"),
        (F.col("n") - F.col("pos") - F.col("pp") + F.col("tp")).alias("tn"),
        F.expr("tp * 1000000 div nullif(pp, 0)").alias("precision_ppm"),
        F.expr("tp * 1000000 div pos").alias("recall_ppm"),
        F.expr("2 * tp * 1000000 div (pp + pos)").alias("f1_ppm"),
    )


# ---------------------------------------------------------------------------
# reliability diagram / expected calibration error
# ---------------------------------------------------------------------------


@register(
    "eval_calibration_ece",
    sql=f"""
    WITH b AS (
      SELECT least(p_ppm // 100000, 9) AS bin, p_ppm, label
      FROM ({_SCORED_SQL})
    ),
    g AS (
      SELECT bin, count(*) AS n, sum(label) AS np, sum(p_ppm) AS sp
      FROM b GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n AS BIGINT) AS n,
           CAST(np AS BIGINT) AS n_pos,
           CAST(sp // n AS BIGINT) AS avg_pred_ppm,
           CAST(np * 1000000 // n AS BIGINT) AS obs_ppm,
           CAST(abs(np * 1000000 - sp) AS BIGINT) AS ece_num,
           CAST(sum(n) OVER () AS BIGINT) AS n_total
    FROM g
    """,
    doc="RELIABILITY DIAGRAM + ECE of the calibrated scorer: 10 prediction "
    "deciles, each with exact mean-prediction and observed-positive-rate "
    "ppm, and the bin's ECE numerator |n_pos*1e6 - sum_pred| held as an "
    "exact integer (ECE_ppm = sum(ece_num) / n_total — the |obs-pred| gap "
    "weighted by bin mass, no float division inside the engines).  Because "
    "the scorer IS calibrated, obs_ppm tracks avg_pred_ppm bin by bin — "
    "the report demonstrates its own correctness.  ONE 10-group partial-"
    "aggregable scan; the total rides a constant-key window over the "
    "aggregated frame.  Complements sample_score_calibration (percent-rank "
    "remap) with the metric that says whether remapping is even needed.",
)
def eval_calibration_ece(spark, sf_dir):
    s = _scored(spark, sf_dir)
    g = (
        s.select(F.least(F.expr("p_ppm div 100000"), F.lit(9)).alias("bin"), "p_ppm", "label")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("np"),
            F.sum("p_ppm").alias("sp"),
        )
    )
    return g.select(
        "bin",
        "n",
        F.col("np").alias("n_pos"),
        F.expr("sp div n").alias("avg_pred_ppm"),
        F.expr("np * 1000000 div n").alias("obs_ppm"),
        F.abs(F.col("np") * 1000000 - F.col("sp")).alias("ece_num"),
        F.sum("n").over(W.partitionBy(F.lit(0))).alias("n_total"),
    )


# ---------------------------------------------------------------------------
# Gini information-gain feature ranking (exact rationals, no float log)
# ---------------------------------------------------------------------------

_GINI_LABEL_SQL = (
    "CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 15000000 "
    "THEN 1 ELSE 0 END"
)


def _gini_oracle() -> str:
    base = f"""SELECT o_orderpriority AS priority, o_orderstatus AS status,
             CAST(month(o_orderdate) AS VARCHAR) AS mon,
             {_GINI_LABEL_SQL} AS label
      FROM orders"""
    return f"""
    WITH base AS ({base}),
    stacked AS (
      SELECT 'priority' AS feature, priority AS value, label FROM base
      UNION ALL
      SELECT 'status' AS feature, status AS value, label FROM base
      UNION ALL
      SELECT 'month' AS feature, mon AS value, label FROM base
    ),
    cnt AS (
      SELECT feature, value, label, CAST(count(*) AS HUGEINT) AS c
      FROM stacked GROUP BY 1, 2, 3
    ),
    pv AS (
      SELECT feature, value, sum(c) AS n_v, sum(c * c) AS s2
      FROM cnt GROUP BY 1, 2
    ),
    child AS (
      SELECT feature, count(*) AS n_values, sum(n_v) AS n,
             sum((n_v * n_v - s2) * 1000000 // n_v) AS child_num
      FROM pv GROUP BY 1
    ),
    pc AS (
      SELECT feature, label, sum(c) AS ct
      FROM cnt GROUP BY 1, 2
    ),
    parent AS (
      SELECT feature,
             (sum(ct) * sum(ct) - sum(ct * ct)) * 1000000 // (sum(ct) * sum(ct))
               AS parent_gini_ppm
      FROM pc GROUP BY 1
    )
    SELECT child.feature AS feature,
           CAST(n AS BIGINT) AS n,
           CAST(n_values AS BIGINT) AS n_values,
           CAST(parent_gini_ppm AS BIGINT) AS parent_gini_ppm,
           CAST(child_num // n AS BIGINT) AS child_gini_ppm,
           CAST(parent_gini_ppm - child_num // n AS BIGINT) AS gain_ppm
    FROM child JOIN parent ON child.feature = parent.feature
    """


@register(
    "ml_gini_feature_rank",
    sql=_gini_oracle(),
    doc="GINI INFORMATION-GAIN FEATURE RANKING of three categorical order "
    "features against the high-value-order target, EXACT: Gini impurity is "
    "rational — 1 - sum(p_c^2) = (n^2 - sum(c^2))/n^2 — so parent "
    "impurity, per-value child impurity, and the split gain all come out "
    "as pinned integer-ppm arithmetic with no cross-engine float log "
    "(entropy's ln is why suites usually give up bit-reproducibility).  "
    "Shape: stack() triples the scan rows in-task (ONE scan, no union "
    "re-reads — plan-tested), and because the label is binary the per-"
    "value class-count square sum is np^2 + (n_v-np)^2, so the whole "
    "ranking is a single linear aggregation chain groupBy(feature,value) "
    "-> groupBy(feature) with the parent impurity derived from the same "
    "(n, pos) totals — no second branch over the scan and no join.  The "
    "feature-signal screen that runs before ml_target_encoding spends "
    "effort encoding a dead feature.",
)
def ml_gini_feature_rank(spark, sf_dir):
    lab = F.expr(_GINI_LABEL_SQL).alias("label")
    base = _t(spark, sf_dir, "orders").select(
        F.expr(
            "stack(3, 'priority', o_orderpriority, 'status', o_orderstatus, "
            "'month', CAST(month(o_orderdate) AS STRING)) AS (feature, value)"
        ),
        lab,
    )
    pv = base.groupBy("feature", "value").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_v"),
        F.sum("label").cast("decimal(38,0)").alias("np"),
    )
    child = pv.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum("n_v").alias("n"),
        F.sum("np").alias("pos"),
        F.sum(
            F.expr("(n_v * n_v - np * np - (n_v - np) * (n_v - np)) * 1000000 div n_v")
        ).alias("child_num"),
    )
    parent = F.expr("(n * n - pos * pos - (n - pos) * (n - pos)) * 1000000 div (n * n)")
    return child.select(
        "feature",
        F.col("n").cast("long").alias("n"),
        F.col("n_values").cast("long").alias("n_values"),
        parent.cast("long").alias("parent_gini_ppm"),
        F.expr("CAST(child_num div n AS BIGINT)").alias("child_gini_ppm"),
        (parent - F.expr("child_num div n")).cast("long").alias("gain_ppm"),
    )


# ---------------------------------------------------------------------------
# pinball (quantile) loss evaluation of a quantile forecaster
# ---------------------------------------------------------------------------

_QUANTILES_PPM = [100_000, 500_000, 900_000]
# synthetic-but-deterministic quantile forecaster of the order total
_YHAT_SQL = "140000 + (o_orderkey * 13) % 50000"
_Y_SQL = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _pinball_oracle() -> str:
    slots = ", ".join(
        f"sum(CASE WHEN y >= yhat THEN CAST({q} AS HUGEINT) * (y - yhat)"
        f" ELSE CAST({1_000_000 - q} AS HUGEINT) * (yhat - y) END) AS loss{i}"
        for i, q in enumerate(_QUANTILES_PPM)
    )
    reps = "\n      UNION ALL\n      ".join(
        f"SELECT {q} AS q_ppm, n, loss{i} AS loss FROM s"
        for i, q in enumerate(_QUANTILES_PPM)
    )
    return f"""
    WITH base AS (
      SELECT {_Y_SQL} AS y, {_YHAT_SQL} AS yhat FROM orders
    ),
    s AS (SELECT count(*) AS n, {slots} FROM base),
    r AS ({reps})
    SELECT CAST(q_ppm AS BIGINT) AS q_ppm,
           CAST(n AS BIGINT) AS n,
           CAST(loss // 1000000 AS BIGINT) AS sum_loss_cents,
           CAST(loss // n AS BIGINT) AS mean_loss_ppm_cents
    FROM r
    """


@register(
    "eval_pinball_loss",
    sql=_pinball_oracle(),
    doc="PINBALL (QUANTILE) LOSS of a deterministic quantile forecaster at "
    "the 10/50/90 operating points, EXACT: loss_q(y, yhat) = q*(y-yhat) "
    "for under-prediction else (1-q)*(yhat-y), held in ppm-cents HUGEINT "
    "so the asymmetric penalty never floats — the regression-side "
    "counterpart of eval_threshold_f1's classification sweep (a quantile "
    "forecaster is graded by pinball exactly as a classifier is by F1).  "
    "Shape: the eval_threshold_f1 trick again — ONE scan accumulates all "
    "three quantile losses as conditional-sum slots in a single partial "
    "aggregate, then a 3-row stack unpivots; a single row crosses the "
    "shuffle.",
)
def eval_pinball_loss(spark, sf_dir):
    base = _t(spark, sf_dir, "orders").select(
        F.expr(_Y_SQL).alias("y"), F.expr(_YHAT_SQL).alias("yhat")
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, q in enumerate(_QUANTILES_PPM):
        loss = F.when(
            F.col("y") >= F.col("yhat"),
            F.lit(q).cast(dec) * (F.col("y") - F.col("yhat")),
        ).otherwise(F.lit(1_000_000 - q).cast(dec) * (F.col("yhat") - F.col("y")))
        aggs.append(F.sum(loss).alias(f"loss{i}"))
    s = base.agg(*aggs)
    stack = ", ".join(f"{q}L, loss{i}" for i, q in enumerate(_QUANTILES_PPM))
    r = s.select("n", F.expr(f"stack({len(_QUANTILES_PPM)}, {stack}) AS (q_ppm, loss)"))
    return r.select(
        "q_ppm",
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(loss div 1000000 AS BIGINT)").alias("sum_loss_cents"),
        F.expr("CAST(loss div n AS BIGINT)").alias("mean_loss_ppm_cents"),
    )
