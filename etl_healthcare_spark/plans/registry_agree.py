"""Round-4 labeling-agreement & collocation batch: Cohen's kappa for
inter-annotator agreement, a full multiclass confusion matrix with per-class
precision/recall, cumulative-gain / lift deciles for a ranking scorer, and
PMI-ratio bigram collocations over the document corpus.

A training-data pipeline labels at scale — LLM judges vs. human raters,
weak-supervision votes, ranking scorers that pick what to annotate next —
and the reference ships those labels as opaque payload fields
(services/normalize/handler.ts routes them; nothing measures agreement).
These are the four reports a labeling operation reads daily, each computed
distributed and EXACT: kappa is a ratio of integer count products (no
float probabilities), confusion metrics are cross-multiplied ppm, lift is
cumulative counts over a 10-row frame, and PMI is kept as the exact
rational p(xy)/(p(x)p(y)) in ppm (the log is monotone — ranking by the
ratio IS ranking by PMI, without the cross-engine float log).

Raters/scorers are synthetic-but-correlated integer hashes (same discipline
as registry_evalml's calibrated scorer): two raters share a signal term and
carry independent noise, so agreement genuinely exceeds chance and kappa
lands positive; the multiclass judge corrupts the data-derived gold class
with a 20% hash flip, so the confusion matrix is diagonal-dominant with
realistic off-diagonal mass.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import _t, register
from .registry_evalml import _SCORED_SQL, _scored
from ..functions.materialize import materialize

PPM = 1_000_000

# two correlated 3-class raters: shared signal s, independent noise; class
# boundaries at 430 so the (s+noise) range 0..1298 covers all three classes
_R1_SQL = "least((((o_orderkey * 7919) % 1000) + (o_orderkey * 104729) % 300) // 430, 2)"
_R2_SQL = "least((((o_orderkey * 7919) % 1000) + (o_orderkey * 15485863) % 300) // 430, 2)"


@register(
    "eval_cohens_kappa",
    sql=f"""
    WITH r AS (
      SELECT {_R1_SQL} AS r1, {_R2_SQL} AS r2 FROM orders
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS HUGEINT) AS agree,
             CAST(sum(CASE WHEN r1 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS a0,
             CAST(sum(CASE WHEN r1 = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS a1,
             CAST(sum(CASE WHEN r1 = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS a2,
             CAST(sum(CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS b0,
             CAST(sum(CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS b1,
             CAST(sum(CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS b2
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS n_agree,
           CAST(agree * {PPM} // n AS BIGINT) AS po_ppm,
           CAST((a0*b0 + a1*b1 + a2*b2) * {PPM} // (n*n) AS BIGINT) AS pe_ppm,
           CAST((agree * n - (a0*b0 + a1*b1 + a2*b2)) * {PPM}
                // (n * n - (a0*b0 + a1*b1 + a2*b2)) AS BIGINT) AS kappa_ppm
    FROM m
    """,
    doc="COHEN'S KAPPA between two correlated synthetic 3-class raters, "
    "EXACT: kappa = (po-pe)/(1-pe) clears to the integer identity "
    "(agree*n - SUM_c a_c*b_c) / (n^2 - SUM_c a_c*b_c), so the chance-"
    "corrected agreement ships as exact ppm with no float probability "
    "ever materializing.  Shape: ONE partial-aggregable scan whose "
    "aggregate carries the agreement count plus all six per-class "
    "marginals as conditional-sum slots (the eval_threshold_f1 trick) — "
    "a single row crosses the shuffle; the raters share a signal term so "
    "kappa genuinely exceeds zero.  The inter-annotator gate a labeling "
    "pipeline runs before trusting a batch of LLM-judge labels.",
)
def eval_cohens_kappa(spark, sf_dir):
    d = F.col
    r = _t(spark, sf_dir, "orders").select(
        F.expr(_R1_SQL.replace("//", "div")).alias("r1"),
        F.expr(_R2_SQL.replace("//", "div")).alias("r2"),
    )
    dec = "decimal(38,0)"
    aggs = [
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum((d("r1") == d("r2")).cast("long")).cast(dec).alias("agree"),
    ]
    for c in range(3):
        aggs.append(F.sum((d("r1") == c).cast("long")).cast(dec).alias(f"a{c}"))
        aggs.append(F.sum((d("r2") == c).cast("long")).cast(dec).alias(f"b{c}"))
    m = r.agg(*aggs)
    pe_num = "(a0*b0 + a1*b1 + a2*b2)"
    return m.select(
        d("n").cast("long").alias("n"),
        d("agree").cast("long").alias("n_agree"),
        F.expr(f"CAST(agree * {PPM} div n AS BIGINT)").alias("po_ppm"),
        F.expr(f"CAST({pe_num} * {PPM} div (n*n) AS BIGINT)").alias("pe_ppm"),
        F.expr(
            f"CAST((agree * n - {pe_num}) * {PPM} div (n * n - {pe_num}) AS BIGINT)"
        ).alias("kappa_ppm"),
    )


# ---------------------------------------------------------------------------
# multiclass confusion matrix with per-class precision / recall
# ---------------------------------------------------------------------------

# gold from the data (priority band), prediction = gold with a 20% hash flip
# to one of the other two classes
_GOLD_SQL = """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0
            WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 2 END"""
_FLIP_SQL = "(o_orderkey * 2654435761) % 1000"
_CLASSES = "['urgent', 'medium', 'low']"


def _conf_oracle() -> str:
    return f"""
    WITH s AS (
      SELECT {_GOLD_SQL} AS g, {_FLIP_SQL} AS h FROM orders
    ),
    lab AS (
      SELECT g, CASE WHEN h < 800 THEN g ELSE (g + 1 + h % 2) % 3 END AS p
      FROM s
    ),
    cm AS (SELECT g, p, count(*) AS n FROM lab GROUP BY 1, 2),
    w AS (
      SELECT g, p, n,
             sum(n) OVER (PARTITION BY g) AS support,
             sum(n) OVER (PARTITION BY p) AS pred_total
      FROM cm
    )
    SELECT ({_CLASSES})[g + 1] AS gold,
           ({_CLASSES})[p + 1] AS pred,
           CAST(n AS BIGINT) AS n,
           CAST(support AS BIGINT) AS support,
           CAST(pred_total AS BIGINT) AS pred_total,
           CAST(n * {PPM} // support AS BIGINT) AS recall_ppm,
           CAST(n * {PPM} // pred_total AS BIGINT) AS precision_ppm
    FROM w
    """


@register(
    "eval_confusion_multiclass",
    sql=_conf_oracle(),
    doc="MULTICLASS CONFUSION MATRIX of a hash-corrupted judge against the "
    "data-derived priority-band gold class: all 9 (gold, pred) cells with "
    "exact-ppm recall (row-normalized) and precision (column-normalized) "
    "on every cell — the diagonal carries the per-class metrics, the "
    "off-diagonal cells show exactly where the 20% flip mass lands.  "
    "Shape: ONE partial-aggregable groupBy collapses the scan to <=9 "
    "rows; both normalizing windows run on that aggregated frame (the "
    "SCALE.md #16 rule), so nothing row-scaled ever crosses a window.  "
    "The per-class drill-down behind eval_cohens_kappa's single number.",
)
def eval_confusion_multiclass(spark, sf_dir):
    s = _t(spark, sf_dir, "orders").select(
        F.expr(_GOLD_SQL).alias("g"), F.expr(_FLIP_SQL).alias("h")
    )
    lab = s.select(
        "g",
        F.when(F.col("h") < 800, F.col("g"))
        .otherwise((F.col("g") + 1 + F.col("h") % 2) % 3)
        .alias("p"),
    )
    cm = lab.groupBy("g", "p").agg(F.count(F.lit(1)).alias("n"))
    w = cm.select(
        "g",
        "p",
        "n",
        F.sum("n").over(W.partitionBy("g")).alias("support"),
        F.sum("n").over(W.partitionBy("p")).alias("pred_total"),
    )
    cls = F.array(F.lit("urgent"), F.lit("medium"), F.lit("low"))
    return w.select(
        F.element_at(cls, F.col("g").cast("int") + 1).alias("gold"),
        F.element_at(cls, F.col("p").cast("int") + 1).alias("pred"),
        "n",
        "support",
        "pred_total",
        F.expr(f"n * {PPM} div support").alias("recall_ppm"),
        F.expr(f"n * {PPM} div pred_total").alias("precision_ppm"),
    )


# ---------------------------------------------------------------------------
# cumulative gain / lift deciles of the calibrated ranking scorer
# ---------------------------------------------------------------------------


@register(
    "eval_lift_deciles",
    sql=f"""
    WITH b AS (
      SELECT least(p_ppm // 100000, 9) AS bin, label FROM ({_SCORED_SQL})
    ),
    g AS (SELECT bin, count(*) AS n, sum(label) AS np FROM b GROUP BY 1),
    c AS (
      SELECT bin, n, np,
             sum(n)  OVER (ORDER BY bin DESC) AS cum_n,
             sum(np) OVER (ORDER BY bin DESC) AS cum_pos,
             sum(n)  OVER () AS n_total,
             sum(np) OVER () AS pos_total
      FROM g
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n AS BIGINT) AS n,
           CAST(np AS BIGINT) AS n_pos,
           CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST(cum_pos * {PPM} // pos_total AS BIGINT) AS gain_ppm,
           CAST(CAST(cum_pos AS HUGEINT) * n_total * {PPM}
                // (CAST(cum_n AS HUGEINT) * pos_total) AS BIGINT) AS lift_ppm
    FROM c
    """,
    doc="CUMULATIVE-GAIN / LIFT DECILES of the calibrated scorer: rank the "
    "population by predicted score, and per top-decile prefix report the "
    "exact fraction of all positives captured (gain_ppm) and the capture "
    "rate relative to random targeting (lift_ppm = precision_prefix / "
    "base_rate, cross-multiplied to exact ppm).  Shape: the SAME one-scan "
    "10-bucket partial aggregate as eval_calibration_ece, with the "
    "descending-prefix cumulative windows on the 10-row frame — a "
    "calibrated uniform scorer yields lift -> ~1.9x in the top decile, "
    "which the report reproduces exactly.  The 'how much annotation "
    "budget does the scorer save' view next to eval_roc_curve's "
    "discrimination view.",
)
def eval_lift_deciles(spark, sf_dir):
    s = _scored(spark, sf_dir)
    g = (
        s.select(F.least(F.expr("p_ppm div 100000"), F.lit(9)).alias("bin"), "label")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("label").alias("np"))
    )
    wd = W.partitionBy(F.lit(0)).orderBy(F.col("bin").desc())
    wall = W.partitionBy(F.lit(0))
    c = g.select(
        "bin",
        "n",
        "np",
        F.sum("n").over(wd).alias("cum_n"),
        F.sum("np").over(wd).alias("cum_pos"),
        F.sum("n").over(wall).alias("n_total"),
        F.sum("np").over(wall).alias("pos_total"),
    )
    return c.select(
        "bin",
        "n",
        F.col("np").alias("n_pos"),
        "cum_n",
        "cum_pos",
        F.expr(f"cum_pos * {PPM} div pos_total").alias("gain_ppm"),
        # cum_pos * n_total * 1e6 exceeds int64 once the population passes
        # ~10M rows (caught by the sf1.0 sweep) — widen to decimal(38)
        F.expr(
            f"CAST(CAST(cum_pos AS DECIMAL(38,0)) * n_total * {PPM}"
            f" div (CAST(cum_n AS DECIMAL(38,0)) * pos_total) AS BIGINT)"
        ).alias("lift_ppm"),
    )


# ---------------------------------------------------------------------------
# PMI-ratio bigram collocations over the document corpus
# ---------------------------------------------------------------------------

_MIN_COUNT = 5
_TOP_K = 50


@register(
    "text_pmi_bigrams",
    sql=f"""
    WITH tok AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
    ),
    bg AS (
      SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:])) AS p FROM tok
    ),
    pair AS (
      SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS HUGEINT) AS c_xy
      FROM bg WHERE length(p[1]) >= 3 AND length(p[2]) >= 3
      GROUP BY 1, 2
    ),
    uni AS (
      SELECT t AS w, CAST(count(*) AS HUGEINT) AS c
      FROM (SELECT unnest(toks) AS t FROM tok) WHERE length(t) >= 3
      GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT sum(c) FROM uni) AS t_uni,
             (SELECT sum(c_xy) FROM pair) AS t_bg
    )
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           CAST(u1.c AS BIGINT) AS c_w1, CAST(u2.c AS BIGINT) AS c_w2,
           CAST(c_xy * t_uni * t_uni * {PPM} // (t_bg * u1.c * u2.c) AS BIGINT)
             AS pmi_ratio_ppm
    FROM pair JOIN uni u1 ON pair.w1 = u1.w
              JOIN uni u2 ON pair.w2 = u2.w
              CROSS JOIN tot
    WHERE c_xy >= {_MIN_COUNT}
    ORDER BY pmi_ratio_ppm DESC, w1, w2
    LIMIT {_TOP_K}
    """,
    doc="PMI BIGRAM COLLOCATIONS (phrase detection a la word2vec's phrase "
    f"pass): top-{_TOP_K} adjacent word pairs by the exact association "
    "ratio p(xy)/(p(x)p(y)) = c_xy*T^2/(B*c_x*c_y), held in HUGEINT/"
    "decimal(38) ppm — log-PMI is a monotone transform, so this ranking "
    "IS the PMI ranking without a cross-engine float log.  Shape: ONE "
    "corpus scan — each document emits its unigram AND adjacent-bigram "
    "records from a single in-task explode (transform+get, bigrams "
    "carrying w2, unigrams a NULL sentinel), one partial-aggregable "
    "groupBy collapses to the vocab+pairs frame, and that frame is "
    "localCheckpointed ONCE (the minhash-signature discipline) before "
    "branching into pair/unigram views — the naive branch shape re-reads "
    "the corpus 5x.  The two vocabulary-sized unigram joins are pinned "
    "shuffle-hash (aggregation-descended sides — the SCALE.md #11 rule), "
    "corpus totals ride a broadcast single row, and the final top-k is a "
    f"TakeOrderedAndProject with a total (ratio, w1, w2) tiebreak.  min "
    f"support {_MIN_COUNT} keeps the hapax noise out, as the word2vec "
    "phrase pass does.",
)
def text_pmi_bigrams(spark, sf_dir):
    from ..functions.text import tokens as _tokens

    docs = _t(spark, sf_dir, "documents").select(_tokens(F.col("text")).alias("toks"))
    # one explode per document carrying BOTH record kinds: unigrams as
    # (w1, NULL), adjacent bigrams as (w1, w2) via index lambda +
    # out-of-bounds-safe get()
    recs = docs.select(
        F.explode(
            F.expr(
                "concat("
                "  transform(filter(toks, t -> length(t) >= 3),"
                "            t -> struct(t AS w1, CAST(NULL AS STRING) AS w2)),"
                "  filter(transform(toks, (x, i) -> struct(x AS w1, get(toks, i + 1) AS w2)),"
                "         p -> p.w2 IS NOT NULL AND length(p.w1) >= 3 AND length(p.w2) >= 3)"
                ")"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    dec = "decimal(38,0)"
    # EAGER: pair/uni/tot consume this from concurrent stages (tot rides a
    # broadcast), which raced the lazy persist — A/B probed 1.32 -> 0.96 s
    # min-of-5 at sf0.1 (round-10)
    counts = (
        recs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast(dec).alias("c"))
        .transform(materialize)
    )
    pair = counts.where(F.col("w2").isNotNull()).withColumnRenamed("c", "c_xy")
    uni = counts.where(F.col("w2").isNull()).select("w1", "c")
    tot = counts.agg(
        F.sum(F.when(F.col("w2").isNull(), F.col("c"))).alias("t_uni"),
        F.sum(F.when(F.col("w2").isNotNull(), F.col("c"))).alias("t_bg"),
    )
    scored = (
        pair.where(F.col("c_xy") >= _MIN_COUNT)
        .join(uni.hint("shuffle_hash").withColumnRenamed("c", "c1"), "w1")
        .join(
            uni.hint("shuffle_hash")
            .withColumnRenamed("w1", "w2")
            .withColumnRenamed("c", "c2"),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy_l"),
            F.col("c1").cast("long").alias("c_w1"),
            F.col("c2").cast("long").alias("c_w2"),
            F.expr(f"CAST(c_xy * t_uni * t_uni * {PPM} div (t_bg * c1 * c2) AS BIGINT)").alias(
                "pmi_ratio_ppm"
            ),
        )
        .withColumnRenamed("c_xy_l", "c_xy")
    )
    return scored.orderBy(
        F.col("pmi_ratio_ppm").desc(), F.col("w1"), F.col("w2")
    ).limit(_TOP_K).select("w1", "w2", "c_xy", "c_w1", "c_w2", "pmi_ratio_ppm")
