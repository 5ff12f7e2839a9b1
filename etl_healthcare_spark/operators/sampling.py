"""Deterministic corpus sampling for training-data curation (north-star
capability per BASELINE.json — no reference analog; the reference's only
"sampling" is its fixed 50-row latest-observation scan window,
services/api-query/src/handler.ts:123).

Everything here is HASH-based, never rand(): a sample decision is a pure
function of (salt, id), so it is reproducible across runs, engines (the
DuckDB oracle computes the identical sha256 prefix), and cluster sizes — the
property a 100 TB curation pipeline needs for resumable / incremental runs.
Comparisons happen on fixed-width lowercase-hex prefixes, where
lexicographic order == numeric order, so no engine-specific hex→int cast is
involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction_hex(rate: float) -> str:
    """8-hex-digit threshold t such that P[sha256 prefix < t] == rate
    (exact to 1/2^32)."""
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def sample_bucket(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of sha256('<salt>:' || id) — a uniform [0, 2^32)
    draw keyed by the row id, as a comparable hex string."""
    return F.substring(F.sha2(F.concat(F.lit(salt + ":"), id_col.cast("string")), 256), 1, 8)


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float], default_rate: float, salt: str
) -> DataFrame:
    """Per-stratum hash sampling: keep a row iff its hash bucket falls below
    the stratum's rate threshold.  One narrow projection + filter — no
    shuffle, no rand(); pushdown-friendly at any scale."""
    thr = F.lit(hash_fraction_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(hash_fraction_hex(rate))).otherwise(thr)
    return df.where(sample_bucket(F.col(id_col), salt) < thr)


def hash_split(df: DataFrame, id_col: str, salt: str, train: float = 0.98, val: float = 0.01) -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket.  A document's
    split never changes as the corpus grows — the invariant that prevents
    train/test leakage across incremental curation runs."""
    b = sample_bucket(F.col(id_col), salt)
    split = (
        F.when(b < F.lit(hash_fraction_hex(train)), F.lit("train"))
        .when(b < F.lit(hash_fraction_hex(train + val)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def temperature_sample(df: DataFrame, id_col: str, group_col: str, salt: str) -> DataFrame:
    """Temperature-balanced downsampling across groups (languages, domains)
    at T=2: keep rate r_g = sqrt(n_min / n_g), so a group's expected kept
    count is sqrt(n_min * n_g) — the geometric-mean interpolation between
    the natural and uniform mixtures that multilingual training recipes use
    (alpha = 1/T exponentiated sampling; T=2 keeps every double op an
    IEEE-correctly-rounded sqrt/divide, so the threshold is bit-identical
    on any engine — arbitrary T would hinge on pow()'s last ulp).

    The per-group threshold is floor((2^32 * sqrt(n_min)) / sqrt(n_g)) in
    that exact association order (mirrored in the oracle), clamped to
    2^32-1, compared as fixed-width hex against the sha256 bucket — the
    same contract as source_cap.  The smallest group keeps everything by
    the n_g == n_min guard (no float boundary involved).

    Shape at 100 TB: one tiny group-count aggregate broadcast back over a
    map-only keep decision — no shuffle of the corpus itself.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("grp_n"))
    nmin = counts.agg(F.min("grp_n").alias("grp_min"))
    thr = F.format_string(
        "%08x",
        F.expr(
            "least(CAST(floor((4294967296.0 * sqrt(CAST(grp_min AS DOUBLE)))"
            " / sqrt(CAST(grp_n AS DOUBLE))) AS BIGINT), 4294967295)"
        ),
    )
    kept = (F.col("grp_n") == F.col("grp_min")) | (sample_bucket(F.col(id_col), salt) < thr)
    return (
        df.join(F.broadcast(counts), group_col)
        .crossJoin(F.broadcast(nmin))
        .select(F.col(id_col), F.col(group_col), kept.alias("kept"))
    )


def temperature_oracle_sql(id_col: str, group_col: str, salt: str, src: str = "documents") -> str:
    """DuckDB twin of temperature_sample — identical sqrt/divide association
    order, identical hex-threshold contract."""
    return f"""
    WITH counts AS (SELECT {group_col}, count(*) AS grp_n FROM {src} GROUP BY {group_col}),
    nmin AS (SELECT min(grp_n) AS grp_min FROM counts),
    thr AS (
      SELECT {group_col}, grp_n, grp_min,
             printf('%08x', least(CAST(floor((4294967296.0 * sqrt(CAST(grp_min AS DOUBLE)))
                                              / sqrt(CAST(grp_n AS DOUBLE))) AS BIGINT),
                                  4294967295)) AS t
      FROM counts CROSS JOIN nmin
    )
    SELECT d.{id_col}, d.{group_col},
           (t.grp_n = t.grp_min
            OR substr(sha256('{salt}:' || CAST(d.{id_col} AS VARCHAR)), 1, 8) < t.t) AS kept
    FROM {src} d JOIN thr t ON d.{group_col} = t.{group_col}
    """


def source_cap(df: DataFrame, id_col: str, source_col: str, cap: int, salt: str) -> DataFrame:
    """Cap any one source's document count at ~`cap` by hash-downsampling
    over-represented sources (rate = cap/count), keeping under-cap sources
    whole — the domain-rebalancing step that stops one crawl domain from
    dominating the training mixture.

    The per-source keep rate is computed at runtime from the source counts
    (a tiny aggregate, broadcast back), then turned into an 8-hex-digit
    threshold with the same fixed-width-hex comparison contract as the rest
    of this module: threshold = %08x of (cap * 2^32) div count, which is
    < 2^32 exactly when count > cap (the only branch that compares).  The
    keep decision stays a pure function of (salt, id, source counts), so the
    capped corpus is reproducible across engines and cluster sizes."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("src_n"))
    thr = F.format_string("%08x", F.expr(f"(CAST({cap} AS BIGINT) * 4294967296) div src_n"))
    kept = (F.col("src_n") <= cap) | (sample_bucket(F.col(id_col), salt) < thr)
    return (
        df.join(F.broadcast(counts), source_col)
        .select(F.col(id_col), F.col(source_col), kept.alias("kept"))
    )


def shard_export(
    df: DataFrame, id_col: str, tokens_col: str, n_shards: int, salt: str
) -> DataFrame:
    """Deterministic dataloader-shard export: assign every document a shard,
    a pseudo-random in-shard position, and a cumulative token offset — the
    (shard, position, offset) index a training job needs to stream packed
    shards resumably.

    Determinism contract (the whole point): shard = sha256(salt:id) mod
    n_shards and order-within-shard = the hash itself, so re-runs, engine
    swaps, and cluster resizes all emit byte-identical shard manifests, and
    a grown corpus only APPENDS new interleavings without reshuffling what a
    checkpointed run already consumed (same invariant as hash_split).  No
    rand(), no global sort.

    Scale: one shuffle — the per-shard window.  n_shards grows with the
    corpus (1 shard ~ one dataloader file), so window partitions stay
    bounded; there is deliberately NO global row_number (a single-partition
    sort bottleneck at 100 TB).

    Output (shard, pos, id, n_tokens, token_offset): pos 0-based hash order;
    token_offset = tokens before this doc in its shard.
    """
    from pyspark.sql import Window

    h = F.sha2(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")), 256)
    shard = F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(n_shards))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).alias("n_tokens"),
        h.alias("__h"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("__h", "id")
    wc = w.rowsBetween(Window.unboundedPreceding, -1)
    return base.select(
        "shard",
        (F.row_number().over(w) - 1).alias("pos"),
        "id",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(wc), F.lit(0)).alias("token_offset"),
    )


def dsir_resample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    salt: str = "dsir",
    gain: int = 4,
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al., arXiv:2302.03169: weight
    raw documents by how target-like their hashed-n-gram distribution is,
    then sample proportionally).  No reference analog; north-star layer.

    Integer-exact variant so the decision hash-compares across engines: the
    per-token target-affinity is the add-one-smoothed share of the token's
    occurrences that fall in the target slice, in ppm —
    ``(1e6*(tf_target+1)) DIV (tf_target+tf_raw+2)`` — and a document's
    importance is the integer mean over its token stream (multiplicity
    preserved).  500000 ppm is "token is side-neutral".  True DSIR uses a
    log-likelihood-ratio; the smoothed-share mean ranks documents the same
    direction (monotone per token) and needs no ln(), so the whole decision
    is a pure integer function of the corpus.

    Acceptance is proportional-to-importance like the paper: accept doc iff
    ``u < clamp(gain*(importance-500000) + 500000, 0, 1e6)`` where u is a
    uniform ppm draw from sha256(salt:id) — deterministic, engine-identical.
    Non-target docs are the candidates; target docs define the distribution.

    Scale shape: one explode -> ONE conditional-sum groupBy(token) for both
    sides' term frequencies (vocab-sized output, full map-side combine), one
    join of doc-tokens against that table, one per-doc sum.  No floats, no
    driver state, no UDFs — same skeleton as textops.lm_bigram_scores.

    Returns (id, n_tokens, importance_ppm, accept_ppm, kept) for NON-target
    docs.
    """
    from ..functions.text import tokens

    # NULL target predicates pin to False: under three-valued logic a NULL
    # would silently fall out of Spark's conditional SUM but land in a SQL
    # CASE's ELSE branch — a cross-engine divergence the sf1.0 sweep caught
    # on NULL-lang documents.  A doc with unknown target status is a
    # candidate, not a target.
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(F.col(target_col).cast("boolean"), F.lit(False)).alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    tf = toks.groupBy("w").agg(
        F.sum(F.col("__tgt").cast("long")).alias("tf_t"),
        F.sum((~F.col("__tgt")).cast("long")).alias("tf_r"),
    )
    scored = (
        toks.where(~F.col("__tgt"))
        .join(tf, "w")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.expr("(1000000 * (tf_t + 1)) DIV (tf_t + tf_r + 2)")).alias("s"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.expr("s DIV n_tokens").alias("importance_ppm"),
        )
    )
    u = F.pmod(
        F.conv(F.substring(F.sha2(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")), 256), 1, 6), 16, 10).cast("long"),
        F.lit(1_000_000),
    )
    accept = F.greatest(
        F.lit(0),
        F.least(F.lit(1_000_000), F.lit(gain) * (F.col("importance_ppm") - 500_000) + 500_000),
    )
    return scored.select(
        id_col,
        "n_tokens",
        "importance_ppm",
        accept.alias("accept_ppm"),
        (u < accept).alias("kept"),
    )


def dsir_oracle_sql(
    target_pred: str, salt: str = "dsir", gain: int = 4, src: str = "documents"
) -> str:
    """DuckDB twin of dsir_resample: same tokenization, smoothing, integer
    mean, and sha256-ppm acceptance draw.  ``target_pred`` is a SQL boolean
    over the source table's columns."""
    return f"""
    WITH toks AS (
      SELECT doc_id AS id, coalesce(({target_pred}), FALSE) AS tgt,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM {src}
    ),
    tf AS (
      SELECT w, CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tf_t,
             CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS tf_r
      FROM toks GROUP BY w
    ),
    scored AS (
      SELECT id, count(*) AS n_tokens,
             CAST(sum((1000000 * (tf.tf_t + 1)) // (tf.tf_t + tf.tf_r + 2)) AS BIGINT) AS s
      FROM toks JOIN tf ON toks.w = tf.w
      WHERE NOT tgt GROUP BY id
    ),
    imp AS (
      SELECT id AS doc_id, n_tokens, s // n_tokens AS importance_ppm,
             greatest(0, least(1000000,
               {gain} * ((s // n_tokens) - 500000) + 500000)) AS accept_ppm
      FROM scored
    )
    SELECT doc_id, n_tokens, importance_ppm, accept_ppm,
           (('0x' || substr(sha256('{salt}:' || doc_id), 1, 6))::BIGINT % 1000000)
             < accept_ppm AS kept
    FROM imp
    """


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = "ws"
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the integer
    form of Efraimidis–Spirakis A-ES (keys u^(1/w) become, after the
    monotone -log transform, priorities (-ln u)/w; here the uniform draw is
    a 12-hex sha256 integer and the priority is ``hash DIV weight``, the
    same order statistic with integer arithmetic): take the k SMALLEST
    priorities, so a row with twice the weight is ~twice as likely to make
    the cut, and the whole sample is a pure function of (salt, ids,
    weights).

    Scale: priority is map-only; the selection is a TakeOrderedAndProject
    top-k (per-partition heaps, no global sort).  Re-running on a re-
    partitioned corpus returns the identical sample — the property that
    makes weighted corpus subsets reproducible across engine versions.

    Output (id, weight, priority) — the k winners, priority ascending."""
    pr = F.expr(
        f"CAST(conv(substring(sha2(concat('{salt}:', CAST({id_col} AS STRING)), 256), 1, 12), 16, 10) AS BIGINT)"
        f" DIV {weight_col}"
    )
    return (
        df.where(F.col(weight_col) > 0)
        .select(F.col(id_col).alias("id"), F.col(weight_col).alias("weight"), pr.alias("priority"))
        .orderBy("priority", "id")
        .limit(k)
    )


def weighted_sample_oracle_sql(
    table: str, id_col: str, weight_expr: str, k: int, salt: str = "ws", where: str = "TRUE"
) -> str:
    """DuckDB twin of weighted_sample."""
    return f"""
    WITH src AS (
      SELECT {id_col} AS id, {weight_expr} AS weight FROM {table}
      WHERE ({where}) AND {weight_expr} > 0
    )
    SELECT id, weight,
           ('0x' || substr(sha256('{salt}:' || CAST(id AS VARCHAR)), 1, 12))::BIGINT
             // weight AS priority
    FROM src ORDER BY priority, id LIMIT {k}
    """


# ---------------------------------------------------------------------------
# training-mix planning: per-slice sampling rates from target weights
# ---------------------------------------------------------------------------


def mixture_plan(
    df: DataFrame,
    text_col: str,
    group_col: str,
    target_ppm: dict[str, int],
    budget_of_total_ppm: int = 1_000_000,
) -> DataFrame:
    """Turn target mixture weights into per-slice sampling rates — the
    planning step before a training run ("40% en / 20% zh / ... of a budget
    equal to the corpus size" -> "sample en at 0.87x, upsample zh 2 epochs").

    For each group g with token mass tok_g out of grand total T and target
    weight w_g (ppm), the required token mass is B*w_g/1e6 where
    B = T*budget_of_total_ppm/1e6; the sampling rate is required/tok_g —
    above 1e6 ppm means upsampling, reported as ceil epochs (the LLaMA-1
    data-mixture table shape).  Groups absent from target_ppm get rate 0
    (dropped from the mix).  Products promote to decimal(38,0)/HUGEINT
    before the integer div (token totals at 100 TB reach ~1e13; *1e6 would
    overflow int64), so both engines floor identically at any corpus size.

    Shape: ONE partial-aggregable groupBy(group) over per-doc token counts
    (map-side combine reduces the shuffle to |groups| rows), a 1-row grand
    total broadcast back, and a literal weights table broadcast-joined:
    at 100 TB this costs one scan; everything after the first agg is
    O(|groups|).
    """
    from ..functions.text import tokens

    spark = df.sparkSession
    grp = F.coalesce(F.col(group_col), F.lit("unk"))
    per = (
        df.select(grp.alias("grp"), F.size(tokens(F.col(text_col))).alias("n_tok"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("tok_total"))
    )
    grand = per.agg(F.sum("tok_total").alias("grand_tokens"))
    weights = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(target_ppm.items())], "grp string, target_ppm long"
    )
    joined = (
        per.crossJoin(F.broadcast(grand))
        .join(F.broadcast(weights), "grp", "left")
        .withColumn("target_ppm", F.coalesce(F.col("target_ppm"), F.lit(0)))
    )
    dec = "CAST(grand_tokens AS DECIMAL(38,0))"
    budget = f"({dec} * {budget_of_total_ppm} div 1000000)"
    required = f"(CAST({budget} AS DECIMAL(38,0)) * target_ppm div 1000000)"
    rate = f"(CAST({required} AS DECIMAL(38,0)) * 1000000 div tok_total)"
    return joined.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "tok_total",
        F.expr(
            "CAST(CAST(tok_total AS DECIMAL(38,0)) * 1000000 div grand_tokens AS BIGINT)"
        ).alias("natural_ppm"),
        "target_ppm",
        F.expr(f"CAST({required} AS BIGINT)").alias("required_tokens"),
        F.expr(f"CAST({rate} AS BIGINT)").alias("rate_ppm"),
        F.expr(f"CAST(({rate} + 999999) div 1000000 AS BIGINT)").alias("epochs"),
    )


def mixture_plan_oracle_sql(
    group_col: str,
    target_ppm: dict[str, int],
    budget_of_total_ppm: int = 1_000_000,
    src: str = "documents",
) -> str:
    """DuckDB twin of mixture_plan (HUGEINT products, same floor order)."""
    values = ", ".join(f"('{k}', {int(v)})" for k, v in sorted(target_ppm.items()))
    budget = f"(grand_tokens::HUGEINT * {budget_of_total_ppm} // 1000000)"
    required = f"({budget}::HUGEINT * coalesce(w.target_ppm, 0) // 1000000)"
    rate = f"({required}::HUGEINT * 1000000 // tok_total)"
    return f"""
    WITH per AS (
      SELECT coalesce({group_col}, 'unk') AS grp, count(*) AS n_docs,
             sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok_total
      FROM {src} GROUP BY 1
    ),
    grand AS (SELECT sum(tok_total) AS grand_tokens FROM per),
    w(grp, target_ppm) AS (VALUES {values})
    SELECT per.grp AS {group_col}, n_docs, CAST(tok_total AS BIGINT) AS tok_total,
           CAST(tok_total::HUGEINT * 1000000 // grand_tokens AS BIGINT) AS natural_ppm,
           CAST(coalesce(w.target_ppm, 0) AS BIGINT) AS target_ppm,
           CAST({required} AS BIGINT) AS required_tokens,
           CAST({rate} AS BIGINT) AS rate_ppm,
           CAST(({rate} + 999999) // 1000000 AS BIGINT) AS epochs
    FROM per CROSS JOIN grand LEFT JOIN w ON per.grp = w.grp
    """


# ---------------------------------------------------------------------------
# per-source score calibration: exact percent-rank in ppm
# ---------------------------------------------------------------------------


def score_calibration(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    keep_ppm: int = 700_000,
    broadcast_map: bool = True,
) -> DataFrame:
    """Calibrate a per-document quality score WITHIN each source before
    applying one global threshold — the fix for "a 60th-percentile doc in a
    clean source outscores a 95th-percentile doc in a noisy one", so a raw
    global cutoff silently drops whole domains.  Calibrated value =
    percent_rank of the doc's score inside its source, in exact integer ppm
    (#strictly-smaller * 1e6 div (n-1); single-doc sources calibrate to 0).

    Scale shape: NOT a row-level window (partitionBy(source) would sort a
    whole source — billions of rows — on one task at 100 TB).  Instead the
    two-pass exact form: (1) one partial-aggregable groupBy(source, score)
    count — output is |sources| x |distinct scores|, tiny; (2) the
    cumulative rank window runs over that AGGREGATED table (the g22_mode
    rule: windows only over aggregated tables); (3) the per-(source, score)
    pct map broadcast-joins back onto the doc stream — map-only assignment.
    The score here is the whitespace-free token count; any integer doc
    score (classifier millis, LM ppm) slots into the same plan.

    The broadcast is safe while |sources| x |distinct scores| stays small
    (token counts here: ~1e5 pairs).  A wide score domain (e.g. raw
    classifier millis across many sources, ~|sources| x 1e6 pairs) would
    blow the broadcast threshold — pass ``broadcast_map=False`` to let the
    planner fall back to a shuffled hash join on (source, score); the rest
    of the plan is unchanged."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    docs = df.select(
        F.col(id_col),
        F.col(source_col).alias("src"),
        F.size(tokens(F.col(text_col))).alias("score"),
    )
    counts = docs.groupBy("src", "score").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("src")
    cum = (
        counts.withColumn(
            "n_smaller",
            F.coalesce(
                F.sum("cnt").over(
                    w.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("n_src", F.sum("cnt").over(w))
        .select(
            "src",
            "score",
            F.expr(
                "CASE WHEN n_src > 1 THEN n_smaller * 1000000 div (n_src - 1) ELSE 0 END"
            ).alias("pct_ppm"),
        )
    )
    cum = F.broadcast(cum) if broadcast_map else cum
    return (
        docs.join(cum, ["src", "score"])
        .select(
            F.col(id_col),
            F.col("src").alias(source_col),
            "score",
            "pct_ppm",
            (F.col("pct_ppm") >= keep_ppm).alias("kept"),
        )
    )


def score_calibration_oracle_sql(
    source_col: str, keep_ppm: int = 700_000, src: str = "documents"
) -> str:
    """DuckDB twin of score_calibration, deliberately the OTHER exact form:
    a row-level rank window ((rank()-1) == #strictly-smaller under ties
    sharing the min rank), so the two engines cross-check two independent
    derivations of the same percent_rank."""
    return f"""
    WITH docs AS (
      SELECT doc_id, {source_col},
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS score,
             rank() OVER (PARTITION BY {source_col} ORDER BY score) AS rk,
             count(*) OVER (PARTITION BY {source_col}) AS n_src
      FROM {src}
    )
    SELECT doc_id, {source_col}, CAST(score AS INTEGER) AS score,
           CAST(CASE WHEN n_src > 1 THEN (rk - 1) * 1000000 // (n_src - 1)
                     ELSE 0 END AS BIGINT) AS pct_ppm,
           (CASE WHEN n_src > 1 THEN (rk - 1) * 1000000 // (n_src - 1)
                 ELSE 0 END) >= {keep_ppm} AS kept
    FROM docs
    """


def prototype_prune(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    proto_pred,
    prune_ppm: int = 250_000,
    scale: int = 1_000,
) -> DataFrame:
    """PROTOTYPE-BASED DATA PRUNING (Sorscher et al. 2022, "Beyond neural
    scaling laws: beating power law scaling via data pruning",
    arXiv:2206.14486): assign every embedding to its nearest prototype by
    cosine, rank each cluster by prototypicality (cosine to its prototype,
    descending), and mark the most-prototypical ``prune_ppm``/1e6 share of
    every cluster as pruned — for large corpora the paper keeps the HARD
    examples, which is exactly the per-cluster tail this emits kept=true for.

    Prototypes are a FIXED row subset (``proto_pred``) standing in for the
    centroids an offline clustering job would produce (cluster_kmeans is the
    in-repo trainer); they are collected to the driver (m rows, the same
    O(nlist x dim) driver fetch as the IVF centroid load) and compiled into
    literal arrays, so ASSIGNMENT IS MAP-ONLY — each row evaluates m integer
    dot products inside the scan task and picks argmax via one array_max
    over (surrogate, -proto_id) structs.  No assignment shuffle at any
    corpus size; the ONLY shuffle is the per-cluster rank window (runs as a
    rank over m partitions), whose count/rank windows share one exchange.

    Exactness: vectors quantize to a 1/``scale`` integer grid
    (quantize_vec — float32->double->floor is bit-identical across engines);
    the argmax-cosine key is the sqrt-free SIGNED surrogate

        s_i = sign(dot_i) * (dot_i^2 * 1e6 div |p_i|^2)

    monotone in cos_i = dot_i / (|v| * |p_i|) because |v| is constant per
    row and t -> sign(t)*t^2 is strictly increasing; the 1e6-scaled floor
    division runs in decimal(38,0) (HUGEINT in the oracle), and floor-merged
    ties break on the lower prototype id — a total order both engines
    reproduce bit-for-bit.
    """
    from ..functions.vectors import quantize_vec

    vecs = corpus.select(
        F.col(id_col).alias("vec_id"), quantize_vec(F.col(vec_col), scale).alias("qv")
    )
    protos = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]]) for r in vecs.where(proto_pred).collect()
    ]
    protos.sort()
    assert protos, "proto_pred selected no prototype rows"
    for _pid, qp in protos:
        # a zero-norm prototype makes the `d^2 * 1e6 div |p|^2` surrogate
        # divide by zero — NULL rank keys in BOTH engines, i.e. an undefined
        # argmax that silently diverges; fail fast like mrl_rerank does for
        # zero-norm queries
        assert sum(v * v for v in qp) > 0, f"prototype {_pid} has zero norm"

    d_cols = []
    for i, (_pid, qp) in enumerate(protos):
        arr = F.array(*[F.lit(v) for v in qp])
        d_cols.append(
            F.aggregate(
                F.zip_with(F.col("qv"), arr, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"d{i}")
        )
    scored = vecs.select("vec_id", *d_cols)

    struct_exprs = []
    for i, (pid, qp) in enumerate(protos):
        n2p = sum(v * v for v in qp)
        mag = f"CAST(CAST(d{i} AS DECIMAL(38,0)) * d{i} * 1000000 div {n2p} AS BIGINT)"
        struct_exprs.append(
            f"struct(CASE WHEN d{i} >= 0 THEN {mag} ELSE -{mag} END AS s, "
            f"{-pid}L AS negp, {pid}L AS proto_id)"
        )
    best = F.expr(f"array_max(array({', '.join(struct_exprs)}))")
    assigned = scored.select(
        "vec_id", best["proto_id"].alias("proto_id"), best["s"].alias("rank_key")
    )

    from pyspark.sql import Window

    w = Window.partitionBy("proto_id")
    ranked = assigned.select(
        "vec_id",
        "proto_id",
        "rank_key",
        F.row_number()
        .over(w.orderBy(F.desc("rank_key"), F.asc("vec_id")))
        .alias("rk"),
        F.count(F.lit(1)).over(w).alias("n_cluster"),
    )
    return ranked.select(
        "vec_id",
        "proto_id",
        "rank_key",
        "rk",
        "n_cluster",
        (F.col("rk") > F.expr(f"(n_cluster * {prune_ppm}) div 1000000")).alias("kept"),
    )


def prototype_prune_oracle_sql(
    proto_where: str,
    prune_ppm: int = 250_000,
    scale: int = 1_000,
    src: str = "embeddings",
) -> str:
    """DuckDB twin of prototype_prune — derives the same prototype set
    relationally (``proto_where`` over the source table) instead of from
    driver-collected literals, then reproduces the identical integer
    surrogate, argmax tiebreak, and per-cluster rank arithmetic."""
    return f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
      FROM {src}
    ),
    p AS (SELECT vec_id AS proto_id, qv AS qp FROM v WHERE {proto_where}),
    pairs AS (
      SELECT v.vec_id, p.proto_id,
             CAST(list_inner_product(v.qv, p.qp) AS BIGINT) AS dot,
             CAST(list_inner_product(p.qp, p.qp) AS BIGINT) AS n2p
      FROM v CROSS JOIN p
    ),
    keyed AS (
      SELECT vec_id, proto_id,
             CASE WHEN dot >= 0
                  THEN CAST(CAST(dot AS HUGEINT) * dot * 1000000 // n2p AS BIGINT)
                  ELSE -CAST(CAST(dot AS HUGEINT) * dot * 1000000 // n2p AS BIGINT)
             END AS s
      FROM pairs
    ),
    assigned AS (
      SELECT vec_id, proto_id, s AS rank_key
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY s DESC, proto_id ASC) AS ark
            FROM keyed)
      WHERE ark = 1
    ),
    ranked AS (
      SELECT vec_id, proto_id, rank_key,
             row_number() OVER (PARTITION BY proto_id
                                ORDER BY rank_key DESC, vec_id ASC) AS rk,
             count(*) OVER (PARTITION BY proto_id) AS n_cluster
      FROM assigned
    )
    SELECT vec_id, proto_id, rank_key, CAST(rk AS INTEGER) AS rk, n_cluster,
           rk > (n_cluster * {prune_ppm}) // 1000000 AS kept
    FROM ranked
    """


def interleave_order(
    df: DataFrame,
    id_col: str,
    source_col: str,
    difficulty_col,
) -> DataFrame:
    """Deterministic CURRICULUM INTERLEAVE: a total training order that (a)
    round-robins across sources so no contiguous run over-samples one
    source, and (b) visits each source's examples easiest-first
    (``difficulty_col`` ascending — the curriculum).  The standard epoch
    ordering for multi-source training mixes; a global ORDER BY rand() is
    neither reproducible nor resumable, and a global sort on a random key is
    a full-data exchange.

    The order is COMPUTED, not sorted: global_order =
    (per-source rank - 1) * n_sources + source index.  Cost: ONE rank
    window partitioned by source (the only full-data shuffle), a
    vocabulary-sized source-index frame (distinct sources ranked in a
    single-partition window over an aggregated ~|sources| rows — the same
    justified tiny-frame pattern as the IVF centroid fetch) broadcast back,
    and map-only arithmetic.  That src_idx window is the one GLOBAL
    (no-partition) window here, and it is safe at any corpus size because
    its input is AGGREGATION-DESCENDED and bounded: Distinct collapses the
    corpus to |sources| rows (training mixes have tens of sources) before
    the window ever runs — the WindowExec "No Partition Defined" warning it
    emits is expected, and test_plans.py asserts engine-wide that every
    zero-partition window sits above an aggregate, never a corpus scan.  A consumer materializes the order by
    range-partitioning on global_order — no total sort on the driver, no
    skew (ranks are dense per source by construction).

    Collision-free: distinct sources get distinct residues mod n_sources,
    so global_order is injective across the corpus.  Exact integers,
    (difficulty, id) total order per source — the oracle reproduces every
    position bit-for-bit.  NULL sources coalesce to the 'unk' sentinel (as
    mixture_plan does) so the order is genuinely TOTAL: an equi-join on a
    NULL source would silently drop those rows in both engines.
    """
    from pyspark.sql import Window

    diff = difficulty_col if not isinstance(difficulty_col, str) else F.col(difficulty_col)
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(source_col), F.lit("unk")).alias(source_col),
        diff.alias("difficulty"),
    )
    rk = F.row_number().over(
        Window.partitionBy(source_col).orderBy(F.col("difficulty").asc(), F.col(id_col).asc())
    )
    ranked = base.withColumn("rk", rk)
    srcs = (
        base.select(F.col(source_col)).distinct()
        .withColumn("src_idx", F.row_number().over(Window.orderBy(F.col(source_col))) - 1)
    )
    n_src = srcs.groupBy().agg(F.count(F.lit(1)).alias("n_sources"))
    return (
        ranked.join(F.broadcast(srcs), source_col)
        .crossJoin(F.broadcast(n_src))
        .select(
            id_col,
            source_col,
            "difficulty",
            "rk",
            "src_idx",
            "n_sources",
            ((F.col("rk") - 1) * F.col("n_sources") + F.col("src_idx")).alias("global_order"),
        )
    )


def interleave_order_oracle_sql(
    id_col: str, source_col: str, difficulty_sql: str, src: str = "documents"
) -> str:
    """DuckDB twin of interleave_order (same NULL->'unk' coalesce)."""
    return f"""
    WITH base AS (
      SELECT {id_col}, coalesce({source_col}, 'unk') AS {source_col},
             {difficulty_sql} AS difficulty
      FROM {src}
    ),
    ranked AS (
      SELECT {id_col}, {source_col}, difficulty,
             row_number() OVER (PARTITION BY {source_col}
                                ORDER BY difficulty ASC, {id_col} ASC) AS rk
      FROM base
    ),
    srcs AS (
      SELECT {source_col},
             row_number() OVER (ORDER BY {source_col}) - 1 AS src_idx,
             count(*) OVER () AS n_sources
      FROM (SELECT DISTINCT {source_col} FROM base)
    )
    SELECT r.{id_col}, r.{source_col}, r.difficulty, CAST(r.rk AS INTEGER) AS rk,
           CAST(s.src_idx AS INTEGER) AS src_idx, s.n_sources,
           (r.rk - 1) * s.n_sources + s.src_idx AS global_order
    FROM ranked r JOIN srcs s USING ({source_col})
    """


def token_shards(
    df: DataFrame,
    id_col: str,
    tokens_col,
    budget: int,
    bucket_span: int = 100_000,
) -> DataFrame:
    """CONTIGUOUS token-budget shard cutting: walk the corpus in ``id_col``
    order and start a new shard every time the running token total crosses
    ``budget`` — the "cut this ordered corpus into ~1B-token files" step
    that materializes a curriculum (interleave_order's global_order slots in
    as the id) into fixed-size training shards.  shard_export is the HASHED
    assignment (resumable random access); this is the ORDERED one (sequential
    consumption) — a doc's shard is (tokens before it) div budget, so shard
    k holds a contiguous id range carrying ~budget tokens.

    Scale shape — an exact GLOBAL cumulative sum with no global sort: ids
    coarse-bucket by ``id div bucket_span``; (1) per-bucket token sums are
    one partial-aggregable groupBy; (2) the bucket PREFIX sum runs in a
    window over the AGGREGATED bucket frame (|id range| / bucket_span rows —
    the g22_mode rule: windows only over aggregated tables) and broadcasts
    back; (3) the within-bucket cumulative window partitions by bucket, so
    no window task ever holds more than bucket_span rows.  The prefix-sum
    window in (2) is GLOBAL (no partition spec) by design — its input is
    aggregation-descended and bounded (~1M-row frame per 1B-id corpus at the
    default span), so the WindowExec "No Partition Defined" warning is
    expected; test_plans.py asserts engine-wide that every zero-partition
    window sits above an aggregate, never a corpus scan.  Requires
    non-negative integer ids (div = floor agreement; the grid/bin rule).

    Output (id, n_tokens, token_offset, shard): token_offset = tokens
    strictly before the doc in id order; shard = token_offset div budget.
    Exact int64 — the oracle reproduces every boundary bit-for-bit from a
    row-level window.
    """
    from pyspark.sql import Window

    tok = tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col)
    base = df.select(
        F.col(id_col).alias("id"),
        tok.cast("long").alias("n_tokens"),
    ).withColumn("bucket", F.expr(f"id div {bucket_span}"))
    bsums = base.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bsums.select(
        "bucket", F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0)).alias("bucket_prefix")
    )
    wi = Window.partitionBy("bucket").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        base.join(F.broadcast(prefix), "bucket")
        .select(
            "id",
            "n_tokens",
            (
                F.col("bucket_prefix")
                + F.coalesce(F.sum("n_tokens").over(wi), F.lit(0))
            ).alias("token_offset"),
        )
        .withColumn("shard", F.expr(f"token_offset div {budget}"))
    )


def token_shards_oracle_sql(
    id_col: str, tokens_sql: str, budget: int, src: str = "documents"
) -> str:
    """DuckDB twin of token_shards: the straightforward row-level global
    cumulative window (the derivation the Spark side deliberately avoids) —
    two independent constructions of the same offsets, one hash."""
    return f"""
    WITH base AS (
      SELECT {id_col} AS id, CAST({tokens_sql} AS BIGINT) AS n_tokens FROM {src}
    )
    SELECT id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (ORDER BY id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS token_offset,
           CAST(coalesce(sum(n_tokens) OVER (ORDER BY id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {budget} AS BIGINT)
             AS shard
    FROM base
    """


def cluster_weights(
    df: DataFrame, clusters: DataFrame, id_col: str, node_col: str = "node",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Duplicate-cluster DOWNWEIGHTING: every document's sampling weight is
    1e6 div (size of its duplicate cluster), 1e6 for docs in no cluster —
    the soft alternative to dedup_keep_list's hard drop (each duplicate
    GROUP contributes ~one document's worth of expected mass to the
    training mixture, but which copy survives sampling stays hash-random,
    so near-dup families keep their internal variety).  ``clusters`` is any
    (node, cluster_id) frame — connected_components over minhash-LSH pairs
    is the in-repo producer.

    Scale: cluster sizes are one partial-aggregable groupBy over the
    (small, pair-bounded) cluster assignment; the size map joins back onto
    the assignment and the result LEFT-joins the corpus on doc id (both
    shuffle-hash at corpus scale — clusters descend from aggregations, so
    static estimates lie; SCALE.md §11).  Exact integer ppm.
    """
    sizes = clusters.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("cluster_size"))
    sized = clusters.join(sizes.hint("shuffle_hash"), cluster_col).select(
        F.col(node_col).alias("__node"), "cluster_size"
    )
    return (
        df.select(F.col(id_col))
        .join(sized.hint("shuffle_hash"), F.col(id_col) == F.col("__node"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_size"), F.lit(1)).alias("cluster_size"),
            F.expr("1000000 div coalesce(cluster_size, 1)").alias("weight_ppm"),
        )
    )
