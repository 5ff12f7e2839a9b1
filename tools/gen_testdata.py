"""Generate driver-shaped synthetic testdata at larger scale factors.

The driver's testdata (/root/testdata/sf*, TESTDATA.md) is read-only and
capped at sf0.1; validating the 100x-scale claims needs a bigger corpus.
This tool reproduces the SAME schema and value distributions (measured off
sf0.01/sf0.1) at any sf, one parquet FILE per table, so `tools/check.py
<outdir>` and `SPARK_GRAFT_SF_DIR=<outdir> python bench.py` run unchanged.

It does NOT reproduce the driver's exact rows (seed unknown) — it does not
need to: the correctness harness compares Spark vs the DuckDB oracle over
whatever parquet it is pointed at, so any schema-faithful data exercises the
same code paths.  All randomness is hash-arithmetic on the row id
(deterministic, engine-independent, no setseed drift).

Usage: python tools/gen_testdata.py <sf> [outdir]   # default outdir /tmp/testdata_gen/sf<sf>
"""

from __future__ import annotations

import os
import sys

import duckdb

VOCAB = (
    "spark table row column join merge batch window stream filter scan sort "
    "group agg hash key value data query order line part customer small big "
    "fast slow dup vector the a"
).split()

MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "zh": ["zh1", "zh2", "zh3", "zh4", "zh5"],
}

# rows per table at sf=1.0 (linear in sf; documents/embeddings floored at 500
# like the driver's small SFs)
BASE = {
    "customer": 1_500_000, "supplier": 100_000, "part": 2_000_000,
    "orders": 15_000_000, "lineitem": 60_000_000, "events": 10_000_000,
    "documents": 500_000, "embeddings": 200_000,
}


def _r(tag: str, i: str = "i") -> str:
    """Deterministic uniform [0,1) from the row id — hash arithmetic."""
    return f"((CAST(hash('{tag}' || {i}) % 1000000 AS BIGINT)) / 1000000.0)"


def _ri(tag: str, n: int, i: str = "i") -> str:
    """Deterministic uniform integer [0, n)."""
    return f"(CAST(hash('{tag}' || {i}) % {n} AS BIGINT))"


def generate(sf: float, outdir: str, only: set[str] | None = None) -> None:
    """Write the synthetic tables at scale factor ``sf``.  ``only`` restricts
    generation to a subset of table names (each table's SQL is standalone —
    cross-table consistency is by shared hash seeds, not reads), so probing
    one heavy query family at sf3+ does not pay for 180M lineitem rows it
    never touches."""
    os.makedirs(outdir, exist_ok=True)
    n = {t: max(500, int(v * sf)) if t in ("documents", "embeddings") else max(5, int(v * sf))
         for t, v in BASE.items()}
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def copy(sql: str, table: str) -> None:
        if only is not None and table not in only:
            return
        con.execute(f"COPY ({sql}) TO '{outdir}/{table}.parquet' (FORMAT PARQUET)")
        print(table, con.sql(f"SELECT count(*) FROM '{outdir}/{table}.parquet'").fetchone()[0])

    copy("SELECT i AS r_regionkey, ['AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'][i+1] AS r_name "
         "FROM range(5) t(i)", "region")
    copy("SELECT CAST(i AS INT) AS n_nationkey, 'NATION_' || i AS n_name, "
         "CAST(i % 5 AS INT) AS n_regionkey FROM range(25) t(i)", "nation")
    copy(f"""
      SELECT i AS c_custkey, printf('Customer#%09d', i) AS c_name,
             CAST({_ri('cn', 25)} AS INT) AS c_nationkey,
             round(-1000 + {_r('cb')} * 11000, 2) AS c_acctbal,
             ['AUTOMOBILE','BUILDING','FURNITURE','MACHINERY','HOUSEHOLD'][1 + {_ri('cs', 5)}] AS c_mktsegment
      FROM range({n['customer']}) t(i)""", "customer")
    copy(f"""
      SELECT i AS s_suppkey, printf('Supplier#%09d', i) AS s_name,
             CAST({_ri('sn', 25)} AS INT) AS s_nationkey,
             round(-1000 + {_r('sb')} * 11000, 2) AS s_acctbal
      FROM range({n['supplier']}) t(i)""", "supplier")
    copy(f"""
      SELECT i AS p_partkey,
             ['small','red','blue','green','big'][1 + {_ri('pa', 5)}] || ' ' ||
               ['ring','widget','bolt','gear','case'][1 + {_ri('pb', 5)}] AS p_name,
             'Brand#' || {_ri('pc', 25)} AS p_brand,
             ['ECONOMY','SMALL','STANDARD','LARGE','PROMO'][1 + {_ri('pd', 5)}] AS p_type,
             CAST(1 + {_ri('pe', 50)} AS INT) AS p_size,
             round(900 + {_r('pf')} * 1100, 2) AS p_retailprice
      FROM range({n['part']}) t(i)""", "part")
    copy(f"""
      SELECT i AS o_orderkey, {_ri('oc', n['customer'])} AS o_custkey,
             ['F','O','P'][1 + CASE WHEN {_r('os')} < 0.48 THEN 0 WHEN {_r('os')} < 0.97 THEN 1 ELSE 2 END] AS o_orderstatus,
             round(1000 + {_r('ot')} * 450000, 2) AS o_totalprice,
             TIMESTAMP '1995-01-01' + INTERVAL (CAST({_r('od')} * 2404 AS INT)) DAY AS o_orderdate,
             ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'][1 + {_ri('op', 5)}] AS o_orderpriority
      FROM range({n['orders']}) t(i)""", "orders")
    copy(f"""
      SELECT {_ri('lo', n['orders'])} AS l_orderkey,
             {_ri('lp', n['part'])} AS l_partkey,
             {_ri('ls', n['supplier'])} AS l_suppkey,
             CAST(1 + i % 7 AS INT) AS l_linenumber,
             CAST(1 + {_ri('lq', 50)} AS DOUBLE) AS l_quantity,
             round(900 + {_r('le')} * 104000, 2) AS l_extendedprice,
             round(({_ri('ld', 11)}) / 100.0, 2) AS l_discount,
             round(({_ri('lt', 9)}) / 100.0, 2) AS l_tax,
             ['A','N','R'][1 + {_ri('lr', 3)}] AS l_returnflag,
             ['O','F'][1 + {_ri('ll', 2)}] AS l_linestatus,
             TIMESTAMP '1995-01-02' + INTERVAL (CAST({_r('lsd')} * 2497 AS INT)) DAY AS l_shipdate
      FROM range({n['lineitem']}) t(i)""", "lineitem")
    n_users = max(150, int(15000 * sf))
    copy(f"""
      SELECT i AS event_id,
             TIMESTAMP '2024-01-01' + INTERVAL (CAST({_r('ed')} * 2591990 AS BIGINT)) SECOND
               + INTERVAL (CAST({_r('eu')} * 1000000 AS BIGINT)) MICROSECOND AS ts,
             {_ri('ev', n_users)} AS user_id,
             ['click','view','purchase','signup','error'][1 + {_ri('ee', 5)}] AS event_type,
             round(0.01 + {_r('ew')} * 490.01, 2) AS value,
             '{{"k": ' || {_ri('ep', 100)} || '}}' AS props
      FROM range({n['events']}) t(i)""", "events")
    langs = list(MARKERS)
    lang_arr = "[" + ",".join(f"'{x}'" for x in langs) + "]"
    vocab_arr = "[" + ",".join(f"'{w}'" for w in VOCAB) + "]"
    # GEN_HEAPS_VOCAB=1: grow the content vocabulary with the corpus
    # (V ~ 2*sqrt(n_docs), Heaps' law beta=0.5) instead of the fixed
    # 28-word list.  The fixed list is ADVERSARIALLY dense at multi-million
    # docs: random shingles collide so often that LSH candidate-pair count
    # itself grows super-linearly (measured 4.17x pairs at 3x docs,
    # sf3->sf9), which makes minhash-family probe ratios measure the
    # SYNTHETIC corpus, not the engine.  Real corpora keep minting new
    # vocabulary, so near-dup density stays ~linear in planted dups.
    # Opt-in so every previously generated dir stays reproducible.
    n_vocab = len(VOCAB)
    if os.environ.get("GEN_HEAPS_VOCAB") == "1":
        n_vocab = max(len(VOCAB), int(2 * n["documents"] ** 0.5))
    vocab_word = (
        f"CASE WHEN CAST(hash('dw' || seed_id || ':' || j) % {n_vocab} AS BIGINT)"
        f" < {len(VOCAB)} THEN {vocab_arr}[1 + CAST(hash('dw' || seed_id || ':' || j)"
        f" % {len(VOCAB)} AS BIGINT)] ELSE 'w' || CAST(hash('dw' || seed_id || ':' || j)"
        f" % {n_vocab} AS BIGINT) END"
    )
    marker_arr = "[" + ",".join(
        "[" + ",".join(f"'{w}'" for w in MARKERS[x]) + "]" for x in langs
    ) + "]"
    # ~5% of docs are near-duplicates of doc i-1 (same word stream, one word
    # appended) so the dedup family has real work at every sf
    copy(f"""
      WITH base AS (
        SELECT i,
               CASE WHEN i > 0 AND {_ri('ddup', 100)} < 5 THEN i - 1 ELSE i END AS seed_id,
               CASE WHEN i > 0 AND {_ri('ddup', 100)} < 5 THEN 1 ELSE 0 END AS is_dup,
               1 + CASE WHEN {_r('dl')} < 0.44 THEN 0 ELSE 1 + CAST({_r('dl2')} * 3.999 AS INT) END AS lang_ix
        FROM range({n['documents']}) t(i)
      ),
      words AS (
        SELECT i, is_dup, lang_ix,
               list_transform(range(20 + CAST(hash('dn' || seed_id) % 60 AS BIGINT)),
                 j -> CASE WHEN CAST(hash('dm' || seed_id || ':' || j) % 10 AS BIGINT) < 2
                           THEN {marker_arr}[lang_ix][1 + CAST(hash('dmk' || seed_id || ':' || j) % 5 AS BIGINT)]
                           ELSE {vocab_word} END) AS ws
        FROM base
      )
      SELECT i AS doc_id,
             array_to_string(ws, ' ') || CASE WHEN is_dup = 1 THEN ' extra' ELSE '' END AS text,
             {lang_arr}[lang_ix] AS lang,
             'src' || (i % 20) AS source,
             length(array_to_string(ws, ' ') || CASE WHEN is_dup = 1 THEN ' extra' ELSE '' END) AS n_chars
      FROM words""", "documents")
    # embedding ~ N(0, 0.125) via sum of 4 uniforms; 10 labels; 2% near-dup
    # vectors (tiny perturbation of vec i-1) for the embedding-dedup family
    copy(f"""
      WITH base AS (
        SELECT i,
               CASE WHEN i > 8 AND {_ri('edup', 100)} < 2 THEN i - 1 ELSE i END AS seed_id,
               CASE WHEN i > 8 AND {_ri('edup', 100)} < 2 THEN 1 ELSE 0 END AS is_dup
        FROM range({n['embeddings']}) t(i)
      )
      SELECT i AS vec_id,
             list_transform(range(64), d -> CAST(
               ((CAST(hash('e1' || seed_id || ':' || d) % 1000000 AS BIGINT)) / 1000000.0
                + (CAST(hash('e2' || seed_id || ':' || d) % 1000000 AS BIGINT)) / 1000000.0
                + (CAST(hash('e3' || seed_id || ':' || d) % 1000000 AS BIGINT)) / 1000000.0
                + (CAST(hash('e4' || seed_id || ':' || d) % 1000000 AS BIGINT)) / 1000000.0
                - 2.0) * 0.2165
               + is_dup * ((CAST(hash('ej' || i || ':' || d) % 1000 AS BIGINT)) / 1000.0 - 0.5) * 0.01
             AS FLOAT)) AS embedding,
             CAST({_ri('el', 10)} AS INT) AS label
      FROM base""", "embeddings")


if __name__ == "__main__":
    # Usage: python tools/gen_testdata.py <sf> [outdir] [table ...]
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/testdata_gen/sf{sf}"
    only = set(sys.argv[3:]) or None
    generate(sf, outdir, only)
    print("wrote", outdir)
