"""Round-10 fifth wave: parameterized SQL (named parameter markers +
EXECUTE IMMEDIATE — the Spark 4 surface a SQL-serving layer binds user
input through) and ROUGE-style clipped n-gram overlap (the
summarization/eval metric family's missing member next to
auc/mrr/ndcg/calibration/confusion). Both exact-oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import register

# ---------------------------------------------------------------------------
# sql_params — named parameter markers + EXECUTE IMMEDIATE

_MINP = 250000.0
_ST = "O"


@register(
    "sql_params",
    oracle=f"""
SELECT 'named' AS src, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n
FROM orders WHERE o_totalprice > {_MINP} AND o_orderstatus = '{_ST}'
GROUP BY o_orderpriority
UNION ALL
SELECT 'exec_immediate', o_orderpriority, CAST(count(*) AS BIGINT)
FROM orders WHERE o_totalprice <= {_MINP} AND o_orderstatus = '{_ST}'
GROUP BY o_orderpriority
""",
)
def sql_params(spark, sf_dir):
    """Parameterized SQL, both Spark-4 flavors: (a) named parameter
    markers (`:minp`, `:st`) bound through spark.sql(..., args=...) —
    values travel as LITERAL PARAMETERS, never string-interpolated, so
    a serving layer is injection-safe by construction and Catalyst
    still constant-folds/pushes the bound predicate into the scan; (b)
    EXECUTE IMMEDIATE with positional `?` markers bound via USING — the
    dynamic-SQL form stored procedures and BI tools emit. The two
    branches partition orders on the bound threshold, so the oracle
    (literals inlined) proves binding semantics, not just execution."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    named = spark.sql(
        """
        SELECT 'named' AS src, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders_v
        WHERE o_totalprice > :minp AND o_orderstatus = :st
        GROUP BY o_orderpriority
        """,
        args={"minp": _MINP, "st": _ST},
    )
    exec_imm = spark.sql(
        f"""
        EXECUTE IMMEDIATE
          'SELECT ''exec_immediate'' AS src, o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders_v
           WHERE o_totalprice <= ? AND o_orderstatus = ?
           GROUP BY o_orderpriority'
          USING {_MINP}, '{_ST}'
        """
    )
    return named.unionByName(exec_imm)


# ---------------------------------------------------------------------------
# ml_rouge — clipped n-gram overlap (ROUGE-1 P/R/F1 + ROUGE-2 F1)

ROUGE_PAIRS = 400  # candidate doc_ids < this (odd ids; ref = id - 1)


def _rouge_oracle() -> str:
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, toks FROM (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents WHERE text IS NOT NULL AND doc_id < {ROUGE_PAIRS}
  ) WHERE len(toks) > 0
),
uni AS MATERIALIZED (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(toks) AS t FROM d) GROUP BY doc_id, t
),
bi AS MATERIALIZED (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS t
    FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
  ) GROUP BY doc_id, t
),
tot AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n1,
         CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n2
  FROM d
),
clip1 AS (
  SELECT c.doc_id AS cand_id, SUM(least(c.c, r.c)) AS m
  FROM uni c JOIN uni r ON r.t = c.t AND r.doc_id = c.doc_id - 1
  WHERE c.doc_id % 2 = 1 GROUP BY c.doc_id
),
clip2 AS (
  SELECT c.doc_id AS cand_id, SUM(least(c.c, r.c)) AS m
  FROM bi c JOIN bi r ON r.t = c.t AND r.doc_id = c.doc_id - 1
  WHERE c.doc_id % 2 = 1 GROUP BY c.doc_id
),
pairs AS (
  SELECT tc.doc_id AS cand_id,
         coalesce(c1.m, 0) AS m1, coalesce(c2.m, 0) AS m2,
         tc.n1 AS cn1, tc.n2 AS cn2, tr.n1 AS rn1, tr.n2 AS rn2
  FROM tot tc JOIN tot tr ON tr.doc_id = tc.doc_id - 1
  LEFT JOIN clip1 c1 ON c1.cand_id = tc.doc_id
  LEFT JOIN clip2 c2 ON c2.cand_id = tc.doc_id
  WHERE tc.doc_id % 2 = 1
)
SELECT cand_id,
  floor(CAST(m1 AS DOUBLE) / cn1 * 10000 + 0.5) / 10000 AS rouge1_p,
  floor(CAST(m1 AS DOUBLE) / rn1 * 10000 + 0.5) / 10000 AS rouge1_r,
  floor(CASE WHEN m1 = 0 THEN 0.0 ELSE
    2 * (CAST(m1 AS DOUBLE) / cn1) * (CAST(m1 AS DOUBLE) / rn1)
      / (CAST(m1 AS DOUBLE) / cn1 + CAST(m1 AS DOUBLE) / rn1)
  END * 10000 + 0.5) / 10000 AS rouge1_f,
  floor(CASE WHEN m2 = 0 OR cn2 = 0 OR rn2 = 0 THEN 0.0 ELSE
    2 * (CAST(m2 AS DOUBLE) / cn2) * (CAST(m2 AS DOUBLE) / rn2)
      / (CAST(m2 AS DOUBLE) / cn2 + CAST(m2 AS DOUBLE) / rn2)
  END * 10000 + 0.5) / 10000 AS rouge2_f
FROM pairs
"""


@register("ml_rouge", oracle=_rouge_oracle())
def ml_rouge(spark, sf_dir):
    """ROUGE-1 precision/recall/F1 and ROUGE-2 F1 with CLIPPED n-gram
    counts (the standard ROUGE definition: each candidate n-gram
    credits at most its count in the reference) over synthetic
    candidate/reference pairs (odd doc_id vs its predecessor). This is
    the summary/decontamination eval shape: per-doc n-gram count
    tables joined per pair, one aggregation per n — no all-pairs, the
    join is keyed by (pair, n-gram). The eval set is the bounded side
    (doc_id < ROUGE_PAIRS); at 100 TB the candidate table broadcasts
    and the corpus is scanned once per n-gram order. F1 is one fixed
    IEEE expression over exact integer ratios, 4dp-floored in both
    engines."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") < ROUGE_PAIRS))
        .select(
            "doc_id",
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "").alias(
                "toks"
            ),
        )
        # Zero-token docs would make cn1 = 0 and (under ANSI mode) turn
        # m1/cn1 into DIVIDE_BY_ZERO on one executor while the oracle
        # returns NULL; drop them in BOTH engines (oracle d CTE mirrors).
        .filter(F.size("toks") > 0)
    )
    uni = (
        d.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (t, i) -> concat(t, ' ', toks[i + 1]))"
                )
            ).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n1"),
        F.greatest(F.size("toks") - 1, F.lit(0)).cast("bigint").alias("n2"),
    )

    def clip(cnt):
        c = cnt.alias("c")
        r = cnt.alias("r")
        return (
            c.join(
                r,
                (F.col("r.t") == F.col("c.t"))
                & (F.col("r.doc_id") == F.col("c.doc_id") - 1),
            )
            .filter(F.col("c.doc_id") % 2 == 1)
            .groupBy(F.col("c.doc_id").alias("cand_id"))
            .agg(F.sum(F.least(F.col("c.c"), F.col("r.c"))).alias("m"))
        )

    tc = tot.alias("tc")
    tr = tot.alias("tr")
    pairs = (
        tc.join(tr, F.col("tr.doc_id") == F.col("tc.doc_id") - 1)
        .filter(F.col("tc.doc_id") % 2 == 1)
        .select(
            F.col("tc.doc_id").alias("cand_id"),
            F.col("tc.n1").alias("cn1"),
            F.col("tc.n2").alias("cn2"),
            F.col("tr.n1").alias("rn1"),
            F.col("tr.n2").alias("rn2"),
        )
        .join(clip(uni).withColumnRenamed("m", "m1"), "cand_id", "left")
        .join(clip(bi).withColumnRenamed("m", "m2"), "cand_id", "left")
        .na.fill({"m1": 0, "m2": 0})
    )
    m1 = F.col("m1").cast("double")
    m2 = F.col("m2").cast("double")
    p1, r1 = m1 / F.col("cn1"), m1 / F.col("rn1")
    p2, r2 = m2 / F.col("cn2"), m2 / F.col("rn2")

    def fl(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    f1 = F.when(F.col("m1") == 0, F.lit(0.0)).otherwise(
        2 * p1 * r1 / (p1 + r1)
    )
    f2 = F.when(
        (F.col("m2") == 0) | (F.col("cn2") == 0) | (F.col("rn2") == 0),
        F.lit(0.0),
    ).otherwise(2 * p2 * r2 / (p2 + r2))
    return pairs.select(
        "cand_id",
        fl(p1).alias("rouge1_p"),
        fl(r1).alias("rouge1_r"),
        fl(f1).alias("rouge1_f"),
        fl(f2).alias("rouge2_f"),
    )


# ---------------------------------------------------------------------------
# fn_try — error-tolerant (TRY_*) function family


@register(
    "fn_try",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS pri_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri_num,
       TRY_CAST(o_orderstatus AS DOUBLE) AS st_dbl,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE floor(o_totalprice / (o_orderkey % 5) * 10000 + 0.5) / 10000
       END AS price_div,
       string_split(o_orderpriority, '-')[2] AS pri_word,
       string_split(o_orderpriority, '-')[3] AS pri_missing
FROM orders WHERE o_orderkey < 2000
""",
)
def fn_try(spark, sf_dir):
    """The TRY_* error-tolerant family — found-data hygiene at 100 TB,
    where a single malformed cell must yield NULL, not kill a
    1000-executor job: try_cast on non-numeric strings ('1-URGENT' ->
    NULL; its leading digit parses), try_divide (divisor 0 ->
    NULL instead of ANSI error), try_element_at past the array end ->
    NULL. The oracle replays with DuckDB's TRY_CAST / guarded divide /
    out-of-bounds list index (NULL by definition there), so the
    NULL-not-error contract is hash-checked cell by cell. All
    expressions stay in whole-stage codegen — error tolerance costs no
    Python."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    pri_parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("pri_int"),
        F.expr("substr(o_orderpriority, 1, 1)").try_cast("bigint").alias("pri_num"),
        F.col("o_orderstatus").try_cast("double").alias("st_dbl"),
        (
            F.floor(
                F.try_divide(
                    F.col("o_totalprice"), F.col("o_orderkey") % 5
                )
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("price_div"),
        F.try_element_at(pri_parts, F.lit(2)).alias("pri_word"),
        F.try_element_at(pri_parts, F.lit(3)).alias("pri_missing"),
    )
