"""Event-pipeline operators: URL structure extraction, SCD2 interval
building, and ordered funnel analysis — the ETL shapes a training-data
or product-analytics pipeline runs over an events stream at 100 TB.

All three are single-shuffle designs: URL parsing is scan-side scalar
work; SCD2 and funnel both shuffle once on user_id and do the rest with
windows / conditional aggregates.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import rnd
from terasort_spark.registry import register


@register(
    "fn_url",
    oracle="""
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, 'k=([0-9]+)', 1) AS k_param
FROM (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || lang || '/' ||
         CAST(doc_id AS VARCHAR) || '?k=' || CAST(n_chars AS VARCHAR) AS url
  FROM documents
)
WHERE doc_id < 200
""",
)
def fn_url(spark, sf_dir):
    """URL structure extraction with Spark's native parse_url (HOST /
    PATH / QUERY / query-param), oracle-checked against pure-regex
    decompositions of the same synthesized URLs. Scan-side scalar work —
    no shuffle at any scale."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?k="),
        F.col("n_chars").cast("string"),
    )
    u = d.withColumn("url", url)
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).alias("k_param"),
    )


@register(
    "etl_scd2",
    oracle="""
SELECT user_id, event_type, valid_from, valid_to, is_current
FROM (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BOOLEAN) AS is_current,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
  WHERE user_id < 25
)
WHERE prev_type IS NULL OR prev_type <> event_type
""",
)
def etl_scd2(spark, sf_dir):
    """Slowly-changing-dimension (type 2) interval build: each user's
    event_type history becomes [valid_from, valid_to) rows with an
    is_current flag — change rows are kept only when the attribute
    actually changed (lag comparison). One shuffle on user_id; both
    windows share it. NOTE valid_to of a change row is the NEXT event's
    ts (open interval), the standard SCD2 merge output."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return rows.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", "valid_from", "valid_to", "is_current")


@register(
    "events_funnel",
    oracle="""
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT
  count(*) AS n_users,
  count(t_signup) AS n_signup,
  count(CASE WHEN t_click > t_signup THEN 1 END) AS n_click_after,
  count(CASE WHEN t_purchase > t_click AND t_click > t_signup THEN 1 END) AS n_full_funnel
FROM stages
""",
)
def events_funnel(spark, sf_dir):
    """Ordered funnel (signup → click → purchase): first-touch times per
    stage via conditional min aggregates, then ordering predicates count
    stage completion. ONE scan + one shuffle on user_id — never a
    per-stage self-join (the naive N-way join is the classic funnel
    anti-pattern at scale). NULL stage times drop out of the counts via
    SQL 3VL, same on both engines."""
    ev = table(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        stage("signup").alias("t_signup"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias(
            "n_click_after"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "text_tfidf",
    oracle="""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents WHERE length(text) > 0
), tf AS (
  SELECT doc_id, term FROM toks WHERE length(term) > 0
), df AS (
  SELECT term, count(*) AS dfreq FROM tf GROUP BY term
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
SELECT doc_id, term,
       floor(ln(n_docs * 1.0 / dfreq) * 10000 + 0.5) / 10000 AS idf,
       rn
FROM (
  SELECT tf.doc_id, tf.term, df.dfreq, n.n_docs,
         CAST(row_number() OVER (
            PARTITION BY tf.doc_id
            ORDER BY ln(n.n_docs * 1.0 / df.dfreq) DESC, tf.term) AS INTEGER) AS rn
  FROM tf JOIN df USING (term) CROSS JOIN n
)
WHERE rn <= 3 AND doc_id < 100
""",
)
def text_tfidf(spark, sf_dir):
    """TF-IDF keyword extraction: distinct doc-term pairs → document
    frequency → idf = ln(N/df) → top-3 most distinctive terms per doc
    (rank materialized, term tie-break). The df table is vocabulary-
    sized → broadcast back to the term stream; N rides along as a
    1-row broadcast. Binary tf (distinct terms) keeps the pair set
    bounded by doc length."""
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.length("term") > 0)
        .distinct()
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = F.log(F.col("n_docs") * 1.0 / F.col("dfreq"))
    w = Window.partitionBy("doc_id").orderBy(F.desc(idf), F.asc("term"))
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rn", F.row_number().over(w).cast("integer"))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "term", rnd(idf, "idf"), "rn")
    )


@register(
    "fn_math2",
    oracle="""
SELECT p_partkey,
       floor(sin(radians(p_size)) * 10000 + 0.5) / 10000 AS sin_r,
       floor(cos(radians(p_size)) * 10000 + 0.5) / 10000 AS cos_r,
       floor(atan2(p_size, p_retailprice) * 10000 + 0.5) / 10000 AS at2,
       floor(degrees(atan(p_size / 100.0)) * 10000 + 0.5) / 10000 AS deg,
       floor(cbrt(p_retailprice) * 10000 + 0.5) / 10000 AS cb,
       CAST(factorial(p_size % 10) AS BIGINT) AS fact
FROM part
WHERE p_partkey <= 500
""",
)
def fn_math2(spark, sf_dir):
    """Math family #2: trig (sin/cos/atan2), angle conversion
    (radians/degrees), cube root, factorial. IEEE libm functions agree
    bit-for-bit across engines for these inputs; outputs floor-rounded
    to 4dp per D1 anyway."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        rnd(F.sin(F.radians("p_size")), "sin_r"),
        rnd(F.cos(F.radians("p_size")), "cos_r"),
        rnd(F.atan2(F.col("p_size").cast("double"), F.col("p_retailprice")), "at2"),
        rnd(F.degrees(F.atan(F.col("p_size") / 100.0)), "deg"),
        rnd(F.cbrt("p_retailprice"), "cb"),
        F.factorial(F.col("p_size") % 10).cast("bigint").alias("fact"),
    )


@register(
    "win_runddistinct",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(first_seen) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS n_types_so_far
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
WHERE user_id < 15
""",
)
def win_runddistinct(spark, sf_dir):
    """Running COUNT(DISTINCT) per user — how many distinct event types
    seen so far. Neither engine supports DISTINCT aggregates over
    ordered windows, so it's restated as the first-occurrence-flag +
    running-sum identity (two windows sharing one user_id shuffle) —
    the streaming-state-friendly form: state per (user, type), not a
    growing distinct set per row."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 15)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(w_run).cast("bigint").alias("n_types_so_far"),
        )
    )


@register(
    "join_asof_fwd",
    oracle="""
SELECT o_orderkey, o_orderdate, l_shipdate AS first_ship
FROM (
  SELECT o_orderkey, o_orderdate, l_shipdate,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY l_shipdate, l_linenumber) AS rn
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_shipdate >= o_orderdate
) WHERE rn = 1
""",
)
def join_asof_fwd(spark, sf_dir):
    """FORWARD as-of join: for each order, the first shipment at or
    after the order date (the mirror of join_asof's backward lookup).
    Expressed as join + per-key min(struct) — a HASH aggregation with
    map-side combine, not a sort-based window: each pre-shuffle
    partition collapses to one candidate row per order key before the
    exchange, and no per-key sort ever materializes. min over a struct
    compares lexicographically, so (l_shipdate, l_linenumber) ordering
    reproduces the min-rank row exactly."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    j = o.join(li, o.o_orderkey == li.l_orderkey).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    return (
        j.groupBy("o_orderkey", "o_orderdate")
        .agg(F.min(F.struct("l_shipdate", "l_linenumber")).alias("first"))
        .select("o_orderkey", "o_orderdate", F.col("first.l_shipdate").alias("first_ship"))
    )


@register(
    "agg_skew_kurt",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         avg(l_quantity) AS mu,
         sum(l_quantity * l_quantity) / count(*) AS m2r,
         sum(l_quantity * l_quantity * l_quantity) / count(*) AS m3r,
         sum(l_quantity * l_quantity * l_quantity * l_quantity) / count(*) AS m4r
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       floor((m3 / pow(m2, 1.5)) * 10000 + 0.5) / 10000 AS skew,
       floor((m4 / (m2 * m2) - 3.0) * 10000 + 0.5) / 10000 AS kurt
FROM (
  SELECT l_returnflag, n,
         m2r - mu * mu AS m2,
         m3r - 3 * mu * m2r + 2 * mu * mu * mu AS m3,
         m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * mu * mu * mu * mu AS m4
  FROM m
)
""",
)
def agg_skew_kurt(spark, sf_dir):
    """Skewness and excess kurtosis per group. The oracle derives both
    from raw power sums (the one-pass moment identities), which is
    EXACTLY what Spark's skewness()/kurtosis() compute (population
    form) — a cross-engine check that the statistical definitions, not
    just the arithmetic, agree. l_quantity is integer-valued so the
    power sums are exact in doubles; the final expressions are fixed
    IEEE arithmetic on identical inputs."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.skewness("l_quantity"), "skew"),
        rnd(F.kurtosis("l_quantity"), "kurt"),
    )


@register(
    "agg_stringagg",
    oracle="""
SELECT c_mktsegment,
       string_agg(c_name, '|' ORDER BY c_name) AS names,
       count(*) AS n
FROM customer
WHERE c_custkey <= 200
GROUP BY c_mktsegment
""",
)
def agg_stringagg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/string_agg): collected names
    sort inside the aggregate (D5) then concatenate — deterministic at
    any partitioning. Bounded by the filter; unbounded string_agg at
    100 TB is an anti-pattern (use collect + explode instead)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_list("c_name")), "|").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_sequence_match",
    oracle="""
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
             AS journey,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events, substr(journey, 1, 20) AS journey20,
       CASE WHEN regexp_matches(journey, 's.*c.*p') THEN 1 ELSE 0 END
           AS has_funnel,
       CAST(strpos(journey, 'p') AS BIGINT) AS first_purchase_pos
FROM j
""",
)
def events_sequence_match(spark, sf_dir):
    """Sequence-pattern matching over per-user event journeys (the
    MATCH_RECOGNIZE / CEP shape): encode each user's time-ordered
    events as a one-char-per-event string, then run ordinary regexes
    against it — funnel detection becomes 's.*c.*p', position queries
    become strpos. ONE shuffle on user_id; the journey is built by
    sorting INSIDE the aggregate (sort_array over (ts, event_id)
    structs — deterministic at any partitioning, same D5 rule as
    agg_stringagg), and the regex is codegen over a per-user string
    whose length is the user's event count — state bounded per key,
    which is also exactly the applyInPandasWithState layout the
    streaming variant would use."""
    ev = table(spark, sf_dir, "events")
    j = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                    )
                ),
                lambda x: x["c"],
            ),
            "",
        ).alias("journey"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return j.select(
        "user_id",
        "n_events",
        F.substring("journey", 1, 20).alias("journey20"),
        F.col("journey").rlike("s.*c.*p").cast("int").alias("has_funnel"),
        F.instr("journey", "p").cast("bigint").alias("first_purchase_pos"),
    )
