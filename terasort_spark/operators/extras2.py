"""Third-wave operators: filtered/bitwise aggregates, EWMA, rolling
median, edit-distance near-dup, BPE-ish tokenization, extended datetime
functions, and a salted skew-join whose oracle is the PLAIN join — the
salt must be semantically invisible.

Scale notes: every operator here keeps the 100 TB discipline — facts
shuffle once on their natural key (or a salted key, for skew), dims
broadcast, and money-scale float outputs go through exact DECIMAL sums
(operators/_util.py) so results are partitioning-invariant.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import DEC, dsum, o_dsum, o_rnd, rnd
from terasort_spark.registry import register


@register(
    "agg_filtered",
    oracle=f"""
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       {o_rnd("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)", "urgent_total")},
       count(*) FILTER (WHERE year(o_orderdate) = 1997) AS n_1997,
       count(*) AS n_all
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_filtered(spark, sf_dir):
    """Filtered aggregates (SQL FILTER clause): several conditional
    aggregates in ONE pass over the fact table — the pattern that
    replaces N self-joins with a single scan at 100 TB. Spark spells
    FILTER as sum/count over CASE WHEN; partial aggregation still
    applies map-side."""
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(urgent, 1)).alias("n_urgent"),
        rnd(
            F.sum(F.when(urgent, F.col("o_totalprice")).cast(DEC)).cast("double"),
            "urgent_total",
        ),
        F.count(F.when(F.year("o_orderdate") == 1997, 1)).alias("n_1997"),
        F.count(F.lit(1)).alias("n_all"),
    )


@register(
    "agg_bitagg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       bit_or(l_linenumber)  AS flags_or,
       bit_and(l_linenumber) AS flags_and,
       bit_xor(l_linenumber) AS flags_xor,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_bitagg(spark, sf_dir):
    """Bitwise aggregates (bit_or/bit_and/bit_xor): order-insensitive
    and associative, so they combine map-side like sum — useful for
    permission-mask / feature-flag rollups over fact tables."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.bit_or("l_linenumber").alias("flags_or"),
        F.bit_and("l_linenumber").alias("flags_and"),
        F.bit_xor("l_linenumber").alias("flags_xor"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "ts_ewma",
    oracle=f"""
WITH recent AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS age
  FROM events
)
SELECT user_id,
       {o_rnd("CAST(sum(CAST(value * power(0.5, age - 1) AS DECIMAL(25,6))) AS DOUBLE) / CAST(sum(CAST(power(0.5, age - 1) AS DECIMAL(25,6))) AS DOUBLE)", "ewma")}
FROM recent
WHERE age <= 20
GROUP BY user_id
""",
)
def ts_ewma(spark, sf_dir):
    """Exponentially-weighted moving average (alpha=0.5) of each user's
    latest 20 events. The recursive EWMA is restated in closed form as a
    normalized weighted sum over a bounded recency window, so it's one
    shuffle (by user) + one window + one agg — no iterative pass. The
    20-row bound keeps the 0.5^age weights representable at any history
    length; weighted terms sum through DECIMAL for order-invariance."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    weight = F.pow(0.5, F.col("age") - 1)
    return (
        ev.withColumn("age", F.row_number().over(w))
        .filter(F.col("age") <= 20)
        .groupBy("user_id")
        .agg(
            rnd(
                F.sum((F.col("value") * weight).cast(DEC)).cast("double")
                / F.sum(weight.cast(DEC)).cast("double"),
                "ewma",
            )
        )
    )


@register(
    "win_median",
    oracle=f"""
SELECT event_id, user_id,
       {o_rnd("median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)", "roll_median")}
FROM events
WHERE user_id < 20
""",
)
def win_median(spark, sf_dir):
    """Rolling median (5-row frame) per user — the robust-smoothing twin
    of win_sliding's moving average. Spark disallows median() with a
    window frame, so the frame is materialized as a sorted collect_list
    (bounded: 5 elements) and the midpoint interpolated explicitly —
    (arr[(n+1)//2] + arr[n//2+1]) / 2 covers odd and even counts with
    one expression. Constant-size frame → constant per-row cost at any
    scale."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    # collect_list drops NULLs, so an all-NULL frame has n = 0: the
    # median is NULL (matching median() semantics), never index 0
    med = F.when(n > 0, (lo + hi) / 2.0)
    return ev.select("event_id", "user_id", rnd(med, "roll_median"))


@register(
    "sim_levenshtein",
    oracle="""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30)) AS INTEGER) AS dist
FROM documents a
JOIN documents b ON a.lang = b.lang
                AND substring(a.text, 1, 4) = substring(b.text, 1, 4)
                AND a.doc_id < b.doc_id
WHERE levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30)) <= 8
""",
)
def sim_levenshtein(spark, sf_dir):
    """Edit-distance near-dup: same-language docs sharing a 4-char
    blocking prefix whose 30-char prefixes are within Levenshtein
    distance 8. The (lang, 4-char-prefix) blocking key is part of the
    operator's definition (mirrored in the oracle): it turns the
    O(n²)-per-lang self-join into an equi-join over small blocks — the
    only shape that survives 100 TB. Finer corpora swap in a coarser
    fingerprint (first-k-token hash) as the block key; same plan."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 4).alias("blk"),
        F.substring("text", 1, 30).alias("prefix"),
    )
    a = d.alias("a")
    b = d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= 8)
    )


@register(
    "text_tokens",
    oracle=f"""
WITH toks AS (
  SELECT lang, doc_id, unnest(regexp_extract_all(text, '([a-z]{{1,4}})', 1)) AS tok
  FROM documents
)
SELECT lang,
       count(*) AS n_tokens,
       count(DISTINCT tok) AS n_vocab,
       {o_rnd("count(*) * 1.0 / count(DISTINCT doc_id)", "tokens_per_doc")}
FROM toks
GROUP BY lang
""",
)
def text_tokens(spark, sf_dir):
    """BPE-ish token counting: greedy <=4-char subword chunks via
    regexp_extract_all (a stand-in for a real BPE merge table — the
    Spark-side shape is identical: stringly tokenize, explode, count).
    Vocabulary size + tokens/doc per language, one explode + one agg."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit("([a-z]{1,4})"))).alias("tok"),
    )
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_vocab"),
        rnd(
            F.count(F.lit(1)) * 1.0 / F.countDistinct("doc_id"), "tokens_per_doc"
        ),
    )


@register(
    "fn_date2",
    oracle="""
SELECT o_orderkey,
       make_timestamp(CAST(year(o_orderdate) AS BIGINT), month(o_orderdate), 1, 0, 0, 0.0) AS month_start,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
WHERE o_orderkey <= 1000
""",
)
def fn_date2(spark, sf_dir):
    """Datetime construction/extraction family #2: make_timestamp,
    format-to-string, quarter, day-of-year, epoch seconds — the
    constructors and extractors fn_date doesn't cover."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.make_timestamp(
            F.year("o_orderdate"),
            F.month("o_orderdate"),
            F.lit(1),
            F.lit(0),
            F.lit(0),
            F.lit(0),
        ).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "join_salted",
    oracle=f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       {o_dsum("o_totalprice", "segment_total")}
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
)
def join_salted(spark, sf_dir):
    """Skew-mitigating salted join whose ORACLE IS THE PLAIN JOIN — the
    salt must be semantically invisible. Fact side gets salt =
    pmod(hash(o_orderkey), 8); the dim side is exploded across all 8
    salt values; the join key becomes (custkey, salt), splitting any hot
    customer key across 8 reducers. This is the manual recipe for skew
    that AQE can't fix (e.g., pre-4.x clusters or RDD-era sinks); at
    100 TB the salt fan-out is sized to the observed hot-key mass."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n_salt = 8
    o_s = o.withColumn("salt", F.pmod(F.hash("o_orderkey"), F.lit(n_salt)))
    c_s = c.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        o_s.join(
            c_s,
            (o_s.o_custkey == c_s.c_custkey) & (o_s.salt == c_s.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "segment_total"),
        )
    )


@register(
    "win_ignorenulls",
    oracle="""
SELECT event_id, user_id,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS fill_fwd,
       nth_value(v, 2 IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_v
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE floor(value * 10000 + 0.5) / 10000 END AS v
  FROM events
)
WHERE user_id < 10
""",
)
def win_ignorenulls(spark, sf_dir):
    """IGNORE NULLS window semantics: forward-fill (last non-null so
    far) and the partition's second non-null value. NULLs are
    manufactured by voiding 'error' events — the gap-repair pattern for
    sensor/event streams. One shuffle on user_id serves both windows."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        rnd(F.col("value"))
    )
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.withColumn("v", v).select(
        "event_id",
        "user_id",
        F.last("v", ignorenulls=True).over(ordered).alias("fill_fwd"),
        F.nth_value("v", 2, ignoreNulls=True).over(full).alias("second_v"),
    )


@register(
    "fn_string3",
    oracle="""
SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS tr,
       reverse(p_name) AS rev,
       repeat(p_brand, 2) AS rep,
       CAST(ascii(p_name) AS INTEGER) AS first_code,
       chr(65 + p_size % 26) AS size_chr,
       CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos,
       left(p_name, 3) AS l3,
       right(p_name, 3) AS r3
FROM part
WHERE p_partkey <= 500
""",
)
def fn_string3(spark, sf_dir):
    """String family #3: translate/reverse/repeat/ascii/chr/instr and
    left/right — rounding out the scalar string surface beyond
    fn_string/fn_string2."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("tr"),
        F.reverse("p_name").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.ascii("p_name").alias("first_code"),
        F.chr(F.lit(65) + F.col("p_size") % 26).alias("size_chr"),
        F.instr("p_name", "a").alias("a_pos"),
        F.left("p_name", F.lit(3)).alias("l3"),
        F.right("p_name", F.lit(3)).alias("r3"),
    )
