"""UDF / UDAF / UDTF surface (SURVEY.md §2b udf_* family).

The engine's rule: UDFs are the slow path — every query here exists to
prove the boundary works, not as the recommended formulation (each
docstring names the built-in equivalent). Pandas UDFs move data over
Arrow in columnar batches; row-at-a-time Python UDFs pay per-row
serialization and exist only as the compatibility baseline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, rnd
from terasort_spark.registry import register


@register(
    "udf_python",
    oracle="""
SELECT event_id,
       CASE WHEN value IS NULL THEN NULL
            WHEN value < 10 THEN 'low'
            WHEN value < 100 THEN 'mid'
            ELSE 'high' END AS bucket
FROM events
WHERE event_id < 2000
""",
)
def udf_python(spark, sf_dir):
    """Row-at-a-time Python UDF (bucket classifier). Built-in equivalent:
    the CASE WHEN ladder in project_case — ~100x faster; this entry
    exercises the per-row Python boundary deliberately."""

    @F.udf("string")
    def bucket(v: float) -> str:
        if v is None:  # SQL semantics: NULL in -> NULL out
            return None
        if v < 10:
            return "low"
        if v < 100:
            return "mid"
        return "high"

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", bucket("value").alias("bucket"))


@register(
    "udf_pandas",
    oracle=f"""
SELECT event_id,
       {o_rnd("value * 2.0 + 1.0", "scaled")}
FROM events
WHERE event_id < 2000
""",
)
def udf_pandas(spark, sf_dir):
    """Vectorized scalar pandas UDF: whole Arrow batches as pd.Series —
    the right Python escape hatch when an expression genuinely can't be
    built from pyspark.sql.functions."""

    @pandas_udf("double")
    def scale(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", rnd(scale("value"), "scaled"))


@register(
    "udaf_pandas",
    oracle=f"""
SELECT event_type,
       {o_rnd("exp(avg(ln(value + 1.0)))", "geo_mean")}
FROM events
GROUP BY event_type
""",
)
def udaf_pandas(spark, sf_dir):
    """Grouped-agg pandas UDF (geometric mean of value+1). The oracle is
    the closed form exp(avg(ln(x+1))); numpy's mean over float64 matches
    the engines' avg to well under the 4dp contract."""
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy() + 1.0).mean()))

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(rnd(geo_mean("value"), "geo_mean"))


@register(
    "udtf_split",
    oracle="""
SELECT word, CAST(pos AS INTEGER) AS pos
FROM (
  SELECT unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id < 20
)
""",
)
def udtf_split(spark, sf_dir):
    """Python UDTF (Spark >= 3.5): one input row -> many output rows with
    position. Built-in equivalent: posexplode(split(...)); the UDTF form
    exercises the table-function boundary."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:  # NULL text splits to no rows
                return
            for i, w in enumerate(text.split(" ")):
                yield w, i + 1

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    # UDTFs are invoked via SQL or lateral join; lateral keeps it per-row
    spark.udtf.register("split_words", SplitWords)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT s.word, s.pos FROM docs_for_udtf, LATERAL split_words(text) s"
    )


@register(
    "udf_grouped_map",
    oracle=f"""
SELECT doc_id, lang,
       {o_rnd("(n_chars - avg(n_chars) OVER (PARTITION BY lang)) / "
              "nullif(stddev_pop(n_chars) OVER (PARTITION BY lang), 0)", "z_chars")}
FROM documents
""",
)
def udf_grouped_map(spark, sf_dir):
    """applyInPandas grouped-map: per-language z-score normalization of
    n_chars. Built-in equivalent: the window form in the oracle. Each
    group arrives as one pandas DataFrame — the pattern for per-group
    model scoring/fitting at scale (groups must fit in executor
    memory; salt or pre-aggregate when they don't)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("float64")
        sd = x.std(ddof=0)
        z = (x - x.mean()) / sd if sd > 0 else pd.Series([None] * len(x))
        import numpy as np

        out = np.floor(z.to_numpy() * 10000 + 0.5) / 10000
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_chars": out}
        )

    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").applyInPandas(
        normalize, schema="doc_id long, lang string, z_chars double"
    )
