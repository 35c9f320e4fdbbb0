"""Round-10 second wave: protobuf source (from-scratch wire decoder),
int8 scalar-quantized ANN (the third quantization family next to PQ and
MRL), and hybrid lexical+vector retrieval fused with Reciprocal Rank
Fusion — the serving-side shape a RAG stack actually runs.
"""

from __future__ import annotations

import json
import os
import shutil
from collections import Counter

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, rnd, scratch_dir
from terasort_spark.operators.curation import (
    _TERMS_SQL,
    _eq_lit,
    _tok_cte,
    _tokens,
    BM25_B,
    BM25_K1,
    BM25_TERMS,
)
from terasort_spark.operators.llm_similarity import (
    _dot_sql,
    _norm_sql,
    dot_fold,
)
from terasort_spark.operators.rag import _dim_sql, DIMS
from terasort_spark.registry import register
from terasort_spark.sources.protobuf_ds import ProtobufDataSource, write_pb

# ---------------------------------------------------------------------------
# source_protobuf — length-delimited protobuf stream round-trip

_PB_FIELDS = [
    {"num": 1, "name": "o_orderkey", "type": "int64"},
    {"num": 2, "name": "o_custkey", "type": "sint64"},  # exercises zigzag
    {"num": 3, "name": "o_orderstatus", "type": "string"},
    {"num": 4, "name": "o_totalprice", "type": "double"},
    {"num": 5, "name": "o_orderdate", "type": "string"},
]
_PB_COERCE = (int, int, str, float, str)


def _pb_write_partition(out_dir: str):
    """mapInPandas stage: each executor writes ITS partition as one .pb
    stream and emits a 1-row manifest — no row through the driver. Every
    record also carries an UNDECLARED field (num 99, varint) so the
    graded read proves the spec's unknown-field skip rule."""

    def fn(batches):
        from pyspark import TaskContext

        from terasort_spark.sources.protobuf_ds import (
            encode_message,
            uvarint_encode,
        )

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.pb")
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                for t in pdf.itertuples(index=False):
                    vals = {
                        fld["name"]: (None if pd.isna(v) else c(v))
                        for fld, c, v in zip(_PB_FIELDS, _PB_COERCE, t)
                    }
                    msg = encode_message(vals, _PB_FIELDS)
                    # forward-compat payload the reader must skip
                    msg += uvarint_encode((99 << 3) | 0) + uvarint_encode(
                        len(msg)
                    )
                    f.write(uvarint_encode(len(msg)))
                    f.write(msg)
                    n += 1
        yield pd.DataFrame({"path": [path], "n": [n]})

    return fn


@register(
    "source_protobuf",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
FROM orders
""",
)
def source_protobuf(spark, sf_dir):
    """Protobuf wire-format round-trip through the pure-Python
    ``pyproto`` DataSource (sources/protobuf_ds.py, built from the
    public encoding spec — no protobuf library in this container).

    Write path: executors each emit their partition as one
    length-delimited .pb stream (varint length + message bytes, the
    writeDelimitedTo convention), with an extra UNDECLARED field in
    every record. Read path: the DataSource plans one task per file
    (length-delimited framing has no sync marker — the honest split
    unit; Avro is the in-file-splittable alternative and the docstring
    of sources/protobuf_ds.py says so), decodes varint/zigzag/fixed64
    fields and skips the unknown field by wire type. The exact oracle
    replays the source table, so encoder, framing, unknown-field skip
    and decoder are all on the graded path. At 100 TB a protobuf
    corpus is many log-shipper files; the same plugin fans one task
    per file with a single sequential read each."""
    out = scratch_dir(spark, "pb_src")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "o_orderdate"
        ),
    )
    manifest = (
        src.repartition(4)
        .mapInPandas(_pb_write_partition(out), schema="path string, n long")
        .collect()
    )
    assert len(manifest) >= 1
    spark.dataSource.register(ProtobufDataSource)
    return (
        spark.read.format("pyproto")
        .option("path", out)
        .option("fields", json.dumps(_PB_FIELDS))
        .load()
    )


# ---------------------------------------------------------------------------
# sim_cosine_sq8 — int8 scalar quantization: the third quantization
# family (PQ = codebook, MRL = prefix truncation, SQ8 = per-vector
# symmetric int8). Shortlist by exact-integer int8 dot products, exact
# cosine re-rank of the shortlist.

_SQ8_QCUT = 10
_SQ8_SHORTLIST = 20
_SQ8_TOPK = 5

_SQ8_BASE_SQL = f"""
base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
sq AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS amax,
         {_norm_sql("v")} AS nrm,
         list_transform(
           v, x -> CAST(floor(x * 127 / list_max(list_transform(v, y -> abs(y)))
                              + 0.5) AS BIGINT)) AS q8
  FROM base
  WHERE list_max(list_transform(v, x -> abs(x))) > 0
)"""


@register(
    "sim_cosine_sq8",
    oracle=f"""
WITH {_SQ8_BASE_SQL},
pairs AS (
  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         {_dot_sql("a.q8", "b.q8")} AS dot8,
         a.amax AS aq, b.amax AS ac, a.nrm AS nq, b.nrm AS nc,
         a.v AS qv, b.v AS cv
  FROM sq a JOIN sq b ON b.vec_id != a.vec_id
  WHERE a.vec_id < {_SQ8_QCUT}
),
short AS (
  SELECT *, row_number() OVER (
      PARTITION BY q_id
      ORDER BY {o_rnd("(dot8 * aq * ac) / (16129.0 * nq * nc)", nd=6)} DESC,
               c_id) AS rn8
  FROM pairs
),
rer AS (
  SELECT q_id, c_id,
         {o_rnd(f"{_dot_sql('qv', 'cv')} / (nq * nc)", "cosine")}
  FROM short WHERE rn8 <= {_SQ8_SHORTLIST}
)
SELECT q_id, c_id, cosine,
       CAST(row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, c_id) AS INTEGER) AS rn
FROM rer
QUALIFY rn <= {_SQ8_TOPK}
""",
)
def sim_cosine_sq8(spark, sf_dir):
    """ANN via per-vector symmetric int8 scalar quantization: q_i =
    round(v_i * 127 / max|v|) — the classic SQ8 index cell (FAISS
    ScalarQuantizer, Lucene int8 HNSW storage). Shortlist of
    {_SQ8_SHORTLIST} by the int8 dot estimate, exact cosine re-rank to
    top {_SQ8_TOPK}.

    Why this matters at 100 TB: the scan side of brute-force ANN is
    memory-bandwidth-bound, and SQ8 cuts the scanned bytes 4x vs fp32
    (8x vs fp64) while keeping the estimator a pure-INTEGER dot
    product — exact int64 arithmetic, so the shortlist is
    partition-count- and engine-invariant (the PQ/IVF float-score
    subtlety disappears). Per-vector scale+norm ride along as two
    doubles (the standard SQ sidecar). The plan is the sim_cosine_topk
    shape — broadcast queries, one candidate pass, WindowGroupLimit
    shortlist — with the re-rank touching only shortlisted fp
    vectors. Estimator rank key is quantized to 6dp like the IVF/PQ
    family; re-rank and output round at the family-standard 4dp."""
    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("amax", F.array_max(F.transform("v", F.abs)))
        .filter(F.col("amax") > 0)
        .withColumn("nrm", F.sqrt(dot_fold(F.col("v"), F.col("v"))))
        .withColumn(
            "q8",
            F.transform(
                "v",
                lambda x: F.floor(x * 127 / F.col("amax") + 0.5).cast(
                    "bigint"
                ),
            ),
        )
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < _SQ8_QCUT).select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("amax").alias("aq"),
            F.col("nrm").alias("nq"),
            F.col("q8").alias("qq8"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("amax").alias("ac"),
        F.col("nrm").alias("nc"),
        F.col("q8").alias("cq8"),
    )
    dot8 = dot_fold(F.col("qq8"), F.col("cq8"))
    est = (F.col("dot8") * F.col("aq") * F.col("ac")) / (
        F.lit(16129.0) * F.col("nq") * F.col("nc")
    )
    w8 = Window.partitionBy("q_id").orderBy(F.desc("est6"), F.asc("c_id"))
    short = (
        q.join(c, F.col("c_id") != F.col("q_id"))
        .withColumn("dot8", dot8)
        .withColumn("est6", rnd(est, nd=6))
        .withColumn("rn8", F.row_number().over(w8))
        .filter(F.col("rn8") <= _SQ8_SHORTLIST)
    )
    cosine = dot_fold(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        short.withColumn("cosine", rnd(cosine))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SQ8_TOPK)
        .select("q_id", "c_id", "cosine", "rn")
    )


# ---------------------------------------------------------------------------
# pipeline_hybrid_rrf — hybrid retrieval: BM25 lexical ranking + feature-
# hash cosine ranking, fused with Reciprocal Rank Fusion.

_RRF_K = 60
_RRF_DEPTH = 20
_RRF_TOPK = 10

# The query vector is a pure integer function of the fixed BM25 term
# set, precomputed once and inlined as literals in BOTH engines.
_QDIMS = Counter(
    (ord(t[0]) * 31 + len(t)) % DIMS for t in BM25_TERMS
)
_QQ = sum(w * w for w in _QDIMS.values())
_QV_SQL = ", ".join(f"({d}, {w})" for d, w in sorted(_QDIMS.items()))


@register(
    "pipeline_hybrid_rrf",
    oracle=f"""
WITH {_tok_cte()},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN {_TERMS_SQL} GROUP BY doc_id, term
),
df AS (SELECT term, count(DISTINCT doc_id) AS dfreq FROM tok
       WHERE term IN {_TERMS_SQL} GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln(1 + (stats.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5))
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
           * 1000000 + 0.5) AS BIGINT) AS c_q6
  FROM tf
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  JOIN df ON tf.term = df.term
),
lexr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY sum(c_q6) DESC, doc_id)
              AS BIGINT) AS lex_rank
  FROM contrib GROUP BY doc_id
),
dv AS (
  SELECT doc_id, {_dim_sql("term")} AS dim, count(*) AS w
  FROM tok GROUP BY 1, 2
),
cc AS (SELECT doc_id, sum(w * w) AS cc FROM dv GROUP BY doc_id),
qv AS (SELECT * FROM (VALUES {_QV_SQL}) AS t(dim, qw)),
dots AS (
  SELECT doc_id, sum(w * qw) AS dot
  FROM dv JOIN qv USING (dim) GROUP BY doc_id
),
vecr AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           ORDER BY CAST(floor(dot / (sqrt({_QQ}) * sqrt(cc)) * 1000000 + 0.5)
                    AS BIGINT) DESC, doc_id) AS BIGINT) AS vec_rank
  FROM dots JOIN cc USING (doc_id)
),
fused AS (
  SELECT doc_id, lex_rank, vec_rank,
         coalesce(1.0 / ({_RRF_K} + lex_rank), 0.0)
           + coalesce(1.0 / ({_RRF_K} + vec_rank), 0.0) AS rrf
  FROM (SELECT doc_id, lex_rank FROM lexr WHERE lex_rank <= {_RRF_DEPTH}) l
  FULL OUTER JOIN
       (SELECT doc_id, vec_rank FROM vecr WHERE vec_rank <= {_RRF_DEPTH}) v
  USING (doc_id)
)
SELECT doc_id, lex_rank, vec_rank,
       {o_rnd("rrf", "rrf", nd=6)}
FROM fused
QUALIFY row_number() OVER (
    ORDER BY CAST(floor(rrf * 1000000000 + 0.5) AS BIGINT) DESC, doc_id)
  <= {_RRF_TOPK}
""",
)
def pipeline_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.):
    rank documents by BM25 over the fixed query-term set AND by cosine
    of a {DIMS}-dim feature-hash embedding against the query vector,
    keep each system's top {_RRF_DEPTH}, fuse with
    rrf = Σ 1/({_RRF_K} + rank), return the top {_RRF_TOPK}.

    This is the serving plan of a production RAG stack (sparse BM25
    index + dense ANN index + fusion); the two rankings here are the
    repo's text_bm25 and pipeline_rag_retrieval building blocks. Scale:
    one token-stream scan feeds BOTH systems — dl/tf and the
    (doc_id, dim) vector are groupBys of the same explode; each
    system's rank list is depth-bounded ({_RRF_DEPTH} rows) before the
    fusion full-outer join, so the fuse stage is O(depth), not
    O(corpus), exactly like merging posting lists from two index
    tiers. Rank keys are exact integers (6dp-quantized scores, doc_id
    ties), so both lists — and therefore the fused order — are
    partition-count- and engine-invariant."""
    tok = _tokens(spark, sf_dir)

    # --- lexical: BM25 ranking (text_bm25's exact scoring, rank form)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("dfreq")
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
    )
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(df), "term")
        .select(
            "doc_id",
            F.floor(idf * tfn * 1000000 + 0.5).cast("bigint").alias("c_q6"),
        )
    )
    # top-DEPTH via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, never a one-task global sort); the rank window then runs
    # over DEPTH rows only
    w_lex = Window.orderBy(F.desc("s_q6"), F.asc("doc_id"))
    lexr = (
        contrib.groupBy("doc_id")
        .agg(F.sum("c_q6").alias("s_q6"))
        .orderBy(F.desc("s_q6"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .withColumn("lex_rank", F.row_number().over(w_lex).cast("bigint"))
        .select("doc_id", "lex_rank")
    )

    # --- vector: feature-hash cosine ranking (rag's embedding, doc level)
    dim = F.expr(_dim_sql("term"))
    dv = (
        tok.select("doc_id", dim.alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    cc = dv.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("cc"))
    qv = spark.createDataFrame(
        sorted(_QDIMS.items()), "dim int, qw int"
    )
    dots = (
        dv.join(F.broadcast(qv), "dim")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    c6 = F.floor(
        F.col("dot") / (F.sqrt(F.lit(_QQ)) * F.sqrt(F.col("cc"))) * 1000000
        + 0.5
    ).cast("bigint")
    w_vec = Window.orderBy(F.desc("c6"), F.asc("doc_id"))
    vecr = (
        dots.join(cc, "doc_id")
        .withColumn("c6", c6)
        .orderBy(F.desc("c6"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .withColumn("vec_rank", F.row_number().over(w_vec).cast("bigint"))
        .select("doc_id", "vec_rank")
    )

    # --- fuse: depth-bounded lists, RRF, top-k
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0)
    )
    r9 = F.floor(F.col("rrf") * 1000000000 + 0.5).cast("bigint")
    w_f = Window.orderBy(F.desc("r9"), F.asc("doc_id"))
    return (
        lexr.join(vecr, "doc_id", "full_outer")
        .withColumn("rrf", rrf)
        .withColumn("r9", r9)
        .withColumn("fr", F.row_number().over(w_f))
        .filter(F.col("fr") <= _RRF_TOPK)
        .select("doc_id", "lex_rank", "vec_rank", rnd(F.col("rrf"), "rrf", nd=6))
    )


# ---------------------------------------------------------------------------
# agg_quantile_hist — deterministic mergeable histogram quantiles: the
# exact-replayable counterpart to the by-design rows-only
# agg_percentile_approx (whose KLL-style sketch has engine-private
# state). Same accuracy CONTRACT as a production sketch (error bounded
# by bin width), but the state is a plain (group, bin) count map, so
# the estimate is bit-identical on any engine and any partitioning.

_QH_WIDTH = 1000.0  # bin width over l_extendedprice (~[900, 105k])


def _qh_rank_sql(pct: int) -> str:
    # ceil(pct% of total) in exact integer arithmetic
    return f"floor((total * {pct} + 99) / 100)"


@register(
    "agg_quantile_hist",
    oracle=f"""
WITH b AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice / {_QH_WIDTH}) AS BIGINT) AS bin,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2
),
t AS (SELECT flag, sum(c) AS total FROM b GROUP BY flag),
cum AS (
  SELECT flag, bin,
         sum(c) OVER (PARTITION BY flag ORDER BY bin) AS cum
  FROM b
),
pick AS (
  SELECT cum.flag,
         min(CASE WHEN cum >= {_qh_rank_sql(50)} THEN bin END) AS b50,
         min(CASE WHEN cum >= {_qh_rank_sql(95)} THEN bin END) AS b95,
         min(CASE WHEN cum >= {_qh_rank_sql(99)} THEN bin END) AS b99
  FROM cum JOIN t USING (flag) GROUP BY cum.flag
)
SELECT flag, CAST(total AS BIGINT) AS total,
       CAST(b50 * {_QH_WIDTH} AS DOUBLE) AS p50_est,
       CAST(b95 * {_QH_WIDTH} AS DOUBLE) AS p95_est,
       CAST(b99 * {_QH_WIDTH} AS DOUBLE) AS p99_est
FROM pick JOIN t USING (flag)
""",
)
def agg_quantile_hist(spark, sf_dir):
    """Per-group p50/p95/p99 from an equi-width histogram sketch.

    The sketch state per group is a bin→count map (bins =
    value_range / {_QH_WIDTH}, NOT rows), built by one groupBy with
    map-side partial aggregation — the same mergeable-summary shape as
    approx_percentile/t-digest, which is why it scales: partials
    combine associatively, shuffle volume is O(groups × bins), and the
    quantile extraction is a bins-sized cumulative window per group.
    Unlike those sketches the state is deterministic integers, so the
    estimate (lower edge of the first bin whose cumulative count
    reaches ceil(q·N), rank in exact integer arithmetic) is
    bit-identical across engines and partitionings — the exact-oracle
    counterpart the rows-only agg_percentile_approx can't be. Error is
    bounded by one bin width; halving the width doubles state, the
    standard sketch trade dialed by `_QH_WIDTH`."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") / _QH_WIDTH)
        .cast("bigint")
        .alias("bin"),
    )
    b = li.groupBy("flag", "bin").agg(F.count(F.lit(1)).alias("c"))
    t = b.groupBy("flag").agg(F.sum("c").alias("total"))
    cum = b.withColumn(
        "cum",
        F.sum("c").over(Window.partitionBy("flag").orderBy("bin")),
    )

    def rank(pct: int):
        return F.floor((F.col("total") * pct + 99) / 100)

    pick = (
        cum.join(t, "flag")
        .groupBy("flag")
        .agg(
            *[
                F.min(
                    F.when(F.col("cum") >= rank(p), F.col("bin"))
                ).alias(f"b{p}")
                for p in (50, 95, 99)
            ]
        )
    )
    return pick.join(t, "flag").select(
        "flag",
        F.col("total").cast("bigint").alias("total"),
        (F.col("b50") * _QH_WIDTH).alias("p50_est"),
        (F.col("b95") * _QH_WIDTH).alias("p95_est"),
        (F.col("b99") * _QH_WIDTH).alias("p99_est"),
    )
