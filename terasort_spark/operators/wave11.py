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
            compile_row_encoder,
            uvarint_encode,
        )

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.pb")
        encode_row = compile_row_encoder(_PB_FIELDS)
        unk_tag = uvarint_encode((99 << 3) | 0)
        n = 0
        out = bytearray()
        with open(path, "wb") as f:
            for pdf in batches:
                for t in pdf.itertuples(index=False):
                    msg = encode_row(
                        tuple(
                            None if pd.isna(v) else c(v)
                            for c, v in zip(_PB_COERCE, t)
                        )
                    )
                    # forward-compat payload the reader must skip
                    msg += unk_tag + uvarint_encode(len(msg))
                    out += uvarint_encode(len(msg))
                    out += msg
                    n += 1
                if len(out) >= 1 << 20:
                    f.write(out)
                    out = bytearray()
            f.write(out)
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
    # 16 shards: the file IS the split unit for this format, so the
    # file count sets BOTH write and read parallelism
    manifest = (
        src.repartition(16)
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


# Shared by sim_cosine_sq8 and its evaluator ml_ndcg, so the index and
# its metric cannot drift apart silently (the ml_mrr <-> sim_cosine_ivf
# pattern).
_SQ8_CTES = f"""{_SQ8_BASE_SQL},
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
),
sq8_topk AS (
  SELECT q_id, c_id, cosine, rn FROM (
    SELECT q_id, c_id, cosine,
           CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY cosine DESC, c_id) AS INTEGER) AS rn
    FROM rer
  ) WHERE rn <= {_SQ8_TOPK}
)"""


@register(
    "sim_cosine_sq8",
    oracle=f"""
WITH {_SQ8_CTES}
SELECT q_id, c_id, cosine, rn FROM sq8_topk
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


# ---------------------------------------------------------------------------
# pipeline_tokenize_pack — the single-pass "tokenize and pack" pretrain
# preprocessing job: BPE-encode every document (tokenizer.py's trained
# merges) and assign it a slot in the stream of fixed-size context
# windows (pretrain.py's packing), in BPE-token units instead of
# whitespace units.


def _tokenize_pack_oracle() -> str:
    from terasort_spark.operators.pretrain import CONTEXT
    from terasort_spark.operators.tokenizer import (
        N_MERGES,
        _bpe_base_sql,
        _bpe_round_sql,
    )

    parts = [_bpe_base_sql()] + [
        _bpe_round_sql(k) for k in range(1, N_MERGES + 1)
    ]
    return (
        "WITH "
        + ",".join(parts)
        + f""",
vn AS MATERIALIZED (
  SELECT w, CAST(count(*) AS INT) AS n_sub FROM r{N_MERGES} GROUP BY w
),
dw AS MATERIALIZED (
  SELECT doc_id, source, w FROM (
    SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
  ) WHERE length(w) > 0
),
dt AS (
  SELECT doc_id, source,
         CAST(SUM(coalesce(vn.n_sub, length(dw.w) + 1)) AS BIGINT) AS n_bpe
  FROM dw LEFT JOIN vn ON dw.w = vn.w
  GROUP BY doc_id, source
)
SELECT doc_id, source, n_bpe,
       CAST(floor((run - n_bpe) / {CONTEXT}) AS BIGINT) AS bin_id,
       CAST(run - n_bpe - floor((run - n_bpe) / {CONTEXT}) * {CONTEXT}
            AS BIGINT) AS bin_offset
FROM (
  SELECT doc_id, source, n_bpe,
         sum(n_bpe) OVER (PARTITION BY source ORDER BY doc_id) AS run
  FROM dt
)"""
    )


@register("pipeline_tokenize_pack", oracle=_tokenize_pack_oracle())
def pipeline_tokenize_pack(spark, sf_dir):
    """Tokenize-and-pack in one pass: BPE-encode the corpus with the
    trained merge table (text_bpe_train's model), then pack documents
    into fixed-CONTEXT training windows by BPE-TOKEN length — the job
    every pretrain data pipeline runs between curation and batching
    (pack_sequences is its whitespace-unit twin). Emits each doc's
    (source, bin_id, bin_offset) slot plus its BPE token count; a doc
    may straddle two bins, bin_id is where it starts.

    Scale: the ONLY corpus-sized steps are the word histogram (one
    map-side-combined shuffle), the broadcast encode join (vocab-sized
    word→n_sub table onto the exploded token stream — never a per-token
    Python loop), and ONE cumsum per source for the packing. The merge
    loop itself is O(vocab) driver model state, like emb_kmeans
    centroids. Assignment depends only on (source, doc_id order), so
    the physical layout decision is cluster-size-invariant. Oracle:
    the BPE rounds unrolled as in text_bpe_encode, then the packing
    window replayed over BPE counts."""
    from terasort_spark.operators.pretrain import CONTEXT
    from terasort_spark.operators.tokenizer import (
        _word_counts,
        encode_word,
        train_bpe,
    )

    wc = [(r["w"], r["n"]) for r in _word_counts(spark, sf_dir).collect()]
    merges = train_bpe(wc)
    enc_df = spark.createDataFrame(
        [(w, len(encode_word(w, merges))) for w, _n in wc],
        "w string, n_sub int",
    )
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    words = d.select(
        "doc_id", "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") > 0)
    dt = (
        words.join(F.broadcast(enc_df), "w", "left")
        .withColumn("n_sub", F.coalesce(F.col("n_sub"), F.length("w") + 1))
        .groupBy("doc_id", "source")
        .agg(F.sum("n_sub").cast("bigint").alias("n_bpe"))
    )
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum("n_bpe").over(win)
    start = run - F.col("n_bpe")
    return dt.select(
        "doc_id",
        "source",
        "n_bpe",
        F.floor(start / CONTEXT).alias("bin_id"),
        (start - F.floor(start / CONTEXT) * CONTEXT)
        .cast("bigint")
        .alias("bin_offset"),
    )


# ---------------------------------------------------------------------------
# ml_ndcg — graded retrieval evaluation of the SQ8 index: NDCG@5 with
# graded relevance from the exact-cosine ranking (rel = 6 - exact_rn
# for the true top-5, else 0). Companion to ml_mrr (which evaluates the
# IVF index with binary relevance).

import math as _math

# IDCG@5 for the full relevance ladder 5..1, quantized exactly like the
# per-term DCG contributions; a Python-side constant inlined into BOTH
# engines so no cross-engine log/rounding divergence is possible.
_IDCG6 = sum(
    _math.floor((6 - i) / _math.log2(i + 1) * 1000000 + 0.5)
    for i in range(1, _SQ8_TOPK + 1)
)


def _ndcg_oracle() -> str:
    exact_cos = o_rnd(f"{_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm)")
    return f"""
WITH {_SQ8_CTES},
exact AS (
  SELECT q_id, c_id, 6 - rn AS rel FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS c_id,
           row_number() OVER (PARTITION BY a.vec_id
               ORDER BY {exact_cos} DESC, b.vec_id) AS rn
    FROM sq a JOIN sq b ON b.vec_id != a.vec_id
    WHERE a.vec_id < {_SQ8_QCUT}
  ) WHERE rn <= {_SQ8_TOPK}
),
terms AS (
  SELECT s.q_id,
         CAST(floor(coalesce(e.rel, 0) / log2(s.rn + 1) * 1000000 + 0.5)
              AS BIGINT) AS t6,
         CASE WHEN e.rel IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM sq8_topk s
  LEFT JOIN exact e ON e.q_id = s.q_id AND e.c_id = s.c_id
)
SELECT q_id,
       CAST(sum(hit) AS BIGINT) AS hits,
       floor(sum(t6) / 100.0 + 0.5) / 10000 AS dcg,
       floor(sum(t6) / {_IDCG6} * 10000 + 0.5) / 10000 AS ndcg
FROM terms GROUP BY q_id
"""


@register("ml_ndcg", oracle=_ndcg_oracle())
def ml_ndcg(spark, sf_dir):
    """NDCG@5 of the deployed SQ8 index against graded exact-cosine
    relevance — the second standard retrieval metric next to ml_mrr's
    MRR/hit@5 (binary relevance): graded NDCG distinguishes "found the
    3rd-best at rank 1" from "found the best at rank 1", which is what
    a ranking regression actually looks like in production.

    Ground truth: exact top-{_SQ8_TOPK} per query, rel = 6 - rank. Per
    system position i: DCG term rel_i / log2(i+1), quantized to 6dp
    int64 BEFORE the per-query sum so the aggregate is exact integer
    addition (engine- and partition-invariant); NDCG divides by the
    IDCG constant of the full 5..1 ladder, inlined identically into
    both engines. Scale: the evaluation joins are |Q|-bounded (the
    query sample is broadcast, candidates stream — same discipline as
    ml_mrr); the system side reuses sim_cosine_sq8's plan unchanged
    via the shared CTE/function, so index and metric cannot drift."""
    sys_topk = sim_cosine_sq8(spark, sf_dir).select("q_id", "c_id", "rn")

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
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < _SQ8_QCUT).select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("nq"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("nc"),
    )
    cosine = dot_fold(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    exact = (
        q.join(c, F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", rnd(cosine))
        .withColumn("rn_x", F.row_number().over(w))
        .filter(F.col("rn_x") <= _SQ8_TOPK)
        .select("q_id", "c_id", (F.lit(6) - F.col("rn_x")).alias("rel"))
    )
    t6 = F.floor(
        F.coalesce(F.col("rel"), F.lit(0)) / F.log2(F.col("rn") + 1) * 1000000
        + 0.5
    ).cast("bigint")
    return (
        sys_topk.join(exact, ["q_id", "c_id"], "left")
        .select(
            "q_id",
            t6.alias("t6"),
            F.when(F.col("rel").isNotNull(), 1).otherwise(0).alias("hit"),
        )
        .groupBy("q_id")
        .agg(F.sum("t6").alias("dcg6"), F.sum("hit").cast("bigint").alias("hits"))
        .select(
            "q_id",
            "hits",
            (F.floor(F.col("dcg6") / 100.0 + 0.5) / 10000).alias("dcg"),
            (
                F.floor(F.col("dcg6") / F.lit(_IDCG6) * 10000 + 0.5) / 10000
            ).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# scan_bloom_skip — per-file Bloom file-skipping index: the point-lookup
# complement to scan_rowgroup_stats' min/max zone maps. Data is bucketed
# by a key UNCORRELATED with the lookup key (the case where zone maps
# prune nothing), a per-bucket Bloom bitmap over the lookup key is built
# relationally, and each probe scans ONLY the buckets whose bitmap
# matches — Iceberg/Delta/Parquet bloom-filter semantics, replayed
# exactly in SQL.

_BLOOM_BUCKETS = 16
_BLOOM_K = 4
# ~10 bits/key like any production bloom (and the r8 dedup admission
# gate): mbits = 32 * max(128, ceil(10n / (buckets*32))) — data-sized,
# so the false-positive prune holds at EVERY scale instead of
# saturating when the corpus outgrows a fixed bitmap.
_BLOOM_MBITS_SQL = (
    f"32 * greatest(128, CAST(floor((n * 10.0 + {_BLOOM_BUCKETS * 32 - 1})"
    f" / {_BLOOM_BUCKETS * 32}) AS BIGINT))"
)
# 3 present keys (orders keys are dense from 0) + 3 absent: absent keys
# measure the false-positive prune, present keys the no-false-negative
# guarantee.
_BLOOM_PROBES = (1, 2, 3, 900000007, 900000008, 900000009)


def _bloom_pos_sql(key: str, j: str) -> str:
    from terasort_spark.sources.tera_queries import mix32_sql

    return (
        f"CAST({mix32_sql(f'((({key}) % 134217728) * {_BLOOM_K} + ({j}))')} "
        f"% mbits AS BIGINT)"
    )


def _bloom_oracle() -> str:
    from terasort_spark.sources.tera_queries import mix32_sql

    probes = ", ".join(f"({p})" for p in _BLOOM_PROBES)
    in_list = ", ".join(str(p) for p in _BLOOM_PROBES)
    return f"""
WITH staged AS (
  SELECT o_orderkey AS k,
         CAST({mix32_sql("o_custkey % 2147483648")} % {_BLOOM_BUCKETS}
              AS BIGINT) AS bucket
  FROM orders
),
params AS (SELECT {_BLOOM_MBITS_SQL} AS mbits
           FROM (SELECT count(*) AS n FROM staged)),
js AS (SELECT unnest(range({_BLOOM_K})) AS j),
pos AS (
  SELECT bucket, {_bloom_pos_sql("k", "j")} AS pos FROM staged, js, params
),
words AS (
  SELECT bucket, pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM pos GROUP BY 1, 2
),
probes(p) AS (VALUES {probes}),
ppos AS (
  SELECT p, {_bloom_pos_sql("p", "j")} AS pos FROM probes, js, params
),
cand AS (
  SELECT q.p, w.bucket
  FROM ppos q
  JOIN words w
    ON w.word = q.pos // 32
   AND (w.bits & (CAST(1 AS BIGINT) << CAST(q.pos % 32 AS INTEGER))) != 0
  GROUP BY q.p, w.bucket
  HAVING count(*) = {_BLOOM_K}
)
SELECT CAST(pr.p AS BIGINT) AS probe_key,
       CAST(coalesce(c.n_cand, 0) AS BIGINT) AS n_candidates,
       CAST(coalesce(f.n, 0) AS BIGINT) AS n_found
FROM probes pr
LEFT JOIN (SELECT p, count(*) AS n_cand FROM cand GROUP BY p) c
       ON c.p = pr.p
LEFT JOIN (SELECT k, count(*) AS n FROM staged
           WHERE k IN ({in_list}) GROUP BY k) f
       ON f.k = pr.p
"""


@register("scan_bloom_skip", oracle=_bloom_oracle())
def scan_bloom_skip(spark, sf_dir):
    """Bloom file-skip index, end to end: stage orders hive-partitioned
    into {_BLOOM_BUCKETS} buckets by mix32(o_custkey) — deliberately
    UNCORRELATED with o_orderkey, so every bucket spans the full key
    range and min/max zone maps (scan_rowgroup_stats) cannot prune a
    key lookup at all. Build a data-sized per-bucket Bloom bitmap over
    o_orderkey (~10 bits/key, {_BLOOM_K} mix32 hashes, bitmap = groupBy
    bit_or of 32-bit words — pure relational, map-side combined), probe
    {len(_BLOOM_PROBES)} keys, and scan ONLY the bloom-qualified
    buckets per probe (partition filter on the bucket directory; an
    absent key touches the few false-positive buckets or no files).

    Emits per probe the candidate-bucket count (the prune, bit-exactly
    replayed by the oracle) and the rows found by the pruned scan
    (== the true count — Bloom's no-false-negative guarantee, enforced
    by the hash grade). Scale honesty: the bitmap NEVER rides through
    the driver — candidate qualification is a relational join of the
    {len(_BLOOM_PROBES)}x{_BLOOM_K} probe-position table against the
    words relation, and only the per-probe candidate lists (bounded by
    probes x buckets) are collected to parameterize the pruned scans,
    exactly how a planner consumes file-skip metadata. The bitmap
    scales at ~10 bits/key like Parquet/Iceberg bloom footers and
    lives with the data, so the false-positive rate (~1%) holds at
    100 TB instead of saturating a fixed-size filter."""
    from terasort_spark.sources.tera_queries import mix32

    out = scratch_dir(spark, "bloom_skip")
    shutil.rmtree(out, ignore_errors=True)
    staged = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (mix32(F.col("o_custkey") % F.lit(2147483648)) % _BLOOM_BUCKETS)
        .cast("bigint")
        .alias("bucket"),
    )
    staged.write.mode("overwrite").partitionBy("bucket").parquet(out)

    c = _BLOOM_BUCKETS * 32
    params = staged.agg(F.count(F.lit(1)).alias("n")).select(
        (
            32
            * F.greatest(
                F.lit(128),
                F.floor((F.col("n") * 10.0 + (c - 1)) / c).cast("bigint"),
            )
        ).alias("mbits")
    )

    def pos_col(key_col, j: int):
        return (
            mix32((key_col % 134217728) * _BLOOM_K + F.lit(j))
            % F.col("mbits")
        ).cast("bigint")

    expl = staged.crossJoin(F.broadcast(params)).select(
        "bucket",
        F.explode(
            F.array(*[pos_col(F.col("k"), j) for j in range(_BLOOM_K)])
        ).alias("pos"),
    )
    words = (
        expl.select(
            "bucket",
            F.expr("pos DIV 32").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("bucket", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    probes_df = spark.createDataFrame(
        [(p,) for p in _BLOOM_PROBES], "p bigint"
    )
    ppos = probes_df.crossJoin(F.broadcast(params)).select(
        "p",
        F.explode(
            F.array(*[pos_col(F.col("p"), j) for j in range(_BLOOM_K)])
        ).alias("pos"),
    )
    # bounded collect: per-probe candidate lists (<= probes x buckets
    # rows) — the bitmap itself stays distributed
    cand_rows = (
        F.broadcast(ppos)
        .join(
            words,
            (F.col("word") == F.expr("pos DIV 32"))
            & (
                F.expr(
                    "bits & shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
                )
                != 0
            ),
        )
        .groupBy("p", "bucket")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == _BLOOM_K)
        .select("p", "bucket")
        .collect()
    )
    cand: dict = {p: [] for p in _BLOOM_PROBES}
    for r in cand_rows:
        cand[r["p"]].append(r["bucket"])

    reread = spark.read.schema("k bigint, bucket bigint").parquet(out)
    branches = [
        reread.filter(
            F.col("bucket").isin(cand[p]) & (F.col("k") == p)
        ).select(F.lit(p).cast("bigint").alias("probe_key"))
        for p in _BLOOM_PROBES
        if cand[p]
    ]
    if branches:
        found = branches[0]
        for b in branches[1:]:
            found = found.unionAll(b)
        found = found.groupBy("probe_key").agg(
            F.count(F.lit(1)).alias("n_found")
        )
    else:
        found = spark.createDataFrame([], "probe_key bigint, n_found bigint")
    base = spark.createDataFrame(
        [(p, len(cand[p])) for p in _BLOOM_PROBES],
        "probe_key bigint, n_candidates bigint",
    )
    return (
        base.join(found, "probe_key", "left")
        .select(
            "probe_key",
            "n_candidates",
            F.coalesce(F.col("n_found"), F.lit(0)).cast("bigint").alias(
                "n_found"
            ),
        )
    )
