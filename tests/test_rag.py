"""pipeline_rag_retrieval + win_gaps_islands invariants (oracle
equivalence runs in tests/test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators.rag import RAG_QUERIES, TOP_K
from terasort_spark.registry import queries

_Q = queries()


def test_rag_returns_topk_per_query_ordered(spark, sf_dir):
    rows = _Q["pipeline_rag_retrieval"](spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {qid for qid, _ in RAG_QUERIES}
    for qid, rs in per_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        for a, b in zip(rs, rs[1:]):
            assert a["cosine"] >= b["cosine"] - 1e-9
        for r in rs:
            assert 0.0 <= r["cosine"] <= 1.0 + 1e-9


def test_rag_chunk_ids_trace_back_to_documents(spark, sf_dir):
    rows = _Q["pipeline_rag_retrieval"](spark, sf_dir).collect()
    doc_ids = {
        r["doc_id"]
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id")
        .collect()
    }
    for r in rows:
        from terasort_spark.operators.rag import CHUNK_ID_STRIDE

        assert r["chunk_id"] // CHUNK_ID_STRIDE in doc_ids


def test_gaps_islands_matches_python_replay(spark, sf_dir):
    got = {r["user_id"]: r for r in _Q["win_gaps_islands"](spark, sf_dir).collect()}
    days = {}
    for r in (
        table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .distinct()
        .collect()
    ):
        days.setdefault(r["user_id"], set()).add(r["day"])
    assert set(got) == set(days)
    for uid, ds in days.items():
        ordered = sorted(ds)
        streaks, cur = [], 1
        for a, b in zip(ordered, ordered[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        r = got[uid]
        assert r["n_islands"] == len(streaks), uid
        assert r["longest_streak"] == max(streaks), uid
        assert r["active_days"] == len(ds), uid
