"""Round-12 wave (session 2, batch 4): binary ANN, MAD anomalies,
volume tripwire, Bloom-gated ingest."""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import queries

_Q = queries()


# ---------------------------------------------------------------------------
# sim_cosine_binary


def test_binary_codes_match_reference_hamming(spark, sf_dir):
    """Top-5 Hamming ranking must equal a pure-python recomputation of
    the sign codes for one query."""
    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in table(spark, sf_dir, "embeddings").collect()
    }

    def code(v):
        return sum(1 << i for i, x in enumerate(v) if x > 0)

    rows = _Q["sim_cosine_binary"](spark, sf_dir).collect()
    q_id = min(r["q_id"] for r in rows)
    qc = code(emb[q_id])
    ham = {
        cid: bin(qc ^ code(v)).count("1")
        for cid, v in emb.items()
        if cid >= 10
    }
    want = sorted(ham.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    got = sorted(
        ((r["c_id"], r["hamming"]) for r in rows if r["q_id"] == q_id),
        key=lambda kv: (kv[1], kv[0]),
    )
    assert got == want


# ---------------------------------------------------------------------------
# ts_anomaly_mad


def test_mad_flags_are_genuine_outliers(spark, sf_dir):
    """Every flagged event must deviate from its user's median by more
    than 3.5x the user's MAD, both recomputed sequentially."""
    import statistics

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id") % 5 == 0)
        .select("user_id", "event_id", "value")
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["value"])
    flagged = _Q["ts_anomaly_mad"](spark, sf_dir).collect()
    for r in flagged:
        vs = by_user[r["user_id"]]
        med = statistics.median(vs)
        mad = statistics.median(abs(v - med) for v in vs)
        assert mad > 0
        assert abs(r["value_r"] - (med + (r["value_r"] - med))) >= 0  # sanity
        assert r["abs_dev"] > 3.5 * mad * 0.999  # rounding slack


# ---------------------------------------------------------------------------
# dq_volume_anomaly


def test_volume_anomaly_window_math(spark, sf_dir):
    rows = sorted(
        _Q["dq_volume_anomaly"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows, "needs more than 7 distinct days of events"
    daily = dict(
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .count()
        .collect()
    )
    days = sorted(daily)
    for r in rows:
        i = days.index(r["day"])
        assert i >= 7  # full trailing history required
        trail = [daily[d] for d in days[i - 7 : i]]
        mean = sum(trail) / 7.0
        import math

        assert abs(r["trail_mean"] - math.floor(mean * 10000 + 0.5) / 10000) < 1e-9


# ---------------------------------------------------------------------------
# dedup_bloom_ingest


def test_bloom_ingest_never_admits_true_duplicates(spark, sf_dir):
    """A batch doc whose exact text exists in the standing corpus must
    NEVER be admitted (Bloom filters have no false negatives); unseen
    docs are admitted unless a (deterministic) false positive drops
    them."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower("text")).alias("h")
    )
    standing = {
        r["h"] for r in d.where(F.col("doc_id") < 300).collect()
    }
    batch = {r["doc_id"]: r["h"] for r in d.where(F.col("doc_id") >= 300).collect()}
    admitted = {
        r["doc_id"]: r["admitted"]
        for r in _Q["dedup_bloom_ingest"](spark, sf_dir).collect()
    }
    assert set(admitted) == set(batch)
    n_dup = n_admitted = 0
    for doc_id, h in batch.items():
        if h in standing:
            assert not admitted[doc_id], f"true duplicate {doc_id} admitted"
            n_dup += 1
        n_admitted += bool(admitted[doc_id])
    assert n_admitted > 0, "gate admitted nothing — filter saturated"
