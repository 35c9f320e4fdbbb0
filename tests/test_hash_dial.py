"""The token-hash dial (r6 VERDICT task 4): sketch/LSH operators run
with md5 token hashes by default (DuckDB-replayable — the exact-oracle
grading mode) and can be switched to xxhash64 for the 100 TB
scan-bound production path via spark.terasort_spark.tokenHash. These
tests pin what the dial does and does not change:

- agg_heavyhitters: the count-min structure absorbs the hash swap
  completely on this corpus — top-20 tokens AND estimates identical.
- dedup_minhash: individual keep/drop decisions MAY flip (capped LSH
  candidate neighborhoods are a function of the hash), but the output
  contract holds in both modes: one row per doc, same schema, and
  every DROP is admissible — the dropped doc really has a smaller-id
  partner at exact Jaccard >= 0.8 (no hash choice can fabricate a
  duplicate). Agreement between modes stays high.
"""

from __future__ import annotations

import contextlib

import pytest

from terasort_spark.operators._util import TOKEN_HASH_CONF
from terasort_spark.registry import queries

_Q = queries()
# the dial-identity check runs at the GRADED scale (sf0.01) rather than
# the suite's default sf0.001; derive it from the same root the conftest
# fixture uses so a relocated corpus redirects this test too
import os as _os

SF01 = _os.path.join(
    _os.path.dirname(_os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")),
    "sf0.01",
)


@contextlib.contextmanager
def hash_mode(spark, mode):
    try:
        spark.conf.set(TOKEN_HASH_CONF, mode)
        yield
    finally:
        spark.conf.unset(TOKEN_HASH_CONF)


def test_invalid_hash_mode_raises(spark, sf_dir):
    with hash_mode(spark, "murmur3"):
        with pytest.raises(Exception, match="md5|xxhash64"):
            _Q["agg_heavyhitters"](spark, sf_dir).collect()


@pytest.mark.skipif(
    not _os.path.isdir(SF01),
    reason=f"expected corpus dir {SF01} not present — this check needs the "
    "driver-generated sf0.01 testdata next to the suite's sf0.001 dir",
)
def test_heavyhitters_dial_identical_output_at_sf001(spark):
    """At the graded scale the count-min estimates resolve to the same
    top-20 (the 1024-wide sketch has enough room that neither hash's
    collisions perturb the heavy hitters) — the dial is free accuracy-
    wise and ~2.4x cheaper scan-side (BASELINE.md)."""
    md5_rows = sorted(map(tuple, _Q["agg_heavyhitters"](spark, SF01).collect()))
    with hash_mode(spark, "xxhash64"):
        xx_rows = sorted(
            map(tuple, _Q["agg_heavyhitters"](spark, SF01).collect())
        )
    assert md5_rows == xx_rows


def test_minhash_dial_structural_contract_both_modes(spark, sf_dir):
    """Both hash modes keep the dedup contract: one decision per doc,
    identical schema, every dropped doc has a verified smaller-id
    near-duplicate at exact Jaccard >= 0.8, and the two modes agree on
    the vast majority of documents."""

    from terasort_spark.catalog import table

    def decisions():
        df = _Q["dedup_minhash"](spark, sf_dir)
        assert [f.name for f in df.schema.fields] == ["doc_id", "keep"]
        return {r["doc_id"]: r["keep"] for r in df.collect()}

    md5_dec = decisions()
    with hash_mode(spark, "xxhash64"):
        xx_dec = decisions()

    # mirror the operator's tokenization exactly: split on single
    # spaces (empties preserved), distinct via set()
    docs = {
        r["doc_id"]: set((r["text"] or "").lower().split(" "))
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert set(md5_dec) == set(xx_dec) == set(docs)  # one row per doc

    def admissible(dec):
        ids = sorted(docs)
        for d, keep in dec.items():
            if keep:
                continue
            toks = docs[d]
            # the operator verifies on the 4dp-rounded Jaccard, so
            # accept anything that rounds to >= 0.8
            ok = any(
                len(toks & docs[a]) / len(toks | docs[a]) >= 0.79995
                for a in ids
                if a < d and (toks or docs[a])
            )
            assert ok, f"doc {d} dropped without a qualifying partner"

    admissible(md5_dec)
    admissible(xx_dec)

    agree = sum(md5_dec[k] == xx_dec[k] for k in md5_dec) / len(md5_dec)
    assert agree >= 0.85, f"mode agreement {agree:.2f}"


def _rows(spark, name, sf_dir):
    df = _Q[name](spark, sf_dir)
    return [f.name for f in df.schema.fields], df.collect()


def test_feature_hash_dial_preserves_mass(spark, sf_dir):
    """r7 VERDICT task 4: the hashing-trick featurizer under both
    modes. Bucket ASSIGNMENT moves with the hash, but token mass is
    conserved: per-lang sum(n_tokens) and sum(n_distinct) are exact
    invariants (every token / distinct token lands in exactly one
    bucket in each mode), and features stay in [0, 64)."""
    from collections import defaultdict

    def mass():
        cols, rows = _rows(spark, "ml_feature_hash", sf_dir)
        assert cols == ["lang", "feature", "n_tokens", "n_distinct"]
        per_lang = defaultdict(lambda: [0, 0])
        for r in rows:
            assert 0 <= r["feature"] < 64
            per_lang[r["lang"]][0] += r["n_tokens"]
            per_lang[r["lang"]][1] += r["n_distinct"]
        return dict(per_lang)

    md5_mass = mass()
    with hash_mode(spark, "xxhash64"):
        xx_mass = mass()
    assert md5_mass == xx_mass


def test_simhash_dial_exact_dups_collapse_both_modes(spark, sf_dir):
    """Exact-duplicate texts (same token set) must land on ONE simhash
    fingerprint in either mode — the dedup decision no hash choice may
    break — and the 16-bit range holds in both."""
    from collections import defaultdict

    from terasort_spark.catalog import table

    texts = {
        r["doc_id"]: frozenset((r["text"] or "").lower().split(" "))
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def fps():
        cols, rows = _rows(spark, "dedup_simhash", sf_dir)
        assert cols == ["doc_id", "simhash16"]
        out = {r["doc_id"]: r["simhash16"] for r in rows}
        assert all(0 <= v < (1 << 16) for v in out.values())
        return out

    for mode in ("md5", "xxhash64"):
        ctx = hash_mode(spark, mode) if mode == "xxhash64" else None
        if ctx:
            with ctx:
                fp = fps()
        else:
            fp = fps()
        groups = defaultdict(set)
        for d, toks in texts.items():
            groups[toks].add(fp[d])
        for toks, vals in groups.items():
            assert len(vals) == 1, f"same token set, {len(vals)} fingerprints"


def test_dsir_dial_token_counts_invariant(spark, sf_dir):
    """DSIR weights: per-doc n_toks is bucket-independent, so it must
    be bit-identical across modes; logweight moves with the bucketing
    but stays finite and schema-stable."""
    import math

    def res():
        cols, rows = _rows(spark, "text_dsir_weights", sf_dir)
        assert cols == ["doc_id", "n_toks", "logweight"]
        assert all(math.isfinite(r["logweight"]) for r in rows)
        return {r["doc_id"]: (r["n_toks"], r["logweight"]) for r in rows}

    md5_r = res()
    with hash_mode(spark, "xxhash64"):
        xx_r = res()
    assert set(md5_r) == set(xx_r)
    assert {k: v[0] for k, v in md5_r.items()} == {
        k: v[0] for k, v in xx_r.items()
    }


def test_fingerprint_dial_same_doc_partition(spark, sf_dir):
    """text_fingerprint: the content fingerprint exists to PARTITION
    documents by canonical content — both modes must induce the
    identical partition (collision-free on this corpus), with the same
    string schema."""
    def partition():
        cols, rows = _rows(spark, "text_fingerprint", sf_dir)
        assert cols == ["doc_id", "content_fp", "prefix_fp"]
        by_fp = {}
        for r in rows:
            by_fp.setdefault(r["content_fp"], set()).add(r["doc_id"])
        return sorted(map(frozenset, by_fp.values()), key=sorted)

    md5_p = partition()
    with hash_mode(spark, "xxhash64"):
        xx_p = partition()
    assert md5_p == xx_p


def test_winnowing_dial_identical_docs_identical_fps(spark, sf_dir):
    """Winnowing under both modes: docs with identical token sequences
    select identical fingerprint sets (same n_fp, same fp_min), the
    schema is stable, and n_fp stays within the guarantee bounds
    (1 <= n_fp <= number of full windows)."""
    from collections import defaultdict

    from terasort_spark.catalog import table

    seqs = {
        r["doc_id"]: tuple((r["text"] or "").lower().split(" "))
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def check():
        cols, rows = _rows(spark, "text_winnowing", sf_dir)
        assert cols == ["doc_id", "n_fp", "fp_min"]
        out = {r["doc_id"]: (r["n_fp"], r["fp_min"]) for r in rows}
        groups = defaultdict(set)
        for d, res in out.items():
            assert res[0] >= 1 and isinstance(res[1], str)
            groups[seqs[d]].add(res)
        for seq, vals in groups.items():
            assert len(vals) == 1, "same token sequence, different fingerprints"
        return out

    md5_out = check()
    with hash_mode(spark, "xxhash64"):
        xx_out = check()
    assert set(md5_out) == set(xx_out)  # same docs qualify in both modes


def test_oracle_grading_refuses_non_default_dial(spark, sf_dir):
    """The graded path is md5-only: a session left on the xxhash64
    production dial must be rejected with a self-explaining error, not
    surface as a cryptic value-hash mismatch on the fingerprint-family
    operators (r8 ADVICE item 2)."""
    from terasort_spark.compare import compare_query
    from terasort_spark.registry import oracle_sql

    os_ = oracle_sql()
    with hash_mode(spark, "xxhash64"):
        r = compare_query(
            "text_fingerprint",
            _Q["text_fingerprint"],
            os_["text_fingerprint"],
            spark,
            sf_dir,
        )
    assert not r.ok
    assert any("md5" in e and "dial" in e for e in r.errors)
    # and the default session still grades clean
    r2 = compare_query(
        "text_fingerprint",
        _Q["text_fingerprint"],
        os_["text_fingerprint"],
        spark,
        sf_dir,
    )
    assert r2.ok, str(r2)
