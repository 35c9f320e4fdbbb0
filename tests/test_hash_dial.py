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
    not _os.path.isdir(SF01), reason="sf0.01 corpus not present"
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
