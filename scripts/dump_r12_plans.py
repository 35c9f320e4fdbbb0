"""Dump .explain("formatted") output for the round-12 optimization
targets into plans/r12/<query>_<tag>.txt (tag = before|after).

Usage:  python scripts/dump_r12_plans.py before [query ...]
Streaming queries whose returned DataFrame is a memory-sink readback
(the plan of the SINK, not the streaming job) are annotated as such —
for those the interesting evidence is the operator code + bench time,
and the dump records the final-fold plan that IS assertable.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terasort_spark.plans.checks import formatted_plan  # noqa: E402
from terasort_spark.registry import queries  # noqa: E402
from terasort_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Queries whose cost is streaming machinery: the returned DataFrame is a
# readback of a memory sink, so explain() shows only the final fold.
STREAMING = {
    "stream_transformwithstate",
    "stream_tws_liststate",
    "stream_tws_mapstate",
    "stream_tws_timer",
    "stream_source_pyds",
    "stream_source_pyds_dist",
    "dedup_stream_lsh",
}

DEFAULT_TARGETS = [
    "dedup_cluster",
    "dedup_cluster_keepbest",
    "graph_pagerank",
    "graph_cc_star",
    "graph_bfs_levels",
    "graph_kcore",
    "dedup_minhash",
    "dedup_semantic",
    "dedup_fuzzy_ingest",
    "text_ccnet_bucket",
    "sim_cosine_ivfpq",
    "sim_cosine_pq",
    "source_avro",
    "sim_join_autoplan",
    "text_minhash_containment",
    "text_bigram_lm",
    "text_kneser_ney",
    "emb_kmeans",
    "text_novelty",
    "text_boilerplate",
    "agg_kmv_theta",
    "sim_source_minhash",
    "ml_logreg",
    "agg_ams_f2",
    "scan_vacuum",
    "events_rfm",
    "source_protobuf",
    "text_contamination",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_TARGETS
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r12-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-dump: {name}")
        try:
            df = qs[name](spark, SF)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc!r}"
        header = ""
        if name in STREAMING:
            header = (
                "# NOTE: streaming query — the operator runs a Structured\n"
                "# Streaming job; the plan below is the final batch fold\n"
                "# over the sink, which is all explain() can show.\n"
            )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(header + plan + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
