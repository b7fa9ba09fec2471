"""Dump formatted plans for operator-level builds that the catalog hides
behind localCheckpoint barriers (the catalog plan shows ExistingRDD).

    python tools/plan_explain_ops.py <out_dir> <suffix>

Covers the pairwise dedup pipelines whose physical shape is the round-12
optimization evidence: ngram_jaccard_pairs (rare-first prefixes + PPJoin
positional filter) built with checkpoint=False.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from etl_lorettoscarpa_1asfb2jf21_spark.session import get_spark
    from etl_lorettoscarpa_1asfb2jf21_spark.sources.tables import load_table
    from etl_lorettoscarpa_1asfb2jf21_spark.operators.dedup import ngram_jaccard_pairs

    spark = get_spark("plan-explain-ops", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    # auto (what the catalog runs at this SF) AND the forced prefix branch:
    # auto picks the block plan at gate scale, so the prefix/PPJoin claim
    # needs its own dump (round-12 verdict #3)
    for strat, stem in (
        ("auto", "x1_ngram_jaccard_operator"),
        ("prefix", "x1_ngram_jaccard_prefix_operator"),
    ):
        pairs = ngram_jaccard_pairs(
            d, "text", "doc_id", "source", n=3, threshold=0.2,
            strategy=strat, checkpoint=False,
        )
        qe = pairs._jdf.queryExecution()
        plan = pairs._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
        path = os.path.join(out_dir, f"{stem}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
