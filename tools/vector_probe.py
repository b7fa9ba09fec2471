"""Stress the ANN family (IVF / PQ / IVF-PQ, exact fixed-point forms) at a
REAL vector scale: the clustered 128-d corpus from
`tools/make_sfx.py --vectors` (default 2M rows — 10x rows AND 2x dim over
the base testdata's 200k x 64-d ceiling), with a 200k twin of the same
recipe so growth is measured over a clean 10x data ratio.

Per index: end-to-end wall time (train + encode + search for the query
sample, via one collect) at both sizes, growth ratio, and recall@10
against the exact brute-force top-10 at 2M. Index parameters scale with
the corpus the way a deployment would scale them (n_centroids 16 -> 64
with nprobe/n_centroids held at 1/4; one 8-d subspace per 8 dims).

Rewrites the "## Vector-heavy ANN profile" section of SCALING.md
idempotently (the main table is scaling_probe.py's; this section is
orthogonal and survives its regeneration order).

    python tools/vector_probe.py [small_dir] [big_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/tmp/spark_graft_vec200k"
BIG = "/tmp/spark_graft_vec2m"
N_QUERIES = 8
K = 10
SECTION = "## Vector-heavy ANN profile"


def load(spark, path):
    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
    queries = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        .localCheckpoint()
    )
    corpus = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return queries, corpus


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else SMALL
    big = sys.argv[2] if len(sys.argv) > 2 else BIG
    from etl_lorettoscarpa_1asfb2jf21_spark.session import get_spark
    from etl_lorettoscarpa_1asfb2jf21_spark.operators.similarity import (
        bq_topk,
        brute_force_topk,
        ivf_topk_quantized,
        ivfbq_topk,
        ivfpq_topk_quantized,
        pq_topk_quantized,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("vector-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    dim = 128
    ops = {
        "exact (brute force)": lambda q, c: brute_force_topk(
            q, c, k=K, use_arrow=True
        ),
        "ivf (nc=64, nprobe=16)": lambda q, c: ivf_topk_quantized(
            q, c, k=K, n_centroids=64, nprobe=16
        ),
        # Search-quality knobs scale with the corpus the way a FAISS
        # deployment scales them: 64 codes/subspace (a 256-code run
        # measured recall@10 0.36/0.44 vs 0.35/0.47 — codebook size is
        # NOT the recall bottleneck on this corpus) and the re-rank
        # shortlist as the lever that is. shortlist=None is the SHIPPED
        # default — the corpus-derived depth max(1000, ceil(n/200))
        # (operators.similarity.derived_shortlist): 1000 at 200k, 10000
        # at 2M; the fixed-sl500 rows stay as the round-5 contrast
        # points that motivated the derivation (recall 0.35/0.47).
        "pq (16x8-d, 64 codes, sl500)": lambda q, c: pq_topk_quantized(
            q, c, k=K, n_subspaces=16, n_codes=64, shortlist=500, dim=dim
        ),
        "pq (16x8-d, 64 codes, derived sl)": lambda q, c: pq_topk_quantized(
            q, c, k=K, n_subspaces=16, n_codes=64, shortlist=None, dim=dim
        ),
        "ivfpq (nc=64/np=16, 16x64, sl500)": lambda q, c: ivfpq_topk_quantized(
            q, c, k=K, n_centroids=64, nprobe=16, n_subspaces=16,
            n_codes=64, shortlist=500, dim=dim,
        ),
        "ivfpq (nc=64/np=16, 16x64, derived sl)": lambda q, c: ivfpq_topk_quantized(
            q, c, k=K, n_centroids=64, nprobe=16, n_subspaces=16,
            n_codes=64, shortlist=None, dim=dim,
        ),
        "bq (1-bit, derived sl)": lambda q, c: bq_topk(
            q, c, k=K, dim=dim, shortlist=None
        ),
        "ivfbq (nc=64/np=16, 1-bit, derived sl)": lambda q, c: ivfbq_topk(
            q, c, k=K, n_centroids=64, nprobe=16, dim=dim, shortlist=None
        ),
    }

    qs, cs = load(spark, small)
    qb, cb = load(spark, big)
    n_small = cs.count()
    n_big = cb.count()

    # warm: one full pass at the small size (JVM + codegen + Arrow workers)
    for fn in ops.values():
        fn(qs, cs).collect()

    results = {}  # name -> (t_small, t_big, rows_big)
    for name, fn in ops.items():
        t0 = time.perf_counter()
        fn(qs, cs).collect()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = fn(qb, cb).collect()
        t_big = time.perf_counter() - t0
        results[name] = (t_small, t_big, rows)
        print(f"{name}: {t_small:.1f}s @ {n_small}, {t_big:.1f}s @ {n_big}")

    exact_ids = {
        (r["q_id"], r["c_id"]) for r in results["exact (brute force)"][2]
    }
    recalls = {}
    for name, (_, _, rows) in results.items():
        if name.startswith("exact"):
            continue
        hits = sum((r["q_id"], r["c_id"]) in exact_ids for r in rows)
        recalls[name] = hits / (N_QUERIES * K)
        print(f"recall@{K} {name}: {recalls[name]:.2f}")

    ratio = n_big / n_small
    lines = [
        SECTION,
        "",
        "Generated by `tools/vector_probe.py` on the clustered profile from",
        f"`tools/make_sfx.py --vectors` ({n_big:,} x {dim}-d, 256-cluster",
        f"mixture, L2-normalized float32) and its {n_small:,}-row twin of the",
        "same recipe — wall time is the FULL pipeline (train + encode +",
        f"search, {N_QUERIES} queries, k={K}) per run, warm JVM. Index",
        "parameters follow the corpus (nprobe/n_centroids held at 1/4;",
        "8 dims per PQ subspace; 'derived sl' = the shipped default",
        "re-rank depth max(1000, ceil(n/200)) — 1k at 200k rows, 10k at",
        "2M; sl500 rows are the fixed-depth contrast points). Recall@10",
        "is against the exact brute-force top-10 on the SAME run's",
        "output.",
        "",
        f"| pipeline | {n_small // 1000}k x {dim}d (s) | "
        f"{n_big // 1_000_000}M x {dim}d (s) | growth ({ratio:.0f}x data) | "
        f"recall@{K} |",
        "|---|---|---|---|---|",
    ]
    for name, (t_s, t_b, _) in results.items():
        rc = "1.00 (def)" if name.startswith("exact") else f"{recalls[name]:.2f}"
        lines.append(
            f"| {name} | {t_s:.1f} | {t_b:.1f} | {t_b / t_s:.1f}x | {rc} |"
        )
    lines += [
        "",
        "Reading: growth at/under the data ratio on 10x rows means training",
        "+ encode stay map/partial-agg passes (no per-row joins snuck in);",
        "the ADC scan term is additionally divided by nprobe/n_centroids.",
        "Exact search is the linear-scan yardstick the indexes exist to",
        "beat at this recall; its own growth is the pure data term.",
        "Wall times here charge the FULL pipeline — train + encode + one",
        f"{N_QUERIES}-query search — to a single batch, so index rows can",
        "read slower than the exact scan at this size: a deployment builds",
        "the index once and amortizes it over every query batch, paying",
        "only the search term (the sl500-vs-derived deltas isolate that",
        "term), while the exact scan pays its full cost on every batch.",
    ]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.md")
    text = open(path, encoding="utf-8").read() if os.path.exists(path) else ""
    if SECTION in text:
        text = text[: text.index(SECTION)].rstrip() + "\n"
    with open(path, "w", encoding="utf-8") as f:
        f.write(text.rstrip() + "\n\n" + "\n".join(lines) + "\n")
    print(f"wrote {SECTION!r} section to {path}")


if __name__ == "__main__":
    main()
