"""Profile named catalog queries: run each with the noop sink and dump the
per-stage wall/metrics breakdown from the local Spark UI REST API.

    python tools/profile_query.py <query> [<query> ...]

$SPARK_GRAFT_SF_DIR (default sf0.1) and $SPARK_GRAFT_CPUS (default 32) as in
bench.py. Prints, per query: total wall, then each stage's submit-relative
start, duration, task count, shuffle read/write and input bytes, plus the
stage name prefix — enough to tell driver gaps (time between stages) from
executor time, and shuffle-bound from compute-bound stages.
"""

from __future__ import annotations

import json
import os
import sys
import calendar
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from etl_lorettoscarpa_1asfb2jf21_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        "profile",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    qs = entrymod.queries()
    # warm exactly as bench.py does: parquet footers + python worker pool
    next(iter(qs.values()))(spark, sf_dir).limit(1).collect()
    from pyspark.sql import functions as F
    from etl_lorettoscarpa_1asfb2jf21_spark.functions.vectors import cosine_batch_udf

    cos = cosine_batch_udf()
    spark.range(0, 10_000, 1, int(cpus)).select(
        cos(F.array(F.lit(1.0)), F.array(F.lit(1.0)))
    ).write.format("noop").mode("overwrite").save()

    import gc

    def stages() -> list:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
            return json.load(r)

    for name in names:
        before_ids = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        # bench.py discipline: drop blocks the query pinned so the NEXT
        # profiled query isn't taxed by this one's storage/GC churn
        spark.catalog.clearCache()
        gc.collect()

        new = [s for s in stages() if s["stageId"] not in before_ids]
        new.sort(key=lambda s: s["firstTaskLaunchedTime"])
        print(f"\n=== {name}: wall {wall:.2f}s (plan-build {t_build:.2f}s), {len(new)} stages")
        base = None
        prev_end = None
        for s in new:
            st = calendar.timegm(time.strptime(s["firstTaskLaunchedTime"][:19], "%Y-%m-%dT%H:%M:%S")) + float(s["firstTaskLaunchedTime"][20:23] or 0) / 1000
            en = calendar.timegm(time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")) + float(s["completionTime"][20:23] or 0) / 1000
            if base is None:
                base = st
            gap = "" if prev_end is None else f" gap {st - prev_end:+.2f}s"
            prev_end = en
            nm = s["name"].split("\n")[0][:70]
            print(
                f"  +{st - base:7.2f}s dur {en - st:6.2f}s tasks {s['numCompleteTasks']:4d} "
                f"in {s['inputBytes'] >> 20:5d}M sr {s['shuffleReadBytes'] >> 20:5d}M "
                f"sw {s['shuffleWriteBytes'] >> 20:5d}M{gap}  {nm}"
            )


if __name__ == "__main__":
    main()
