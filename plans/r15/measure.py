#!/usr/bin/env python
"""Round-14 measurement harness: time named queries at sf0.1 the way
bench.py does (count() after warmup, min-of-N, checkpoint sweep + GC
between reps) and optionally dump .explain("formatted") to
plans/r15/<q>_<tag>.txt.

Usage: python plans/r15/measure.py [--reps N] [--explain TAG] q1 q2 ...
       python plans/r15/measure.py --explain before dedup_lsh_quality_audit
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.queries import queries  # noqa: E402
from ingest_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dump plan with tag")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--noop", action="store_true",
                    help="time the noop sink instead of count()")
    args = ap.parse_args()

    spark = get_spark("r15-measure")
    fns = queries()
    # session warmup mirroring bench.py
    fns["q1_pricing_summary"](spark, args.sf).count()
    warm_sf = "/root/testdata/sf0.001"
    for warm_q in ("similarity_topk", "embedding_near_dup",
                   "graph_modularity_brand", "sample_kcenter_coreset"):
        if warm_q in fns and os.path.isdir(warm_sf):
            fns[warm_q](spark, warm_sf).count()

    def sweep() -> None:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    sweep()
    for name in args.names:
        if name not in fns:
            print(f"!! unknown query {name}")
            continue
        if args.explain:
            df = fns[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            out = os.path.join(REPO, "plans", "r15",
                               f"{name}_{args.explain}.txt")
            with open(out, "w") as f:
                f.write(plan)
            print(f"plan -> {out} ({len(plan)} chars)")
            sweep()
        times = []
        if args.reps <= 0:
            continue
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r15:{name}")
            t0 = time.perf_counter()
            df = fns[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            sweep()
            spark.sparkContext._jvm.System.gc()
        print("%-40s min=%.3f  runs=%s" % (
            name, min(times), " ".join("%.3f" % t for t in times)))


if __name__ == "__main__":
    main()
