#!/usr/bin/env python
"""Round-6 optimization harness (guide §1.4): per-query noop-sink timing +
``explain("formatted")`` capture, SEPARATE from the frozen driver bench.

Usage:
  python bench_extra.py time [q16 q30 ...]   # reps via EL_EXTRA_REPS (def 3)
  python bench_extra.py plans BEFORE|AFTER [q16 ...]  # dump plans/r06/<q>_<tag>.txt

Times the identical methodology bench.py uses (noop sink, warm session,
median of interleaved passes) so numbers are comparable, but never touches
bench.py. Plans go to plans/r06/ for the judge.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q01_pricing_summary",
    "q02_orders_by_segment",
    "q03_brand_revenue_broadcast",
    "q07_topk_per_group",
    "q12_running_revenue",
    "q16_char_ngram_counts",
    "q17_tfidf_vocab",
    "q18_langid",
    "q20_token_budget_audit",
    "q23_brute_force_ann",
    "q26_doc_segmentation",
    "q30_minhash_near_dups",
]


def _session():
    from e2e_el_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        app_name="el_bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=min(cpus, 32),
    )


def _resolve(names):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if not names:
        return {n: qs[n] for n in HEADLINE}
    out = {}
    for n in names:
        full = [k for k in qs if k == n or k.startswith(n + "_") or k.startswith(n)]
        if not full:
            raise SystemExit(f"unknown query {n}")
        out[full[0]] = qs[full[0]]
    return out


def cmd_time(names):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("EL_EXTRA_REPS", "3"))
    spark = _session()
    qs = _resolve(names)
    # warm scans + JIT like bench.py does
    import __spark_entry__ as entrymod

    entrymod.queries()["q01_pricing_summary"](spark, sf_dir).count()
    samples = {n: [] for n in qs}
    for _ in range(reps):
        for n, fn in qs.items():
            spark.sparkContext.setJobDescription(n)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    med = {n: round(statistics.median(ts), 2) for n, ts in samples.items()}
    print("SAMPLES " + json.dumps(samples))
    print(json.dumps({"total": round(sum(med.values()), 2), "queries": med}))
    spark.stop()


def cmd_plans(tag, names):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = _session()
    for n, fn in _resolve(names).items():
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{n}_{tag.lower()}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in ("time", "plans"):
        raise SystemExit(__doc__)
    if sys.argv[1] == "time":
        cmd_time(sys.argv[2:])
    else:
        cmd_plans(sys.argv[2], sys.argv[3:])
