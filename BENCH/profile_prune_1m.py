"""R5-g evidence: in-process ABBA A/B of the shuffled-KB gram prune at a
1M-entity dictionary (the R5-f bottleneck cell: 03_pairs was 81% of wall).

One KB build serves every arm (candidate_pairs takes kb= frames directly);
arms alternate prune on/off in ABBA order on a warm JVM so the comparison
is free of cold-start and KB-build noise. Prints one JSON line per arm and
a final SUMMARY line.

Usage: python BENCH/profile_prune_1m.py [N_ENTITIES] [N_SURFACES]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from dataclasses import replace

from pyspark.sql import functions as F

from e2e_el_spark.session import get_spark
from e2e_el_spark.synth import aliases_df, entities_df
from e2e_el_spark.pipeline import (
    PipelineConfig,
    build_kb_artifacts,
    candidate_pairs,
    kb_content_fingerprint,
)


def main() -> None:
    n_ents = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_surf = int(sys.argv[2]) if len(sys.argv) > 2 else 15_000
    spark = get_spark(app_name="profile_prune", master="local[8]",
                      shuffle_partitions=8)
    cfg = PipelineConfig()
    ents = entities_df(spark, n_ents, seed=1)
    kb_dir = "/dev/shm/el_prof_kb"
    shutil.rmtree(kb_dir, ignore_errors=True)
    t0 = time.time()
    frames = build_kb_artifacts(
        spark, ents, cfg, kb_dir, kb_fingerprint=kb_content_fingerprint(ents)
    )
    print(json.dumps({"kb_build_s": round(time.time() - t0, 1),
                      "entities": n_ents}), flush=True)

    # deterministic surface sample from the alias table: every surface has
    # real candidates (the worst case for the pairs stage)
    surfaces = (
        aliases_df(spark, n_ents, seed=1)
        .select(F.col("alias").alias("text")).distinct()
        .orderBy(F.xxhash64("text")).limit(n_surf).cache()
    )
    surfaces.count()

    def arm(prune: bool, n: int) -> float:
        c = replace(cfg, prune_kb_grams=prune)
        m = surfaces.limit(n)
        t = time.time()
        rows = candidate_pairs(m, ents, c, kb=frames, n_entities=n_ents).count()
        w = time.time() - t
        spark.catalog.clearCache()
        print(json.dumps({"prune": prune, "surfaces": n, "pairs": rows,
                          "wall_s": round(w, 1)}), flush=True)
        return w

    arm(True, 2000)   # warmup, not reported
    walls = {True: [], False: []}
    for p in (True, False, False, True):  # ABBA
        walls[p].append(arm(p, n_surf))
    on = min(walls[True]); off = min(walls[False])
    print("SUMMARY " + json.dumps({
        "entities": n_ents, "surfaces": n_surf,
        "prune_on_best_s": round(on, 1), "prune_off_best_s": round(off, 1),
        "speedup": round(off / on, 2),
        "on_walls": [round(w, 1) for w in walls[True]],
        "off_walls": [round(w, 1) for w in walls[False]],
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
