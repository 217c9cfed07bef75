#!/usr/bin/env python
"""R5-q same-window config control at n2/480k: shipped data-proportional
partitioning (initialPartitionNum=64) vs the R5-j-era static count
(initialPartitionNum=2, Spark's unset behavior of init = shuffle.partitions).

Motivation: R5-p's n2 median (809.6s) missed its pre-registered 560-640s
band and is 19% SLOWER than R5-j's n2 (673-679s) measured on the static
config weeks of noise-windows earlier. The per-stage pattern points at box
drift (zero-shuffle 01_extract slowed +29%, partition-sensitive 06_clusters
only +4%), but the only decisive test is both configs in ONE window,
interleaved. Order A B B A; each run is a fresh bench_worker subprocess.

Usage: python BENCH/r5q_control.py OUT.json
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAGES, MULT, ENTS, CPUS = 480000, 8, 5000, 2

CONFIGS = {
    "shipped_init64": {},
    "static_init2": {"SPARK_GRAFT_INITIAL_PARTITIONS": "2"},
}

# env keys that change engine partitioning/bench behavior: POPPED before each
# run so a leftover campaign export cannot silently turn the control into
# static-vs-static (each arm's config is fully determined by CONFIGS)
_CONFIG_KEYS = [
    "SPARK_GRAFT_INITIAL_PARTITIONS", "SPARK_GRAFT_PARALLELISM_FIRST",
    "SPARK_GRAFT_SHUFFLE_PARTITIONS", "SPARK_GRAFT_MAX_PARTITION_BYTES",
    "EL_BENCH_SHUFFLE_PARTITIONS", "EL_BENCH_WORKDIR",
]


def one_run(extra_env: dict, workdir_suffix: str) -> dict:
    cmd = [sys.executable, "-m", "e2e_el_spark.bench_worker",
           str(CPUS), str(PAGES), str(MULT), str(ENTS), "1"]
    env = dict(os.environ)
    for k in _CONFIG_KEYS:
        env.pop(k, None)
    # prepend (never clobber) PYTHONPATH; per-run workdir so a killed run's
    # stale /dev/shm state cannot contaminate the other arm
    env["PYTHONPATH"] = REPO + (os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["EL_BENCH_WORKDIR"] = f"/dev/shm/el_r5q_{workdir_suffix}"
    env.update(extra_env)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    m = re.search(r"RESULT (\{.*\})", proc.stdout)
    if proc.returncode != 0 or not m:
        return {"error": (proc.stderr or "no RESULT line")[-500:]}
    return json.loads(m.group(1))


def main() -> None:
    out_path = sys.argv[1]
    order = ["shipped_init64", "static_init2", "static_init2", "shipped_init64"]
    runs: dict[str, list[dict]] = {k: [] for k in CONFIGS}
    for i, name in enumerate(order):
        r = one_run(CONFIGS[name])
        runs[name].append(r)
        print(f"run {i + 1}/4 {name}: wall={r.get('best_wall_s')} "
              f"clusters={r.get('clusters')}", flush=True)
    blob = {
        "campaign": "R5-q", "cpus": CPUS, "pages": PAGES, "mult": MULT,
        "ents": ENTS, "order": order,
        "configs": {
            name: {
                "walls_s": [r.get("best_wall_s") for r in rs],
                "clusters": [r.get("clusters") for r in rs],
                "clusters_hash": [r.get("clusters_hash") for r in rs],
                "stage_walls_s": [r.get("stage_walls_s") for r in rs],
                "errors": [r.get("error") for r in rs if "error" in r],
            }
            for name, rs in runs.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
