"""run_el_job.py: the spark-submit entry point over REAL parquet inputs
(the production path — synthetic mode is covered by bench/e2e tests)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_real_parquet_inputs(spark, tmp_path):
    from e2e_el_spark.synth import aliases_df, entities_df, pages_df

    pages_p = str(tmp_path / "pages")
    ents_p = str(tmp_path / "ents")
    gaz_p = str(tmp_path / "gaz")
    pages_df(spark, 60, n_entities=40, seed=13, partitions=4).write.parquet(pages_p)
    entities_df(spark, 40, seed=13).write.parquet(ents_p)
    aliases_df(spark, 40, seed=13).write.parquet(gaz_p)

    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_SHUFFLE_PARTITIONS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_el_job.py"),
         "--pages", pages_p, "--entities", ents_p, "--gazetteer", gaz_p,
         "--workdir", str(tmp_path / "wd"), "--rerank-topk", "3"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["mentions_clustered"] > 0
    assert 0 < out["clusters"] <= out["mentions_clustered"]
    # stage checkpoints exist under the workdir (resumable layout)
    assert os.path.exists(str(tmp_path / "wd" / "06_clusters" / "_STAGE_COMPLETE"))
