"""Per-Spark-job timing of one index build (fixed-overhead diagnosis).

Enables the UI REST API, runs the standard bench build at a pinned core
count, then dumps every job's duration + description — the direct view
of where the size-independent seconds go.

Usage: taskset -c 0-(n-1) python tools/profile_jobs.py <cores> <turns>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from pyspark.sql import SparkSession

    from konlspark import build, corpus
    from konlspark.session import _local_dir, _repo_root

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("profile-jobs")
        .config("spark.sql.shuffle.partitions", str(3 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # mirror session.py's r9 settings + bench_scaling's per-core
        # driver memory so job profiles reflect the bench environment
        # (the 1g default GC-thrashes at 4M turns)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "256k")
        .config("spark.sql.files.minPartitionNum", str(cores))
        .config("spark.sql.files.openCostInBytes", str(64 * 1024))
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", f"{max(4, (cores * 3) // 2)}g"))
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.local.dir", _local_dir())
        .config("spark.executorEnv.PYTHONPATH", _repo_root())
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    tdf = corpus.spark_make_transcripts(
        spark, turns, turns_per_conv=20, seed=42,
        min_words=3, max_words=60, num_partitions=max(8, cores)).cache()
    tdf.count()
    root = f"/tmp/konlspark_profjobs_{os.getpid()}"
    warm = corpus.spark_transcripts(spark, corpus.make_transcripts(5000, seed=1))
    build.build_index(spark, warm, root + "_warm")
    shutil.rmtree(root + "_warm", ignore_errors=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs_before = json.loads(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs").read())
    max_before = max((j["jobId"] for j in jobs_before), default=-1)

    manifest = build.build_index(spark, tdf, root)
    shutil.rmtree(root, ignore_errors=True)

    jobs = json.loads(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs").read())
    out = []
    import datetime

    def ts(s):
        return datetime.datetime.strptime(
            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")

    for j in sorted(jobs, key=lambda x: x["jobId"]):
        if j["jobId"] <= max_before:
            continue
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])
               ).total_seconds()
        out.append({
            "job": j["jobId"],
            "sec": round(dur, 2),
            "tasks": j["numTasks"],
            "desc": (j.get("description") or j["name"])[:110],
        })
    print(json.dumps({"cores": cores, "turns": turns,
                      "total": round(manifest["build_seconds"], 2),
                      "phases": manifest["build_phases"]}))
    for j in out:
        print(json.dumps(j))


if __name__ == "__main__":
    main()
