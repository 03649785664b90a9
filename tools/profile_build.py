"""Per-phase build profile at a pinned core count (scaling diagnosis).

Usage: taskset -c 0-(n-1) python tools/profile_build.py <cores> <turns>

Prints the manifest's build_phases plus total — run at N and 4N cores
to see which phase fails to scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from konlspark import build, corpus
    from konlspark.session import get_spark

    spark = get_spark("profile-build", cores=cores,
                      shuffle_partitions=max(8, 3 * cores))
    tdf = corpus.spark_make_transcripts(
        spark, turns, turns_per_conv=20, seed=42,
        min_words=3, max_words=60, num_partitions=max(8, cores)).cache()
    tdf.count()
    root = f"/tmp/konlspark_profile_{os.getpid()}"
    # warm-up (python worker spin-up / JIT)
    warm = corpus.spark_transcripts(spark, corpus.make_transcripts(5000, seed=1))
    build.build_index(spark, warm, root + "_warm")
    shutil.rmtree(root + "_warm", ignore_errors=True)

    manifest = build.build_index(spark, tdf, root)
    out = {
        "cores": cores, "turns": turns,
        "total_sec": round(manifest["build_seconds"], 2),
        "phases": manifest["build_phases"],
        "turns_per_sec": round(turns / manifest["build_seconds"], 1),
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
