"""Structured Streaming frequency aggregation (Q9 streaming face) and
warehouse catalog ops (S1-S4)."""

import datetime

import pytest

from konlspark import streaming
from konlspark.catalog import destroy_index, get_all_indexes


@pytest.fixture()
def log_dir(spark, tmp_path):
    d = str(tmp_path / "query_log")
    rows = [
        (1, datetime.datetime(2026, 1, 1, 0, 0, 5), "마법", 1),
        (2, datetime.datetime(2026, 1, 1, 0, 0, 20), "마법", 1),
        (3, datetime.datetime(2026, 1, 1, 0, 1, 10), "특별", 1),
        (4, datetime.datetime(2026, 1, 1, 0, 2, 30), "마법", 1),
        (5, datetime.datetime(2026, 1, 1, 0, 2, 40), "모래", 1),
    ]
    spark.createDataFrame(rows, streaming.LOG_SCHEMA) \
        .write.mode("overwrite").parquet(d)
    return d


def test_stream_frequency_totals(spark, tmp_path, log_dir):
    out = str(tmp_path / "freq_out")
    ckpt = str(tmp_path / "ckpt1")
    q = streaming.stream_frequency_totals(spark, log_dir, out, ckpt)
    q.awaitTermination(120)
    got = {r["token"]: r["freq"] for r in spark.read.parquet(out).collect()}
    assert got == {"마법": 3, "특별": 1, "모래": 1}
    # incremental: append more log rows, new stream run merges the delta
    spark.createDataFrame(
        [(6, datetime.datetime(2026, 1, 1, 0, 3, 0), "마법", 1)],
        streaming.LOG_SCHEMA).write.mode("append").parquet(log_dir)
    q2 = streaming.stream_frequency_totals(spark, log_dir, out, ckpt)
    q2.awaitTermination(120)
    got = {r["token"]: r["freq"] for r in spark.read.parquet(out).collect()}
    assert got["마법"] == 4  # only the delta was added (checkpointed)


def test_stream_windowed_counts(spark, tmp_path, log_dir):
    ckpt = str(tmp_path / "ckpt2")
    # bounded input: append mode emits a window only once the watermark
    # (max event time - delay) passes its end — with max ts 00:02:40 a
    # 30s watermark closes the minute-0 and minute-1 windows
    q = streaming.stream_windowed_counts(spark, log_dir, ckpt,
                                         watermark="30 seconds",
                                         queryName="t_windows")
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from t_windows order by window_start, token").collect()
    got = {(str(r["window_start"]), r["token"]): r["freq"] for r in rows}
    # windows whose watermark passed are emitted: minute 0 (2x마법),
    # minute 1 (1x특별); the final window may be withheld by watermark
    assert got.get(("2026-01-01 00:00:00", "마법")) == 2
    assert got.get(("2026-01-01 00:01:00", "특별")) == 1


def test_warehouse_catalog_ops(spark, tmp_path):
    from konlspark import build, corpus
    wh = str(tmp_path / "warehouse")
    tdf = corpus.spark_transcripts(spark, corpus.make_title_transcripts())
    build.build_index(spark, tdf, f"{wh}/titles")
    assert get_all_indexes(wh) == ["titles"]
    build.build_index(spark, tdf, f"{wh}/titles2")
    assert get_all_indexes(wh) == ["titles", "titles2"]
    destroy_index(wh, "titles2")
    assert get_all_indexes(wh) == ["titles"]
    with pytest.raises(FileNotFoundError):
        destroy_index(wh, "nope")
