"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Generates the BASELINE.json ``input_hint`` table shape —
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` — with:

- the 132 reference titles cycled in as turn texts (so the reference
  golden queries stay meaningful on the engine-built index);
- seeded Korean+English sentences drawn from a fixed vocabulary with a
  Zipf(s≈1.2) skew (exercises head-term skew handling in the build);
- a few duplicate texts (dedup / CONFLICT path) and empty /
  whitespace / special-char texts (sanitizer path).

Fully deterministic (numpy PCG64 with a fixed seed; no wall clock).
"""

from __future__ import annotations

import datetime
from typing import Tuple

import numpy as np
import pandas as pd

from .fixtures.titles import TITLES

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "search", "code", "browser"]

# Fixed Korean+English vocabulary (~200 terms) for synthetic sentences.
_VOCAB_KO = [
    "마법", "특별", "소녀", "소년", "공주", "천사", "여왕", "마왕", "시간",
    "사랑", "세계", "세상", "이세계", "전생", "괴물", "친구", "신부",
    "남매", "여동생", "남동생", "오빠", "아이", "사람", "이름", "이야기",
    "노래", "게임", "만화", "영웅", "용사", "용왕", "거짓말", "고백",
    "연애", "결혼", "고문", "고교생", "환불", "고래", "온천", "시리즈",
    "선생님", "선배", "편집자", "준교수", "교정", "학교", "회사", "회의",
    "보고서", "모델", "검색", "색인", "질의", "문서", "데이터", "분산",
    "엔진", "토큰", "형태소", "점수", "순위", "단어", "문장", "대화",
    "도구", "호출", "응답", "사용자", "비서", "코드", "오류", "수정",
    "실행", "결과", "요약", "번역", "질문", "답변", "예제", "테스트",
    "함수", "파일", "경로", "숫자", "목록", "모래", "비스크", "건담",
    "거신병", "경비실", "적대", "특급", "다이아몬드", "같은", "은하수",
    "바다", "하늘", "바람", "불꽃", "달빛", "별빛", "여행", "기억",
]
_VOCAB_EN = [
    "spark", "query", "index", "token", "search", "merge", "block",
    "score", "rank", "shard", "batch", "stream", "agent", "tool",
    "reply", "turn", "text", "table", "join", "group", "sort", "limit",
    "filter", "scan", "write", "read", "plan", "stage", "task", "node",
    "shuffle", "salted", "skew", "varint", "delta", "posting", "phrase",
    "prefix", "jamo", "hangul", "korean", "engine", "distributed",
    "checkpoint", "segment", "manifest", "lineage", "metric", "bm", "wand",
]
_VOCAB = _VOCAB_KO + _VOCAB_EN

_EPOCH = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)


def _zipf_weights(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1), s)
    return w / w.sum()


def make_transcripts(n_turns: int, turns_per_conv: int = 20,
                     seed: int = 42, title_every: int = 3,
                     min_words: int = 3, max_words: int = 15) -> pd.DataFrame:
    """Deterministic transcript table with ``n_turns`` rows.

    Every ``title_every``-th turn's text is a reference title (cycled);
    the rest are Zipf-skewed synthetic sentences. A duplicate text is
    injected roughly every 50 turns (dedup path) and a degenerate text
    (empty / whitespace / specials) roughly every 97 turns.
    """
    rng = np.random.default_rng(seed)
    weights = _zipf_weights(len(_VOCAB))
    lengths = rng.integers(min_words, max_words, size=n_turns)
    word_idx = rng.choice(len(_VOCAB), size=int(lengths.sum()), p=weights)

    texts: List[str] = []
    pos = 0
    for i in range(n_turns):
        ln = int(lengths[i])
        if i % title_every == 0:
            texts.append(TITLES[(i // title_every) % len(TITLES)])
        else:
            texts.append(" ".join(_VOCAB[j] for j in word_idx[pos:pos + ln]))
        pos += ln
        if i % 97 == 42:
            texts[-1] = ["", "   ", "@!#$%", '":,]'][(i // 97) % 4]
        elif i % 50 == 17 and i >= 50:
            texts[-1] = texts[i - 50]  # exact duplicate → CONFLICT path

    conv_ids = [f"conv-{i // turns_per_conv:08d}" for i in range(n_turns)]
    turn_idx = np.arange(n_turns, dtype=np.int32) % turns_per_conv
    roles = [_ROLES[i % 3] for i in range(n_turns)]
    tools = [_TOOLS[i % 4] if i % 3 == 2 else "" for i in range(n_turns)]
    ts = [_EPOCH + datetime.timedelta(seconds=60 * i) for i in range(n_turns)]

    return pd.DataFrame({
        "conv_id": conv_ids,
        "turn_idx": turn_idx,
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    })


def make_title_transcripts() -> pd.DataFrame:
    """The tiny corpus: exactly the 132 reference titles, in reference
    insertion order, as 3 conversations × 44 turns (FIXTURES.md §1).

    (conv_id, turn_idx) order == reference insertion order, so engine
    doc ids equal reference doc ids 1..132.
    """
    n = len(TITLES)
    return pd.DataFrame({
        "conv_id": [f"conv-{i // 44:08d}" for i in range(n)],
        "turn_idx": np.arange(n, dtype=np.int32) % 44,
        "role": [_ROLES[i % 3] for i in range(n)],
        "text": list(TITLES),
        "tool": ["" for _ in range(n)],
        "ts": [_EPOCH + datetime.timedelta(seconds=60 * i) for i in range(n)],
    })


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based deterministic 64-bit mix (splitmix64): per-row
    randomness independent of partitioning/batching."""
    z = (x + _GOLD).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def spark_make_transcripts(spark, n_turns: int, turns_per_conv: int = 20,
                           seed: int = 42, title_every: int = 3,
                           min_words: int = 10, max_words: int = 60,
                           num_partitions: int = 0,
                           cluster_token: str = "topicmarker",
                           cluster_rows: int = 0):
    """Distributed deterministic transcript synthesis (for large-scale
    benches; driver-side :func:`make_transcripts` covers tests).

    Every field is a pure function of the global row id via a
    counter-based hash, so output is identical for any partitioning —
    the 10^12-turn story: generation scales with the cluster, no
    driver-side materialization.

    ``cluster_rows > 0`` appends ``cluster_token`` to the first that
    many rows — a TEMPORALLY CLUSTERED rare term (a topic that lives in
    a time window, the realistic shape for transcript corpora whose doc
    ids follow conversation/time order). It exercises the MaxScore
    rare+head pruning regime in the bench; default 0 = untouched corpus.
    """
    import pyarrow as pa
    from pyspark.sql import functions as F

    if num_partitions <= 0:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n_turns, 1, num_partitions)
    weights = _zipf_weights(len(_VOCAB))
    cdf = np.cumsum(weights)
    vocab = np.array(_VOCAB, dtype=object)
    titles = np.array(TITLES, dtype=object)
    epoch_us = int(_EPOCH.timestamp() * 1_000_000)
    span = max_words - min_words

    def gen(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy().astype(np.uint64)
            n = len(ids)
            lengths = (min_words
                       + (_splitmix64(ids * np.uint64(2) + np.uint64(seed))
                          % np.uint64(span))).astype(np.int64)
            texts = []
            for i in range(n):
                rid = int(ids[i])
                if rid % title_every == 0:
                    text = titles[(rid // title_every) % len(titles)]
                else:
                    ws = _splitmix64(
                        np.arange(lengths[i], dtype=np.uint64)
                        + np.uint64(rid) * np.uint64(1_000_003)
                        + np.uint64(seed))
                    u = ws.astype(np.float64) / 2.0**64
                    text = " ".join(vocab[np.searchsorted(cdf, u)])
                if rid < cluster_rows:
                    text = text + " " + cluster_token
                texts.append(text)
            roles = np.array(["user", "assistant", "tool"], dtype=object)[
                (ids % np.uint64(3)).astype(np.int64)]
            tools = np.where(
                ids % np.uint64(3) == 2,
                np.array(["", "search", "code", "browser"], dtype=object)[
                    (ids % np.uint64(4)).astype(np.int64)],
                "")
            yield pa.RecordBatch.from_arrays([
                pa.array([f"conv-{int(i) // turns_per_conv:08d}"
                          for i in ids]),
                pa.array((ids % np.uint64(turns_per_conv)).astype(np.int32)),
                pa.array(roles, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(tools, pa.string()),
                pa.array((epoch_us + ids.astype(np.int64) * 60_000_000)
                         .astype("datetime64[us]")),
            ], names=["conv_id", "turn_idx", "role", "text", "tool", "ts"])

    out = base.mapInArrow(
        gen, "conv_id string, turn_idx int, role string, text string, "
             "tool string, ts timestamp")
    return out.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))


def spark_transcripts(spark, pdf: pd.DataFrame):
    """pandas → Spark DataFrame with the exact input_hint schema."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    return spark.createDataFrame(pdf, schema=schema)
