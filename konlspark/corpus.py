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
from typing import List, Tuple

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
                     seed: int = 42, title_every: int = 3) -> pd.DataFrame:
    """Deterministic transcript table with ``n_turns`` rows.

    Every ``title_every``-th turn's text is a reference title (cycled);
    the rest are Zipf-skewed synthetic sentences. A duplicate text is
    injected roughly every 50 turns (dedup path) and a degenerate text
    (empty / whitespace / specials) roughly every 97 turns.
    """
    rng = np.random.default_rng(seed)
    weights = _zipf_weights(len(_VOCAB))
    lengths = rng.integers(3, 15, size=n_turns)
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
