"""Single-node oracle: the reference's query semantics over plain dicts.

This is the correctness anchor for the distributed engine: the Spark
engine must be *rank-identical* to this oracle on every query (north
rule). The oracle itself is validated against the reference's own golden
test outputs (``/root/reference/test/test_konlsearch.py:191-254,
555-560, 622-640``) in ``tests/test_oracle_golden.py``.

Semantics reproduced (with file:line cites into /root/reference):

- insert-order 1-based doc ids, conflicts don't consume ids
  (``index.py:299-327``);
- dedup by content hash → CONFLICT with existing id (``index.py:301-305``;
  hash function is internal identity — we use sha256, see SURVEY §2.2 P5);
- AND/OR search: posting-set fold, ascending doc-id result
  (``inverted_index.py:98-116``);
- PHRASE: AND then first-occurrence-ordered (non-strict) morph check
  (``index.py:432-448``, ``utility.py:25-26``); a candidate missing a
  query morph in its ordered stream is "no match" (pinned semantics for
  the reference's latent ValueError path, SURVEY §2.4 Q4);
- complex search: recursive AND/OR set algebra, sorted
  (``index.py:413-429``);
- prefix suggestions over jamo decompositions, sorted
  (``trie.py:33-67``) — pinned as a plain prefix-range semantics
  (includes exact match; documented divergence, SURVEY §2.4 Q6);
- search log + frequency aggregation + per-prefix top-5
  (``inverted_index.py:107-109, 121-128``, ``trie.py:183-216``,
  ``counter.py:82-105``: descending count, ascending token tie-break);
- BM25 (our extension per the north rule): k1=1.2, b=0.75,
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf/doc_len from
  ``tokenizer.analyze``; ties broken by ascending doc_id.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple, Union

from . import tokenizer as tk

BM25_K1 = 1.2
BM25_B = 0.75


def text_hash(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_weight(tf: int, doc_len: int, avgdl: float) -> float:
    return (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_len / avgdl)
    )


@dataclass
class SearchRequest:
    tokens: List[str]
    mode: str  # "and" | "or" | "phrase"


@dataclass
class ComplexRequest:
    condition1: Union["ComplexRequest", SearchRequest]
    condition2: Union["ComplexRequest", SearchRequest]
    mode: str  # "and" | "or"


@dataclass
class Doc:
    doc_id: int
    text: str
    tokens: List[str]
    ordered: List[str]
    tfs: List[int]
    doc_len: int


@dataclass
class OracleIndex:
    docs: Dict[int, Doc] = field(default_factory=dict)
    postings: Dict[str, Set[int]] = field(default_factory=dict)
    hash_to_id: Dict[str, int] = field(default_factory=dict)
    last_document_id: int = 0
    # query log: list of (seq, token, size); seq strictly increasing
    log: List[Tuple[int, str, int]] = field(default_factory=list)
    log_offset: int = 0
    token_frequency: Dict[str, int] = field(default_factory=dict)

    # -- write path (index.py:299-327) ------------------------------------
    def index(self, text: str) -> Tuple[str, int]:
        h = text_hash(text)
        if h in self.hash_to_id:
            return ("conflict", self.hash_to_id[h])
        tokens, ordered, tfs, doc_len = tk.analyze(text)
        self.last_document_id += 1
        doc_id = self.last_document_id
        self.docs[doc_id] = Doc(doc_id, text, tokens, ordered, tfs, doc_len)
        for t in tokens:
            self.postings.setdefault(t, set()).add(doc_id)
        self.hash_to_id[h] = doc_id
        return ("success", doc_id)

    def index_all(self, texts: Sequence[str]) -> List[Tuple[str, int]]:
        return [self.index(t) for t in texts]

    # -- delete (index.py:332-356) -----------------------------------------
    def delete(self, doc_id: int) -> None:
        if doc_id not in self.docs:
            raise KeyError(doc_id)
        doc = self.docs.pop(doc_id)
        del self.hash_to_id[text_hash(doc.text)]
        for t in doc.tokens:
            s = self.postings.get(t)
            if s is not None:
                s.discard(doc_id)
                if not s:
                    del self.postings[t]
                    self.token_frequency.pop(t, None)

    # -- point/range/multi gets (index.py:364-408) --------------------------
    def get(self, doc_id: int) -> Optional[str]:
        d = self.docs.get(doc_id)
        return d.text if d else None

    def get_range(self, start_id: int, end_id: int) -> List[int]:
        if end_id <= start_id:
            return []
        return [i for i in sorted(self.docs) if start_id <= i < end_id]

    def get_multi(self, ids: Sequence[int]) -> List[int]:
        return [i for i in ids if i in self.docs]

    # -- read path (inverted_index.py:98-116; index.py:432-448) -------------
    def _postings(self, token: str) -> Set[int]:
        return self.postings.get(token, set())

    def search(self, tokens: Sequence[str], mode: str,
               log: bool = True) -> List[int]:
        mode = mode.lower()
        if mode == "phrase":
            return self._search_phrase(tokens, log=log)
        result: Set[int] = set()
        for i, token in enumerate(tokens):
            ids = self._postings(token)
            if ids and log:
                self._log_append(token, 1)
            if mode == "or" or i == 0:
                result.update(ids)
            elif mode == "and":
                result.intersection_update(ids)
        return sorted(result)

    def _search_phrase(self, tokens: Sequence[str], log: bool = True) -> List[int]:
        candidates = self.search(tokens, "and", log=log)
        query_ordered = tk.tokenize_with_order(" ".join(tokens))
        out = []
        for doc_id in candidates:
            doc = self.docs[doc_id]
            firsts = tk.first_positions(doc.ordered, query_ordered)
            if any(p is None for p in firsts):
                continue  # pinned: absent morph → no match (Q4 quirk)
            if all(firsts[i] <= firsts[i + 1] for i in range(len(firsts) - 1)):
                out.append(doc_id)
        return out

    def search_complex(self, req: Union[ComplexRequest, SearchRequest]) -> List[int]:
        if isinstance(req, SearchRequest):
            return self.search(req.tokens, req.mode)
        r1 = set(self.search_complex(req.condition1))
        r2 = set(self.search_complex(req.condition2))
        if req.mode == "and":
            return sorted(r1 & r2)
        return sorted(r1 | r2)

    # -- BM25 (north-rule extension) ----------------------------------------
    def bm25_topk(self, tokens: Sequence[str], k: int = 10,
                  mode: str = "or") -> List[Tuple[int, float]]:
        """BM25 top-k. mode='and' keeps only docs containing every term.

        Duplicate query terms are scored once (the posting set semantics
        of the reference treat the query as a token list whose repeats
        add nothing to membership; we pin the same for scoring).
        """
        n = len(self.docs)
        if n == 0:
            return []
        avgdl = sum(d.doc_len for d in self.docs.values()) / n
        uniq = list(dict.fromkeys(tokens))
        scores: Dict[int, float] = {}
        matched: Dict[int, int] = {}
        for token in uniq:
            ids = self._postings(token)
            if not ids:
                continue
            idf = bm25_idf(n, len(ids))
            for doc_id in ids:
                doc = self.docs[doc_id]
                tf = doc.tfs[doc.tokens.index(token)]
                w = idf * bm25_tf_weight(tf, doc.doc_len, avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + w
                matched[doc_id] = matched.get(doc_id, 0) + 1
        items = [
            (doc_id, s) for doc_id, s in scores.items()
            if mode != "and" or matched[doc_id] == len(uniq)
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]

    # -- suggestions / frequency (trie.py; counter.py) -----------------------
    def search_suggestions(self, prefix: str) -> List[str]:
        dp = tk.decompose(prefix)
        return sorted(
            t for t in self.postings if tk.decompose(t).startswith(dp)
        )

    def _log_append(self, token: str, size: int) -> None:
        self.log.append((len(self.log) + 1, token, size))

    def aggregate_frequency(self) -> None:
        """inverted_index.py:121-128 + trie.py:183-196."""
        for seq, token, size in self.log:
            if seq <= self.log_offset:
                continue
            if token in self.postings and size > 0:
                self.token_frequency[token] = (
                    self.token_frequency.get(token, 0) + size
                )
        self.log_offset = len(self.log)

    def search_by_frequency(self, prefix: str, k: int = 5) -> List[Tuple[str, int]]:
        """Per-prefix top-k by search frequency (trie.py:200-216,
        counter eviction/order counter.py:82-105): descending count then
        ascending token. ``prefix`` may be jamo or composed text."""
        dp = tk.decompose(prefix)
        items = [
            (t, c) for t, c in self.token_frequency.items()
            if tk.decompose(t).startswith(dp)
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]
