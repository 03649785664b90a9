"""Oracle vs the reference's own golden test outputs.

Every expected value below is a literal from the reference test suite
(/root/reference/test/test_konlsearch.py) — this is the rank-identity
anchor the north rule demands. The distributed engine is then tested
against this oracle (tests/test_engine.py)."""

import pytest

from konlspark.fixtures.titles import TITLES
from konlspark.oracle import ComplexRequest, OracleIndex, SearchRequest


@pytest.fixture(scope="module")
def ix():
    ix = OracleIndex()
    ix.index_all(TITLES)
    return ix


def test_corpus_indexes_cleanly(ix):
    # test_konlsearch.py:307-308 (len == 132), ids dense 1..132
    assert len(ix.docs) == 132
    assert sorted(ix.docs) == list(range(1, 133))


def test_search_mode_or(ix):
    # test_konlsearch.py:191-213
    assert ix.search(["같은", "비스크"], "or", log=False) == [10, 18, 81]
    assert ix.search(["특별", "마법소녀"], "or", log=False) == [9, 49, 97]


def test_search_mode_and(ix):
    # test_konlsearch.py:216-219
    assert ix.search(["마법", "특별"], "and", log=False) == [9]


def test_search_mode_phrase(ix):
    # test_konlsearch.py:222-229 — order-sensitive
    assert ix.search(["마법", "특별"], "phrase", log=False) == [9]
    assert ix.search(["특별", "마법"], "phrase", log=False) == []


def test_search_mode_complex(ix):
    # test_konlsearch.py:232-254
    req = ComplexRequest(
        condition1=SearchRequest(["같은", "비스크"], "or"),
        condition2=ComplexRequest(
            condition1=SearchRequest(["거신병", "경비실"], "or"),
            condition2=SearchRequest(["마법", "특별"], "phrase"),
            mode="or",
        ),
        mode="or",
    )
    assert ix.search_complex(req) == [1, 3, 9, 10, 18, 81]


def test_trie_suggestion(ix):
    # test_konlsearch.py:555-560
    assert ix.search_suggestions("특") == ["특급", "특별", "특별해야"]


def test_point_get(ix):
    # test_konlsearch.py:312-314
    assert ix.get(10) == "그 비스크 돌은 사랑을 한다"


def test_get_range_and_multi():
    # test_konlsearch.py:325-342 (fresh index: range test deletes id 20)
    ix = OracleIndex()
    ix.index_all(TITLES)
    ix.delete(20)
    assert ix.get_range(10, 20) == [10, 11, 12, 13, 14, 15, 16, 17, 18, 19]
    assert ix.get_multi([10, 15, 21, 1000]) == [10, 15, 21]


def test_dedup_conflict_and_id_advance():
    # test_konlsearch.py:345-356: re-index == CONFLICT(existing); after
    # delete, re-index succeeds with the *next* id (ids never reused)
    ix = OracleIndex()
    ix.index_all(TITLES)
    doc100 = ix.get(100)
    status, doc_id = ix.index(doc100)
    assert (status, doc_id) == ("conflict", 100)
    ix.delete(100)
    status, doc_id = ix.index(doc100)
    assert (status, doc_id) == ("success", 133)


def test_inverted_index_delete():
    # test_konlsearch.py:359-368: 다이아몬드 → {38}; delete removes term
    ix = OracleIndex()
    ix.index_all(TITLES)
    assert ix.postings["다이아몬드"] == {38}
    ix.delete(38)
    assert "다이아몬드" not in ix.postings


def test_search_by_frequency():
    # test_konlsearch.py:622-640
    ix = OracleIndex()
    ix.index_all(TITLES)
    ix.search(["같은", "비스크"], "or")
    for _ in range(6):
        ix.search(["특별", "마법소녀"], "or")
    ix.search(["마법", "모래"], "or")
    ix.aggregate_frequency()
    assert ix.search_by_frequency("ㅁ") == [("마법소녀", 6), ("마법", 1), ("모래", 1)]


def test_aggregate_frequency_is_incremental():
    # inverted_index.py:121-128: offset-based, second call adds only new
    ix = OracleIndex()
    ix.index_all(TITLES)
    ix.search(["마법", "특별"], "or")
    ix.aggregate_frequency()
    assert ix.search_by_frequency("ㅌ") == [("특별", 1)]
    ix.search(["특별"], "or")
    ix.aggregate_frequency()
    assert ix.search_by_frequency("ㅌ") == [("특별", 2)]


def test_bm25_topk_basic():
    ix = OracleIndex()
    ix.index_all(TITLES)
    top = ix.bm25_topk(["마법", "특별"], k=10)
    ids = [d for d, _ in top]
    # doc 9 contains both terms → must rank first
    assert ids[0] == 9
    # every scored doc is in the OR result set
    assert set(ids) <= set(ix.search(["마법", "특별"], "or", log=False))
    # scores strictly ordered desc, ties by ascending id
    scores = [s for _, s in top]
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))
    # AND mode keeps only docs with all terms
    assert [d for d, _ in ix.bm25_topk(["마법", "특별"], k=10, mode="and")] == [9]
