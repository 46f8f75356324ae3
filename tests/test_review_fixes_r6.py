"""Regression pins for the round-6 self-review findings: each test
fails on the pre-fix code."""

from __future__ import annotations

import json
import os

import pytest

from integritychecksforvldbs_spark.functions import subword
from integritychecksforvldbs_spark.operators import search
from integritychecksforvldbs_spark.plans.queue import DirCasBackend, WorkQueue


def _write_corpus(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_manifest_commit_is_crash_recoverable(spark, tmp_path):
    """Finding 1: the manifest commit must be a rename-aside swap, not
    a truncating overwrite — a crash mid-commit leaves either the old
    manifest or a restorable .bak, never a destroyed index."""
    corpus = str(tmp_path / "corpus")
    _write_corpus(spark, corpus, [(1, "spark window")])
    idx = str(tmp_path / "idx")
    search.build_bm25_index(
        spark, spark.read.parquet(corpus), idx, corpus_path=corpus
    )
    man_path = f"{idx}/manifest.json"
    good = open(man_path).read()
    # simulate the crash window: old manifest renamed aside, new one
    # not yet renamed in (plus a torn tmp from the dying writer)
    os.rename(man_path, man_path + ".bak")
    with open(man_path + ".tmp", "w") as f:
        f.write('{"segments": [')  # torn
    man = search._read_manifest(spark, idx)
    assert man is not None and json.dumps(man) == json.dumps(json.loads(good))
    assert os.path.exists(man_path)  # .bak recovered into place
    top = search.bm25_topk_indexed(spark, idx, "spark")
    assert top.count() == 1


def test_vacuum_refuses_without_manifest(spark, tmp_path):
    """Finding 4: 'no committed manifest' must NOT read as 'no live
    segments' — vacuum refuses instead of deleting a recoverable
    index wholesale."""
    corpus = str(tmp_path / "corpus")
    _write_corpus(spark, corpus, [(1, "spark window")])
    idx = str(tmp_path / "idx")
    search.build_bm25_index(
        spark, spark.read.parquet(corpus), idx, corpus_path=corpus
    )
    os.remove(f"{idx}/manifest.json")  # torn-commit end state
    assert search.vacuum_bm25_index(spark, idx) == []
    assert os.path.exists(f"{idx}/postings/seg_00000")  # untouched


def test_stale_release_sweeps_tmp_litter(tmp_path):
    """Finding 2: a writer dying between open(tmp) and os.replace
    leaves .body.*.tmp litter in the claim dir; the stale sweep must
    still release the claim instead of wedging the database forever."""
    q = WorkQueue(str(tmp_path), "P", ["db1"], session_id="w1",
                  stale_after_s=0.2)
    claim_dir = os.path.join(
        q.backend.root, *f"{q.dir}/db_db1/claim".split("/")
    )
    os.mkdir(claim_dir)
    with open(os.path.join(claim_dir, ".body.dead.tmp"), "w") as f:
        f.write('{"session_id": "dead"')  # torn body, no record.json
    import time

    time.sleep(0.3)  # let the dir mtime go stale
    assert q.claim_next() == "db1"  # released and re-claimed
    q.complete("db1")
    assert q.all_done()


def test_dircas_list_scoped_to_prefix(tmp_path):
    """Finding 6: list(prefix) must walk only the prefix's parent, so
    a store accumulating rounds/queues doesn't make every claim
    O(everything).  Behavior pin: keys outside the prefix never
    appear; partial last segments (db_) match."""
    be = DirCasBackend(str(tmp_path))
    be.put_if_absent("queue_a/r1/round", {})
    be.put_if_absent("queue_a/r1/db_x/meta", {})
    be.put_if_absent("queue_b/r1/db_y/meta", {})
    assert be.list("queue_a/") == [
        "queue_a/r1/db_x/meta", "queue_a/r1/round"
    ]
    assert be.list("queue_a/r1/db_") == ["queue_a/r1/db_x/meta"]
    assert be.list("queue_zzz/") == []  # absent parent: no walk, no crash


def test_subword_rare_leading_char_not_unk(spark):
    """Finding 7: word-initial characters come from the FULL word
    relation — a word whose leading char appears only in rare words
    must still tokenize into pieces, not [UNK]."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over lazy dogs") for i in range(50)]
        + [(100, "quizzer")],  # the only q-word; never in top-2
        "doc_id long, text string",
    )
    vocab = subword.build_subword_vocab(docs, n_words=2, n_suffixes=50)
    assert "q" in vocab  # first char harvested corpus-wide
    toks = subword.wordpiece_tokenize("quizzer", frozenset(vocab))
    assert toks != ["[UNK]"] and toks[0] == "q"


def test_subword_overlong_words_excluded_from_vocab(spark):
    """Finding 7b: a whole word longer than max_piece_len can never be
    matched by the bounded tokenizer scan, so it must not waste a
    vocabulary slot."""
    long_word = "x" * 40
    docs = spark.createDataFrame(
        [(i, f"{long_word} hi") for i in range(10)],
        "doc_id long, text string",
    )
    vocab = subword.build_subword_vocab(docs, n_words=5, n_suffixes=10)
    assert long_word not in vocab
    assert "hi" in vocab


def test_token_regex_vertical_tab_agrees_with_oracle(spark, duck):
    """Finding 10: with \\s the engines disagree on \\x0b (Java: VT is
    whitespace; RE2: VT is a token).  The explicit class makes Spark,
    DuckDB, and the Python query tokenizer agree."""
    from integritychecksforvldbs_spark.operators.text import (
        TOKEN_REGEX,
        _spark_re,
    )

    text = "a\x0bb"
    spark_toks = spark.sql(
        f"SELECT regexp_extract_all('a' || chr(11) || 'b',"
        f" '{_spark_re(TOKEN_REGEX)}', 0) AS t"
    ).collect()[0]["t"]
    duck_toks = duck.execute(
        f"SELECT regexp_extract_all('a' || chr(11) || 'b', '{TOKEN_REGEX}')"
    ).fetchall()[0][0]
    py_toks = search.query_terms(text)
    assert list(spark_toks) == list(duck_toks) == ["a", "b"]
    assert py_toks == ["a", "b"]
