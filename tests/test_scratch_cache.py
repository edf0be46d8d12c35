"""Scratch-index cache keying: corpus_tag content fingerprint + build_once.

The r8 design keyed in-process scratch indexes (minhash signatures, ngram
keys, CDC postings, stream source exports) on the corpus PATH only; an
in-place rewrite of the same path would silently serve a stale index.
corpus_tag now folds one metadata listing (relpath, size, mtime_ns) into
the tag, so a rewrite keys a NEW scratch dir and build_once rebuilds.
"""

import os
import time

import pytest


def _write_docs(spark, sf_dir, rows):
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{sf_dir}/documents.parquet"))


class TestCorpusTag:
    def test_stable_for_unchanged_corpus(self, tmp_path):
        from table_versions_spark.operators.common import corpus_tag

        d = tmp_path / "corp"
        d.mkdir()
        (d / "a.parquet").write_bytes(b"abc")
        assert corpus_tag(str(d)) == corpus_tag(str(d))

    def test_changes_on_rewrite_and_on_new_file(self, tmp_path):
        from table_versions_spark.operators.common import corpus_tag

        d = tmp_path / "corp"
        d.mkdir()
        f = d / "a.parquet"
        f.write_bytes(b"abc")
        t0 = corpus_tag(str(d))
        # same size, bumped mtime (in-place rewrite)
        os.utime(f, ns=(time.time_ns(), time.time_ns() + 1))
        t1 = corpus_tag(str(d))
        assert t1 != t0
        # new file appears
        (d / "b.parquet").write_bytes(b"xyz")
        assert corpus_tag(str(d)) not in (t0, t1)

    def test_same_basename_different_parent_differ(self, tmp_path):
        from table_versions_spark.operators.common import corpus_tag

        for p in ("x", "y"):
            (tmp_path / p / "sf").mkdir(parents=True)
        a = corpus_tag(str(tmp_path / "x" / "sf"))
        b = corpus_tag(str(tmp_path / "y" / "sf"))
        assert a != b
        assert a.endswith("-sf") and b.endswith("-sf")

    def test_remote_uri_falls_back_to_path_digest(self):
        from table_versions_spark.operators.common import corpus_tag

        # not a local dir: path-only digest, still deterministic
        assert (corpus_tag("s3a://bucket/corpus")
                == corpus_tag("s3a://bucket/corpus"))


class TestStaleIndexRebuild:
    def test_ngram_index_rebuilds_after_corpus_rewrite(self, spark,
                                                       tmp_path):
        """End-to-end pin for the r8→r9 hardening: rewrite a corpus IN
        PLACE and the ngram rare-shingle index must rebuild — the pair
        set reflects the new content instead of the stale index."""
        from table_versions_spark.operators import dedup

        sf_dir = str(tmp_path / "sf")
        base = ("the quick brown fox jumps over the lazy dog while "
                "seventeen purple elephants recite untranslatable poetry "
                "about distributed shuffle boundaries and parquet footers")
        _write_docs(spark, sf_dir, [
            (1, base, "en", "s", 0),
            (2, "completely different text with no shared shingles at "
                "all, discussing only the weather on a small red island",
             "en", "s", 0),
        ])
        assert dedup.q_dedup_ngram(spark, sf_dir).count() == 0

        # in-place rewrite: doc 2 becomes a near-dup of doc 1
        _write_docs(spark, sf_dir, [
            (1, base, "en", "s", 0),
            (2, base + " with one extra clause", "en", "s", 0),
        ])
        pairs = {(r["doc_id_a"], r["doc_id_b"])
                 for r in dedup.q_dedup_ngram(spark, sf_dir).collect()}
        assert (1, 2) in pairs


class TestBuildOnce:
    def test_builds_once_and_honors_custom_marker(self, spark, tmp_path):
        from table_versions_spark.operators.common import build_once

        out = tmp_path / "idx"
        out.mkdir()
        calls = []

        def build():
            calls.append(1)
            (out / "last.bin").write_bytes(b"ok")

        build_once(spark, str(out), build, marker="last.bin")
        build_once(spark, str(out), build, marker="last.bin")
        assert calls == [1]

    def test_reruns_after_partial_build(self, spark, tmp_path):
        """A crash before the marker lands must re-run the whole build."""
        from table_versions_spark.operators.common import build_once

        out = tmp_path / "idx"
        out.mkdir()
        (out / "first.bin").write_bytes(b"half")  # partial artifact
        calls = []
        build_once(spark, str(out), lambda: calls.append(1),
                   marker="last.bin")
        assert calls == [1]
