"""Tests for the corpus-curation operators (canal_spark.functions.curation):
sequence packing, contamination checking, mixture sampling, vocab stats.

Strategy per SURVEY.md §5: tiny engineered corpora with hand-computed ground
truth, plus Spark-vs-DuckDB parity on the real sf0.001 documents table (the
driver's correctness gate, run in CI)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canal_spark.functions import curation

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestPacking:
    def test_assignments_hand_computed(self, spark):
        # doc order (by id): a=5, b=3, c=10, d=4  → offsets 0,5,8,18
        rows = [("a", 5), ("b", 3), ("c", 10), ("d", 4), ("e", 0)]
        df = spark.createDataFrame(rows, "doc_id string, n_tok int")
        got = {r["doc_id"]: r.asDict() for r in
               curation.pack_assignments(df, seq_len=8).collect()}
        assert set(got) == {"a", "b", "c", "d"}  # zero-token doc excluded
        assert got["a"]["start_off"] == 0 and got["a"]["pack_first"] == 0
        assert got["a"]["pack_last"] == 0
        assert got["b"]["start_off"] == 5
        # b spans tokens [5, 8) → pack 0 only
        assert (got["b"]["pack_first"], got["b"]["pack_last"]) == (0, 0)
        # c spans [8, 18) → packs 1..2
        assert (got["c"]["pack_first"], got["c"]["pack_last"]) == (1, 2)
        assert got["c"]["n_packs"] == 2
        # d spans [18, 22) → pack 2 only
        assert (got["d"]["pack_first"], got["d"]["pack_last"]) == (2, 2)

    def test_assignments_independent_of_shard_layout(self, spark):
        """Offsets are a pure function of the data — the shard granularity
        knob (suffix_chars) must not leak into the output."""
        df = _docs(spark).select(
            "doc_id", F.length("text").alias("n_tok"))
        a = {r["doc_id"]: (r["start_off"], r["pack_first"], r["pack_last"])
             for r in curation.pack_assignments(
                 df, 1024, suffix_chars=1).collect()}
        b = {r["doc_id"]: (r["start_off"], r["pack_first"], r["pack_last"])
             for r in curation.pack_assignments(
                 df, 1024, suffix_chars=5).collect()}
        assert a == b

    def test_assignments_shuffled_lineage(self, spark):
        """The prefix-sum must hold over a lineage containing a SHUFFLE
        (intra-partition row order not stable across jobs) — the case that
        breaks rangepartition+spark_partition_id two-pass designs."""
        df = (_docs(spark)
              .select("doc_id", F.length("text").alias("n_tok"))
              .repartition(7, "doc_id"))  # inject a hash shuffle
        rows = sorted((r["doc_id"], r["n_tok"], r["start_off"])
                      for r in curation.pack_assignments(df, 512).collect())
        running = 0
        for _id, nt, off in rows:
            assert off == running
            running += nt

    def test_chunks_reconstruct_the_concatenation(self, spark):
        """The packing invariant: concatenating the packs in pack order
        reproduces concatenating the docs in id order, and every pack except
        the last is exactly seq_len."""
        rows = [(f"doc{i:03d}",
                 list(range(i * 100, i * 100 + (i * 7) % 23 + 1)))
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
        seq_len = 16
        packs = sorted(
            (r["pack_id"], r["tokens"])
            for r in curation.pack_chunks(df, seq_len).collect())
        expected = [t for _, toks in sorted(rows) for t in toks]
        got = [t for _, toks in packs for t in toks]
        assert got == expected
        assert [p for p, _ in packs] == list(range(len(packs)))
        for i, (_, toks) in enumerate(packs):
            if i < len(packs) - 1:
                assert len(toks) == seq_len
            else:
                assert 0 < len(toks) <= seq_len


class TestContamination:
    def test_engineered_overlap(self, spark):
        rows = [
            # the benchmark doc
            ("bench1", "alpha beta gamma delta epsilon zeta", True),
            # fully contained 3-gram-wise in bench1
            ("evalA", "alpha beta gamma delta", False),
            # no overlap at all
            ("evalB", "one two three four five six", False),
            # too short for a 3-gram
            ("evalC", "hi there", False),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string, b boolean")
        got = {r["doc_id"]: r.asDict() for r in
               curation.benchmark_contamination(
                   df, n=3, bench_col="b").collect()}
        assert set(got) == {"evalA", "evalB", "evalC"}
        assert got["evalA"]["contam_bp"] == 10000
        assert got["evalA"]["n_shingles"] == 2 and got["evalA"]["n_hits"] == 2
        assert got["evalB"]["contam_bp"] == 0 and got["evalB"]["n_hits"] == 0
        assert got["evalC"]["n_shingles"] == 0
        assert got["evalC"]["contam_bp"] == 0


class TestMixture:
    def test_deterministic_and_plausible(self, spark):
        out1 = {r["source"]: r.asDict() for r in
                curation.mixture_sample_counts(_docs(spark)).collect()}
        out2 = {r["source"]: r.asDict() for r in
                curation.mixture_sample_counts(_docs(spark)).collect()}
        assert out1 == out2  # pure function of (source, doc_id)
        for src, r in out1.items():
            assert 500 <= r["rate_bp"] <= 9499
            assert 0 <= r["n_kept"] <= r["n_docs"]
            assert r["tok_kept"] >= 0


class TestOracleParity:
    """Spark vs DuckDB on the same parquet — the driver's check, in CI."""

    @pytest.mark.parametrize("fn,sql", [
        (lambda s: curation.pack_assignments(
            s.read.parquet(f"{SF_DIR}/documents.parquet").select(
                "doc_id",
                F.size(F.regexp_extract_all(
                    "text", F.lit(curation.TOKEN_REGEX), 0)).alias("n_tok")),
            seq_len=2048),
         curation.pack_assignments_sql(seq_len=2048)),
        (lambda s: curation.benchmark_contamination(
            s.read.parquet(f"{SF_DIR}/documents.parquet"), n=3, bench_mod=20),
         curation.benchmark_contamination_sql(n=3, bench_mod=20)),
        (lambda s: curation.mixture_sample_counts(
            s.read.parquet(f"{SF_DIR}/documents.parquet")),
         curation.mixture_sample_sql()),
        (lambda s: curation.vocab_top_terms(
            s.read.parquet(f"{SF_DIR}/documents.parquet"), k=50),
         curation.vocab_top_terms_sql(k=50)),
    ])
    def test_matches_duckdb(self, spark, fn, sql):
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
        got = fn(spark).toPandas()
        exp = con.execute(sql).fetchdf()
        got = got[sorted(got.columns)].sort_values(
            sorted(got.columns), ignore_index=True)
        exp = exp[sorted(exp.columns)].sort_values(
            sorted(exp.columns), ignore_index=True)
        assert list(got.columns) == list(exp.columns)
        assert len(got) == len(exp)
        for c in got.columns:
            assert got[c].astype(str).equals(exp[c].astype(str)), c
