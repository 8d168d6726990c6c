"""Tests for the training-data curation operators (canal_spark.functions).

Strategy mirrors SURVEY.md §5: small deterministic corpora with known
ground truth; approximate operators (MinHash LSH, SimHash, hyperplane LSH)
are checked for recall against the exact operator they approximate, not for
absolute output equality.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from canal_spark.functions import cdc_demo, dedup, multimodal, relational, similarity, text

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, limit=None):
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return df.limit(limit) if limit else df


@pytest.fixture(scope="module")
def corpus(spark):
    """Tiny corpus with engineered exact + near duplicates."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The  quick BROWN fox jumps over the lazy dog "),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),     # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "spark engines process data in parallel batches"),
        (6, "the quick brown fox jumps over the lazy dog today"),  # near dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestDedup:
    def test_exact_groups(self, corpus):
        out = dedup.exact_duplicates(corpus).collect()
        assert len(out) == 1
        assert out[0]["keep_id"] == 1 and out[0]["group_size"] == 2

    def test_jaccard_identity_and_near(self, corpus):
        pairs = {(r["id_a"], r["id_b"]): r["jaccard_bp"]
                 for r in dedup.jaccard_pairs(corpus, n=1, threshold_bp=5000).collect()}
        assert pairs[(1, 2)] == 10000          # canonicalized identical
        assert 7000 <= pairs[(1, 3)] < 10000   # one word differs
        assert (4, 5) not in pairs             # low overlap filtered

    def test_minhash_estimates_jaccard(self, spark, corpus):
        """LSH candidates must recover the exact near-dup pairs and the
        signature-match estimate must approximate true Jaccard."""
        exact = {(r["id_a"], r["id_b"]): r["jaccard_bp"]
                 for r in dedup.jaccard_pairs(corpus, n=2, threshold_bp=8000).collect()}
        got = {(r["id_a"], r["id_b"]): r["match_bp"]
               for r in dedup.minhash_lsh_pairs(
                   corpus, n=2, num_hashes=64, bands=8, threshold_bp=5000).collect()}
        for pair, jbp in exact.items():
            assert pair in got, f"LSH missed exact pair {pair} (jaccard {jbp})"
            assert abs(got[pair] - jbp) <= 2500  # K=64 → σ≈6%; loose bound

    def test_simhash_hamming(self, corpus):
        out = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in dedup.simhash_near_pairs(corpus, max_hamming=3).collect()}
        assert (1, 2) in out and out[(1, 2)] == 0  # identical canonical text
        for (_, _), h in out.items():
            assert 0 <= h <= 3

    def test_deterministic(self, corpus):
        a = sorted(map(tuple, dedup.minhash_signatures(corpus, n=2).collect()))
        b = sorted(map(tuple, dedup.minhash_signatures(corpus, n=2).collect()))
        assert a == b


class TestSimilarity:
    def test_topk_matches_numpy(self, spark):
        import numpy as np

        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        qs = emb.where(F.col("vec_id") < 3)
        got = similarity.cosine_topk(emb, qs, k=3).collect()
        # numpy ground truth
        data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
                for r in emb.collect()}
        for q_id in [0, 1, 2]:
            qv = data[q_id]
            sims = {
                n_id: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
                for n_id, v in data.items() if n_id != q_id
            }
            expect = sorted(sims, key=lambda n: (-sims[n], n))[:3]
            actual = [r["n_id"] for r in sorted(
                (r for r in got if r["q_id"] == q_id), key=lambda r: r["rank"])]
            assert actual == expect, f"query {q_id}"

    def test_lsh_recall_on_planted_near_dups(self, spark):
        """Bucketed ANN must recover planted near-duplicates (cos ≈0.98).

        On uniformly random vectors (max cosine ≈0.4 in the test data) ANY
        hyperplane-LSH has near-zero recall by design — the operator's
        contract is high-similarity retrieval, so that is what we test:
        P[same 8-bit bucket] = (1-θ/π)^8 ≈ 0.5 at θ≈12°, ≥97 % with 6
        tables."""
        import numpy as np

        rng = np.random.default_rng(7)
        base = rng.normal(size=(60, 32)).astype("float32")
        rows = [(int(i), base[i].tolist()) for i in range(60)]
        # plant 10 near-duplicates of vectors 0..9 as ids 100..109
        rows += [
            (100 + i, (base[i] + 0.05 * rng.normal(size=32).astype("float32")).tolist())
            for i in range(10)
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        qs = emb.where(F.col("vec_id") >= 100)
        exact = {r["q_id"]: r["n_id"] for r in
                 similarity.cosine_topk(emb, qs, k=1).collect()}
        assert exact == {100 + i: i for i in range(10)}  # sanity: true NN
        approx = similarity.lsh_bucketed_topk(emb, qs, k=3,
                                              n_planes=8, n_tables=6).collect()
        hits = sum(
            1 for q, n1 in exact.items()
            if any(r["q_id"] == q and r["n_id"] == n1 for r in approx)
        )
        assert hits >= 8, f"LSH recall on planted near-dups: {hits}/10"

    def test_ivf_full_probe_equals_exact(self, spark):
        """n_probe == n_centroids degrades IVF to brute force: probing
        every cell makes the candidate set the whole corpus, so the result
        must EQUAL cosine_topk row-for-row."""
        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        qs = emb.where(F.col("vec_id") < 3)
        exact = sorted(map(tuple, similarity.cosine_topk(emb, qs, k=5)
                           .collect()))
        ivf = sorted(map(tuple, similarity.ivf_topk(
            emb, qs, k=5, n_centroids=8, n_probe=8).collect()))
        assert ivf == exact

    def test_ivf_recall_on_planted_near_dups(self, spark):
        """Partial probe keeps recall on planted near-duplicates: a near-dup
        (cos ~= 0.98) lands in the same or an adjacent cell, so probing a
        quarter of the cells must still retrieve it as top-1."""
        import numpy as np

        rng = np.random.default_rng(11)
        base = rng.normal(size=(80, 32)).astype("float32")
        rows = [(int(i), base[i].tolist()) for i in range(80)]
        rows += [
            (100 + i,
             (base[i] + 0.05 * rng.normal(size=32).astype("float32")).tolist())
            for i in range(10)
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        qs = emb.where(F.col("vec_id") >= 100)
        approx = similarity.ivf_topk(emb, qs, k=3,
                                     n_centroids=8, n_probe=2).collect()
        hits = sum(1 for i in range(10)
                   if any(r["q_id"] == 100 + i and r["n_id"] == i
                          for r in approx))
        assert hits >= 8, f"IVF recall on planted near-dups: {hits}/10"

    def test_near_pairs_lsh_subset_of_exact(self, spark):
        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        exact = {(r["id_a"], r["id_b"]) for r in
                 similarity.embedding_near_pairs(emb, threshold_e3=300).collect()}
        lsh = {(r["id_a"], r["id_b"]) for r in
               similarity.embedding_near_pairs(emb, threshold_e3=300,
                                               use_lsh=True).collect()}
        assert lsh <= exact          # bucketing only prunes, never invents
        assert len(exact) > 0


class TestText:
    def test_lang_id(self, spark):
        rows = [
            (1, "the cat and the dog in the house for a while"),
            (2, "der Hund und die Katze ist nicht mit der Maus"),
            (3, "le chat est dans la maison pour le diner"),
            (4, "xyzzy plugh"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r["lang_guess"] for r in text.lang_id(df).collect()}
        assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}

    def test_token_count_python_parity(self, spark):
        import re

        df = _docs(spark, 50)
        got = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
               for r in text.token_count(df).collect()}
        for r in df.collect():
            ws = len([w for w in re.split(r"\s+", r["text"].strip()) if w])
            bpe = len(re.findall(text.TOKEN_REGEX, r["text"]))
            assert got[r["doc_id"]] == (ws, bpe)

    def test_quality_bounds_and_determinism(self, spark):
        df = _docs(spark, 100)
        out = text.quality_score(df).select("doc_id", "quality").collect()
        assert all(0 <= r["quality"] <= 100 for r in out)
        out2 = text.quality_score(df).select("doc_id", "quality").collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

    def test_fingerprint_whitespace_invariant(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, " hello world ")], ["doc_id", "text"])
        fps = [r["fp_md5"] for r in text.fingerprint(df).collect()]
        assert fps[0] == fps[1]


class TestMultimodal:
    def test_feature_extraction_contract(self, spark):
        df = multimodal.attach_fake_media(_docs(spark, 50))
        out = multimodal.extract_features(df).collect()
        assert len(out) == 50
        for r in out:
            assert r["media_type"] in ("image", "audio", "video")
            assert len(r["feat"]) == 8
            assert r["n_bytes"] > 0

    def test_partition_independence(self, spark):
        """mapInPandas output must not depend on batch/partition layout."""
        docs = _docs(spark, 60)
        a = multimodal.extract_features(
            multimodal.attach_fake_media(docs.repartition(1))).collect()
        b = multimodal.extract_features(
            multimodal.attach_fake_media(docs.repartition(7))).collect()
        key = lambda r: r["doc_id"]
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_frame_sampling(self, spark):
        df = _docs(spark, 60)
        frames = multimodal.frame_sample_plan(df, every_n=5).collect()
        for r in frames:
            assert r["doc_id"] % 3 == 2 and r["frame_idx"] % 5 == 0

    def test_decode_stub_raises(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_stub(b"\x89PNG")


class TestRelationalOracle:
    """Spark vs DuckDB on the same parquet — the driver's check, in CI."""

    @pytest.mark.parametrize("fn,sql", [
        (lambda s: relational.pricing_summary(
            s.read.parquet(f"{SF_DIR}/lineitem.parquet")),
         relational.pricing_summary_sql()),
        (lambda s: relational.source_union(
            s.read.parquet(f"{SF_DIR}/events.parquet")),
         relational.source_union_sql()),
        (lambda s: cdc_demo.lww_collapse(
            s.read.parquet(f"{SF_DIR}/events.parquet")),
         cdc_demo.lww_collapse_sql()),
    ])
    def test_matches_duckdb(self, spark, fn, sql):
        import duckdb

        con = duckdb.connect()
        for t in ("lineitem", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        got = fn(spark).toPandas()
        exp = con.execute(sql).fetchdf()
        got = got[sorted(got.columns)].sort_values(
            list(sorted(got.columns)), ignore_index=True)
        exp = exp[sorted(exp.columns)].sort_values(
            list(sorted(exp.columns)), ignore_index=True)
        assert list(got.columns) == list(exp.columns)
        assert len(got) == len(exp)
        for c in got.columns:
            assert got[c].astype(str).equals(exp[c].astype(str)), c


def test_duplicate_clusters_transitive(spark):
    from canal_spark.functions.dedup import duplicate_clusters

    text1 = "the quick brown fox jumps over the lazy dog again and again"
    text2 = "completely different content about spark connected components"
    rows = [("a", text1), ("b", text1), ("c", text1),
            ("d", text2), ("e", text2),
            ("f", "a unique document with nothing shared at all here")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in duplicate_clusters(df).collect()}
    # two clusters, min-id representative, transitive membership; the
    # unique doc is absent (clusters are size >= 2 by construction)
    assert got == {"a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
                   "d": ("d", 2), "e": ("d", 2)}


# ------------------------------------------- connected components (star)

def _cc_of(spark, edges, algo, max_iter=20):
    from canal_spark.functions.dedup import connected_component_labels

    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    out = connected_component_labels(pairs, max_iter=max_iter, algo=algo)
    return {r["id"]: r["lbl"] for r in out.collect()}


def test_cc_star_matches_minlabel_on_cliquey_graph(spark):
    """Both algorithms produce identical (id → component-min) labels on the
    near-clique shape LSH emits (two blobs + an isolated pair)."""
    edges = ([(f"a{i:02d}", f"a{j:02d}") for i in range(6) for j in range(i)]
             + [("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
             + [("z8", "z9")]
             + [("s1", "s1")])   # self-loop-only id: both must label s1->s1
    star, mini = _cc_of(spark, edges, "star"), _cc_of(spark, edges, "minlabel")
    assert star == mini
    assert star["s1"] == "s1"


def test_cc_star_converges_on_long_path(spark):
    """The chain-graph property the star variant exists for (VERDICT r03
    next #5): a 10k-node PATH has diameter 10k — min-label would need 10k
    rounds — but large-star/small-star contracts it in O(log² n): every
    node labels to the single component's min within 20 rounds."""
    n = 10_000
    ids = [f"n{i:05d}" for i in range(n)]
    edges = list(zip(ids, ids[1:]))
    labels = _cc_of(spark, edges, "star", max_iter=20)
    assert len(labels) == n
    assert set(labels.values()) == {ids[0]}


def test_cc_minlabel_raises_on_long_path_and_star_is_the_escape(spark):
    """min-label fails LOUDLY (never silently splits) on a path deeper than
    max_iter; the error names the star escape hatch."""
    import pytest

    ids = [f"n{i:03d}" for i in range(80)]
    edges = list(zip(ids, ids[1:]))
    with pytest.raises(RuntimeError, match="algo='star'"):
        _cc_of(spark, edges, "minlabel", max_iter=10)
    labels = _cc_of(spark, edges, "star", max_iter=10)
    assert set(labels.values()) == {ids[0]}


def test_cc_star_random_graph_property(spark):
    """Property check: on seeded random graphs the star labels equal an
    exact python union-find ground truth."""
    import random

    rng = random.Random(7)
    ids = [f"v{i:03d}" for i in range(120)]
    edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {v: v for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    in_pairs = {v for e in edges for v in e}
    truth = {v: find(v) for v in in_pairs}
    assert _cc_of(spark, edges, "star") == truth
