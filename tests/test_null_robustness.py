"""Dirty-data smoke net: every core operator family must tolerate NULLs.

The parquet fixtures carry no NULLs, so this bug class hides from the
oracle gate (the r7 code review found two: quantile_normalize silently
misordered NULL scores, pca/kmeans crashed on NULL vectors). Each probe
dirties a fixture column the way real corpora are dirty — NULL texts,
NULL embeddings, NULL users/timestamps/props — and asserts the operator
completes. Semantic NULL policies (what the values MEAN) are pinned by
the operators' own unit tests; this net pins "no crash, no hang" across
the families in one sweep.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    return {
        "docs": docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 17 == 0, F.lit(None)).otherwise(F.col("text")),
        ),
        "emb": emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 19 == 0, F.lit(None)).otherwise(
                F.col("embedding")
            ),
        ),
        "ev": (
            ev.withColumn(
                "user_id",
                F.when(F.col("event_id") % 23 == 0, F.lit(None)).otherwise(
                    F.col("user_id")
                ),
            )
            .withColumn(
                "ts",
                F.when(F.col("event_id") % 31 == 0, F.lit(None)).otherwise(
                    F.col("ts")
                ),
            )
            .withColumn(
                "props",
                F.when(F.col("event_id") % 37 == 0, F.lit(None)).otherwise(
                    F.col("props")
                ),
            )
        ),
        "clean_emb": emb,
    }


def test_dedup_family_tolerates_null_text(dirty):
    from shortcut_spark.operators import dedup

    assert dedup.exact_dedup(dirty["docs"], "doc_id", "text").count() > 0
    assert dedup.minhash_near_dups(dirty["docs"], "doc_id", "text").count() >= 0
    sh = dedup.shingles(dirty["docs"], "doc_id", "text")
    assert dedup.jaccard_pairs(sh, "doc_id", 0.5).count() >= 0
    # NULL texts produce no shingles/fingerprints — they must simply drop
    # out, never pair with everything
    fp = dedup.simhash(dirty["docs"], "doc_id", "text")
    assert fp.filter(F.col("simhash").isNull()).count() == 0


@pytest.mark.slow
def test_similarity_family_tolerates_null_vectors(dirty):
    from shortcut_spark.operators import similarity as S

    q = (
        dirty["clean_emb"]
        .filter(F.col("vec_id") == 1)
        .select(F.col("embedding").alias("qvec"))
    )
    top = S.topk_cosine(dirty["emb"], q, 5).collect()
    assert len(top) == 5
    # NULL-vector rows must not reach the top-k (their cosine is NULL)
    assert all(r["cosine"] is not None for r in top)
    assert S.lsh_topk(dirty["emb"], q, 5).count() > 0
    qs = (
        dirty["clean_emb"]
        .limit(3)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec"))
    )
    assert S.knn_join(dirty["emb"], qs).count() == 15
    assert S.cosine_join(dirty["emb"], 0.8).count() >= 0


@pytest.mark.slow
def test_clustering_family_tolerates_null_vectors(dirty):
    from shortcut_spark.operators.cluster import (
        kmeans_exact,
        kmeans_silhouette,
        pca_top_component,
    )

    n_clean = dirty["emb"].filter(F.col("embedding").isNotNull()).count()
    assigned = kmeans_exact(dirty["emb"], k=4, iters=2)
    assert assigned.count() == n_clean  # NULL vectors drop, never crash
    assert kmeans_silhouette(dirty["emb"], k=4, iters=2).count() >= 2
    assert pca_top_component(dirty["emb"]).count() > 0


@pytest.mark.slow
def test_events_family_tolerates_null_columns(dirty):
    from shortcut_spark.operators import events as E

    assert E.session_top_paths(dirty["ev"]).count() >= 0
    assert E.json_field_profile(dirty["ev"]).count() > 0
    assert E.daily_anomalies(dirty["ev"]).count() >= 0
    assert E.robust_anomalies(dirty["ev"]).count() >= 0
    assert E.session_cooccurrence(dirty["ev"]).count() >= 0
    assert E.sequence_match(dirty["ev"]).count() >= 0
    # NULL users are excluded from the experiment, not a phantom arm
    arms = E.ab_test(dirty["ev"]).collect()
    assert all(r["variant"] is not None for r in arms)


@pytest.mark.slow
def test_text_family_hostile_strings_smoke(spark):
    """Crash-freedom pin for the text/dedup families on hostile input:
    NULL text, empty, whitespace-only, a 10k-char single token, regex
    metacharacters, control bytes, wide unicode, and a 2000-token doc —
    every operator returns a DataFrame without raising (r8 sweep; the
    values themselves are certified elsewhere, this pins the edges the
    fixture lacks)."""
    hostile = [
        (1, "plain text here"),
        (2, ""),
        (3, None),
        (4, "a" * 10000),
        (5, ".*+?[](){}|\\^$"),
        (6, "中文 español здесь ™ 😀"),
        (7, "\x00\x01 control \x7f chars"),
        (8, "   \t\n   "),
        (9, "word " * 2000),
    ]
    docs = spark.createDataFrame(hostile, "doc_id long, text string")
    from shortcut_spark.operators import dedup, text

    for fn in (
        lambda: text.text_stats(docs, "doc_id", "text"),
        lambda: text.language_id(docs, "doc_id", "text"),
        lambda: text.quality_score(docs, "doc_id", "text"),
        lambda: text.fingerprints(docs, "doc_id", "text"),
        lambda: text.pii_redact(docs, "doc_id", "text"),
        lambda: text.rake_keywords(docs, "doc_id", "text"),
        lambda: text.collocations(docs, "text"),
        lambda: text.repetition_stats(docs, "doc_id", "text"),
        lambda: text.encoding_stats(docs, "doc_id", "text"),
        lambda: dedup.simhash(docs, "doc_id", "text"),
        lambda: dedup.minhash_near_dups(docs, "doc_id", "text"),
        lambda: dedup.winnow_fingerprints(docs, "doc_id", "text"),
    ):
        assert fn().count() >= 0


@pytest.mark.slow
def test_graph_family_drops_null_endpoint_edges(spark):
    """An edge with a NULL endpoint is no edge — every graph operator
    must IGNORE it rather than treat NULL as a node. Before the guard,
    connected_components emitted a NULL node row (and a NULL 'bridge'
    shared by all NULL-edges could merge unrelated components), and
    pagerank counted NULL as a rank-receiving node."""
    from shortcut_spark.operators.graph import (
        connected_components,
        pagerank,
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, None), (None, 2), (None, None), (3, 4)], "src long, dst long"
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc == {3: 3, 4: 3}  # 1 and 2 have no real edge; NULL is not a node
    pr = pagerank(edges).select("node").collect()
    assert {r["node"] for r in pr} == {3, 4}
    tri = triangle_counts(edges).select("node").collect()
    assert {r["node"] for r in tri} == {3, 4}

    all_null = spark.createDataFrame([(None, None)], "src long, dst long")
    assert connected_components(all_null).count() == 0
    assert pagerank(all_null).count() == 0
    assert triangle_counts(all_null).count() == 0


@pytest.mark.slow
def test_similarity_family_zero_norm_vectors(spark):
    """A zero-norm vector has no direction: cosine against it is NULL
    (try_divide), so it pairs with nothing and is never a nearest
    neighbor — previously an ANSI DIVIDE_BY_ZERO crash in the exact
    join and NULL-padded top-k results."""
    from shortcut_spark.operators import similarity as S

    rows = [(0, [0.0] * 8), (1, [1.0] + [0.0] * 7), (2, [1.0] + [0.0] * 7), (3, [0.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = S.cosine_join(emb, 0.5, dim=8, exact=True).collect()
    assert [(r["id_a"], r["id_b"]) for r in exact] == [(1, 2)]
    assert S.cosine_join(emb, 0.5, dim=8, n_planes=8, bands=4).count() == 1

    q = spark.createDataFrame([([1.0] + [0.0] * 7,)], "qvec array<double>")
    top = S.topk_cosine(emb, q, 4).collect()
    assert {r["vec_id"] for r in top} == {1, 2}  # zero vectors never pad
    qz = spark.createDataFrame([([0.0] * 8,)], "qvec array<double>")
    assert S.topk_cosine(emb, qz, 2).count() == 0


def test_asof_null_keys_never_match(spark):
    """SQL join semantics for the as-of family: a NULL key matches
    NOTHING. The window-partition implementation would otherwise GROUP
    null keys (window partitioning, unlike joins, puts NULLs together),
    silently matching null-keyed left rows to null-keyed right rows —
    which the DuckDB ASOF twin never does."""
    from shortcut_spark.operators.joins import asof_max

    L = spark.createDataFrame(
        [(1, 100), (2, None), (None, 300)], "k long, ts long"
    )
    R = spark.createDataFrame(
        [(1, 90), (None, 280), (2, None)], "k long, ts long"
    )
    got = {
        (str(r["k"])): r["asof_value"]
        for r in asof_max(L, R, "k", "k", "ts", "ts").collect()
    }
    assert got == {"1": 90, "2": None, "None": None}
    # fuzzy_join short-string recall: the r10 auto-sized default derives
    # the block length from the data (P5 of lengths − 1, clamp [3,6]), so
    # the single-typo 5-char pair now survives the default call; pinning
    # the legacy 6 reproduces the documented cliff (both blocks = whole
    # string, one typo hides the pair)
    from shortcut_spark.operators.joins import fuzzy_join

    Ln = spark.createDataFrame([("alpha", 1)], "name_a string, id_a long")
    Rn = spark.createDataFrame([("alpho", 2)], "name_b string, id_b long")
    assert fuzzy_join(Ln, Rn, "name_a", "name_b", 2).count() == 1  # auto-sized
    assert fuzzy_join(Ln, Rn, "name_a", "name_b", 2, suffix_len=6).count() == 0


@pytest.mark.slow
def test_cosine_join_ivf_gemm_tolerates_null_and_ragged_vectors(dirty):
    """r11: the gemm verify stacks each cell's vectors in numpy — NULL
    vectors (np.stack crash) are dropped (their canonical cosine is NULL
    → can never pass), and RAGGED vectors route around the matrix
    product as emit-then-rescore pairs, so both verify modes stay
    byte-identical on dirty corpora."""
    from shortcut_spark.operators import similarity as S

    emb = dirty["emb"].select("vec_id", "embedding")
    # add a ragged (wrong-dimension) vector on top of the nulls
    ragged = emb.sparkSession.createDataFrame(
        [(990_001, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    mixed = emb.unionByName(ragged)
    fitted = S.ivf_fit(dirty["clean_emb"], "vec_id", "embedding", 4, 1)
    for blk in ("sym", "asym"):
        g = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in S.cosine_join_ivf(
                mixed, 0.4, m_assign=2, fitted=fitted, blocking=blk, verify="gemm"
            ).collect()
        }
        f = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in S.cosine_join_ivf(
                mixed, 0.4, m_assign=2, fitted=fitted, blocking=blk, verify="fused"
            ).collect()
        }
        assert g == f
