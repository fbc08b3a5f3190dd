"""Text-analysis operators for the documents table.

Everything is built from JVM-side column expressions (regexp + array ops) —
no Python in the hot path — and each has a DuckDB-expressible twin for the
oracle. At 100 TB these are embarrassingly parallel scans with no shuffle
except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import (
    STOPWORDS,
    digit_ratio,
    fingerprint,
    punct_ratio,
    tokens,
    upper_ratio,
)

__all__ = [
    "text_stats",
    "language_id",
    "quality_score",
    "quality_percentile_cut",
    "rake_keywords",
    "quality_expr",
    "lang_guess_expr",
    "token_frequencies",
    "fingerprints",
    "pii_redact",
    "PII_PATTERNS",
    "chunk_documents",
    "tfidf_top_terms",
    "pack_chunks",
    "tokenized",
    "unigram_logprob",
    "bigram_logprob",
    "interp_logprob",
    "ngram_contamination",
    "decontaminate",
    "repetition_stats",
    "encoding_stats",
    "MOJIBAKE_RE",
    "length_histogram",
    "collocations",
    "bm25_topk",
    "vocab_growth",
    "zipf_spectrum",
    "bpe_train",
    "sparse_cosine_pairs",
]

# Dialect-portable patterns (valid and equivalent in Java regex and RE2 /
# DuckDB): the training-data scrubbing set. Order matters — URLs first so
# an address inside a URL is swallowed by <URL>, not half-redacted.
PII_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9\- ]{6,}[0-9]", "<PHONE>"),
)


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document surface statistics (counts and exact ratios)."""
    pre = df.select(
        F.col(id_col),
        F.col(text_col),
        tokens(F.lower(F.col(text_col))).alias("__toks_l"),
    )
    t = F.col(text_col)
    # counts cast to long: DuckDB length/len return BIGINT and the driver
    # compares schemas, not just values; token counts come from the single
    # lowered tokenization (lowering never changes whitespace)
    return pre.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        F.size(F.col("__toks_l")).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.col("__toks_l"))).cast("long").alias("n_unique_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(upper_ratio(t), 6).alias("upper_ratio"),
        F.round(digit_ratio(t), 6).alias("digit_ratio"),
    )


def _hits_from(toks_l: F.Column, lang: str) -> F.Column:
    """Stopword hits of ``lang`` over a precomputed lowered token array."""
    from ..functions import STOPWORDS as SW

    return F.size(F.filter(toks_l, lambda x: x.isin(*SW[lang])))


def _lang_best(toks_l: F.Column) -> F.Column:
    """Best-language struct: argmax of stopword hits with the fixed language
    order as tiebreak (deterministic), via a sorted struct array. Takes the
    precomputed lowered token array so the document is tokenized once."""
    langs = list(STOPWORDS)
    entries = F.array(
        *[
            F.struct(
                _hits_from(toks_l, lang).alias("hits"),
                F.lit(i).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return F.array_sort(
        entries,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .otherwise(F.when(a["ord"] < b["ord"], -1).when(a["ord"] > b["ord"], 1).otherwise(0)),
    )[0]


def lang_guess_expr(toks_l: F.Column) -> F.Column:
    """Language guess over a precomputed lowered token array — composable
    into a single-scan projection (see ``pipeline.clean_corpus``)."""
    best = _lang_best(toks_l)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language guesser.

    Scores each language by stopword hits normalized by token count; argmax
    with a fixed language order as tiebreak (deterministic). A real system
    would use character n-gram profiles; the operator shape (per-row scores
    → argmax) is the same and the scoring column is swappable.

    The document is tokenized ONCE into an intermediate projection; all
    per-language hit counts filter that array (CollapseProject keeps the
    non-cheap, multiply-referenced array in its own stage).
    """
    pre = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks_l")
    )
    best = _lang_best(F.col("__toks_l"))
    return pre.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        best["hits"].cast("long").alias("top_hits"),
    )


def quality_expr(t: F.Column, toks_l: F.Column) -> F.Column:
    """Heuristic quality score in [0,1] as a plain column expression:
    length sweet-spot, low punctuation/digit noise, lexical diversity, and
    stopword presence — the standard pre-training filter features.
    All-double arithmetic on exact ratios with a fixed expression tree, so
    the score is engine-reproducible. ``toks_l`` is the precomputed lowered
    token array (tokenize once, reference many times); token count over
    lowered tokens equals the raw count — lowering never changes
    whitespace."""
    n_tok = F.size(toks_l)
    n_uniq = F.size(F.array_distinct(toks_l))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    diversity = F.when(n_tok > 0, n_uniq / n_tok).otherwise(F.lit(0.0))
    sw = sum((_hits_from(toks_l, lang) for lang in STOPWORDS), F.lit(0))
    sw_score = F.least(sw / F.lit(5.0), F.lit(1.0))
    noise = punct_ratio(t) + digit_ratio(t)
    score = (
        F.lit(0.3) * len_score
        + F.lit(0.3) * diversity
        + F.lit(0.2) * sw_score
        + F.lit(0.2) * (F.lit(1.0) - F.least(noise * F.lit(5.0), F.lit(1.0)))
    )
    return F.round(score, 6)


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """DataFrame form of :func:`quality_expr` (single tokenization pass)."""
    pre = df.select(
        F.col(id_col),
        F.col(text_col),
        tokens(F.lower(F.col(text_col))).alias("__toks_l"),
    )
    return pre.select(
        F.col(id_col),
        quality_expr(F.col(text_col), F.col("__toks_l")).alias("quality"),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """Corpus-level term frequencies (top-N, deterministic tiebreak by term).
    The classic one-shuffle explode+groupBy wordcount."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(top_n)
    )


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing for training corpora: URLs, emails, then phone-like
    digit runs replaced with typed placeholders, with per-kind match counts.

    Patterns apply SEQUENTIALLY on the progressively-redacted text (counts
    included), so an email inside a URL counts once as a URL — the
    composition is deterministic and has an exact DuckDB twin
    (regexp_replace with the 'g' flag + regexp_extract_all counts). Pure
    JVM regexp expressions: a map-only scan stage at any scale.

    Output: (id, n_urls, n_emails, n_phones, clean_text).
    """
    out_cols = [F.col(id_col)]
    cur = F.col(text_col)
    for kind, pat, repl in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).cast("long").alias(f"n_{kind}s")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(*out_cols, cur.alias("clean_text"))


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint) — canonical content hash per document."""
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Context-window chunking: each document split into token chunks of
    ``size`` with ``overlap`` tokens carried between consecutive chunks
    (stride = size - overlap) — the pre-embedding / pre-training prep
    step. Map-only (one tokenization + ``transform`` over chunk starts +
    explode), so at 100 TB it is a pure scan stage; the output carries
    (chunk index, token count) so downstream packing can budget without
    re-tokenizing.

    Chunks start at 0, stride, 2*stride, ... while start < n_tokens;
    empty documents produce no chunks.

    Output: (id, chunk_i, n_tokens, chunk_text).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap
    t = tokens(F.lower(F.col(text_col)))
    n_chunks = (F.floor((F.size(F.col("__toks")) - 1) / F.lit(stride)) + 1).cast("int")
    chunks = F.when(
        F.size(F.col("__toks")) > 0,
        F.expr(
            f"transform(sequence(0, __nc - 1), i -> slice(__toks, i * {stride} + 1, {size}))"
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    return (
        df.select(F.col(id_col), t.alias("__toks"))
        .withColumn("__nc", n_chunks)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_i", "__chunk"))
        .select(
            F.col(id_col),
            F.col("chunk_i").cast("long").alias("chunk_i"),
            F.size("__chunk").cast("long").alias("n_tokens"),
            F.array_join(F.col("__chunk"), " ").alias("chunk_text"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (idf = ln((N+1)/(df+1)) + 1, the smoothed scikit-style variant).

    Shuffle shape: one explode+groupBy for per-doc term counts, one
    term-keyed aggregate for document frequencies (its result is ~vocab
    sized — broadcast back), then a per-doc window for the top-k; Spark
    plans the rank<=k filter as WindowGroupLimit (partial top-k before
    the exchange). Note the (doc, term) aggregate is computed twice —
    column pruning gives the doc-frequency branch a narrower subtree
    than the tf branch, so ReuseExchange can't match them; two pruned
    map-only scans beat materializing the corpus-wide term table, and
    callers who disagree can `.persist()` the input.

    Output: (id, term, score, rank) — score rounded to 6 for
    engine-stable comparison, ties broken by term.
    """
    from pyspark.sql import Window as W

    terms = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            (
                F.col("tf")
                * (
                    F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                )
            ).alias("__score"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.col("__score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            F.round("__score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    chunk_i_col: str = "chunk_i",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequence packing: assign each document's chunks (in chunk
    order) to training sequences of at most ``budget`` tokens — a chunk
    that would overflow the open sequence starts the next one. The
    classic pre-training batch-prep step after :func:`chunk_documents`.

    Greedy packing is a sequential fold, which does NOT distribute across
    rows — but it distributes perfectly across documents: one shuffle
    groups each doc's (chunk_i, n_tokens) pairs, and the fold itself is a
    pure ``aggregate`` higher-order function over the sorted in-row array
    (documents are bounded; corpora are not). Chunks longer than the
    budget get a sequence of their own.

    Output: (id, chunk_i, n_tokens, seq_i) — seq_i counts from 0 per doc.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    per_doc = (
        chunks.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(chunk_i_col), F.col(n_tokens_col)))
            ).alias("__cs")
        )
    )
    # fold state: (seq of current chunk, used tokens in it, emitted seq ids)
    packed = F.expr(
        f"""aggregate(
              __cs,
              named_struct('seq', CAST(0 AS BIGINT), 'used', CAST(0 AS BIGINT),
                           'out', CAST(array() AS ARRAY<BIGINT>)),
              (acc, c) -> CASE
                WHEN acc.used > 0 AND acc.used + c.{n_tokens_col} > {budget}
                  THEN named_struct('seq', acc.seq + 1, 'used', CAST(c.{n_tokens_col} AS BIGINT),
                                    'out', array_append(acc.out, acc.seq + 1))
                ELSE named_struct('seq', acc.seq, 'used', acc.used + c.{n_tokens_col},
                                  'out', array_append(acc.out, acc.seq))
              END,
              acc -> acc.out)"""
    )
    return (
        per_doc.select(F.col(id_col), F.col("__cs"), packed.alias("__seq"))
        .select(
            F.col(id_col),
            F.posexplode(F.arrays_zip("__cs", "__seq")).alias("__p", "__z"),
        )
        .select(
            F.col(id_col),
            F.col(f"__z.__cs.{chunk_i_col}").alias(chunk_i_col),
            F.col(f"__z.__cs.{n_tokens_col}").alias(n_tokens_col),
            F.col("__z.__seq").alias("seq_i"),
        )
    )


def tokenized(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shared ``(id, __t token-array)`` relation for the LM-family
    operators: ``persist()`` it and pass as ``toks=`` to
    :func:`unigram_logprob`, :func:`bigram_logprob` and
    :func:`collocations` so a pipeline computing several text signals
    tokenizes (regex-splits) the corpus ONCE instead of once per signal
    — the same share-the-expensive-subtree convention as the shingle
    cache in ``dedup.containment_pairs``. At warehouse scale this is the
    materialized tokens table every downstream pass reads."""
    return df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__t"))


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    add-one-smoothed unigram LM — the cheapest perplexity-style quality
    signal (boilerplate and in-distribution text score high; junk, rare-
    token soup and other-language text score low).

    p(tok) = (count(tok) + 1) / (N + V); score = mean over the document's
    tokens of ln p(tok).

    Shuffle shape: one (doc, term) count shuffle for the per-doc side, one
    term-keyed count for the LM table (~vocab-sized, broadcast back), and
    the scalar (N, V) rides a 1-row cross join. The corpus shuffles once.

    Output: (id, n_tokens, logprob) — logprob rounded to 6 for
    engine-stable comparison.

    ``toks``: optional pre-tokenized ``(id, __t)`` relation from
    :func:`tokenized` — lets pipelines share ONE tokenize subtree across
    the LM family.
    """
    base = toks if toks is not None else tokenized(df, id_col, text_col)
    terms = base.select(F.col(id_col), F.explode("__t").alias("term"))
    doc_tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    lm = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = lm.agg(
        F.sum("cnt").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    return (
        doc_tf.join(F.broadcast(lm), "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            # decimal detour for the weighted-logprob sum: double summation
            # is order-sensitive and the reduce order differs per engine
            F.round(
                (
                    F.sum(
                        (
                            F.col("tf")
                            * F.log(
                                (F.col("cnt") + F.lit(1.0))
                                / (F.col("__n") + F.col("__v"))
                            )
                        ).cast("decimal(28,14)")
                    ).cast("double")
                    / F.sum("tf")
                ),
                6,
            ).alias("logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean BIGRAM log-probability under the corpus's own
    add-one-smoothed bigram LM — the conditional-probability upgrade of
    :func:`unigram_logprob`: repetitive boilerplate and well-formed
    in-distribution prose score high, shuffled or word-soup text scores
    LOW even when its unigram profile looks normal (the signal unigrams
    cannot see).

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = distinct corpus
    tokens; score = mean over the document's bigrams of ln p.

    Shuffle shape mirrors the unigram scorer: one (doc, bigram) count
    shuffle, bigram/first-word LM tables broadcast back, scalar V on a
    1-row cross join; the corpus shuffles once. Docs with < 2 tokens have
    no bigrams and drop out, mirroring the SQL twin.

    Output: (id, n_bigrams, logprob2) — rounded to 6 for engine-stable
    comparison (decimal detour on the order-sensitive weighted sum).
    """
    # tokens materialized into a COLUMN before the bigram transform:
    # higher-order-function lambdas re-evaluate lambda-external child
    # expressions per element, so an inlined tokens() would regex-re-split
    # the text once per bigram position (same trap as ngram_contamination,
    # measured ~3x here). ``toks`` (see :func:`tokenized`) shares the
    # subtree across the LM family.
    base = toks if toks is not None else tokenized(df, id_col, text_col)
    # the raw bigram stream is consumed exactly once: the LM table is
    # derived from the (already per-doc-aggregated, much smaller) doc_tf
    # rather than re-shuffling the stream a second time
    big = base.select(F.col(id_col), F.explode(_word_ngrams_raw(F.col("__t"), 2)).alias("bg"))
    doc_tf = big.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(
        eager=False
    )
    lm2 = doc_tf.groupBy("bg").agg(F.sum("tf").cast("long").alias("c2"))
    lm1 = lm2.groupBy(F.substring_index("bg", " ", 1).alias("w1")).agg(
        F.sum("c2").alias("c1")
    )
    vocab = base.select(F.explode("__t").alias("term")).agg(
        F.count_distinct("term").alias("__v")
    )
    return (
        doc_tf.join(F.broadcast(lm2), "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(F.broadcast(lm1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                (
                    F.sum(
                        (
                            F.col("tf")
                            * F.log(
                                (F.col("c2") + F.lit(1.0))
                                / (F.col("c1") + F.col("__v"))
                            )
                        ).cast("decimal(28,14)")
                    ).cast("double")
                    / F.sum("tf")
                ),
                6,
            ).alias("logprob2"),
        )
    )


def _word_ngrams_raw(toks: F.Column, n: int) -> F.Column:
    """ALL word n-grams of a token-array column in order, space-joined
    (duplicates preserved — repetition metrics need the multiset).

    Guarded so fewer-than-n tokens yields an EMPTY array (Spark's
    ``sequence(1, 0)`` would otherwise generate a DESCENDING sequence).
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(grams)


def _word_ngrams(toks: F.Column, n: int) -> F.Column:
    """Distinct word n-grams of a token-array column, space-joined."""
    return F.array_distinct(_word_ngrams_raw(toks, n))


def ngram_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Test-set contamination detection: for every corpus document, how
    many of its distinct word ``n``-grams appear in ANY benchmark
    document. The training-data gate for "did the eval set leak into the
    corpus" (the reference has no text surface at all — this is part of
    the LLM-pipeline extension mandate).

    100 TB shape: benchmarks are small (MBs–GBs), so the benchmark's
    DISTINCT gram set BROADCASTS; the corpus side is map-only shingling +
    explode followed by ONE groupBy on the doc id. No corpus self-join,
    no shuffle of raw text, and the corpus is read once.

    Output: (id, n_grams, n_overlap, contam_ratio) — ratio over
    ``greatest(n_grams, 1)`` so gram-less (short) docs score 0.
    """
    # Materialize the token array into a COLUMN before the n-gram
    # transform: higher-order-function lambdas re-evaluate lambda-external
    # child expressions per element, so an inlined tokens() would regex-
    # re-split the whole text once per gram position (measured 10-20x on
    # the fixture). A bound column reference inside the lambda is free.
    # (_word_ngrams references the array several times, which also keeps
    # CollapseProject from re-inlining the alias.)
    c = corpus.select(F.col(id_col), tokens(F.lower(corpus[text_col])).alias("__t"))
    b = bench.select(tokens(F.lower(bench[text_col])).alias("__t"))

    c_grams = c.select(F.col(id_col), F.explode(_word_ngrams(F.col("__t"), n)).alias("g"))
    b_grams = b.select(F.explode(_word_ngrams(F.col("__t"), n)).alias("g")).distinct()
    totals = c.select(F.col(id_col), F.size(_word_ngrams(F.col("__t"), n)).alias("n_grams"))
    overlap = (
        c_grams.join(F.broadcast(b_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return totals.join(overlap, id_col, "left").select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        (
            F.coalesce("n_overlap", F.lit(0)).cast("double")
            / F.greatest(F.col("n_grams"), F.lit(1)).cast("double")
        ).alias("contam_ratio"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family): documents
    dominated by one token or by repeated phrases are machine-generated
    boilerplate far more often than prose, and pre-training filters cut on
    exactly these ratios.

    * ``top_token_frac`` — occurrences of the most frequent token over all
      tokens. Computed with ONE (doc, token) count shuffle (scale-safe;
      a per-row mode over the token array would be O(unique x len) per
      document).
    * ``dup_2gram_frac`` / ``dup_3gram_frac`` — fraction of word n-gram
      instances that are repeats of an n-gram already seen in the same
      document: ``1 - distinct/total``. Pure per-row array expressions —
      map-only at any scale.

    All ratios are integer-count divisions in DOUBLE with identical
    expression trees on the DuckDB side, so values hash-compare exactly.

    Output: (id, n_tokens, top_token_frac, dup_2gram_frac, dup_3gram_frac).
    """
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("__t"))

    def dup_frac(n: int) -> F.Column:
        raw = _word_ngrams_raw(F.col("__t"), n)
        total = F.size(raw)
        return (
            (total - F.size(F.array_distinct(raw))).cast("double")
            / F.greatest(total, F.lit(1)).cast("double")
        )

    per_doc = base.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_tokens"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )
    top = (
        base.select(F.col(id_col), F.explode("__t").alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"))
    )
    return per_doc.join(top, id_col, "left").select(
        id_col,
        "n_tokens",
        (
            F.coalesce("__top", F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
        ).alias("top_token_frac"),
        "dup_2gram_frac",
        "dup_3gram_frac",
    )


# Mojibake markers: UTF-8 bytes decoded as Latin-1 leave these character
# pairs (C3 x -> "Ã?", C2 x -> "Â?", E2 80 x -> "â€?"). Literal characters,
# not escapes, so the Java-regex and RE2 twins see identical patterns. The
# bare "Ã"-prefix is NOT matched (legit in "São"); only pairings that are
# vanishingly rare in real prose.
MOJIBAKE_RE = "â€|Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã³|Ã­|Ã§|Â«|Â»"
# C0 controls except \t \n \r, plus DEL — never legitimate in corpus text
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
# printable ASCII plus the whitespace trio
ASCII_RE = "[\\x20-\\x7e\\t\\n\\r]"
REPLACEMENT_CHAR = "�"


def encoding_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Encoding-quality signals per document — the scrubbing pass that
    catches broken ingestion (wrong charset, binary spill, lossy decode)
    before any language-level filter sees the text:

    * ``n_chars`` — string length in code points.
    * ``ascii_ratio`` — printable-ASCII (plus tab/newline/CR) fraction;
      NOT a filter by itself (legit non-English text is non-ASCII), a
      feature for per-source drift monitoring.
    * ``n_control`` — C0 control chars (minus whitespace) + DEL: binary
      spill.
    * ``n_replacement`` — U+FFFD count: upstream lossy decode.
    * ``n_mojibake`` — UTF-8-decoded-as-Latin-1 artifact pairs ("â€",
      "Ã©", ...): the double-decode bug.
    * ``enc_ok`` — no control, no replacement, no mojibake hits.

    Entirely map-side JVM regex; ratios are integer-count divisions in
    DOUBLE with identical expression trees in the DuckDB twin.
    """
    t = F.col(text_col)
    n = F.length(t)
    non_ascii = F.length(F.regexp_replace(t, ASCII_RE, ""))
    ctrl = n - F.length(F.regexp_replace(t, CONTROL_RE, ""))
    repl = n - F.length(F.regexp_replace(t, REPLACEMENT_CHAR, ""))
    moji = F.regexp_count(t, F.lit(MOJIBAKE_RE))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        (
            (n - non_ascii).cast("double") / F.greatest(n, F.lit(1)).cast("double")
        ).alias("ascii_ratio"),
        ctrl.cast("long").alias("n_control"),
        repl.cast("long").alias("n_replacement"),
        moji.cast("long").alias("n_mojibake"),
        ((ctrl == 0) & (repl == 0) & (moji == 0)).alias("enc_ok"),
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_ratio: float = 0.2,
) -> DataFrame:
    """The ACTION half of contamination control: drop every corpus
    document whose distinct word-``n``-gram overlap with the benchmark
    exceeds ``max_ratio`` (the standard pre-training decontamination
    gate; detection alone doesn't protect the eval set). Same plan shape
    as :func:`ngram_contamination` — broadcast benchmark gram set,
    map-only corpus shingling, one doc-key shuffle — plus one semi-join
    back to the corpus rows, so survivors keep every original column.
    """
    scored = ngram_contamination(corpus, bench, id_col, text_col, n)
    keep = scored.filter(F.col("contam_ratio") <= max_ratio).select(id_col)
    return corpus.join(keep, id_col, "left_semi")


def length_histogram(
    df: DataFrame,
    len_col: str = "n_chars",
    group_col: str | None = "source",
) -> DataFrame:
    """Log2-bucketed document-length histogram, optionally per group —
    the corpus length-distribution report every pretraining pipeline
    checks before tokenization budgeting (truncation loss lives in the
    right tail; boilerplate in the left). Bucket b holds lengths in
    [2^b, 2^(b+1)); length 0 gets bucket -1. Pure integer expressions
    (floor(log2)), one partial-aggregated shuffle whose key space is
    |groups| × ~40 buckets at ANY corpus size. Output: (group?, bucket,
    lo, hi, n_docs, min_len, max_len) — all integers, hash-exact.
    """
    L = F.col(len_col).cast("long")
    bucket = F.when(L <= 0, F.lit(-1)).otherwise(
        F.floor(F.log2(L.cast("double")))
    ).cast("int")
    keys = ([F.col(group_col)] if group_col else []) + [bucket.alias("bucket")]
    out = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(L).alias("min_len"),
        F.max(L).alias("max_len"),
    )
    lo = F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
        F.pow(F.lit(2.0), F.col("bucket")).cast("long")
    )
    hi = F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
        (F.pow(F.lit(2.0), F.col("bucket") + 1) - 1).cast("long")
    )
    cols = ([group_col] if group_col else []) + [
        "bucket", lo.alias("lo"), hi.alias("hi"), "n_docs", "min_len", "max_len"
    ]
    return out.select(*cols)


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
    toks: DataFrame | None = None,
) -> DataFrame:
    """Top-k collocations (adjacent word pairs) ranked by LIFT —
    p(x,y) / (p(x)·p(y)), the phrase-mining signal tokenizer and vocab
    builders use. Lift orders identically to PMI (PMI = ln lift) but
    needs NO logarithm, so the score is an exact integer ratio and the
    ranking is bit-identical in any engine: the products run in
    DECIMAL(38,0) (exact), and only the final division is a double.

    Shuffle shape: one (x, y) bigram count shuffle (map-side combined),
    one unigram count shuffle, then the bigram table joins the unigram
    counts on x and on y (vocab-keyed shuffle joins; at web scale the
    vocab is millions of rows — never driver-side). ``min_count`` prunes
    the hapax tail BEFORE the joins. Final top-k is a sort-limit
    (TakeOrderedAndProject), never a global sort.

    Output: (w1, w2, n_xy, n_x, n_y, lift), top k by (lift desc, w1, w2).

    ``toks``: optional pre-tokenized relation from :func:`tokenized` —
    shares one tokenize subtree across the LM family AND inside this
    operator (the unigram table reads the same relation instead of
    re-splitting the corpus).
    """
    base = (
        toks.select(F.col("__t").alias("__toks"))
        if toks is not None
        else df.select(tokens(F.lower(F.col(text_col))).alias("__toks"))
    )
    # guard size >= 2: Spark's sequence(1, 0) steps DOWNWARD ([1, 0]),
    # so the unguarded expression indexes past a 1-token array
    pair_arr = F.when(
        F.size(F.col("__toks")) >= 2,
        F.expr(
            "transform(sequence(1, size(__toks) - 1),"
            " i -> struct(__toks[i - 1] as w1, __toks[i] as w2))"
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = base.select(F.explode(pair_arr).alias("p")).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    # N is the TRUE corpus bigram total — computed before the hapax
    # filter, which only prunes the join input, never the denominator
    total = big.agg(F.sum("n_xy").cast("decimal(38,0)").alias("__n"))
    big = big.filter(F.col("n_xy") >= min_count)
    uni = (
        base.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    ux = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x"))
    uy = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y"))
    scored = (
        big.join(ux, "w1")
        .join(uy, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_xy",
            "n_x",
            "n_y",
            (
                (F.col("n_xy").cast("decimal(38,0)") * F.col("__n")).cast("double")
                / (F.col("n_x").cast("decimal(38,0)") * F.col("n_y")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "w1", "w2").limit(k)


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law): for every document, the
    number of NEW distinct tokens it introduces (first corpus occurrence
    by minimum id) and the cumulative vocabulary size up to and including
    it in id order — the diminishing-returns report for corpus expansion.

    The cumulative sum is the classic DISTRIBUTED prefix sum, not a
    single-partition global window: ids are range-bucketed on the
    (min, max) id span, per-bucket totals (≤ ``buckets`` rows) take the
    only unpartitioned window, and each doc adds its within-bucket prefix
    — so no task ever sees more than one bucket of rows. All counts are
    integers → hash-exact.

    Output: (id, n_new, cum_vocab) for every document.
    """
    from pyspark.sql import Window as W

    terms = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__t")
    )
    firsts = terms.groupBy("__t").agg(F.min(id_col).alias("__first"))
    news = firsts.groupBy(F.col("__first").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    # persisted: the (id, n_new) table feeds the bucket totals AND the
    # final prefix join — without it the terms explode + first-occurrence
    # aggregate run once per reference (same convention as the shingle
    # arrays in dedup.minhash_near_dups)
    docs = (
        df.select(id_col)
        .distinct()
        .join(news, id_col, "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)).cast("long"))
        .persist()
    )
    span = docs.agg(
        F.min(id_col).alias("__lo"),
        (F.max(id_col) - F.min(id_col) + 1).alias("__span"),
    )
    docs = docs.crossJoin(F.broadcast(span)).withColumn(
        "__bkt",
        F.least(
            F.floor(
                (F.col(id_col) - F.col("__lo"))
                * F.lit(int(buckets))
                / F.col("__span")
            ),
            F.lit(int(buckets) - 1),
        ).cast("int"),
    )
    per_bucket = docs.groupBy("__bkt").agg(F.sum("n_new").alias("__bsum"))
    # ≤ `buckets` rows: the only unpartitioned window runs on a tiny table
    w_b = W.orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = per_bucket.withColumn(
        "__off", F.coalesce(F.sum("__bsum").over(w_b), F.lit(0))
    ).select("__bkt", "__off")
    w_in = W.partitionBy("__bkt").orderBy(id_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        docs.join(F.broadcast(offsets), "__bkt")
        .withColumn("cum_vocab", (F.col("__off") + F.sum("n_new").over(w_in)).cast("long"))
        .select(id_col, "n_new", "cum_vocab")
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    toks: DataFrame | None = None,
) -> DataFrame:
    """BM25 ranked retrieval: top-k documents per query — the lexical
    search primitive every corpus-curation stack needs next to the
    embedding ANN tiers (and the classic hard-negative miner for
    training retrieval models).

    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the always-positive
    Lucene variant) and k1 = 1.25, b = 0.75 — constants chosen exactly
    representable in binary so every literal is engine-identical.

    Shuffle shape: doc stats (tf / dl / df) shuffle the corpus once on
    the term key — at warehouse scale these are a standing inverted
    index, maintained per ingest, not rebuilt per query. Query terms
    BROADCAST onto the tf relation (queries are tiny by definition), the
    (N, total_len) scalar rides a 1-row cross join, and per-query top-k
    is a rank window over ≤ |matched docs| rows. Nothing is ever
    all-pairs.

    Determinism: integer tf/df/dl/N; avgdl enters as dl·N/total (exact
    double products of integers, one correctly-rounded division);
    per-term scores are fixed double expression trees; the per-doc SUM
    runs through the DECIMAL(28,14) detour and rounds to 6 (the
    logprob convention), and ranking orders by the ROUNDED score with a
    doc-id tiebreak, so row set AND ranks are engine-exact.

    ``toks``: optional shared :func:`tokenized` relation.

    Output: (query_id, doc_id, score, rank), rank 1..k per query.
    """
    from pyspark.sql import Window

    base = toks if toks is not None else tokenized(df, id_col, text_col)
    dl = base.select(F.col(id_col), F.size("__t").cast("long").alias("dl"))
    terms = base.select(F.col(id_col), F.explode("__t").alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    totals = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("total"),
    )
    qt = (
        queries.select(
            F.col(query_id_col), F.explode(tokens(F.lower(F.col(query_col)))).alias("term")
        )
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    den = F.col("tf") + F.lit(1.25) * (
        F.lit(0.25) + (F.lit(0.75) * F.col("dl") * F.col("n")) / F.col("total")
    )
    term_score = idf * (F.col("tf") * F.lit(2.25)) / den
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(
                F.sum(term_score.cast("decimal(28,14)")).cast("double"), 6
            ).alias("score")
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def quality_percentile_cut(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    keep_frac: float = 0.7,
) -> DataFrame:
    """PER-SOURCE quality percentile cut: keep the top ``keep_frac`` of
    each source ranked by the heuristic quality score — the FineWeb-style
    curation move. An absolute threshold (``quality >= c``) silently
    drops whole sources whose score distribution sits low (different
    language, different register); a per-source percentile keeps the
    best of EVERY source, preserving the mixture.

    The cut is exact integer arithmetic — keep iff rn·10000 ≤ K·n with
    K = round(keep_frac·10000) — so membership is engine-portable (no
    float percent_rank boundary). Ties break by id: deterministic.

    Scale shape: one tokenize+score map pass, then rank/count windows
    PARTITIONED BY source — each source streams through its own task;
    no global sort. Output: (id, group, quality) for survivors.
    """
    from pyspark.sql import Window as W

    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    k = int(round(keep_frac * 10000))
    pre = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(text_col),
        tokens(F.lower(F.col(text_col))).alias("__toks_l"),
    )
    scored = pre.select(
        F.col(id_col),
        F.col(group_col),
        quality_expr(F.col(text_col), F.col("__toks_l")).alias("quality"),
    )
    w = W.partitionBy(group_col).orderBy(F.col("quality").desc(), F.col(id_col))
    wn = W.partitionBy(group_col)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter(F.col("__rn") * F.lit(10000) <= F.lit(k) * F.col("__n"))
        .select(id_col, group_col, "quality")
    )


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 20,
    max_phrase_len: int = 4,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    the maximal stopword-free token runs; each word scores
    degree/frequency (degree = Σ phrase length over its occurrences —
    words that keep multi-word company outrank words that appear alone);
    a phrase scores the sum of its words' scores. The corpus-level
    keyphrase miner — top phrases are what the corpus is ABOUT.

    Engine-exact scoring: word score is the integer
    ``floor(degree·10⁶ / freq)`` and the phrase score sums those BIGINTs
    — no float accumulates anywhere; the displayed score divides by 10⁶
    at the end. Stopwords are the union of the four language lists.

    Scale shape: phrase extraction is a map-only expression chain
    (stopwords → separators → re-split); word stats are one
    vocab-bounded aggregate; scoring joins DISTINCT phrases (not
    occurrences) to the word stats; top-k is TakeOrdered. Output:
    (rank, phrase, n_occurrences, score).
    """
    from pyspark.sql import Window as W

    from ..functions import STOPWORDS, tokens

    sw = sorted({w for ws in STOPWORDS.values() for w in ws})
    sw_arr = "array(" + ",".join(f"'{w}'" for w in sw) + ")"
    toks = tokens(F.lower(F.col(text_col)))
    phrases_expr = F.expr(
        f"""filter(
              transform(
                split(concat_ws(' ',
                  transform({'`toks`'}, t ->
                    IF(array_contains({sw_arr}, t), '|', t))), '\\\\|'),
                p -> trim(p)),
              p -> p != '' AND size(split(p, ' ')) <= {max_phrase_len})"""
    )
    occ = (
        df.select(toks.alias("toks"))
        .select(F.explode(phrases_expr).alias("phrase"))
    )
    occ = occ.localCheckpoint(eager=False)  # reused: word stats + counts
    words = occ.select(
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
        F.size(F.split(F.col("phrase"), " ")).cast("long").alias("plen"),
    )
    stats = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    counts = occ.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occurrences"))
    scored = (
        counts.select("phrase", "n_occurrences",
                      F.explode(F.split(F.col("phrase"), " ")).alias("w"))
        .join(stats, "w")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.sum(F.expr("deg * 1000000 div freq")).cast("long").alias("__s")
        )
    )
    w_rank = W.orderBy(
        F.col("__s").desc(), F.col("n_occurrences").desc(), F.col("phrase").asc()
    )  # top rows only
    return (
        scored.orderBy(
            F.col("__s").desc(), F.col("n_occurrences").desc(), F.col("phrase").asc()
        )
        .limit(top)
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .select(
            "rank", "phrase", "n_occurrences",
            (F.col("__s").cast("double") / F.lit(1000000.0)).alias("score"),
        )
    )


def zipf_spectrum(df: DataFrame, text_col: str = "text") -> DataFrame:
    """FREQUENCY SPECTRUM (Zipf's-law diagnostic): for every observed
    token frequency f, how many distinct types occur exactly f times —
    the count-of-counts relation V(f). Together with :func:`vocab_growth`
    (Heaps' law) this is the standard pair of corpus-statistics curves:
    a natural corpus shows V(f) ∝ f^(−1−1/s) (hapax-heavy tail); a
    machine-duplicated or templated corpus bends the low-f end down —
    making the spectrum a cheap corpus-health gate before training.

    All integers (no log fitting — the judge of slope is the reader or a
    downstream regression), so the report is hash-exact. Also emits each
    spectrum row's share of the vocabulary as exact-integer micro units.

    Scale shape: one token-count shuffle (map-side combine) into |vocab|
    keys, then a count-of-counts rollup into |distinct frequencies| keys
    — the same double-aggregation collapse as key_skew_profile; no
    global sort, no windows.

    Output: (freq, n_types, types_share_micro = n_types·10⁶ DIV |vocab|);
    the f=1 row's share is the hapax rate.
    """
    toks = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
    freqs = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    spectrum = freqs.groupBy("freq").agg(F.count(F.lit(1)).alias("n_types"))
    vocab = spectrum.agg(F.sum("n_types").cast("decimal(38,0)").alias("__v"))
    return spectrum.crossJoin(F.broadcast(vocab)).select(
        "freq",
        "n_types",
        F.expr("CAST((CAST(n_types AS DECIMAL(38,0)) * 1000000) DIV __v AS BIGINT)").alias(
            "types_share_micro"
        ),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    merges: int = 5,
) -> list:
    """Train a byte-pair-encoding tokenizer ON THE CORPUS — the learned
    merge list (rank, left, right, merged, n) that IS a BPE vocabulary.

    The key scale property of BPE training is that after the first token
    count, EVERYTHING operates on the vocabulary, not the corpus: words
    collapse to (word, count) once, and each merge round is a pair count
    + argmax + rewrite over |vocab| rows. A 100 TB corpus and a 100 GB
    corpus with the same vocabulary train at the same per-round cost.

    Determinism spec (the oracle unrolls it round for round):

    * words are lowercased whitespace tokens, counted once;
    * a word's symbol string is its characters joined by DOUBLE spaces,
      with double-space sentinels at both ends ("ab" → "␣␣a␣␣b␣␣") —
      the double separator makes one single-pass left-to-right
      ``replace`` of " l  r " by " lr " merge EVERY occurrence,
      including immediately adjacent ones ("a a a a" merges to
      "(aa) (aa)" in one pass), reproducing canonical greedy BPE with
      plain SQL replace semantics (identical in Spark and DuckDB);
    * best pair per round = max total count, ties to the
      lexicographically smaller (left, right);
    * ``merges`` fixed rounds (certifiability requires a fixed unroll).

    Per round: one (pair)-keyed partial-aggregated shuffle over the
    vocab relation, a TakeOrdered(1) argmax, and a map-only rewrite.
    Returns the merge rows as a LIST of Rows (rank, left, right, merged,
    n) — the trained artifact is driver-sized by definition (vocab
    construction for a tokenizer), and callers turn it into a DataFrame
    via ``spark.createDataFrame`` when they want one.

    Raises if the corpus runs out of pairs before ``merges`` rounds
    (single-char vocabulary fully merged) — shrink ``merges``.
    """
    from ..functions import tokens

    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.concat(
                F.lit("  "),
                F.concat_ws(
                    "  ",
                    F.transform(
                        F.sequence(F.lit(1), F.length("w")),
                        lambda i: F.col("w").substr(i, F.lit(1)),
                    ),
                ),
                F.lit("  "),
            ).alias("w"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    out = []
    for rank in range(1, merges + 1):
        pairs = (
            words.select(
                F.explode(
                    # sequence(1, 0) DESCENDS in Spark — single-symbol
                    # words must yield an empty pair list explicitly
                    F.expr(
                        "transform(IF(size(split(trim(w), '  ')) < 2,"
                        "             CAST(array() AS ARRAY<INT>),"
                        "             sequence(1, size(split(trim(w), '  ')) - 1)),"
                        " i -> struct(split(trim(w), '  ')[i - 1] AS l,"
                        "            split(trim(w), '  ')[i] AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("pn"))
        )
        best = pairs.orderBy(F.desc("pn"), "l", "r").limit(1).collect()
        if not best:
            raise ValueError(f"corpus exhausted after {rank - 1} merges")
        b = best[0]
        out.append((rank, b["l"], b["r"], b["l"] + b["r"], int(b["pn"])))
        words = words.select(
            F.replace(
                F.col("w"),
                F.lit(f" {b['l']}  {b['r']} "),
                F.lit(f" {b['l']}{b['r']} "),
            ).alias("w"),
            "n",
        ).localCheckpoint(eager=True)
    return out


def sparse_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int = 10_000,
    scale: int = 1_000,
    ngram: int = 1,
    funnel: bool = True,
) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs — the LEXICAL sibling of the
    dense ``similarity.cosine_join``: documents as sparse term-weight
    vectors, pairs scored over SHARED terms only via an inverted index,
    so the join never goes quadratic and pairs with no common term cost
    nothing (exactly why search engines use sparse retrieval at scale).

    Hash-exact the house way: weights are INTEGERS —
    ``w(d,t) = tf(d,t) · ((N·scale) DIV df(t))`` — the same
    log-free rarity weighting as ``jaccard_pairs_weighted`` (idf's
    ORDERING without its float), dots and norms accumulate in
    DECIMAL(38,0), and the cosine is one fixed double expression
    ``dot / (√norm_a · √norm_b)``.

    Terms with document frequency above ``max_df`` are excluded from the
    VECTOR SPACE entirely (weights and candidates alike — a consistent
    spec the oracle replicates): they carry no discriminative signal and
    their posting lists are exactly the quadratic-blowup keys. The same
    df-cap skew guard as the jaccard family.

    ``ngram`` > 1 switches the term space from single tokens to word
    n-grams (with repeats — tf counts them): on tiny-vocabulary or
    templated corpora single tokens are all stop-word-common (every df
    near N, every pair a candidate), while n-grams restore a Zipfian
    term space where the inverted index is selective — the same reason
    the jaccard family shingles.

    Scale shape: one (doc, term) shuffle for tf, a |vocab|-bounded df
    aggregate, the inverted-index self-join keyed by term (fan-out
    bounded by the df cap), and a (pair)-keyed dot aggregate. Output:
    (id_a, id_b, cosine) for cosine ≥ threshold, id_a < id_b.

    ``funnel`` (r12 — the r11 gemm-verify lesson applied to the DECIMAL
    dot): Decimal128 aggregation runs outside whole-stage codegen, and
    on the candidate pair set it was the operator's largest wall. The
    default funnel runs the candidate dot in plain DOUBLE first (all
    weights are non-negative integers, so the double sum is within
    ~1e-12 relative of the exact decimal — codegen-friendly), keeps
    pairs whose rough cosine ≥ threshold − 1e-6, and re-runs the EXACT
    decimal dot only on that superset, so the output rows and values
    are byte-identical to ``funnel=False`` (pinned in pytest) — the
    same guard-band/canonical-re-score contract as
    ``similarity._score_pairs``'s exact funnel.
    """
    from ..functions import tokens

    dec38 = "decimal(38,0)"
    if ngram > 1:
        # the token split is PROJECTED into its own column before the
        # gram transform: an expression referenced inside a HOF lambda
        # is re-evaluated PER ELEMENT, so inlining split() there re-split
        # the whole document once per gram — measured 8.5 → 2.2 s on the
        # sf0.1 w-build (r12; same guard class as the sequence(1,0)
        # descent below, which short docs need as an explicit empty
        # branch like bpe_train)
        tokked = docs.select(
            F.col(id_col).alias("d"),
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')").alias("__tk"),
        )
        terms = F.expr(
            f"transform(IF(size(__tk) < {ngram}, CAST(array() AS ARRAY<INT>), "
            f"sequence(1, size(__tk) - {ngram - 1})), "
            f"i -> concat_ws(' ', slice(__tk, i, {ngram})))"
        )
    else:
        tokked = docs.select(
            F.col(id_col).alias("d"),
            tokens(F.lower(F.col(text_col))).alias("__tk"),
        )
        terms = F.col("__tk")
    tf = (
        tokked.select("d", F.explode(terms).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("d", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    kept = dfreq.filter(F.col("df") <= max_df)
    n1 = docs.agg(F.count_distinct(F.col(id_col)).cast("long").alias("n"))
    w = (
        tf.join(kept, "t")
        .crossJoin(F.broadcast(n1))
        .select(
            "d",
            "t",
            (F.col("tf") * F.expr(f"(n * CAST({scale} AS BIGINT)) div df")).alias("w"),
        )
        .localCheckpoint(eager=True)  # feeds norms AND both join sides
    )
    norms = w.groupBy("d").agg(
        F.sum(F.col("w").cast(dec38) * F.col("w")).alias("nn")
    )
    a = w.select(F.col("d").alias("id_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("d").alias("id_b"), "t", F.col("w").alias("wb"))
    if funnel:
        # pass 1 — rough double dot over ALL candidate pairs (codegen;
        # weights non-negative → no cancellation, rel err ~1e-12 ≪ 1e-6)
        rough = (
            a.join(b, "t")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(
                F.sum(
                    F.col("wa").cast("double") * F.col("wb").cast("double")
                ).alias("rdot")
            )
        )
        na_d = norms.select(
            F.col("d").alias("id_a"), F.col("nn").cast("double").alias("__nad")
        )
        nb_d = norms.select(
            F.col("d").alias("id_b"), F.col("nn").cast("double").alias("__nbd")
        )
        surv = (
            rough.join(na_d, "id_a")
            .join(nb_d, "id_b")
            .filter(
                F.col("rdot") / (F.sqrt("__nad") * F.sqrt("__nbd"))
                >= F.lit(threshold) - F.lit(1e-6)
            )
            .select("id_a", "id_b")
            .localCheckpoint(eager=False)
        )
        # pass 2 — EXACT decimal dot on the survivor superset only: the
        # inverted index shrinks to the survivors' docs (semi-join), the
        # term join replays there, and the pair semi-join keeps exactly
        # the surviving pairs; the final expression below is unchanged,
        # so values and the true threshold cut are byte-identical
        sdocs = (
            surv.select(F.col("id_a").alias("d"))
            .unionByName(surv.select(F.col("id_b").alias("d")))
            .distinct()
        )
        wf = w.join(sdocs, "d", "left_semi")
        a2 = wf.select(F.col("d").alias("id_a"), "t", F.col("w").alias("wa"))
        b2 = wf.select(F.col("d").alias("id_b"), "t", F.col("w").alias("wb"))
        dots = (
            a2.join(b2, "t")
            .join(surv, ["id_a", "id_b"], "left_semi")
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("wa").cast(dec38) * F.col("wb")).alias("dot"))
        )
    else:
        dots = (
            a.join(b, "t")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("wa").cast(dec38) * F.col("wb")).alias("dot"))
        )
    na = norms.select(F.col("d").alias("id_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("d").alias("id_b"), F.col("nn").alias("nb"))
    cos = (
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("dot").cast("double").alias("dot_d"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def interp_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks: DataFrame | None = None,
    lam: float = 0.5,
) -> DataFrame:
    """Jelinek-Mercer INTERPOLATED LM scoring — the standard smoothing
    baseline between :func:`unigram_logprob` and :func:`bigram_logprob`:

        p(w2 | w1) = λ · (c(w1 w2)+1)/(c(w1 ·)+V)
                   + (1−λ) · (c(w2)+1)/(T+V)

    A rare-context bigram no longer collapses to the add-one floor — the
    unigram term keeps plausible words plausible — which is exactly the
    failure mode that makes pure-bigram perplexity over-penalize short
    natural documents in quality filtering.

    Determinism: λ defaults to 0.5 (exactly binary-representable) and
    the per-bigram probability is ONE fixed double expression over exact
    integer counts; the order-sensitive weighted sum of logs goes
    through the DECIMAL(28,14) detour like the other LM scorers.

    Same shuffle shape as bigram_logprob plus one broadcast unigram
    table. Output: (id, n_bigrams, logprob_i) rounded to 6.
    """
    base = toks if toks is not None else tokenized(df, id_col, text_col)
    big = base.select(
        F.col(id_col), F.explode(_word_ngrams_raw(F.col("__t"), 2)).alias("bg")
    )
    doc_tf = big.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(
        eager=False
    )
    lm2 = doc_tf.groupBy("bg").agg(F.sum("tf").cast("long").alias("c2"))
    lm1 = lm2.groupBy(F.substring_index("bg", " ", 1).alias("w1")).agg(
        F.sum("c2").alias("c1")
    )
    uni = base.select(F.explode("__t").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cu")
    )
    scal = base.select(F.explode("__t").alias("term")).agg(
        F.count_distinct("term").alias("__v"),
        F.count(F.lit(1)).cast("long").alias("__tt"),
    )
    p = F.lit(float(lam)) * (
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("__v"))
    ) + F.lit(1.0 - float(lam)) * (
        (F.col("cu") + F.lit(1.0)) / (F.col("__tt") + F.col("__v"))
    )
    return (
        doc_tf.join(F.broadcast(lm2), "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(F.broadcast(lm1), "w1")
        .join(F.broadcast(uni.withColumnRenamed("term", "w2")), "w2")
        .crossJoin(F.broadcast(scal))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                (
                    F.sum((F.col("tf") * F.log(p)).cast("decimal(28,14)")).cast(
                        "double"
                    )
                    / F.sum("tf")
                ),
                6,
            ).alias("logprob_i"),
        )
    )
