"""Model-based property test: random insert/delete/find/index sequences
against a plain-Python list model (SURVEY §5 test plan item 4).

Index creation is interleaved randomly — the metamorphic property the
reference tests one case at a time (index presence never changes results)
is exercised here across arbitrary schedules.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shortcut_spark import BTreeIndex, HashIndex, Store, between, col_eq, eq

KEYS = ["a", "b", "c"]
VALS = ["x", "y"]

row_st = st.tuples(st.sampled_from(KEYS), st.sampled_from(VALS))

op_st = st.one_of(
    st.tuples(st.just("insert"), st.lists(row_st, min_size=1, max_size=4)),
    st.tuples(st.just("delete_eq"), st.sampled_from([0, 1]), st.sampled_from(KEYS + VALS)),
    st.tuples(st.just("index"), st.sampled_from([0, 1])),
    # compact sorted by a NON-rowid column interleaves rowids across files
    # (overlapping [min_rowid, max_rowid] ranges) — the schedule that broke
    # range-based tombstone consolidation (ADVICE r3: consolidate by
    # membership, not range)
    st.tuples(st.just("compact"), st.sampled_from([0, 1])),
    # restore to a random retained snapshot: changes() then emits
    # RESURRECTED pre-watermark rowids as inserts — the schedule that
    # broke follower convergence when the follower had tombstoned the
    # same rowid (ADVICE r4 high: resurrection must purge the tombstone,
    # not insert a second masked copy)
    st.tuples(st.just("restore")),
    # merge (atomic upsert on column 0): tombstones + insert in ONE
    # commit — the most complex mutation, interleaved with everything
    # else (r8); NULL keys append per the SQL contract
    st.tuples(st.just("merge"), st.lists(row_st, min_size=1, max_size=3)),
)


def model_matches(row, conds):
    from shortcut_spark.cmp import Condition

    return all(Condition(c.column, c.cmp).matches(row) for c in conds)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=1, max_size=5), data=st.data())
def test_store_matches_model(spark, tmp_path_factory, ops, data):
    path = str(tmp_path_factory.mktemp("prop") / "store")
    store = Store.create(spark, path, 2)
    model: list[tuple] = []
    snapshots = {store.manifest.version: list(model)}
    for op in ops:
        if op[0] == "insert":
            store.insert(op[1])
            model.extend(op[1])
        elif op[0] == "delete_eq":
            _, col, v = op
            conds = [eq(col, v)]
            # randomly exercise BOTH physical delete strategies — the
            # merge-on-read tombstone path must be model-indistinguishable
            # from copy-on-write under arbitrary schedules
            n = store.delete(conds, defer=data.draw(st.booleans()))
            expected_victims = [r for r in model if model_matches(r, conds)]
            assert n == len(expected_victims)
            model = [r for r in model if not model_matches(r, conds)]
        elif op[0] == "index":
            store.index(op[1], data.draw(st.sampled_from([HashIndex, BTreeIndex])))
        elif op[0] == "compact":
            store.compact(target_files=2, sort_by=f"c{op[1]}")
        elif op[0] == "restore":
            v = data.draw(st.sampled_from(sorted(snapshots)))
            store.restore(v)
            model = list(snapshots[v])
        elif op[0] == "merge":
            ins, repl = store.merge(op[1], on=0)
            keys = {r[0] for r in op[1] if r[0] is not None}
            victims = [r for r in model if r[0] in keys]
            assert (ins, repl) == (len(op[1]), len(victims))
            model = [r for r in model if r[0] not in keys] + list(op[1])
        snapshots[store.manifest.version] = list(model)
        # invariant after every op: find([]) == model as a multiset, and
        # len() (metadata-only under tombstones) agrees with the model
        got = sorted(tuple(r) for r in store.find([]).collect())
        assert got == sorted(model)
        assert len(store) == len(model)
    # final probes: a point find and a col=col find against the model
    conds = [eq(0, "a")]
    assert store.find(conds).count() == sum(1 for r in model if model_matches(r, conds))
    cc = [col_eq(0, 1)]
    assert store.find(cc).count() == sum(1 for r in model if model_matches(r, cc))


def test_snapshot_time_travel(spark, tmp_path):
    """Old manifest versions stay readable after deletes (snapshot-by-
    version, the MVCC-lite of SURVEY §2.2)."""
    path = str(tmp_path / "store")
    st1 = Store.create(spark, path, 2)
    st1.insert([("a", "1"), ("b", "2"), ("c", "3")])
    v_after_insert = st1.manifest.version
    st1.delete([eq(0, "a")])
    assert st1.find([]).count() == 2
    old = Store.open(spark, path, version=v_after_insert)
    assert old.find([]).count() == 3
    assert sorted(r[0] for r in old.find([]).collect()) == ["a", "b", "c"]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=12
    ),
)
@pytest.mark.slow
def test_asof_max_matches_bruteforce(spark, left, right):
    """asof_max == per-row brute force: max right ts <= left ts on the key,
    one output row per left input row (duplicates preserved)."""
    from shortcut_spark.operators.joins import asof_max

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "i long, k long, ts long"
    )
    rdf = spark.createDataFrame(right or [(99, -1)], "k long, rts long")
    if not right:
        rdf = rdf.filter("k < 0")  # genuinely empty right side
    got = sorted(
        (r["i"], r["asof_value"])
        for r in asof_max(ldf, rdf, "k", "k", "ts", "rts").collect()
    )
    want = sorted(
        (i, max((rts for rk, rts in right if rk == k and rts <= ts), default=None))
        for i, (k, ts) in enumerate(left)
    )
    assert got == want


# -- passage dedup vs a plain-Python model -----------------------------------

WORDS = ["aa", "bb", "cc", "dd", "ee"]
doc_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=10)


def _model_passages(toks, window=3):
    """Disjoint token windows incl. the shorter remainder (mirrors
    dedup.passage_arrays)."""
    return [
        " ".join(toks[i : i + window]) for i in range(0, len(toks), window)
    ]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_st, min_size=1, max_size=6))
def test_passage_dups_matches_model(spark, docs):
    from collections import defaultdict

    from shortcut_spark.operators.dedup import passage_dups

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["ph"]: (r["n_docs"], r["keeper"])
        for r in passage_dups(df, "doc_id", "text", window=3, min_docs=1).collect()
    }
    model = defaultdict(set)
    for i, toks in enumerate(docs):
        for p in _model_passages(toks):
            model[p].add(i)
    import hashlib

    want = {
        hashlib.md5(p.encode()).hexdigest(): (len(ids), min(ids))
        for p, ids in model.items()
    }
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_st, min_size=1, max_size=5), data=st.data())
def test_pii_redact_no_pii_is_identity(spark, docs, data):
    """Letter-only corpora pass through untouched; an injected email is
    counted and redacted exactly once per doc."""
    from shortcut_spark.operators.text import pii_redact

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    inject = data.draw(st.booleans())
    if inject:
        rows = [(i, t + f" x{i}@ex.org") for i, t in rows]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_redact(df, "doc_id", "text").collect()}
    for i, t in rows:
        r = out[i]
        assert r["n_urls"] == 0 and r["n_phones"] == 0
        if inject:
            assert r["n_emails"] == 1 and r["clean_text"].endswith("<EMAIL>")
        else:
            assert r["n_emails"] == 0 and r["clean_text"] == t


# --- round-2 operator properties vs pure-Python references ---------------


def _py_greedy_pack(sizes, budget):
    out, seq, used = [], 0, 0
    for n in sizes:
        if used > 0 and used + n > budget:
            seq, used = seq + 1, n
        else:
            used += n
        out.append(seq)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_pack_chunks_matches_python_fold(spark, docs):
    from shortcut_spark.operators.text import pack_chunks

    rows = [
        (d, i, n) for d, sizes in enumerate(docs) for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_i long, n_tokens long")
    got = {
        (r["doc_id"], r["chunk_i"]): r["seq_i"]
        for r in pack_chunks(df, budget=20).collect()
    }
    for d, sizes in enumerate(docs):
        expect = _py_greedy_pack(sizes, 20)
        assert [got[(d, i)] for i in range(len(sizes))] == expect


def _py_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)),
        min_size=1,
        max_size=20,
    )
)
@pytest.mark.slow
def test_connected_components_matches_union_find(spark, edges):
    from shortcut_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _py_components(edges)


def _model_cdc_chunks(toks, k=2, p=4):
    """Python reimplementation of dedup._cdc_chunks_expr: a cut lands
    before 1-based position i (i in k+1..n) iff the first-8-hex-digit
    value of md5(k-gram ending at i-1) is 0 mod p."""
    import hashlib

    n = len(toks)
    if n == 0:
        return []
    cuts = [1]
    if n > k:
        for i in range(k + 1, n + 1):
            gram = " ".join(toks[i - k - 1 : i - 1])
            if int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % p == 0:
                cuts.append(i)
    chunks = []
    for j, c in enumerate(cuts):
        end = cuts[j + 1] if j + 1 < len(cuts) else n + 1
        chunks.append(" ".join(toks[c - 1 : end - 1]))
    return chunks


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(st.lists(st.sampled_from(WORDS), min_size=0, max_size=40), min_size=1, max_size=6))
def test_cdc_chunks_match_model(spark, docs):
    """Spark's content-defined chunking equals a from-scratch Python model
    (cut rule, chunk spans, and order) on arbitrary token streams —
    including the n=0, n<=k, and no-interior-cut edge cases — and the
    chunks partition the document."""
    from shortcut_spark.operators.dedup import cdc_chunk_arrays

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in cdc_chunk_arrays(df, "doc_id", "text", k=2, p=4).collect():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["passage"]))
    for i, toks in enumerate(docs):
        want = _model_cdc_chunks(toks, k=2, p=4)
        have = [p for _, p in sorted(got.get(i, []))]
        assert have == want, f"doc {i}: {have} != {want}"
        assert " ".join(have).split() == toks  # exact partition


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=1, max_size=4), data=st.data())
def test_replica_converges_under_random_schedules(spark, tmp_path_factory, ops, data):
    """apply_changes model check: under ARBITRARY leader schedules
    (inserts, CoW and tombstone deletes, index builds, compactions, and
    RESTOREs to random retained snapshots), a follower that applies one
    delta per round converges to the leader's exact row multiset every
    round — including rounds whose net delta is empty (compact-only) and
    rounds that resurrect rowids the follower had tombstoned (the r4
    ADVICE divergence: the purge path must un-mask, not double-insert)."""
    base = tmp_path_factory.mktemp("repl")
    leader = Store.create(spark, str(base / "L"), 2)
    follower = Store.create(spark, str(base / "F"), 2)
    synced = leader.manifest.version
    versions = [leader.manifest.version]

    def rows_of(st):
        return sorted(tuple(r) for r in st.find([]).collect())

    for op in ops:
        if op[0] == "insert":
            leader.insert(op[1])
        elif op[0] == "delete_eq":
            _, col, v = op
            leader.delete([eq(col, v)], defer=data.draw(st.booleans()))
        elif op[0] == "index":
            leader.index(op[1], HashIndex)
        elif op[0] == "compact":
            leader.compact(target_files=2)
        elif op[0] == "restore":
            leader.restore(data.draw(st.sampled_from(versions)))
        elif op[0] == "merge":
            leader.merge(op[1], on=0)
        versions.append(leader.manifest.version)
        follower.apply_changes(leader.changes(synced))
        synced = leader.manifest.version
        assert rows_of(follower) == rows_of(leader)
        assert len(follower) == len(leader)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 4000)), min_size=2, max_size=12
    ),
    shift=st.integers(0, 10_000),
)
@pytest.mark.slow
def test_interval_overlap_shift_invariant_and_exact(spark, iv, shift):
    """Metamorphic: translating every interval by the same shift must not
    change the pair set (grid cell boundaries move, results cannot), and
    both translations equal the brute-force quadratic answer."""
    from shortcut_spark.operators.joins import interval_overlap_pairs

    rows = [(i, s, s + d) for i, (s, d) in enumerate(iv)]

    def run(delta):
        df = spark.createDataFrame(
            [(i, s + delta, e + delta) for i, s, e in rows], "iid long, st long, en long"
        )
        return {
            (r["id_a"], r["id_b"]): r["overlap_s"]
            for r in interval_overlap_pairs(df, "iid", "st", "en", cell_s=1000).collect()
        }

    brute = {}
    for i, (ia, sa, ea) in enumerate(rows):
        for ib, sb, eb in rows[i + 1 :]:
            if sa <= eb and sb <= ea:
                brute[(ia, ib)] = min(ea, eb) - max(sa, sb)
    assert run(0) == brute
    assert run(shift) == brute


def _model_shingles(toks, n=3):
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_st, min_size=1, max_size=6))
def test_containment_matches_set_model(spark, docs):
    """containment == |sh(a) ∩ sh(b)| / |sh(a)| for every ordered pair
    sharing a shingle, per a plain-Python set model."""
    from shortcut_spark.operators.dedup import containment_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["src_id"], r["sup_id"]): r["containment"]
        for r in containment_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    sh = {i: _model_shingles(toks) for i, toks in enumerate(docs)}
    want = {}
    for a in sh:
        for b in sh:
            if a == b or not sh[a]:
                continue
            inter = len(sh[a] & sh[b])
            if inter:
                want[(a, b)] = inter / len(sh[a])
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_st, min_size=1, max_size=6))
def test_novelty_matches_first_seen_model(spark, docs):
    """(n_shingles, n_novel) per doc match min-id ownership; summed
    n_novel equals the corpus's distinct shingle count."""
    from shortcut_spark.operators.dedup import novelty_scores

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in novelty_scores(df, "doc_id", "text").collect()
    }
    sh = {i: _model_shingles(toks) for i, toks in enumerate(docs)}
    owner = {}
    for i in sorted(sh):
        for s in sh[i]:
            owner.setdefault(s, i)
    want = {
        i: (len(s), sum(1 for x in s if owner[x] == i))
        for i, s in sh.items()
        if s
    }
    assert got == want
    assert sum(n for _, n in got.values()) == len(owner)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_st, min_size=1, max_size=6))
@pytest.mark.slow
def test_collocations_match_count_model(spark, docs):
    """Full (min_count=1) collocation table matches adjacent-pair /
    unigram count models, lift included (integer-derived doubles)."""
    from collections import Counter

    from shortcut_spark.operators.text import collocations

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(df, min_count=1, k=10**6).collect()
    big = Counter()
    uni = Counter()
    for toks in docs:
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(big.values())
    got = {(r["w1"], r["w2"]): (r["n_xy"], r["n_x"], r["n_y"], r["lift"]) for r in out}
    want = {
        (x, y): (c, uni[x], uni[y], c * n / (uni[x] * uni[y]))
        for (x, y), c in big.items()
    }
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_st, min_size=1, max_size=6), data=st.data())
@pytest.mark.slow
def test_vocab_growth_bucket_invariance(spark, docs, data):
    """The cumulative vocabulary curve equals the running-union model and
    is INVARIANT to the prefix-sum bucket count (1, 3, or 32 buckets)."""
    from shortcut_spark.operators.text import vocab_growth

    # sparse ids: stress range bucketing with gaps
    ids = sorted(
        data.draw(
            st.sets(st.integers(min_value=0, max_value=10**6), min_size=len(docs), max_size=len(docs))
        )
    )
    rows = [(ids[i], " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seen: set = set()
    want = {}
    for i, toks in zip(ids, (d for d in docs)):
        new = set(toks) - seen
        seen |= set(toks)
        want[i] = (len(new), len(seen))
    for buckets in (1, 3, 32):
        got = {
            r["doc_id"]: (r["n_new"], r["cum_vocab"])
            for r in vocab_growth(df, buckets=buckets).collect()
        }
        assert got == want, f"buckets={buckets}"


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pagerank_matches_integer_model(spark, edges):
    """Fixed-point PageRank is bit-identical to a plain-Python rendition
    of the same BIGINT floor-arithmetic spec (any engine must agree)."""
    from collections import defaultdict

    from shortcut_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["rank_i"] for r in pagerank(df, weight="w").collect()}
    # duplicate (src, dst) edges contribute independently, as in the operator
    SCALE, DN, DD, IT = 10**9, 17, 20, 5
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = defaultdict(int)
    for s, _, w in edges:
        outw[s] += w
    r = {v: SCALE // n for v in nodes}
    for _ in range(IT):
        nr = {v: (SCALE * (DD - DN)) // (n * DD) for v in nodes}
        for s, d, w in edges:
            nr[d] += (r[s] * w * DN) // (outw[s] * DD)
        r = nr
    assert got == r


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # label
            st.lists(
                st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_embedding_dispersion_matches_integer_model(spark, vecs):
    """Dispersion equals the plain-Python rendition of the quantized
    sufficient-statistics formula (n·A − B)/(n²·s²) on any group shape."""
    import math

    from shortcut_spark.operators.similarity import embedding_dispersion

    rows = [(i, list(v), g) for i, (g, v) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: (r["n_vecs"], r["dispersion"]) for r in embedding_dispersion(df).collect()}
    S = 10**6
    groups = {}
    for g, v in vecs:
        q = [math.floor(float(__import__("numpy").float32(x)) * S + 0.5) for x in v]
        groups.setdefault(g, []).append(q)
    want = {}
    for g, qs in groups.items():
        n = len(qs)
        A = sum(x * x for q in qs for x in q)
        B = sum(sum(q[j] for q in qs) ** 2 for j in range(len(qs[0])))
        want[g] = (n, float(n * A - B) / (float(n) * float(n) * float(S) * float(S)))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcxy ", min_size=0, max_size=24), min_size=1, max_size=12
    ),
    needle=st.text(alphabet="abcxy ", min_size=1, max_size=6),
    data=st.data(),
)
@pytest.mark.slow
def test_trigram_contains_matches_bruteforce(spark, tmp_path_factory, texts, needle, data):
    """Random corpus, random needle (both case variants): an indexed
    contains/icontains find must equal the brute-force Python filter —
    the superset-then-residual contract under adversarial gram overlap
    (repeated chars, spaces, sub-3-char needles)."""
    from shortcut_spark import TrigramIndex
    from shortcut_spark.cmp import contains, icontains

    ci = data.draw(st.booleans())
    path = str(tmp_path_factory.mktemp("trgm") / "store")
    st_ = Store.create(spark, path, 2)
    st_.index(0, TrigramIndex(case_insensitive=ci))
    rows = [(t, str(i)) for i, t in enumerate(texts)]
    # two batches so pruning has >1 file to choose from
    st_.insert(rows[: len(rows) // 2 + 1])
    if rows[len(rows) // 2 + 1 :]:
        st_.insert(rows[len(rows) // 2 + 1 :])
    got = sorted(r[1] for r in st_.find([contains(0, needle)]).collect())
    want = sorted(str(i) for i, t in enumerate(texts) if needle in t)
    assert got == want
    got_ci = sorted(r[1] for r in st_.find([icontains(0, needle.upper())]).collect())
    want_ci = sorted(
        str(i) for i, t in enumerate(texts) if needle.upper().lower() in t.lower()
    )
    assert got_ci == want_ci


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(st.sampled_from("AB"), st.integers(min_value=-50, max_value=50)),
        min_size=2,
        max_size=30,
    )
)
@pytest.mark.slow
def test_quantile_normalize_matches_model(spark, vals):
    """quantile_normalize equals a direct Python evaluation of its spec
    (within-group rank → ceil(r·N/n_g) → pooled order statistic) on
    random grouped integers with ties."""
    import math

    from shortcut_spark.operators.sketch import quantile_normalize

    rows = [(i, g, v) for i, (g, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {r["id"]: r["vnorm"] for r in quantile_normalize(df, "id", "v", "g").collect()}
    pooled = sorted(v for _g, v in vals)
    by_g = {}
    for i, (g, v) in enumerate(vals):
        by_g.setdefault(g, []).append((v, i))
    want = {}
    for g, members in by_g.items():
        members.sort()
        n_g, N = len(members), len(vals)
        for r, (_v, i) in enumerate(members, start=1):
            target = -(-r * N // n_g)  # ceil
            want[i] = pooled[target - 1]
    assert got == want


# ---------------------------------------------------------------------------
# streaming amend family under random trigger schedules (judge ask r7 #6):
# the r7 sessionize bug was an ordering-ACROSS-TRIGGERS bug — exactly the
# class random file splits find. Each example draws an event log (ties,
# out-of-order times, NULL ts, NULL types) plus a random partition of it
# into trigger files, runs one amend-family operator with
# maxFilesPerTrigger=1, and asserts the versioned read equals the batch
# twin over the whole log — streaming ≡ batch under ANY trigger split.

_amend_ev_st = st.lists(
    st.tuples(
        st.sampled_from([1, 2, 3]),  # user_id
        st.one_of(st.none(), st.integers(min_value=0, max_value=7_200_000_000)),
        st.one_of(
            st.none(), st.sampled_from(["view", "click", "purchase", "error"])
        ),
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=_amend_ev_st, data=st.data())
@pytest.mark.slow
def test_amend_family_schedule_invariant(spark, tmp_path_factory, events, data):
    import datetime as dt
    import uuid

    from shortcut_spark import streaming as stream_ops
    from shortcut_spark.operators.events import (
        funnel_reach,
        sequence_match,
        transition_counts,
    )

    op = data.draw(
        st.sampled_from(["sessionize", "funnel", "pattern", "transitions"])
    )
    # random split into 1..4 trigger files, order shuffled by hypothesis
    n_files = data.draw(st.integers(min_value=1, max_value=min(4, len(events))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(events) - 1),
                min_size=n_files - 1,
                max_size=n_files - 1,
            )
        )
    )
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (
            i + 1,
            u,
            None if off_us is None else base + dt.timedelta(microseconds=off_us),
            et,
            0.0,
            "{}",
        )
        for i, (u, off_us, et) in enumerate(events)
    ]
    sch = (
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string"
    )
    src = str(tmp_path_factory.mktemp("amend_sched") / "src")
    pieces, prev = [], 0
    for c in cuts + [len(rows)]:
        if c > prev:
            pieces.append(rows[prev:c])
            prev = c
    for piece in pieces:
        spark.createDataFrame(piece, sch).coalesce(1).write.mode("append").parquet(src)
    qn = f"prop_amend_{uuid.uuid4().hex[:8]}"
    full = spark.read.parquet(src)
    if op == "sessionize":
        got = sorted(
            (r["user_id"], r["session_i"], r["n_events"], r["start_epoch"], r["end_epoch"])
            for r in stream_ops.run_stream_sessionize(
                spark, src, query_name=qn, max_files_per_trigger=1
            ).collect()
        )
        want = sorted(
            (r["user_id"], r["session_i"], r["n_events"], r["start_epoch"], r["end_epoch"])
            for r in stream_ops.sessionize(full).collect()
        )
    elif op == "funnel":
        got = sorted(
            (r["user_id"], r["reached"], r["t0_epoch"], r["t1_epoch"], r["t2_epoch"])
            for r in stream_ops.run_stream_funnel(
                spark, src, query_name=qn, max_files_per_trigger=1
            ).collect()
        )
        want = sorted(
            (r["user_id"], r["reached"], r["t0_epoch"], r["t1_epoch"], r["t2_epoch"])
            for r in funnel_reach(full, ("view", "click", "purchase")).collect()
        )
    elif op == "pattern":
        got = sorted(
            (r["user_id"], r["n_b"], r["n_matched"])
            for r in stream_ops.run_stream_pattern(
                spark, src, query_name=qn, max_files_per_trigger=1
            ).collect()
        )
        want = sorted(
            (r["user_id"], r["n_b"], r["n_matched"])
            for r in sequence_match(full).collect()
        )
    else:
        # next_type can be NULL (the batch twin keeps (A, NULL) pairs) —
        # sort None-safely
        nskey = lambda t: tuple((x is None, x) for x in t)
        got = sorted(
            (
                (r["prev_type"], r["next_type"], r["n_transitions"])
                for r in stream_ops.run_stream_transitions(
                    spark, src, query_name=qn, max_files_per_trigger=1
                ).collect()
            ),
            key=nskey,
        )
        want = sorted(
            (
                (r["prev_type"], r["next_type"], r["n_transitions"])
                for r in transition_counts(full).collect()
            ),
            key=nskey,
        )
    assert got == want, (op, pieces)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    # in-horizon event log: per-user offsets within one hour, all files
    # delivered in non-decreasing max-time order so nothing is ever later
    # than the watermark horizon (ttl = 2 hours)
    events=st.lists(
        st.tuples(
            st.sampled_from([1, 2]),
            st.integers(min_value=0, max_value=3_600),
        ),
        min_size=2,
        max_size=8,
    ),
    data=st.data(),
)
@pytest.mark.slow
def test_sessionize_ttl_in_horizon_batch_equal_and_expires(
    spark, tmp_path_factory, events, data
):
    """state_ttl property: for ANY in-horizon schedule the TTL'd stream
    equals the batch twin (the knob only changes state retention), and a
    far-future closing event always expires the earlier users' state
    (numRowsRemoved > 0)."""
    import datetime as dt
    import uuid

    from shortcut_spark import streaming as stream_ops

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    sch = (
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string"
    )
    rows = [
        (i + 1, u, base + dt.timedelta(seconds=off), "view", 0.0, "{}")
        for i, (u, off) in enumerate(sorted(events, key=lambda e: e[1]))
    ]
    # closing event: user 99, far future — drives the watermark past
    # everyone's last event + ttl
    rows.append(
        (len(rows) + 1, 99, base + dt.timedelta(hours=30), "view", 0.0, "{}")
    )
    n_files = data.draw(st.integers(min_value=2, max_value=3))
    cut = data.draw(st.integers(min_value=1, max_value=len(rows) - 1))
    src = str(tmp_path_factory.mktemp("ttl_prop") / "src")
    pieces = [rows[:cut], rows[cut:]] if n_files == 2 else [
        rows[: cut // 2 or 1], rows[cut // 2 or 1 : cut], rows[cut:]
    ]
    for piece in pieces:
        if piece:
            spark.createDataFrame(piece, sch).coalesce(1).write.mode(
                "append"
            ).parquet(src)
    prog = []
    got = sorted(
        (r["user_id"], r["session_i"], r["n_events"], r["start_epoch"], r["end_epoch"])
        for r in stream_ops.run_stream_sessionize(
            spark, src, query_name=f"ttlp_{uuid.uuid4().hex[:8]}",
            max_files_per_trigger=1, state_ttl="2 hours", progress_out=prog,
        ).collect()
    )
    want = sorted(
        (r["user_id"], r["session_i"], r["n_events"], r["start_epoch"], r["end_epoch"])
        for r in stream_ops.sessionize(spark.read.parquet(src)).collect()
    )
    assert got == want
    removed = sum(
        so.get("numRowsRemoved", 0)
        for p in prog
        for so in (p.get("stateOperators") or [])
    )
    assert removed > 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=8),
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        ),
        min_size=1,
        max_size=12,
    )
)
@pytest.mark.slow
def test_gapfill_interp_matches_model(spark, obs):
    """Linear interpolation vs a plain-Python model over random sparse
    observations including ALL-NULL-value buckets — the edge the fixture
    never exercises: a bucket with events but no non-null values extends
    the spine yet is UNOBSERVED for interpolation, so spine edges beyond
    the last non-null observation interpolate to NULL."""
    import datetime as dt

    from shortcut_spark.operators.events import gapfill_interp

    base_epoch = 1_704_103_200  # 2024-01-01 10:00 UTC, hour-aligned
    rows = [
        (
            i,
            7,
            dt.datetime.utcfromtimestamp(base_epoch + b * 3600 + (i % 3) * 60),
            k,
            float(v) if v is not None else None,
            "{}",
        )
        for i, (k, b, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    got = {
        (r["event_type"], r["bucket_epoch"]): (
            r["n_events"],
            None if r["sum_value"] is None else float(r["sum_value"]),
            r["interp_sum_value"],
        )
        for r in gapfill_interp(df).collect()
    }

    # model
    cells: dict[tuple, list] = {}
    for k, b, v in obs:
        cell = cells.setdefault((k, b), [0, None])
        cell[0] += 1
        if v is not None:
            cell[1] = (cell[1] or 0.0) + float(v)
    want = {}
    for k in {k for k, _b, _v in obs}:
        bks = sorted(b for kk, b in cells if kk == k)
        observed = [(b, cells[(k, b)][1]) for b in bks if cells[(k, b)][1] is not None]
        for b in range(bks[0], bks[-1] + 1):
            n, s = cells.get((k, b), (0, None))
            prev = max(((ob, ov) for ob, ov in observed if ob <= b), default=None)
            nxt = min(((ob, ov) for ob, ov in observed if ob >= b), default=None)
            if prev is None or nxt is None:
                interp = None
            elif prev[0] == nxt[0]:
                interp = prev[1]
            else:
                interp = prev[1] + (nxt[1] - prev[1]) * (b - prev[0]) / (
                    nxt[0] - prev[0]
                )
            want[(k, (base_epoch + b * 3600))] = (n, s, interp)

    assert set(got) == set(want)
    for key in want:
        gn, gs, gi = got[key]
        wn, ws, wi = want[key]
        assert gn == wn, (key, got[key], want[key])
        assert (gs is None) == (ws is None) and (gs is None or abs(gs - ws) < 1e-9)
        assert (gi is None) == (wi is None) and (gi is None or abs(gi - wi) < 1e-9), (
            key, got[key], want[key],
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
        ),
        min_size=1,
        max_size=20,
    ),
    buckets=st.integers(min_value=1, max_value=6),
)
@pytest.mark.slow
def test_equidepth_histogram_matches_model(spark, vals, buckets):
    """Equi-depth bucket assignment vs a plain-Python model under heavy
    ties and NULLs: each DISTINCT value lands whole in bucket
    (cum_before · B) DIV n, NULL sorting first (Spark NULLS FIRST) —
    ties never split across buckets, which is the property a range
    partitioner depends on."""
    from collections import Counter

    from shortcut_spark.operators.sketch import equidepth_histogram

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(vals)], "id long, g string, v long"
    )
    got = {
        (r["g"], r["bucket"]): (r["lo"], r["hi"], r["n_rows"])
        for r in equidepth_histogram(df, "v", "g", buckets=buckets).collect()
    }
    want = {}
    for g in {g for g, _v in vals}:
        counts = Counter(v for gg, v in vals if gg == g)
        n = sum(counts.values())
        ordered = sorted(counts, key=lambda v: (v is not None, v))  # NULLS FIRST
        cum = 0
        per_bucket = {}
        for v in ordered:
            bkt = cum * buckets // n
            lo, hi, nr = per_bucket.get(bkt, (v, v, 0))
            # lo/hi are min/max over the bucket's values; NULL sorts first
            # but min/max IGNORE NULLs (Spark agg semantics)
            vals_in = [x for x in (lo, hi, v) if x is not None]
            per_bucket[bkt] = (
                min(vals_in) if vals_in else None,
                max(vals_in) if vals_in else None,
                nr + counts[v],
            )
            cum += counts[v]
        for bkt, (lo, hi, nr) in per_bucket.items():
            want[(g, bkt)] = (lo, hi, nr)
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=20),  # day offset
            st.sampled_from(["signup", "view"]),
        ),
        min_size=1,
        max_size=16,
    )
)
@pytest.mark.slow
def test_retention_cohorts_matches_model(spark, evs):
    """Weekly cohort retention vs a plain-Python model: cohort = ISO week
    (Monday-truncated) of the user's FIRST signup; activity BEFORE the
    cohort week doesn't count; users without a signup are excluded."""
    import datetime as dt

    from shortcut_spark.operators.events import retention_cohorts

    base = dt.datetime(2024, 1, 3, 12, 0, 0)  # a Wednesday
    rows = [
        (i, u, base + dt.timedelta(days=d), t, 0.0, "{}")
        for i, (u, d, t) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    got = {
        (r["cohort_epoch"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df, "signup").collect()
    }

    def week_start(d: dt.datetime) -> dt.datetime:
        return (d - dt.timedelta(days=d.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0
        )

    cohort = {}
    for _i, (u, d, t) in enumerate(evs):
        if t == "signup":
            w = week_start(base + dt.timedelta(days=d))
            if u not in cohort or w < cohort[u]:
                cohort[u] = w
    pairs = set()
    for u, d, _t in evs:
        if u in cohort:
            w = week_start(base + dt.timedelta(days=d))
            if w >= cohort[u]:
                pairs.add((u, w))
    want = {}
    for u, w in pairs:
        cep = int(cohort[u].replace(tzinfo=dt.timezone.utc).timestamp())
        off = int((w - cohort[u]).total_seconds() // (7 * 24 * 3600))
        want[(cep, off)] = want.get((cep, off), 0) + 1
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=5),  # token count
        ),
        min_size=1,
        max_size=14,
    ),
    ba=st.integers(min_value=0, max_value=12),
    bb=st.integers(min_value=0, max_value=12),
)
@pytest.mark.slow
def test_token_budget_sample_matches_model(spark, docs, ba, bb):
    """Budget packing vs a plain-Python model: per stratum, docs in
    (md5-hash, key) order are kept while the cumulative tokens BEFORE
    them sit under budget — overshoot by at most one doc, zero-budget
    strata drop entirely, zero-token docs ride free while the budget is
    open."""
    import hashlib

    from shortcut_spark.operators.sampling import token_budget_sample

    rows = [(i, s, " ".join(["w"] * n)) for i, (s, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = {"a": ba, "b": bb}
    got = sorted(
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_before"])
        for r in token_budget_sample(
            df, "doc_id", "source", "text", budgets
        ).collect()
    )

    def h(key):
        return int(hashlib.md5(f"budget:{key}".encode()).hexdigest()[:8], 16)

    want = []
    for s in ("a", "b"):
        members = sorted(
            ((i, n) for i, (ss, n) in enumerate(docs) if ss == s),
            key=lambda kn: (h(kn[0]), kn[0]),
        )
        cum = 0
        for i, n in members:
            if cum < budgets[s]:
                want.append((i, s, n, cum))
            cum += n
    assert got == sorted(want)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # hour offset
            st.sampled_from(["v", "c", "p", "e"]),
        ),
        min_size=1,
        max_size=20,
    ),
    k=st.integers(min_value=1, max_value=3),
)
@pytest.mark.slow
def test_windowed_topk_matches_model(spark, evs, k):
    """Hourly top-k vs a plain-Python model under COUNT TIES: rank order
    is (count desc, value asc) — total-order deterministic, so tied
    counts resolve identically in both."""
    import datetime as dt
    from collections import Counter

    from shortcut_spark.operators.events import windowed_topk

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (i, 1, base + dt.timedelta(hours=h, minutes=i % 60), t, 0.0, "{}")
        for i, (h, t) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    got = sorted(
        (r["hour_epoch"], r["rank"], r["value"], r["n_events"])
        for r in windowed_topk(df, k=k).collect()
    )
    want = []
    for h in {h for h, _t in evs}:
        cnt = Counter(t for hh, t in evs if hh == h)
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        ep = int(
            (base + dt.timedelta(hours=h)).replace(tzinfo=dt.timezone.utc).timestamp()
        )
        for r, (v, n) in enumerate(ranked[:k], start=1):
            want.append((ep, r, v, n))
    assert got == sorted(want)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=15),
    cap=st.integers(min_value=1, max_value=4),
)
def test_per_source_cap_matches_model(spark, docs, cap):
    """Source cap vs a plain-Python model: at most cap docs per source,
    picked in deterministic (md5-hash, key) order."""
    import hashlib

    from shortcut_spark.operators.sampling import per_source_cap

    rows = [(i, s) for i, s in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["doc_id"], r["source"], r["rank_in_source"])
        for r in per_source_cap(df, "doc_id", "source", cap).collect()
    )

    def h(key):
        return int(hashlib.md5(f"cap:{key}".encode()).hexdigest()[:8], 16)

    want = []
    for s in set(docs):
        members = sorted((i for i, ss in rows if ss == s), key=lambda i: (h(i), i))
        for r, i in enumerate(members[:cap], start=1):
            want.append((i, s, r))
    assert got == sorted(want)


@settings(max_examples=300, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_lsh_params_for_invariants(n):
    """Pure-math invariants of the r9 default sizing: total planes divide
    evenly into bands, expected bucket size stays bounded by the target
    (so per-band candidates stay ∝ N), and the banding's analytic recall
    for a cos-0.8 pair clears the 0.9 target the helper sizes for."""
    from shortcut_spark.operators.similarity import lsh_params_for

    planes, bands = lsh_params_for(n)
    assert planes % bands == 0 and bands >= 8
    per_band = planes // bands
    assert per_band >= 4
    # buckets per band = 2^per_band; expected bucket <= target (24) * 2
    assert n / (2 ** per_band) <= 24 * 2 + 1e-9
    # analytic recall at plane-agreement 0.92: 1 - (1 - p^k)^b >= 0.9
    band_hit = 0.92 ** per_band
    assert 1 - (1 - band_hit) ** bands >= 0.9 - 1e-9


@settings(max_examples=200, deadline=None)
@given(
    batches=st.lists(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=0, max_value=2**40)),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    ),
    wm_steps=st.lists(st.integers(min_value=0, max_value=10**6), min_size=8, max_size=8),
)
def test_amend_ver_monotone_and_expiry_dominant(batches, wm_steps):
    """_amend_ver properties under TTL: (a) strictly increasing across any
    in-run batch schedule with a monotone watermark; (b) cross-expiry
    dominance — a fresh post-expiry version (even from an all-NULL-ts
    batch, prev_ver=0) beats every pre-expiry version, because expiry
    requires the watermark to strictly pass the old state's last event
    and arm-time watermark (the r8 ADVICE NULL-ts scenario)."""
    from shortcut_spark.streaming import _NULL_ES, _amend_ver

    class FakeState:
        def __init__(self, wm):
            self.wm = wm

        def getCurrentWatermarkMs(self):
            return self.wm

    ttl = 60_000
    evs, ver, wm = [], 0, 0
    vers = []
    for batch, step in zip(batches, wm_steps):
        wm += step
        for ts in batch:
            evs.append((_NULL_ES if ts is None else ts * 1000, 1))
        ver = _amend_ver(evs, ver, ttl, FakeState(wm))
        vers.append(ver)
    assert all(b > a for a, b in zip(vers, vers[1:]))  # strictly increasing

    # cross-expiry: old state emitted at watermark wm_old with last event
    # mx_old; the timer sits at max(mx_old + ttl, wm_old + 1), so any
    # post-expiry watermark is strictly greater — the fresh NULL-ts-only
    # emission must win
    mx_old = max((e[0] for e in evs if e[0] != _NULL_ES), default=0) // 1000
    old_ver = vers[-1]
    expiry_wm = max(mx_old + ttl, wm + 1) + 1
    fresh = _amend_ver([(_NULL_ES, 9)], 0, ttl, FakeState(expiry_wm))
    assert fresh > old_ver


def _py_triangles(edges):
    """Brute-force per-node triangle counts over the undirected simple
    graph induced by ``edges`` (self-loops and duplicates dropped — the
    operator's documented canonicalization)."""
    from itertools import combinations

    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        es.add((min(a, b), max(a, b)))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)),
        min_size=1,
        max_size=24,
    )
)
@pytest.mark.slow
def test_triangle_counts_matches_bruteforce(spark, edges):
    """Degree-ordered wedge enumeration must count exactly the same
    triangles as naive triple enumeration on ANY graph — duplicates,
    self-loops, ties in degree, whatever hypothesis finds."""
    from shortcut_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == _py_triangles(edges)
