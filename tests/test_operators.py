"""Operator-level tests: dedup thresholds, ANN recall, sampling
determinism, multimodal plumbing, stats math vs pandas."""

import pandas as pd

from pyspark.sql import functions as F

from mini_html_parser_spark.operators import dedup, multimodal, sampling, similarity


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again for luck"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup of 1 (1 token of 14)
        (4, "completely different words about spark catalyst tungsten arrow"),
        (5, "yet another unrelated document mentioning parquet and shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    df = _corpus(spark)
    dups = dedup.exact_duplicates(df).collect()
    assert len(dups) == 1
    assert dups[0]["keep_id"] == 1 and dups[0]["n_copies"] == 2
    survivors = {r["doc_id"] for r in dedup.exact_dedup(df).collect()}
    assert survivors == {1, 3, 4, 5}


def test_minhash_jaccard_near_dup_threshold(spark):
    df = _corpus(spark)
    cands = dedup.minhash_lsh_candidates(df, num_hashes=64, bands=32)
    pairs = dedup.jaccard_verify(cands, df, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got          # identical
    assert (1, 3) in got or (2, 3) in got  # near dup crosses 0.5
    assert all(a not in (4, 5) and b not in (4, 5) for a, b in got)


def test_simhash_near_dup(spark):
    df = _corpus(spark)
    sigs = dedup.simhash(df)
    vals = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert vals[1] == vals[2]  # identical text → identical signature
    pairs = dedup.simhash_candidates(sigs, max_hamming=16)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((1, 2)) == 0


def test_mass_duplicate_bucket_stays_linear(spark):
    """10k identical docs: all-pairs inside the shared bucket would be
    ~5·10⁷ candidate pairs; the star-edge path (buckets above
    MAX_BUCKET_PAIRS_SIZE emit representative→member edges) emits
    exactly n−1 edges and completes in seconds."""
    import time

    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "mass duplicated boilerplate page body with enough tokens "
            "to shingle into several distinct trigrams"
        ).alias("text"),
    )
    t0 = time.time()
    assert dedup.minhash_lsh_candidates(df).count() == n - 1
    assert dedup.exact_shingle_duplicates(df).count() == n - 1
    sig_pairs = dedup.simhash_candidates(dedup.simhash(df))
    assert sig_pairs.count() == n - 1
    assert time.time() - t0 < 120


def test_embedding_mass_duplicates_stay_linear(spark):
    """The heavy-carry (join-shaped) pair emitter also star-edges big
    buckets: 5k identical vectors → one bucket → n−1 edges, not
    ~1.25·10⁷ pairs."""
    n = 5000
    vec = [0.1, -0.2, 0.3, 0.05, -0.4, 0.25, 0.15, -0.1]
    df = spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<float>"
    )
    pairs = similarity.embedding_near_duplicates(df, threshold=0.999)
    assert pairs.count() == n - 1


def test_small_buckets_still_emit_all_pairs(spark):
    """Below the cap the exact LSH construction is unchanged: a
    4-member duplicate group yields all 6 pairs."""
    rows = [(i, "identical duplicate group text repeated across members often") for i in range(4)]
    rows += [(10 + i, f"unique{i} filler document about topic number {i} entirely") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(df).collect()}
    assert {(a, b) for a in range(4) for b in range(4) if a < b} <= got
    exact = {(r["id_a"], r["id_b"]) for r in dedup.exact_shingle_duplicates(df).collect()}
    assert exact == {(a, b) for a in range(4) for b in range(4) if a < b}


def test_shingle_fingerprint_separator_safe(spark):
    """ADVICE r2: '|' is a legal token char, so a raw '|'-join of the
    sorted shingle set could make DISTINCT sets serialize identically
    (tokens ['x','y'] vs the single token 'x|y' at shingle_n=1).
    Per-shingle md5 before the join prevents the false duplicate."""
    df = spark.createDataFrame(
        [(0, "x y"), (1, "x|y")], "doc_id long, text string"
    )
    assert dedup.exact_shingle_duplicates(df, shingle_n=1).count() == 0
    # and true duplicates still pair
    df2 = spark.createDataFrame(
        [(0, "x|y"), (1, "x|y")], "doc_id long, text string"
    )
    assert dedup.exact_shingle_duplicates(df2, shingle_n=1).count() == 1


def test_lsh_topk_finds_planted_neighbors(spark):
    """Positive scaling preserves every hyperplane sign, so scaled
    copies of the query land in its bucket deterministically — LSH
    must surface them as exact-cosine-1 neighbors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    planted = spark.createDataFrame(
        [(9001, [0.5 * x for x in q]), (9002, [2.0 * x for x in q])],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)

    brute = similarity.brute_force_topk(corpus, q, k=3).collect()
    assert [r["vec_id"] for r in brute] == [7, 9001, 9002]
    assert all(r["cosine"] == 1.0 for r in brute)

    ann = similarity.lsh_topk(corpus, q, k=3, n_planes=8, probe_hamming=0).collect()
    assert [r["vec_id"] for r in ann] == [7, 9001, 9002]
    assert all(r["cosine"] == 1.0 for r in ann)


def test_as_of_join_semantics(spark):
    """Backward inclusive as-of: latest right.ts ≤ left.ts per key;
    equal timestamps match; no prior row → null; keys isolated."""
    from mini_html_parser_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "u1", 10.0, "a"), (2, "u1", 20.0, "b"),
         (3, "u2", 5.0, "c"), (4, "u3", 9.0, "d")],
        "event_id long, user_id string, ts double, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 10.0, 100.0), ("u1", 15.0, 150.0), ("u1", 25.0, 250.0),
         ("u2", 7.0, 70.0)],
        "user_id string, ts double, value double",
    )
    rows = as_of_join(left, right, "user_id", "ts", ["value"]).collect()
    got = {r["event_id"]: r["asof_value"] for r in rows}
    assert got == {1: 100.0,   # equal ts is inclusive
                   2: 150.0,   # latest ≤ 20 is 15
                   3: None,    # u2's only view is later
                   4: None}    # u3 has no views at all
    # the matched right timestamp is emitted alongside
    ts_of = {r["event_id"]: r["asof_ts"] for r in rows}
    assert ts_of[1] == 10.0 and ts_of[2] == 15.0 and ts_of[3] is None

    # tolerance (merge_asof semantics): matches older than ts-tol null out
    tol = {
        r["event_id"]: r["asof_value"]
        for r in as_of_join(
            left, right, "user_id", "ts", ["value"], tolerance=3.0
        ).collect()
    }
    assert tol == {1: 100.0,  # gap 0 ≤ 3
                   2: None,   # gap 5 > 3 → nulled
                   3: None, 4: None}


def test_dedup_clusters_connected_components(spark):
    """Min-label propagation over candidate edges: a 4-node chain, a
    2-node pair, and a 1000-member star (the shape _bucket_pairs emits
    for mass duplicates) all collapse to their min-id cluster."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    edges += [(100, i) for i in range(101, 1100)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dedup_clusters(df).collect()}
    assert {got[i] for i in (1, 2, 3, 4)} == {1}
    assert got[10] == got[11] == 10
    assert {got[i] for i in range(100, 1100)} == {100}
    assert len(got) == 4 + 2 + 1000


def test_bpe_tokenizer_parity(spark):
    """The JVM-expression BPE (bpe_token_count_col) must agree with
    the pure-Python reference implementation; the DuckDB oracle side
    is covered by the token_counts_bpe driver query."""
    from mini_html_parser_spark.operators import bpe

    texts = [
        "the quick brown fox", "This, THAT and the other thing!",
        "llll lll ll l", "", "   ", "a", "&*^% #@!",
        "internationalization 1234 (approx)", "thethethe",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", bpe.bpe_token_count_col(F.col("text")).alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == bpe.count_tokens(t), (t, got[i], bpe.encode(t))
    # pinned tokenizations (merge-table sanity)
    assert bpe.encode("the") == ["the"]
    assert bpe.encode("this that") == ["this", "that"]
    assert bpe.encode("ing") == ["ing"]


def test_ivf_topk_finds_planted_neighbors(spark):
    """IVF: scaled copies of the query have cosine 1.0 and must be
    recalled from the probed lists (identical direction → same list
    region; n_probe=3 of 8 covers quantization edges)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    planted = spark.createDataFrame(
        [(9001, q), (9002, [float(x) for x in q])],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    ann = similarity.ivf_topk(corpus, q, k=3, n_centroids=8, n_probe=3).collect()
    assert [r["vec_id"] for r in ann] == [7, 9001, 9002]
    assert all(r["cosine"] == 1.0 for r in ann)


def test_bpe_randomized_parity(spark):
    """JVM-expression BPE == pure-Python BPE on 200 random strings
    (mixed scripts, digits, punctuation, whitespace runs, boundary
    chars) — one batched Spark round-trip."""
    import random

    from mini_html_parser_spark.operators import bpe

    rng = random.Random(20260816)
    # \x0b \x1c \xa0: the per-engine \s divergence chars (ADVICE r2) —
    # PRETOKEN_RE's explicit whitespace class must make Spark (Java),
    # DuckDB (RE2) and Python agree on them
    alphabet = "abcdefgh THEREthe 0123!?.,;\n\té漢я \x1e\x0b\x1c\xa0" + '"'
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", bpe.bpe_token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == bpe.count_tokens(t), (i, t, bpe.encode(t))


def test_learn_bpe_matches_reference_algorithm(spark):
    """learn_bpe (Spark word-count + driver merge loop) must equal a
    from-scratch Sennrich implementation on the same corpus, and the
    learned merges must plug into the apply path."""
    from mini_html_parser_spark.operators import bpe

    texts = ["low low low low low", "lower lower newest newest",
             "newest newest newest widest widest", "low lower newest"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = bpe.learn_bpe(df, n_merges=6, top_words=100)

    # independent reference: count pretokens with plain Python, then
    # the classic pair-merge loop
    import re
    from collections import Counter
    vocab = Counter()
    for t in texts:
        for m in re.finditer(bpe.PRETOKEN_RE, t):
            vocab[tuple(m.group(0))] += 1
    want = []
    v = dict(vocab)
    for _ in range(6):
        pc = Counter()
        for syms, c in v.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (x, y), _ = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((x, y))
        nv = {}
        for syms, c in v.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y); i += 2
                else:
                    out.append(syms[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        v = nv
    assert got == want

    # learned merges drive both the Python and the JVM apply paths
    n_learned = bpe.count_tokens("newest lowest", merges=got)
    n_default = bpe.count_tokens("newest lowest")
    assert n_learned <= len("newest lowest".replace(" ", ""))
    row = df.limit(1).select(
        bpe.bpe_token_count_col(F.lit("newest lowest"), merges=got).alias("n")
    ).first()
    assert row["n"] == n_learned


def test_sample_exact_n_deterministic(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = [r["doc_id"] for r in sampling.sample_exact_n(df, 50, seed=1).collect()]
    b = [r["doc_id"] for r in sampling.sample_exact_n(df, 50, seed=1).collect()]
    c = [r["doc_id"] for r in sampling.sample_exact_n(df, 50, seed=2).collect()]
    assert a == b
    assert set(a) != set(c)
    assert len(set(a)) == 50


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "spark")], "doc_id long, text string"
    )
    media = multimodal.attach_media_payload(df)
    feats = {r["doc_id"]: r for r in multimodal.extract_media_features(media).collect()}
    assert feats[1]["byte_len"] == 11
    assert feats[1]["format"] == ["png", "jpeg", "webp"][11 % 3]
    assert feats[1]["width"] == 64 + (11 % 97) * 4
    assert feats[2]["byte_len"] == 5
    assert feats[1]["media_ref"] == "media://blob/1"


def test_span_stats_match_pandas(spark):
    """B18 two-level stats equal a pandas reimplementation of the
    reference's groupby/describe on the same extracted spans."""
    from mini_html_parser_spark.datagen import generate_pandas
    from mini_html_parser_spark.operators.extract import (
        DOCUMENTS_SCHEMA, extract_documents,
    )
    from mini_html_parser_spark.operators.stats import span_stats

    pdf = generate_pandas(12, seed=7)
    ext = extract_documents(
        spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA), "boilerplate_strip"
    )
    got = span_stats(ext).toPandas()

    # pandas oracle (mirrors compute_aggregate_stats.py:48-90)
    rows = []
    for r in ext.collect():
        for s in r["spans"]:
            tl = float(s["char_end_idx"] - s["char_start_idx"])
            rows.append({"doc_id": r["doc_id"], "tag": s["value"], "tl": tl})
    odf = pd.DataFrame(rows)
    oracle = odf.groupby(["doc_id", "tag"])["tl"].agg(
        ["count", "mean", "median", "std", "max", "min"]
    ).reset_index()

    merged = got.merge(oracle, left_on=["doc_id", "tag"], right_on=["doc_id", "tag"])
    assert len(merged) == len(oracle) == len(got)
    for _, m in merged.iterrows():
        assert m["count_per_doc"] == m["count"]
        assert abs(m["text_length_mean"] - m["mean"]) < 1e-9
        assert abs(m["text_length_median"] - m["median"]) < 1e-9
        assert (pd.isna(m["text_length_std"]) and pd.isna(m["std"])) or \
            abs(m["text_length_std"] - m["std"]) < 1e-9


def test_as_of_join_split_hot_keys_parity(spark):
    """split_hot_keys=N must produce EXACTLY the unsplit results —
    randomized keys/timestamps incl. ties, carry-across-empty-ranges,
    keys with no right rows, and tolerance interaction."""
    import random

    from mini_html_parser_spark.operators.joins import as_of_join

    rng = random.Random(20260816)
    left_rows = [
        (i, rng.choice(["a", "b", "c", "hot"]), float(rng.randint(0, 1000)))
        for i in range(400)
    ]
    # key "c" gets no right rows; right rows cluster early so later
    # ranges exercise the carry-in path
    right_rows = [
        (rng.choice(["a", "b", "hot"]), float(rng.randint(0, 300)), rng.random())
        for _ in range(150)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, user_id string, ts double")
    right = spark.createDataFrame(right_rows, "user_id string, ts double, value double")

    def key(rows):
        return sorted(
            (r["event_id"], r["asof_value"], r["asof_ts"]) for r in rows
        )

    for tol in (None, F.lit(50.0)):
        base = key(as_of_join(left, right, "user_id", "ts", ["value"],
                              tolerance=tol).collect())
        for n in (2, 7, 16):
            split = key(as_of_join(left, right, "user_id", "ts", ["value"],
                                   tolerance=tol, split_hot_keys=n).collect())
            assert split == base, (tol, n)


def test_as_of_join_split_hot_key_no_straggler(spark):
    """One key holding ~10⁶ rows: the split plan windows on
    (key, range) — the hot key spreads over N tasks instead of
    serializing into one — and still returns exact results."""
    import time

    from pyspark.sql import functions as F2

    from mini_html_parser_spark.operators.joins import as_of_join

    n = 1_000_000
    left = spark.range(n).select(
        F2.col("id").alias("event_id"),
        F2.lit("bot").alias("user_id"),
        (F2.col("id") * 2.0).alias("ts"),
    )
    right = spark.range(n // 2).select(
        F2.lit("bot").alias("user_id"),
        (F2.col("id") * 4.0 + 1.0).alias("ts"),
        F2.col("id").cast("double").alias("value"),
    )
    out = as_of_join(left, right, "user_id", "ts", ["value"], split_hot_keys=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the big window partitions by (key, range), not key alone
    assert "hashpartitioning(user_id" in plan and "_rg" in plan

    t0 = time.time()
    agg = out.select(
        F2.count("*").alias("n"),
        F2.sum("asof_value").alias("sv"),
        F2.count("asof_value").alias("nv"),
    ).first()
    elapsed = time.time() - t0
    assert agg["n"] == n
    # exact expectation: left ts=2i matches right ts=4j+1 with the
    # greatest 4j+1 <= 2i -> j = floor((2i-1)/4), value=j; null for i=0
    expect_nv = n - 1
    expect_sv = sum((2 * i - 1) // 4 for i in range(1, n))
    assert agg["nv"] == expect_nv
    assert int(agg["sv"]) == expect_sv
    assert elapsed < 120, f"hot-key as-of took {elapsed:.1f}s"


def test_bpe_fixpoint_matches_classic_reference():
    """fixpoint=True must equal a from-scratch classic BPE
    (lowest-present-rank iteration over symbol sequences) everywhere —
    including repeated-pair inputs and suffix-overlap merge tables
    where the single-pass string-replace form diverges."""
    import random

    from mini_html_parser_spark.operators import bpe

    def classic(word, merges):
        ranks = {p: i for i, p in enumerate(merges)}
        syms = list(word)
        while len(syms) > 1:
            cand = [(ranks[p], p) for p in set(zip(syms, syms[1:])) if p in ranks]
            if not cand:
                break
            _, (x, y) = min(cand)
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return tuple(syms)

    # pinned divergence: single-pass string replace crosses a symbol
    # boundary / re-creates earlier pairs; fixpoint must not
    div_merges = [("a", "a"), ("b", "a"), ("a", "b"), ("ab", "ab")]
    assert bpe.encode_pretoken("aabbaabaa", div_merges) != classic("aabbaabaa", div_merges)
    assert bpe.encode_pretoken("aabbaabaa", div_merges, fixpoint=True) == classic("aabbaabaa", div_merges)

    # degenerate repeated-pair inputs on self-merge tables
    for word in ("aaaa", "llll", "aaa", "a" * 37, "lalalalala"):
        for merges in ([("a", "a")], [("l", "l")], [("a", "a"), ("aa", "aa")],
                       [("l", "a"), ("a", "l"), ("la", "la")]):
            assert bpe.encode_pretoken(word, merges, fixpoint=True) == classic(word, merges), (word, merges)

    # randomized: every fixpoint encode equals classic (5k cases)
    rng = random.Random(20260816)
    for _ in range(5000):
        merges, vocab = [], ["a", "b"]
        for _ in range(rng.randint(1, 6)):
            x, y = rng.choice(vocab), rng.choice(vocab)
            if (x, y) not in merges:
                merges.append((x, y)); vocab.append(x + y)
        w = "".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
        assert bpe.encode_pretoken(w, merges, fixpoint=True) == classic(w, merges), (w, merges)

    # default MERGES table: fixpoint and single-pass agree on normal
    # English (the divergence is confined to degenerate inputs)
    for t in ("the quick brown fox", "this is there and that"):
        assert bpe.encode(t, fixpoint=True) == bpe.encode(t)
    # and count_tokens threads the flag
    assert bpe.count_tokens("aabbaabaa", div_merges, fixpoint=True) == 6
    assert bpe.count_tokens("aabbaabaa", div_merges) == 4


def test_learn_merges_incremental_equals_recount_and_is_fast():
    """_learn_merges (indexed incremental pair counts, lazy max-heap)
    must equal the O(n_merges × vocab_chars) full-recount loop exactly
    — same merges, same order, same tie-breaks — and learn 1024 merges
    over a 50k-word vocab in seconds (VERDICT r2 #5)."""
    import random
    import string
    import time
    from collections import Counter

    from mini_html_parser_spark.operators.bpe import _learn_merges

    def recount(vocab, n_merges):
        vocab = dict(vocab)
        merges = []
        for _ in range(n_merges):
            pc = Counter()
            for syms, cnt in vocab.items():
                for p in zip(syms, syms[1:]):
                    pc[p] += cnt
            if not pc:
                break
            (x, y), _ = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((x, y))
            nv = {}
            for syms, cnt in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                        out.append(x + y); i += 2
                    else:
                        out.append(syms[i]); i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + cnt
            vocab = nv
        return merges

    rng = random.Random(11)
    small = {}
    while len(small) < 2000:
        w = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(2, 10)))
        small[tuple(w)] = rng.randint(1, 500)
    assert _learn_merges(small, 128) == recount(small, 128)

    big = {}
    while len(big) < 50_000:
        w = "".join(rng.choice(string.ascii_lowercase)
                    for _ in range(rng.randint(2, 12)))
        big[tuple(w)] = rng.randint(1, 1000)
    t0 = time.time()
    merges = _learn_merges(big, 1024)
    elapsed = time.time() - t0
    assert len(merges) == 1024
    assert elapsed < 60, f"{elapsed:.1f}s"  # measured ~11s; recount ≈ minutes


def test_lsh_broadcast_matrix_high_dim(spark):
    """Above LSH_LITERAL_BUDGET the bucket assigner switches to one
    numpy sign(V·Pᵀ) per Arrow batch: buckets must match the codegen
    literal path exactly, and the dim=512 planted-copy oracles
    (lsh_topk + embedding_near_duplicates) must stay green with a plan
    that no longer grows with n_planes × dim (VERDICT r2 #4)."""
    import random

    rng = random.Random(3)
    dim = 16
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = similarity.hyperplanes(8, dim)
    vec = F.col("embedding").cast("array<double>")
    lit = sorted(
        (r["vec_id"], r["b"]) for r in
        df.select("vec_id", similarity.lsh_bucket_col(vec, planes, use_udf=False).alias("b")).collect()
    )
    udf = sorted(
        (r["vec_id"], r["b"]) for r in
        df.select("vec_id", similarity.lsh_bucket_col(vec, planes, use_udf=True).alias("b")).collect()
    )
    assert lit == udf

    # dim=512 × 12 planes (6144 > budget → UDF path auto-selected):
    # positive scaling preserves every sign, so planted scaled copies
    # of the query share its bucket and must be recalled with cosine 1
    dim2 = 512
    rows2 = [(i, [rng.gauss(0, 1) for _ in range(dim2)]) for i in range(500)]
    q = rows2[7][1]
    rows2 += [(9001, [0.5 * x for x in q]), (9002, [2.0 * x for x in q])]
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>")
    out = similarity.lsh_topk(df2, q, k=3, n_planes=12, probe_hamming=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the plane matrix is NOT inlined: plan stays ~20k chars (the one
    # remaining dim-sized literal is the query vector itself)
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
    assert len(plan) < 60_000, len(plan)
    got = out.collect()
    assert [r["vec_id"] for r in got] == [7, 9001, 9002]
    assert all(r["cosine"] == 1.0 for r in got)

    nd = similarity.embedding_near_duplicates(df2, threshold=0.999, n_planes=12)
    assert sorted((r["id_a"], r["id_b"]) for r in nd.collect()) == [
        (7, 9001), (7, 9002), (9001, 9002)
    ]


def test_lsh_multiprobe_recall(spark):
    """probe_hamming=2 (pairs of flips) widens the probe set to
    1 + n + n(n−1)/2 buckets; measured recall@10 vs brute-force must
    be monotone in the radius and reach 0.6 at radius 2 on this pinned
    corpus (no silent caps: the numbers are asserted, not implied)."""
    import random

    rng = random.Random(3)
    dim, n = 16, 2000
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [rng.gauss(0, 1) for _ in range(dim)]
    brute = {r["vec_id"] for r in similarity.brute_force_topk(df, q, k=10).collect()}
    recall = {}
    for h in (0, 1, 2):
        ann = {r["vec_id"] for r in
               similarity.lsh_topk(df, q, k=10, n_planes=8, probe_hamming=h).collect()}
        recall[h] = len(ann & brute) / 10
    print(f"lsh recall@10 by probe radius: {recall}")
    assert recall[0] <= recall[1] <= recall[2]
    # measured on this pinned corpus/seed: 0.1 / 0.3 / 0.6
    assert recall[2] >= 0.6
    assert recall[2] > recall[0]


def test_remove_boilerplate_lines(spark):
    """Corpus-level line dedup (CCNet-style): lines in ≥ min_docs
    distinct docs vanish from every doc, order preserved; blank lines
    are never boilerplate; a doc losing all lines survives as ''."""
    from mini_html_parser_spark.operators.text_analysis import (
        boilerplate_lines, remove_boilerplate_lines,
    )

    rows = [
        (1, "COOKIE BANNER\nalpha one\n\nshared tail"),
        (2, "COOKIE BANNER\nbeta two\nshared tail"),
        (3, "COOKIE BANNER\ngamma three\nshared tail"),
        (4, "COOKIE BANNER"),                 # loses everything
        (5, "solo doc keeps its single line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bp = {r["line"] for r in boilerplate_lines(df, min_docs=3).collect()}
    assert bp == {"COOKIE BANNER", "shared tail"}

    got = {r["doc_id"]: (r["text_clean"], r["n_lines_removed"])
           for r in remove_boilerplate_lines(df, min_docs=3).collect()}
    assert got[1] == ("alpha one\n", 2)       # blank line kept, order kept
    assert got[2] == ("beta two", 2)
    assert got[3] == ("gamma three", 2)
    assert got[4] == ("", 1)                  # doc survives empty
    assert got[5] == ("solo doc keeps its single line", 0)
    # duplicate lines WITHIN one doc don't make boilerplate
    df2 = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], "doc_id long, text string"
    )
    assert boilerplate_lines(df2, min_docs=2).count() == 0


def test_sample_exact_n_per_group(spark):
    from mini_html_parser_spark.operators.sampling import sample_exact_n_per_group

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.pmod("id", F.lit(4)).alias("grp")
    )
    out = sample_exact_n_per_group(df, "grp", n=10, seed=1)
    rows = out.collect()
    assert len(rows) == 40
    from collections import Counter

    assert Counter(r["grp"] for r in rows) == {g: 10 for g in range(4)}
    # deterministic across runs; different seed differs
    again = {r["doc_id"] for r in sample_exact_n_per_group(df, "grp", n=10, seed=1).collect()}
    assert again == {r["doc_id"] for r in rows}
    other = {r["doc_id"] for r in sample_exact_n_per_group(df, "grp", n=10, seed=2).collect()}
    assert other != again
    # small groups return all their rows
    tiny = spark.createDataFrame([(1, 0), (2, 0), (3, 1)], "doc_id long, grp long")
    assert sample_exact_n_per_group(tiny, "grp", n=10).count() == 3


def test_repetition_ratio_matches_python_reference(spark):
    """arrays_zip sliding-window form == the definitional Python
    n-gram computation, incl. short docs (≤ n tokens → ratio 0),
    empty text, and heavy repetition."""
    import re

    texts = [
        "",
        "one",
        "one two",
        "one two three",
        "one two three four",
        "a b c a b c a b c a b c",
        "spam spam spam spam spam spam spam",
        "the quick brown fox jumps over the lazy dog",
        "x y " * 50,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from mini_html_parser_spark.operators.text_analysis import repetition_ratio

    got = {r["doc_id"]: r["repetition_ratio"]
           for r in repetition_ratio(df).collect()}
    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.strip())
        grams = [tuple(toks[j:j + 3]) for j in range(max(len(toks) - 3, 0) + 1)]
        want = round(1.0 - len(set(grams)) / len(grams), 6)
        assert got[i] == want, (i, t, got[i], want)


def test_neardup_survivors(spark):
    """candidates → clusters → survivors keeps exactly one doc (the
    min id) per duplicate cluster and every unclustered doc."""
    rows = [(i, "identical duplicated page body text repeated here") for i in (5, 2, 9)]
    rows += [(7, "another duplicated family of text body words here"),
             (8, "another duplicated family of text body words here")]
    rows += [(1, "a unique document with entirely different words one"),
             (3, "second unique document about unrelated topics two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = dedup.exact_shingle_duplicates(df).select("id_a", "id_b")
    got = sorted(r["doc_id"] for r in dedup.neardup_survivors(df, edges).collect())
    assert got == [1, 2, 3, 7]


def test_decontaminate_edge_cases(spark):
    from mini_html_parser_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # contains bench
            (2, "totally different words in this clean document here"),
            (3, "too few"),  # < n tokens -> zero n-grams
            (4, "quick brown fox"),  # exactly one gram, shared
            (5, ""),  # empty text
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox is a pangram start",)], "text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=3, threshold=0.5).collect()
    }
    assert len(out) == 5  # every doc surfaces, even gram-less ones
    # doc 1: 7 distinct grams, shares 'the quick brown' + 'quick brown fox'
    assert out[1]["n_ngrams"] == 7 and out[1]["n_shared"] == 2
    assert not out[1]["contaminated"]
    assert out[2]["n_shared"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_ngrams"] == 0 and out[3]["contamination"] == 0.0
    # doc 4: single gram, fully shared -> contamination 1.0, flagged
    assert out[4]["n_ngrams"] == 1 and out[4]["n_shared"] == 1
    assert out[4]["contamination"] == 1.0 and out[4]["contaminated"]
    assert out[5]["n_ngrams"] == 0 and not out[5]["contaminated"]


def test_decontaminate_empty_bench(spark):
    from mini_html_parser_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([], "text string")
    row = decontaminate(docs, bench).collect()[0]
    assert row["n_ngrams"] == 2 and row["n_shared"] == 0
    assert not row["contaminated"]


def test_pack_sequences_boundary_straddle(spark):
    import pytest as _pytest

    from mini_html_parser_spark.operators.packing import pack_sequences

    # token counts: 6, 3, 8, 2 under budget 8 ->
    #   doc 1 starts seq 0 @0, doc 2 starts seq 0 @6 and straddles into
    #   seq 1 (tokens 6..8), doc 3 starts seq 1 @1 and straddles into
    #   seq 2, doc 4 starts seq 2 @1
    docs = spark.createDataFrame(
        [
            (1, "s", "a a a a a a"),
            (2, "s", "b b b"),
            (3, "s", "c c c c c c c c"),
            (4, "s", "d d"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=8, part_col="source").collect()
    }
    assert (got[1]["seq_id"], got[1]["offset_in_seq"], got[1]["n_seqs_spanned"]) == (0, 0, 1)
    assert (got[2]["seq_id"], got[2]["offset_in_seq"], got[2]["n_seqs_spanned"]) == (0, 6, 2)
    assert (got[3]["seq_id"], got[3]["offset_in_seq"], got[3]["n_seqs_spanned"]) == (1, 1, 2)
    assert (got[4]["seq_id"], got[4]["offset_in_seq"], got[4]["n_seqs_spanned"]) == (2, 1, 1)

    # independent per-source numbering: same docs under two sources
    two = docs.union(
        spark.createDataFrame(
            [(11, "t", "x x x x x x x x x x")], "doc_id long, source string, text string"
        )
    )
    got2 = {r["doc_id"]: r for r in pack_sequences(two, budget=8).collect()}
    assert got2[11]["seq_id"] == 0 and got2[11]["n_seqs_spanned"] == 2

    with _pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_sample_mixture_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    from mini_html_parser_spark.operators.sampling import sample_mixture

    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    rates = {"en": 0.25, "fr": 1.0}
    kept = sample_mixture(docs, rates, seed=3)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 2000  # rate 1.0 keeps everything
    assert 350 <= counts["en"] <= 650  # ~0.25 of 2000
    # rate 0 drops the group entirely
    none = sample_mixture(docs, {"en": 0.0, "fr": 0.0}, seed=3)
    assert none.count() == 0
    # deterministic in ids alone: repartitioned input selects the same set
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_mixture(docs.repartition(13), rates, seed=3).collect()
    )
    assert a == b


def test_as_of_join_null_values_matched_row_semantics(spark):
    """ASOF matched-row semantics: a matched right row's null value is
    emitted as null (not filled from an older row), identically on the
    split and unsplit plans."""
    from mini_html_parser_spark.operators.joins import as_of_join

    right = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None), (2, 1.0, None)],
        "k long, ts double, v double",
    )
    left = spark.createDataFrame(
        [(1, 0.5), (1, 1.5), (1, 100.0), (2, 50.0), (3, 1.0)],
        "k long, ts double",
    )
    expect = {
        (1, 0.5): (None, None),   # no right row yet
        (1, 1.5): (1.0, 5.0),     # matched (ts=1, v=5)
        (1, 100.0): (2.0, None),  # matched (ts=2, v=null) -> null v
        (2, 50.0): (1.0, None),
        (3, 1.0): (None, None),
    }
    for split in (None, 3):
        out = as_of_join(left, right, "k", "ts", ["v"], split_hot_keys=split)
        got = {
            (r["k"], r["ts"]): (r["asof_ts"], r["asof_v"])
            for r in out.collect()
        }
        assert got == expect, f"split_hot_keys={split}"


def test_pack_sequences_tied_order_no_overlap(spark):
    """Rows tied on order_col must still occupy disjoint token ranges
    (ROWS frame, not the default RANGE frame)."""
    from mini_html_parser_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, "s", "a a a"), (2, "s", "b b b")],  # both order key 0
        "doc_id long, source string, text string",
    )
    out = pack_sequences(
        docs.withColumn("ord", docs.doc_id * 0), budget=4, order_col="ord"
    ).collect()
    starts = sorted(
        (r["seq_id"] * 4 + r["offset_in_seq"], r["n_tokens"]) for r in out
    )
    assert starts == [(0, 3), (3, 3)]  # disjoint layout, no hole


def test_lsh_udf_null_vector_matches_literal_path(spark):
    """Null embeddings: the Arrow-batched bucket UDF must assign
    bucket 0 like the literal codegen path, not crash."""
    from pyspark.sql import functions as F

    from mini_html_parser_spark.operators.similarity import lsh_bucket_col

    planes = [[1.0, -1.0, 0.5], [-0.5, 1.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None), (3, [-1.0, -2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    lit = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", lsh_bucket_col(F.col("embedding"), planes, use_udf=False).alias("b")
        ).collect()
    }
    udf = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", lsh_bucket_col(F.col("embedding"), planes, use_udf=True).alias("b")
        ).collect()
    }
    assert lit == udf
    assert udf[2] == 0


def test_normalize_text(spark):
    from mini_html_parser_spark.operators.text_analysis import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "  A\x00B\x08C\x7f  MiXeD\t\tcase\n\nrun  "),
            (2, ""),
            (3, "C1\x85mojibake\x9d\x80range"),  # U+0080–U+009F stripped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_norm"] for r in normalize_text(docs).collect()}
    assert got[1] == "abc mixed case run"
    assert got[2] == ""
    assert got[3] == "c1mojibakerange"


def test_chunk_documents_overlap_and_edges(spark):
    import pytest as _pytest

    from mini_html_parser_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "only three tokens"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        )
    # 10 tokens, window 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks;
    # every token covered, and no chunk is a sub-span of another
    assert sorted(by_doc[1]) == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
    ]
    assert sorted(by_doc[2]) == [(0, "only three tokens", 3)]
    # empty doc still yields exactly one (empty) chunk
    assert sorted(by_doc[3]) == [(0, "", 1)]
    with _pytest.raises(ValueError):
        chunk_documents(docs, window=0, stride=3)


def test_assign_shards_uniform_and_deterministic(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mini_html_parser_spark.operators.sampling import assign_shards

    docs = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    out = assign_shards(docs, n_shards=8, seed=5)
    sizes = [
        r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == 8 and min(sizes) > 300  # roughly uniform (500 ± tail)
    # positions are a dense 0..size-1 enumeration within each shard
    dense = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos_in_shard").alias("mx")
    )
    assert all(r["mx"] == r["n"] - 1 for r in dense.collect())
    # pure function of (id, seed): repartitioned input, same layout
    a = sorted(map(tuple, out.select("doc_id", "shard", "pos_in_shard").collect()))
    b = sorted(map(tuple, assign_shards(docs.repartition(17), 8, seed=5)
                   .select("doc_id", "shard", "pos_in_shard").collect()))
    assert a == b
    with _pytest.raises(ValueError):
        assign_shards(docs, n_shards=0)


def test_chunk_documents_grid_properties(spark):
    """Coverage grid over (n_tokens, window, stride): every token is
    covered by >= 1 chunk, chunk starts are exactly 0, stride, ... and
    no chunk is a strict sub-span of its predecessor (the redundant
    tail a ceil(n/stride) count would emit)."""
    from pyspark.sql import functions as F

    from mini_html_parser_spark.operators.text_analysis import chunk_documents

    sizes = [0, 1, 2, 3, 5, 7, 15, 16, 17, 31, 32, 33, 63, 64, 65, 100]
    docs = spark.createDataFrame(
        [(n, " ".join(f"t{i}" for i in range(n))) for n in sizes],
        "doc_id long, text string",
    )
    for window, stride in ((8, 4), (8, 8), (16, 4), (4, 3)):
        rows = chunk_documents(docs, window=window, stride=stride).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for n in sizes:
            chunks = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
            n_eff = max(n, 1)  # empty text still splits to one '' token
            covered = set()
            prev_span = None
            for r in chunks:
                start = r["chunk_idx"] * stride
                end = min(start + window, n_eff)
                assert r["n_chunk_tokens"] == end - start
                span = (start, end)
                if prev_span is not None:
                    assert not (span[0] >= prev_span[0] and span[1] <= prev_span[1]), (
                        n, window, stride, span, prev_span,
                    )
                prev_span = span
                covered.update(range(start, end))
            assert covered == set(range(n_eff)), (n, window, stride)


def test_pq_topk_planted_and_recall(spark):
    """Product quantization: exact query copies share the query's PQ
    code (globally-minimal ADC distance, provable top hits), and
    measured recall vs brute force is reported per the no-silent-caps
    rule."""
    from mini_html_parser_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    planted = spark.createDataFrame(
        [(9001, q), (9002, q)], "vec_id long, embedding array<float>"
    )
    corpus = emb.unionByName(planted)
    books = S.pq_train(corpus, m=8, k=32)
    assert books.shape == (8, 32, len(q) // 8)
    top = S.pq_topk(corpus, books, q, k=3).collect()
    assert [r["vec_id"] for r in top] == [0, 9001, 9002]
    # all three are exact copies -> identical codes -> identical ADC
    assert len({r["adc_dist"] for r in top}) == 1

    # recall: fraction of the exact top-10 surfaced in the PQ top-50
    # (codebooks trained on the un-planted corpus — the planted copies
    # above skew the training sample and shave ~0.2 recall)
    books_raw = S.pq_train(emb, m=8, k=32)
    brute = {r["vec_id"] for r in S.brute_force_topk(emb, q, k=10).collect()}
    pq50 = {r["vec_id"] for r in S.pq_topk(emb, books_raw, q, k=50).collect()}
    recall = len(brute & pq50) / 10
    print(f"PQ recall@10-in-top50 (m=8, k=32): {recall}")
    assert recall >= 0.8  # measured 0.9 on this corpus

    # codes are m bytes: 8x compression vs the float32 input at dim 64
    enc = S.pq_encode(emb, books).first()
    assert len(enc["pq_codes"]) == 8


def test_sq8_topk_planted_recall_and_plan(spark):
    """Scalar int8 quantization: exact query copies quantize to the
    query's own codes (identical cosine, id tie-break), recall vs the
    exact float path is near-perfect (SQ8 error ~1e-5 cosine), and the
    scoring plan is pure codegen — no Python stage, no Exchange below
    the TakeOrderedAndProject."""
    from mini_html_parser_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    planted = spark.createDataFrame(
        [(9001, q), (9002, q)], "vec_id long, embedding array<float>"
    )
    codes = S.sq8_encode(emb.unionByName(planted))
    assert dict(codes.dtypes)["sq_codes"] == "array<tinyint>"  # 4x smaller

    top = S.sq8_topk(codes, q, k=3)
    assert [r["vec_id"] for r in top.collect()] == [0, 9001, 9002]

    # recall vs the exact float scorer: SQ8 should reproduce the exact
    # top-10 outright on this corpus (quantization error ~1e-5)
    brute = [r["vec_id"] for r in S.brute_force_topk(emb, q, k=10).collect()]
    sq = [r["vec_id"] for r in S.sq8_topk(S.sq8_encode(emb), q, k=10).collect()]
    overlap = len(set(brute) & set(sq)) / 10
    print(f"SQ8 recall@10: {overlap}")
    assert overlap >= 0.9

    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[1]

    # all-zero vector: scale-1 path, no division by zero
    zero = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    z = S.sq8_encode(zero).first()
    assert z["sq_scale"] == 1.0 and list(z["sq_codes"]) == [0, 0]


def test_duplicated_passages_semantics(spark):
    """Substring-level exact dedup (Lee et al. 2022): maximal shared
    passages come back as exact token intervals; two separate shared
    passages split into two islands; cross-doc only (within-doc
    repeats excluded); short docs and disjoint docs emit nothing."""
    shared = " ".join(f"t{i}" for i in range(30))
    rows = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),
        (2, "b1 " + shared + " b2 b3 b4"),
        (3, " ".join(f"c{i}" for i in range(40))),       # disjoint
        (4, "short doc"),                                 # < k tokens
        # docs 5/6 share TWO passages separated by doc-unique tokens
        (5, "x1 p q r s t u v w x y z1 gapA gapB m n o pp qq rr ss tt uu vv"),
        (6, "y1 p q r s t u v w x y z9 gapC gapD m n o pp qq rr ss tt uu vv"),
        # doc 7 repeats a passage WITHIN itself only → not duplicated
        (7, "w1 " + " ".join(f"r{i}" for i in range(10)) + " w2 "
            + " ".join(f"r{i}" for i in range(10)) + " w3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in dedup.duplicated_passages(df, k=8).collect()
    )
    assert got == [
        (1, 3, 33, 30),
        (2, 1, 31, 30),
        (5, 1, 11, 10), (5, 14, 24, 10),
        (6, 1, 11, 10), (6, 14, 24, 10),
    ]


def test_duplicated_passages_mass_duplication_stays_linear(spark):
    """10k docs all containing one shared 24-token passage: every
    window hash inside the passage is duplicated 10k-fold.  The
    groupBy(min/max) + position join shape stays O(corpus positions)
    — no pair emission at all — and completes in seconds with one
    exact interval per doc."""
    import time

    n = 10_000
    shared = " ".join(f"s{i}" for i in range(24))
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("u"), F.col("id").cast("string"),
            F.lit("a u"), F.col("id").cast("string"), F.lit("b "),
            F.lit(shared),
            F.lit(" v"), F.col("id").cast("string"),
        ).alias("text"),
    )
    t0 = time.time()
    out = dedup.duplicated_passages(df, k=8)
    assert out.count() == n
    agg = out.agg(
        F.min("tok_start").alias("mn"), F.max("tok_start").alias("mx"),
        F.min("n_tokens").alias("ln"), F.max("n_tokens").alias("lx"),
    ).first()
    # every doc: 2 salt tokens, then the 24-token passage, then 1 salt
    assert (agg["mn"], agg["mx"], agg["ln"], agg["lx"]) == (2, 2, 24, 24)
    assert time.time() - t0 < 120

def test_ivfpq_topk_planted_and_recall(spark):
    """IVF-PQ composition (FAISS IndexIVFPQ shape): planted exact
    copies share the query's list AND its residual code (that list's
    ADC floor, provable top hits), and measured recall vs brute force
    is reported per the no-silent-caps rule."""
    from mini_html_parser_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    planted = spark.createDataFrame(
        [(9001, q), (9002, q)], "vec_id long, embedding array<float>"
    )
    corpus = emb.unionByName(planted)
    top = S.ivfpq_topk(
        corpus, q, k=3, n_centroids=8, n_probe=2, m=8, k_codes=32
    ).collect()
    assert [r["vec_id"] for r in top] == [0, 9001, 9002]
    assert len({r["adc_dist"] for r in top}) == 1

    # recall: exact top-10 surfaced in the IVF-PQ top-50; n_probe=4
    # of 8 lists scans about half the corpus with 8-byte codes
    brute = {r["vec_id"] for r in S.brute_force_topk(emb, q, k=10).collect()}
    got50 = {
        r["vec_id"]
        for r in S.ivfpq_topk(
            emb, q, k=50, n_centroids=8, n_probe=4, m=8, k_codes=32
        ).collect()
    }
    recall = len(brute & got50) / 10
    print(f"IVF-PQ recall@10-in-top50 (8 lists, probe 4, m=8/k=32): {recall}")
    assert recall >= 0.7

    # index shape: m-byte codes + a list id per vector
    enc, centers, books = S.ivfpq_index(emb, n_centroids=8, m=8, k_codes=32)
    row = enc.first()
    assert len(row["pq_codes"]) == 8 and 0 <= row["list_id"] < 8
    assert centers.shape[1] == len(q) and books.shape == (8, 32, len(q) // 8)

def test_quality_classifier_holdout_accuracy(spark):
    """The trained classifier generalizes: fit on HALF the planted
    corpus, score the unseen half — marker tokens carry the signal so
    holdout accuracy is 1.0 (organic tokens train to ~0 weight), the
    probability margins separate, and re-training is bit-deterministic
    (the property the driver oracle hashes)."""
    import numpy as np

    from mini_html_parser_spark.operators import text_analysis as T

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    labeled = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat("text", F.lit(" qgoodaa qgoodbb qgoodcc")),
        ).otherwise(
            F.concat("text", F.lit(" qbadaa qbadbb qbadcc"))
        ).alias("text"),
        (F.col("doc_id") % 2 == 0).cast("int").alias("label"),
    )
    n = labeled.count()
    train = labeled.filter(F.col("doc_id") % 4 < 2)   # half, both classes
    hold = labeled.filter(F.col("doc_id") % 4 >= 2)
    assert train.count() > 0 and hold.count() > 0
    w = T.train_quality_classifier(train)
    scored = T.quality_classify(hold, w).select(
        "label", F.col("quality_pred").cast("int").alias("p"), "quality_prob"
    ).collect()
    acc = sum(1 for r in scored if r["p"] == r["label"]) / len(scored)
    probs_pos = [r["quality_prob"] for r in scored if r["label"] == 1]
    probs_neg = [r["quality_prob"] for r in scored if r["label"] == 0]
    print(f"quality classifier holdout accuracy: {acc} "
          f"(margin {min(probs_pos) - max(probs_neg):.3f})")
    assert acc == 1.0
    assert min(probs_pos) > 0.5 > max(probs_neg)
    assert np.array_equal(w, T.train_quality_classifier(train))

def test_remove_duplicated_passages_semantics(spark):
    """Keep-one removal: the min-doc occurrence survives, all others
    are excised token-exactly; non-duplicated text is preserved;
    within-doc-only repeats are untouched."""
    shared = " ".join(f"t{i}" for i in range(30))
    rows = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),           # min doc: keeps
        (2, "b1 " + shared + " b2 b3 b4"),              # loses passage
        (5, "c1 " + shared),                             # loses passage
        (3, " ".join(f"c{i}" for i in range(40))),       # untouched
        (7, "w1 " + " ".join(f"r{i}" for i in range(10)) + " w2 "
            + " ".join(f"r{i}" for i in range(10))),     # within-doc only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_removed_tokens"])
        for r in dedup.remove_duplicated_passages(df, k=8).collect()
    }
    assert got[1] == (rows[0][1], 0)
    assert got[2] == ("b1 b2 b3 b4", 30)
    assert got[5] == ("c1", 30)
    assert got[3] == (rows[3][1], 0)
    assert got[7] == (rows[4][1], 0)

def test_gopher_quality_rules(spark):
    """Gopher rule metrics on hand-built edge docs: bullet/ellipsis
    line fractions, symbol-to-word ratio, alpha fraction, stopword
    presence, and the verdict composition."""
    from mini_html_parser_spark.operators.text_analysis import gopher_quality

    good = ("the quick brown fox jumps over a lazy dog and then runs "
            "far away to find some good food with friends nearby today "
            "because that was what everyone wanted from this fine day "
            "more words keep coming here until fifty is reached soon "
            "indeed the total count now passes the gate easily enough")
    rows = [
        (1, good),                                     # passes all
        (2, "- a\n- b\n- c\nreal line"),               # bullet 0.75
        (3, "one...\ntwo…\nthree"),                    # ellipsis 2/3
        (4, "### ## # " + "w " * 20),                  # symbol-heavy
        (5, "12 34 56 78 90"),                         # no alpha words
        (6, ""),                                       # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert got[1]["gopher_ok"] and got[1]["stop_hits"] >= 2
    assert got[2]["bullet_line_frac"] == 0.75 and not got[2]["gopher_ok"]
    assert abs(got[3]["ellipsis_line_frac"] - 0.6667) < 1e-9
    assert got[4]["symbol_word_ratio"] > 0.1 and not got[4]["gopher_ok"]
    assert got[5]["alpha_word_frac"] == 0.0
    assert got[6]["n_words"] == 1 and not got[6]["gopher_ok"]  # [''] token

def test_temperature_resample_balances_groups(spark):
    """alpha=1 keeps everything; alpha<1 narrows the kept-mass ratio
    between the largest and smallest language toward p^alpha; the
    smallest group keeps (statistically) everything."""
    from mini_html_parser_spark.operators.sampling import (
        temperature_rates, temperature_resample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    before = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    rates1 = temperature_rates(docs, alpha=1.0)
    assert all(abs(r - 1.0) < 1e-12 for r in rates1.values())
    assert temperature_resample(docs, alpha=1.0).count() == docs.count()

    rates = temperature_rates(docs, alpha=0.5)
    smallest = min(before, key=before.get)
    assert rates[smallest] == 1.0 and all(0 < r <= 1.0 for r in rates.values())
    after = {
        r["lang"]: r["count"]
        for r in temperature_resample(docs, alpha=0.5).groupBy("lang").count().collect()
    }
    big = max(before, key=before.get)
    ratio_before = before[big] / before[smallest]
    ratio_after = after[big] / after[smallest]
    assert ratio_after < ratio_before  # flattened toward p^0.5
    # expected kept mass per group = rate * n (Bernoulli; loose bound)
    for g, r in rates.items():
        assert abs(after.get(g, 0) - r * before[g]) <= 4 * (r * before[g]) ** 0.5 + 4

def test_dedup_against_semantics(spark):
    """Incremental ingest: corpus copies dropped, fresh kept,
    within-batch duplicates reduced to the min id first."""
    corpus = spark.createDataFrame(
        [(1, "old doc one"), (2, "old doc two")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "old doc one"),       # exact corpus dup -> dropped
            (11, "brand new"),         # kept
            (12, "brand new"),         # within-batch dup of 11 -> dropped
            (13, "also new"),          # kept
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in dedup.dedup_against(batch, corpus).collect()
    )
    assert got == [11, 13]
    # within_batch=False keeps both batch twins (only corpus filtering)
    got2 = sorted(
        r["doc_id"]
        for r in dedup.dedup_against(batch, corpus, within_batch=False).collect()
    )
    assert got2 == [11, 12, 13]

def test_perplexity_scores_semantics(spark):
    """Hand-checkable bigram LM: a doc made of corpus-frequent
    bigrams scores lower perplexity than one of unique bigrams;
    values match a closed-form recomputation; <2-token docs get
    perplexity 1."""
    import math

    from mini_html_parser_spark.operators.text_analysis import perplexity_scores

    rows = [
        (1, "a b a b a b"),     # bigrams (a,b)x3, (b,a)x2
        (2, "a b"),             # frequent bigram
        (3, "x y"),             # unique bigram
        (4, "solo"),            # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in perplexity_scores(df).collect()}
    # model: cu: a=4,b=4,x=1,y=1,solo=1 (V=5); cb: (a,b)=4,(b,a)=2,(x,y)=1
    V = 5
    lp = lambda cb, cu: math.log((cb + 1) / (cu + V))
    exp1 = (3 * lp(4, 4) + 2 * lp(2, 4)) / 5
    assert abs(got[1]["avg_logprob"] - round(exp1, 6)) < 1e-9
    assert got[2]["perplexity"] < got[3]["perplexity"]  # freq < unique
    assert abs(got[2]["avg_logprob"] - round(lp(4, 4), 6)) < 1e-9
    assert abs(got[3]["avg_logprob"] - round(lp(1, 1), 6)) < 1e-9
    assert got[4]["n_bigrams"] == 0 and got[4]["perplexity"] == 1.0

def test_media_text_pairs_contexts(spark):
    """OBELICS-style pair mining: nearest preceding/following TEXT
    spans (html kinds count as text, media never does), nulls at
    document edges, consecutive media share contexts."""
    from mini_html_parser_spark.operators.multimodal import media_text_pairs

    def spans(*items):
        return [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(items)
        ]

    rows = [
        # media first (no prev), media last (no next), doubled media
        (1, spans(("media", "", "m0"), ("text", "alpha", ""),
                  ("media", "", "m1"), ("media", "", "m2"),
                  ("text", "beta", ""), ("media", "", "m3"))),
        (2, spans(("html", "h", ""), ("media", "", "m4"))),  # html counts
        (3, spans(("text", "lonely", ""))),                   # no media
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        r["media_ref"]: (r["prev_text"], r["next_text"])
        for r in media_text_pairs(df).collect()
    }
    assert got == {
        "m0": (None, "alpha"),
        "m1": ("alpha", "beta"),
        "m2": ("alpha", "beta"),
        "m3": ("beta", None),
        "m4": ("h", None),
    }

def test_url_features_and_blocklist(spark):
    """Domain extraction handles ports/userinfo/subdomains; the
    blocklist drops exact domains and subdomains but not
    lookalike suffixes (evilsrc1.com ≠ .src1.com)."""
    from mini_html_parser_spark.operators.text_analysis import (
        filter_url_blocklist, url_features,
    )

    rows = [
        (1, "https://www.example.com/a/b/c?q=1"),
        (2, "http://user:pw@Sub.Bad.org:8080/x"),
        (3, "https://bad.org/"),
        (4, "https://notbad.org/keep"),
        (5, "https://example.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    feats = {r["doc_id"]: r for r in url_features(df).collect()}
    assert feats[1]["domain"] == "www.example.com"
    assert feats[1]["path_depth"] == 3 and feats[1]["has_query"]
    assert feats[2]["domain"] == "sub.bad.org"  # userinfo+port stripped
    assert feats[4]["domain"] == "notbad.org"
    assert feats[5]["path_depth"] == 0 and not feats[5]["has_query"]
    assert feats[1]["tld"] == "com" and feats[2]["tld"] == "org"

    kept = sorted(
        r["doc_id"]
        for r in filter_url_blocklist(df, ["bad.org"]).collect()
    )
    assert kept == [1, 4, 5]  # 2 (subdomain) and 3 (exact) dropped

    # metrics mode: every row back, with a REAL url_blocked flag
    flags = {
        r["doc_id"]: r["url_blocked"]
        for r in filter_url_blocklist(
            df, ["bad.org"], filter_blocked=False
        ).collect()
    }
    assert flags == {1: False, 2: True, 3: True, 4: False, 5: False}

    # '?' inside the fragment is NOT a query component (RFC 3986)
    frag = spark.createDataFrame(
        [(6, "https://example.com/page#sec?x"),
         (7, "https://example.com/p?q=1#frag")],
        "doc_id long, url string",
    )
    fq = {r["doc_id"]: r["has_query"] for r in url_features(frag).collect()}
    assert fq == {6: False, 7: True}

def test_duplicated_passages_randomized_vs_bruteforce(spark):
    """Randomized corpora over a tiny alphabet (dense natural
    cross-doc overlaps) against a brute-force Python reference:
    gram-set membership per position, consecutive-run merge."""
    import random

    rng = random.Random(20260818)
    k = 3
    for trial in range(4):
        docs = []
        for d in range(12):
            n = rng.randrange(0, 15)
            docs.append((d, " ".join(rng.choice("abc") for _ in range(n))))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = sorted(
            tuple(r)
            for r in dedup.duplicated_passages(df, k=k).collect()
        )
        # brute force
        gram_docs = {}
        toks_by_doc = {}
        for d, t in docs:
            toks = t.split() if t.strip() else [""]
            toks_by_doc[d] = toks
            for p in range(len(toks) - k + 1):
                gram_docs.setdefault(tuple(toks[p : p + k]), set()).add(d)
        want = []
        for d, toks in toks_by_doc.items():
            dup_ps = [
                p
                for p in range(len(toks) - k + 1)
                if len(gram_docs[tuple(toks[p : p + k])] - {d}) > 0
            ]
            run_start = None
            prev = None
            for p in dup_ps + [None]:
                if p is not None and prev is not None and p == prev + 1:
                    prev = p
                    continue
                if run_start is not None:
                    want.append((d, run_start, prev + k, prev + k - run_start))
                run_start, prev = p, p
        assert got == sorted(want), (trial, got, sorted(want))

def test_remove_duplicated_passages_randomized_vs_bruteforce(spark):
    """Randomized keep-one removal vs a brute-force reference: a
    position is cut iff its gram is cross-doc duplicated AND this doc
    is not the gram's min doc; islands merge; text rebuilt from kept
    tokens."""
    import random

    rng = random.Random(20260819)
    k = 3
    for trial in range(3):
        docs = []
        for d in range(10):
            n = rng.randrange(0, 14)
            docs.append((d, " ".join(rng.choice("ab") for _ in range(n))))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text_clean"], r["n_removed_tokens"])
            for r in dedup.remove_duplicated_passages(df, k=k).collect()
        }
        gram_docs = {}
        toks_by_doc = {}
        for d, t in docs:
            toks = t.split() if t.strip() else [""]
            toks_by_doc[d] = toks
            for p in range(len(toks) - k + 1):
                gram_docs.setdefault(tuple(toks[p : p + k]), set()).add(d)
        for d, toks in toks_by_doc.items():
            removed = set()
            for p in range(len(toks) - k + 1):
                g = gram_docs[tuple(toks[p : p + k])]
                if len(g - {d}) > 0 and d != min(g):
                    removed.update(range(p, p + k))
            # merge is implicit: removed positions form the union of
            # intervals; kept = tokens outside
            kept = [t for i, t in enumerate(toks) if i not in removed]
            assert got[d] == (" ".join(kept), len(removed)), (trial, d)

def test_quality_classifier_and_temperature_null_robustness(spark):
    """NULL text scores as an empty doc (bias only) instead of
    crashing the Arrow stage; NULL group values and empty frames
    yield sane temperature rates."""
    from mini_html_parser_spark.operators.sampling import (
        temperature_rates, temperature_resample,
    )
    from mini_html_parser_spark.operators.text_analysis import (
        quality_classify, train_quality_classifier,
    )

    labeled = spark.createDataFrame(
        [(1, "good stuff qgood", 1), (2, "bad stuff qbad", 0),
         (3, "more qgood text", 1), (4, "more qbad text", 0)],
        "doc_id long, text string, label int",
    )
    w = train_quality_classifier(labeled, sample_n=10)
    with_null = spark.createDataFrame(
        [(9, None), (10, "qgood things")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["quality_prob"] for r in quality_classify(with_null, w).collect()}
    assert 0.0 <= got[9] <= 1.0  # bias-only, no crash

    mixed = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, None)], "doc_id long, lang string"
    )
    rates = temperature_rates(mixed, alpha=0.5)
    assert rates == {"en": 1.0}  # null group excluded
    assert temperature_resample(mixed, alpha=0.5).count() == 3  # nulls kept
    empty = spark.createDataFrame([], "doc_id long, lang string")
    assert temperature_rates(empty) == {}

def test_media_text_pairs_randomized_vs_bruteforce(spark):
    """Random interleaved span sequences vs a linear-scan reference
    for nearest preceding/following text spans."""
    import random

    from mini_html_parser_spark.operators.multimodal import media_text_pairs

    rng = random.Random(20260820)
    docs = []
    for d in range(20):
        spans = []
        for i in range(rng.randrange(0, 12)):
            kind = rng.choice(["text", "html", "media", "media"])
            spans.append({
                "kind": kind,
                "text": f"t{d}_{i}" if kind in ("text", "html") else "",
                "media_ref": f"m{d}_{i}" if kind == "media" else "",
                "offset": i,
            })
        docs.append((d, spans))
    df = spark.createDataFrame(
        docs,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        (r["doc_id"], r["media_ref"]): (r["prev_text"], r["next_text"])
        for r in media_text_pairs(df).collect()
    }
    want = {}
    for d, spans in docs:
        for i, s in enumerate(spans):
            if s["kind"] != "media":
                continue
            prev = next((p["text"] for p in reversed(spans[:i])
                         if p["kind"] in ("text", "html")), None)
            nxt = next((p["text"] for p in spans[i + 1:]
                        if p["kind"] in ("text", "html")), None)
            want[(d, s["media_ref"])] = (prev, nxt)
    assert got == want

def test_perplexity_scores_randomized_vs_bruteforce(spark):
    """Random tiny corpora vs a pure-Python bigram-LM reference."""
    import math
    import random
    import re as _re
    from collections import Counter

    from mini_html_parser_spark.operators.text_analysis import perplexity_scores

    rng = random.Random(20260821)
    ws_split = _re.compile(r"[ \t\n\r\f\x0b]+")
    for trial in range(3):
        docs = [
            (d, " ".join(rng.choice("abcd") for _ in range(rng.randrange(0, 10))))
            for d in range(12)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r for r in perplexity_scores(df).collect()}

        toks = {d: (ws_split.split(t.strip()) if t.strip() else [""])
                for d, t in docs}
        uni = Counter(w for ws in toks.values() for w in ws)
        bi = Counter(p for ws in toks.values() for p in zip(ws, ws[1:]))
        V = len(uni)
        for d, ws in toks.items():
            pairs = list(zip(ws, ws[1:]))
            if not pairs:
                assert got[d]["n_bigrams"] == 0 and got[d]["perplexity"] == 1.0
                continue
            a = sum(math.log((bi[p] + 1) / (uni[p[0]] + V)) for p in pairs) / len(pairs)
            assert got[d]["n_bigrams"] == len(pairs), (trial, d)
            assert abs(got[d]["avg_logprob"] - round(a, 6)) < 1e-9, (trial, d)
            assert abs(got[d]["perplexity"] - round(math.exp(-a), 6)) < 1e-9


def test_gopher_quality_randomized_vs_bruteforce(spark):
    """Random text vs a pure-Python replica of every Gopher metric
    (same explicit whitespace class, same symbol counting, same line
    rules) — catches Spark-expression drift."""
    import random
    import re as _re

    from mini_html_parser_spark.operators.text_analysis import (
        GOPHER_STOPWORDS, gopher_quality,
    )

    rng = random.Random(20260822)
    pieces = ["the", "and", "word", "#", "...", "…", "•", "- x", "* y",
              "a", "bb4", "漢字", "12", "\n", " ", "  ", "\t"]
    docs = []
    for d in range(30):
        docs.append((d, "".join(
            rng.choice(pieces) + rng.choice([" ", ""])
            for _ in range(rng.randrange(0, 25))
        )))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    ws_split = _re.compile(r"[ \t\n\r\f\x0b]+")
    for d, t in docs:
        # Spark/DuckDB trim() strips SPACES only (not \t etc.) — the
        # Python reference must replicate that, not str.strip()
        toks = ws_split.split(t.strip(" "))
        n_words = len(toks)
        mwl = round(sum(len(x) for x in toks) / n_words, 4) if n_words else 0.0
        n_sym = t.count("#") + t.count("...") + t.count("…")
        swr = round(n_sym / n_words, 4) if n_words else 0.0
        lines = t.split("\n")
        bl = sum(1 for l in lines if l.strip(" ").startswith(("•", "- ", "* ")))
        el = sum(1 for l in lines if l.strip(" ").endswith(("...", "…")))
        blf = round(bl / len(lines), 4) if lines else 0.0
        elf = round(el / len(lines), 4) if lines else 0.0
        alpha = sum(1 for x in toks if _re.search("[a-zA-Z]", x))
        awf = round(alpha / n_words, 4) if n_words else 0.0
        padded = " " + t.lower() + " "
        sh = sum(1 for w in GOPHER_STOPWORDS if f" {w} " in padded)
        g = got[d]
        assert (g["n_words"], g["mean_word_len"], g["symbol_word_ratio"],
                g["bullet_line_frac"], g["ellipsis_line_frac"],
                g["alpha_word_frac"], g["stop_hits"]) == (
            n_words, mwl, swr, blf, elf, awf, sh), (d, repr(t))


def test_dedup_against_bloom_exact_equivalence(spark):
    """Bloom-prefiltered ingest dedup must return EXACTLY the plain
    anti-join's survivors even under heavy false-positive pressure
    (tiny 1 KB bitmap ⇒ many bloom-positives; the md5 anti-join must
    rescue every one), and the bitmap build must be deterministic."""
    from pyspark.sql import functions as F2

    from mini_html_parser_spark.operators import dedup

    corpus = spark.range(400).select(
        F2.col("id").alias("doc_id"),
        F2.concat(F2.lit("corpus text "), F2.col("id")).alias("text"),
    )
    batch = spark.range(300).select(
        (F2.col("id") + 10_000).alias("doc_id"),
        F2.when(F2.col("id") % 2 == 0,
                F2.concat(F2.lit("corpus text "), F2.col("id")))  # dup of corpus
        .otherwise(F2.concat(F2.lit("new text "), F2.col("id")))
        .alias("text"),
    )
    # duplicate INSIDE the batch too (within-batch keep-min path)
    batch = batch.unionByName(
        spark.createDataFrame([(99_999, "new text 1")], "doc_id long, text string")
    )
    plain = {(r["doc_id"], r["text"])
             for r in dedup.dedup_against(batch, corpus).collect()}
    # 8191: NOT a byte multiple — build must round m up instead of
    # letting final-partial-byte positions index out of bounds
    for n_bits in (1 << 13, 1 << 20, 8191):   # 1 KB (FP-heavy), 128 KB, odd
        bloomed = {(r["doc_id"], r["text"])
                   for r in dedup.dedup_against_bloom(
                       batch, corpus, n_bits=n_bits).collect()}
        assert bloomed == plain, n_bits
    # survivors: the 150 odd new texts, minus nothing, with the
    # within-batch copy of "new text 1" collapsed to min doc_id
    assert len(plain) == 150
    assert all("new text" in t for _id, t in plain)
    # determinism of the distributed bitmap build
    b1 = dedup.build_text_bloom(corpus, n_bits=1 << 16)
    b2 = dedup.build_text_bloom(corpus, n_bits=1 << 16)
    assert b1 == b2
    # no false negatives: every corpus text is bloom-positive, so with
    # an all-dup batch nothing can sneak past the prefilter
    all_dups = corpus.select((F2.col("doc_id") + 50_000).alias("doc_id"), "text")
    assert dedup.dedup_against_bloom(all_dups, corpus, n_bits=1 << 16).count() == 0


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup (round 6)
# ---------------------------------------------------------------------------

def test_semantic_dedup_drops_junior_cluster_mates(spark):
    """Three orthogonal seed directions (ids 0-2 become the seeded
    centroids); a near-copy of centroid 0 must be dropped (its senior
    cluster-mate is above threshold), a same-cluster but dissimilar
    member must survive."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (10, [0.999, 0.01, 0.0, 0.0]),   # near-copy of centroid 0 -> drop
        (11, [0.7, 0.1, 0.0, 0.6]),      # cluster 0, cosine ~0.75 -> keep
        (12, [0.0, 0.995, 0.05, 0.0]),   # near-copy of centroid 1 -> drop
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(df, k=3, threshold=0.95)
    got = {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert len(got) == 6
    assert got[0] == (0, True) and got[1] == (1, True) and got[2] == (2, True)
    assert got[10] == (0, False)
    assert got[11][0] == 0 and got[11][1] is True
    assert got[12] == (1, False)


def test_semantic_dedup_kmeans_mode_and_zero_shuffle_scoring(spark):
    """kmeans centroids: same contract (one row per vector, near-copies
    of a senior mate dropped), clusters learned not seeded."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [0.0] * 8
        base[i % 4] = 1.0
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in base]))
    # plant an exact copy of id 3 at id 100
    rows.append((100, rows[3][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(
        df, k=4, threshold=0.999, centroids="kmeans"
    ).collect()
    got = {r["vec_id"]: r for r in out}
    assert len(got) == 61
    assert got[100]["keep"] is False          # the planted copy
    assert got[3]["keep"] is True             # its senior twin
    # seeded rng: exactly two organic noise-tail pairs also cross
    # 0.999 (36~12 at 0.99926, 57~21 at 0.99913) — the junior member
    # of each is dropped alongside the planted copy
    assert sorted(r["vec_id"] for r in out if not r["keep"]) == [36, 57, 100]


# ---------------------------------------------------------------------------
# DSIR importance resampling (round 6)
# ---------------------------------------------------------------------------

def _dsir_corpus(spark):
    rows = []
    for i in range(40):  # target: English-y vocabulary
        rows.append((i, "the quick brown fox jumps over lazy dogs", "en"))
    for i in range(40, 80):  # raw-only vocabulary
        rows.append((i, "zzz qqq vvv kkk www jjj xxx yyy uuu", "de"))
    # a non-target doc written in the TARGET vocabulary: DSIR's whole
    # point is that it scores high although its lang label is raw-only
    rows.append((200, "quick brown fox over the lazy dogs jumps", "de"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_scores_target_vocabulary_highest(spark):
    df = _dsir_corpus(spark)
    scored = sampling.dsir_score(df, F.col("lang") == "en")
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert len(rows) == 81
    assert rows[200]["dsir_score"] > 0          # target-like content
    assert rows[50]["dsir_score"] < 0           # raw-only content
    # the target-vocab de doc outranks every raw-vocab doc
    assert rows[200]["dsir_score"] > max(
        rows[i]["dsir_score"] for i in range(40, 80)
    )
    top = sampling.dsir_select(df, F.col("lang") == "en", n=41)
    ids = {r["doc_id"] for r in top.collect()}
    assert 200 in ids and ids >= set(range(40))


def test_dsir_scoring_plan_is_zero_shuffle(spark):
    """After the bounded weight collect, scoring is a single codegen
    projection: literal weight array + per-token md5 lookup — no
    Exchange, no join, no Python stage in the scored plan."""
    df = _dsir_corpus(spark)
    scored = sampling.dsir_score(df, F.col("lang") == "en")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan and "MapInPandas" not in plan, plan


# ---------------------------------------------------------------------------
# paragraph-level first-occurrence dedup (round 6)
# ---------------------------------------------------------------------------

def test_dedup_paragraphs_first_occurrence_wins(spark):
    """RefinedWeb line dedup: a line survives only at its globally
    first (doc_id, pos); whitespace-only segments are normalized away;
    order inside each doc is preserved; a doc whose every line was
    seen before comes back with text='' and n_kept=0."""
    rows = [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta\n \nalpha"),   # beta+alpha seen in doc 1
        (3, "gamma\nbeta"),              # nothing new
        (4, "epsilon\nepsilon"),         # self-dup: pos 0 wins
        (5, "   \n  "),                  # only space-lines -> dropped doc
        # trim() strips SPACES only (the engine-portable contract —
        # CLAUDE.md cross-engine gotcha), so a tab line is a real,
        # dedupable paragraph in BOTH engines
        (6, "\t\nalpha"),
        (7, "\t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.dedup_paragraphs(df).collect()}
    assert set(out) == {1, 2, 3, 4, 6, 7}  # doc 5 has no paragraphs
    assert out[6]["text"] == "\t" and out[6]["n_dropped"] == 1
    assert out[7]["text"] == "" and out[7]["n_dropped"] == 1
    assert out[1]["text"] == "alpha\nbeta\ngamma"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (3, 0)
    assert out[2]["text"] == "delta"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 2)
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_dropped"] == 2
    assert out[4]["text"] == "epsilon"
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (1, 1)


def test_dedup_paragraphs_plan_no_window_over_hot_key(spark):
    """Scale shape: the paragraph-key aggregate must be a partial-agg
    groupBy (map-side combine absorbs the 10^8-page nav bar), never a
    Window over the paragraph key (one task would sort the hot key's
    whole group)."""
    df = spark.createDataFrame(
        [(i, "nav\ncontent %d" % i) for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        dedup.dedup_paragraphs(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "partial" in plan.lower(), plan


# ---------------------------------------------------------------------------
# incremental near-dup ingestion (round 6)
# ---------------------------------------------------------------------------

def _neardup_fixtures(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different corpus document two with unique words"),
            (3, "third doc talks about spark shuffles and partitions only"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # near-dup of corpus 1: one word changed out of 10
            (100, "the quick brown fox jumps over the lazy cat today"),
            # exact shingle-set dup of corpus 3 (whitespace run differs)
            (101, "third doc talks  about spark shuffles and partitions only"),
            # genuinely new
            (102, "a totally novel page about minhash band indexes here"),
            # near-dup of 102 WITHIN the batch (junior id -> dropped)
            (103, "a totally novel page about minhash band indexes there"),
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_neardup_against_lsh_verify_path(spark):
    corpus, batch = _neardup_fixtures(spark)
    out = dedup.neardup_against(
        batch, corpus_df=corpus, threshold=0.5, num_hashes=32, bands=16
    )
    assert {r["doc_id"] for r in out.collect()} == {102}

    # verify=False (LSH-only policy): same result on this corpus, no
    # corpus text needed when the band index is supplied
    idx = dedup.minhash_bands(corpus, num_hashes=32, bands=16)
    out2 = dedup.neardup_against(
        batch, threshold=0.5, num_hashes=32, bands=16,
        corpus_bands=idx, verify=False,
    )
    assert {r["doc_id"] for r in out2.collect()} == {102}


def test_neardup_against_fingerprint_path_and_summary(spark):
    """θ=1.0: shingle-set equality catches the whitespace recrawl that
    exact-text dedup_against misses; the maintainable corpus summary
    (one fingerprint per doc) gives the identical answer."""
    corpus, batch = _neardup_fixtures(spark)
    out = dedup.neardup_against(batch, corpus_df=corpus, threshold=1.0)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {100, 102, 103}  # only the set-identical 101 drops
    # exact-text dedup would have kept the recrawl
    assert 101 in {
        r["doc_id"] for r in dedup.dedup_against(batch, corpus).collect()
    }
    # precomputed fingerprint summary path
    from mini_html_parser_spark.operators.dedup import (
        shingle_fingerprint, shingle_frame,
    )
    summary = shingle_frame(corpus).select(
        "doc_id", shingle_fingerprint(F.col("sh")).alias("fp")
    )
    out2 = dedup.neardup_against(
        batch, threshold=1.0, corpus_fingerprints=summary
    )
    assert {r["doc_id"] for r in out2.collect()} == got


def test_neardup_against_broadcast_batch_plan(spark):
    """broadcast_batch=True: the corpus band INDEX never shuffles for
    a small increment — the band join must be a BroadcastHashJoin."""
    corpus, batch = _neardup_fixtures(spark)
    idx = dedup.minhash_bands(corpus, num_hashes=32, bands=16)
    out = dedup.neardup_against(
        batch, threshold=0.5, corpus_bands=idx, verify=False,
        broadcast_batch=True, within_batch=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_pack_interleaved_atomic_media_and_layout(spark):
    """Hand-computed interleaved layout: text costs its whitespace
    token count, media a fixed cost, spans are atomic (a media block
    starting near the boundary overflows its sequence instead of
    splitting), and the running layout is per-part_col."""
    from mini_html_parser_spark.operators.packing import pack_interleaved

    def span(kind, text="", ref=""):
        return (kind, text, ref, 0)

    rows = [
        # doc 0: 6 text tokens, image(4), 2 text tokens  -> cum 6,10,12
        ("s", 0, [span("text", "a b c d e f"), span("media", ref="m0"),
                  span("text", "g h")]),
        # doc 1: 3 text tokens -> starts at 12; image starts at 15
        # (budget 16: atomic media overflows seq 0 by 3 tokens)
        ("s", 1, [span("text", "x y z"), span("media", ref="m1"),
                  span("text", "tail")]),
    ]
    df = spark.createDataFrame(
        rows,
        "source string, doc_id long, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = pack_interleaved(df, budget=16, media_cost=4).collect()
    got = {
        (r["doc_id"], r["span_pos"]): (
            r["n_tokens"], r["seq_id"], r["offset_in_seq"]
        )
        for r in out
    }
    assert got == {
        (0, 0): (6, 0, 0),
        (0, 1): (4, 0, 6),
        (0, 2): (2, 0, 10),
        (1, 0): (3, 0, 12),
        (1, 1): (4, 0, 15),   # atomic: starts in seq 0, overflows
        (1, 2): (1, 1, 3),    # next span continues where tokens end
    }
    # media rows carry the ref, text rows the text
    kinds = {(r["doc_id"], r["span_pos"]): (r["kind"], r["media_ref"])
             for r in out}
    assert kinds[(1, 1)] == ("media", "m1")


def test_keep_best_in_cluster_semantics(spark):
    """Max score wins; ties break to min id; NaN never beats a real
    score; singleton clusters pass through; payload columns survive."""
    import math

    from mini_html_parser_spark.operators import dedup as D

    rows = [
        # cluster c1: 7 wins on score
        (1, "c1", 0.5, "a"),
        (2, "c1", 0.9, "b"),
        (7, "c1", 0.9, "c"),   # tie with 2 on 0.9 → 2 wins (min id)
        # cluster c2: NaN loses to finite
        (3, "c2", math.nan, "d"),
        (4, "c2", 0.1, "e"),
        # singleton
        (5, "c3", 0.0, "f"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, cluster string, score double, payload string"
    )
    out = D.keep_best_in_cluster(df, "cluster", "score").orderBy("cluster")
    got = [(r["cluster"], r["doc_id"], r["payload"]) for r in out.collect()]
    assert got == [("c1", 2, "b"), ("c2", 4, "e"), ("c3", 5, "f")]

    # plan: partial-agg groupBy (map-side combine), no window sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_keep_longest_normalized(spark):
    """Whitespace/case variants cluster together; the longest raw
    variant survives, tie-break min id; unique docs pass through."""
    from mini_html_parser_spark.operators import dedup as D

    rows = [
        (10, "Hello   world"),        # base, 13 chars
        (11, "  hello world\t\n"),    # same normalized, 15 chars → wins len
        (12, "\thello  world  \n"),   # same normalized, 16 chars → WINNER
        (20, "unique document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in D.keep_longest_normalized(df).collect())
    assert got == [12, 20]


def test_bm25_topk_hand_computed(spark):
    """BM25 on a 3-doc corpus against hand-derived scores (k1=1.5,
    b=0.75, Lucene idf), and the plan shape: both stats joins
    broadcast, ranking is a TakeOrderedAndProject, no Python stage."""
    import math

    from mini_html_parser_spark.operators import retrieval as R

    docs = [
        (1, "spark shuffle join"),          # dl=3
        (2, "join join filter scan scan"),  # dl=5
        (3, "parquet scan pushdown"),       # dl=3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = R.bm25_topk(df, "join", k=3)
    got = {r["doc_id"]: r["bm25"] for r in out.collect()}

    def score(tf, dl, dfq, n=3.0, avgdl=11.0 / 3.0, k1=1.5, b=0.75):
        idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
        return round(idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert got == {1: score(1, 3, 2), 2: score(2, 5, 2)}
    assert 3 not in got  # no query term → no row, not a zero row

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats crossJoin
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_precomputed_postings_and_empty_query(spark):
    """The postings-reuse seam returns identical results, and an
    all-whitespace query is a loud error, not an empty frame."""
    import pytest as _pytest

    from mini_html_parser_spark.operators import retrieval as R

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "c d e")],
        "doc_id long, text string",
    )
    direct = R.bm25_topk(df, "b d", k=3).collect()
    reused = R.bm25_topk(
        df, "b d", k=3, postings=R.doc_terms(df)
    ).collect()
    assert direct == reused
    with _pytest.raises(ValueError):
        R.bm25_topk(df, "  \t ", k=3)


# ---- round-6 review-pass regressions ----------------------------------------


def test_semantic_dedup_no_star_degradation_above_128(spark):
    """Review r6 #1: clusters larger than the LSH star-edge cap (128)
    must still test junior-junior pairs — pairwise comparison IS the
    SemDeDup semantics (cosine is not transitive), and the DuckDB
    oracle is full pairwise.  140-vector single cluster with an
    identical junior pair far from the min-id representative: the
    junior of the pair must drop."""
    import numpy as np

    from mini_html_parser_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(140, 32))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[101] = vecs[100]  # junior-junior exact pair, ids mid-cluster
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(140)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = S.semantic_dedup(df, k=1, threshold=0.95)
    kept = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert len(kept) == 140
    assert kept[100] is True      # senior of the pair survives
    assert kept[101] is False     # junior must drop (star edges missed this)
    # random 32-dim unit vectors: no other pair reaches 0.95
    assert sum(1 for v in kept.values() if not v) == 1


def test_bm25_postings_only_no_corpus(spark):
    """Review r6 #6: with a precomputed postings frame, bm25_topk must
    not touch the corpus at all — (N, avgdl) derive from the postings
    (df=None works), and scores equal the direct path."""
    from mini_html_parser_spark.operators import retrieval as R

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "c d e")],
        "doc_id long, text string",
    )
    direct = R.bm25_topk(df, "b d", k=3).collect()
    postings_only = R.bm25_topk(None, "b d", k=3, postings=R.doc_terms(df)).collect()
    assert direct == postings_only


def test_dedup_paragraphs_regex_metachar_sep(spark):
    """Review r6 #5: sep is a LITERAL separator contract — a regex
    metacharacter sep ('|') must split on the character, not on the
    empty-alternation regex (which splits between every char)."""
    from mini_html_parser_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "shared line|unique one"), (2, "shared line|unique two")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.dedup_paragraphs(df, sep="|").collect()}
    assert out[1]["text"] == "shared line|unique one"
    assert out[2]["text"] == "unique two"
    assert out[2]["n_dropped"] == 1


def test_bm25_batch_topk_parity_and_plan(spark):
    """Batched BM25 must equal per-query bm25_topk exactly (same
    rounding, same tie-break), and the plan must be broadcast-joined
    with a WindowGroupLimit per-query cut — no SortMergeJoin, no
    Python stage."""
    from mini_html_parser_spark.operators import retrieval as R

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    queries = [(1, "hash join"), (2, "window stream scan")]
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    batch = R.bm25_batch_topk(df, qdf, k=5)
    got = {
        qid: [(r["doc_id"], r["bm25"]) for r in batch.filter(
            F.col("query_id") == qid).orderBy("rank").collect()]
        for qid, _ in queries
    }
    for qid, q in queries:
        single = [(r["doc_id"], r["bm25"]) for r in R.bm25_topk(df, q, k=5).collect()]
        assert got[qid] == single, qid

    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_join_semantics_and_plan(spark):
    """range_join edge cases (point==start in, point==end out,
    interval ending ON a bin edge claims no extra bin, multi-bin
    spans, key isolation), randomized parity vs the naive theta-join,
    and the plan pin: equi-join only — the naive shape's
    BroadcastNestedLoopJoin must NOT appear."""
    import numpy as np

    from mini_html_parser_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(1, "u", 0), (2, "u", 5), (3, "u", 10), (4, "u", 15), (5, "v", 5)],
        "pid long, k string, t long",
    )
    right = spark.createDataFrame(
        [
            (10, "u", 0, 10),   # catches t=0,5; NOT t=10 (end exclusive)
            (11, "u", 10, 12),  # ends on bin edge (w=4: bins 2 only)
            (12, "u", 3, 30),   # multi-bin span
            (13, "v", 0, 100),  # other key: only pid=5
        ],
        "wid long, k string, s long, e long",
    )
    out = range_join(left, right, "t", "s", "e", bin_width=4, key_cols=["k"])
    got = sorted((r["pid"], r["wid"]) for r in out.collect())
    assert got == [
        (1, 10), (2, 10), (2, 12),
        (3, 11), (3, 12), (4, 12), (5, 13),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # randomized parity vs the naive theta-join
    rng = np.random.default_rng(11)
    pts = [(int(i), int(k), int(t)) for i, (k, t) in enumerate(
        zip(rng.integers(0, 3, 200), rng.integers(0, 1000, 200)))]
    ivs = []
    for j in range(60):
        s = int(rng.integers(0, 950))
        ivs.append((j, int(rng.integers(0, 3)), s, s + int(rng.integers(1, 200))))
    l = spark.createDataFrame(pts, "pid long, k long, t long")
    r = spark.createDataFrame(ivs, "wid long, k long, s long, e long")
    fast = sorted((x["pid"], x["wid"]) for x in range_join(
        l, r, "t", "s", "e", bin_width=37, key_cols=["k"]).collect())
    naive = sorted((x["pid"], x["wid"]) for x in l.join(
        r, (l.k == r.k) & (r.s <= l.t) & (l.t < r.e)).collect())
    assert fast == naive and len(fast) > 100


def test_bm25_postings_incremental_maintenance(spark):
    """The postings table is incrementally maintainable BY
    CONSTRUCTION (rows are per-doc, no cross-doc state): appending
    doc_terms(new_batch) to a stored postings frame equals a full
    rebuild, and deletes are an anti-join on the id — the same
    maintain-the-summary pattern as the md5/bloom/band indexes."""
    from mini_html_parser_spark.operators import retrieval as R

    old = spark.createDataFrame(
        [(1, "spark shuffle join"), (2, "join filter scan")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(3, "parquet scan pushdown join")], "doc_id long, text string"
    )
    incremental = R.doc_terms(old).unionByName(R.doc_terms(new))
    rebuilt = R.doc_terms(old.unionByName(new))
    q = "join scan"
    a = R.bm25_topk(None, q, k=3, postings=incremental).collect()
    b = R.bm25_topk(None, q, k=3, postings=rebuilt).collect()
    assert a == b and len(a) == 3

    # retraction: drop doc 2's postings rows, results match a corpus
    # that never had it
    retracted = incremental.filter(F.col("doc_id") != 2)
    c = R.bm25_topk(None, q, k=3, postings=retracted).collect()
    d = R.bm25_topk(old.filter(F.col("doc_id") != 2).unionByName(new), q, k=3).collect()
    assert c == d


def test_top_terms_per_doc_hand_computed(spark):
    """TF-IDF keyword extraction against hand-derived scores on a
    3-doc corpus, postings-reuse parity, and the WindowGroupLimit
    per-doc cut."""
    import math

    from mini_html_parser_spark.operators import retrieval as R

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id long, text string",
    )
    out = R.top_terms_per_doc(df, n=1)
    got = {r["doc_id"]: (r["term"], r["tfidf"]) for r in out.collect()}

    def tfidf(tf, dl, dfq, n=3.0):
        return round(tf / dl * (math.log((1.0 + n) / (1.0 + dfq)) + 1.0), 6)

    # doc 1: apple tf=2/3 df=1 beats banana 1/3 df=2
    assert got[1] == ("apple", tfidf(2, 3, 1))
    # doc 3: date df=1 beats cherry df=2 at equal tf
    assert got[3] == ("date", tfidf(1, 2, 1))
    # doc 2: banana vs cherry both df=2, tf=1/2 -> tie, term ASC wins
    assert got[2] == ("banana", tfidf(1, 2, 2))

    reused = R.top_terms_per_doc(None, n=1, postings=R.doc_terms(df)).collect()
    assert sorted(reused, key=lambda r: r["doc_id"]) == [
        out.orderBy("doc_id").collect()[i] for i in range(3)
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- round-6 review pass 2 regressions ---------------------------------------


def test_keep_best_null_score_never_wins(spark):
    """Review r6 p2 #2: a NULL score must lose to any finite score
    (the unscored copy must not survive the cluster); an all-NULL
    cluster falls back to min id."""
    from mini_html_parser_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "c1", None, "x"), (2, "c1", 0.9, "y"),
         (5, "c2", None, "z"), (4, "c2", None, "w")],
        "doc_id long, cluster string, score double, payload string",
    )
    got = {r["cluster"]: r["doc_id"] for r in
           D.keep_best_in_cluster(df, "cluster", "score").collect()}
    assert got == {"c1": 2, "c2": 4}


def test_range_join_degenerate_intervals_safe(spark):
    """Review r6 p2 #3: reversed/empty intervals (corrupted sentinel
    rows) must be dropped BEFORE the bin sequence — a reversed
    interval would otherwise materialize a huge descending bin array
    — and an e==s interval on a bin edge must emit nothing."""
    from mini_html_parser_spark.operators.joins import range_join

    left = spark.createDataFrame([(1, 5)], "pid long, t long")
    right = spark.createDataFrame(
        [
            (10, 0, 10),                     # normal: matches
            (11, 1_700_000_000_000_000, 0),  # reversed sentinel
            (12, 4, 4),                      # empty, on a bin edge
        ],
        "wid long, s long, e long",
    )
    out = range_join(left, right, "t", "s", "e", bin_width=4)
    assert [(r["pid"], r["wid"]) for r in out.collect()] == [(1, 10)]


def test_bm25_null_text_stats_parity(spark):
    """Review r6 p2 #4: NULL-text rows are not documents — both entry
    points (df and precomputed postings) must compute identical
    (N, avgdl) and therefore identical scores on a corpus containing
    one."""
    from mini_html_parser_spark.operators import retrieval as R

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, None)],
        "doc_id long, text string",
    )
    direct = R.bm25_topk(df, "b d", k=3).collect()
    reused = R.bm25_topk(None, "b d", k=3, postings=R.doc_terms(df)).collect()
    assert direct == reused and len(direct) == 2


def test_neardup_against_within_batch_big_bucket(spark):
    """Review r6 p2 #1: the within-batch pass must run LSH over the
    SURVIVOR subset — a 130-member duplicate group (above the 128
    star-edge cap) whose min-id member is itself a corpus duplicate
    must still collapse to ONE survivor (the full-batch star edges
    anchored on the removed representative would keep all 129)."""
    from mini_html_parser_spark.operators import dedup as D

    dup_text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    batch = spark.createDataFrame(
        [(i, dup_text) for i in range(130)]
        + [(500, "completely unrelated fresh document text here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(9000, dup_text)], "doc_id long, text string"
    )
    out = D.neardup_against(batch, corpus, threshold=0.8)
    got = sorted(r["doc_id"] for r in out.collect())
    # every member of the group is a near-dup of corpus doc 9000, so
    # the cross-corpus pass removes them ALL; the unrelated doc stays
    assert got == [500]

    # and with a corpus that does NOT contain the group (pure
    # within-batch): exactly one representative survives
    out2 = D.neardup_against(
        batch,
        spark.createDataFrame([(9001, "nothing shared")], "doc_id long, text string"),
        threshold=0.8,
    )
    got2 = sorted(r["doc_id"] for r in out2.collect())
    assert got2 == [0, 500]
