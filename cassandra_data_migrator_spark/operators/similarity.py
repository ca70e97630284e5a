"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard scale trade-off:

- ``cosine_pairs`` / ``cosine_topk`` — brute force: broadcast the
  (small) query set against the corpus; exact, the correctness
  baseline. At 100 TB this is the per-batch path for small query sets
  (the broadcast join means NO shuffle of the big side).
- ``lsh_ann_topk`` — random-hyperplane LSH bucketing: corpus and
  queries are bucketed by sign-pattern; candidates join per bucket
  (multi-probe over single-bit flips), then exact re-rank. The scale
  path: candidate generation is a bucket equi-join instead of a cross
  product.
- ``ivf_ann_topk`` — inverted-file (IVF) index: deterministic
  hash-sampled centroids, codegen literal-fold cell assignment, nprobe
  nearest-cell probing, exact re-rank. The second scale path, with a
  data-dependent partitioning where LSH's is data-oblivious.

Dot products use ``F.zip_with`` + ``F.aggregate`` — whole-stage-codegen
JVM arithmetic, no Python. The LSH plane matrix is derived
deterministically from md5 so replays are stable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_pairs(
    corpus: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.8, round_digits: int | None = 4,
) -> DataFrame:
    """All (query, corpus) pairs with cosine ≥ threshold.

    ``broadcast(queries)`` × corpus: the big side streams through a
    broadcast-nested-loop with codegen'd arithmetic — no shuffle.
    Returns ``(query_id, neighbor_id, cosine)`` excluding self-pairs.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
    cos = cosine_expr(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .filter((F.col("cosine") >= threshold)
                & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k neighbors per query (rank ties broken by neighbor id)."""
    from pyspark.sql import Window

    pairs = cosine_pairs(corpus, queries, id_col, vec_col,
                         threshold=-2.0, round_digits=round_digits)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_params(corpus_size: int, target_bucket_rows: int = 64,
               recall_tables: int = 4) -> tuple[int, int]:
    """Scale LSH parameters with the corpus: ``(n_planes, n_tables)``.

    ``n_planes = ceil(log2(corpus_size / target_bucket_rows))`` keeps the
    expected bucket occupancy ≈ ``target_bucket_rows`` regardless of
    corpus size (2^n_planes buckets per table), so the candidate
    equi-join stays linear-ish; ``n_tables`` buys recall back
    independently. A fixed plane count (e.g. 6 → 64 buckets) is only
    right for toy corpora — at 10^9 vectors it would put ~10^7 vectors
    per bucket and degenerate to brute force.
    """
    import math
    n_planes = max(4, math.ceil(math.log2(max(corpus_size, 1)
                                          / max(target_bucket_rows, 1))))
    return n_planes, recall_tables


def _plane_matrix(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1] from md5."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append((int(h[:12], 16) % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id of a vector under the given planes."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        lits = F.array(*[F.lit(x) for x in plane])
        d = dot_expr(F.col(vec_col), lits)
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_ann_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 6, n_tables: int = 4, seed: int = 42,
    multiprobe: bool = True, round_digits: int | None = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH → candidate
    equi-join → exact cosine re-rank.

    Standard L-table LSH: each of ``n_tables`` independent plane sets
    produces a bucket key ``(table, bits)``; a pair is a candidate if it
    collides in ANY table, and ``multiprobe`` additionally probes every
    single-bit-flip bucket per table. Recall/cost is tuned by
    (n_planes, n_tables): more planes → smaller buckets (cheaper, lower
    recall per table); more tables → recall back up. The candidate join
    is an equi-join on the bucket key — the scale path that replaces the
    brute-force cross product. Size ``n_planes`` with
    :func:`ann_params`; measure the trade-off with :func:`recall_at_k`.

    ``dim`` is REQUIRED: deriving it from the corpus would run a driver
    action inside the operator's hot path (a job per call), and the
    caller always knows its embedding dimension statically.
    """
    from pyspark.sql import Window

    if dim is None:
        raise ValueError(
            "dim is required (the embedding dimension): deriving it "
            "from the corpus would run a driver-side job inside the "
            "operator — pass it explicitly")

    def bucket_for_table(t: int) -> Column:
        planes = _plane_matrix(n_planes, dim, seed + 1000 * t)
        return F.concat_ws(
            ":", F.lit(t),
            lsh_bucket_expr(vec_col, planes).cast("string"))

    def bucket_probes_for_table(t: int) -> Column:
        planes = _plane_matrix(n_planes, dim, seed + 1000 * t)
        bits = lsh_bucket_expr(vec_col, planes)
        variants = [bits] + (
            [bits.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)]
            if multiprobe else []
        )
        return F.array(*[
            F.concat_ws(":", F.lit(t), v.cast("string")) for v in variants
        ])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        F.explode(F.array(*[bucket_for_table(t) for t in range(n_tables)]))
         .alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.explode(F.flatten(F.array(
            *[bucket_probes_for_table(t) for t in range(n_tables)]
        ))).alias("bucket"),
    )

    cos = cosine_expr(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .select("query_id", "neighbor_id", "cosine")
        .distinct()   # a pair can collide in several tables/probes
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_ann_topk_scaled(
    corpus: DataFrame, queries: DataFrame, corpus_size: int, dim: int,
    k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    target_bucket_rows: int = 64, n_tables: int = 4, seed: int = 42,
    round_digits: int | None = 4,
) -> DataFrame:
    """The production entrypoint for ANN: :func:`ann_params` sizes the
    plane count from the corpus size so expected bucket occupancy stays
    ≈ ``target_bucket_rows`` at ANY scale (a fixed plane count
    degenerates to brute force as the corpus grows — 10^9 vectors in
    2^6 buckets is ~10^7 per bucket). ``corpus_size`` is passed in (a
    known catalog stat or one count at job setup), keeping the operator
    itself free of driver actions."""
    n_planes, n_tables = ann_params(corpus_size, target_bucket_rows,
                                    n_tables)
    return lsh_ann_topk(corpus, queries, k=k, id_col=id_col,
                        vec_col=vec_col, n_planes=n_planes,
                        n_tables=n_tables, seed=seed,
                        round_digits=round_digits, dim=dim)


def ivf_params(corpus_size: int, target_cell_rows: int = 256,
               ) -> tuple[int, int]:
    """Size an IVF index from the corpus: ``(n_cells, nprobe)``.

    ``n_cells = ceil(corpus_size / target_cell_rows)`` keeps expected
    cell occupancy constant at any scale; ``nprobe = ceil(sqrt(n_cells))``
    is the standard recall/cost starting point (probe cost grows with
    the square root of the cell count, not the corpus).
    """
    import math
    n_cells = max(4, math.ceil(max(corpus_size, 1)
                               / max(target_cell_rows, 1)))
    return n_cells, max(1, math.ceil(math.sqrt(n_cells)))


def ivf_centroids(corpus: DataFrame, n_cells: int,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  ) -> list[list[float]]:
    """Deterministic sampling-init centroids: the ``n_cells`` corpus
    vectors with the smallest portable md5 hash of their id (ties by
    id). A ONE-TIME bounded driver action at job setup — K rows, fetched
    with TakeOrdered (map-side top-K per partition, no shuffle) — the
    same contract as ``corpus_size`` for the LSH path; the query-time
    operator itself runs no driver action. Hash-sampling init (instead
    of k-means/Lloyd) keeps the index bit-reproducible in ANY engine:
    a DuckDB oracle replays the same pick with ``ORDER BY md5 LIMIT K``.
    Cell id = position in the returned list.
    """
    from cassandra_data_migrator_spark.functions.hashing import (
        md5_int48_expr,
    )
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(md5_int48_expr("_id"), F.col("_id"))
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r["_v"]] for r in rows]


def _ivf_cell_structs(vec_col: str, centroids: list[list[float]],
                      round_digits: int | None) -> list[Column]:
    """One ``struct(cos, cell)`` per centroid — the shared literal-fold
    input of the ranked (query-side) and argmax (corpus-side) forms."""
    entries = []
    for i, cv in enumerate(centroids):
        lits = F.array(*[F.lit(float(x)) for x in cv])
        cos = cosine_expr(F.col(vec_col), lits)
        if round_digits is not None:
            cos = F.round(cos, round_digits)
        entries.append(F.struct(cos.alias("cos"),
                                F.lit(i).alias("cell")))
    return entries


def ivf_cell_expr(vec_col: str, centroids: list[list[float]],
                  round_digits: int | None = 4) -> Column:
    """The single nearest cell for one vector — an O(K) argmax fold
    (``F.aggregate`` keeping the best struct), NOT a sort: the corpus
    side of the index build runs this on every row, and sorting K
    structs to take element 1 pays an O(K log K) comparator plus an
    array rebuild for nothing. Tie-break matches the ranked form
    exactly: strict ``>`` keeps the earlier (lower-id) cell on equal
    rounded cosine, i.e. (cos desc, cell asc)."""
    entries = _ivf_cell_structs(vec_col, centroids, round_digits)
    best = F.aggregate(
        F.array(*entries[1:]), entries[0],
        lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc))
    return best["cell"]


def ivf_ranked_cells_expr(vec_col: str, centroids: list[list[float]],
                          round_digits: int | None = 4) -> Column:
    """Cells ranked nearest-first for one vector, as an ``array<int>``.

    The centroid matrix is baked into the plan as literals (same
    technique as the LSH planes): K codegen'd dot products + one
    ``array_sort`` per row — NO shuffle, NO join, NO Python for the
    assignment. The comparator orders by (rounded cosine desc, cell
    asc); an explicit comparator rather than a packed negated-struct
    sort so ±0.0 compare equal, matching SQL ORDER BY in every engine.
    Suited to K up to a few thousand (plan-size bound); a billion-scale
    corpus wants K ≈ sqrt(N) per *partition group* — shard the corpus
    and union per-shard indexes rather than growing one literal matrix.
    """
    entries = _ivf_cell_structs(vec_col, centroids, round_digits)

    def cmp(l, r):  # noqa: E741 - l/r mirror Spark's comparator docs
        return (
            F.when(l["cos"] > r["cos"], -1)
            .when(l["cos"] < r["cos"], 1)
            .when(l["cell"] < r["cell"], -1)
            .when(l["cell"] > r["cell"], 1)
            .otherwise(0)
        )

    ranked = F.array_sort(F.array(*entries), cmp)
    return F.transform(ranked, lambda s: s["cell"])


def ivf_ann_topk(
    corpus: DataFrame, queries: DataFrame, centroids: list[list[float]],
    k: int = 10, nprobe: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the
    second scale path next to :func:`lsh_ann_topk`, per the standard
    ANN taxonomy (coarse quantizer + probed exact re-rank).

    Each corpus vector is assigned to its nearest centroid cell (a
    pure-codegen literal fold, :func:`ivf_ranked_cells_expr`); each
    query probes its ``nprobe`` nearest cells; candidates are the cell
    equi-join of the two (queries broadcast), then exact cosine re-rank.
    Unlike LSH, a corpus vector lives in exactly ONE cell, so a
    candidate pair arises at most once — no distinct needed before the
    top-k window. Build cost is K dot products per corpus row with no
    shuffle; probe cost is |queries| × nprobe cells of expected
    occupancy N/K.
    """
    from pyspark.sql import Window

    # corpus side (the big one): O(K) argmax fold for its single cell;
    # query side (small, broadcast): full ranking, sliced to nprobe
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        ivf_cell_expr(vec_col, centroids, round_digits).alias("cell"),
    )
    ranked = ivf_ranked_cells_expr(vec_col, centroids, round_digits)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.explode(F.slice(ranked, 1, nprobe)).alias("cell"),
    )
    cos = cosine_expr(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .select("query_id", "neighbor_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_ann_topk_scaled(
    corpus: DataFrame, queries: DataFrame, corpus_size: int,
    k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    target_cell_rows: int = 256, round_digits: int | None = 4,
) -> DataFrame:
    """Production IVF entrypoint: :func:`ivf_params` sizes the index
    from the corpus, :func:`ivf_centroids` picks the deterministic
    centroids (one bounded setup action), then :func:`ivf_ann_topk`."""
    n_cells, nprobe = ivf_params(corpus_size, target_cell_rows)
    cents = ivf_centroids(corpus, n_cells, id_col, vec_col)
    return ivf_ann_topk(corpus, queries, cents, k=k, nprobe=nprobe,
                        id_col=id_col, vec_col=vec_col,
                        round_digits=round_digits)


def cosine_near_dup(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    n_planes: int | None = None,
    n_tables: int = 2,
    corpus_size: int | None = None,
    seed: int = 42,
    round_digits: int | None = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at corpus scale — the
    vector-space member of the dedup family (exact hash / MinHash-LSH /
    SimHash / n-gram Jaccard are its text-space siblings in
    ``operators.dedup``).

    Candidate generation is a multi-table hyperplane-LSH SELF-join:
    near-identical vectors agree on almost every sign bit, so a pair
    with cosine ≥ a high threshold lands in the same bucket of at least
    one table with high probability, and the join is a per-bucket
    equi-join — never the O(n²) cross product. Exact cosine then
    verifies each candidate once (``dropDuplicates`` across tables
    first). Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b``.

    Sizing mirrors :func:`lsh_ann_topk_scaled`: pass ``n_planes``
    explicitly or ``corpus_size`` to let :func:`ann_params` hold the
    expected bucket occupancy constant at any scale. ``max_bucket_size``
    drops degenerate buckets (e.g. a spam cluster of one repeated
    embedding) before the quadratic-within-bucket join, same guard
    rationale as ``dedup.lsh_candidates``.
    """
    if n_planes is None:
        if corpus_size is None:
            raise ValueError(
                "pass n_planes explicitly or corpus_size so ann_params "
                "can size the bucket space (a fixed default would "
                "degenerate at scale)")
        n_planes, _ = ann_params(corpus_size)
    plane_sets = [_plane_matrix(n_planes, dim, seed + 1000 * t)
                  for t in range(n_tables)]
    entries = F.array(*[
        F.struct(F.lit(t).alias("t"),
                 lsh_bucket_expr(vec_col, plane_sets[t]).alias("b"))
        for t in range(n_tables)
    ])
    tagged = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                      F.explode(entries).alias("tb"))
        .select("id", "v", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    )
    if max_bucket_size is not None:
        ok = (tagged.groupBy("t", "b").count()
              .filter(F.col("count") <= max_bucket_size)
              .select("t", "b"))
        tagged = tagged.join(F.broadcast(ok), ["t", "b"], "left_semi")
    left = tagged.select("t", "b", F.col("id").alias("id_a"),
                         F.col("v").alias("va"))
    right = tagged.select("t", "b", F.col("id").alias("id_b"),
                          F.col("v").alias("vb"))
    pairs = (
        left.join(right, ["t", "b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])      # verify once across tables
    )
    cos = cosine_expr(F.col("va"), F.col("vb"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall@k of an approximate top-k against the exact
    baseline: ``(query_id, hits, total, recall)`` with recall =
    |approx ∩ exact| / |exact| over neighbor sets. Both inputs are
    ``(query_id, neighbor_id, …)`` frames (e.g. :func:`lsh_ann_topk`
    vs :func:`cosine_topk`) — two tiny aggregations over k·|queries|
    rows, used to tune (n_planes, n_tables) empirically."""
    a = approx.select("query_id", "neighbor_id")
    e = exact.select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id").agg(F.count("*").alias("hits"))
    )
    totals = e.groupBy("query_id").agg(F.count("*").alias("total"))
    return (
        totals.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            "total",
            (F.coalesce(F.col("hits"), F.lit(0)) / F.col("total"))
            .alias("recall"),
        )
    )
