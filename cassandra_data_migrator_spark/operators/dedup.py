"""Deduplication operator family for training-data pipelines.

Beyond the reference's scope (CDM's only dedup is LWW by writetime),
these are the standard web-corpus dedup operators, built Spark-first:

- exact:   hash-groupBy on content (one shuffle, map-side partial agg)
- minhash: shingle → k min-hashes → LSH bands → bucket-join candidates
           → exact-Jaccard verify (no O(n²) pair scan)
- simhash: bitwise-majority fingerprint → hamming buckets
- n-gram Jaccard: exact set-overlap via token inverted index (join on
  token, never a cross join)

All hashes use the portable md5-derived 48-bit integers
(:func:`~cassandra_data_migrator_spark.functions.hashing.md5_int48_expr`)
so every step is DuckDB-oracle-checkable.

Scale notes: each stage is a single groupBy/join shuffle keyed on
content-derived values (uniformly distributed — no skew); LSH keeps
candidate generation linear-ish in corpus size. At 100 TB the
inverted-index joins benefit from AQE skew handling on stop-shingles;
``min_token_len``/distinct-shingling bounds index fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.hashing import md5_int48_expr


def tokens_expr(text_col: str, lowercase: bool = True):
    """Whitespace tokens, empties removed (portable: DuckDB
    ``list_filter(string_split(...), x -> x <> '')``)."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, " "), lambda x: x != "")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct content.

    Returns ``(<id_col>, dup_count)`` — the kept representative per
    content group and how many rows share that content. Single shuffle
    on the content hash with map-side combine.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_content_hash"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("_content_hash")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: ``(id, shingle)``.

    Built with a transform over the token array (JVM-side), then
    exploded — no Python in the loop.
    """
    toks = tokens_expr(text_col)
    if n == 1:
        sh = F.array_distinct(toks)
    else:
        # shingle i = tokens[i..i+n-1] joined by ' '
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        sh = F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(idx, lambda i: F.concat_ws(
                    " ", F.slice(toks, i + 1, n)))
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    return df.select(F.col(id_col), F.explode(sh).alias("shingle"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 8, shingle_n: int = 1,
) -> DataFrame:
    """k-minhash signature per document: ``(id, sig_0..sig_{k-1})``.

    sig_i = min over shingles of md5_int48(shingle # i). One explode +
    one groupBy (map-side partial min) — the classic scalable shape.
    """
    sh = shingles(df, id_col, text_col, n=shingle_n)
    aggs = [
        F.min(md5_int48_expr(F.col("shingle"), salt=i)).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _drop_oversized_buckets(
    melted: DataFrame, bucket_col: str, max_bucket_size: int
) -> DataFrame:
    """Degenerate-bucket guard for bucket-join candidate generation.

    A corpus of near-identical documents collapses into ONE band /
    segment bucket, and the self-join over it is quadratic in that
    bucket's size — AQE spreads the skew across tasks but cannot cap
    the pair count itself. The standard mitigation: drop buckets larger
    than ``max_bucket_size`` outright (members that are genuine
    near-dups still pair through their OTHER bands/segments unless
    those are equally degenerate — in which case the corpus needs exact
    dedup first, which such a corpus by construction mostly is).

    Plan shape: the oversized-key list is tiny (it takes >max docs to
    create one), so it is aggregated and broadcast as a left-anti join
    — no extra full shuffle of the melted frame. Use
    :func:`oversized_buckets` to audit what a given cap would drop.
    """
    oversized = oversized_buckets(
        melted, bucket_col, max_bucket_size).select(bucket_col)
    return melted.join(F.broadcast(oversized), bucket_col, "left_anti")


def oversized_buckets(
    melted: DataFrame, bucket_col: str, max_bucket_size: int
) -> DataFrame:
    """Audit companion to the ``max_bucket_size`` guard: the bucket keys
    and sizes that a given cap would drop (log/inspect before enabling)."""
    return (
        melted.groupBy(bucket_col)
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def _band_array(num_hashes: int, band_size: int):
    """The LSH band-key array expression over ``sig_0..sig_{k-1}``:
    band b = ``'b_sig..._sig...'`` (string keys so the same construction
    is replayable as DuckDB string concat in the oracles)."""
    n_bands = num_hashes // band_size
    return F.array(*[
        F.concat_ws("_", F.lit(b), *[
            F.col(f"sig_{b * band_size + j}").cast("string")
            for j in range(band_size)
        ])
        for b in range(n_bands)
    ])


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str,
    num_hashes: int = 8, band_size: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: pairs sharing ≥1 band: ``(id_a, id_b)`` with a<b.

    Bands are exploded to ``(band_key, id)`` and self-joined per key —
    candidate generation without any all-pairs scan.

    ``max_bucket_size`` (optional): drop band buckets holding more than
    this many documents before the self-join, bounding worst-case
    candidate volume on duplicate-heavy corpora (see
    :func:`_drop_oversized_buckets`).
    """
    bands = _band_array(num_hashes, band_size)
    melted = sig_df.select(F.col(id_col), F.explode(bands).alias("band_key"))
    if max_bucket_size is not None:
        melted = _drop_oversized_buckets(melted, "band_key", max_bucket_size)
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(b, on="band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str,
    shingle_n: int = 1, candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity per document pair via inverted index.

    ``(id_a, id_b, inter_size, size_a, size_b, jaccard)``; restricted to
    ``candidates`` when given (the LSH output), else all pairs sharing
    ≥1 shingle. Joins only on shingle/id keys — no cross join.

    With ``candidates`` the expensive step is BOUNDED by them: the
    intersection is computed as candidates → a-side shingles →
    equi-join on ``(id_b, shingle)``, i.e. O(|candidates| ×
    shingles/doc) — the whole point of LSH. The inverted-index
    self-join (quadratic in stop-shingle frequency) only runs in the
    unrestricted mode.
    """
    sh = shingles(df, id_col, text_col, n=shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    if candidates is not None:
        inter = (
            candidates.select("id_a", "id_b")
            .join(sh.withColumnRenamed(id_col, "id_a"), on="id_a")
            .join(sh.withColumnRenamed(id_col, "id_b"),
                  on=["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter_size"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, on="shingle")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count("*").alias("inter_size"))
        )
    out = (
        inter
        .join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "size_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter_size").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter_size")),
        )
    )
    return out.select("id_a", "id_b", "inter_size", "size_a", "size_b", "jaccard")


def minhash_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 8, band_size: int = 2,
    shingle_n: int = 1, threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup chain: signatures → bands → candidates
    → exact-Jaccard verify ≥ threshold. Returns verified near-dup pairs."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, band_size,
                               max_bucket_size=max_bucket_size)
    pairs = jaccard_pairs(df, id_col, text_col, shingle_n, candidates=cand)
    return pairs.filter(F.col("jaccard") >= threshold)


class NotConverged(RuntimeError):
    """connected_components hit max_iter with labels still changing."""


def connected_components(
    pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b",
    max_iter: int = 25, id_out: str = "id",
) -> DataFrame:
    """Distributed connected components over a pair frame →
    ``(<id_out>, cluster_id, keep)``.

    The missing last step of every near-dup chain
    (:func:`minhash_dedup_pairs`, :func:`simhash_dup_pairs`,
    ``similarity.cosine_near_dup``): pairs say *who matches whom*, but
    the pipeline action is "drop all but one per duplicate CLUSTER",
    which needs the transitive closure. ``cluster_id`` is the MIN id
    reachable from each node (deterministic — independent of
    partitioning and iteration order), ``keep`` marks the canonical
    survivor (``id == cluster_id``). Only ids appearing in ``pairs``
    are emitted; unpaired documents are trivially their own survivors
    (see :func:`survivor_keep_list`).

    Algorithm: iterated min-label propagation with pointer jumping —
    per round, every node takes ``min(own, neighbors', label-of-label)``
    — the DataFrame-native form of the alternating large-star/small-star
    CC (Kiveris et al., "Connected Components in MapReduce and Beyond").
    Neighbor propagation alone converges in O(diameter) rounds; the
    pointer-jump join halves label-chain depth per round, giving
    O(log d) — near-dup clusters are dense and shallow, so 2-4 rounds
    is typical. Each round is two thin shuffles over (id, label) rows
    (~16 B/row); ``localCheckpoint`` truncates the iterative lineage so
    round N's plan does not replay rounds 1..N-1 (on a multi-executor
    cluster with lossy storage, set a checkpoint dir and swap in
    ``.checkpoint()`` for durability). NO driver-side union-find: the
    driver sees one scalar (the changed-count) per round.

    Raises :class:`NotConverged` past ``max_iter`` — with pointer
    jumping that takes a pathological 2^25-diameter chain, so in
    practice it only flags a bug, never data.
    """
    e = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")) \
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .distinct().persist()
    )
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("cc", F.col("id"))
              .localCheckpoint(eager=True))
    try:
        for _ in range(max_iter):
            # min label among neighbors (map-side combined)
            nbr = (
                edges.join(labels.select(F.col("id").alias("src"),
                                         F.col("cc").alias("scc")), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("scc").alias("ncc"))
            )
            # pointer jump: my label's own current label
            jump = labels.select(F.col("id").alias("_j"),
                                 F.col("cc").alias("jcc"))
            new = (
                labels.join(nbr, "id", "left")
                .join(jump, F.col("cc") == F.col("_j"), "left")
                .select(
                    "id",
                    F.least(F.col("cc"),
                            F.coalesce("ncc", "cc"),
                            F.coalesce("jcc", "cc")).alias("cc"),
                    (F.col("cc") != F.least(
                        F.col("cc"), F.coalesce("ncc", "cc"),
                        F.coalesce("jcc", "cc"))).alias("_chg"),
                )
            ).localCheckpoint(eager=True)
            changed = new.filter(F.col("_chg")).limit(1).count()
            labels = new.drop("_chg")
            if changed == 0:
                break
        else:
            raise NotConverged(
                f"connected_components: labels still changing after "
                f"{max_iter} rounds — raise max_iter")
    finally:
        edges.unpersist()
    return labels.select(
        F.col("id").alias(id_out),
        F.col("cc").alias("cluster_id"),
        (F.col("cc") == F.col("id")).alias("keep"),
    )


# explicit-broadcast budget for the dedup terminal's drop set: sized
# for a few-GB driver/executor heap, far above autoBroadcastJoinThreshold
# because a single-column id relation is cheap to build and ship
BROADCAST_DROP_BYTES = 256 << 20


def _anti_join_drop_ids(
    df: DataFrame, drop: DataFrame, id_col: str,
    broadcast_bytes: int = BROADCAST_DROP_BYTES,
) -> DataFrame:
    """Shared dedup terminal: anti-join ``df`` against a single-column
    drop-id frame with byte-priced explicit broadcast. Pricing the drop
    set costs one thin aggregate — and buys the join choice the static
    planner can't make (checkpoint-/probe-backed frames have no size
    stats): at or under ``broadcast_bytes`` the drop set is explicitly
    broadcast, so the anti-join never shuffles ``df``'s payload
    columns. The gate is in BYTES (count × mean id width + per-row
    overhead), not rows — wide string ids (URLs) at a row-count gate
    could force a driver-OOM-sized broadcast that a plain shuffle
    anti-join would survive. Past the budget (a corpus that is mostly
    duplicates) the payload shuffle is the physics of the problem, not
    a plan miss; run exact dedup first."""
    stats = drop.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length(F.col(id_col).cast("string"))).alias("w")).first()
    est_bytes = int((stats["n"] or 0) * (float(stats["w"] or 8.0) + 16))
    if est_bytes <= broadcast_bytes:
        drop = F.broadcast(drop)
    return df.join(drop, id_col, "left_anti")


def apply_keep_list(
    df: DataFrame, cc: DataFrame, id_col: str,
    broadcast_bytes: int = BROADCAST_DROP_BYTES,
) -> DataFrame:
    """The batch-dedup terminal: anti-join ``df`` against ``cc``'s
    non-survivors (``keep == false``), keeping exactly one canonical
    member per duplicate cluster. ``cc`` is
    :func:`connected_components` output (materialized — its labels are
    localCheckpoint-truncated). Broadcast pricing:
    :func:`_anti_join_drop_ids`."""
    drop = cc.filter(~F.col("keep")).select(F.col("id").alias(id_col))
    return _anti_join_drop_ids(df, drop, id_col, broadcast_bytes)


def survivor_keep_list(
    df: DataFrame, pairs: DataFrame, id_col: str,
    src_col: str = "id_a", dst_col: str = "id_b", max_iter: int = 25,
    broadcast_bytes: int = BROADCAST_DROP_BYTES,
) -> DataFrame:
    """Drop every non-canonical duplicate: ``df`` minus the ids whose
    cluster survivor is another document. Unpaired documents pass
    through untouched (they are their own clusters). Composition of
    :func:`connected_components` and :func:`apply_keep_list` (which
    documents the anti-join's broadcast pricing)."""
    cc = connected_components(pairs, src_col, dst_col, max_iter=max_iter)
    return apply_keep_list(df, cc, id_col, broadcast_bytes=broadcast_bytes)


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = 48) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over token hashes.

    ``(id, simhash)`` where bit j is set iff more token hashes have bit
    j set than not. explode → single groupBy with ``bits`` conditional
    sums (all JVM-side).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    ).withColumn("h", md5_int48_expr(F.col("tok")))
    aggs = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*aggs)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return per_doc.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      bits: int = 48, max_hamming: int = 3,
                      max_bucket_size: int | None = None) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ max_hamming.

    Candidate generation splits the fingerprint into ``max_hamming + 1``
    bit segments: by pigeonhole, any pair within hamming ≤ max_hamming
    must agree on at least one whole segment, so segment-equality
    buckets are a COMPLETE candidate set (no missed pairs). Exact
    ``bit_count`` verify afterwards. Candidate volume is tuned by
    ``bits`` (wider fingerprint → smaller buckets).

    Scale rule: keep every segment ≥ 12 bits (``bits >= 12 *
    (max_hamming + 1)``) or buckets collapse to a handful of distinct
    values and candidate volume goes near-quadratic — the md5-derived
    hash provides 48 usable bits, so the 48/3 default gives 4 × 12-bit
    segments (4096 bucket values each).

    ``max_bucket_size`` (optional): drop segment buckets holding more
    than this many documents before the self-join — the guard against
    duplicate-heavy corpora where every fingerprint is identical and
    one bucket would go quadratic (see :func:`_drop_oversized_buckets`).
    """
    fps = simhash(df, id_col, text_col, bits)
    n_seg = max_hamming + 1
    seg_w = bits // n_seg  # last segment absorbs the remainder bits
    seg_cols = []
    for s in range(n_seg):
        width = seg_w if s < n_seg - 1 else bits - seg_w * (n_seg - 1)
        seg = F.shiftright(F.col("simhash"), s * seg_w) \
               .bitwiseAND(F.lit((1 << width) - 1))
        seg_cols.append(
            F.concat_ws(":", F.lit(s), seg.cast("string")))
    melted = fps.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*seg_cols)).alias("bucket"),
    )
    if max_bucket_size is not None:
        melted = _drop_oversized_buckets(melted, "bucket", max_bucket_size)
    a = melted.alias("a")
    b = melted.alias("b")
    pairs = (
        a.join(b, on="bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .distinct()
        .withColumn("hamming",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# Online (order-sensitive, first-wins) dedup — batch + incremental forms
# ---------------------------------------------------------------------------
#
# The batch chain above answers "which documents in THIS corpus are
# near-dups of each other"; an ingest pipeline needs the other shape:
# documents arrive in a stream, and each one must be kept or dropped
# NOW, against everything already seen. The standard online rule:
#
#   a document is a duplicate iff any STRICTLY-EARLIER document (by a
#   unique, monotone ``seq``) shares at least one minhash-LSH band
#   bucket with it; kept documents are exactly the bucket openers.
#
# Because "earlier" refers to arrival order over ALL seen documents
# (kept or dropped), the rule is independent of how the stream is cut
# into micro-batches — the incremental implementation below provably
# computes the same keep-set as the one-shot declarative form for ANY
# batching, which is also what makes it replay-idempotent and
# DuckDB-oracle-checkable. (Indexing dropped documents' buckets too is
# deliberate: it gives the chain-transitivity a batch pipeline gets
# from connected components — C near B near A collapses to A.)


def _online_bands(
    df: DataFrame, id_col: str, text_col: str, seq_col: str,
    num_hashes: int = 8, band_size: int = 2, shingle_n: int = 3,
) -> DataFrame:
    """Melted LSH band buckets with arrival order:
    ``(<id_col>, _seq, band_key)``. One explode + one groupBy (map-side
    partial min) for the signatures; ``seq`` rides a thin (id, seq)
    join when it is a separate column."""
    from pyspark.sql import types as T
    seq_type = df.schema[seq_col].dataType
    if not isinstance(seq_type, (T.ByteType, T.ShortType,
                                 T.IntegerType, T.LongType)):
        # a blind cast('long') would NULL (or, under ANSI, crash on)
        # non-numeric ids — and NULL seqs make the probe's
        # first_seq < _seq silently detect ZERO duplicates while the
        # one-shot form still tie-breaks by id: the two forms would
        # diverge with no error. Fail loudly instead.
        raise ValueError(
            f"online dedup needs an integral arrival-order column; "
            f"{seq_col!r} is {seq_type.simpleString()} — pass a numeric "
            f"seq/order column (CLI: --order-col)")
    sh = shingles(df, id_col, text_col, n=shingle_n)
    aggs = [
        F.min(md5_int48_expr(F.col("shingle"), salt=i)).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    if seq_col != id_col:
        sigs = sigs.join(df.select(id_col, seq_col), id_col)
        seq_expr = F.col(seq_col)
    else:
        seq_expr = F.col(id_col)
    return sigs.select(
        F.col(id_col), seq_expr.cast("long").alias("_seq"),
        F.explode(_band_array(num_hashes, band_size)).alias("band_key"),
    )


def online_dedup_keep(
    df: DataFrame, id_col: str, text_col: str, seq_col: str | None = None,
    num_hashes: int = 8, band_size: int = 2, shingle_n: int = 3,
    broadcast_bytes: int = BROADCAST_DROP_BYTES,
) -> DataFrame:
    """One-shot declarative form of online first-wins dedup: the rows
    of ``df`` whose every band bucket they themselves opened (no
    strictly-earlier ``seq`` shares any bucket). ``seq_col`` defaults
    to ``id_col`` (arrival order = id order); ties on ``seq`` break by
    id, so the result is deterministic even with duplicate seqs.

    Plan shape (all thin rows): explode → ONE shuffle on band_key
    where a window ``min(struct(seq, id)) over (partition by
    band_key)`` finds each bucket's opener in the same pass that
    compares every member against it (a groupBy+join-back would
    compute the melted-bands frame twice) → distinct dup-id set →
    byte-priced anti-join against the corpus (the payload is never
    shuffled). Band keys are md5-derived — uniformly distributed, so
    the window partitioning has no inherent skew; a duplicate-heavy
    corpus concentrates buckets by construction, and the same
    trade-off notes as :func:`lsh_candidate_pairs` apply.

    The incremental equivalent (identical keep-set for any micro-batch
    cut of ``df`` in seq order): :func:`incremental_dedup_batch`.
    """
    seq_col = seq_col or id_col
    bands = _online_bands(df, id_col, text_col, seq_col,
                          num_hashes, band_size, shingle_n)
    mine = F.struct(F.col("_seq"), F.col(id_col).cast("string"))
    w = Window.partitionBy("band_key")
    dup = (
        bands.withColumn("_open", F.min(mine).over(w))
        .filter(mine > F.col("_open"))
        .select(id_col).distinct()
    )
    return _anti_join_drop_ids(df, dup, id_col, broadcast_bytes)


def create_band_index(spark, path: str, n_buckets: int = 32):
    """Initialise the persistent band-bucket index used by
    :func:`incremental_dedup_batch`: a lake table keyed on ``band_key``
    whose row per bucket records the bucket's OPENER —
    ``(band_key, neg_seq, first_seq, first_id)``.

    ``neg_seq`` (= ``-first_seq``) is the table's LWW timestamp column:
    under max-wins merge order the SMALLEST seq wins, so concurrent or
    re-applied batches converge on the true first opener without any
    read-modify-write. The table's hash-bucket layout doubles as the
    probe's pruning structure (band keys are md5-uniform — no skew)."""
    from pyspark.sql import types as T

    from cassandra_data_migrator_spark.config import EngineConfig
    from cassandra_data_migrator_spark.lake import LakeTable

    schema = T.StructType([
        T.StructField("band_key", T.StringType(), False),
        T.StructField("neg_seq", T.LongType(), True),
        T.StructField("first_seq", T.LongType(), True),
        T.StructField("first_id", T.StringType(), True),
    ])
    return LakeTable.create(
        spark, path, schema,
        EngineConfig(n_buckets=n_buckets, key_col="band_key",
                     ts_col="neg_seq"))


def incremental_dedup_batch(
    index, batch_df: DataFrame, id_col: str, text_col: str, seq_col: str,
    num_hashes: int = 8, band_size: int = 2, shingle_n: int = 3,
    stream_id: str | None = None, epoch_id: int | None = None,
    broadcast_bytes: int = BROADCAST_DROP_BYTES,
) -> DataFrame:
    """One micro-batch of online first-wins dedup against a persistent
    band index (:func:`create_band_index`): returns the KEPT rows of
    ``batch_df`` and records the batch's band buckets in the index.

    Requires a globally unique ``seq_col`` across the whole stream
    (CDC ``seq`` / ``doc_id`` are) — uniqueness is what makes the
    result batching-invariant AND replay-idempotent. Equal seqs would
    tie on "who opened the bucket" and both survive the probe.

    Order of operations (crash-consistent, exactly-once):

    1. MERGE the batch's per-bucket openers into the index, fenced on
       ``(stream_id, epoch_id)``. Version order is ``neg_seq`` =
       ``-seq``, so max-wins LWW keeps the smallest seq — the global
       first opener — regardless of batch arrival order or replays
       (a fenced re-delivery no-ops; the index already holds the
       epoch's buckets).
    2. Probe the index for the batch's buckets — pruned by the index's
       own hash-bucket layout to exactly the touched buckets (the
       driver sees only the bounded bucket-id list, never rows) — and
       drop every doc whose bucket has an opener with a strictly
       smaller seq. Probing AFTER the merge makes step 2 one rule for
       both cross-batch and within-batch duplicates, and a replayed
       epoch recomputes the identical keep-set from the fenced index.

    A downstream sink fenced with the SAME ``(stream_id, epoch_id)``
    (e.g. the kept-corpus table in
    :func:`~cassandra_data_migrator_spark.streaming.dedupstream.run_online_dedup_stream`)
    then gets end-to-end exactly-once: a crash between the index commit
    and the sink commit replays into a fenced index no-op plus a
    deterministic re-probe, and the sink applies once.
    """
    bands = _online_bands(batch_df, id_col, text_col, seq_col,
                          num_hashes, band_size, shingle_n).persist()
    try:
        src = (
            bands.groupBy("band_key")
            .agg(F.min(F.struct(
                F.col("_seq"),
                F.col(id_col).cast("string").alias("_id"))).alias("_open"))
            .select(
                "band_key",
                (-F.col("_open._seq")).alias("neg_seq"),
                F.col("_open._seq").alias("first_seq"),
                F.col("_open._id").alias("first_id"),
                F.lit("upsert").alias("op"),
                (-F.col("_open._seq")).alias("_mseq"),
            )
        )
        index.merge_batch(src, op_col="op", seq_col="_mseq",
                          stream_id=stream_id, epoch_id=epoch_id)
        touched = [
            r["b"] for r in bands.select(
                index.bucket_of(F.col("band_key")).alias("b"))
            .distinct().collect()
        ]
        idx = index.read(buckets=touched).select("band_key", "first_seq")
        dup = (
            bands.join(idx, "band_key")
            .filter(F.col("first_seq") < F.col("_seq"))
            .select(id_col).distinct()
            .localCheckpoint(eager=True)
        )
    finally:
        bands.unpersist()
    return _anti_join_drop_ids(batch_df, dup, id_col, broadcast_bytes)
