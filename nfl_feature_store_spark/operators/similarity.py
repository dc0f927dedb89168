"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: query set broadcast against
  the corpus, dot products via zip_with/aggregate (JVM higher-order
  functions, no Python), per-query top-k via window. The baseline every
  approximate method is measured against.
* :func:`lsh_topk` — random-hyperplane (sign-LSH) bucketed variant: corpus
  hashed once into 2^bits buckets; each query probes only its own bucket
  (plus optional multi-probe neighbors) — the scale path: candidate set per
  query is |corpus| / 2^bits on average, and the expensive exact rerank runs
  only on candidates.

* :func:`ivf_topk` — inverted-file (IVF) variant: a KMeans coarse quantizer
  (MLlib, fitted on a corpus sample) partitions the corpus into centroid
  buckets once; each query probes its ``n_probe`` nearest centroids and
  exact-reranks only those buckets — candidate volume ~ n_probe/n_centroids
  of the corpus. The data-adaptive counterpart to sign-LSH: better
  bucket-boundary behavior on clustered embeddings, at the cost of a
  training pass.

Hyperplanes are deterministic pseudo-random vectors derived from xxhash64 of
(plane index, dimension index) — reproducible across runs with no driver-side
randomness, so results are stable under repartitioning. IVF determinism
comes from the fixed KMeans seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_feature_store_spark.plans.layout import spread


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x AS double))")


def _norm(col: str):
    return F.sqrt(F.expr(f"aggregate(zip_with({col}, {col}, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` is broadcast (the query set is small by construction); the
    corpus streams through one stage — no shuffle until the final per-query
    window over k*|queries| rows.
    """
    # spread a low-parallelism corpus scan before the dot-product stage so
    # the brute-force rerank uses every core (plans/layout.py — no-op at scale)
    c = spread(
        corpus.select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")), "cid"
    ).withColumn("cn", _norm("cv"))
    q = queries.select(F.col(query_id_col).alias("qid"), _as_double(vec_col).alias("qv")).withColumn(
        "qn", _norm("qv")
    )
    dot = F.expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", F.col("cid").alias("neighbor_id"), (dot / (F.col("qn") * F.col("cn"))).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _hyperplane_sign(vec_col: str, plane: int) -> F.Column:
    """Sign of <v, h_plane> where h_plane[d] is a deterministic pseudo-random
    value in [-1, 1) derived from xxhash64(plane, d)."""
    return (
        F.expr(
            f"""
            aggregate(
              zip_with({vec_col}, sequence(0, size({vec_col}) - 1),
                       (x, d) -> x * (cast(pmod(xxhash64({plane}, d), 2000001) AS double) / 1000000.0 - 1.0)),
              0D, (acc, x) -> acc + x)
            """
        )
        > 0
    ).cast("int")


def lsh_bucket(vec_col: str, bits: int = 8) -> F.Column:
    """Sign-LSH bucket id in [0, 2^bits) for an array<double> column."""
    b = F.lit(0)
    for p in range(bits):
        b = b * 2 + _hyperplane_sign(vec_col, p)
    return b


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    probes: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Approximate top-k: exact cosine rerank within the query's LSH bucket.

    Co-partitioned equi-join on bucket replaces the cross join — candidate
    volume drops by ~2^bits; recall is tunable two ways: ``bits`` (fewer
    bits = bigger buckets) and ``probes`` (multi-probe: each query also
    visits the ``probes`` neighboring buckets at Hamming distance 1 from its
    own, recovering neighbors that fell just across one hyperplane — the
    dominant near-miss mode for sign-LSH). Candidate volume scales by
    (1 + probes); only the (small) query side is replicated, never the
    corpus. Recall floors are pytest-pinned
    (tests/test_similarity_retrieval.py)."""
    c = (
        spread(corpus.select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")), "cid")
        .withColumn("cn", _norm("cv"))
        # corpus-side coalesce(-1) only (see ivf_topk): keeps the bucket key
        # non-null so the inferred isnotnull predicate cannot push the
        # whole hyperplane computation below the spread exchange; the query
        # side stays nullable, so a NULL query vector still matches nothing
        .withColumn("bucket", F.coalesce(lsh_bucket("cv", bits), F.lit(-1)))
    )
    q = (
        queries.select(F.col(query_id_col).alias("qid"), _as_double(vec_col).alias("qv"))
        .withColumn("qn", _norm("qv"))
        .withColumn("bucket", lsh_bucket("qv", bits))
    )
    if probes:
        n = min(probes, bits)
        flips = F.array(F.col("bucket"), *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n)
        ])
        q = q.withColumn("bucket", F.explode(flips))
    dot = F.expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", F.col("cid").alias("neighbor_id"), (dot / (F.col("qn") * F.col("cn"))).alias("cosine"))
    )
    if probes:
        scored = scored.dropDuplicates(["qid", "neighbor_id"])
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _quantizer_fit_input(feat: DataFrame, fit_sample_rows: int | None, seed: int) -> DataFrame:
    """Bound the quantizer's training set to ~``fit_sample_rows`` rows.

    64 centroids learned from a bounded sample are statistically identical to
    64 learned from the full corpus, and the full-corpus fit is a multi-pass
    MLlib job over 100 TB — so the fit input must be corpus-size-independent
    (the assignment pass still covers every vector). ``None`` disables
    sampling. The one extra ``count()`` is a metadata-cheap columnar count;
    Bernoulli sampling overshoots by a hair (5%) so small samples don't
    undershoot the centroid count.
    """
    if fit_sample_rows is None:
        return feat
    if fit_sample_rows <= 0:
        raise ValueError(f"fit_sample_rows must be positive, got {fit_sample_rows}")
    n = feat.count()
    if n <= fit_sample_rows:
        return feat
    return feat.sample(fraction=min(1.0, 1.05 * fit_sample_rows / n), seed=seed)


def _seq_selfdot(vec: list[float]) -> float:
    """Sequential left-to-right <v, v> — bitwise identical to Spark's
    aggregate fold (both are IEEE-754 double adds in the same order)."""
    acc = 0.0
    for x in vec:
        acc += x * x
    return acc


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    seed: int = 7,
    fit_sample_rows: int | None = 20_000,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    1. Fit KMeans(n_centroids, seed) on a seeded sample of at most
       ~``fit_sample_rows`` corpus vectors (MLlib — one bounded training job
       whose input size is independent of corpus size; the assignment below
       still covers every vector as a broadcast-centroid column pass) — OR,
       when ``centroids`` is supplied, skip training entirely and use the
       pretrained quantizer (the production deployment shape: train once,
       version the centroids, reuse across assignment jobs; also what makes
       the operator SQL-oracle-replayable, since the quantizer becomes a
       literal instead of a runtime artifact).
    2. Assign every corpus vector to its nearest centroid — the inverted
       file. At scale this is materialized once (bucketed table). In
       pretrained mode assignment is a PURE COLUMN EXPRESSION (no MLlib, no
       join): distances to all centroids via the expansion
       ``d2 = <v,v> - 2<v,c> + cc`` with ``cc`` precomputed literals, then
       ``array_position(dists, array_min(dists))`` — first-minimum
       tie-break, identical to a (d2 asc, centroid asc) rank.
    3. Each query probes its ``n_probe`` nearest centroids (tiny
       query x centroid cross join, broadcast) and exact-reranks only those
       buckets: candidates ~ corpus * n_probe / n_centroids.

    Scores are exact cosines — only the candidate set is approximate, same
    contract as :func:`lsh_topk`. Recall floors pytest-pinned.
    """
    c = spread(
        corpus.select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")), "cid"
    ).withColumn("cn", _norm("cv"))
    if centroids is not None:
        n_centroids = len(centroids)
        selfdots = [_seq_selfdot([float(x) for x in v]) for v in centroids]
        cents = [
            (i, [float(x) for x in v], selfdots[i]) for i, v in enumerate(centroids)
        ]
        # ONE sql-text expression instead of ~n_centroids x dim F.lit()
        # py4j round-trips (measured: the literal-by-literal construction
        # alone cost seconds of driver time per query build at 16x64);
        # repr() doubles round-trip exactly through the SQL parser
        cents_sql = ", ".join(
            f"named_struct('i', {i}, 'c', array({', '.join(f'{x!r}d' for x in v)}), "
            f"'cc', {cc!r}d)"
            for i, v, cc in cents
        )
        cents_arr = F.expr(f"array({cents_sql})")
        dot_vc = "aggregate(zip_with(cv, s.c, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"
        dists = F.expr(f"transform(__cents, s -> __vv - 2 * {dot_vc} + s.cc)")
        inverted = (
            c.withColumn("__vv", F.expr("aggregate(zip_with(cv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
            .withColumn("__cents", cents_arr)
            .withColumn("__ds", dists)
            .withColumn(
                # coalesce(-1) never fires on a real vector; it makes the
                # join key provably NON-NULL so Catalyst does not infer an
                # isnotnull(centroid) predicate and push it below the spread
                # exchange — which would re-evaluate the whole centroid
                # assignment on the (narrow) scan side (measured: 2-task
                # 3.7s map-side stage at sf1.0). A NULL vector previously
                # dropped out via the null join key; it now carries -1,
                # which matches no probe (probe centroids are 0..k-1).
                "centroid",
                F.coalesce(
                    (F.array_position(F.col("__ds"), F.array_min("__ds")) - 1).cast("int"),
                    F.lit(-1),
                ),
            )
            .select("cid", "cv", "cn", "centroid")
        )
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = c.select("cid", "cv", array_to_vector(F.col("cv")).alias("features"))
        model = KMeans(
            k=n_centroids, seed=seed, featuresCol="features", predictionCol="centroid"
        ).fit(_quantizer_fit_input(feat, fit_sample_rows, seed))
        inverted = model.transform(feat).select("cid", "cv", "centroid").join(
            c.select("cid", "cn"), "cid"
        )
        cents = [
            (i, [float(x) for x in v], _seq_selfdot([float(x) for x in v]))
            for i, v in enumerate(model.clusterCenters())
        ]

    cent_df = corpus.sparkSession.createDataFrame(
        cents, "centroid int, cvec array<double>, cc double"
    )

    q = queries.select(F.col(query_id_col).alias("qid"), _as_double(vec_col).alias("qv")).withColumn(
        "qn", _norm("qv")
    )
    # same d2 expansion as assignment (oracle-mirrorable; <q,q> hoisted once)
    l2 = F.expr(
        "__qvv - 2 * aggregate(zip_with(qv, cvec, (a, b) -> a * b), 0D, (acc, x) -> acc + x) + cc"
    )
    probe_w = Window.partitionBy("qid").orderBy(F.col("__d").asc(), F.col("centroid").asc())
    probes = (
        q.withColumn("__qvv", F.expr("aggregate(zip_with(qv, qv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("__d", l2)
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= n_probe)
        .select("qid", "qv", "qn", "centroid")
    )

    dot = F.expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
    scored = (
        inverted.join(F.broadcast(probes), "centroid")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", F.col("cid").alias("neighbor_id"), (dot / (F.col("qn") * F.col("cn"))).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
