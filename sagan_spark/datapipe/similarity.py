"""Approximate-nearest-neighbor search over an embedding column
(``embeddings.embedding: array<float>``, 64-dim).

  * **Brute-force cosine top-k** — the correctness baseline: broadcast
    the query set, one pass over the corpus, per-query top-k via
    window.  The dot product is an explicit 64-term sum generated
    identically for Spark and DuckDB (same association order ⇒
    bit-identical doubles; library kernels like list_cosine_similarity
    are avoided precisely because their summation order is unspecified).
  * **LSH-bucketed ANN** — the scale path: 8 deterministic integer
    hyperplanes → 8-bit sign bucket per vector (a single projection,
    no shuffle), candidates = same-bucket rows (equi-join), exact
    cosine re-rank inside the bucket.  At 10^12 rows the bucket join
    replaces the O(n·q) scan, trading recall for a ~2^8 fan-in cut;
    recall is measured against the brute-force baseline in tests.

Rank ties are broken by vec_id so results are deterministic in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DIM = 64
# 4 planes = 16 buckets: sized for the ~500-vector test dim table (the
# driver's embeddings are near-random, the hardest case for sign-LSH —
# measured recall@5 vs brute force: 0.08 single-bucket, 0.42 at ≤1-bit
# probes, 0.94 at ≤2-bit probes on sf0.001).  At production scale the
# plane count grows with corpus size (buckets ∝ rows / target-bucket-
# size); the plan shape (bucket equi-join, no all-pairs) is unchanged.
N_PLANES = 4
PROBE_BITS = 2  # multi-probe: flip up to this many sign bits
TOPK = 5
N_QUERIES = 10


def plane_weight(p: int, d: int) -> int:
    """Deterministic pseudo-random integer hyperplane weights in
    [-7, 7]."""
    return ((1 + 131 * p + 37 * d) % 15) - 7


def _dot_spark(a: str, b: str):
    # one F.expr parse instead of ~380 py4j column-op round-trips — the
    # SQL parser builds the identical left-associated sum (bit-equal
    # doubles), and plan CONSTRUCTION drops from seconds to ~ms
    return F.expr(
        "("
        + " + ".join(
            f"CAST(element_at({a}, {d}) AS DOUBLE) * CAST(element_at({b}, {d}) AS DOUBLE)"
            for d in range(1, DIM + 1)
        )
        + ")"
    )


def _norm_spark(a: str):
    return F.sqrt(
        F.expr(
            "("
            + " + ".join(
                f"CAST(element_at({a}, {d}) AS DOUBLE) * CAST(element_at({a}, {d}) AS DOUBLE)"
                for d in range(1, DIM + 1)
            )
            + ")"
        )
    )


def dot_sql(a: str, b: str) -> str:
    return "(" + " + ".join(
        f"CAST(list_extract({a}, {d}) AS DOUBLE) * CAST(list_extract({b}, {d}) AS DOUBLE)"
        for d in range(1, DIM + 1)
    ) + ")"


def norm_sql(a: str) -> str:
    return (
        "sqrt(" + " + ".join(
            f"CAST(list_extract({a}, {d}) AS DOUBLE) * CAST(list_extract({a}, {d}) AS DOUBLE)"
            for d in range(1, DIM + 1)
        ) + ")"
    )


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def brute_force_topk(emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES) -> DataFrame:
    """(query_id, neighbor_id, rank, cos) — self-neighbors excluded."""
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    # broadcast the tiny query set, stream the (10^12-row) corpus side
    j = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(
        _dot_spark("qe", "ce") / (_norm_spark("qe") * _norm_spark("ce")), 6
    )
    j = j.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


def brute_force_sql(k: int = TOPK, n_queries: int = N_QUERIES) -> str:
    cos = f"round({dot_sql('q.embedding', 'c.embedding')} / ({norm_sql('q.embedding')} * {norm_sql('c.embedding')}), 6)"
    return f"""
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos,
    row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {n_queries}
)
WHERE rank <= {k}
""".strip()


def _bucket_spark(col: str):
    b = F.lit(0)
    for p in range(N_PLANES):
        s = None
        for d in range(1, DIM + 1):
            term = F.element_at(col, d).cast("double") * plane_weight(p, d)
            s = term if s is None else s + term
        b = b + F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return b


def bucket_sql(col: str) -> str:
    parts = []
    for p in range(N_PLANES):
        dot = " + ".join(
            f"CAST(list_extract({col}, {d}) AS DOUBLE) * ({plane_weight(p, d)})"
            for d in range(1, DIM + 1)
        )
        parts.append(f"CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(parts) + ")"


def lsh_topk(emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign bucket."""
    withb = emb.withColumn("bucket", _bucket_spark("embedding"))
    q = withb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "bucket"
    )
    c = withb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), "bucket"
    )
    j = F.broadcast(q).join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(
        _dot_spark("qe", "ce") / (_norm_spark("qe") * _norm_spark("ce")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        j.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


def lsh_multiprobe_topk(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES
) -> DataFrame:
    """Multi-probe bucketed ANN: each query also probes every bucket
    within hamming distance PROBE_BITS of its own (sign-bit flips) —
    the classic recall lift for sign-LSH without touching the corpus
    side.  Corpus rows keep ONE bucket; only the tiny broadcast query
    side explodes ×(probe count), so the scale shape (bucket equi-join,
    no all-pairs) is unchanged.  Probes are distinct buckets ⇒ no
    duplicate candidates ⇒ no dedup pass needed.  Recall@k vs brute
    force is asserted in tests/test_ann_recall.py (≥0.6 floor; measured
    0.94 at sf0.001 / 0.84 at sf0.01 with the default params)."""
    import itertools

    withb = emb.withColumn("bucket", _bucket_spark("embedding"))
    probe_cols = [F.col("bucket")]
    if PROBE_BITS >= 1:
        probe_cols += [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)
        ]
    if PROBE_BITS >= 2:
        probe_cols += [
            F.col("bucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i, j in itertools.combinations(range(N_PLANES), 2)
        ]
    probes = F.array(*probe_cols)
    q = (
        withb.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode(probes).alias("bucket"),
        )
    )
    c = withb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), "bucket"
    )
    j = F.broadcast(q).join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(
        _dot_spark("qe", "ce") / (_norm_spark("qe") * _norm_spark("ce")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        j.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


def lsh_multiprobe_sql(k: int = TOPK, n_queries: int = N_QUERIES) -> str:
    """Oracle twin: hamming(q.bucket, c.bucket) ≤ PROBE_BITS — the
    declarative equivalent of the engine's probe-explosion
    (independently verifies the probe set is exactly the ≤PROBE_BITS
    neighborhood)."""
    cos = f"round({dot_sql('q.embedding', 'c.embedding')} / ({norm_sql('q.embedding')} * {norm_sql('c.embedding')}), 6)"
    return f"""
WITH withb AS (
  SELECT vec_id, embedding, {bucket_sql('embedding')} AS bucket FROM embeddings
)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos,
    row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id) AS rank
  FROM withb q JOIN withb c
    ON bit_count(xor(q.bucket::BIGINT, c.bucket::BIGINT)) <= {PROBE_BITS} AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {n_queries}
)
WHERE rank <= {k}
""".strip()


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Embedding-cosine near-dup pairs (the dedup-brief variant): the
    candidate set is the ≤PROBE_BITS sign-bucket neighborhood (bucketed
    join — never all-pairs), verified by exact cosine ≥ threshold.

    The driver's test embeddings are near-random (max pairwise cos
    ≈ 0.5), so the test threshold is 0.3 to exercise the operator; real
    near-dup corpora use ~0.95+, where sign-bucket recall approaches 1
    (near-identical vectors share hyperplane signs).  Output (a, b,
    cos), a < b."""
    import itertools

    withb = emb.withColumn("bucket", _bucket_spark("embedding"))
    probe_cols = [F.col("bucket")]
    if PROBE_BITS >= 1:
        probe_cols += [F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)]
    if PROBE_BITS >= 2:
        probe_cols += [
            F.col("bucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i, j in itertools.combinations(range(N_PLANES), 2)
        ]
    l = withb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("ea"),
        F.explode(F.array(*probe_cols)).alias("bucket"),
    )
    r = withb.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), "bucket"
    )
    cos = F.round(_dot_spark("ea", "eb") / (_norm_spark("ea") * _norm_spark("eb")), 6)
    return (
        l.join(r, "bucket")
        .where(F.col("a") < F.col("b"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def embedding_neardup_sql(threshold: float = 0.3) -> str:
    """Oracle twin: the same ≤PROBE_BITS-neighborhood candidate set via
    a declarative hamming join, exact cosine filter."""
    cos = f"round({dot_sql('l.embedding', 'r.embedding')} / ({norm_sql('l.embedding')} * {norm_sql('r.embedding')}), 6)"
    return f"""
WITH withb AS (
  SELECT vec_id, embedding, {bucket_sql('embedding')} AS bucket FROM embeddings
)
SELECT a, b, cos FROM (
  SELECT l.vec_id AS a, r.vec_id AS b, {cos} AS cos
  FROM withb l JOIN withb r
    ON l.vec_id < r.vec_id
   AND bit_count(xor(l.bucket::BIGINT, r.bucket::BIGINT)) <= {PROBE_BITS}
)
WHERE cos >= {threshold}
""".strip()


# --- IVF ANN (the inverted-file scale path) --------------------------------
# Centroids: DETERMINISTIC k-means (r4; closes VERDICT r3 item 6 — the
# stride sample previously stood in for training):
#   * init = every CENTROID_STRIDE-th corpus vector (fixed "seed");
#   * KMEANS_ITERS Lloyd rounds over the TRAIN_STRIDE training sample —
#     production trains offline on a bounded sample exactly like this,
#     then serves the trained centroids as a broadcast literal (which is
#     what ivf_cells/ivf_topk do after training);
#   * the per-dim mean is computed in integer MICRO-UNITS
#     (round(v·1e6) summed as BIGINT): integer sums are order-
#     independent, so Spark and the DuckDB oracle produce BIT-IDENTICAL
#     trained centroids regardless of partial-aggregation order — a
#     float avg() would drift in the last ulp between engines;
#   * an emptied cell keeps its previous centroid; cell labels stay the
#     init cids throughout (k never silently shrinks).
# ~16 centroids on the 500-vector test dim; production sizes
# k ≈ sqrt(corpus).
CENTROID_STRIDE = 32
NPROBE = 6
KMEANS_ITERS = 2
TRAIN_STRIDE = 4
_QUANT = 1_000_000.0


def _centroids(emb: DataFrame) -> DataFrame:
    """Init centroid set (cid = vec_id of the seed vector; cemb cast to
    double so trained and untrained centroid frames share one type)."""
    return emb.where(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cemb"),
    )


def trained_centroids(emb: DataFrame, iters: int = KMEANS_ITERS) -> DataFrame:
    """Lazy k-means plan: `iters` Lloyd rounds over the training sample
    (assignment = argmax rounded cosine, tie → min cid — the identical
    rule the serving path uses; update = micro-unit integer mean)."""
    cents = _centroids(emb)
    if iters <= 0:
        return cents
    train = emb.where(F.col("vec_id") % TRAIN_STRIDE == 0).select(
        "vec_id", "embedding"
    )
    for _ in range(iters):
        assigned = _assign_cells(train, cents)
        comp = assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
        means = comp.groupBy("cell", "pos").agg(
            (
                F.sum(F.round(F.col("v").cast("double") * F.lit(_QUANT)).cast("long"))
                / (F.count(F.lit(1)) * F.lit(_QUANT))
            ).alias("m")
        )
        newc = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cell").alias("cid"),
                F.expr("transform(pm, s -> s.m)").alias("cemb"),
            )
        )
        cents = (
            cents.alias("o")
            .join(newc.alias("n"), "cid", "left")
            .select("cid", F.coalesce("n.cemb", "o.cemb").alias("cemb"))
        )
    return cents


# trained-centroid memo: (analyzed-plan semantic hash, iters, strides) →
# collected centroid rows.  Production IVF trains OFFLINE once and
# serves the frozen centroids to every query; retraining per ivf_topk
# call (the pre-cache behavior) re-ran the Lloyd jobs on each of a
# session's repeated queries for identical input.  Keyed on the
# ANALYZED plan's semantic hash so a different source path / filter
# retrains; values are 16 tiny rows, never evicted.
#
# ASSUMPTION (ADVICE r4): a path's CONTENTS are immutable for the
# process lifetime — two reads of the same path hash identically even
# after an overwrite, so a process that regenerates data in place would
# be served stale centroids.  That matches the engine's data-lake
# contract (immutable snapshot dirs; new data ⇒ new path), and every
# test writes fixtures to fresh tmp_path dirs.  Code that DOES rewrite
# a path in place must call clear_centroid_cache() after the rewrite.
_CENTROID_CACHE: dict[tuple, list] = {}


def clear_centroid_cache() -> None:
    """Drop every memoized centroid set — the invalidation hook for the
    rewrote-the-same-path case the semantic-hash key cannot see."""
    _CENTROID_CACHE.clear()


def _materialized_centroids(
    emb: DataFrame, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Run training (a handful of tiny jobs over the bounded sample) and
    re-emit the k centroids as a literal local dimension.  This is the
    offline-train / online-serve split: the serving plan below sees a
    16-row local relation, so the corpus-side assignment stays a pure
    projection with NO trace of the training subtree (plan-pinned by
    tests/test_plan_health.py)."""
    key = None
    try:
        key = (
            emb._jdf.queryExecution().analyzed().semanticHash(),
            iters,
            TRAIN_STRIDE,
            CENTROID_STRIDE,
        )
    except Exception:
        pass  # py4j surface changed — train fresh, correctness unaffected
    if key is None or key not in _CENTROID_CACHE:
        rows = sorted(
            trained_centroids(emb, iters).collect(), key=lambda r: r["cid"]
        )
        pairs = [(r["cid"], r["cemb"]) for r in rows]
        if key is None:
            return emb.sparkSession.createDataFrame(
                pairs, schema="cid long, cemb array<double>"
            )
        _CENTROID_CACHE[key] = pairs
    return emb.sparkSession.createDataFrame(
        _CENTROID_CACHE[key], schema="cid long, cemb array<double>"
    )


def _hof_cos(vec_col, cent_emb, row_norm):
    """Rounded cosine between the row vector and one centroid struct's
    embedding, as zip_with→aggregate left-folds (left-assoc sum seeded
    0.0 ⇒ bit-identical to the oracle's explicit 64-term sum)."""
    dot = F.aggregate(
        F.zip_with(
            vec_col, cent_emb, lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cnorm = F.sqrt(
        F.aggregate(
            F.transform(cent_emb, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return F.round(dot / (row_norm * cnorm), 6)


def ivf_cells(emb: DataFrame, cents: DataFrame | None = None) -> DataFrame:
    """Corpus rows + their IVF cell id (trained centroids by default)."""
    if cents is None:
        cents = _materialized_centroids(emb)
    return _assign_cells(emb, cents)


def _assign_cells(df: DataFrame, cents: DataFrame) -> DataFrame:
    """Rows + nearest-centroid cell id — a pure projection on the data
    side: the centroid set rides in as a one-row broadcast array and the
    argmax-over-centroids runs inside a single aggregate() expression,
    so the 10^12-row side never shuffles for assignment (contrast a
    join+groupBy argmax, which shuffles the full corpus)."""
    cent_arr = cents.select(F.struct("cid", "cemb").alias("c")).agg(
        F.array_sort(F.collect_list("c")).alias("cents")
    )
    withc = df.crossJoin(F.broadcast(cent_arr))
    row_norm = _norm_spark("embedding")
    # argmax(cos, tie→min cid) as transform + native array_max over
    # struct<cos, -cid> (lexicographic) — the lambda runs ONCE per
    # centroid; an aggregate()-fold variant evaluated the cosine twice
    # per step (compare + carry) and doubled the interpreted-HOF cost
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            _hof_cos(F.col("embedding"), c["cemb"], row_norm).alias("cos"),
            (-c["cid"]).alias("ncid"),
        ),
    )
    best = F.array_max(scored)
    return withc.select(
        "vec_id", "embedding", (-best["ncid"]).cast("long").alias("cell")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = TOPK,
    n_queries: int = N_QUERIES,
    nprobe: int = NPROBE,
    train_iters: int = KMEANS_ITERS,
) -> DataFrame:
    """IVF ANN: each query probes its `nprobe` nearest cells; candidates
    are the corpus rows assigned to those cells (bucket equi-join with
    the tiny probed-query side broadcast — never all-pairs); exact
    cosine re-rank inside the probed cells.  Every corpus row has
    exactly ONE cell and probes are distinct cells ⇒ no duplicate
    candidates ⇒ no dedup pass.  Worst-case recall (near-random
    vectors) ≈ probed-cell mass; real clustered corpora concentrate
    neighbors in the top probes — recall floor asserted in
    tests/test_ann_recall.py."""
    cents = _materialized_centroids(emb, train_iters)
    cells = _assign_cells(emb, cents)
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = F.broadcast(q).crossJoin(F.broadcast(cents))
    qcos = F.round(
        _dot_spark("qe", "cemb") / (_norm_spark("qe") * _norm_spark("cemb")), 6
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("cid"))
    probes = (
        qc.withColumn("qcos", qcos)
        .withColumn("prn", F.row_number().over(wprobe))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "qe", F.col("cid").alias("cell"))
    )
    j = F.broadcast(probes).join(cells, "cell").where(
        F.col("query_id") != F.col("vec_id")
    )
    cos = F.round(
        _dot_spark("qe", "embedding") / (_norm_spark("qe") * _norm_spark("embedding")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        j.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            "cos",
        )
    )


def _kmeans_ctes(iters: int) -> tuple[str, str]:
    """(CTE chain, final-centroid relation name) — the oracle twin of
    :func:`trained_centroids`.  Assignment is a window argmax (an
    independent route vs the engine's fold-over-broadcast-array); the
    update is the same micro-unit integer mean, so the trained
    centroids are bit-identical across engines.

    Every CTE is ``AS MATERIALIZED``: DuckDB inlines (re-evaluates)
    non-materialized CTEs per reference, and this chain references each
    round's relation several times — measured 946 MB peak RSS / 14.4 s
    inlined vs 488 MB / 7.0 s materialized on a 500×64 embeddings table
    (VERDICT r4 item 2; the inlined form OOM'd the shared-connection
    harness)."""
    q = int(_QUANT)
    parts = [
        f"c0 AS MATERIALIZED (\n  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb "
        f"FROM embeddings WHERE vec_id % {CENTROID_STRIDE} = 0\n)"
    ]
    if iters > 0:
        parts.append(
            f"train AS MATERIALIZED (\n  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS temb "
            f"FROM embeddings WHERE vec_id % {TRAIN_STRIDE} = 0\n)"
        )
    rel = "c0"
    for i in range(1, iters + 1):
        tcos = f"round({dot_sql('t.temb', 'c.cemb')} / ({norm_sql('t.temb')} * {norm_sql('c.cemb')}), 6)"
        parts.append(
            f"a{i} AS MATERIALIZED (\n  SELECT cid, temb FROM (\n"
            f"    SELECT t.temb, c.cid,\n"
            f"      row_number() OVER (PARTITION BY t.vec_id ORDER BY {tcos} DESC, c.cid) AS rn\n"
            f"    FROM train t CROSS JOIN {rel} c)\n  WHERE rn = 1\n)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (\n"
            f"  SELECT cid, pos, CAST(sum(qv) AS DOUBLE) / (count(*) * {q}.0) AS m\n"
            f"  FROM (SELECT cid, generate_subscripts(temb, 1) AS pos,\n"
            f"               CAST(round(unnest(temb) * {q}.0) AS BIGINT) AS qv\n"
            f"        FROM a{i})\n  GROUP BY cid, pos\n)"
        )
        parts.append(
            f"n{i} AS MATERIALIZED (\n  SELECT cid, list(m ORDER BY pos) AS cemb FROM m{i} GROUP BY cid\n)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (\n  SELECT o.cid, coalesce(n.cemb, o.cemb) AS cemb\n"
            f"  FROM {rel} o LEFT JOIN n{i} n ON o.cid = n.cid\n)"
        )
        rel = f"c{i}"
    return ",\n".join(parts), rel


def ivf_topk_sql(
    k: int = TOPK,
    n_queries: int = N_QUERIES,
    nprobe: int = NPROBE,
    train_iters: int = KMEANS_ITERS,
) -> str:
    """Oracle twin via an independent route: k-means via window-argmax
    CTEs (:func:`_kmeans_ctes`), cell assignment as a window argmax over
    the corpus×centroid join (vs the engine's fold-over-broadcast-
    array), probing and re-rank as windows."""
    kctes, rel = _kmeans_ctes(train_iters)
    ccos = f"round({dot_sql('e.embedding', 'c.cemb')} / ({norm_sql('e.embedding')} * {norm_sql('c.cemb')}), 6)"
    cos = f"round({dot_sql('p.qe', 's.embedding')} / ({norm_sql('p.qe')} * {norm_sql('s.embedding')}), 6)"
    return f"""
WITH {kctes},
cents AS MATERIALIZED (
  SELECT cid, cemb FROM {rel}
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
    row_number() OVER (PARTITION BY e.vec_id ORDER BY {ccos} DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cents c
),
cells AS MATERIALIZED (
  SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1
),
qassign AS (
  SELECT e.vec_id AS query_id, e.embedding AS qe, c.cid,
    row_number() OVER (PARTITION BY e.vec_id ORDER BY {ccos} DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cents c
  WHERE e.vec_id < {n_queries}
),
probes AS (
  SELECT query_id, qe, cid AS cell FROM qassign WHERE rn <= {nprobe}
)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT p.query_id, s.vec_id AS neighbor_id, {cos} AS cos,
    row_number() OVER (PARTITION BY p.query_id ORDER BY {cos} DESC, s.vec_id) AS rank
  FROM probes p JOIN cells s ON p.cell = s.cell AND p.query_id <> s.vec_id
)
WHERE rank <= {k}
""".strip()


def lsh_topk_sql(k: int = TOPK, n_queries: int = N_QUERIES) -> str:
    cos = f"round({dot_sql('q.embedding', 'c.embedding')} / ({norm_sql('q.embedding')} * {norm_sql('c.embedding')}), 6)"
    return f"""
WITH withb AS (
  SELECT vec_id, embedding, {bucket_sql('embedding')} AS bucket FROM embeddings
)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos,
    row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id) AS rank
  FROM withb q JOIN withb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {n_queries}
)
WHERE rank <= {k}
""".strip()
