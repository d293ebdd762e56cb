"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — broadcast the (small) query
  set against the corpus, dot products via higher-order functions
  (JVM-side), per-query top-k as a rank-limit. The baseline and the
  verifier for approximate paths.
- lsh_topk: random-hyperplane LSH — bucket corpus and queries by sign
  bits (deterministic seeded planes), search only matching buckets
  (optionally multi-probe neighboring buckets), exact re-rank inside.
  At 100 TB the bucket join replaces the full cross product; recall is
  tunable by planes/probes.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unit(vec_col: str):
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + (x * x).cast("double")))
    return F.transform(vec_col, lambda x: x.cast("double") / norm)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast —
    the corpus is never shuffled; per-corpus-partition partial top-k
    then global top-k per query (rank-limit)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    ).withColumn("_qu", _unit("_qv")).drop("_qv")
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")).withColumn(
        "_cu", _unit("_cv")
    ).drop("_cv")
    scored = c.join(F.broadcast(q)).withColumn("cosine", _dot("_cu", "_qu"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("_rn").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def bucket_ids(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket id from dot products with fixed hyperplanes —
    pure Column expression, the planes are literals in the plan."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(vec_col, plane)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    dim: int | None = None,
    multi_probe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket (plus `multi_probe`
    single-bit-flip neighbor buckets for the query side), exact cosine
    re-rank within candidates. Shuffle is (bucket, id, vec) instead of
    a cross product."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(id_col, F.col(vec_col).alias("_cv")).withColumn(
        "bucket", bucket_ids("_cv", planes)
    ).withColumn("_cu", _unit("_cv")).drop("_cv")
    base_bucket = bucket_ids("_qv", planes)
    probes = [base_bucket]
    if multi_probe > 0:
        probes += [
            base_bucket.bitwiseXOR(F.lit(1 << i)) for i in range(min(multi_probe, n_planes))
        ]
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("_qv"))
        .withColumn("bucket", F.explode(F.array(*probes)))
        .withColumn("_qu", _unit("_qv"))
        .drop("_qv")
    )
    scored = c.join(q, "bucket").withColumn("cosine", _dot("_cu", "_qu"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("_rn").alias("rank"))
        .distinct()
    )


def _assign_expr(unit_col: str, centroids: list[list[float]]):
    """0-based nearest-centroid id by cosine, as a pure Column
    expression (centroid literals inlined into the plan)."""
    sims = []
    for cvec in centroids:
        lit = F.array(*[F.lit(float(x)) for x in cvec])
        sims.append(_dot(unit_col, lit))
    arr = F.array(*sims)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> list[list[float]]:
    """Spherical k-means on unit vectors, Spark-native Lloyd steps:
    assignment is a broadcast argmax expression over the corpus (no
    shuffle of vectors); the update is a posexplode → (cluster, dim)
    partial-sum aggregate — only K×dim partial states move. Determinis-
    tic: init picks the n_centroids corpus rows with smallest
    xxhash64(id, seed)."""
    import numpy as np

    unit = corpus.select(id_col, F.col(vec_col).alias("_v")).withColumn(
        "_u", _unit("_v")
    )
    # each Lloyd step + init re-reads the normalized corpus: materialize
    # it once (spill-backed) for the duration of training
    unit = unit.persist()
    init = (
        unit.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_centroids)
        .select("_u")
        .collect()
    )
    centroids = [list(r["_u"]) for r in init]
    for _ in range(iters):
        assigned = unit.withColumn("_c", _assign_expr("_u", centroids))
        sums = (
            assigned.select("_c", F.posexplode("_u").alias("_d", "_x"))
            .groupBy("_c", "_d")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        dim = len(centroids[0])
        acc = {}
        for r in sums:
            acc.setdefault(r["_c"], np.zeros(dim))[r["_d"]] = r["_s"] / r["_n"]
        new = []
        for ci in range(len(centroids)):
            if ci in acc:
                v = acc[ci]
                norm = float(np.linalg.norm(v)) or 1.0
                new.append((v / norm).tolist())
            else:  # empty cluster: keep previous centroid
                new.append(centroids[ci])
        centroids = new
    unit.unpersist()
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into coarse cells
    (spherical k-means), each query probes its n_probe nearest cells,
    exact cosine re-rank inside. The join shuffles (cell, id, vec) —
    a 1/(n_centroids/n_probe) fraction of the corpus per query batch
    instead of a cross product."""
    import numpy as np

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, iters, vec_col, id_col, seed
        )
    c = (
        corpus.select(id_col, F.col(vec_col).alias("_cv"))
        .withColumn("_cu", _unit("_cv"))
        .withColumn("cell", _assign_expr("_cu", centroids))
        .drop("_cv")
    )
    cents = np.array(centroids)
    q = queries.select(query_id_col, F.col(vec_col).alias("_qv")).withColumn(
        "_qu", _unit("_qv")
    )
    qrows = q.collect()
    probe_rows = []
    for r in qrows:
        u = np.array(r["_qu"])
        sims = cents @ u
        for cell in np.argsort(-sims)[:n_probe]:
            probe_rows.append((r[query_id_col], int(cell), list(r["_qu"])))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(
        probe_rows, f"{query_id_col} long, cell int, _qu array<double>"
    )
    scored = c.join(F.broadcast(probes), "cell").withColumn(
        "cosine", _dot("_cu", "_qu")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("_rn").alias("rank"))
    )
