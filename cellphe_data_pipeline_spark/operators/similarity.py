"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB path (bucket on sign-random-projection bits →
self-join only within buckets). Dot products run JVM-side via
``zip_with`` + ``aggregate`` fold — no Python, no UDF.

Scale notes:
- Brute force is O(N·Q): fine when one side is broadcast-sized (the
  usual "k-NN of these 10k queries against the corpus" shape). The
  query side is broadcast; the corpus side streams — no shuffle at all.
- Norms are precomputed per row BEFORE the join (O(N+Q) instead of
  O(N·Q) norm work).
- Top-k per query via window row_number over (cos desc) — at large Q
  this is a single shuffle on query id; ties broken by neighbor id for
  determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda v: v.cast("double"))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    emb = _as_double(F.col(vec_col))
    dot = F.aggregate(
        F.zip_with(emb, emb, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    return df.withColumn("_emb", emb).withColumn("_norm", F.sqrt(dot))


def cosine_topk_bruteforce(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine neighbors per query vector (excluding self).

    `queries` defaults to `df` (all-pairs self-kNN). Output:
    (vec_id, neighbor_id, cos_sim rounded to 5, rank) — rounding before
    ranking makes the ordering reproducible across engines.
    """
    if queries is None:
        queries = df
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("_emb").alias("q_emb"), F.col("_norm").alias("q_norm")
    )
    c = with_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_emb").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_emb"), F.col("c_emb"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        F.broadcast(q)
        .join(c, F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(dot / (F.col("q_norm") * F.col("c_norm")), 5))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


def srp_bucketed_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Sign-random-projection LSH buckets: hash each vector to an n-bit
    code from fixed pseudo-random hyperplanes (deterministic from seed);
    vectors sharing a code are ANN candidates. This is the scale path:
    the all-pairs join becomes a per-bucket join.

    Hyperplane m, dim d weight = ±1 from parity of a hash of (seed,m,d) —
    computed as a literal array on the driver (tiny), applied JVM-side.
    """
    import hashlib

    sample = df.select(F.size(_as_double(F.col(vec_col))).alias("d")).first()
    dim = sample["d"]
    planes = []
    for m in range(n_bits):
        w = [
            1.0
            if int(hashlib.md5(f"{seed}-{m}-{j}".encode()).hexdigest()[:4], 16) % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        planes.append(w)
    emb = _as_double(F.col(vec_col))
    bits = []
    for m, w in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(emb, F.array(*[F.lit(x) for x in w]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << m)).otherwise(F.lit(0)))
    code = sum(bits[1:], start=bits[0])
    return df.select(F.col(id_col).alias("vec_id"), code.alias("bucket"))
