"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k of query vectors against a
  corpus.  The corpus side is broadcast when small; otherwise the
  query side is broadcast (top-k per query commutes).  Dot products
  stay JVM-side via zip_with + aggregate — no Python in the hot path.
- ``lsh_bucket_candidates``: random-hyperplane LSH (sign bits of dot
  products with deterministic md5-seeded hyperplanes) — the scale path:
  candidates meet only inside a bucket, turning O(n·m) into a bucketed
  equi-join.
- ``embedding_near_dup_pairs``: near-duplicate pairs by cosine ≥
  threshold via the LSH buckets + exact verify.

All arithmetic is double-precision, left-to-right array order, so the
DuckDB oracle (list_dot_product et al. or explicit unnest-sum) can
reproduce values exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from ..functions.scalars import hex_prefix_to_long


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _np_mat(s) -> "object":
    """pandas Series of fixed-dim vectors -> (n, dim) float64 matrix."""
    import numpy as np

    return np.array([np.asarray(v, dtype=np.float64) for v in s], dtype=np.float64)


def _dot_seq_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    import numpy as np

    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    A, B = _np_mat(a), _np_mat(b)
    acc = A[:, 0] * B[:, 0]
    for d in range(1, A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return pd.Series(acc)


def _norm_seq_fn(a: pd.Series) -> pd.Series:
    import numpy as np

    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    A = _np_mat(a)
    acc = A[:, 0] * A[:, 0]
    for d in range(1, A.shape[1]):
        acc = acc + A[:, d] * A[:, d]
    return pd.Series(np.sqrt(acc))


def dot_seq(a: Column, b: Column) -> Column:
    """Arrow-vectorized dot product, BIT-IDENTICAL to the _dot fold.

    Accumulates over the DIMENSION axis in index order —
    ``acc += A[:,d] * B[:,d]`` — so every pair sees the exact IEEE
    operation sequence of the scalar left-to-right fold (and of the
    DuckDB oracle's LIST_REDUCE).  Vectorization happens ACROSS pairs:
    dim elementwise fused ops per Arrow batch instead of 2·dim
    interpreted Catalyst closure calls per pair — measured on the
    pair-scoring hot path.  numpy elementwise ops don't reassociate,
    so parity is exact, not approximate
    (tests/test_operators.py::test_dot_seq_bit_parity).

    Wrapped at call time (not a module-level @pandas_udf) so importing
    this module never needs an active SparkSession.  Marked
    nondeterministic (it isn't, semantically) so Catalyst will not
    substitute the expression through projections: a downstream
    filter on the score would otherwise clone the ArrowEvalPython
    node and score every pair TWICE (observed in the
    embedding_near_dup physical plan).
    """
    return pandas_udf(_dot_seq_fn, "double").asNondeterministic()(a, b)


def norm_seq(a: Column) -> Column:
    """Arrow-vectorized L2 norm, bit-identical to the _norm fold."""
    return pandas_udf(_norm_seq_fn, "double")(a)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    broadcast_queries: bool = True,
    round_decimals: int | None = None,
) -> DataFrame:
    """Top-k corpus neighbors per query by cosine (exact, brute force).

    Returns (query_id, neighbor_id, cosine_sim, rank).  Plan: broadcast
    the small side, cross-join, per-pair dot product, then row_number
    window partitioned by query — the window shuffle is on query_id
    (uniform).  Self-pairs (same id) are excluded.  round_decimals
    rounds the score BEFORE ranking (use when an external oracle ranks
    on rounded values — the k-boundary must agree).
    """
    # norms are computed once per row BEFORE the pair join and stay in
    # the codegen pipeline (_norm; a pandas_udf here would force an
    # extra Python stage inside the broadcast side — measured slower);
    # per-pair scoring is the Arrow-vectorized dot_seq
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_nrm"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    else:
        c = F.broadcast(c)
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            dot_seq(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_nrm") * F.col("c_nrm")),
        )
    )
    if round_decimals is not None:
        scored = scored.withColumn(
            "cosine_sim", F.round(F.col("cosine_sim"), round_decimals)
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — no RNG state.

    Component i ∈ [−1, 1) derived from md5("h<seed>:<i>"); portable to
    the SQL oracle and stable across runs/partitions.
    """
    import hashlib

    comps = []
    for i in range(dim):
        h = hashlib.md5(f"h{seed}:{i}".encode()).hexdigest()
        comps.append((int(h[:8], 16) / 2**31) - 1.0)
    return comps


def lsh_bucket_candidates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector → (id, bucket).

    bucket = bit-string of sign(v·h_j).  Vectors in the same bucket are
    near-duplicate candidates; expected bucket population n/2^planes.
    """
    if dim is None:
        # infer from the first NON-NULL vector: .first() alone would let
        # a null leading row silently discard the whole dataset
        head = (
            df.where(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if head is None or head["d"] is None or head["d"] <= 0:
            # genuinely no usable vectors: no buckets to assign.  Derive
            # the empty schema from the actual id column type so the
            # empty path unions/joins cleanly with the normal path.
            return (
                df.select(F.col(id_col).alias("id"))
                .limit(0)
                .withColumn("bucket", F.lit(""))
            )
        dim = head["d"]
    sign_bits = []
    for j in range(num_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, j)])
        sign_bits.append(
            F.when(_dot(F.col(vec_col), plane) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return df.select(
        F.col(id_col).alias("id"), F.concat(*sign_bits).alias("bucket")
    )


def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer: KMeans centroids + per-vector cluster id.

    The inverted-file ANN scale path: search only the probe clusters
    instead of the corpus.  Returns (assignments DF with `cluster`,
    fitted KMeans model).  Deterministic under a fixed seed.
    """
    if n_clusters < 2:
        raise ValueError(
            f"ivf_index needs n_clusters >= 2 (got {n_clusters}); "
            "for a single cell use cosine_topk (exact) instead"
        )
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(feat)
    assigned = model.transform(feat).select(
        "id", "vec", F.col("prediction").alias("cluster")
    )
    return assigned, model


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: search only the n_probe nearest clusters.

    Plan: assign corpus to clusters once (the index build, amortized
    across queries at scale); per query pick the n_probe closest
    centroids (driver-side tiny loop over k centroids), then the
    scoring join carries an equi-condition on cluster — a bucketed
    join instead of a full cross product.  Recall tested vs the exact
    brute force in tests/.
    """
    from pyspark.ml.functions import array_to_vector

    assigned, model = ivf_index(corpus, vec_col, id_col, n_clusters, seed)
    centers = [list(map(float, c)) for c in model.clusterCenters()]

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    # probe-cluster selection as a column expression: cosine to each
    # centroid (literal arrays), take top n_probe cluster ids
    def centroid_cos(c: list[float]) -> Column:
        arr = F.array(*[F.lit(x) for x in c])
        return _dot(F.col("q_vec"), arr) / (F.col("q_nrm") * F.lit(sum(x * x for x in c) ** 0.5))

    scored_centroids = F.array(
        *[
            F.struct(centroid_cos(c).alias("s"), F.lit(i).alias("c"))
            for i, c in enumerate(centers)
        ]
    )
    probes = F.slice(F.array_sort(scored_centroids, lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1).otherwise(0)), 1, n_probe)
    q_probed = q.withColumn(
        "cluster", F.explode(F.transform(probes, lambda p: p["c"]))
    )

    c = assigned.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("c_vec"),
        _norm(F.col("vec")).alias("c_nrm"),
        "cluster",
    )
    pairs = (
        F.broadcast(q_probed)
        .join(c, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 8,
) -> DataFrame:
    """Near-dup pairs with cosine ≥ threshold, via LSH bucket + verify."""
    buckets = lsh_bucket_candidates(df, vec_col, id_col, num_planes)
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    b = buckets.join(vecs, "id")
    pairs = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                dot_seq(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    return pairs


def pq_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
):
    """Product-quantization index: m subspace KMeans codebooks + codes.

    Each vector is split into m contiguous subvectors; each subspace is
    KMeans-quantized to n_codes centroids; a vector is stored as m small
    codes (m bytes at n_codes<=256) instead of dim floats — the
    compressed-domain representation ANN systems scan when the corpus
    no longer fits memory.  Index build is m KMeans fits (one pass each,
    amortized across queries).  Returns (codes DF: id, vec, codes
    array<int>, codebooks: m x n_codes x d_sub python lists).
    Deterministic under the fixed per-subspace seeds.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = df.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError("pq_index needs a non-empty corpus with non-null vectors")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    assigned = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        assigned = assigned.withColumn(
            f"__f{j}", array_to_vector(F.slice(F.col("vec"), j * d_sub + 1, d_sub))
        )
        model = KMeans(
            k=n_codes, seed=seed + j, featuresCol=f"__f{j}", predictionCol=f"__c{j}"
        ).fit(assigned)
        assigned = model.transform(assigned)
        codebooks.append([list(map(float, c)) for c in model.clusterCenters()])
    codes = assigned.select(
        "id", "vec", F.array(*[F.col(f"__c{j}") for j in range(m)]).alias("codes")
    )
    return codes, codebooks


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    m: int = 16,
    n_codes: int = 16,
    seed: int = 42,
    refine: int = 10,
) -> DataFrame:
    """Approximate inner-product top-k: ADC candidate scan + exact re-rank.

    Stage 1 (asymmetric distance): every corpus CODE is scored against
    each query — the approximate dot product is the sum over subspaces
    of <query subvector, centroid of the stored code>, an element_at
    lookup into the literal codebook, entirely JVM-side
    (zip_with/aggregate).  The compressed-domain scan touches m small
    codes per vector instead of dim floats; compose with ivf_index
    cluster pruning (IVF-PQ) when even the code scan is too large.

    Stage 2 (refine): the top refine*k ADC candidates per query are
    re-scored EXACTLY against the stored vectors — the standard PQ
    re-rank that recovers the recall the quantization loses (measured
    in tests/test_storage_ivf.py).  Both ranking stages round scores to
    6 dp BEFORE ranking with an id tiebreak (determinism rule).
    """
    codes, codebooks = pq_index(corpus, vec_col, id_col, m, n_codes, seed)
    d_sub = len(codebooks[0][0])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    score = F.lit(0.0)
    for j, cb in enumerate(codebooks):
        cb_lit = F.array(*[F.array(*[F.lit(x) for x in cent]) for cent in cb])
        cent = F.element_at(cb_lit, F.element_at(F.col("codes"), j + 1) + 1)
        qsub = F.slice(F.col("q_vec"), j * d_sub + 1, d_sub)
        score = score + F.aggregate(
            F.zip_with(qsub, cent, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    pairs = (
        F.broadcast(q)
        .join(codes, F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            "q_vec",
            F.col("id").alias("neighbor_id"),
            F.col("vec").alias("c_vec"),
            F.round(score, 6).alias("approx_dot"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id")
    )
    candidates = (
        pairs.withColumn("__r", F.row_number().over(w_adc))
        .filter(F.col("__r") <= refine * k)
        .drop("__r")
    )
    exact = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(dot_seq(F.col("q_vec"), F.col("c_vec")), 6).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )
