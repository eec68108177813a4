"""Similarity search over embeddings (SURVEY.md §2.12): brute-force
cosine top-k as the exactness baseline, plus a sign-LSH-bucketed
variant as the scale path.

All vector math is JVM-side higher-order functions (zip_with +
aggregate over double-cast elements — sequential fold, bit-identical
to the oracle's list_dot_product). No UDFs, no collect.

Scale notes (100 TB / billions of vectors):

- Brute force is O(Q × N) — correct answer, embarrassingly parallel;
  broadcast the query set, scan the corpus once, per-partition top-k
  heaps via the rank-window (AQE compacts the tiny shuffle).
- The bucketed variant is IVF-style: both sides key on a coarse
  quantization (here: the sign pattern of the leading dimensions —
  random-hyperplane LSH with axis-aligned planes), the join becomes an
  equi-join on bucket id, and each probe touches only its cell. Recall
  is traded for a ~|buckets|× cost cut; multi-probe (flipping one sign
  bit) would recover recall without changing the plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables

TOP_K = 5
QUERY_STRIDE = 50  # vec_id % stride == 0 → the deterministic query set
LSH_SIGN_DIMS = 6  # 2^6 = 64 coarse cells


def _as_double(col: str = "embedding") -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _parallelize(df: DataFrame, n_parts: int | None = None) -> DataFrame:
    """The fixture embeddings are one small parquet file → ONE scan
    partition, which would serialize every O(N×candidates) vector-math
    stage on a single core (measured 27 s for the all-pairs cosine at
    sf0.1, ~1 s once spread). Round-robin repartition restores the scan
    parallelism a real multi-file corpus has natively; the shuffled
    payload is just the vectors themselves, negligible next to the pair
    loop it unblocks. The partition-count guard self-disables the
    shuffle on layouts that already scan wide.

    ``n_parts`` (r10, guide §2 partition sizing): a WORK-derived count
    from the caller — the pair loop's cost is O(N × candidates), not
    O(bytes), so neither AQE's byte-based advisory nor a flat
    core-count constant sizes it right. Callers that know their
    candidate volume pass ceil(work / per-task target), clamped to the
    session parallelism; the r9 scaling block measured the flat
    32-partition split ~1.7× SLOWER than 8 partitions at sf0.1 (pure
    scheduler overhead on ~1 s of vector math). At corpus scale the
    derived count exceeds parallelism and the clamp restores today's
    behavior, so this is fixture-visible only."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    target = parallelism if n_parts is None else max(2, min(parallelism, n_parts))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def with_norms(emb: DataFrame, n_parts: int | None = None) -> DataFrame:
    # Two-step projection: materialize the double-cast vector once, then
    # fold the norm over the materialized column — an inline transform
    # would be re-evaluated per reference (higher-order exprs are
    # interpreted, no codegen subexpression elimination). The norm
    # references v twice, so CollapseProject keeps the boundary.
    vd = _parallelize(emb.select("vec_id", _as_double().alias("v")), n_parts)
    return vd.select(
        "vec_id",
        "v",
        F.sqrt(_fold_sum(F.zip_with(F.col("v"), F.col("v"), lambda a, b: a * b))).alias(
            "nrm"
        ),
    )


def cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y)) / (na * nb)


_SQL_NORMS = """
norms AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
"""


#: Exact brute-force top-k statement — shared verbatim by the
#: ann_bruteforce_topk oracle and the recall evaluator's ground truth.
_SQL_BF_TOPK = f"""
WITH {_SQL_NORMS},
q AS (SELECT * FROM norms WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
  FROM q JOIN norms c ON c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


#: Brute-force pair-loop sizing: query×corpus candidate pairs per task.
#: Calibrated at sf0.1 (N=2000 → ~80k pairs → 9 partitions; the flat
#: core-count split was measured ~1.7× slower at 32 cores, see
#: _parallelize); at corpus scale the derived count exceeds the session
#: parallelism and the clamp takes over.
BF_PAIRS_PER_TASK = 10_000


def _parquet_rows(sf_dir: str, table: str) -> int | None:
    """Row count from the parquet FOOTER (metadata only, no scan, no
    Spark job) — the size input for work-derived partition counts.
    None when the layout isn't a single fixture file (multi-file corpus
    dirs at scale), where the caller's parallelism clamp governs."""
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(
            os.path.join(sf_dir, f"{table}.parquet")
        ).num_rows
    except Exception:
        return None


@query(
    "ann_bruteforce_topk",
    baseline_of="ann_ivf_topk",
    oracle=_SQL_BF_TOPK,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan × rank window.
    The ground-truth baseline every ANN variant is measured against.
    The corpus split is sized to the PAIR work (N × N/stride — guide §2:
    derive partition counts from input size, not a core-count constant
    that over-splits at fixture scale and means nothing at 100 TB)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    n = _parquet_rows(sf_dir, "embeddings")
    parts = (
        None
        if n is None
        else -(-(n * (n // QUERY_STRIDE + 1)) // BF_PAIRS_PER_TASK)
    )
    norms = with_norms(emb, parts)
    q = norms.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        norms.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def _sign_bucket_sql() -> str:
    bits = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(LSH_SIGN_DIMS)
    )
    return bits


def sign_bucket(v: Column) -> Column:
    """Coarse cell id: sign pattern of the leading dimensions."""
    bits = [
        F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(LSH_SIGN_DIMS)
    ]
    return F.concat(*bits)


@query(
    "ann_lsh_bucketed_topk",
    oracle=f"""
WITH {_SQL_NORMS},
bucketed AS (SELECT vec_id, v, nrm, {_sign_bucket_sql()} AS bucket FROM norms),
q AS (SELECT * FROM bucketed WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
  FROM q JOIN bucketed c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
""",
)
def ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF/LSH-bucketed ANN: equi-join on the sign-pattern cell, rank
    within the cell. Same output shape as brute force; candidates are
    only same-cell vectors — this equi-join scales where the cross
    product cannot."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    bucketed = with_norms(emb).withColumn("bucket", sign_bucket(F.col("v")))
    q = bucketed.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


@query(
    "agg_embedding_centroids",
    oracle="""
SELECT label, pos, round(avg(v), 6) AS centroid_v, COUNT(*) AS n_vecs
FROM (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
) t
GROUP BY label, pos
""",
)
def agg_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors in long form (label, dim, mean) — the
    class-prototype aggregation behind IVF coarse quantizers and
    nearest-centroid classification. posexplode turns the vector agg
    into an ordinary grouped avg: one shuffle on (label, pos), map-side
    partial aggregation; re-assembly to array form is a collect_list
    over pos when a consumer needs it."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v")
    )
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).cast("bigint").alias("pos"))
        .agg(
            F.round(F.avg("v"), 6).alias("centroid_v"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


IVF_CENTROID_STRIDE = 25  # every 25th vec_id is a codebook candidate…
IVF_MAX_CENTROID_ID = 2500  # …capped to a FIXED-size codebook (≤100 cells):
# assignment cost is N×C with C constant, independent of corpus size —
# at real scale the codebook is a trained k-means; here a deterministic
# bounded sample keeps the oracle reproducible.
IVF_NPROBE = 2


#: IVF CTE chain through cell assignment + probe lists — shared by the
#: plain top-k query, the quantized-rerank pipeline, and the kNN
#: classifier so all three provably search identical candidate sets.
_SQL_IVF_PROBES = f"""{_SQL_NORMS},
cents AS (
  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM norms
  WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
    AND vec_id < {IVF_MAX_CENTROID_ID}
),
aff AS (
  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
                    c.cent_id) AS crank
  FROM norms n CROSS JOIN cents c
),
assign AS (SELECT vec_id, v, nrm, cent_id AS cell FROM aff WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cent_id AS cell
  FROM aff WHERE vec_id % {QUERY_STRIDE} = 0 AND crank <= {IVF_NPROBE}
)"""

#: The complete IVF top-k statement (reused verbatim as the kNN
#: classifier's neighbor-list CTE).
_SQL_IVF_TOPK = f"""
WITH {_SQL_IVF_PROBES},
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(p.qv, a.v) / (p.qnrm * a.nrm) AS cos
  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


@query("ann_ivf_topk", oracle=_SQL_IVF_TOPK)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: a coarse centroid quantizer (deterministic sample of the
    corpus) + nprobe>1 multi-probe — the classic inverted-file scale
    path, complementing the single-cell sign-LSH variant.

    Scale design: the centroid table collapses to ONE row holding an
    array of (cent_id, cv, cnrm) structs via a distributed
    ``collect_list`` agg (never a driver collect), broadcast to every
    task. Cell assignment is then a per-row ``array_sort`` over centroid
    affinities — fully map-side, ZERO shuffle over the billion-vector
    corpus. Probe lists (queries × nprobe cells) are dimension-sized and
    broadcast; only the per-query candidate ranking shuffles, and that
    input is already cut by ~|cells|/nprobe.

    The affinity argsort and both cosine folds are the same sequential
    double arithmetic as the oracle's ``list_dot_product``, so ranks —
    including the crank tiebreak on cent_id — are bit-identical."""
    assign, probes = _ivf_assign_probes(spark, sf_dir)
    scored = assign.join(
        F.broadcast(probes).withColumnRenamed("cell", "qcell"),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def _ivf_assign_probes(spark: SparkSession, sf_dir: str):
    """The IVF coarse-quantizer plan shared by every IVF-family query:
    (cell assignment of the full corpus, probe list of the query set) —
    the Spark twin of the ``_SQL_IVF_PROBES`` CTE chain."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    base = with_norms(emb)
    cent_arr = (
        base.filter(
            (F.col("vec_id") % IVF_CENTROID_STRIDE == 0)
            & (F.col("vec_id") < IVF_MAX_CENTROID_ID)
        )
        .select(
            F.struct(
                F.col("vec_id").alias("cent_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cnrm"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )
    # One materialized sort per row (its own select boundary — higher-order
    # exprs are interpreted, so an inline reuse would re-evaluate the sort).
    sorted_aff = base.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        "v",
        "nrm",
        F.array_sort(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    cosine(F.col("v"), c["cv"], F.col("nrm"), c["cnrm"]).alias(
                        "ccos"
                    ),
                    c["cent_id"].alias("cent_id"),
                ),
            ),
            lambda l, r: F.when(l["ccos"] > r["ccos"], -1)
            .when(l["ccos"] < r["ccos"], 1)
            .otherwise(
                F.signum(l["cent_id"] - r["cent_id"]).cast("int")
            ),
        ).alias("srt"),
    )
    assign = sorted_aff.select(
        "vec_id", "v", "nrm", F.element_at("srt", 1)["cent_id"].alias("cell")
    )
    probes = (
        sorted_aff.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            F.explode(F.slice("srt", 1, IVF_NPROBE)).alias("p"),
        )
        .select("query_id", "qv", "qnrm", F.col("p")["cent_id"].alias("cell"))
    )
    return assign, probes


@query(
    "ann_quantize_embeddings",
    oracle=f"""
WITH {_SQL_NORMS}
SELECT vec_id,
       round(nrm, 6) AS l2_norm,
       array_to_string(
         list_transform(v, x -> CAST(trunc(x / nrm * 127) AS TINYINT)), ',')
         AS qvec
FROM norms
""",
)
def ann_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of L2-normalized embeddings — the
    compression step that makes a 100 TB ANN index RAM-resident (4×
    smaller than float32, 8× than float64; dot products stay
    rank-preserving after per-vector normalization). All JVM-side
    higher-order expressions; truncation toward zero (not rounding) in
    BOTH engines — Spark's non-ANSI double→tinyint cast and the
    oracle's explicit trunc() — so the lattice assignment is
    bit-identical cross-engine. Pure narrow map: zero shuffle beyond
    the fixture-layout repartition in with_norms. The code vector is
    emitted as a comma-joined STRING, not array<tinyint> — array-typed
    output columns crash the driver's pandas row-sorter (unhashable
    list), so serialized codes are the registry-wide contract."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    nv = with_norms(emb)
    qvec = F.transform(
        F.col("v"), lambda x: (x / F.col("nrm") * 127).cast("tinyint")
    )
    return nv.select(
        "vec_id",
        F.round("nrm", 6).alias("l2_norm"),
        F.concat_ws(",", F.transform(qvec, lambda x: x.cast("string"))).alias(
            "qvec"
        ),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ)
# ---------------------------------------------------------------------------

PQ_M = 8  #: subspaces (64-dim embeddings → 8 dims per subspace)
PQ_SUB_DIM = 8


@query(
    "ann_pq_encode",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ss AS (SELECT unnest(range({PQ_M})) AS s),
cents AS (
  SELECT s, vec_id AS cent_id, v[s*{PQ_SUB_DIM}+1 : s*{PQ_SUB_DIM}+{PQ_SUB_DIM}] AS cv
  FROM v CROSS JOIN ss
  WHERE vec_id % {IVF_CENTROID_STRIDE} = 0 AND vec_id < {IVF_MAX_CENTROID_ID}
),
sub AS (
  SELECT vec_id, s, v[s*{PQ_SUB_DIM}+1 : s*{PQ_SUB_DIM}+{PQ_SUB_DIM}] AS sv
  FROM v CROSS JOIN ss
),
dist AS (
  SELECT sub.vec_id, sub.s, c.cent_id,
         list_aggregate(
           list_transform(range({PQ_SUB_DIM}),
                          i -> (sub.sv[i+1] - c.cv[i+1]) * (sub.sv[i+1] - c.cv[i+1])),
           'sum') AS d
  FROM sub JOIN cents c ON c.s = sub.s
),
best AS (
  SELECT vec_id, s, cent_id, d,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cent_id) AS rn
  FROM dist
)
SELECT vec_id,
       array_to_string(list(cent_id ORDER BY s), ',') AS codes,
       round(list_aggregate(list(d ORDER BY s), 'sum'), 6) AS recon_err
FROM best WHERE rn = 1
GROUP BY vec_id
""",
)
def ann_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al., "Product Quantization for
    Nearest Neighbor Search"): split each embedding into PQ_M
    subvectors, assign each to its nearest sub-centroid, and emit the
    code word plus total reconstruction error — the encoding that turns
    a 64×8-byte vector into PQ_M single-byte codes for RAM-resident
    billion-vector indexes (complements the IVF cell assignment:
    IVF-PQ is exactly these two operators composed).

    Scale shape: the sub-codebook (PQ_M × ≤100 centroids, same
    deterministic candidate rule as the IVF codebook) collapses to ONE
    broadcast array row via a distributed collect_list — cell
    assignment is then a per-row argmin over the broadcast array,
    fully map-side, ZERO shuffle over the corpus (the ivf-assignment
    plan property, reused). The subvector slices are materialized once
    per row before the per-centroid loop (higher-order exprs are
    interpreted — an inline slice would re-slice per centroid), and
    both the per-subspace argmin (distance, then cent_id) and the
    subspace-ordered error fold replicate the oracle's arithmetic
    exactly."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    vd = _parallelize(emb.select("vec_id", _as_double().alias("v")))
    cent_arr = (
        vd.filter(
            (F.col("vec_id") % IVF_CENTROID_STRIDE == 0)
            & (F.col("vec_id") < IVF_MAX_CENTROID_ID)
        )
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
            "v",
        )
        .select(
            F.struct(
                F.col("s").cast("bigint").alias("s"),
                F.col("vec_id").alias("cent_id"),
                F.slice(
                    F.col("v"), F.col("s") * PQ_SUB_DIM + 1, F.lit(PQ_SUB_DIM)
                ).alias("cv"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )
    # The slices array is the ITERATION INPUT of the argmin transform
    # (index-aware lambda), so each subvector is built once per row and
    # bound to the lambda variable — an element_at from inside the
    # per-centroid loop would re-evaluate the whole slice transform per
    # centroid once CollapseProject inlines it (interpreted HOFs, no
    # common-subexpression elimination).
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda s: F.slice(F.col("v"), s * PQ_SUB_DIM + 1, F.lit(PQ_SUB_DIM)),
    )
    best_arr = F.transform(
        subs,
        lambda sub, s: F.element_at(
            F.array_sort(
                F.transform(
                    F.filter(F.col("cents"), lambda c: c["s"] == s),
                    lambda c: F.struct(
                        F.aggregate(
                            F.zip_with(
                                sub,
                                c["cv"],
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, e: acc + e,
                        ).alias("d"),
                        c["cent_id"].alias("cent_id"),
                    ),
                )
            ),
            1,
        ),
    )
    encoded = vd.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", best_arr.alias("best")
    )
    # Codes ship as a comma-joined string (driver-compat: array output
    # columns are banned registry-wide; see ann_quantize_embeddings).
    return encoded.select(
        "vec_id",
        F.concat_ws(
            ",", F.transform(F.col("best"), lambda b: b["cent_id"].cast("string"))
        ).alias("codes"),
        F.round(
            F.aggregate(
                F.col("best"), F.lit(0.0), lambda acc, b: acc + b["d"]
            ),
            6,
        ).alias("recon_err"),
    )


RERANK_SHORTLIST = 20  #: coarse candidates kept per query before exact rerank


def _int8_codes(v: Column, nrm: Column) -> Column:
    """Int8 lattice codes as BIGINTs (same trunc-toward-zero lattice as
    ann_quantize_embeddings, widened so the dot product can't overflow)."""
    return F.transform(v, lambda x: (x / nrm * 127).cast("bigint"))


@query(
    "ann_ivf_rerank",
    oracle=f"""
WITH {_SQL_IVF_PROBES},
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, p.qv, p.qnrm, a.v, a.nrm
  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
),
coarse AS (
  SELECT query_id, neighbor_id, qv, qnrm, v, nrm,
         CAST(list_aggregate(
           list_transform(range(len(v)),
             i -> CAST(trunc(qv[i+1] / qnrm * 127) AS BIGINT)
                  * CAST(trunc(v[i+1] / nrm * 127) AS BIGINT)),
           'sum') AS BIGINT) AS coarse_dot
  FROM cand
),
shortlist AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY coarse_dot DESC, neighbor_id) AS crank
  FROM coarse
),
ranked AS (
  SELECT query_id, neighbor_id, coarse_dot,
         list_dot_product(qv, v) / (qnrm * nrm) AS cos,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY list_dot_product(qv, v) / (qnrm * nrm) DESC,
                    neighbor_id) AS rank
  FROM shortlist WHERE crank <= {RERANK_SHORTLIST}
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine, coarse_dot
FROM ranked WHERE rank <= {TOP_K}
""",
)
def ann_ivf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: IVF cell probe → int8-quantized coarse
    scoring → exact cosine rerank of a fixed shortlist — the standard
    serving pipeline (FAISS IVF-SQ8 shape): the coarse stage touches
    only cheap integer dot products over 4×-compressed codes, and the
    expensive float math runs on ≤RERANK_SHORTLIST rows per query.

    Scale design: candidate generation is the shared IVF plan
    (broadcast codebook, map-side assignment, cell equi-join); the
    coarse integer fold replaces the float cosine on the wide candidate
    set, and both rank windows partition by query_id — per-query state
    never exceeds the shortlist. The coarse score is EXACT integer
    arithmetic (trunc-to-int8 lattice, widened to BIGINT), so the
    shortlist — including its neighbor_id tiebreaks — is bit-identical
    cross-engine, with no float-rounding hazard in the pruning
    decision; only the final rerank does float math, and that is the
    same sequential fold as the oracle's list_dot_product."""
    assign, probes = _ivf_assign_probes(spark, sf_dir)
    cand = assign.join(
        F.broadcast(probes).withColumnRenamed("cell", "qcell"),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "qv",
        "qnrm",
        "v",
        "nrm",
    )
    coarse = cand.withColumn(
        "coarse_dot",
        F.aggregate(
            F.zip_with(
                _int8_codes(F.col("qv"), F.col("qnrm")),
                _int8_codes(F.col("v"), F.col("nrm")),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
    cw = W.partitionBy("query_id").orderBy(F.col("coarse_dot").desc(), "neighbor_id")
    shortlist = (
        coarse.withColumn("crank", F.row_number().over(cw))
        .filter(F.col("crank") <= RERANK_SHORTLIST)
        .select(
            "query_id",
            "neighbor_id",
            "coarse_dot",
            cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias("cos"),
        )
    )
    rw = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        shortlist.withColumn("rank", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cos", 6).alias("cosine"),
            "coarse_dot",
        )
    )


@query(
    "ml_knn_classifier",
    oracle=f"""
WITH knn AS ({_SQL_IVF_TOPK}),
votes AS (
  SELECT k.query_id, e.label, COUNT(*) AS votes, MIN(k.rank) AS best_rank
  FROM knn k JOIN embeddings e ON k.neighbor_id = e.vec_id
  GROUP BY k.query_id, e.label
),
pred AS (
  SELECT query_id, label, votes, best_rank,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY votes DESC, best_rank, label) AS pr
  FROM votes
)
SELECT p.query_id,
       CAST(p.label AS INT) AS predicted_label,
       p.votes,
       p.best_rank,
       CAST(q.label AS INT) AS true_label,
       p.label = q.label AS correct
FROM pred p JOIN embeddings q ON p.query_id = q.vec_id
WHERE p.pr = 1
""",
)
def ml_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor classification over the labeled embedding
    corpus: each query vector takes the majority label of its IVF
    top-k neighbors (tie → the label holding the closest neighbor,
    then the smaller label id), compared against its own ground-truth
    label — the non-parametric classifier that needs no training pass
    and rides entirely on the ANN index (label propagation, weak
    supervision, dataset-quality probes all reduce to this join).

    Scale design: the neighbor list is the shared IVF plan's output
    (Q×k rows, tiny) joined to the corpus label column — Spark
    broadcasts the neighbor side, so the corpus is touched by one
    map-side hash join and never shuffles; the vote and argmax both
    partition by query_id. The oracle embeds the IVF top-k statement
    verbatim as its neighbor CTE, so both engines vote over
    bit-identical neighbor sets."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    knn = ann_ivf_topk(spark, sf_dir)
    labels = emb.select("vec_id", "label")
    votes = (
        labels.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(knn), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(
            F.count(F.lit(1)).alias("votes"),
            F.min("rank").alias("best_rank"),
        )
    )
    pw = W.partitionBy("query_id").orderBy(
        F.col("votes").desc(), "best_rank", "label"
    )
    pred = votes.withColumn("pr", F.row_number().over(pw)).filter(
        F.col("pr") == 1
    )
    truth = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(truth, "query_id").select(
        "query_id",
        F.col("label").cast("int").alias("predicted_label"),
        "votes",
        "best_rank",
        F.col("true_label").cast("int").alias("true_label"),
        (F.col("label") == F.col("true_label")).alias("correct"),
    )


@query(
    "ann_recall_at_k",
    oracle=f"""
WITH bf AS ({_SQL_BF_TOPK}),
ivf AS ({_SQL_IVF_TOPK}),
hits AS (
  SELECT bf.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM bf JOIN ivf USING (query_id, neighbor_id)
  GROUP BY bf.query_id
),
qs AS (SELECT DISTINCT query_id FROM bf)
SELECT qs.query_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       round(COALESCE(h.n_hits, 0)::DOUBLE / {TOP_K}, 6) AS recall
FROM qs LEFT JOIN hits h USING (query_id)
""",
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against the exact brute-force ground
    truth: per query, the fraction of the true top-k the approximate
    index returned — THE quality metric an ANN deployment is tuned on
    (nprobe trades this against probe cost). Built on the two
    registered relations and certified against an oracle embedding
    BOTH of their statements verbatim, so the evaluated rankings are
    provably the ones the driver certifies via ann_bruteforce_topk /
    ann_ivf_topk; recall is an exact-int ratio.

    Scale: the two ranked relations are (queries × k)-sized, so the
    hit join and the per-query count are serving-sized, not
    corpus-sized — the expensive legs are the indexes themselves,
    shared unchanged."""
    bf = ann_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        bf.join(ivf, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qs = bf.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / TOP_K, 6
        ).alias("recall"),
    )


def _flip_bit_sql(i: int) -> str:
    """Bucket string with bit i flipped (1-indexed position in the
    LSH_SIGN_DIMS-char '0'/'1' string)."""
    return (
        f"substr(bucket, 1, {i - 1}) || "
        f"(CASE WHEN substr(bucket, {i}, 1) = '1' THEN '0' ELSE '1' END) || "
        f"substr(bucket, {i + 1})"
    )


@query(
    "ann_lsh_multiprobe_topk",
    oracle=f"""
WITH {_SQL_NORMS},
bucketed AS (SELECT vec_id, v, nrm, {_sign_bucket_sql()} AS bucket FROM norms),
q0 AS (SELECT * FROM bucketed WHERE vec_id % {QUERY_STRIDE} = 0),
probes AS (
  SELECT vec_id, v, nrm, bucket AS probe FROM q0
  {"".join(f" UNION ALL SELECT vec_id, v, nrm, {_flip_bit_sql(i + 1)} FROM q0" for i in range(LSH_SIGN_DIMS))}
),
scored AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(p.v, c.v) / (p.nrm * c.nrm) AS cos
  FROM probes p JOIN bucketed c
    ON c.bucket = p.probe AND c.vec_id <> p.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
""",
)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB'07): each query probes its
    own sign-pattern cell PLUS every cell one bit-flip away — the
    standard recall-recovery move for bucketed LSH (a near neighbor
    on the far side of one hyperplane lands one bit off), bought with
    probes-per-query instead of more tables. The plan shape is
    UNCHANGED from the single-probe variant: still an equi-join on the
    cell id, just with (1 + n_dims) probe rows per query exploded on
    the broadcast side; candidates from overlapping probes dedupe
    before ranking."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    bucketed = with_norms(emb).withColumn("bucket", sign_bucket(F.col("v")))
    q0 = bucketed.filter(F.col("vec_id") % QUERY_STRIDE == 0)

    def flip(i: int) -> Column:
        return F.concat(
            F.substring(F.col("bucket"), 1, i - 1),
            F.when(
                F.substring(F.col("bucket"), i, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1")),
            F.substring(F.col("bucket"), i + 1, LSH_SIGN_DIMS),
        )

    probe_arr = F.array(
        F.col("bucket"), *[flip(i + 1) for i in range(LSH_SIGN_DIMS)]
    )
    probes = q0.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.explode(probe_arr).alias("probe"),
    )
    scored = (
        bucketed.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias(
                "cos"
            ),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine")
        )
    )


# ---------------------------------------------------------------------------
# Late-interaction MaxSim scoring (ColBERT-style multi-vector retrieval)
# ---------------------------------------------------------------------------

MAXSIM_M = 8  #: token sub-vectors per embedding (64 dims → 8 × 8)
MAXSIM_SUB = 8
MAXSIM_PROBES = (1, 2, 3)  #: fixed query vec_ids (the RRF probe trio)
MAXSIM_TOP_K = 5


def _maxsim_exprs():
    """Build (and memoize) the two big MaxSim Column trees.

    Columns are plan-independent expression fragments resolved by NAME
    at analysis, so one tree serves every invocation — and building
    them is the expensive part: each F.* call is a py4j round trip,
    and the nested-HOF score tree costs hundreds of them (measured
    ~0.8 s of the query's ~1.1 s total at sf0.1 was driver-side
    DataFrame CONSTRUCTION, not execution). Memoizing cuts repeat
    invocations to the cheap relational scaffolding. Lazy (not
    module-level) because Column construction needs a live JVM
    gateway."""
    global _MAXSIM_EXPRS
    if _MAXSIM_EXPRS is not None:
        return _MAXSIM_EXPRS
    # 8 (position, sub-vector) slices, then ONE transform appends the
    # norm — referencing the struct's own slice rather than re-slicing
    # three times per position.
    raw = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice("v", s * MAXSIM_SUB + 1, MAXSIM_SUB).alias("sv"),
            )
            for s in range(MAXSIM_M)
        ]
    )
    subs = F.transform(
        raw,
        lambda t: F.struct(
            t["s"].alias("s"),
            t["sv"].alias("sv"),
            F.sqrt(
                _fold_sum(F.zip_with(t["sv"], t["sv"], lambda a, b: a * b))
            ).alias("nrm"),
        ),
    )
    per_query = F.transform(
        F.col("queries"),
        lambda q: F.struct(
            q["query_id"].alias("query_id"),
            F.aggregate(
                q["qsubs"],
                F.lit(0.0),
                lambda acc, t: acc
                + F.array_max(
                    F.transform(
                        F.col("dsubs"),
                        lambda d: _fold_sum(
                            F.zip_with(t["sv"], d["sv"], lambda x, y: x * y)
                        )
                        / (t["nrm"] * d["nrm"]),
                    )
                ),
            ).alias("s"),
        ),
    )
    _MAXSIM_EXPRS = (subs, per_query)
    return _MAXSIM_EXPRS


_MAXSIM_EXPRS = None


@query(
    "similarity_maxsim_topk",
    oracle=f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
ss AS (SELECT unnest(range({MAXSIM_M})) AS s),
sub AS (
  SELECT b.vec_id, ss.s,
         b.v[ss.s*{MAXSIM_SUB}+1 : ss.s*{MAXSIM_SUB}+{MAXSIM_SUB}] AS sv
  FROM base b CROSS JOIN ss
),
subn AS (
  SELECT vec_id, s, sv, sqrt(list_dot_product(sv, sv)) AS nrm FROM sub
),
probes AS (
  SELECT vec_id AS query_id, s AS qs, sv AS qv, nrm AS qnrm
  FROM subn WHERE vec_id IN ({", ".join(str(i) for i in MAXSIM_PROBES)})
),
pairwise AS (
  SELECT p.query_id, d.vec_id AS doc_id, p.qs,
         MAX(list_dot_product(p.qv, d.sv) / (p.qnrm * d.nrm)) AS best
  FROM probes p CROSS JOIN subn d
  GROUP BY p.query_id, d.vec_id, p.qs
),
scored AS (
  SELECT query_id, doc_id, round(SUM(best), 6) AS maxsim
  FROM pairwise GROUP BY query_id, doc_id
),
rankedms AS (
  SELECT query_id, doc_id, maxsim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY maxsim DESC, doc_id) AS rnk
  FROM scored
)
SELECT CAST(query_id AS INT) AS query_id, doc_id,
       CAST(rnk AS INT) AS rnk, maxsim
FROM rankedms WHERE rnk <= {MAXSIM_TOP_K}
""",
)
def similarity_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim retrieval (ColBERT, Khattab & Zaharia
    '20): each embedding splits into MAXSIM_M token sub-vectors (the
    PQ subspace slicing) and a query scores a document as
    Σ_query-token max_doc-token cos(q_i, d_j) — token-level matching
    that single-vector cosine averages away, the reason
    late-interaction models dominate passage ranking. Relational
    lowering: the probe trio's 24 sub-vectors collapse to ONE row — an
    array of 3 (query_id, 8 token sub-vectors) entries, order pinned
    by sort_array over leading struct fields — broadcast onto the
    corpus with NO fan-out; each embedding row carries its 8
    normalized sub-vectors inline (a projection, not an explode) and
    the full MaxSim score evaluates as nested higher-order functions:
    per query, an ascending-token fold of array_max over the doc's
    sub-vectors. Zero corpus explode, zero corpus-scale shuffle before
    the 3-partition rank window — the prior explode+broadcast-join
    form paid an 8× sub-vector explode, a 24× join fan-out, and TWO
    partial-combined aggregation shuffles for the max and the sum
    (measured ~1.1 s steady-state at sf0.1 vs ~0.4 s for this form).
    The fixed fold order also makes the float summation deterministic
    (the old groupBy SUM order was engine-chosen). No corpus×corpus
    product, and at 100 TB the doc side stays a linear scan exactly
    like brute-force cosine (the IVF cell-routing composes in front
    unchanged). Scores round to 6 before the rank window, doc_id
    tiebreak (repo ranking convention)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    base = _parallelize(emb.select("vec_id", _as_double().alias("v")))
    subs, per_query = _maxsim_exprs()
    docs = base.select(F.col("vec_id").alias("doc_id"), subs.alias("dsubs"))
    probe_row = (
        base.filter(F.col("vec_id").isin(*MAXSIM_PROBES))
        .select(F.col("vec_id").alias("query_id"), subs.alias("qsubs"))
        .agg(
            F.sort_array(F.collect_list(F.struct("query_id", "qsubs"))).alias(
                "queries"
            )
        )
    )
    scored = (
        docs.crossJoin(F.broadcast(probe_row))
        .select("doc_id", F.explode(per_query).alias("q"))
        .select(
            F.col("q.query_id").alias("query_id"),
            "doc_id",
            F.round("q.s", 6).alias("maxsim"),
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("doc_id"))
    )
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= MAXSIM_TOP_K)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            "maxsim",
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ with asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------


@query(
    "ann_ivfpq_adc",
    oracle=f"""
WITH {_SQL_IVF_PROBES},
ss AS (SELECT unnest(range({PQ_M})) AS s),
pqcents AS (
  SELECT ss.s, vec_id AS cent_id,
         v[ss.s*{PQ_SUB_DIM}+1 : ss.s*{PQ_SUB_DIM}+{PQ_SUB_DIM}] AS cv
  FROM norms CROSS JOIN ss
  WHERE vec_id % {IVF_CENTROID_STRIDE} = 0 AND vec_id < {IVF_MAX_CENTROID_ID}
),
sub AS (
  SELECT a.vec_id, ss.s,
         a.v[ss.s*{PQ_SUB_DIM}+1 : ss.s*{PQ_SUB_DIM}+{PQ_SUB_DIM}] AS sv
  FROM assign a CROSS JOIN ss
),
dist AS (
  SELECT sub.vec_id, sub.s, c.cent_id, c.cv,
         list_aggregate(
           list_transform(range({PQ_SUB_DIM}),
                          i -> (sub.sv[i+1] - c.cv[i+1]) * (sub.sv[i+1] - c.cv[i+1])),
           'sum') AS d
  FROM sub JOIN pqcents c ON c.s = sub.s
),
bestc AS (
  SELECT vec_id, s, cv,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cent_id) AS rn
  FROM dist
),
recon AS (
  SELECT vec_id, flatten(list(cv ORDER BY s)) AS r
  FROM bestc WHERE rn = 1 GROUP BY vec_id
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, p.qv, r.r
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN recon r ON r.vec_id = a.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         list_aggregate(
           list_transform(range(len(qv)),
                          i -> (qv[i+1] - r[i+1]) * (qv[i+1] - r[i+1])),
           'sum') AS adc
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (
           PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(adc, 6) AS adc_dist
FROM ranked WHERE rank <= {TOP_K}
""",
)
def ann_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search with asymmetric distance computation (Jégou et
    al.): probe IVF cells for candidates, but score each candidate by
    the exact query against the candidate's PQ RECONSTRUCTION (the
    concatenation of its assigned sub-centroids) — the FAISS IVFPQ
    serving kernel, where the index stores only 1-byte-per-subspace
    codes and the query-side math stays full precision ("asymmetric"
    because only the database side is quantized).

    Scale shape: the PQ sub-codebook is the same broadcast one-row
    array as ann_pq_encode, so reconstruction is a per-row map over
    the corpus — computed ONCE per vector, not per candidate pair;
    candidates come from the shared IVF probe plan (broadcast probes,
    cell equi-join); the ADC fold is the same sequential double
    arithmetic as the oracle's list_aggregate, so distances — and the
    (adc, neighbor_id) ranking — are bit-identical cross-engine."""
    assign, probes = _ivf_assign_probes(spark, sf_dir)
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    vd = _parallelize(emb.select("vec_id", _as_double().alias("v")))
    cent_arr = (
        vd.filter(
            (F.col("vec_id") % IVF_CENTROID_STRIDE == 0)
            & (F.col("vec_id") < IVF_MAX_CENTROID_ID)
        )
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
            "v",
        )
        .select(
            F.struct(
                F.col("s").cast("bigint").alias("s"),
                F.col("vec_id").alias("cent_id"),
                F.slice(
                    F.col("v"), F.col("s") * PQ_SUB_DIM + 1, F.lit(PQ_SUB_DIM)
                ).alias("cv"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda s: F.slice(F.col("v"), s * PQ_SUB_DIM + 1, F.lit(PQ_SUB_DIM)),
    )
    # Per-subspace argmin returns (d, cent_id, cv): struct sort is
    # field-lexicographic, and (d, cent_id) is unique per subspace, so
    # the trailing cv never participates in the comparison.
    recon = F.flatten(
        F.transform(
            subs,
            lambda sub, s: F.element_at(
                F.array_sort(
                    F.transform(
                        F.filter(F.col("cents"), lambda c: c["s"] == s),
                        lambda c: F.struct(
                            F.aggregate(
                                F.zip_with(
                                    sub, c["cv"], lambda x, y: (x - y) * (x - y)
                                ),
                                F.lit(0.0),
                                lambda acc, e: acc + e,
                            ).alias("d"),
                            c["cent_id"].alias("cent_id"),
                            c["cv"].alias("cv"),
                        ),
                    )
                ),
                1,
            )["cv"],
        )
    )
    reconned = assign.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "cell", recon.alias("r")
    )
    adc = F.aggregate(
        F.zip_with(F.col("qv"), F.col("r"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    scored = reconned.join(
        F.broadcast(probes.select("query_id", "qv", F.col("cell").alias("qcell"))),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), adc.alias("adc")
    )
    w = W.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "rank", F.round("adc", 6).alias("adc_dist")
        )
    )


# ---------------------------------------------------------------------------
# Embedding-norm MAD outlier gate (embedding-table data quality)
# ---------------------------------------------------------------------------

NORM_MAD_K = 3.0  #: robust threshold (the agg_mad_outliers convention)


@query(
    "dq_embedding_norm_outliers",
    oracle=f"""
WITH {_SQL_NORMS.strip()},
r AS (SELECT vec_id, round(nrm, 6) AS nrm6 FROM norms),
med AS (SELECT median(nrm6) AS med FROM r),
dev AS (SELECT r.vec_id, r.nrm6, abs(r.nrm6 - m.med) AS adev
        FROM r CROSS JOIN med m),
mad AS (SELECT median(adev) AS mad FROM dev)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       round(MIN(m2.med), 6) + 0.0 AS median_norm,
       round(MIN(md.mad), 6) + 0.0 AS mad_norm,
       CAST(SUM(CASE WHEN round(d.adev - {NORM_MAD_K} * md.mad, 6) > 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(MIN(CASE WHEN round(d.adev - {NORM_MAD_K} * md.mad, 6) > 0
            THEN d.vec_id END) AS BIGINT) AS first_outlier_vec
FROM dev d CROSS JOIN mad md CROSS JOIN med m2
""",
)
def dq_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table quality gate: flag vectors whose L2 norm is a
    MAD outlier — the cheap screen that catches broken embedding rows
    (zero vectors from a failed encoder call, exploded norms from a
    bad batch) BEFORE they poison every cosine in the ANN lane (an
    unnormalized outlier dominates any dot-product ranking it enters).
    The robust-statistics twin of agg_mad_outliers, applied to the
    vector table: median and MAD over the 6-rounded norms (rounding
    first pins the median's input domain bit-identically cross-engine),
    flags via the round(6) comparison convention.

    Scale shape: norms are the shared with_norms scan (one fold per
    row, no shuffle); the two medians are scalar aggregates riding
    broadcast cross joins; the verdict is one more partial-combined
    pass. Output is a single summary row — the gate a pipeline
    branches on, not a row dump."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    r = with_norms(emb).select(
        "vec_id", F.round("nrm", 6).alias("nrm6")
    )
    med = r.agg(F.median("nrm6").alias("med"))
    dev = r.crossJoin(F.broadcast(med)).select(
        "vec_id", F.abs(F.col("nrm6") - F.col("med")).alias("adev"), "med"
    )
    mad = dev.agg(F.median("adev").alias("mad"))
    flag = F.round(F.col("adev") - NORM_MAD_K * F.col("mad"), 6) > 0
    return dev.crossJoin(F.broadcast(mad)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        (F.round(F.min("med"), 6) + F.lit(0.0)).alias("median_norm"),
        (F.round(F.min("mad"), 6) + F.lit(0.0)).alias("mad_norm"),
        F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        F.min(F.when(flag, F.col("vec_id"))).cast("bigint").alias(
            "first_outlier_vec"
        ),
    )


# ---------------------------------------------------------------------------
# Radius (range) search: all pairs within a cosine threshold, LSH-blocked
# ---------------------------------------------------------------------------

RADIUS_COS = 0.2  #: cosine similarity threshold for a "neighbor" pair


@query(
    "ann_radius_search_lsh",
    oracle=f"""
WITH {_SQL_NORMS},
bucketed AS (SELECT vec_id, v, nrm, {_sign_bucket_sql()} AS bucket FROM norms),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos, 6) AS cosine
FROM pairs WHERE cos >= {RADIUS_COS}
""",
)
def ann_radius_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search — ALL vector pairs with cosine >= RADIUS_COS —
    blocked by the sign-LSH cell. Top-k retrieval answers "the k most
    similar"; range search answers "everything within a similarity
    radius" (duplicate candidate generation, near-match audit, graph
    edge construction), and its output size is data-dependent, so the
    all-pairs form is unshippable at scale. The sign-bucket equi-join
    bounds candidates to same-cell pairs — identical recall contract
    to ann_lsh_bucketed_topk (the oracle replicates the cells, so both
    engines see the same candidate set and the certification is
    exact). Multi-probe (flip one sign bit) recovers cross-cell
    neighbors at 7x candidate cost without changing the plan shape —
    ann_lsh_multiprobe_topk demonstrates that path for top-k.

    Scale shape: one narrow norm projection, one equi-join keyed on
    the 2^LSH_SIGN_DIMS-cell bucket id (skew-bounded: cells of random
    signs are balanced; AQE skew-join splits stragglers), per-pair
    O(dim) JVM-side fold, filter before any further movement."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    n = with_norms(emb).select(
        "vec_id", "v", "nrm", sign_bucket(F.col("v")).alias("bucket")
    )
    a = n.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "bucket",
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= RADIUS_COS)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# MMR diversity re-ranking (Maximal Marginal Relevance)
# ---------------------------------------------------------------------------

MMR_LAMBDA = 0.7  #: relevance weight; 1-λ penalizes similarity to picks
MMR_CANDS = 20  #: candidate pool per query (same-cell cosine top-20)
MMR_K = 5  #: final picks per query


def _mmr_oracle() -> str:
    """Greedy MMR unrolled to MMR_K selection steps. Every score is a
    double built from the same exact-rational cosine ratios both
    engines produce (IEEE division is correctly rounded), the marginal
    score is the literal expression ``0.7*rel - 0.3*maxsim`` on both
    sides, and every argmax breaks ties on candidate id — so the
    greedy trajectory is engine-independent."""
    head = f"""
WITH {_SQL_NORMS},
bucketed AS (SELECT vec_id, v, nrm, {_sign_bucket_sql()} AS bucket FROM norms),
qv AS (SELECT * FROM bucketed WHERE vec_id % {QUERY_STRIDE} = 0),
cand0 AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS rel,
         row_number() OVER (PARTITION BY q.vec_id
            ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                     c.vec_id) AS rnk
  FROM qv q JOIN bucketed c
    ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
),
cand AS (SELECT qid, cid, rel FROM cand0 WHERE rnk <= {MMR_CANDS}),
psim AS (
  SELECT x.qid, x.cid AS ca, y.cid AS cb,
         list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS sim
  FROM cand x
  JOIN cand y ON x.qid = y.qid AND x.cid <> y.cid
  JOIN norms na ON na.vec_id = x.cid
  JOIN norms nb ON nb.vec_id = y.cid
),
sel1 AS (
  SELECT qid, cid, rel, 1 AS step
  FROM (SELECT qid, cid, rel,
               row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
        FROM cand)
  WHERE rn = 1
)"""
    steps = []
    for k in range(2, MMR_K + 1):
        prev = f"sel{k - 1}"
        steps.append(f""",
pick{k} AS (
  SELECT qid, cid, rel, {k} AS step
  FROM (
    SELECT c.qid, c.cid, c.rel,
           row_number() OVER (PARTITION BY c.qid
              ORDER BY {MMR_LAMBDA} * c.rel - {round(1 - MMR_LAMBDA, 10)} * m.maxsim DESC,
                       c.cid) AS rn
    FROM cand c
    JOIN (SELECT p.qid, p.ca AS cid, MAX(p.sim) AS maxsim
          FROM psim p JOIN {prev} s ON p.qid = s.qid AND p.cb = s.cid
          GROUP BY p.qid, p.ca) m
      ON c.qid = m.qid AND c.cid = m.cid
    WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                      WHERE s.qid = c.qid AND s.cid = c.cid)
  ) WHERE rn = 1
),
sel{k} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{k})"""
        )
    tail = f"""
SELECT qid AS query_id, cid AS neighbor_id, step::BIGINT AS step,
       round(rel, 6) AS relevance
FROM sel{MMR_K}
"""
    return head + "".join(steps) + tail


@query("ann_mmr_rerank", oracle=_mmr_oracle())
def ann_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from each query's cosine top-MMR_CANDS candidate pool
    (same sign-LSH cell), greedily pick MMR_K results maximizing
    ``λ·relevance − (1−λ)·max-similarity-to-already-picked`` — the
    diversity re-rank every RAG retrieval stack runs so the k context
    passages aren't five copies of the same document.

    Engine path: candidate generation is the bucketed equi-join +
    rank window (the ann_lsh_bucketed_topk plan); the greedy selection
    is a per-query ``applyInPandas`` over the ≤MMR_CANDS-row group —
    O(K·C·dim) per query with pure sequential-float arithmetic that
    replays the oracle's fold order exactly (numpy's SIMD/pairwise
    dot would differ in final ulps and flip near-tie argmaxes; see
    the in-function loop). The O(C²) pair-similarity work happens
    per group, bounded by the candidate cap, never corpus-wide.

    Scale: candidates shuffle once keyed on query id; groups are
    ≤MMR_CANDS rows; selection state is K ids per group."""
    import pandas as pd
    from pyspark.sql import types as T

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    n = with_norms(emb).select(
        "vec_id", "v", "nrm", sign_bucket(F.col("v")).alias("bucket")
    )
    q = n.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    rel = cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm"))
    cand = (
        q.join(n, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            rel.alias("rel"),
            "v",
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("rel"), "cid")
            ),
        )
        .filter(F.col("rnk") <= MMR_CANDS)
        .drop("rnk")
    )

    lam, one_m = MMR_LAMBDA, round(1 - MMR_LAMBDA, 10)

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cid").reset_index(drop=True)
        vecs = {int(r.cid): list(r.v) for r in pdf.itertuples()}
        rels = {int(r.cid): float(r.rel) for r in pdf.itertuples()}
        norms = {}
        for cid, v in vecs.items():
            s = 0.0
            for x in v:
                s += x * x
            norms[cid] = s ** 0.5

        def sim(a: int, b: int) -> float:
            # sequential fold — IEEE-identical to list_dot_product
            s = 0.0
            for x, y in zip(vecs[a], vecs[b]):
                s += x * y
            return s / (norms[a] * norms[b])

        picked: list[tuple[int, int, float]] = []  # (cid, step, rel)
        chosen: set[int] = set()
        for step in range(1, MMR_K + 1):
            best_cid, best_score = None, None
            for cid in sorted(vecs):  # ascending id = tiebreak winner first
                if cid in chosen:
                    continue
                if step == 1:
                    score = rels[cid]
                else:
                    maxsim = max(sim(cid, s) for s in chosen)
                    score = lam * rels[cid] - one_m * maxsim
                if best_score is None or score > best_score:
                    best_cid, best_score = cid, score
            if best_cid is None:
                break
            chosen.add(best_cid)
            picked.append((best_cid, step, rels[best_cid]))
        qid = int(pdf["qid"].iloc[0])
        return pd.DataFrame(
            {
                "query_id": [qid] * len(picked),
                "neighbor_id": [p[0] for p in picked],
                "step": [p[1] for p in picked],
                "relevance": [p[2] for p in picked],
            }
        )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("step", T.LongType()),
            T.StructField("relevance", T.DoubleType()),
        ]
    )
    out = cand.groupBy("qid").applyInPandas(mmr, schema)
    return out.withColumn("relevance", F.round("relevance", 6))
