"""Corpus retrieval over ``documents`` (SURVEY.md §2.12 extensions):
BM25 ranked retrieval and an inverted-index (posting-list) build — the
index/serve stages that follow the text-analysis and dedup stages of an
LLM training-data pipeline (the reference's rank-and-top-k kernel,
``lambda_function.py:173-179``, generalized from one scored column to a
corpus-wide relevance model).

Scale shape (100 TB): both queries ride ONE explode → partial-combined
``groupBy(doc_id, tok)`` over the corpus; everything per-token after
that point (document frequency, the BM25 model, posting caps) operates
on the *vocabulary-sized* or *query-sized* relations and broadcasts
back. No all-pairs work, no collect, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.operators.dedup import spread_docs, tokens_col
from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables

#: Fixed keyword queries for the retrieval benchmark (deterministic —
#: the oracle embeds the same VALUES list).
BM25_QUERY_TERMS: list[tuple[int, tuple[str, ...]]] = [
    (1, ("spark", "join")),
    (2, ("window", "agg", "stream")),
    (3, ("customer", "value", "table")),
]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5

#: Max doc_ids materialized per posting list (real indexes cap or tier
#: posting lists; the cap is applied BELOW the collect, via a rank
#: window on the same shuffle key, so no unbounded row ever forms).
POSTING_CAP = 8


def _doc_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, c) term frequencies: one explode, one
    partial-combined groupBy — the single corpus-wide shuffle both
    retrieval queries share."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        spread_docs(docs)
        .select("doc_id", F.explode(tokens_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _sql_query_values() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_QUERY_TERMS for t in terms
    )
    return f"q(query_id, tok) AS (VALUES {rows})"


_ALL_QUERY_TERMS = sorted({t for _, terms in BM25_QUERY_TERMS for t in terms})

#: The full BM25 CTE chain (query values → token counts → doc length →
#: corpus stats → df → scored → ranked), shared verbatim by the BM25
#: oracle and the hybrid-RRF oracle so the sparse leg of the fusion is
#: provably the SAME ranking the driver certifies via
#: text_bm25_retrieval.
_BM25_CTES = f"""{_sql_query_values()},
tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl FROM c GROUP BY doc_id),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT CAST(SUM(c) AS BIGINT) FROM c) AS total_toks
),
df AS (
  SELECT tok, COUNT(*) AS df FROM c
  WHERE tok IN ({", ".join(f"'{t}'" for t in _ALL_QUERY_TERMS)})
  GROUP BY tok
),
scored AS (
  SELECT q.query_id, c.doc_id,
         round(SUM(
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
           * (c.c * ({BM25_K1} + 1))
           / (c.c + {BM25_K1} * (1 - {BM25_B}
              + {BM25_B} * dl.dl / (stats.total_toks::DOUBLE / stats.n_docs)))
         ), 6) AS bm25
  FROM c
  JOIN q USING (tok)
  JOIN df USING (tok)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY q.query_id, c.doc_id
),
ranked AS (
  SELECT query_id, doc_id, bm25,
         row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rnk
  FROM scored
)"""


@query(
    "text_bm25_retrieval",
    oracle=f"""
WITH {_BM25_CTES}
SELECT query_id, doc_id, CAST(rnk AS INT) AS rnk, bm25
FROM ranked WHERE rnk <= {BM25_TOP_K}
""",
)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) top-k retrieval for a fixed
    keyword query set — the classic sparse-retrieval ranking kernel.

    Scale shape: term frequencies are the shared partial-combined
    groupBy; per-doc length is a window over doc_id — note this costs
    one extra exchange: Spark's HashPartitioning on (doc_id, tok) does
    NOT satisfy a ClusteredDistribution on the prefix doc_id, so the
    planner re-shuffles for the window (prefix keys are not reusable
    the way range-partitioned sorts are); document frequency is computed
    AFTER restricting to the query vocabulary (a broadcast IN-filter),
    so the df aggregation touches only matching postings; the corpus
    scalars (N, avgdl) are a broadcast 1-row cross join, never a
    collected literal. Candidate scoring is |matching postings|-sized —
    corpus-size-independent for fixed queries. Ranking orders by the
    ROUNDED score with doc_id tiebreak (repo convention: both engines
    rank identical values)."""
    return (
        _bm25_ranked(spark, sf_dir)
        .filter(F.col("rnk") <= BM25_TOP_K)
        .select("query_id", "doc_id", "rnk", "bm25")
    )


def _bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All BM25 candidates ranked per query (query_id, doc_id, rnk,
    bm25) — the shared sparse-ranking relation behind both
    text_bm25_retrieval (top-k cut) and retrieval_hybrid_rrf (fusion
    depth cut)."""
    counts = _doc_term_counts(spark, sf_dir)
    dl = F.sum("c").over(W.partitionBy("doc_id")).cast("bigint")
    with_dl = counts.withColumn("dl", dl)
    matched = with_dl.filter(F.col("tok").isin(_ALL_QUERY_TERMS))
    df_term = matched.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = counts.agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
        F.sum("c").cast("bigint").alias("total_toks"),
    )
    qterms = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("int").alias("query_id"),
                        F.lit(t).alias("tok"),
                    )
                    for qid, terms in BM25_QUERY_TERMS
                    for t in terms
                ]
            )
        ).alias("q")
    ).select("q.query_id", "q.tok")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    avgdl = F.col("total_toks").cast("double") / F.col("n_docs")
    tf_norm = (F.col("c") * (BM25_K1 + 1)) / (
        F.col("c") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
    )
    scored = (
        matched.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(df_term), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("bm25"))
    )
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    )
    return scored.withColumn("rnk", rnk)


@query(
    "text_inverted_index",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
full_stats AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(c) AS BIGINT) AS cf
  FROM c GROUP BY tok
),
capped AS (
  SELECT tok, doc_id,
         row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
  FROM c
),
postings AS (
  SELECT tok, array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
  FROM capped WHERE rn <= {POSTING_CAP} GROUP BY tok
)
SELECT f.tok, f.df, f.cf, p.postings
FROM full_stats f JOIN postings p USING (tok)
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → document frequency, collection
    frequency, and a capped posting list (first {POSTING_CAP} doc_ids,
    ascending) — the index artifact behind sparse retrieval and the
    decontamination joins.

    Scale shape: ONE exchange on ``tok`` serves both the posting-cap
    rank window and the final aggregation (window keys on the shuffle
    key itself); the cap is applied BEFORE ``collect_list`` so no task
    ever materializes an unbounded posting array (a stopword's full
    posting list at corpus scale is millions of entries — capped lists
    are how real indexes tier such terms). df/cf are computed on the
    same pass with a conditional collect, not a second shuffle."""
    counts = _doc_term_counts(spark, sf_dir)
    rn = F.row_number().over(W.partitionBy("tok").orderBy("doc_id"))
    return (
        counts.withColumn("rn", rn)
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("c").cast("bigint").alias("cf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") <= POSTING_CAP, F.col("doc_id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the sparse (BM25) and
# dense (embedding-cosine) rankings
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF smoothing constant (Cormack et al.)
RRF_DEPTH = 20  # per-leg candidate depth fed into the fusion
RRF_TOP_K = 5

#: Dense probes: the embedding whose vec_id equals the BM25 query_id
#: stands in as that query's dense representation (doc_id ↔ vec_id is
#: the corpus's 1:1 embedding mapping, FIXTURES.md §B).
_RRF_PROBE_IDS = tuple(qid for qid, _ in BM25_QUERY_TERMS)

_SQL_RRF_NORMS = """
norms AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)"""


@query(
    "retrieval_hybrid_rrf",
    oracle=f"""
WITH {_BM25_CTES},
sparse AS (
  SELECT CAST(query_id AS INT) AS query_id, doc_id, rnk AS sparse_rank
  FROM ranked WHERE rnk <= {RRF_DEPTH}
),
{_SQL_RRF_NORMS.strip()},
probes AS (
  SELECT vec_id, v, nrm FROM norms
  WHERE vec_id IN ({", ".join(str(i) for i in _RRF_PROBE_IDS)})
),
dscored AS (
  SELECT CAST(p.vec_id AS INT) AS query_id, n.vec_id AS doc_id,
         list_dot_product(p.v, n.v) / (p.nrm * n.nrm) AS cos
  FROM probes p CROSS JOIN norms n
),
dranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS drnk
  FROM dscored
),
dense AS (SELECT query_id, doc_id, drnk AS dense_rank FROM dranked WHERE drnk <= {RRF_DEPTH}),
fused AS (
  SELECT COALESCE(s.query_id, d.query_id) AS query_id,
         COALESCE(s.doc_id, d.doc_id) AS doc_id,
         s.sparse_rank, d.dense_rank,
         round(COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + s.sparse_rank), CAST(0.0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + d.dense_rank), CAST(0.0 AS DOUBLE)), 6) AS rrf
  FROM sparse s
  FULL OUTER JOIN dense d ON s.query_id = d.query_id AND s.doc_id = d.doc_id
),
franked AS (
  SELECT query_id, doc_id, sparse_rank, dense_rank, rrf,
         row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS frnk
  FROM fused
)
SELECT query_id, doc_id, CAST(frnk AS INT) AS fused_rank, rrf,
       CAST(sparse_rank AS INT) AS sparse_rank,
       CAST(dense_rank AS INT) AS dense_rank
FROM franked WHERE frnk <= {RRF_TOP_K}
""",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the sparse BM25
    ranking and a dense embedding-cosine ranking each contribute
    1/(k + rank); the fused score re-ranks the union of both top-20
    candidate lists — the standard serving-side combination behind
    RAG retrieval stacks (sparse catches exact keyword hits, dense
    catches paraphrase; RRF needs no score calibration because it
    fuses RANKS, not scores).

    Scale shape: the sparse leg is the certified _bm25_ranked relation
    (one corpus shuffle); the dense leg broadcasts the 3 probe vectors
    onto the embedding scan (the ann_bruteforce pattern at fixed probe
    count); the fusion joins two ≤ (queries × depth)-row relations —
    corpus-size-independent. Fusion scores are sums of exact-int
    reciprocals rounded to 6; ranking orders by the rounded score with
    doc_id tiebreak on both engines."""
    from etl_pipeline_sam_gov_spark.operators.similarity import (
        cosine,
        with_norms,
    )

    sparse = (
        _bm25_ranked(spark, sf_dir)
        .filter(F.col("rnk") <= RRF_DEPTH)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            F.col("rnk").alias("sparse_rank"),
        )
    )
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    norms = with_norms(emb)
    # .limit() makes the probe set's bound PLAN-VISIBLE (GlobalLimit),
    # so the broadcast pin passes the hint-policy gate on its merits:
    # the build side provably cannot exceed the fixed probe count.
    probes = (
        norms.filter(F.col("vec_id").isin(*_RRF_PROBE_IDS))
        .limit(len(_RRF_PROBE_IDS))
        .select(
            F.col("vec_id").cast("int").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    dscored = norms.crossJoin(F.broadcast(probes)).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias("cos"),
    )
    drnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    )
    dense = (
        dscored.withColumn("drnk", drnk)
        .filter(F.col("drnk") <= RRF_DEPTH)
        .select("query_id", "doc_id", F.col("drnk").alias("dense_rank"))
    )
    leg = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(RRF_K) + r), F.lit(0.0)
    )
    fused = sparse.join(dense, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "sparse_rank",
        "dense_rank",
        F.round(
            leg(F.col("sparse_rank")) + leg(F.col("dense_rank")), 6
        ).alias("rrf"),
    )
    frnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    )
    return (
        fused.withColumn("fused_rank", frnk)
        .filter(F.col("fused_rank") <= RRF_TOP_K)
        .select(
            "query_id",
            "doc_id",
            "fused_rank",
            "rrf",
            "sparse_rank",
            "dense_rank",
        )
    )


# ---------------------------------------------------------------------------
# Query-likelihood language-model retrieval (Dirichlet smoothing)
# ---------------------------------------------------------------------------

QL_MU = 300.0  # Dirichlet prior mass (Zhai & Lafferty '01); ~avg doc len
QL_TOP_K = 5


@query(
    "retrieval_query_likelihood",
    oracle=f"""
WITH {_sql_query_values()},
tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl FROM c GROUP BY doc_id),
stats AS (SELECT CAST(SUM(c) AS BIGINT) AS total_toks FROM c),
cf AS (
  SELECT tok, CAST(SUM(c) AS BIGINT) AS cf FROM c
  WHERE tok IN ({", ".join(f"'{t}'" for t in _ALL_QUERY_TERMS)})
  GROUP BY tok
),
kq AS (
  SELECT q.query_id,
         SUM(ln({QL_MU} * cf.cf / stats.total_toks)) AS kq,
         COUNT(*) AS nt
  FROM q JOIN cf USING (tok) CROSS JOIN stats
  GROUP BY q.query_id
),
m AS (
  SELECT q.query_id, c.doc_id,
         SUM(ln(1 + c.c * stats.total_toks / ({QL_MU} * cf.cf))) AS msum
  FROM c
  JOIN q USING (tok)
  JOIN cf USING (tok)
  CROSS JOIN stats
  GROUP BY q.query_id, c.doc_id
),
scored AS (
  SELECT m.query_id, m.doc_id,
         round(m.msum + kq.kq - kq.nt * ln(dl.dl + {QL_MU}), 6) AS ql
  FROM m JOIN kq USING (query_id) JOIN dl USING (doc_id)
),
rankedql AS (
  SELECT query_id, doc_id, ql,
         row_number() OVER (PARTITION BY query_id ORDER BY ql DESC, doc_id) AS rnk
  FROM scored
)
SELECT query_id, doc_id, CAST(rnk AS INT) AS rnk, ql
FROM rankedql WHERE rnk <= {QL_TOP_K}
""",
)
def retrieval_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    '01): rank documents by Σ_t ln p(t|θ_d) with p(t|θ_d) =
    (c(t,d) + μ·p(t|C)) / (|d| + μ) — the probabilistic LM twin of
    BM25, and the scoring function behind KL-divergence retrieval.

    The score is computed in the DECOMPOSED form
    ``Σ_matching ln(1 + c·|C|/(μ·cf)) + Σ_q ln(μ·cf/|C|) − |q|·ln(|d|+μ)``
    so only MATCHING postings are ever enumerated: the candidate set is
    docs sharing ≥1 query term (exactly BM25's), the per-query constant
    and term count are query-sized broadcast relations, and the per-doc
    length correction joins the |candidates|-row relation — never a
    corpus × queries product. Collection frequencies are computed AFTER
    the broadcast IN-filter to the query vocabulary, on the same shared
    term-count exchange BM25 rides (one corpus shuffle total). Terms
    absent from the corpus (cf = 0) drop out via the inner join on both
    engines — the standard handling, which also keeps ln() away from 0.
    Scores are rounded to 6 before the rank window, doc_id tiebreak."""
    counts = _doc_term_counts(spark, sf_dir)
    dl = counts.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("dl"))
    matched = counts.filter(F.col("tok").isin(_ALL_QUERY_TERMS))
    cf_term = matched.groupBy("tok").agg(
        F.sum("c").cast("bigint").alias("cf")
    )
    stats = counts.agg(F.sum("c").cast("bigint").alias("total_toks"))
    qterms = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("int").alias("query_id"),
                        F.lit(t).alias("tok"),
                    )
                    for qid, terms in BM25_QUERY_TERMS
                    for t in terms
                ]
            )
        ).alias("q")
    ).select("q.query_id", "q.tok")
    q_model = (
        qterms.join(F.broadcast(cf_term), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.log(F.lit(QL_MU) * F.col("cf") / F.col("total_toks"))
            ).alias("kq"),
            F.count(F.lit(1)).alias("nt"),
        )
    )
    msum = (
        matched.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(cf_term), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(
                    1
                    + F.col("c")
                    * F.col("total_toks")
                    / (F.lit(QL_MU) * F.col("cf"))
                )
            ).alias("msum")
        )
    )
    scored = (
        msum.join(F.broadcast(q_model), "query_id")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("msum")
                + F.col("kq")
                - F.col("nt") * F.log(F.col("dl") + QL_MU),
                6,
            ).alias("ql"),
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("ql"), F.asc("doc_id"))
    )
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= QL_TOP_K)
        .select("query_id", "doc_id", "rnk", "ql")
    )


# ---------------------------------------------------------------------------
# Proximity retrieval (positional index, conjunctive semantics)
# ---------------------------------------------------------------------------

PROX_TOP_K = 5


@query(
    "retrieval_phrase_proximity",
    oracle=f"""
WITH {_sql_query_values()},
toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
pos AS (
  SELECT doc_id, u.i AS p, t[u.i] AS tok
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
  WHERE t[u.i] IN ({", ".join(f"'{t}'" for t in _ALL_QUERY_TERMS)})
),
m AS (SELECT q.query_id, p.doc_id, p.tok, p.p FROM pos p JOIN q USING (tok)),
qsize AS (SELECT query_id, COUNT(*) AS qn FROM q GROUP BY 1),
present AS (
  SELECT query_id, doc_id, COUNT(DISTINCT tok) AS nt
  FROM m GROUP BY 1, 2
),
conj AS (
  SELECT p.query_id, p.doc_id
  FROM present p JOIN qsize s USING (query_id) WHERE p.nt = s.qn
),
gaps AS (
  SELECT a.query_id, a.doc_id, CAST(MIN(ABS(a.p - b.p)) AS BIGINT) AS min_gap
  FROM m a JOIN m b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
),
rankedpx AS (
  SELECT c.query_id, c.doc_id, g.min_gap,
         row_number() OVER (PARTITION BY c.query_id
                            ORDER BY g.min_gap, c.doc_id) AS rnk
  FROM conj c JOIN gaps g USING (query_id, doc_id)
)
SELECT query_id, doc_id, CAST(rnk AS INT) AS rnk, min_gap
FROM rankedpx WHERE rnk <= {PROX_TOP_K}
""",
)
def retrieval_phrase_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval over a positional index: conjunctive
    semantics (a document must contain ALL query terms — the AND
    retrieval BM25's OR scoring doesn't express) ranked by the
    minimum position gap between any two distinct query terms —
    near-phrase evidence, the positional signal behind phrase boost
    and "terms near each other" ranking in web search. The entire
    ranking is EXACT INTEGER (gap, then doc_id) — no score floats
    anywhere, so cross-engine agreement is structural.

    Scale shape: positions materialize ONLY for the query vocabulary
    (the broadcast IN-filter runs in the scan — a positional posting
    list, not a corpus explode); the pair stage self-joins matched
    positions keyed on (query, doc) with fan-out bounded by per-doc
    query-term occurrences (never corpus-quadratic); the conjunctive
    gate is a distinct-count against the broadcast query sizes."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from etl_pipeline_sam_gov_spark.operators.dedup import tokens_col

    pos = (
        docs.select("doc_id", F.posexplode(tokens_col()).alias("i0", "tok"))
        .filter(F.col("tok").isin(_ALL_QUERY_TERMS))
        .select("doc_id", (F.col("i0") + 1).alias("p"), "tok")
    )
    qterms = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("int").alias("query_id"),
                        F.lit(t).alias("tok"),
                    )
                    for qid, terms in BM25_QUERY_TERMS
                    for t in terms
                ]
            )
        ).alias("q")
    ).select("q.query_id", "q.tok")
    m = pos.join(F.broadcast(qterms), "tok").select(
        "query_id", "doc_id", "tok", "p"
    )
    qsize = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("qn"))
    present = m.groupBy("query_id", "doc_id").agg(
        F.count_distinct("tok").alias("nt")
    )
    conj = (
        present.join(F.broadcast(qsize), "query_id")
        .filter(F.col("nt") == F.col("qn"))
        .select("query_id", "doc_id")
    )
    a = m.alias("a")
    b = m.alias("b")
    gaps = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.query_id").alias("query_id"),
            F.col("a.doc_id").alias("doc_id"),
        )
        .agg(
            F.min(F.abs(F.col("a.p") - F.col("b.p")))
            .cast("bigint")
            .alias("min_gap")
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy("min_gap", "doc_id")
    )
    return (
        conj.join(gaps, ["query_id", "doc_id"])
        .withColumn("rnk", rnk)
        .filter(F.col("rnk") <= PROX_TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            "min_gap",
        )
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (Rocchio-style query expansion)
# ---------------------------------------------------------------------------

FB_DOCS = 3  #: top BM25 docs assumed relevant per query
FB_TERMS = 2  #: expansion terms appended per query


@query(
    "retrieval_rocchio_prf",
    oracle=f"""
WITH {_BM25_CTES},
fb AS (SELECT query_id, doc_id FROM ranked WHERE rnk <= {FB_DOCS}),
dfall AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM c GROUP BY tok),
cand AS (
  SELECT f.query_id, c.tok, CAST(SUM(c.c) AS BIGINT) AS fb_tf
  FROM fb f
  JOIN c ON c.doc_id = f.doc_id
  LEFT JOIN q ON q.query_id = f.query_id AND q.tok = c.tok
  WHERE q.tok IS NULL
  GROUP BY f.query_id, c.tok
),
wght AS (
  SELECT cand.query_id, cand.tok,
         cand.fb_tf * ln((stats.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) AS w
  FROM cand JOIN dfall d USING (tok) CROSS JOIN stats
),
pick AS (
  SELECT query_id, tok FROM (
    SELECT query_id, tok,
           row_number() OVER (PARTITION BY query_id ORDER BY w DESC, tok) AS rn
    FROM wght) t
  WHERE rn <= {FB_TERMS}
),
q2 AS (SELECT query_id, tok FROM q UNION ALL SELECT query_id, tok FROM pick),
df2 AS (
  SELECT tok, COUNT(*) AS df FROM c
  WHERE tok IN (SELECT DISTINCT tok FROM q2) GROUP BY tok
),
scored2 AS (
  SELECT q2.query_id, c.doc_id,
         round(SUM(
           ln((stats.n_docs - df2.df + 0.5) / (df2.df + 0.5) + 1)
           * (c.c * ({BM25_K1} + 1))
           / (c.c + {BM25_K1} * (1 - {BM25_B}
              + {BM25_B} * dl.dl / (stats.total_toks::DOUBLE / stats.n_docs)))
         ), 6) AS bm25_prf
  FROM c
  JOIN q2 USING (tok)
  JOIN df2 USING (tok)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY q2.query_id, c.doc_id
),
ranked2 AS (
  SELECT query_id, doc_id, bm25_prf,
         row_number() OVER (
           PARTITION BY query_id ORDER BY bm25_prf DESC, doc_id) AS rnk
  FROM scored2
)
SELECT query_id, doc_id, CAST(rnk AS INT) AS rnk, bm25_prf
FROM ranked2 WHERE rnk <= {BM25_TOP_K}
""",
)
def retrieval_rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio): run BM25, assume the top
    FB_DOCS hits are relevant, mine their FB_TERMS highest
    tf×idf terms NOT already in the query, append them, and re-rank —
    the classic recall-recovery loop of sparse retrieval (vocabulary
    mismatch: a query says "customer", the relevant docs also say
    "account"). Expansion-term weight = feedback term frequency ×
    corpus idf, ties to the lexicographically smaller token; the
    second-pass scoring is the SAME BM25 algebra over the expanded
    term set.

    Scale shape: the first pass is the shared BM25 plan (one corpus
    exchange on (doc_id, tok)); candidate mining touches only the
    |queries|×FB_DOCS feedback postings; the expanded query relation
    stays query-sized and broadcasts into the second scoring pass —
    the corpus is never rescanned beyond the shared term-count
    relation. df for expansion terms comes from the vocabulary-sized
    rollup, joined on tok (never collected)."""
    counts = _doc_term_counts(spark, sf_dir)
    ranked = _bm25_ranked(spark, sf_dir)
    fb = ranked.filter(F.col("rnk") <= FB_DOCS).select("query_id", "doc_id")
    qterms = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).cast("int").alias("query_id"),
                        F.lit(t).alias("tok"),
                    )
                    for qid, terms in BM25_QUERY_TERMS
                    for t in terms
                ]
            )
        ).alias("q")
    ).select("q.query_id", "q.tok")
    dfall = counts.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    stats = counts.agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
        F.sum("c").cast("bigint").alias("total_toks"),
    )
    cand = (
        fb.join(counts, "doc_id")
        .join(F.broadcast(qterms), ["query_id", "tok"], "left_anti")
        .groupBy("query_id", "tok")
        .agg(F.sum("c").cast("bigint").alias("fb_tf"))
    )
    idf_of = lambda df_col: F.log(  # noqa: E731
        (F.col("n_docs") - df_col + 0.5) / (df_col + 0.5) + 1
    )
    wght = (
        cand.join(dfall, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "tok", (F.col("fb_tf") * idf_of(F.col("df"))).alias("w")
        )
    )
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("w"), F.asc("tok"))
    )
    pick = (
        wght.withColumn("rn", rn)
        .filter(F.col("rn") <= FB_TERMS)
        .select("query_id", "tok")
    )
    q2 = qterms.unionAll(pick)
    df2 = (
        counts.join(F.broadcast(q2.select("tok").distinct()), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    dl = F.sum("c").over(W.partitionBy("doc_id")).cast("bigint")
    with_dl = counts.withColumn("dl", dl)
    avgdl = F.col("total_toks").cast("double") / F.col("n_docs")
    tf_norm = (F.col("c") * (BM25_K1 + 1)) / (
        F.col("c") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
    )
    scored2 = (
        with_dl.join(F.broadcast(q2), "tok")
        .join(F.broadcast(df2), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf_of(F.col("df")) * tf_norm), 6).alias("bm25_prf"))
    )
    rnk2 = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("bm25_prf"), F.asc("doc_id"))
    )
    return (
        scored2.withColumn("rnk", rnk2.cast("int"))
        .filter(F.col("rnk") <= BM25_TOP_K)
        .select("query_id", "doc_id", "rnk", "bm25_prf")
    )


# ---------------------------------------------------------------------------
# nDCG@k ranking-quality evaluation of the BM25 retrieval lane
# ---------------------------------------------------------------------------


@query(
    "retrieval_ndcg_eval",
    oracle=f"""
WITH {_BM25_CTES},
rel AS (
  SELECT q.query_id, c.doc_id, CAST(COUNT(DISTINCT c.tok) AS BIGINT) AS rel
  FROM c JOIN q USING (tok) GROUP BY 1, 2
),
dcg AS (
  SELECT r.query_id,
         SUM(CAST(rel.rel AS DOUBLE) / ln(r.rnk + 1.0)) AS dcg
  FROM ranked r
  JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
  WHERE r.rnk <= {BM25_TOP_K}
  GROUP BY 1
),
ideal AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS rk
  FROM rel
),
idcg AS (
  SELECT query_id, SUM(CAST(rel AS DOUBLE) / ln(rk + 1.0)) AS idcg
  FROM ideal WHERE rk <= {BM25_TOP_K} GROUP BY 1
),
nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_docs FROM rel GROUP BY 1)
SELECT d.query_id, n.n_rel_docs,
       round(d.dcg / i.idcg, 6) + 0.0 AS ndcg
FROM dcg d JOIN idcg i USING (query_id) JOIN nrel n USING (query_id)
""",
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@k of the BM25 ranking against a term-coverage relevance
    truth (rel = number of distinct query terms a document contains) —
    the ranking-quality metric that closes the retrieval lane's eval
    loop the way ann_recall_at_k closes ANN's: BM25's score order is
    certified by its own oracle; THIS certifies how well that order
    agrees with an independent graded-relevance ideal. Uses ln for the
    position discount — nDCG is a DCG/IDCG ratio, so the log base
    cancels and the standard log2 definition is preserved exactly.

    Determinism: relevance grades are exact distinct-term counts; DCG
    and IDCG are ≤k-term sums of one-division doubles with identical
    term order (rank order) in both engines, absorbed by round(6).
    Scale shape: rides the shared (doc_id, tok) count relation — one
    corpus shuffle; relevance and the ideal ranking live on the
    docs-matching-any-term subset, ranked per query by
    WindowGroupLimit."""
    from etl_pipeline_sam_gov_spark.registry import QUERIES as _Q

    ranked = _Q["text_bm25_retrieval"](spark, sf_dir)
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERY_TERMS for t in terms],
        "query_id int, tok string",
    )
    rel = (
        _doc_term_counts(spark, sf_dir)
        .join(F.broadcast(q), "tok")
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("tok").cast("bigint").alias("rel"))
    )
    dcg = (
        ranked.filter(F.col("rnk") <= BM25_TOP_K)
        .join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.sum(
                F.col("rel").cast("double") / F.log(F.col("rnk") + 1.0)
            ).alias("dcg")
        )
    )
    ideal = rel.select(
        "query_id",
        "rel",
        F.row_number()
        .over(W.partitionBy("query_id").orderBy(F.desc("rel"), "doc_id"))
        .alias("rk"),
    )
    idcg = (
        ideal.filter(F.col("rk") <= BM25_TOP_K)
        .groupBy("query_id")
        .agg(
            F.sum(
                F.col("rel").cast("double") / F.log(F.col("rk") + 1.0)
            ).alias("idcg")
        )
    )
    nrel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel_docs")
    )
    return (
        dcg.join(idcg, "query_id")
        .join(nrel, "query_id")
        .select(
            "query_id",
            "n_rel_docs",
            (F.round(F.col("dcg") / F.col("idcg"), 6) + F.lit(0.0)).alias(
                "ndcg"
            ),
        )
    )


# ---------------------------------------------------------------------------
# MRR — mean reciprocal rank of the BM25 ranking
# ---------------------------------------------------------------------------

MRR_REL_MIN = 2  #: binary relevance: doc contains ≥2 distinct query terms


def _mrr_oracle() -> str:
    return f"""
WITH {_BM25_CTES},
rel AS (
  SELECT q.query_id, c.doc_id
  FROM c JOIN q USING (tok)
  GROUP BY 1, 2 HAVING COUNT(DISTINCT c.tok) >= {MRR_REL_MIN}
),
firsts AS (
  SELECT r.query_id,
         CAST(COALESCE(MIN(CASE WHEN rel.doc_id IS NOT NULL
                        THEN r.rnk END), 0) AS BIGINT) AS first_rel_rank
  FROM ranked r
  LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
  WHERE r.rnk <= {BM25_TOP_K}
  GROUP BY r.query_id
),
rr AS (
  SELECT query_id, first_rel_rank,
         CASE WHEN first_rel_rank = 0 THEN 0.0
              ELSE 1.0 / first_rel_rank END AS reciprocal_rank
  FROM firsts
),
m AS (SELECT SUM(reciprocal_rank) / COUNT(*) AS mrr FROM rr)
SELECT r.query_id, r.first_rel_rank,
       round(r.reciprocal_rank, 6) AS reciprocal_rank,
       round(m.mrr, 6) + 0.0 AS mrr
FROM rr r CROSS JOIN m
"""


@query("retrieval_mrr_eval", oracle=_mrr_oracle())
def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the BM25 ranking against binary
    relevance (doc covers ≥2 distinct query terms) — the third leg of
    the IR-metric triad here (nDCG = graded ranking quality, recall@k
    = coverage, MRR = "how fast does the FIRST good answer appear", the
    metric that matters for question-answering and lookup UIs). A
    query with no relevant doc in the top-k contributes 0, emitted as
    first_rel_rank = 0 rather than NULL (the all-NULL-gate
    convention).

    Exactness: ranks are the certified BM25 order; reciprocal ranks
    are exact small-denominator rationals; the Q-query mean is the
    small-relation double convention. Scale: rides the shared
    (doc, tok) exchange like every retrieval query."""
    from etl_pipeline_sam_gov_spark.registry import QUERIES as _Q

    ranked = _Q["text_bm25_retrieval"](spark, sf_dir)
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERY_TERMS for t in terms],
        "query_id int, tok string",
    )
    rel = (
        _doc_term_counts(spark, sf_dir)
        .join(F.broadcast(q), "tok")
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("tok").alias("nt"))
        .filter(F.col("nt") >= MRR_REL_MIN)
        .select("query_id", "doc_id")
    )
    firsts = (
        ranked.filter(F.col("rnk") <= BM25_TOP_K)
        .join(
            rel.withColumn("is_rel", F.lit(1)),
            ["query_id", "doc_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("is_rel") == 1, F.col("rnk"))), F.lit(0)
            )
            .cast("bigint")
            .alias("first_rel_rank")
        )
    )
    rr = firsts.select(
        "query_id",
        "first_rel_rank",
        F.when(F.col("first_rel_rank") == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) / F.col("first_rel_rank"))
        .alias("reciprocal_rank"),
    )
    m = rr.agg(
        (F.sum("reciprocal_rank") / F.count(F.lit(1))).alias("mrr")
    )
    return rr.crossJoin(F.broadcast(m)).select(
        "query_id",
        "first_rel_rank",
        F.round("reciprocal_rank", 6).alias("reciprocal_rank"),
        (F.round("mrr", 6) + F.lit(0.0)).alias("mrr"),
    )
