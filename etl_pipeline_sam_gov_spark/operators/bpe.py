"""Byte-pair-encoding vocabulary induction over the corpus word
distribution (SURVEY.md §2.12 extensions) — the tokenizer-training
kernel (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units"): repeatedly count adjacent symbol pairs weighted
by word frequency, merge the most frequent pair, repeat.

Scale shape: the corpus is touched ONCE (token explode → word counts,
a partial-combined aggregation); every merge round then operates on
the VOCABULARY-sized (word, count, symbols) relation — orders of
magnitude smaller than the corpus, which is exactly why production BPE
trainers work from the word-count table. Each round is:

- pair counts: one zip_with over the symbol arrays + a groupBy on the
  pair (vocabulary-sized shuffle);
- top pair: a 1-row aggregation kept as a LAZY broadcast cross join —
  never a driver collect;
- merge application: a leftmost-greedy sequential fold per word
  (higher-order ``aggregate``), zero shuffle.

Rounds chain lazily with a per-round persist of the tiny vocabulary
relation (the PageRank plan-growth discipline). Everything is integer
arithmetic — the oracle match is exact, no float rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.operators.dedup import spread_docs, tokens_col
from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables

BPE_ROUNDS = 3

#: session id → persisted per-round vocabulary relations of the latest
#: invocation (bounded one-slot cache, same discipline as graph./
#: curation. caches).
_VOCAB_CACHE: dict[int, tuple[DataFrame, ...]] = {}


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct(a,b)> of adjacent symbol pairs (empty for len<2).

    zip_with over two slices rather than explode(sequence(...)):
    ``sequence(1, 0)`` is a DESCENDING two-element array in Spark, so
    the sequence idiom silently fabricates pairs for 1-symbol words."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def _apply_merge(syms: Column, a: Column, b: Column) -> Column:
    """Leftmost-greedy non-overlapping replacement of adjacent (a, b)
    with the merged symbol a||b — standard BPE merge semantics
    ('aaa' under (a,a) → ['aa','a']). A sequential fold carrying
    (out, prev): a hit flushes the merged token and clears prev; a miss
    flushes prev and carries the current symbol."""
    init = F.struct(
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc: Column, x: Column) -> Column:
        hit = acc["prev"].isNotNull() & (acc["prev"] == a) & (x == b)
        flushed = F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.concat(a, b))))
            .otherwise(flushed)
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(x).alias("prev"),
        )

    def fin(acc: Column) -> Column:
        return F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, fin)


def _oracle() -> str:
    """Unrolled BPE_ROUNDS-round BPE as chained CTEs. The merge
    application is expressed positionally (candidate positions →
    gaps-and-islands runs → even-offset-within-run wins), which is the
    same leftmost-greedy rule as the engine's sequential fold."""
    head = r"""
WITH tok AS (
  SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
),
w AS (SELECT word, COUNT(*) AS wc FROM tok GROUP BY word),
syms0 AS (SELECT word, wc, regexp_extract_all(word, '.') AS s FROM w)"""
    parts = []
    for r in range(1, BPE_ROUNDS + 1):
        p = r - 1
        parts.append(f""",
pairs{r} AS (
  SELECT s[i] AS a, s[i+1] AS b, SUM(wc) AS cnt
  FROM syms{p}, unnest(range(1, len(s))) AS u(i)
  GROUP BY s[i], s[i+1]
),
top{r} AS (
  SELECT a, b, CAST(cnt AS BIGINT) AS cnt
  FROM pairs{r} ORDER BY cnt DESC, a, b LIMIT 1
),
pos{r} AS (
  SELECT word, wc, s, CAST(i AS BIGINT) AS i,
         (s[i] = t.a AND s[i+1] = t.b) AS c
  FROM syms{p}, unnest(range(1, len(s) + 1)) AS u(i)
  CROSS JOIN top{r} t
),
isl{r} AS (
  SELECT word, i,
         i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
  FROM pos{r} WHERE c AND i < len(s)
),
mp{r} AS (
  SELECT word, i
  FROM (SELECT word, i,
               (i - MIN(i) OVER (PARTITION BY word, grp)) % 2 AS off
        FROM isl{r})
  WHERE off = 0
),
syms{r} AS (
  SELECT p.word, ANY_VALUE(p.wc) AS wc,
         list(CASE WHEN h.i IS NOT NULL THEN p.s[p.i] || p.s[p.i+1]
                   ELSE p.s[p.i] END ORDER BY p.i) AS s
  FROM pos{r} p
  LEFT JOIN mp{r} h ON h.word = p.word AND h.i = p.i
  LEFT JOIN mp{r} g ON g.word = p.word AND g.i = p.i - 1
  WHERE g.i IS NULL
  GROUP BY p.word
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, a AS left_sym, b AS right_sym, a || b AS merged, cnt FROM top{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return head + "".join(parts) + "\n" + sel


@query("text_bpe_merge_rounds", oracle=_oracle())
def text_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE_ROUNDS byte-pair merges learned from the corpus:
    (round, left, right, merged, weighted pair count). See module
    docstring for the scale argument; ties break lexicographically on
    the pair so both engines learn the identical vocabulary."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = (
        spread_docs(docs)
        .select(F.explode(tokens_col()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    slot = id(spark)
    prev = _VOCAB_CACHE.pop(slot, None)
    if prev is not None:
        for df in prev:
            df.unpersist()
    cached: list[DataFrame] = []
    vocab = words.select(
        "word", "wc", F.expr("regexp_extract_all(word, '.', 0)").alias("s")
    ).persist()
    cached.append(vocab)
    tops = []
    for r in range(1, BPE_ROUNDS + 1):
        prs = (
            vocab.select("wc", F.explode(_adjacent_pairs(F.col("s"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wc").alias("cnt"))
        )
        # max count, ties → lexicographically smallest (a, b); the
        # negated count makes one struct-min express the whole rule
        top = (
            prs.agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"), F.col("a"), F.col("b")
                    )
                ).alias("t")
            )
            .select(
                F.col("t.a").alias("a"),
                F.col("t.b").alias("b"),
                (-F.col("t.nc")).alias("cnt"),
            )
        )
        tops.append(
            top.select(
                F.lit(r).cast("int").alias("round"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.concat("a", "b").alias("merged"),
                "cnt",
            )
        )
        if r < BPE_ROUNDS:
            vocab = (
                vocab.crossJoin(F.broadcast(top))
                .select(
                    "word",
                    "wc",
                    _apply_merge(F.col("s"), F.col("a"), F.col("b")).alias("s"),
                )
                .persist()
            )
            cached.append(vocab)
    _VOCAB_CACHE[slot] = tuple(cached)
    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return out
