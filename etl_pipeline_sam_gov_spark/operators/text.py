"""Text analysis over ``documents`` (SURVEY.md §2.12): token statistics,
quality scoring, n-gram-heuristic language ID, and document
fingerprinting — the filter/score stages of an LLM training-data
pipeline, generalizing the reference's string predicates (P1/F7).

Everything is built-in expression work (split / higher-order array
functions / regex); per-doc cost is O(tokens) and the whole stage is a
single narrow map over the corpus — no shuffle at all until an
aggregation asks for one. That property (filter-score-annotate as a
pure map) is what lets these run inline in a 100 TB ingest scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.operators.dedup import (
    _SQL_SHINGLES,
    _spark_hash60,
    _sql_hash60,
    doc_shingles,
    spread_docs,
    tokens_col,
)
from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables

STOPWORDS_EN = ["the", "a", "of", "to", "and", "in", "is"]

#: Tiny per-language stopword profiles for the n-gram language-ID
#: heuristic (deterministic tie-break: list order below).
LANG_PROFILES = [
    ("en", ["the", "and", "of", "to", "a"]),
    ("es", ["el", "la", "de", "que", "los"]),
    ("fr", ["le", "la", "et", "les", "des"]),
    ("de", ["der", "die", "und", "das", "ein"]),
]


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "text_token_stats",
    oracle=r"""
WITH toks AS (SELECT doc_id, n_chars, string_split_regex(text, '\s+') AS t FROM documents)
SELECT doc_id,
       n_chars,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct_tokens,
       round(len(list_distinct(t))::DOUBLE / len(t), 6) AS type_token_ratio,
       round(list_aggregate(list_transform(t, x -> len(x)::DOUBLE), 'sum') / len(t), 6) AS avg_token_len
FROM toks
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical-diversity stats (whitespace tokenizer;
    a BPE-ish regex tokenizer is exercised in text_quality_score)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # tokenize ONCE into a materialized column — inline split would be
    # re-evaluated per referencing expression (see dedup.shingles_from_tokens)
    docs = docs.select("doc_id", "n_chars", tokens_col().alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        "n_chars",
        # bigint: DuckDB len() is BIGINT, Spark size() INT; the driver's
        # value-hash is typed.
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(t)).cast("double") / n, 6).alias(
            "type_token_ratio"
        ),
        F.round(total_len / n, 6).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle=rf"""
WITH toks AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS t FROM documents),
feat AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         round(len(list_filter(t, x -> list_contains({_sql_list(STOPWORDS_EN)}, x)))::DOUBLE
               / len(t), 6) AS stopword_ratio,
         round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
               / length(text), 6) AS digit_ratio,
         len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_words
  FROM toks
)
SELECT doc_id, n_tokens, stopword_ratio, digit_ratio, n_alpha_words,
       CASE WHEN n_tokens >= 30 AND stopword_ratio >= 0.02 THEN 'high'
            WHEN n_tokens >= 15 THEN 'medium'
            ELSE 'low' END AS quality_band
FROM feat
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, stopword ratio, digit ratio, regex
    word count, banded score (the reference's banded-CASE kernel F9
    applied to corpus filtering)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs = docs.select("doc_id", "text", tokens_col().alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    stopword_ratio = F.round(
        F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x))).cast("double") / n,
        6,
    )
    digit_ratio = F.round(
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
        ).cast("double")
        / F.length("text"),
        6,
    )
    n_alpha = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0)))
    feat = docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        stopword_ratio.alias("stopword_ratio"),
        digit_ratio.alias("digit_ratio"),
        n_alpha.cast("bigint").alias("n_alpha_words"),
    )
    band = (
        F.when(
            (F.col("n_tokens") >= 30) & (F.col("stopword_ratio") >= 0.02), "high"
        )
        .when(F.col("n_tokens") >= 15, "medium")
        .otherwise("low")
    )
    return feat.withColumn("quality_band", band)


def _langid_sql() -> str:
    hits = ",\n         ".join(
        f"len(list_filter(t, x -> list_contains({_sql_list(words)}, x))) AS hits_{lang}"
        for lang, words in LANG_PROFILES
    )
    # argmax with deterministic tie-break = profile order
    best = "CASE "
    for lang, _ in LANG_PROFILES:
        others = [
            f"hits_{lang} >= hits_{o}" for o, _ in LANG_PROFILES if o != lang
        ]
        best += f"WHEN {' AND '.join(others)} THEN '{lang}' "
    best += "ELSE 'und' END"
    return rf"""
WITH toks AS (SELECT doc_id, lang, string_split_regex(text, '\s+') AS t FROM documents),
h AS (
  SELECT doc_id, lang AS labeled_lang,
         {hits}
  FROM toks
)
SELECT doc_id, labeled_lang,
       CASE WHEN greatest(hits_en, hits_es, hits_fr, hits_de) = 0 THEN 'und'
            ELSE {best} END AS predicted_lang,
       hits_en, hits_es, hits_fr, hits_de
FROM h
"""


@query("text_langid", oracle=_langid_sql())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-profile voting (n-gram heuristic with
    1-gram profiles). Real pipelines plug a fastText-style model in as
    a pandas_udf at exactly this seam — the surrounding plan (pure map,
    argmax, no shuffle) is identical."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs = docs.select("doc_id", "lang", tokens_col().alias("_toks"))
    t = F.col("_toks")

    def hit_counter(words: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        # single-arg closure: a default-arg lambda would be mistaken for
        # PySpark's two-arg (element, index) lambda form
        return F.size(F.filter(t, lambda x: F.array_contains(arr, x))).cast("bigint")

    sel = [F.col("doc_id"), F.col("lang").alias("labeled_lang")]
    for lang, words in LANG_PROFILES:
        sel.append(hit_counter(words).alias(f"hits_{lang}"))
    h = docs.select(*sel)
    best = None
    for lang, _ in LANG_PROFILES:
        cond = None
        for other, _ in LANG_PROFILES:
            if other == lang:
                continue
            c = F.col(f"hits_{lang}") >= F.col(f"hits_{other}")
            cond = c if cond is None else (cond & c)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    best = best.otherwise("und")
    any_hit = F.greatest(*[F.col(f"hits_{lang}") for lang, _ in LANG_PROFILES]) > 0
    return h.select(
        "doc_id",
        "labeled_lang",
        F.when(any_hit, best).otherwise("und").alias("predicted_lang"),
        *[F.col(f"hits_{lang}") for lang, _ in LANG_PROFILES],
    )


@query(
    "pipeline_corpus_curation",
    oracle=rf"""
WITH toks AS (SELECT doc_id, text, lang, string_split_regex(text, '\s+') AS t FROM documents),
feat AS (
  SELECT doc_id, text, lang,
         len(t) AS n_tokens,
         round(len(list_filter(t, x -> list_contains({_sql_list(STOPWORDS_EN)}, x)))::DOUBLE
               / len(t), 6) AS stopword_ratio
  FROM toks
),
canonical AS (
  SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)
)
SELECT f.doc_id, f.lang, f.n_tokens
FROM feat f
JOIN canonical c ON md5(f.text) = c.h AND f.doc_id = c.keep_id
WHERE f.n_tokens >= 15 AND f.stopword_ratio >= 0.01
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-data capstone composite: quality filter (token count +
    stopword ratio) ∘ exact dedup (keep the min-doc_id canonical copy
    per content hash) — the minimal real curation pipeline, expressed
    as one lazy plan. At 100 TB: the quality features are a pure map
    (no shuffle), dedup is one hash-groupBy, and the canonical join is
    a broadcast when the duplicate-cluster table is small — the plan
    here shows exactly that shape."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tokd = docs.select("doc_id", "text", "lang", tokens_col().alias("_toks"))
    t = F.col("_toks")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    feat = tokd.select(
        "doc_id",
        "text",
        "lang",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x))).cast("double")
            / F.size(t),
            6,
        ).alias("stopword_ratio"),
    )
    canonical = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    return (
        feat.filter((F.col("n_tokens") >= 15) & (F.col("stopword_ratio") >= 0.01))
        .join(
            canonical,
            (F.md5("text") == F.col("h")) & (F.col("doc_id") == F.col("keep_id")),
        )
        .select("doc_id", "lang", "n_tokens")
    )


WINNOW_K = 3  # k-gram length for the rolling hashes
WINNOW_W = 4  # winnowing window: one fingerprint per w consecutive hashes


_SQL_WINNOW_FPS = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
         {_sql_hash60("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")} AS h
  FROM (SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - {WINNOW_K - 2}, 1))) AS i
        FROM toks)
),
winnowed AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW
                      AND {WINNOW_W - 1} FOLLOWING) AS fp
  FROM grams
)
SELECT DISTINCT doc_id, fp FROM winnowed
"""


@query("text_winnowing_fingerprint", oracle=_SQL_WINNOW_FPS)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash
    every positional k-gram (a rolling hash over the token stream),
    then keep the minimum of each w-hash window — guaranteeing any
    shared substring of ≥ w+k-1 tokens contributes at least one common
    fingerprint, at ~1/w the storage of full shingling.

    Positional k-grams come from the SAME materialized-token-array
    discipline as the dedup shinglers (inline splits re-evaluate —
    dedup.shingles_from_tokens); the windowed MIN partitions by doc, so
    the only exchange keys on doc_id and in a corpus-partitioned store
    it vanishes entirely. Fingerprints are 60-bit md5-derived ints —
    engine-neutral, like every hash in the dedup family."""
    from pyspark.sql import Window as W

    from etl_pipeline_sam_gov_spark.operators.dedup import (
        _spark_hash60,
        spread_docs,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tokd = spread_docs(docs).select("doc_id", tokens_col().alias("_toks"))
    t = F.col("_toks")

    def gram(i: Column) -> Column:
        parts: list[Column] = []
        for j in range(WINNOW_K):
            if j:
                parts.append(F.lit(" "))
            parts.append(F.element_at(t, i + j))
        return F.concat(*parts)

    grams = tokd.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size(t) >= WINNOW_K,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (WINNOW_K - 1)), gram
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "g"),
    ).select("doc_id", "pos0", _spark_hash60(F.col("g")).alias("h"))
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos0")
        .rowsBetween(W.currentRow, WINNOW_W - 1)
    )
    return (
        grams.select("doc_id", F.min("h").over(w).alias("fp"))
        .distinct()
    )


#: GPT-2-style pretokenizer shape: letter runs, digit runs with optional
#: leading space, punctuation runs. Alternatives have disjoint leading
#: character classes, so Java regex (Spark, leftmost-first alternation)
#: and RE2 (DuckDB, leftmost-longest) produce identical token streams.
BPE_REGEX = r"[a-zA-Z]+| ?[0-9]+|[^a-zA-Z0-9\s]+"


@query(
    "text_bpe_regex_tokens",
    oracle=rf"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{BPE_REGEX}')) AS n_bpe_tokens,
         len(string_split_regex(text, '\s+')) AS n_ws_tokens
  FROM documents
)
SELECT doc_id, n_bpe_tokens, n_ws_tokens,
       round(n_bpe_tokens::DOUBLE / n_ws_tokens, 6) AS bpe_per_word
FROM t
""",
)
def text_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pretokenizer regex alongside the
    whitespace count (text_token_stats) — the tokens-per-word ratio is
    the standard proxy for tokenizer efficiency / text nativeness when
    budgeting training corpora. Pure narrow map; zero shuffle."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), F.lit(0)))
    n_ws = F.size(tokens_col())
    return docs.select(
        "doc_id",
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        n_ws.cast("bigint").alias("n_ws_tokens"),
        F.round(n_bpe.cast("double") / n_ws, 6).alias("bpe_per_word"),
    )


# --- PII redaction ---------------------------------------------------------
#
# The cleaning pass every public-web training corpus runs before anything
# else. Patterns are written in the Java∩RE2 common dialect (no
# lookaround, no backrefs) so Spark and the DuckDB oracle execute the
# SAME regex semantics. The fixture text carries no PII, so the query
# plants deterministic doc_id-derived emails/phones/URLs first — the
# oracle re-derives them independently, making the hash match a true
# cross-engine check of the redaction regexes themselves.

PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_PHONE = r"\+?[0-9][0-9-]{6,}[0-9]"


@query(
    "text_redact_pii",
    oracle=rf"""
WITH synth AS (
  SELECT doc_id,
         'contact user' || doc_id || '@mail.example.com or +1-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         ' via https://example.org/u/' || doc_id ||
         CASE WHEN doc_id % 2 = 0
              THEN ' backup user' || doc_id || '.alt@example.net'
              ELSE '' END ||
         ' ' || text AS raw
  FROM documents
),
red AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '{PII_URL}', '<URL>', 'g'),
             '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM synth
)
SELECT doc_id, redacted,
       CAST((len(redacted) - len(replace(redacted, '<EMAIL>', ''))) // 7
            AS BIGINT) AS n_emails,
       CAST((len(redacted) - len(replace(redacted, '<PHONE>', ''))) // 7
            AS BIGINT) AS n_phones,
       CAST((len(redacted) - len(replace(redacted, '<URL>', ''))) // 5
            AS BIGINT) AS n_urls
FROM red
""",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: URL → email → phone regexp_replace chain (URL
    first so its path can't be half-eaten by the email pattern), plus
    per-kind redaction counts derived from the marker occurrences.
    Pure narrow map over the scan — the 100 TB shape is a zero-shuffle
    cleaning stage fused into ingest."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    did = F.col("doc_id").cast("string")
    raw = F.concat(
        F.lit("contact user"), did, F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" via https://example.org/u/"), did,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" backup user"), did, F.lit(".alt@example.net")),
        ).otherwise(F.lit("")),
        F.lit(" "), F.col("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, PII_URL, "<URL>"), PII_EMAIL, "<EMAIL>"
        ),
        PII_PHONE,
        "<PHONE>",
    )

    def marker_count(marker: str) -> Column:
        return (
            (F.length("redacted") - F.length(F.replace(F.col("redacted"), F.lit(marker))))
            / len(marker)
        ).cast("bigint")

    return docs.select("doc_id", redacted.alias("redacted")).select(
        "doc_id",
        "redacted",
        marker_count("<EMAIL>").alias("n_emails"),
        marker_count("<PHONE>").alias("n_phones"),
        marker_count("<URL>").alias("n_urls"),
    )


@query(
    "text_top_bigrams",
    oracle=r"""
WITH toks AS (SELECT string_split_regex(text, '\s+') AS t FROM documents),
idx AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
b AS (SELECT t[i] || ' ' || t[i + 1] AS bigram FROM idx)
SELECT bigram, COUNT(*) AS n
FROM b
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide n-gram statistics (the contamination-check /
    boilerplate-detection primitive): explode adjacent token pairs,
    count, keep the global top 20 (deterministic count-then-bigram
    order). Plan shape: one shuffle with map-side partial counts, then
    TakeOrderedAndProject — no global sort of the bigram space ever
    materializes, which is what keeps a 100 TB vocabulary countable."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = tokens_col()
    pairs = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# --- eval-set decontamination ---------------------------------------------

EVAL_EVERY = 97  # doc_id % 97 == 0 → the held-out "benchmark" docs


@query(
    "text_decontaminate_eval_overlap",
    oracle=f"""
WITH {_SQL_SHINGLES.strip()},
eval AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_EVERY} = 0),
hits AS (
  SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_overlap
  FROM sh s JOIN eval e USING (shingle)
  WHERE s.doc_id % {EVAL_EVERY} <> 0
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       COALESCE(h.n_overlap, 0) > 0 AS contaminated
FROM documents d
LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {EVAL_EVERY} <> 0
""",
)
def text_decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the containment check every training
    corpus runs against its eval sets: flag any training doc sharing a
    3-gram shingle with a held-out doc. NOT pairwise similarity
    (dedup_ngram_jaccard): the eval shingle set is a fixed small
    relation, so the plan is corpus-shingles ⋈ broadcast(eval-shingles)
    → per-doc overlap count — one pass over the corpus, no candidate
    pairs, cost O(corpus shingles) at any corpus size. In production
    the eval set is the actual benchmark suite — a few MB from its own
    small source, where a pinned broadcast hint is safe. Here it is
    carved out of `documents` itself (the doc_id % 97 slice), which
    *scales with the corpus*, so the hint is deliberately NOT pinned:
    the broadcast-threshold/AQE decision broadcasts it while it is
    small and degrades to a shuffle join if it ever is not
    (tests/test_plans.py::test_no_pinned_broadcast_of_scale_tables)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # Overlap needs shingle IDENTITY only, so every shingle-keyed hop
    # (the eval-set distinct, the join, the per-doc distinct count)
    # rides the 60-bit md5-derived key — 8-byte bigint shuffle rows,
    # not raw n-gram text (the text_boilerplate_removal discipline).
    sh = doc_shingles(docs).select(
        "doc_id", _spark_hash60(F.col("shingle")).alias("sh")
    )
    is_eval = F.col("doc_id") % EVAL_EVERY == 0
    eval_shingles = sh.filter(is_eval).select("sh").distinct()
    hits = (
        sh.filter(~is_eval)
        .join(eval_shingles, "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_overlap"))
    )
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


@query(
    "text_token_entropy",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents
),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_distinct,
       round(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 6) AS token_entropy
FROM c
GROUP BY doc_id
""",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each doc's token distribution — the
    gibberish/boilerplate signal quality filters threshold on (low
    entropy ⇒ repeated tokens; high ⇒ diverse text). Uses the one-pass
    identity H = ln(n) − Σc·ln(c)/n so the plan is explode → one
    partial-combined count → one per-doc aggregate, no per-token
    probability materialization. round(6) absorbs cross-engine libm
    last-ulp differences (the repo-wide transcendental convention)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    counts = (
        docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    return counts.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(n.cast("double")) - F.sum(F.col("c") * F.log("c")) / n, 6
        ).alias("token_entropy"),
    )


@query(
    "text_repetition_quality",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS tok,
         generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
  FROM documents
),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
freq AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         MAX(c) AS top_count,
         SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_single
  FROM c GROUP BY doc_id
),
isl AS (
  SELECT doc_id, tok,
         pos - row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS g
  FROM tok
),
runs AS (SELECT doc_id, COUNT(*) AS run FROM isl GROUP BY doc_id, tok, g),
mr AS (SELECT doc_id, CAST(MAX(run) AS INT) AS max_repeat_run FROM runs GROUP BY doc_id)
SELECT f.doc_id,
       f.n_tokens,
       m.max_repeat_run,
       round(f.top_count::DOUBLE / f.n_tokens, 6) AS top_token_frac,
       round((f.n_tokens - f.n_single)::DOUBLE / f.n_tokens, 6) AS dup_token_frac,
       (f.top_count::DOUBLE / f.n_tokens <= 0.11 AND m.max_repeat_run <= 3) AS keep
FROM freq f JOIN mr m USING (doc_id)
""",
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1):
    most-frequent-token fraction, duplicated-token fraction, and the
    longest run of the SAME token repeated consecutively — the
    boilerplate/stutter signals LLM corpus filters threshold on.

    Scale shape: everything is computed inside per-row higher-order
    array expressions (``transform`` adjacency flags folded by
    ``aggregate`` with a struct accumulator), so the whole filter is a
    zero-shuffle narrow map over the corpus scan — token counts come
    from one pass over the SORTED token array (a run of equal adjacent
    sorted elements IS a token's count), not an explode→groupBy. The
    oracle derives the identical quantities relationally (explode +
    gaps-and-islands), so the array-fold arithmetic is cross-checked
    against a completely different formulation.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs = docs.select("doc_id", tokens_col().alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)

    def adjacency(arr: Column) -> Column:
        # flag[i] = 1 iff arr[i] == arr[i-1] (flag[0] = 0); F.get is 0-based.
        return F.transform(
            arr,
            lambda x, i: F.when(i == F.lit(0), F.lit(0)).otherwise(
                (x == F.get(arr, i - 1)).cast("int")
            ),
        )

    def run_fold(flags: Column, finish) -> Column:
        # Fold adjacency flags into (current run, max run, finished
        # singleton count). No let-binding inside lambdas, so the
        # "next run" expression is inlined where referenced twice.
        return F.aggregate(
            flags,
            F.struct(
                F.lit(0).alias("run"),
                F.lit(0).alias("maxc"),
                F.lit(0).alias("single"),
            ),
            lambda acc, x: F.struct(
                F.when(x == 1, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    acc["maxc"],
                    F.when(x == 1, acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("maxc"),
                F.when(
                    (x == 0) & (acc["run"] == 1), acc["single"] + 1
                ).otherwise(acc["single"]).alias("single"),
            ),
            finish,
        )

    # Runs over the ORIGINAL order → longest consecutive repetition.
    max_run = run_fold(adjacency(t), lambda acc: acc["maxc"])
    # Runs over the SORTED array → per-token counts without a shuffle:
    # max run = top token count; singleton runs = tokens appearing once.
    sorted_stats = run_fold(
        adjacency(F.array_sort(t)),
        lambda acc: F.struct(
            acc["maxc"].alias("top"),
            (
                acc["single"] + F.when(acc["run"] == 1, 1).otherwise(0)
            ).alias("single"),
        ),
    )
    out = docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        max_run.alias("max_repeat_run"),
        sorted_stats.alias("_s"),
    )
    top = F.col("_s.top").cast("double")
    single = F.col("_s.single")
    nn = F.col("n_tokens")
    return out.select(
        "doc_id",
        "n_tokens",
        "max_repeat_run",
        F.round(top / nn, 6).alias("top_token_frac"),
        F.round((nn - single).cast("double") / nn, 6).alias("dup_token_frac"),
        ((top / nn <= 0.11) & (F.col("max_repeat_run") <= 3)).alias("keep"),
    )


@query(
    "text_tfidf_keywords",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents
),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
n AS (SELECT doc_id, SUM(c) AS n FROM c GROUP BY doc_id),
df AS (SELECT tok, COUNT(*) AS df FROM c GROUP BY tok),
total AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT c.doc_id, c.tok,
         round((c.c::DOUBLE / n.n)
               * ln((total.n_docs + 1)::DOUBLE / (df.df + 1)), 6) AS tfidf
  FROM c JOIN n USING (doc_id) JOIN df USING (tok) CROSS JOIN total
),
ranked AS (
  SELECT doc_id, tok, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS INT) AS rnk, tok, tfidf
FROM ranked WHERE rnk <= 3
""",
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document — the classic relevance
    ranking / keyword-extraction kernel of a corpus indexing stage.

    Scale shape: term counts are one explode → partial-combined
    groupBy; per-doc totals ride a window over the SAME (doc_id, tok)
    shuffle output (partitioned by a prefix of the grouping key, so no
    second exchange of the big relation); document frequency is an
    aggregate over the (much smaller) distinct (doc, term) relation and
    joins back keyed on term; the corpus-size scalar is a broadcast
    1-row cross join (never a collected literal — the plan stays fully
    lazy). Ranking orders by the ROUNDED score (the repo's libm
    convention) with the term as deterministic tie-break, so both
    engines pick identical keywords.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    counts = (
        docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # per-doc token total: window over the grouped relation — already
    # hash-partitioned by (doc_id, tok), and Spark reuses that exchange
    # for a window keyed on its prefix only when repartitioned; keep it
    # simple and let AQE coalesce (the relation is post-aggregation,
    # i.e. tiny relative to the corpus).
    n_doc = W.partitionBy("doc_id")
    df_term = counts.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        counts.withColumn("n", F.sum("c").over(n_doc))
        # UNHINTED (r7 broadcast audit): df is VOCABULARY-sized —
        # unbounded under Heaps' law — so a pinned broadcast caps the
        # operator at executor memory exactly when the corpus grows;
        # AQE broadcasts while small, shuffles on tok when not.
        .join(df_term, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "tok",
            F.round(
                (F.col("c").cast("double") / F.col("n"))
                * F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)),
                6,
            ).alias("tfidf"),
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    )
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tfidf")
    )


@query(
    "text_unigram_nll",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents
),
tf AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
corpus AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM tf)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(-SUM(ln((f.c + 1)::DOUBLE / (corpus.total + corpus.vocab)))
             / COUNT(*), 6) AS avg_nll
FROM tok t
JOIN tf f ON t.tok = f.tok
CROSS JOIN corpus
GROUP BY t.doc_id
""",
)
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under an add-one-
    smoothed unigram language model fit on the corpus itself — the
    perplexity-style fluency filter of CCNet-class pipelines (docs
    scoring far from the corpus distribution are boilerplate or
    gibberish). Self-scoring keeps it one job: term frequencies are
    one partial-combined count; the model (vocabulary-sized) broadcast-
    joins back onto the token stream; the corpus totals ride a 1-row
    broadcast cross join. Only ln() is transcendental — absorbed by
    the repo-wide round(6) convention (token_entropy precedent)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    tf = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    corpus = tf.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    return (
        # UNHINTED (r7 broadcast audit): the unigram model is
        # vocabulary-sized — AQE decides per the tfidf note.
        tok.join(tf, "tok")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.sum(
                    F.log(
                        (F.col("c") + 1).cast("double")
                        / (F.col("total") + F.col("vocab"))
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking (LLM context packing pre-step)
# ---------------------------------------------------------------------------

CHUNK_W = 32  #: window size in tokens
CHUNK_S = 24  #: stride in tokens (CHUNK_W - CHUNK_S = 8 tokens of overlap)


@query(
    "text_chunk_sliding",
    oracle=rf"""
WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
st AS (SELECT doc_id, t, unnest(range(1, len(t)+1, {CHUNK_S})) AS s FROM toks)
SELECT doc_id,
       ((s-1)//{CHUNK_S})::BIGINT AS chunk_idx,
       array_to_string(t[s:s+{CHUNK_W - 1}], ' ') AS chunk_text,
       least({CHUNK_W}, len(t)-s+1)::BIGINT AS chunk_tokens
FROM st
""",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking with overlap — the context-packing
    pre-step of an LLM training/RAG pipeline: each document becomes
    ceil(n/S) chunks of up to W tokens starting every S tokens, so
    consecutive chunks share W-S tokens of context.

    Scale shape: pure per-document narrow work — one tokenize
    projection, a ``sequence`` of chunk starts, ``posexplode``, and an
    O(W) ``slice`` per chunk. No shuffle anywhere; output rows carry
    only the chunk text (never the full token array), so the generate
    stage's width is bounded by W tokens regardless of document length.
    At 100 TB this runs inline in the ingest scan exactly like the
    text-quality maps (module docstring)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from etl_pipeline_sam_gov_spark.operators.dedup import spread_docs

    tokd = spread_docs(docs).select("doc_id", tokens_col().alias("_toks"))
    t = F.col("_toks")
    starts = F.sequence(F.lit(1), F.size(t), F.lit(CHUNK_S))
    return tokd.select(
        "doc_id", t, F.posexplode(starts).alias("chunk_idx", "s")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.concat_ws(" ", F.slice(t, F.col("s"), CHUNK_W)).alias("chunk_text"),
        F.least(F.lit(CHUNK_W), F.size(t) - F.col("s") + 1)
        .cast("bigint")
        .alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# Hashing-trick linear quality classifier
# ---------------------------------------------------------------------------

#: Feature-hash weight range: each token hashes to an integer weight in
#: [-CLS_RANGE, +CLS_RANGE] — a stand-in for a trained fastText-style
#: linear model's per-bucket weights (deterministic, engine-neutral).
CLS_RANGE = 1000
_CLS_MOD = 2 * CLS_RANGE + 1

#: DuckDB expression for the document logit (kept in lockstep with
#: quality_logit below; shared with the composed curation pipeline).
SQL_QUALITY_LOGIT = (
    "CAST(list_sum(list_transform(string_split_regex(text, '\\s+'), "
    f"t -> {_sql_hash60('t')} % {_CLS_MOD} - {CLS_RANGE})) AS BIGINT)"
)


def quality_logit() -> Column:
    """Integer document logit: fold of per-token hashed weights — the
    Spark twin of SQL_QUALITY_LOGIT."""
    from etl_pipeline_sam_gov_spark.operators.dedup import _spark_hash60

    weight = lambda t: _spark_hash60(t) % _CLS_MOD - CLS_RANGE  # noqa: E731
    return F.aggregate(
        F.transform(tokens_col(), weight),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


@query(
    "text_quality_classifier",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(string_split_regex(text, '\\s+')) AS n_tokens,
         {SQL_QUALITY_LOGIT} AS logit
  FROM documents
)
SELECT doc_id, lang, n_tokens, logit, (logit > 0) AS label
FROM scored
""",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear classifier over documents — the fastText /
    logistic-regression quality-filter shape every LLM data pipeline
    runs (e.g. CCNet's LM filter, GPT-3's WebText classifier): each
    token hashes into a weight bucket, the document's score is the sum
    of its bucket weights, and the keep/drop label is the score's sign.
    Weights here derive from md5 (a deterministic stand-in for trained
    parameters — swapping in a real model is a broadcast map lookup
    with the SAME plan shape).

    Scale shape: scoring is a pure narrow map — tokenize, transform
    each token to its weight, fold the sum with ``F.aggregate`` — all
    JVM-side higher-order expressions inside the scan stage. ZERO
    shuffles, no explode (the token array never leaves the row), no
    UDF; at 100 TB this runs inline in the ingest scan at I/O speed.
    The integer logit (not a sigmoid probability) keeps the contract
    exact across engines: sums of bounded ints are associative —
    identical bits under any partitioning; monotone in the sigmoid, so
    thresholding on 0 IS thresholding on p=0.5."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    logit = quality_logit()
    return docs.select(
        "doc_id",
        "lang",
        F.size(tokens_col()).cast("bigint").alias("n_tokens"),
        logit.alias("logit"),
        (logit > 0).alias("label"),
    )


#: Gopher/C4-style document-filter thresholds (Rae et al. 2021 §A1.1,
#: adapted to the fixture corpus's word-count range).
C4_MIN_WORDS = 25
C4_MAX_WORDS = 90
C4_MIN_MEAN_WORD_LEN = 4.0
C4_MAX_MEAN_WORD_LEN = 10.0
C4_MAX_TOP_WORD_FRAC = 0.12
C4_MIN_STOPWORD_HITS = 2


_SQL_C4_FILTERS = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  GROUP BY doc_id, tok
),
top AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM tf GROUP BY doc_id),
feat AS (
  SELECT s.doc_id,
         len(s.t) AS n_words,
         round(list_aggregate(list_transform(s.t, x -> len(x)::DOUBLE), 'sum')
               / len(s.t), 6) AS mean_word_len,
         len(list_filter({_sql_list(STOPWORDS_EN)},
                         w -> list_contains(s.t, w))) AS stop_hits,
         round(top.top_cnt::DOUBLE / len(s.t), 6) AS top_word_frac
  FROM toks s JOIN top ON s.doc_id = top.doc_id
)
SELECT doc_id, n_words, mean_word_len, stop_hits, top_word_frac,
       n_words BETWEEN {C4_MIN_WORDS} AND {C4_MAX_WORDS} AS words_ok,
       mean_word_len BETWEEN {C4_MIN_MEAN_WORD_LEN} AND {C4_MAX_MEAN_WORD_LEN}
         AS mwl_ok,
       stop_hits >= {C4_MIN_STOPWORD_HITS} AS stop_ok,
       top_word_frac <= {C4_MAX_TOP_WORD_FRAC} AS rep_ok,
       (n_words BETWEEN {C4_MIN_WORDS} AND {C4_MAX_WORDS})
         AND (mean_word_len BETWEEN {C4_MIN_MEAN_WORD_LEN}
                                AND {C4_MAX_MEAN_WORD_LEN})
         AND stop_hits >= {C4_MIN_STOPWORD_HITS}
         AND top_word_frac <= {C4_MAX_TOP_WORD_FRAC} AS keep
FROM feat
"""


@query("text_c4_gopher_filters", oracle=_SQL_C4_FILTERS)
def text_c4_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher document-quality filter bank (Raffel et al. 2020 §2.2;
    Rae et al. 2021 §A1.1): word-count bounds, mean-word-length bounds,
    minimum distinct-stopword presence, and a max top-word-frequency
    cap (single-token repetition — complements text_repetition_quality,
    which gates on duplicate 3-grams). Emits the features, each rule's
    verdict, and the conjunction — the audit-friendly form (a corpus
    report can aggregate per-rule drop rates before committing to the
    filtered snapshot).

    Scale shape: everything except the top-word count is a zero-shuffle
    scan-stage fold over the materialized token array; the top-word
    count explodes tokens once and aggregates on (doc_id, tok) then
    doc_id — two partial-combined aggregations on one exchange, the
    same shape the TF pass of text_tfidf_keywords uses. The stopword
    probe iterates the FIXED 7-word list against the doc (O(7) membership
    tests), never the document against the list."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tokd = docs.select("doc_id", tokens_col().alias("t"))
    t = F.col("t")
    top = (
        tokd.select("doc_id", F.explode(t).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"))
    )
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    feat = tokd.join(top, "doc_id").select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_words"),
        F.round(
            F.aggregate(
                F.transform(t, lambda x: F.length(x).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(t),
            6,
        ).alias("mean_word_len"),
        F.size(F.filter(stop_arr, lambda w: F.array_contains(t, w)))
        .cast("bigint")
        .alias("stop_hits"),
        F.round(F.col("top_cnt").cast("double") / F.size(t), 6).alias(
            "top_word_frac"
        ),
    )
    words_ok = F.col("n_words").between(C4_MIN_WORDS, C4_MAX_WORDS)
    mwl_ok = F.col("mean_word_len").between(
        C4_MIN_MEAN_WORD_LEN, C4_MAX_MEAN_WORD_LEN
    )
    stop_ok = F.col("stop_hits") >= C4_MIN_STOPWORD_HITS
    rep_ok = F.col("top_word_frac") <= C4_MAX_TOP_WORD_FRAC
    return feat.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_hits",
        "top_word_frac",
        words_ok.alias("words_ok"),
        mwl_ok.alias("mwl_ok"),
        stop_ok.alias("stop_ok"),
        rep_ok.alias("rep_ok"),
        (words_ok & mwl_ok & stop_ok & rep_ok).alias("keep"),
    )


@query(
    "text_bigram_perplexity",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks)
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(-SUM(ln((bc.c12 + 1)::DOUBLE / (ctx.c1 + vocab.v)))
             / COUNT(*), 6) AS avg_nll
FROM bg
JOIN bc USING (w1, w2)
JOIN ctx USING (w1)
CROSS JOIN vocab
GROUP BY bg.doc_id
""",
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average NLL under an add-one-smoothed BIGRAM
    language model fit on the corpus — the stronger fluency filter one
    step up from text_unigram_nll: word-order violations (shuffled or
    templated text) score high even when the unigram distribution
    looks normal, which is exactly the failure mode unigram
    perplexity filters miss (CCNet, Wenzek et al. 2020 §4.3).
    P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+|V|).

    Scale shape: bigrams are materialized by a scan-stage zip of the
    token array with its own tail (no self-join, no window over the
    exploded stream); the model is two partial-combined counts
    (bigram, then its w1 marginal — the second aggregates the ALREADY
    collapsed bigram relation, not the corpus); scoring broadcast-joins
    the model back onto the bigram stream, and the vocabulary scalar
    rides a 1-row broadcast cross join. ln() is transcendental —
    absorbed by the repo-wide round(6) convention."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select("doc_id", tokens_col().alias("t"))
    t = F.col("t")
    n = F.size(t)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(t, F.lit(1), n - 1),
                F.slice(t, F.lit(2), n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        toks.select(F.explode(t).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    model = bc.join(ctx, "w1")
    return (
        # UNHINTED (r7 broadcast audit): the bigram model is
        # bigram-vocabulary-sized — AQE decides per the tfidf note.
        bg.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.log(
                        (F.col("c12") + 1).cast("double")
                        / (F.col("c1") + F.col("v"))
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_nll"),
        )
    )


#: Per-score truth relation shared by the AUC and decision-stump
#: evaluators: (logit, n docs, n positive-by-C4-rules docs).
_SQL_PER_SCORE = f"""c4 AS ({_SQL_C4_FILTERS}),
q AS (
  SELECT doc_id, {SQL_QUALITY_LOGIT} AS logit FROM documents
),
j AS (SELECT q.doc_id, q.logit, c4.keep FROM q JOIN c4 USING (doc_id)),
per_score AS (
  SELECT logit,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS np_s
  FROM j GROUP BY logit
)"""


def _per_score_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SQL_PER_SCORE (shared by AUC + stump)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scores = docs.select("doc_id", quality_logit().alias("logit"))
    truth = text_c4_gopher_filters(spark, sf_dir).select("doc_id", "keep")
    return (
        scores.join(truth, "doc_id")
        .groupBy("logit")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("bigint")).alias("np_s"),
        )
    )


@query(
    "ml_auc_quality_classifier",
    oracle=f"""
WITH {_SQL_PER_SCORE},
ranked AS (
  SELECT logit, n, np_s,
         CAST(COALESCE(SUM(n) OVER (
           ORDER BY logit
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_lower
  FROM per_score
),
agg AS (
  SELECT CAST(SUM(np_s * (2 * (cum_lower + 1) + n - 1)) AS BIGINT) AS r2sum,
         CAST(SUM(np_s) AS BIGINT) AS np,
         CAST(SUM(n) - SUM(np_s) AS BIGINT) AS nn
  FROM ranked
)
SELECT np AS n_pos, nn AS n_neg,
       round(CAST(r2sum - np * (np + 1) AS DOUBLE) / (2 * np * nn), 6) AS auc
FROM agg
""",
)
def ml_auc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the hashing-trick quality classifier, scored against
    the C4/Gopher rule bank's keep verdict as ground truth — the
    evaluation step that closes the classifier loop (a filter whose
    AUC against curated rules drifts between corpus snapshots has
    gone stale). Computed as the Mann-Whitney rank-sum with AVERAGE
    ranks for ties: AUC = (R₂ − n₊(n₊+1)) / (2·n₊·n₋) where R₂ is the
    doubled rank-sum of positives (half-unit average ranks kept in
    integer half-units, so everything before the single final division
    is exact BIGINT arithmetic — no float rank hazards).

    Scale shape: NO global per-document sort — documents collapse to
    the per-score relation first (one partial-combined groupBy on the
    integer logit), and the rank cumsum windows over that
    score-domain-sized relation (bounded by the weight lattice, the
    audited small-relation window pattern); the rank-sum is then one
    aggregation. The truth join reuses the registered C4 query
    verbatim on both sides."""
    per_score = _per_score_truth(spark, sf_dir)
    w = W.orderBy("logit").rowsBetween(W.unboundedPreceding, -1)
    ranked = per_score.select(
        "logit",
        "n",
        "np_s",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cum_lower"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("np_s")
            * (2 * (F.col("cum_lower") + 1) + F.col("n") - 1)
        ).alias("r2sum"),
        F.sum("np_s").alias("np"),
        (F.sum("n") - F.sum("np_s")).alias("nn"),
    )
    np_, nn_ = F.col("np"), F.col("nn")
    return agg.select(
        np_.alias("n_pos"),
        nn_.alias("n_neg"),
        F.round(
            (F.col("r2sum") - np_ * (np_ + 1)).cast("double")
            / (2 * np_ * nn_),
            6,
        ).alias("auc"),
    )


WINNOW_DF_CAP = 5  #: fingerprints in more docs than this are dropped
WINNOW_MIN_SHARED = 2  #: shared fingerprints required to emit a pair


@query(
    "dedup_winnowing_pairs",
    oracle=f"""
WITH fps AS ({_SQL_WINNOW_FPS}),
df AS (SELECT fp, COUNT(*) AS c FROM fps GROUP BY fp),
kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN df USING (fp)
         WHERE df.c <= {WINNOW_DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
)
SELECT sh.doc1, sh.doc2, sh.n_shared, s1.n_fp AS n_fp1, s2.n_fp AS n_fp2,
       round(sh.n_shared::DOUBLE / least(s1.n_fp, s2.n_fp), 6) AS overlap
FROM shared sh
JOIN sizes s1 ON sh.doc1 = s1.doc_id
JOIN sizes s2 ON sh.doc2 = s2.doc_id
""",
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document overlap detection via shared winnowing
    fingerprints (the MOSS pairing stage on top of
    text_winnowing_fingerprint): documents sharing ≥ WINNOW_MIN_SHARED
    winnowed k-gram hashes pair up, scored by shared-fingerprint count
    over the smaller document's fingerprint set — the
    plagiarism/boilerplate-span detector that complements MinHash
    (whole-document resemblance) and shingle containment (subset
    duplication): winnowing guarantees any shared run of ≥ w+k-1
    tokens survives the 1/w compression, so long verbatim spans are
    caught from ~1/w the candidate volume of full shingling.

    Scale design: the pair stage joins on the fingerprint AFTER
    dropping fingerprints present in more than WINNOW_DF_CAP documents
    (stop-fingerprints — MOSS's own mitigation, the same
    frequency-cap-before-self-join discipline as
    graph_jaccard_neighbors' hub cap and the banded LSH buckets), so
    per-fingerprint pair fan-out is bounded by a constant; overlap
    divides two identical integers. The oracle embeds the registered
    fingerprint query verbatim — both engines pair over bit-identical
    fingerprint sets."""
    fps = text_winnowing_fingerprint(spark, sf_dir)
    df_cnt = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    kept = fps.join(
        df_cnt.filter(F.col("c") <= WINNOW_DF_CAP).select("fp"), "fp"
    )
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = kept.alias("a")
    b = kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_fp").alias("n_fp1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_fp").alias("n_fp2"))
    return (
        # UNHINTED (r7 broadcast audit): the fingerprint-count tables
        # are document-population-sized — AQE decides per the tfidf
        # note (same fix as graph_jaccard_neighbors' degree tables).
        shared.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            "n_shared",
            "n_fp1",
            "n_fp2",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("n_fp1", "n_fp2"),
                6,
            ).alias("overlap"),
        )
    )


@query(
    "ml_decision_stump",
    oracle=f"""
WITH {_SQL_PER_SCORE},
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(np_s) AS BIGINT) AS pt
  FROM per_score
),
cum AS (
  SELECT logit,
         CAST(SUM(n) OVER (ORDER BY logit
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
         CAST(SUM(np_s) OVER (ORDER BY logit
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
  FROM per_score
),
err AS (
  SELECT c.logit AS threshold, t.nt, t.pt, c.nl, c.pl,
         least(c.pl, c.nl - c.pl)
           + least(t.pt - c.pl, (t.nt - c.nl) - (t.pt - c.pl)) AS err
  FROM cum c CROSS JOIN tot t
),
best AS (
  SELECT *, row_number() OVER (ORDER BY err, threshold) AS rn FROM err
)
SELECT threshold, err AS n_misclassified, nt AS n_total,
       pl * 2 > nl AS left_label,
       (pt - pl) * 2 > (nt - nl) AS right_label,
       round(CAST(nt - err AS DOUBLE) / nt, 6) AS accuracy
FROM best WHERE rn = 1
""",
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-level decision-tree induction over the classifier's
    score: the threshold minimizing misclassification of the C4 rule
    bank's keep verdict (each side predicting its majority class, ties
    to False, tied thresholds to the smaller logit) — the in-warehouse
    training step that turns a continuous score into the optimal
    operating point (where ml_auc ranks thresholds in aggregate, the
    stump COMMITS to one). Split search on the misclassification count
    keeps the entire argmin in BIGINT arithmetic — no float impurity
    to tie-break differently across engines.

    Scale shape: documents collapse to the score-domain relation
    first (one partial-combined groupBy), so the cumulative
    left-counts window and the argmin both run over the bounded
    integer-logit domain — never a per-document sort; corpus totals
    ride a broadcast 1-row cross join."""
    per_score = _per_score_truth(spark, sf_dir)
    tot = per_score.agg(
        F.sum("n").alias("nt"), F.sum("np_s").alias("pt")
    )
    w = W.orderBy("logit").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_score.select(
        F.col("logit").alias("threshold"),
        F.sum("n").over(w).alias("nl"),
        F.sum("np_s").over(w).alias("pl"),
    )
    nl, pl, nt, pt = (F.col(c) for c in ("nl", "pl", "nt", "pt"))
    err = cum.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "nt",
        "pt",
        "nl",
        "pl",
        (
            F.least(pl, nl - pl)
            + F.least(pt - pl, (nt - nl) - (pt - pl))
        ).alias("err"),
    )
    rw = W.orderBy("err", "threshold")
    return (
        err.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            "threshold",
            F.col("err").alias("n_misclassified"),
            F.col("nt").alias("n_total"),
            (pl * 2 > nl).alias("left_label"),
            ((pt - pl) * 2 > (nt - nl)).alias("right_label"),
            F.round((nt - F.col("err")).cast("double") / nt, 6).alias(
                "accuracy"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth (corpus scaling-law readout)
# ---------------------------------------------------------------------------

HEAPS_SHARDS = 10  #: random corpus shards; the growth curve's x-axis


@query(
    "text_heaps_vocab_growth",
    oracle=f"""
WITH {_SQL_SHINGLES.strip()},
shards AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % {HEAPS_SHARDS} AS shard
  FROM documents
),
occ AS (
  SELECT s.shard, CAST(COUNT(*) AS BIGINT) AS occ
  FROM sh JOIN shards s USING (doc_id) GROUP BY s.shard
),
fs AS (
  SELECT sh.shingle, MIN(s.shard) AS first_shard
  FROM sh JOIN shards s USING (doc_id) GROUP BY sh.shingle
),
nv AS (SELECT first_shard AS shard, CAST(COUNT(*) AS BIGINT) AS nv FROM fs GROUP BY first_shard),
pts AS (
  SELECT o.shard,
         CAST(SUM(o.occ) OVER (ORDER BY o.shard) AS BIGINT) AS cum_tokens,
         CAST(SUM(COALESCE(nv.nv, 0)) OVER (ORDER BY o.shard) AS BIGINT) AS cum_vocab
  FROM occ o LEFT JOIN nv ON o.shard = nv.shard
),
xy AS (
  SELECT shard, cum_tokens, cum_vocab,
         ln(CAST(cum_tokens AS DOUBLE)) AS x,
         ln(CAST(cum_vocab AS DOUBLE)) AS y
  FROM pts
),
fit AS (
  SELECT (COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
         / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)) AS beta
  FROM xy
)
SELECT xy.shard, xy.cum_tokens, xy.cum_vocab,
       round(fit.beta, 6) + 0.0 AS heaps_beta
FROM xy CROSS JOIN fit
""",
)
def text_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct-shingle count
    vs cumulative shingle postings across HEAPS_SHARDS md5-random
    corpus shards, plus the fitted Heaps exponent β (slope of the
    log-log regression V = k·N^β) — the corpus-statistics readout that
    sizes tokenizer vocabularies and predicts how much NEW vocabulary
    the next 10× of crawl data will add. The vocabulary unit is the
    3-token shingle (the dedup module's certified relation): the
    synthetic corpus draws tokens from a ~31-word pool, so the TOKEN
    vocabulary saturates in the first shard (a degenerate flat curve
    whose β ≈ ±0 even flips sign under shuffle order — caught by the
    -0.0 gate), while the combinatorial shingle space keeps growing
    like real crawl vocabulary.

    Prefix-distinct counts use the FIRST-SEEN reformulation (cf.
    window_cumulative_distinct_users): a shingle's min containing shard
    assigns it to exactly one growth step, so "distinct in shards ≤ s"
    is a running SUM over a SHARDS-row relation — never a per-prefix
    distinct over the corpus. The corpus is touched by one shingle
    explode; shard totals and first-seen mins are vocabulary-sized
    aggregations; the running windows and the log-log fit run on the
    SHARDS-row relation (bounded, so the partitionless window is
    O(SHARDS) state, not a scale hazard); the fitted β rides along as
    a broadcast 1-row cross join."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    postings = doc_shingles(docs)
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % HEAPS_SHARDS
    )
    sh = docs.select("doc_id", shard.alias("shard"))
    occ = (
        postings.join(sh, "doc_id")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("bigint").alias("occ"))
    )
    fs = (
        # First-seen mins need shingle IDENTITY only: key the
        # vocabulary aggregation on the 60-bit md5-derived key so the
        # corpus-sized shuffle carries 8-byte bigints, not raw text.
        postings.join(sh, "doc_id")
        .groupBy(_spark_hash60(F.col("shingle")).alias("sh"))
        .agg(F.min("shard").alias("first_shard"))
    )
    nv = fs.groupBy(F.col("first_shard").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nv")
    )
    w = W.orderBy("shard").rowsBetween(W.unboundedPreceding, W.currentRow)
    pts = (
        occ.join(nv, "shard", "left")
        .select(
            "shard",
            F.sum("occ").over(w).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("nv"), F.lit(0))).over(w)
            .cast("bigint")
            .alias("cum_vocab"),
        )
    )
    xy = pts.select(
        "shard",
        "cum_tokens",
        "cum_vocab",
        F.log(F.col("cum_tokens").cast("double")).alias("x"),
        F.log(F.col("cum_vocab").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    fit = xy.agg(
        (
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        ).alias("beta")
    )
    return xy.crossJoin(F.broadcast(fit)).select(
        "shard",
        "cum_tokens",
        "cum_vocab",
        (F.round("beta", 6) + F.lit(0.0)).alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# K-fold cross-validated stump (model-selection harness)
# ---------------------------------------------------------------------------

KF_FOLDS = 5  #: md5-deterministic cross-validation folds


@query(
    "ml_kfold_cv_stump",
    oracle=f"""
WITH c4 AS ({_SQL_C4_FILTERS}),
q AS (
  SELECT doc_id, {SQL_QUALITY_LOGIT} AS logit FROM documents
),
j AS (SELECT q.doc_id, q.logit, c4.keep FROM q JOIN c4 USING (doc_id)),
jf AS (
  SELECT logit, keep,
         ('0x' || substr(md5('cv' || doc_id), 1, 15))::BIGINT % {KF_FOLDS}
           AS fold
  FROM j
),
pf AS (
  SELECT fold, logit, CAST(COUNT(*) AS BIGINT) AS n_f,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS np_f
  FROM jf GROUP BY fold, logit
),
dom AS (SELECT DISTINCT logit FROM pf),
folds AS (SELECT unnest(range({KF_FOLDS})) AS fold),
grid AS (
  SELECT f.fold, d.logit,
         COALESCE(pf.n_f, 0) AS n_f, COALESCE(pf.np_f, 0) AS np_f
  FROM folds f CROSS JOIN dom d
  LEFT JOIN pf ON pf.fold = f.fold AND pf.logit = d.logit
),
tot AS (
  SELECT logit, CAST(SUM(n_f) AS BIGINT) AS n_t,
         CAST(SUM(np_f) AS BIGINT) AS np_t
  FROM grid GROUP BY logit
),
g2 AS (
  SELECT g.fold, g.logit, g.n_f, g.np_f,
         t.n_t - g.n_f AS n_tr, t.np_t - g.np_f AS np_tr
  FROM grid g JOIN tot t USING (logit)
),
cum AS (
  SELECT fold, logit,
         CAST(SUM(n_tr) OVER w AS BIGINT) AS nl_tr,
         CAST(SUM(np_tr) OVER w AS BIGINT) AS pl_tr,
         CAST(SUM(n_f) OVER w AS BIGINT) AS nl_te,
         CAST(SUM(np_f) OVER w AS BIGINT) AS pl_te
  FROM g2
  WINDOW w AS (PARTITION BY fold ORDER BY logit
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ft AS (
  SELECT fold,
         CAST(SUM(n_tr) AS BIGINT) AS nt_tr, CAST(SUM(np_tr) AS BIGINT) AS pt_tr,
         CAST(SUM(n_f) AS BIGINT) AS nt_te, CAST(SUM(np_f) AS BIGINT) AS pt_te
  FROM g2 GROUP BY fold
),
err AS (
  SELECT c.fold, c.logit AS threshold,
         f.nt_tr, f.pt_tr, f.nt_te, f.pt_te,
         c.nl_tr, c.pl_tr, c.nl_te, c.pl_te,
         least(c.pl_tr, c.nl_tr - c.pl_tr)
           + least(f.pt_tr - c.pl_tr, (f.nt_tr - c.nl_tr) - (f.pt_tr - c.pl_tr))
           AS err_tr,
         c.pl_tr * 2 > c.nl_tr AS left_label,
         (f.pt_tr - c.pl_tr) * 2 > (f.nt_tr - c.nl_tr) AS right_label
  FROM cum c JOIN ft f USING (fold)
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY fold ORDER BY err_tr, threshold) AS rn
  FROM err
),
sel AS (
  SELECT fold, threshold, err_tr, nt_tr, nt_te, left_label, right_label,
         (CASE WHEN left_label THEN nl_te - pl_te ELSE pl_te END)
           + (CASE WHEN right_label THEN (nt_te - nl_te) - (pt_te - pl_te)
                   ELSE pt_te - pl_te END) AS err_te
  FROM best WHERE rn = 1
)
SELECT CAST(fold AS INT) AS fold, threshold,
       err_tr AS train_err,
       round(CAST(nt_tr - err_tr AS DOUBLE) / nt_tr, 6) AS train_acc,
       err_te AS test_err, nt_te AS n_test,
       round(CAST(nt_te - err_te AS DOUBLE) / nt_te, 6) AS test_acc,
       left_label, right_label
FROM sel
""",
)
def ml_kfold_cv_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation of the decision stump: md5-deterministic
    folds, each fold's stump trained (exhaustive exact-integer split
    search, ml_decision_stump's algebra) on the OTHER folds' counts and
    scored on the held-out fold — the generalization-gap readout
    (train_acc vs test_acc per fold) that turns the stump from a fit
    into a model-selection harness. Train counts come free as
    ``total − fold`` on the shared (fold, logit) grid, so K folds cost
    ONE corpus pass + a K×|logit-domain| bounded relation; the
    cumulative windows, per-fold argmins, and held-out scoring all run
    on that grid (exact BIGINT throughout — fold winners and labels
    cannot tie-break differently across engines)."""
    from etl_pipeline_sam_gov_spark.operators.dedup import _spark_hash60

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scores = docs.select("doc_id", quality_logit().alias("logit"))
    truth = text_c4_gopher_filters(spark, sf_dir).select("doc_id", "keep")
    jf = scores.join(truth, "doc_id").select(
        "logit",
        "keep",
        (
            _spark_hash60(
                F.concat(F.lit("cv"), F.col("doc_id").cast("string"))
            )
            % KF_FOLDS
        ).alias("fold"),
    )
    pf = jf.groupBy("fold", "logit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_f"),
        F.sum(F.col("keep").cast("bigint")).cast("bigint").alias("np_f"),
    )
    dom = pf.select("logit").distinct()
    folds = spark.range(KF_FOLDS).select(F.col("id").alias("fold"))
    grid = (
        folds.crossJoin(F.broadcast(dom))
        .join(pf, ["fold", "logit"], "left")
        .select(
            "fold",
            "logit",
            F.coalesce(F.col("n_f"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("np_f"), F.lit(0)).alias("np_f"),
        )
    )
    tot = grid.groupBy("logit").agg(
        F.sum("n_f").cast("bigint").alias("n_t"),
        F.sum("np_f").cast("bigint").alias("np_t"),
    )
    g2 = grid.join(F.broadcast(tot), "logit").select(
        "fold",
        "logit",
        "n_f",
        "np_f",
        (F.col("n_t") - F.col("n_f")).alias("n_tr"),
        (F.col("np_t") - F.col("np_f")).alias("np_tr"),
    )
    w = (
        W.partitionBy("fold")
        .orderBy("logit")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = g2.select(
        "fold",
        "logit",
        F.sum("n_tr").over(w).cast("bigint").alias("nl_tr"),
        F.sum("np_tr").over(w).cast("bigint").alias("pl_tr"),
        F.sum("n_f").over(w).cast("bigint").alias("nl_te"),
        F.sum("np_f").over(w).cast("bigint").alias("pl_te"),
    )
    ft = g2.groupBy("fold").agg(
        F.sum("n_tr").cast("bigint").alias("nt_tr"),
        F.sum("np_tr").cast("bigint").alias("pt_tr"),
        F.sum("n_f").cast("bigint").alias("nt_te"),
        F.sum("np_f").cast("bigint").alias("pt_te"),
    )
    nl_tr, pl_tr = F.col("nl_tr"), F.col("pl_tr")
    nt_tr, pt_tr = F.col("nt_tr"), F.col("pt_tr")
    err = cum.join(F.broadcast(ft), "fold").select(
        "fold",
        F.col("logit").alias("threshold"),
        "nt_tr",
        "pt_tr",
        "nt_te",
        "pt_te",
        "nl_tr",
        "pl_tr",
        "nl_te",
        "pl_te",
        (
            F.least(pl_tr, nl_tr - pl_tr)
            + F.least(pt_tr - pl_tr, (nt_tr - nl_tr) - (pt_tr - pl_tr))
        ).alias("err_tr"),
        (pl_tr * 2 > nl_tr).alias("left_label"),
        ((pt_tr - pl_tr) * 2 > (nt_tr - nl_tr)).alias("right_label"),
    )
    rw = W.partitionBy("fold").orderBy("err_tr", "threshold")
    best = err.withColumn("rn", F.row_number().over(rw)).filter(
        F.col("rn") == 1
    )
    err_te = F.when(
        F.col("left_label"), F.col("nl_te") - F.col("pl_te")
    ).otherwise(F.col("pl_te")) + F.when(
        F.col("right_label"),
        (F.col("nt_te") - F.col("nl_te")) - (F.col("pt_te") - F.col("pl_te")),
    ).otherwise(F.col("pt_te") - F.col("pl_te"))
    sel = best.select(
        "fold",
        "threshold",
        "err_tr",
        "nt_tr",
        "nt_te",
        "left_label",
        "right_label",
        err_te.alias("err_te"),
    )
    return sel.select(
        F.col("fold").cast("int").alias("fold"),
        "threshold",
        F.col("err_tr").alias("train_err"),
        F.round(
            (F.col("nt_tr") - F.col("err_tr")).cast("double") / F.col("nt_tr"),
            6,
        ).alias("train_acc"),
        F.col("err_te").alias("test_err"),
        F.col("nt_te").alias("n_test"),
        F.round(
            (F.col("nt_te") - F.col("err_te")).cast("double") / F.col("nt_te"),
            6,
        ).alias("test_acc"),
        "left_label",
        "right_label",
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (corpus-free phrase scoring)
# ---------------------------------------------------------------------------

RAKE_STOPWORDS = ("a", "the", "and", "of")


@query(
    "text_rake_keyphrase",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
pos AS (
  SELECT doc_id, u.i, t[u.i] AS tok
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
),
fl AS (
  SELECT doc_id, i, tok,
         CASE WHEN tok IN ({", ".join(f"'{s}'" for s in RAKE_STOPWORDS)})
              THEN 1 ELSE 0 END AS is_stop
  FROM pos
),
ph AS (
  SELECT doc_id, i, tok, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
  FROM fl
),
words AS (SELECT doc_id, phrase_id, i, tok FROM ph WHERE is_stop = 0),
plen AS (
  SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen
  FROM words GROUP BY 1, 2
),
wstats AS (
  SELECT w.doc_id, w.tok,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.plen) AS BIGINT) AS deg
  FROM words w JOIN plen p USING (doc_id, phrase_id)
  GROUP BY w.doc_id, w.tok
),
pscore AS (
  SELECT w.doc_id, w.phrase_id,
         round(SUM(CAST(s.deg AS DOUBLE) / s.freq), 6) AS score
  FROM words w JOIN wstats s ON w.doc_id = s.doc_id AND w.tok = s.tok
  GROUP BY 1, 2
),
ptext AS (
  SELECT doc_id, phrase_id, string_agg(tok, ' ' ORDER BY i) AS phrase
  FROM words GROUP BY 1, 2
),
rankedp AS (
  SELECT p.doc_id, t.phrase, p.score,
         row_number() OVER (PARTITION BY p.doc_id
           ORDER BY p.score DESC, t.phrase, p.phrase_id) AS rn
  FROM pscore p JOIN ptext t USING (doc_id, phrase_id)
)
SELECT doc_id, phrase AS top_phrase, score FROM rankedp WHERE rn = 1
""",
)
def text_rake_keyphrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. '10): candidate phrases
    are maximal stopword-free token runs; each word scores
    degree/frequency (degree = summed length of the phrases it appears
    in — words that keep company with long phrases score high), a
    phrase scores the sum of its words, and the top phrase per
    document is emitted — the corpus-FREE keyword extractor (TF-IDF
    needs collection statistics; RAKE reads one document at a time,
    which is why curation pipelines run it at ingest).

    Scale shape: one positional explode; phrase segmentation is a
    running stopword-count window on the (doc_id)-keyed exchange;
    word stats and phrase scores are partial-combined groupBys keyed
    on (doc_id, tok)/(doc_id, phrase_id); ranking is per-doc top-1 on
    the ROUNDED score with (phrase, phrase_id) tiebreaks (repo ranking
    convention — both engines rank identical values). Scores are
    sums of exact int ratios; only the final sum rounds."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from etl_pipeline_sam_gov_spark.operators.dedup import tokens_col

    pos = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    fl = pos.select(
        "doc_id",
        "i",
        "tok",
        F.col("tok").isin(*RAKE_STOPWORDS).cast("int").alias("is_stop"),
    )
    run = (
        W.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ph = fl.select(
        "doc_id",
        "i",
        "tok",
        "is_stop",
        F.sum("is_stop").over(run).alias("phrase_id"),
    )
    words = ph.filter(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "i", "tok"
    )
    plen = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen")
    )
    wstats = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("doc_id", "tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    pscore = (
        words.join(wstats, ["doc_id", "tok"])
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.round(
                F.sum(F.col("deg").cast("double") / F.col("freq")), 6
            ).alias("score")
        )
    )
    ptext = words.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("i", "tok"))
                ),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase")
    )
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(
            F.desc("score"), F.asc("phrase"), F.asc("phrase_id")
        )
    )
    return (
        pscore.join(ptext, ["doc_id", "phrase_id"])
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("phrase").alias("top_phrase"), "score")
    )


# ---------------------------------------------------------------------------
# Flesch reading-ease readability scoring
# ---------------------------------------------------------------------------


@query(
    "text_readability_flesch",
    oracle="""
WITH counts AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(list_aggregate(
           list_transform(string_split_regex(text, '\\s+'),
             w -> greatest(len(regexp_extract_all(w, '[aeiouAEIOU]+')), 1)),
           'sum') AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) + 0.0
         AS flesch,
       CASE
         WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
              - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) >= 70 THEN 'easy'
         WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
              - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) >= 50
           THEN 'standard'
         ELSE 'difficult'
       END AS band
FROM counts
""",
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the readability signal
    quality-curation stacks use alongside the C4/Gopher rules (very
    low readability correlates with boilerplate/gibberish; very high
    with trivial listicles). Words are the corpus-standard whitespace
    tokens; sentences count terminal-punctuation runs (floored at 1);
    syllables use the standard vowel-group heuristic (floored at 1 per
    word) — all THREE counts are exact integers from the same regex
    algebra on both engines, so the 206.835 − 1.015·(W/S) −
    84.6·(SY/W) formula computes on bit-identical operands and the
    banding thresholds compare identical doubles.

    Scale shape: pure scan-stage expression work (one higher-order
    fold per doc, JVM-side, no UDF, no shuffle)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = tokens_col()
    counts = spread_docs(docs).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.greatest(
            F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.aggregate(
            F.transform(
                toks,
                lambda w: F.greatest(
                    F.size(F.regexp_extract_all(w, F.lit("[aeiouAEIOU]+"), F.lit(0))),
                    F.lit(1),
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_syllables"),
    )
    flesch_raw = (
        F.lit(206.835)
        - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    return counts.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.round(flesch_raw, 6) + F.lit(0.0)).alias("flesch"),
        F.when(flesch_raw >= 70, "easy")
        .when(flesch_raw >= 50, "standard")
        .otherwise("difficult")
        .alias("band"),
    )


# ---------------------------------------------------------------------------
# Precision-recall curve over the quality classifier's score domain
# ---------------------------------------------------------------------------


@query(
    "ml_precision_recall_curve",
    oracle=f"""
WITH {_SQL_PER_SCORE},
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(np_s) AS BIGINT) AS pt
  FROM per_score
),
cum AS (
  SELECT logit,
         CAST(SUM(n) OVER w AS BIGINT) AS n_ge,
         CAST(SUM(np_s) OVER w AS BIGINT) AS tp
  FROM per_score
  WINDOW w AS (ORDER BY logit DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT c.logit AS threshold, c.tp,
       c.n_ge - c.tp AS fp,
       t.pt - c.tp AS fn,
       round(CAST(c.tp AS DOUBLE) / c.n_ge, 6) + 0.0 AS precision_at,
       round(CAST(c.tp AS DOUBLE) / t.pt, 6) + 0.0 AS recall_at,
       CASE WHEN c.tp = 0 THEN 0.0
            ELSE round(2.0 * c.tp / (c.n_ge + t.pt), 6) + 0.0 END AS f1_at
FROM cum c CROSS JOIN tot t
""",
)
def ml_precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full precision-recall curve of the quality classifier
    against the C4/Gopher rule-bank truth: one point per distinct
    score threshold (predict keep when logit ≥ t), with TP/FP/FN
    counts and precision/recall/F1 — the curve the operating-point
    choice (ml_decision_stump) and the aggregate ranking quality
    (ml_auc_quality_classifier) both project down from. F1 uses the
    identity 2TP/(predicted_pos + actual_pos), so every emitted
    metric is ONE division of exact int64 counts — no compounded
    float error, no -0.0 risk (all operands non-negative).

    Scale shape: documents collapse to the bounded score-domain
    relation first (shared _per_score_truth groupBy); the descending
    cumulative window and every ratio run over that bounded relation;
    corpus totals ride a broadcast 1-row cross join."""
    per_score = _per_score_truth(spark, sf_dir)
    tot = per_score.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("np_s").cast("bigint").alias("pt"),
    )
    w = W.orderBy(F.desc("logit")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = per_score.select(
        F.col("logit").alias("threshold"),
        F.sum("n").over(w).cast("bigint").alias("n_ge"),
        F.sum("np_s").over(w).cast("bigint").alias("tp"),
    )
    tp, nge, pt = F.col("tp"), F.col("n_ge"), F.col("pt")
    return cum.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "tp",
        (nge - tp).alias("fp"),
        (pt - tp).alias("fn"),
        (F.round(tp.cast("double") / nge, 6) + F.lit(0.0)).alias("precision_at"),
        (F.round(tp.cast("double") / pt, 6) + F.lit(0.0)).alias("recall_at"),
        F.when(tp == 0, F.lit(0.0))
        .otherwise(F.round(2.0 * tp / (nge + pt), 6) + F.lit(0.0))
        .alias("f1_at"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram language model (top bigrams scorecard)
# ---------------------------------------------------------------------------

KN_DISCOUNT = 0.75  #: absolute discount D (the standard KN default)
KN_TOP = 50  #: emitted rows: top bigrams by raw count


@query(
    "text_kneser_ney_bigram",
    oracle=f"""
WITH toks AS (SELECT string_split_regex(text, '\\s+') AS t FROM documents),
idx AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM idx GROUP BY 1, 2
),
ctx AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS nf
  FROM big GROUP BY 1
),
cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS nb FROM big GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM big)
SELECT b.w1, b.w2, b.c12, x.c1, x.nf, n.nb,
       round((CAST(b.c12 AS DOUBLE) - {KN_DISCOUNT}) / x.c1
             + {KN_DISCOUNT} * x.nf / x.c1
               * (CAST(n.nb AS DOUBLE) / t.bt), 6) + 0.0 AS p_kn
FROM big b
JOIN ctx x ON x.w1 = b.w1
JOIN cont n ON n.w2 = b.w2
CROSS JOIN tot t
ORDER BY b.c12 DESC, b.w1, b.w2
LIMIT {KN_TOP}
""",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram probabilities — THE n-gram smoothing
    that mattered (every pre-neural LM benchmark, and still the
    perplexity-filter backbone in data curation): discount every seen
    bigram by D and redistribute the held-out mass through the
    CONTINUATION probability (how many distinct contexts a word
    follows — "Francisco" is frequent but only ever follows "San", so
    its continuation mass is tiny). p_KN(w2|w1) = (c12 − D)/c1 +
    (D·N1+(w1,·)/c1) · (N1+(·,w2)/|bigrams|). Emits the top-KN_TOP
    bigrams with every ingredient count, so the oracle certifies the
    full decomposition, not just the blended number.

    Determinism: all inputs are exact int64 counts; the float
    expression is written with the IDENTICAL operation order in both
    engines (sub, div, mul-chain, add — left-to-right), so the doubles
    are bit-identical before the 6-decimal round (no max(c12−D, 0)
    branch needed: a counted bigram has c12 ≥ 1 > D). Scale shape:
    one (w1,w2) partial-combined count, two vocabulary-sized rollups
    equi-joined back, the 1-row bigram total riding a broadcast cross
    join, and TakeOrderedAndProject for the scorecard — the bigram
    space never globally sorts."""
    from etl_pipeline_sam_gov_spark.operators.dedup import (
        spread_docs,
        tokens_col,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = tokens_col()
    pairs = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = (
        spread_docs(docs)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    ctx = big.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("nf"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    tot = big.agg(F.count(F.lit(1)).cast("bigint").alias("bt"))
    d = F.lit(KN_DISCOUNT)
    p_kn = (
        (F.col("c12").cast("double") - d) / F.col("c1")
        + d * F.col("nf") / F.col("c1")
        * (F.col("nb").cast("double") / F.col("bt"))
    )
    return (
        big.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c12", "c1", "nf", "nb",
            (F.round(p_kn, 6) + F.lit(0.0)).alias("p_kn"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(KN_TOP)
    )


# ---------------------------------------------------------------------------
# Zipf-law slope of the token frequency-rank curve
# ---------------------------------------------------------------------------

ZIPF_TOP = 200  #: ranks fitted (the head where Zipf behavior lives)


@query(
    "text_zipf_slope",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents
),
freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1),
top AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
  FROM freq ORDER BY f DESC, tok LIMIT {ZIPF_TOP}
),
pts AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)), 8) AS DECIMAL(18,8)) AS x,
         CAST(round(ln(CAST(f AS DOUBLE)), 8) AS DECIMAL(18,8)) AS y
  FROM top
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM pts
)
SELECT n AS n_top,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS zipf_slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         + 0.0 AS intercept
FROM s
""",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus: OLS slope of ln(frequency) on
    ln(rank) over the top-ZIPF_TOP (200) tokens — natural language sits
    near −1, and a corpus whose slope drifts far from it is
    boilerplate-heavy (too flat: templated repetition) or
    gibberish-heavy (too steep) — the corpus-level twin of the per-doc
    entropy gate, and Heaps-law's (text_heaps_vocab_growth) frequency-
    domain complement.

    Determinism: ranks and frequencies are exact ints ordered by
    (f DESC, token); each ln is snapped to 8 decimals and summed as
    exact DECIMAL(18,8) — the logistic-GD snap-then-exact-sum move —
    so the moment sums are order-free and the closed-form slope /
    intercept are fixed-shape double expressions rounded at the end.
    Scale shape: one token count (partial-combined), a
    TakeOrderedAndProject head, and the fit runs on a ZIPF_TOP-row
    relation; the corpus is touched once."""
    from etl_pipeline_sam_gov_spark.operators.dedup import (
        spread_docs,
        tokens_col,
    )
    from pyspark.sql.types import DecimalType

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    freq = (
        spread_docs(docs)
        .select(F.explode(tokens_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    top = (
        freq.orderBy(F.desc("f"), "tok")
        .limit(ZIPF_TOP)
        .select(
            "f",
            F.row_number()
            .over(W.orderBy(F.desc("f"), "tok"))
            .alias("r"),
        )
    )
    dec = DecimalType(18, 8)
    pts = top.select(
        F.round(F.log(F.col("r").cast("double")), 8).cast(dec).alias("x"),
        F.round(F.log(F.col("f").cast("double")), 8).cast(dec).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_top"),
        (F.round(slope, 6) + F.lit(0.0)).alias("zipf_slope"),
        (
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
            + F.lit(0.0)
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Pairwise vocabulary Jaccard between document sources
# ---------------------------------------------------------------------------


@query(
    "text_source_vocab_jaccard",
    oracle=r"""
WITH tok AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM tok GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM tok a JOIN tok b ON b.tok = a.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, sa.nv AS vocab_a, sb.nv AS vocab_b, i.n_shared,
       round(CAST(i.n_shared AS DOUBLE)
             / (sa.nv + sb.nv - i.n_shared), 6) + 0.0 AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
""",
)
def text_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between document SOURCES — the
    corpus-diagnostics matrix that tells a data-mixing pipeline which
    feeds are near-clones (merge or down-weight them in
    curate_sample_source_mixture) and which bring genuinely new
    vocabulary. Jaccard over each source's distinct token set, exact.

    Scale shape: the corpus collapses to the (source, token) distinct
    relation once; pair intersections come from a shared-token
    equi-join of that relation with itself (the dedup_crossdoc
    pattern — only tokens present in ≥2 sources produce join rows,
    never an all-pairs document comparison); sizes join back on the
    |sources|-bounded relation and the output is |sources|²/2 rows.
    All counts exact int64, one division per pair."""
    from etl_pipeline_sam_gov_spark.operators.dedup import (
        spread_docs,
        tokens_col,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = (
        spread_docs(docs)
        .select("source", F.explode(tokens_col()).alias("tok"))
        .distinct()
    )
    sizes = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nv")
    )
    a = tok.select(F.col("source").alias("src_a"), "tok")
    b = tok.select(F.col("source").alias("src_b"), F.col("tok").alias("tkb"))
    inter = (
        a.join(
            b,
            (F.col("tkb") == F.col("tok"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = F.broadcast(
        sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("vocab_a"))
    )
    sb = F.broadcast(
        sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("vocab_b"))
    )
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "vocab_a",
            "vocab_b",
            "n_shared",
            (
                F.round(
                    F.col("n_shared").cast("double")
                    / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
                    6,
                )
                + F.lit(0.0)
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-level boilerplate removal (C4-style repeated-line dedup)
# ---------------------------------------------------------------------------

BOILER_B = 4  #: tokens per non-overlapping segment ("line" stand-in)
BOILER_MIN_DOCS = 3  #: a segment in >= this many distinct docs is boilerplate


@query(
    "text_boilerplate_removal",
    oracle=rf"""
WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
st AS (SELECT doc_id, t, unnest(range(1, len(t)+1, {BOILER_B})) AS s FROM toks),
ch AS (
  SELECT doc_id, ((s-1)//{BOILER_B})::BIGINT AS idx,
         array_to_string(t[s:s+{BOILER_B - 1}], ' ') AS chunk
  FROM st
),
boiler AS (
  SELECT chunk FROM ch GROUP BY chunk
  HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
),
flagged AS (
  SELECT c.doc_id, c.idx, c.chunk, b.chunk IS NOT NULL AS is_boiler
  FROM ch c LEFT JOIN boiler b ON c.chunk = b.chunk
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_chunks,
       COUNT(*) FILTER (is_boiler)::BIGINT AS n_removed,
       md5(COALESCE(string_agg(chunk, ' ' ORDER BY idx) FILTER (NOT is_boiler), '')) AS kept_md5
FROM flagged
GROUP BY doc_id
""",
)
def text_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level boilerplate dedup: segment every document
    into non-overlapping B-token chunks (the fixture corpus has no
    newlines, so fixed-width segments stand in for lines), mark any
    chunk whose exact text occurs in >= BOILER_MIN_DOCS distinct
    documents as boilerplate, and rebuild each document from its
    retained chunks (emitted as an md5 so the output stays narrow).
    This is the "discard any line that appears verbatim across the
    corpus" cleaning step of C4/RefinedWeb-class pipelines — the
    cross-document counterpart of the within-doc repetition filters.

    Scale shape: one narrow tokenize+posexplode pass (chunk rows carry
    B tokens, never the whole doc), ONE shuffle keyed on chunk text for
    the distinct-doc count (partial-combined), and the boilerplate set
    — tiny by construction, frequency >= 3 — joins back onto the chunk
    stream where a real cluster would broadcast it. Document
    reassembly sorts each doc's surviving chunks by position inside a
    single per-doc aggregate (array_sort of (idx, chunk) structs), so
    the final shuffle is keyed on doc_id — no window, no driver work."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tokd = spread_docs(docs).select("doc_id", tokens_col().alias("_t"))
    t = F.col("_t")
    starts = F.sequence(F.lit(1), F.size(t), F.lit(BOILER_B))
    chunks = tokd.select(
        "doc_id", F.posexplode(starts).alias("idx", "s"), t
    ).select(
        "doc_id",
        F.col("idx").cast("bigint").alias("idx"),
        F.concat_ws(" ", F.slice(t, F.col("s"), BOILER_B)).alias("chunk"),
    )
    # The cross-document count only needs chunk IDENTITY, so it groups
    # on the 60-bit md5-derived key (_spark_hash60, the repo's
    # engine-neutral hashing convention), not the text: the
    # (chunk, doc) shuffle payload drops from raw chunk text per row
    # to a fixed 8-byte bigint — at 100 TB that shuffle is the
    # operator's dominant cost. The retained-text rebuild below still
    # rides the original chunk column; a 60-bit collision (≈1e-7 at
    # fixture vocabulary sizes, and it would fail the exact oracle
    # compare loudly) merges two chunk identities.
    chunks = chunks.withColumn("ch", _spark_hash60(F.col("chunk")))
    boiler = (
        chunks.groupBy("ch")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("ch", F.lit(True).alias("is_boiler"))
    )
    flagged = chunks.join(F.broadcast(boiler), "ch", "left").select(
        "doc_id",
        "idx",
        "chunk",
        F.coalesce(F.col("is_boiler"), F.lit(False)).alias("is_boiler"),
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("is_boiler"), F.struct(F.col("idx"), F.col("chunk"))
            )
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.col("is_boiler").cast("bigint")).alias("n_removed"),
        F.md5(
            F.concat_ws(" ", F.transform(kept, lambda st: st["chunk"]))
        ).alias("kept_md5"),
    )
