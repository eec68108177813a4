"""Scalar function library coverage (SURVEY.md §2.8).

The reference uses strip/upper/to_datetime/date-diff/strftime/dict-get
(F1-F10); this module exercises the full string / date / math / JSON /
array surface over the fixture tables. Everything is a built-in
``pyspark.sql.functions`` expression — JVM-side, inside whole-stage
codegen; no Python crosses the row path.

Oracle-stability notes: transcendental results (ln/log10) are rounded
to 6 decimals (libm last-ulp differences between JVM and C); sqrt is
IEEE-exact so it needs no rounding but gets the same treatment for
uniformity; date outputs are emitted as formatted strings; JSON
extraction compares as int.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables


@query(
    "fn_string_part",
    oracle=r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_name, 1, 4) AS name_prefix,
       concat(p_brand, ':', p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_snake,
       regexp_extract(p_name, '(\w+)$', 1) AS last_word,
       len(string_split(p_name, ' ')) AS n_words,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       length(p_name) AS name_len,
       reverse(p_brand) AS brand_rev,
       contains(p_type, 'PROMO') AS is_promo,
       starts_with(p_type, 'ECONOMY') AS is_economy
FROM part
""",
)
def fn_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, substring, concat, replace, regex
    extract, split, padding, reverse, containment predicates (the
    generalization of the reference's strip/upper/contains, F1/F2/P1)."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        # bigint: DuckDB len()/length() return BIGINT, Spark's are INT,
        # and the driver's value-hash is typed.
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.reverse("p_brand").alias("brand_rev"),
        F.col("p_type").contains("PROMO").alias("is_promo"),
        F.col("p_type").startswith("ECONOMY").alias("is_economy"),
    )


@query(
    "fn_date_orders",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dy,
       quarter(o_orderdate) AS qtr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-08-01') AS days_to_ref,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""",
)
def fn_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: component extraction, truncation, interval
    arithmetic, last_day, datediff, formatting (generalizing F3-F5)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("2001-08-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_ref"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "fn_math_prices",
    oracle="""
SELECT o_orderkey,
       abs(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS price_abs,
       round(o_totalprice, -2) AS price_hundreds,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       round(sqrt(o_totalprice), 6) AS price_sqrt,
       round(ln(o_totalprice), 6) AS price_ln,
       round(log10(o_totalprice), 6) AS price_log10,
       round(pow(o_totalprice / 100000, 2), 6) AS price_sq_scaled,
       round(fmod(o_totalprice, 100), 2) AS price_mod,
       CAST(sign(o_totalprice - 200000) AS INT) AS above_200k,
       greatest(o_totalprice, 200000.0) AS clamped_lo,
       round(least(o_totalprice, 200000.0), 2) AS clamped_hi
FROM orders
""",
)
def fn_math_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: abs/round/floor/ceil/sqrt/ln/log10/pow/mod/sign/
    greatest/least."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    p = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.abs(p.cast("decimal(18,2)")).cast("double").alias("price_abs"),
        F.round(p, -2).alias("price_hundreds"),
        F.floor(p).cast("long").alias("price_floor"),
        F.ceil(p).cast("long").alias("price_ceil"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.round(F.pow(p / 100000, 2), 6).alias("price_sq_scaled"),
        F.round(p % 100, 2).alias("price_mod"),
        F.signum(p - 200000).cast("int").alias("above_200k"),
        F.greatest(p, F.lit(200000.0)).alias("clamped_lo"),
        F.round(F.least(p, F.lit(200000.0)), 2).alias("clamped_hi"),
    )


@query(
    "fn_json_events",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY 1
""",
)
def fn_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (F10 generalization —
    the reference pulls nested JSON fields with dict .get; here it's
    get_json_object over events.props), then grouped aggregation."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "fn_array_embeddings",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
       round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS vec_sum,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
       round(CAST(list_min(embedding) AS DOUBLE), 6) AS vec_min,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
""",
)
def fn_array_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order functions over the embedding column:
    element access, fold (aggregate), transform+filter, zip_with dot
    product. These are the building blocks of the similarity-search
    operators (operators.similarity) — all JVM-side, no UDFs."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_sum = F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)
    dot_self = F.aggregate(
        F.zip_with(as_double, as_double, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_dim"),
        F.round(vec_sum, 4).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vec_min"),
        F.round(F.sqrt(dot_self), 6).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0))
        .cast("bigint")
        .alias("n_positive"),
    )


@query(
    "fn_case_banding",
    oracle="""
SELECT CASE WHEN l_quantity <= 10 THEN 'tiny'
            WHEN l_quantity <= 25 THEN 'small'
            WHEN l_quantity <= 40 THEN 'large'
            ELSE 'huge' END AS qty_band,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM lineitem
GROUP BY 1
""",
)
def fn_case_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded CASE scoring — the reference's recency-score kernel (F9,
    lambda_function.py:102-114) generalized to any numeric banding."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    band = (
        F.when(F.col("l_quantity") <= 10, "tiny")
        .when(F.col("l_quantity") <= 25, "small")
        .when(F.col("l_quantity") <= 40, "large")
        .otherwise("huge")
    )
    return (
        li.select(band.alias("qty_band"), "l_extendedprice")
        .groupBy("qty_band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
    )


@query(
    "fn_bitwise_keys",
    oracle="""
SELECT l_orderkey,
       l_orderkey & 255 AS low_byte,
       l_orderkey | 15 AS with_flags,
       xor(l_orderkey, l_partkey) AS key_xor,
       l_orderkey << 2 AS shifted_up,
       l_orderkey >> 3 AS shifted_down,
       CAST(bit_count(l_orderkey) AS BIGINT) AS popcount
FROM lineitem
WHERE l_linenumber = 1
""",
)
def fn_bitwise_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators: and/or/xor, shifts, popcount — the building
    blocks of hash partitioners, bloom filters, and bitmask flags."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    k = F.col("l_orderkey")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("with_flags"),
        k.bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shifted_up"),
        F.shiftright(k, 3).alias("shifted_down"),
        F.bit_count(k).cast("bigint").alias("popcount"),
    )


@query(
    "fn_levenshtein_brands",
    oracle="""
SELECT a.p_partkey AS part1, b.p_partkey AS part2,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b ON a.p_partkey + 100 = b.p_partkey
WHERE a.p_partkey % 7 = 0
""",
)
def fn_levenshtein_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance over paired part names — the scalar
    backing fuzzy string matching (complements the set-based dedup
    family, which scales where pairwise edit distance cannot)."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    a = part.select(F.col("p_partkey").alias("part1"), F.col("p_name").alias("name1"))
    b = part.select(F.col("p_partkey").alias("part2"), F.col("p_name").alias("name2"))
    return (
        a.filter(F.col("part1") % 7 == 0)
        .join(b, F.col("part1") + 100 == F.col("part2"))
        .select(
            "part1",
            "part2",
            F.levenshtein("name1", "name2").cast("bigint").alias("edit_dist"),
        )
    )


@query(
    "fn_null_handling",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED') AS segment_masked,
       ifnull(nullif(c_nationkey % 3, 0), -1) AS nation_mod_or_neg1,
       CASE WHEN c_acctbal > 5000 THEN NULL ELSE round(c_acctbal, 2) END AS small_bal,
       coalesce(CASE WHEN c_acctbal > 5000 THEN NULL ELSE round(c_acctbal, 2) END,
                0.0) AS small_bal_defaulted
FROM customer
""",
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar family: nullif / ifnull / coalesce chains —
    the declarative form of the reference's defensive .get(default)
    layer (SURVEY.md §1.4)."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    small_bal = F.when(F.col("c_acctbal") > 5000, F.lit(None)).otherwise(
        F.round("c_acctbal", 2)
    )
    return cust.select(
        "c_custkey",
        F.coalesce(
            F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("REDACTED")
        ).alias("segment_masked"),
        F.ifnull(F.nullif(F.col("c_nationkey") % 3, F.lit(0)), F.lit(-1)).alias(
            "nation_mod_or_neg1"
        ),
        small_bal.alias("small_bal"),
        F.coalesce(small_bal, F.lit(0.0)).alias("small_bal_defaulted"),
    )


@query(
    "fn_variant_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
""",
)
def fn_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VariantType lane:
    ``parse_json`` decodes once into the binary variant encoding, then
    ``try_variant_get`` does typed path extraction — unlike
    ``get_json_object`` (fn_json_events), the JSON is parsed ONCE per
    row regardless of how many paths are read, which is the difference
    that matters when events carry wide payloads at 100 TB."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    parsed = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    missing = F.try_variant_get("v", "$.missing", "int")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_missing"),
    )


@query(
    "fn_xml_documents",
    oracle="""
SELECT doc_id,
       doc_id AS xml_id,
       lang AS xml_lang,
       doc_id % 100 AS xml_score,
       doc_id % 100 AS xpath_score
FROM documents
""",
)
def fn_xml_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion lane (SURVEY.md §2.8 sibling of the JSON/VARIANT
    lanes): serialize a record to XML, parse it back with BOTH Spark
    XML surfaces — schema-driven ``from_xml`` and per-field XPath
    functions. DuckDB has no XML type, so the oracle predicts every
    parsed field from the row that generated it (the same
    derivation-oracle trick as the multimodal decode): a hash match
    proves the serialize→parse round trip, not just execution."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    xml = F.concat(
        F.lit("<rec><id>"), F.col("doc_id").cast("string"),
        F.lit("</id><lang>"), F.col("lang"),
        F.lit("</lang><score>"), (F.col("doc_id") % 100).cast("string"),
        F.lit("</score></rec>"),
    )
    parsed = docs.select(
        "doc_id",
        xml.alias("x"),
        F.from_xml(xml, "id BIGINT, lang STRING, score BIGINT").alias("r"),
    )
    return parsed.select(
        "doc_id",
        F.col("r.id").alias("xml_id"),
        F.col("r.lang").alias("xml_lang"),
        F.col("r.score").alias("xml_score"),
        F.expr("xpath_long(x, '/rec/score')").alias("xpath_score"),
    )


@query(
    "fn_collation_ci_distinct",
    oracle="""
WITH cased AS (
  SELECT lang,
         CASE WHEN doc_id % 3 = 0 THEN upper(lang)
              WHEN doc_id % 3 = 1 THEN lang
              ELSE upper(substr(lang, 1, 1)) || substr(lang, 2) END AS lang_cased
  FROM documents
)
SELECT lang,
       COUNT(DISTINCT lang_cased) AS n_binary,
       COUNT(DISTINCT lower(lang_cased)) AS n_ci
FROM cased
GROUP BY lang
""",
)
def fn_collation_ci_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): DISTINCT under the UTF8_LCASE
    collation collapses case variants that binary DISTINCT keeps apart
    — collation-aware comparison pushed into the aggregation itself,
    where pre-Spark-4 code had to lower() every column by hand. The
    oracle models the collation with lower() (equivalent for this
    ASCII domain); case variants are synthesized deterministically from
    doc_id."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    cased = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("lang"))
        .when(F.col("doc_id") % 3 == 1, F.col("lang"))
        .otherwise(F.initcap("lang"))
    )
    return (
        docs.select("lang", cased.alias("lang_cased"))
        .groupBy("lang")
        .agg(
            F.count_distinct("lang_cased").alias("n_binary"),
            F.count_distinct(F.collate("lang_cased", "UTF8_LCASE")).alias("n_ci"),
        )
    )


@query(
    "fn_url_parse",
    oracle="""
SELECT doc_id,
       'docs-' || CAST(doc_id % 20 AS VARCHAR) || '.example.org' AS host,
       '/corpus/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
       'rev=' || CAST(doc_id % 7 AS VARCHAR) AS query,
       CAST(doc_id % 7 AS VARCHAR) AS rev
FROM documents
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via ``parse_url`` (HOST/PATH/QUERY and keyed
    query-parameter extraction) over deterministically synthesized URLs
    — the web-corpus provenance-parsing primitive. DuckDB has no
    parse_url, so the oracle re-derives each component from the
    generating row (derivation-oracle pattern)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    url = F.concat(
        F.lit("https://docs-"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.org/corpus/"), F.col("lang"),
        F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?rev="), (F.col("doc_id") % 7).cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("rev")).alias("rev"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE round(o_totalprice / (o_orderkey % 5), 6) END AS safe_div,
       CAST(CASE WHEN o_orderkey % 2 = 1 THEN NULL
            ELSE -2147483648 END AS INTEGER) AS safe_sub,
       CAST(CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_orderkey END AS BIGINT) AS safe_cast
FROM orders
""",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic via the ``try_*`` function family —
    division by zero, integer overflow, and lossy casts return NULL
    instead of failing the job. At 100 TB a single poisoned row
    aborting a 6-hour job is the difference between these and their
    unchecked twins; the NULLs then flow to a quarantine filter (the
    multimodal_quarantine pattern) instead of a stack trace. The
    oracle predicts each NULL from the generating arithmetic: mod-5
    zero denominators, mod-2-driven INT_MIN - 1 overflow, and a
    mod-3-gated string that fails numeric parsing. The parsed value is
    cast DECIMAL(9,0)→BIGINT on both sides: DECIMAL outputs are
    driver-hostile (Spark pandas keeps ``Decimal('1')``, DuckDB pandas
    converts to float64 ``1.0`` — same value, different stringification),
    so decimals never appear in a registered output schema."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), (k % 5).cast("double")), 6
        ).alias("safe_div"),
        F.try_subtract(
            F.lit(-2147483648).cast("int"), (k % 2).cast("int")
        ).alias("safe_sub"),
        F.try_to_number(
            F.when(k % 3 == 0, F.lit("oops")).otherwise(k.cast("string")),
            F.lit("999999999"),
        )
        .cast("long")
        .alias("safe_cast"),
    )


@query(
    "fn_mask_customer",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
           c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS name_masked,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_digits_hidden,
       concat(substr(c_name, 1, 3),
              regexp_replace(regexp_replace(regexp_replace(substr(c_name, 4),
                  '[A-Za-z]', '*', 'g'), '[0-9]', '*', 'g'), '[^*]', '*', 'g'))
         AS name_show3
FROM customer
""",
)
def fn_mask_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data masking (Spark 3.5 ``mask``) — the column-level PII control
    warehouses attach to governed views: full character-class masking
    (upper→X, lower→x, digit→n), digit-only hiding, and a
    show-first-3 partial mask. Complements text_redact_pii (regex
    pattern redaction inside free text) with the structured-column
    variant. Pure scan-stage expressions; the oracle rebuilds each
    mask with character-class regex_replace chains, so the two
    engines must agree on every output character."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    name = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.mask(name).alias("name_masked"),
        # F.lit(None) = "keep this character class" (Python None would
        # mean "use the default replacement" in the PySpark wrapper)
        F.mask(
            name,
            upperChar=F.lit(None),
            lowerChar=F.lit(None),
            digitChar=F.lit("#"),
            otherChar=F.lit(None),
        ).alias("name_digits_hidden"),
        F.concat(
            F.substring(name, 1, 3),
            F.mask(
                F.substring(name, 4, 2_000_000),
                upperChar=F.lit("*"),
                lowerChar=F.lit("*"),
                digitChar=F.lit("*"),
                otherChar=F.lit("*"),
            ),
        ).alias("name_show3"),
    )


@query(
    "fn_calendar_orders",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
       CAST(isodow(o_orderdate) AS INT) AS iso_dow,
       CAST(date_diff('day', date_trunc('month', o_orderdate),
            last_day(CAST(o_orderdate AS DATE))) + 1 AS INT) AS days_in_month,
       strftime(CAST(o_orderdate AS DATE)
         + to_days(CAST(CASE WHEN (5 - isodow(o_orderdate) + 7) % 7 = 0 THEN 7
                ELSE (5 - isodow(o_orderdate) + 7) % 7 END AS INT)), '%Y-%m-%d')
         AS next_friday
FROM orders
""",
)
def fn_calendar_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic breadth over the order dates: month shifts
    with end-of-month clamping (add_months), month boundaries, ISO
    week/day-of-week numbering, month lengths, and strictly-next
    weekday scheduling (next_day) — the business-calendar derivations
    every reporting layer builds on the F4/F5 date lane
    (``lambda_function.py:21,88``).

    Cross-engine trap list this query pins: Spark ``dayofweek`` is
    1=Sunday while DuckDB ``isodow`` is 1=Monday (bridged via Spark
    ``weekday()+1`` ≡ isodow); DuckDB has no ``next_day`` (bridged by
    the isodow offset formula with the 0→7 strictly-next adjustment);
    both engines clamp month addition to month ends. Every output
    renders as a formatted date string or exact int — zero float
    anywhere, pure scan-stage codegen."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = F.col("o_orderdate")
    iso_dow = (F.weekday(d) + 1).cast("int")
    return orders.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        iso_dow.alias("iso_dow"),
        (F.datediff(F.last_day(d), F.trunc(d, "month")) + 1)
        .cast("int")
        .alias("days_in_month"),
        F.date_format(F.next_day(d, "Friday"), "yyyy-MM-dd").alias(
            "next_friday"
        ),
    )


# ---------------------------------------------------------------------------
# IPv4 parsing / CIDR classification (log-analytics lane)
# ---------------------------------------------------------------------------


@query(
    "fn_ipv4_classify",
    oracle="""
WITH ip AS (
  SELECT o_orderkey,
         ('0x' || substr(md5('ip' || o_orderkey), 1, 15))::BIGINT % 4294967296
           AS ip_int
  FROM orders
)
SELECT o_orderkey,
       CAST(ip_int // 16777216 AS VARCHAR) || '.' ||
       CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((ip_int // 256) % 256 AS VARCHAR) || '.' ||
       CAST(ip_int % 256 AS VARCHAR) AS ip,
       CASE
         WHEN ip_int // 16777216 = 10 THEN 'rfc1918/8'
         WHEN ip_int // 1048576 = 2748 THEN 'rfc1918/12'
         WHEN ip_int // 65536 = 49320 THEN 'rfc1918/16'
         WHEN ip_int // 16777216 = 127 THEN 'loopback'
         WHEN ip_int // 65536 = 43518 THEN 'linklocal'
         ELSE 'public'
       END AS block,
       ip_int // 16777216 != 10 AND ip_int // 1048576 != 2748
         AND ip_int // 65536 != 49320 AS is_public_routable,
       CAST(ip_int // 16777216 AS VARCHAR) || '.' ||
       CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((ip_int // 256) % 256 AS VARCHAR) || '.0/24' AS subnet24
FROM ip
""",
)
def fn_ipv4_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address decomposition and CIDR-block classification over
    md5-synthesized addresses (derivation-oracle pattern): dotted-quad
    rendering, RFC-1918 / loopback / link-local membership via prefix
    integer division (ip >> (32−bits) == net >> (32−bits), spelled as
    exact int64 division so both engines share the arithmetic), and a
    /24 subnet rollup key — the log-enrichment lane (client-IP
    classification, private-traffic filtering, per-subnet abuse
    aggregation) that at 100 TB must run as scan-stage integer ops,
    never a per-row UDF or regex parse. The CASE chain tests blocks
    most-specific-last-octet-first the way routing tables match, and
    every branch is a single integer compare: /8 → ip div 2^24 = 10,
    172.16/12 → ip div 2^20 = 2748 (172·16 + 12), 192.168/16 →
    ip div 2^16 = 49320 (192·256 + 168), 169.254/16 → 43518."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    from etl_pipeline_sam_gov_spark.operators.dedup import _spark_hash60

    ip = _spark_hash60(
        F.concat(F.lit("ip"), F.col("o_orderkey").cast("string"))
    ) % F.lit(4294967296)
    d = lambda n: F.expr(f"ip_int div {n}")  # noqa: E731
    withip = orders.select("o_orderkey", ip.alias("ip_int"))
    quad = F.concat_ws(
        ".",
        d(16777216).cast("string"),
        (d(65536) % 256).cast("string"),
        (d(256) % 256).cast("string"),
        (F.col("ip_int") % 256).cast("string"),
    )
    block = (
        F.when(d(16777216) == 10, "rfc1918/8")
        .when(d(1048576) == 2748, "rfc1918/12")
        .when(d(65536) == 49320, "rfc1918/16")
        .when(d(16777216) == 127, "loopback")
        .when(d(65536) == 43518, "linklocal")
        .otherwise("public")
    )
    routable = (
        (d(16777216) != 10) & (d(1048576) != 2748) & (d(65536) != 49320)
    )
    subnet = F.concat(
        d(16777216).cast("string"), F.lit("."),
        (d(65536) % 256).cast("string"), F.lit("."),
        (d(256) % 256).cast("string"), F.lit(".0/24"),
    )
    return withip.select(
        "o_orderkey",
        quad.alias("ip"),
        block.alias("block"),
        routable.alias("is_public_routable"),
        subnet.alias("subnet24"),
    )


# ---------------------------------------------------------------------------
# Column encryption round-trip (data-protection surface)
# ---------------------------------------------------------------------------

#: Fixed demo key (16 bytes = AES-128). Real deployments pull this from
#: a KMS via a credential provider; the engine surface is the same.
_AES_KEY = "0123456789abcdef"


@query(
    "fn_aes_roundtrip",
    oracle="""
SELECT doc_id,
       md5(text) AS plain_md5,
       md5(text) AS roundtrip_md5,
       TRUE AS roundtrip_ok
FROM documents
""",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: ``aes_encrypt`` →
    ``aes_decrypt`` round-trip over the document text (AES-128-ECB —
    the deterministic mode, chosen HERE so the query is re-runnable
    and certifiable; production encryption wants GCM, whose random IV
    is exactly what makes it non-deterministic). The oracle cannot run
    AES, so it certifies the contract instead: the decrypted text's
    md5 must equal the plaintext's md5 row-for-row — a failed
    decryption or any ciphertext corruption breaks the hash match.
    Both the padding path (plaintext not block-aligned) and unicode
    round-tripping ride along for free.

    Scale shape: pure scan-stage expression work, JVM-side codegen'd
    cipher per row, no shuffle."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    key = F.lit(_AES_KEY)
    mode = F.lit("ECB")
    ct = F.aes_encrypt(F.col("text").cast("binary"), key, mode)
    rt = F.aes_decrypt(F.col("ct"), key, mode).cast("string")
    return (
        docs.select("doc_id", "text", ct.alias("ct"))
        .select(
            "doc_id",
            F.md5("text").alias("plain_md5"),
            F.md5(rt).alias("roundtrip_md5"),
            (F.md5(rt) == F.md5("text")).alias("roundtrip_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Timezone-aware local bucketing (IANA zone conversions)
# ---------------------------------------------------------------------------

TZ_ZONES = ("UTC", "America/New_York", "Asia/Tokyo", "Asia/Kolkata")


def _tz_sql(conv) -> str:
    """ONE SQL text, parameterized by the engine's UTC→zone conversion
    spelling. Asia/Kolkata exercises the non-integer (+5:30) offset —
    the classic bug sieve for hand-rolled hour arithmetic."""
    blocks = []
    for tz in TZ_ZONES:
        c = conv(tz, "ts")
        blocks.append(f"""
SELECT '{tz}' AS tz,
       CAST(hour({c}) AS INT) AS local_hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT CAST({c} AS DATE)) AS BIGINT) AS n_local_dates
FROM events GROUP BY 2""")
    return "\nUNION ALL\n".join(blocks)


@query(
    "fn_timezone_local_hours",
    oracle=_tz_sql(lambda tz, ts: f"timezone('{tz}', timezone('UTC', {ts}))"),
)
def fn_timezone_local_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA-timezone local bucketing: the UTC event stream re-bucketed
    into each market's LOCAL hour-of-day (activity heatmaps, local-SLA
    windows, "business hours" filters — the first thing a global
    product's analytics does with a UTC log). Four zones cover the
    trap matrix: UTC identity, a negative offset (New York, winter
    UTC−5), a positive one (Tokyo +9), and the half-hour offset
    Kolkata +5:30 that breaks any hour-arithmetic shortcut — both
    engines resolve the SAME IANA tzdata, which is exactly the
    capability under test (Spark ``convert_timezone`` vs DuckDB's
    two-step ``timezone()`` — different spellings, one tz database).
    Local-date counts ride along because day-boundary shifts are the
    other half of the trap.

    Exactness: pure integer buckets, no floats anywhere. Scale: one
    scan, four partial-combined aggs unioned — at 100 TB the union
    shares the single exchange per zone; zone count is fixed."""
    load_tables(spark, sf_dir, ("events",))
    return spark.sql(
        _tz_sql(lambda tz, ts: f"convert_timezone('UTC', '{tz}', {ts})")
    )
