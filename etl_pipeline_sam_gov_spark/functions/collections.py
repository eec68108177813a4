"""Collection / generator function coverage: explode (UDTF-like lateral
views), map construction & access, struct↔JSON round-trips, sequence
generation (SURVEY.md §2.8 "array / map / json" and §2.10 "UDTF-like").

The reference touches none of these (its only nested access is the
``officeAddress`` dict get, ``lambda_function.py:76-77``); they complete
the engine's type surface: ``ArrayType`` expansion via ``explode`` /
``posexplode``, ``MapType`` via ``create_map``, structured JSON via
``from_json`` / ``to_json`` (the declarative generalization of F10).

Scale notes: ``explode`` multiplies rows inside whole-stage codegen
without a shuffle — at 100 TB the only concern is downstream skew if
one row expands enormously (bounded here: words per name, n≤4
sequences). ``from_json`` with an explicit schema beats repeated
``get_json_object`` calls (single parse per row, pruned to the fields
the query reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables


@query(
    "fn_explode_words",
    oracle="""
SELECT word, pos, COUNT(*) AS n, MIN(p_partkey) AS first_part
FROM (
  SELECT p_partkey,
         unnest(string_split(p_name, ' ')) AS word,
         generate_subscripts(string_split(p_name, ' '), 1) AS pos
  FROM part
) t
GROUP BY word, pos
""",
)
def fn_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-like lateral view: posexplode of the tokenized part name,
    then word×position frequency. One-to-many expansion with no
    shuffle until the final aggregation."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return (
        part.select(
            "p_partkey",
            F.posexplode(F.split("p_name", " ")).alias("pos0", "word"),
        )
        # posexplode is 0-based; DuckDB subscripts are 1-based (and BIGINT).
        .select("p_partkey", "word", (F.col("pos0") + 1).cast("bigint").alias("pos"))
        .groupBy("word", "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_partkey").alias("first_part"),
        )
    )


@query(
    "fn_map_part",
    oracle="""
SELECT p_partkey,
       map_extract(MAP {'brand': p_brand, 'type': p_type}, 'brand')[1] AS m_brand,
       map_extract(MAP {'brand': p_brand, 'type': p_type}, 'type')[1] AS m_type,
       CAST(cardinality(MAP {'brand': p_brand, 'type': p_type}) AS BIGINT) AS m_size,
       array_to_string(map_keys(MAP {'brand': p_brand, 'type': p_type}), ',') AS m_keys
FROM part
""",
)
def fn_map_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: create_map, element access, size, key listing
    (the typed generalization of the reference's dict lookup, J1/F8).
    Keys are emitted as a joined string — map column ordering is
    engine-specific, the string pins it."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return part.select(
        "p_partkey",
        m.getItem("brand").alias("m_brand"),
        m.getItem("type").alias("m_type"),
        # bigint: DuckDB cardinality() is UBIGINT, Spark size() is INT.
        F.size(m).cast("bigint").alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


@query(
    "fn_json_roundtrip_events",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       -- CAST to VARCHAR: DuckDB to_json yields the JSON logical type,
       -- Spark to_json a plain string; the driver's value-hash is typed.
       CAST(to_json(struct_pack(
           k := CAST(json_extract(props, '$.k') AS INT),
           t := event_type)) AS VARCHAR) AS packed
FROM events
""",
)
def fn_json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured JSON round-trip: from_json with an explicit schema
    (single parse, field-pruned — the scale path vs per-field
    get_json_object), then to_json of a named struct."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.to_json(
            F.struct(
                parsed.getField("k").alias("k"),
                F.col("event_type").alias("t"),
            )
        ).alias("packed"),
    )


@query(
    "fn_sequence_expand",
    oracle="""
SELECT p_partkey, unnest(generate_series(1, p_size % 4 + 1)) AS i
FROM part
""",
)
def fn_sequence_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator expression: sequence(1, n) + explode — the set-returning
    primitive behind date spines, retry schedules, and row multiplication
    (bounded n keeps expansion skew-free)."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return part.select(
        "p_partkey",
        F.explode(
            F.sequence(F.lit(1).cast("long"), (F.col("p_size") % 4 + 1).cast("long"))
        ).alias("i"),
    )


MAP_HOF_MIN = 4  #: keep entries whose doubled count reaches this


@query(
    "fn_map_hof_events",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY user_id, event_type
),
kept AS (SELECT user_id, event_type, n * 2 AS n2 FROM c WHERE n * 2 >= {MAP_HOF_MIN})
SELECT c.user_id,
       CAST(COUNT(DISTINCT c.event_type) AS INT) AS n_types,
       CAST((SELECT COUNT(*) FROM kept k WHERE k.user_id = c.user_id) AS INT) AS n_kept,
       coalesce((SELECT string_agg(k.event_type || '=' || k.n2, ',' ORDER BY k.event_type)
                 FROM kept k WHERE k.user_id = c.user_id), '') AS kept_entries
FROM c GROUP BY c.user_id
""",
)
def fn_map_hof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions end to end: build a per-user
    event_type→count map (map_from_entries over a grouped collect),
    rescale every value with transform_values, drop small entries with
    map_filter, and render the surviving entries deterministically
    (map_entries → array_sort → concat_ws) — the map-typed analog of
    the array HOF lane. The oracle computes the same result
    relationally, pinning the HOF semantics rather than DuckDB's map
    runtime."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct("event_type", "n"))
    )
    per_user = counts.groupBy("user_id").agg(m.alias("m"))
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v >= MAP_HOF_MIN)
    entries = F.array_sort(F.map_entries(kept))
    return per_user.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.size(entries).alias("n_kept"),
        F.concat_ws(
            ",",
            F.transform(
                entries, lambda e: F.concat_ws("=", e["key"], e["value"])
            ),
        ).alias("kept_entries"),
    )
