"""Approximate matching and semi-structured extraction — two surfaces
a production analytics engine is expected to carry that the reference
schema exercises naturally:

- blocked fuzzy matching (edit-distance entity resolution) over part
  names: the string-similarity sibling of the dedup tier's set/vector
  similarity operators (operators/dedup.py, operators/similarity.py);
- JSON path extraction over the events.props payload column — the
  reference parses nested JSON payloads imperatively
  (extractor.py:229-235 hand-copies fields out of dicts); here the
  same reach-into-payload is a codegen expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linkage import fellegi_sunter_oracle_sql, fellegi_sunter_pairs
from ..sources.tables import load_table
from .registry import register


@register(
    "q_fuzzy_match",
    oracle="""
    WITH names AS (
        SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS blk FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM names a
    JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY edit_dist, name_a, name_b
    """,
    tags=("match", "dedup"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance matching: near-identical part names
    (levenshtein ≤ 3) found WITHOUT the all-pairs cross product. The
    plan distincts names first (64 survive from 2k rows here; the same
    distinct-first shape is what makes 100 TB viable when the name
    domain is far smaller than the fact table), blocks on the head
    noun, and only intra-block pairs pay the edit-distance kernel —
    the string twin of minhash banding: candidate generation by cheap
    equality, exact verification on candidates only. levenshtein() is
    a JVM builtin, no Python in the loop."""
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("blk", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.select(F.col("p_name").alias("name_a"), "blk")
    b = names.select(F.col("p_name").alias("name_b"), F.col("blk").alias("blk_b"))
    return (
        a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("name_a", "name_b", "edit_dist")
        .orderBy("edit_dist", "name_a", "name_b")
    )


@register(
    "q_json_props",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS k_avg,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("functions", "scan"),
    bench=True,  # codegen JSON path extraction at scan speed
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props payload string, aggregated
    per event type. get_json_object compiles to a JVM JSON path walk
    inside whole-stage codegen — the declarative replacement for the
    reference's payload.get(...) dict-walking (extractor.py:229-235).
    One scan, one partial-aggregated shuffle on a 4-value key; at
    100 TB prefer from_json into a typed struct ONCE at ingest (see
    streaming/ingest.py) over per-query path walks, which this query's
    single-pass shape demonstrates is still scan-bound when ad hoc."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(k).alias("k_min"),
            F.max(k).alias("k_max"),
            F.round(F.avg(k), 4).alias("k_avg"),
            F.sum(F.when(k >= 50, 1).otherwise(0)).alias("n_high"),
        )
        .orderBy("event_type")
    )


@register(
    "q_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CASE WHEN json_extract_string(props, '$.missing')
                           IS NOT NULL THEN 1 END) AS BIGINT) AS n_missing_key,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
               AS k_avg,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS k_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("functions", "scan"),
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    parse_json ONCE into a variant column, then typed variant_get
    probes — the parse-once / extract-many pattern that replaces
    repeated get_json_object path walks (each of which re-parses the
    string). try_variant_get on an absent path yields NULL instead of
    failing, which is the schema-drift posture an evolving event
    payload needs. At 100 TB the variant column is what you'd persist:
    Parquet shreds it columnar, so later probes prune like real
    columns. Values and aggregates match the string-path oracle
    exactly — VARIANT changes the storage/access shape, not the
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    parsed = ev.select("event_type", v.alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "int")
    missing = F.try_variant_get(F.col("v"), "$.missing", "string")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(missing).alias("n_missing_key"),
            F.round(F.avg(k), 4).alias("k_avg"),
            F.max(k).alias("k_max"),
        )
        .orderBy("event_type")
    )


@register(
    "q_entity_resolve",
    oracle="""
    WITH RECURSIVE
    names AS (
        SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS blk FROM part
    ),
    jp AS (
        SELECT a.p_name AS id_a, b.p_name AS id_b
        FROM names a
        JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM jp
              UNION ALL SELECT id_b, id_a FROM jp),
    reach(a, b) AS (
        SELECT p_name, p_name FROM names
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lab AS (SELECT a AS p_name, min(b) AS entity FROM reach GROUP BY a),
    pc AS (SELECT p_name, count(*) AS n FROM part GROUP BY 1)
    SELECT lab.entity,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(sum(pc.n) AS BIGINT) AS n_parts
    FROM lab JOIN pc USING (p_name)
    GROUP BY lab.entity
    ORDER BY lab.entity
    """,
    tags=("match", "dedup", "graph"),
)
def q_entity_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked edit-distance candidate
    pairs (the q_fuzzy_match shape) fed through connected components
    (operators/dedup.dedup_clusters — generic over id type, min-label
    works on strings), rolled up to canonical entities: each name
    variant maps to its component's lexicographic-min name, with
    variant and underlying-row counts. The full resolve-then-aggregate
    pipeline every catalog/CRM dedup runs; the oracle is a recursive-
    CTE transitive closure — an exact cross-engine check on an
    iterative distributed algorithm composed with fuzzy matching."""
    from ..operators.dedup import dedup_clusters

    part = load_table(spark, sf_dir, "part")
    names = (
        part.select("p_name")
        .distinct()
        .withColumn("blk", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.select(F.col("p_name").alias("name_a"), "blk")
    b = names.select(F.col("p_name").alias("name_b"), F.col("blk").alias("blk_b"))
    pairs = (
        a.join(
            b, (F.col("blk") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b"))
        )
        .filter(F.levenshtein("name_a", "name_b") <= 3)
        .select(F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b"))
    )
    labels = dedup_clusters(
        pairs, names.select(F.col("p_name").alias("doc_id")), id_col="doc_id"
    ).select(F.col("doc_id").alias("p_name"), F.col("cluster_id").alias("entity"))
    per_name = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("__n"))
    return (
        labels.join(per_name, "p_name")
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.sum("__n").alias("n_parts"),
        )
        .orderBy("entity")
    )


@register(
    "q_prob_linkage",
    oracle=fellegi_sunter_oracle_sql(
        "SELECT doc_id, lang, source, n_chars // 50 AS len_bucket FROM documents",
        "doc_id",
        "lang",
        ["source", "len_bucket"],
        threshold=20.0,
    ),
    tags=("match", "linkage"),
)
def q_prob_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic linkage over documents: block on
    lang, compare (source, 50-char length bucket), score with the
    likelihood ratio m/u vs (1-m)/(1-u) where u is estimated from the
    data's value frequencies (operators/linkage.py — rationale for the
    ratio-not-log choice and the broadcast u-estimation there). Pairs
    scoring ≥ 20 are link candidates: both fields must agree, and the
    value-specific u makes rare-value agreement dominate the ranking."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / 50).alias("len_bucket"),
    )
    return fellegi_sunter_pairs(
        docs, "doc_id", "lang", ["source", "len_bucket"], threshold=20.0
    )
