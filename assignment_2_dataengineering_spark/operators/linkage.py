"""Probabilistic record linkage (Fellegi–Sunter 1969).

Blocked candidate pairs scored by a per-field likelihood RATIO: a field
agreeing multiplies the score by m/u, disagreeing by (1-m)/(1-u), where
m = P(agree | same entity) is a fixed prior and u = P(agree | random
pair) is ESTIMATED FROM THE DATA as Σ freq(v)²/N² — rarer values make
agreement more surprising, exactly the intuition the model formalizes.

Two deliberate engineering choices for engine-exactness:
- the score is the plain likelihood ratio (product of rationals built
  from exact integer counts), NOT the textbook log₂ weight sum — log()
  differs in the last ulp across math libraries, a product of identical
  doubles does not;
- u estimation is a 1-row aggregate per field cross-joined back via
  broadcast, so the full pipeline (estimate → block → compare → score)
  is one declarative plan with no driver round-trip.

Scale shape: u aggregates are value-histogram-sized; candidate pairs
are generated per block (never all-pairs) and the comparison kernel is
pure codegen. Skewed blocks inherit the same remedy as every other
banded operator in this repo (cap or salt the block key).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fellegi_sunter_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    compare_cols: list[str],
    m_pct: int = 90,
    threshold: float = 1.0,
) -> DataFrame:
    """Score blocked record pairs with the Fellegi–Sunter likelihood
    ratio over `compare_cols` equality agreements. Returns
    (id_a, id_b, agree_<col>... int flags, round(score, 4)) for pairs
    with score ≥ threshold. m defaults to 0.9 for every field; u comes
    from the data (Σ freq²/N², ordered-pair convention, exact integer
    counts divided once into a double)."""
    n_df = df.agg(F.count(F.lit(1)).alias("__n"))

    u_cols = []
    u_dfs = []
    for c in compare_cols:
        u = (
            df.groupBy(c)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(F.sum(F.col("__c") * F.col("__c")).alias(f"__sq_{c}"))
        )
        u_dfs.append(u)
        u_cols.append(c)

    base = df.select(
        F.col(id_col).alias("__id"), F.col(block_col).alias("__blk"), *compare_cols
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b, (F.col("a.__blk") == F.col("b.__blk")) & (F.col("a.__id") < F.col("b.__id"))
    )
    for u in u_dfs:
        pairs = pairs.crossJoin(F.broadcast(u))
    pairs = pairs.crossJoin(F.broadcast(n_df))

    m = F.lit(m_pct) / F.lit(100.0)
    one_minus_m = F.lit(100 - m_pct) / F.lit(100.0)
    score = F.lit(1.0)
    selects = [
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
    ]
    for c in compare_cols:
        agree = (F.col(f"a.{c}") == F.col(f"b.{c}")).cast("int")
        u_val = F.col(f"__sq_{c}") / (F.col("__n") * F.col("__n"))
        factor = F.when(agree == 1, m / u_val).otherwise(
            one_minus_m / (F.lit(1.0) - u_val)
        )
        score = score * factor
        selects.append(agree.alias(f"agree_{c}"))
    selects.append(F.round(score, 4).alias("score"))
    return pairs.select(*selects).filter(F.col("score") >= F.lit(threshold))


def fellegi_sunter_oracle_sql(
    source_sql: str,
    id_col: str,
    block_col: str,
    compare_cols: list[str],
    m_pct: int = 90,
    threshold: float = 1.0,
) -> str:
    """DuckDB twin of fellegi_sunter_pairs: same u estimation, same
    factor expressions in the same left-to-right multiplication order
    (double products are order-sensitive; the generator pins it)."""
    u_ctes = ",\n".join(
        f"""u_{c} AS (SELECT sum(cc * cc) AS sq FROM (
              SELECT count(*) AS cc FROM src GROUP BY {c}))"""
        for c in compare_cols
    )
    m = f"({m_pct} / 100.0)"
    omm = f"({100 - m_pct} / 100.0)"
    factors = []
    agree_cols = []
    for c in compare_cols:
        u_val = f"(u_{c}.sq / (CAST(nn.n AS DOUBLE) * nn.n))"
        factors.append(
            f"(CASE WHEN a.{c} = b.{c} THEN {m} / {u_val}"
            f" ELSE {omm} / (1.0 - {u_val}) END)"
        )
        agree_cols.append(
            f"CAST(CASE WHEN a.{c} = b.{c} THEN 1 ELSE 0 END AS INTEGER) AS agree_{c}"
        )
    # left-assoc product in declaration order, seeded with 1.0 like Spark
    score = reduce(lambda acc, f: f"({acc} * {f})", factors, "1.0")
    u_joins = ", ".join(f"u_{c}" for c in compare_cols)
    return f"""
    WITH src AS ({source_sql}),
    nn AS (SELECT count(*) AS n FROM src),
    {u_ctes}
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           {", ".join(agree_cols)},
           round({score}, 4) AS score
    FROM src a JOIN src b
      ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col},
      nn, {u_joins}
    WHERE round({score}, 4) >= {threshold}
    """
