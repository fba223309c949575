"""Category domain rules (SURVEY.md §2.8 A1-A3; etl/transform.py:284-316).

Semantics per column:
1. map lookup on the normalized cell text (keys normalized the same way);
   hit → mapped value, miss → ORIGINAL (un-normalized) value;
2. optional domain enforcement: post-map values outside ``allowed`` (and
   non-null) are coerced to ``coerce_to`` (default null);
3. report: distinct out-of-domain values + counts.

Implementation is a literal ``create_map`` expression — for large maps
this becomes a broadcast join against a mapping table, but contract maps
are tiny (tens of entries), so an inline expression keeps it inside
whole-stage codegen with zero shuffle.
"""

from __future__ import annotations

from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from gov_ec_pipeline_etl_spark.functions.text import norm_text_py


def category_expr(
    col: Column | str,
    mapping: dict[str, str] | None = None,
    allowed: list[str] | None = None,
    coerce_to: str | None = None,
    ascii_fast_path: bool = True,
) -> Column:
    """Build the standardized-value expression for one category column."""
    c = F.col(col) if isinstance(col, str) else col
    mapped = c
    if mapping:
        norm_map = {norm_text_py(k): v for k, v in mapping.items()}
        # Normalize the cell for LOOKUP only; a miss keeps the original.
        if ascii_fast_path:
            lookup = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
        else:
            from gov_ec_pipeline_etl_spark.functions.text import norm_text

            lookup = norm_text(c)
        mexpr = F.create_map(*[F.lit(x) for x in chain(*norm_map.items())])
        mapped = F.coalesce(mexpr[lookup], c)
    if allowed is not None:
        mapped = F.when(
            mapped.isNull() | mapped.isin(list(allowed)), mapped
        ).otherwise(F.lit(coerce_to))
    return mapped


def apply_category_rules(
    df: DataFrame, rules: dict[str, dict], ascii_fast_path: bool = True
) -> DataFrame:
    """rules: {column: {map: {...}, allowed: [...], coerce_to: ...}}"""
    exprs = []
    for c in df.columns:
        if c in rules:
            r = rules[c]
            exprs.append(
                category_expr(
                    c,
                    r.get("map"),
                    r.get("allowed"),
                    r.get("coerce_to"),
                    ascii_fast_path,
                ).alias(c)
            )
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def apply_category_via_join(
    df: DataFrame,
    column: str,
    mapping_df: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    ascii_fast_path: bool = True,
) -> DataFrame:
    """A1's large-map form: broadcast-join against a mapping TABLE
    (key already normalized) instead of an inline literal map — the
    right shape when the mapping has thousands+ entries (gazetteer,
    code lists). Semantics identical to ``category_expr`` with the same
    mapping: hit → mapped value, miss → original value."""
    if ascii_fast_path:
        lookup = F.regexp_replace(F.lower(F.trim(F.col(column))), r"\s+", " ")
    else:
        from gov_ec_pipeline_etl_spark.functions.text import norm_text

        lookup = norm_text(F.col(column))
    joined = df.withColumn("__lookup", lookup).join(
        F.broadcast(
            mapping_df.select(
                F.col(key_col).alias("__lookup"), F.col(value_col).alias("__mapped")
            )
        ),
        "__lookup",
        "left",
    )
    return joined.withColumn(
        column, F.coalesce("__mapped", F.col(column))
    ).drop("__lookup", "__mapped")


def out_of_domain_report(
    df: DataFrame, column: str, allowed: list[str], approx: bool = False
) -> dict:
    """A3: offending distinct values + count. ``approx=True`` switches to
    approx_count_distinct for 100 TB-scale reporting."""
    oob = df.where(~F.col(column).isin(allowed) & F.col(column).isNotNull())
    distinct_fn = (
        F.approx_count_distinct(column) if approx else F.countDistinct(column)
    )
    row = oob.agg(
        F.sort_array(F.collect_set(column)).alias("values"),
        F.count(F.lit(1)).alias("n_rows"),
        distinct_fn.alias("n_distinct"),
    ).first()
    return {
        "values": list(row["values"]),
        "n_rows": row["n_rows"],
        "n_distinct": row["n_distinct"],
    }
