"""Bucketed table writes for co-located joins (SURVEY.md §4 / brief:
"bucketing for co-located joins").

Writing both sides of a recurring fact-fact join bucketed (and sorted)
on the join key lets Spark execute the join with ZERO shuffle exchanges
— each bucket pair joins locally. At 100 TB this converts the dominant
repeated cost (shuffling the fact tables per query) into a one-time
write-side cost. The price: bucket count is fixed at write time
(choose for target-cluster parallelism) and only saveAsTable targets
support it (catalog-managed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
