"""CKAN catalog as a native Spark data source (PySpark 4 Python
DataSource API): ``spark.read.format("ckan")``.

The reference drives its run from a CKAN ``package_show`` catalog call
(etl/extract.py — S1/S2 in SURVEY.md §2.1); the engine's Spark-first
face of that is a declarative scan:

    spark.dataSource.register(CkanDataSource)
    df = (spark.read.format("ckan")
          .option("base_url", "https://catalog.example")
          .option("packages", "pkg-a,pkg-b")
          .option("prefix", "detenciones")        # optional F5 filter
          .load())

Scale posture: one input partition PER PACKAGE, so a many-package
catalog sweep fans out across executors instead of looping on the
driver; each task reuses the retrying HTTP session (S2: 5 retries,
backoff 0.6, 429/5xx) and applies the prefix filter before emitting
rows, so only matching resource metadata crosses the wire. Row volume
is catalog metadata (tiny); the heavy byte movement stays in the
download stage, which consumes this frame's ``url`` column.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = (
    "package_id string, resource_id string, name string, url string, "
    "format string, last_modified string, size bigint"
)


class CkanPackagePartition(InputPartition):
    def __init__(self, package_id: str):
        self.package_id = package_id


class CkanCatalogReader(DataSourceReader):
    def __init__(self, options: dict):
        base_url = options.get("base_url")
        if not base_url:
            raise ValueError("ckan source requires option 'base_url'")
        self.base_url = base_url
        raw = options.get("packages") or options.get("package_id") or ""
        self.package_ids = [p.strip() for p in raw.split(",") if p.strip()]
        if not self.package_ids:
            raise ValueError(
                "ckan source requires option 'packages' (comma-separated) "
                "or 'package_id'"
            )
        self.prefix = options.get("prefix")

    def partitions(self) -> list[InputPartition]:
        return [CkanPackagePartition(p) for p in self.package_ids]

    def read(self, partition: CkanPackagePartition) -> Iterator[tuple]:
        # Executor-side: import here so the class pickles by value
        # without dragging the HTTP stack through serialization.
        from gov_ec_pipeline_etl_spark.sources.catalog import fetch_package

        for r in fetch_package(
            self.base_url, partition.package_id, prefix=self.prefix
        ):
            size = r.get("size")
            try:
                size = int(size) if size is not None else None
            except (TypeError, ValueError):
                size = None
            yield (
                partition.package_id,
                str(r.get("id") or ""),
                str(r.get("name") or ""),
                str(r.get("url") or ""),
                str(r.get("format") or ""),
                str(r.get("last_modified") or ""),
                size,
            )


class CkanDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ckan"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CkanCatalogReader:
        return CkanCatalogReader(self.options)
