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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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


# ---------------------------------------------------------------------------
# Streaming face: incremental catalog changes as a readStream source.
# ---------------------------------------------------------------------------

CHANGES_SCHEMA = (
    "package_id string, resource_id string, name string, url string, "
    "change string, last_modified string, size bigint"
)

_TRACKED = ("last_modified", "size", "url", "format")


class CkanChangesStreamReader(SimpleDataSourceStreamReader):
    """Incremental catalog poller: each micro-batch emits the resources
    that are NEW or CHANGED since the last batch — the reference's
    fingerprint-diff incremental model (SURVEY.md §2.2, I1/I2) recast as
    a Structured Streaming source.

    The stream OFFSET is the resource-state fingerprint map itself
    (id → normalized last_modified/size/url/format + display fields), so
    exactly-once incremental semantics ride on the engine's checkpoint
    instead of a hand-rolled state file, and recovery replay
    (readBetweenOffsets) is a pure function of two offsets — no HTTP.
    Catalog metadata is small; at a scale where offsets would bloat,
    store the state externally and keep a version pointer here.
    """

    def __init__(self, options: dict):
        base_url = options.get("base_url")
        if not base_url:
            raise ValueError("ckan-changes source requires option 'base_url'")
        self.base_url = base_url
        raw = options.get("packages") or options.get("package_id") or ""
        self.package_ids = [p.strip() for p in raw.split(",") if p.strip()]
        if not self.package_ids:
            raise ValueError(
                "ckan-changes source requires option 'packages' or 'package_id'"
            )
        self.prefix = options.get("prefix")

    def initialOffset(self) -> dict:
        return {"state": {}}

    @staticmethod
    def _row(fp: dict) -> tuple:
        size = fp.get("size")
        try:
            size = int(size) if size is not None else None
        except (TypeError, ValueError):
            size = None
        return (
            fp.get("package_id"),
            fp.get("id"),
            fp.get("name"),
            fp.get("url"),
            fp.get("change"),
            fp.get("last_modified"),
            size,
        )

    @staticmethod
    def _change(old: dict | None, fp: dict) -> str | None:
        if old is None:
            return "new"
        changed = [f for f in _TRACKED if old.get(f) != fp.get(f)]
        return ",".join(changed) if changed else None

    def read(self, start: dict):
        from gov_ec_pipeline_etl_spark.sources.catalog import fetch_package
        from gov_ec_pipeline_etl_spark.sources.state import fingerprint

        state = dict(start.get("state", {}))
        new_state = dict(state)
        rows: list[tuple] = []
        seen: set[str] = set()
        for pkg in self.package_ids:
            for r in fetch_package(self.base_url, pkg, prefix=self.prefix):
                fp = fingerprint(r)
                fp["package_id"] = pkg
                fp["name"] = str(r.get("name") or "")
                seen.add(fp["id"])
                change = self._change(state.get(fp["id"]), fp)
                if change:
                    fp["change"] = change
                    rows.append(self._row(fp))
                new_state[fp["id"]] = {k: v for k, v in fp.items() if k != "change"}
        # Resources that vanished from the catalog: emit a 'deleted'
        # change row and expire them from the offset, so downstream
        # learns of removals and the fingerprint map (= the offset) is
        # bounded by the LIVE catalog size rather than growing forever.
        for rid in list(new_state):
            if rid not in seen:
                rows.append(self._row({**new_state.pop(rid), "change": "deleted"}))
        return iter(rows), {"state": new_state}

    def readBetweenOffsets(self, start: dict, end: dict):
        s, e = start.get("state", {}), end.get("state", {})
        rows = []
        for rid, fp in e.items():
            change = self._change(s.get(rid), fp)
            if change:
                rows.append(self._row({**fp, "change": change}))
        for rid, fp in s.items():  # expired between offsets → replay 'deleted'
            if rid not in e:
                rows.append(self._row({**fp, "change": "deleted"}))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class CkanChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ckan-changes"

    def schema(self) -> str:
        return CHANGES_SCHEMA

    def simpleStreamReader(self, schema) -> CkanChangesStreamReader:
        return CkanChangesStreamReader(self.options)
