"""Catalog client semantics with a local HTTP server (no external
network): package fetch + success validation, prefix filter fallback,
streamed download."""

from __future__ import annotations

import copy
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from gov_ec_pipeline_etl_spark.sources.catalog import (
    CatalogError,
    download_resource,
    fetch_package,
    filter_resources_by_prefix,
)

PACKAGE = {
    "success": True,
    "result": {
        "resources": [
            {"id": "r1", "name": "Detenciones Aprehensiones 2024", "url": "/f1"},
            {"id": "r2", "name": "Otros Datos", "url": "/f2"},
        ]
    },
}


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path.startswith("/api/3/action/package_show"):
            if "bad" in self.path:
                body = json.dumps({"success": False}).encode()
            else:
                body = json.dumps(PACKAGE).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/blob":
            data = b"x" * (1 << 21)  # 2 MB → multiple 1 MB chunks
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        else:
            self.send_response(404)
            self.end_headers()

    def log_message(self, *args):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_fetch_package_and_prefix(server):
    res = fetch_package(server, "pkg", prefix="detenciones")
    assert [r["id"] for r in res] == ["r1"]
    # contains-fallback when nothing startswith
    res = fetch_package(server, "pkg", prefix="datos")
    assert [r["id"] for r in res] == ["r2"]
    with pytest.raises(CatalogError, match="success=false"):
        fetch_package(server, "bad")


def test_prefix_filter_accent_insensitive():
    rs = [{"id": "x", "name": "Detención Niños"}]
    assert filter_resources_by_prefix(rs, "detencion ni") == rs
    assert filter_resources_by_prefix(rs, "zzz") == []


def test_streamed_download(server, tmp_path):
    dest = str(tmp_path / "raw" / "blob.bin")
    n = download_resource(server + "/blob", dest)
    assert n == 1 << 21
    import os

    assert os.path.getsize(dest) == 1 << 21
    with pytest.raises(CatalogError, match="404"):
        download_resource(server + "/nope", str(tmp_path / "x"))


def test_ckan_spark_datasource(server, spark):
    """spark.read.format('ckan'): one partition per package, stable
    schema, prefix filter applied executor-side."""
    from gov_ec_pipeline_etl_spark.sources.spark_datasource import (
        CkanDataSource,
        SCHEMA,
    )

    spark.dataSource.register(CkanDataSource)
    df = (
        spark.read.format("ckan")
        .option("base_url", server)
        .option("packages", "pkg-a,pkg-b")
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<package_id:string,resource_id:string,name:string,"
        "url:string,format:string,last_modified:string,size:bigint>"
    )
    rows = sorted(map(tuple, df.collect()))
    # 2 packages × 2 resources each, tagged with their package id
    assert len(rows) == 4
    assert {r[0] for r in rows} == {"pkg-a", "pkg-b"}
    assert {r[1] for r in rows} == {"r1", "r2"}
    # the scan fans out one partition per package
    assert df.rdd.getNumPartitions() == 2

    filtered = (
        spark.read.format("ckan")
        .option("base_url", server)
        .option("packages", "pkg-a")
        .option("prefix", "detenciones")
        .load()
        .collect()
    )
    assert [r.resource_id for r in filtered] == ["r1"]


_PACKAGE_TEMPLATE = {
    "success": True,
    "result": {
        "resources": [
            {"id": "r1", "name": "datos a", "url": "/f1",
             "last_modified": "2026-01-01T00:00:00", "size": 10, "format": "CSV"},
            {"id": "r2", "name": "datos b", "url": "/f2",
             "last_modified": "2026-01-02T00:00:00", "size": 20, "format": "CSV"},
        ]
    },
}
# served dict, mutated by the stream test and RESTORED in its finally so
# in-interpreter reruns always start from the pristine two-resource state
MUTABLE_PACKAGE = copy.deepcopy(_PACKAGE_TEMPLATE)


class MutableHandler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path.startswith("/api/3/action/package_show"):
            body = json.dumps(MUTABLE_PACKAGE).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def log_message(self, *a):  # noqa: D102
        pass


def test_ckan_changes_stream(spark, tmp_path):
    """readStream.format('ckan-changes'): batch 1 emits everything as
    'new'; after a catalog mutation, a checkpoint-resumed run emits ONLY
    the changed resource with its change reason — the reference's
    fingerprint-diff incremental model riding on streaming offsets."""
    from gov_ec_pipeline_etl_spark.sources.spark_datasource import (
        CkanChangesDataSource,
    )

    httpd = HTTPServer(("127.0.0.1", 0), MutableHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
        spark.dataSource.register(CkanChangesDataSource)
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        seen: set = set()

        def run_round(_label: str):
            # parquet sink: the fault-tolerant pairing for a resumable
            # checkpoint (memory sink refuses recovery); each round's
            # delta is whatever appeared in the output since last time.
            q = (
                spark.readStream.format("ckan-changes")
                .option("base_url", url)
                .option("package_id", "pkg")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            rows = {
                (r.resource_id, r.change, r.size): r
                for r in spark.read.parquet(out).collect()
            }
            delta = {k[:2]: v for k, v in rows.items() if k not in seen}
            seen.update(rows)
            return delta

        first = run_round("ckan_changes_1")
        assert set(first) == {("r1", "new"), ("r2", "new")}
        assert first[("r1", "new")].size == 10
        # normalize_dt applied: naive timestamp rendered as UTC Z-form
        assert first[("r1", "new")].last_modified == "2026-01-01T00:00:00Z"

        # mutate the catalog: r1 grows, r3 appears
        MUTABLE_PACKAGE["result"]["resources"][0]["size"] = 99
        MUTABLE_PACKAGE["result"]["resources"][0]["last_modified"] = (
            "2026-02-01T00:00:00"
        )
        MUTABLE_PACKAGE["result"]["resources"].append(
            {"id": "r3", "name": "datos c", "url": "/f3",
             "last_modified": "2026-02-02T00:00:00", "size": 30, "format": "CSV"}
        )

        second = run_round("ckan_changes_2")
        # resumed from checkpoint: ONLY the delta, with field-level reasons
        assert set(second) == {("r1", "last_modified,size"), ("r3", "new")}
        assert second[("r1", "last_modified,size")].size == 99

        # a third run with nothing changed emits nothing
        third = run_round("ckan_changes_3")
        assert third == {}

        # r2 vanishes from the catalog: the stream emits a 'deleted'
        # row and expires the id from the offset (bounded state)
        del MUTABLE_PACKAGE["result"]["resources"][1]
        fourth = run_round("ckan_changes_4")
        assert set(fourth) == {("r2", "deleted")}

        # and a fifth quiet round stays quiet (r2 truly expired — it
        # does not re-report deleted each poll)
        fifth = run_round("ckan_changes_5")
        assert fifth == {}
    finally:
        MUTABLE_PACKAGE["result"]["resources"][:] = copy.deepcopy(
            _PACKAGE_TEMPLATE["result"]["resources"]
        )
        httpd.shutdown()
