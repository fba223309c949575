"""JSONL logger round-trip (corrupt-line fallback) and CLI state ops."""

from __future__ import annotations

import json

from gov_ec_pipeline_etl_spark.cli import main as cli_main
from gov_ec_pipeline_etl_spark.logs import get_logger, read_log_df


def test_logger_and_reader(spark, tmp_path):
    log_file = str(tmp_path / "run.log")
    logger = get_logger("t_run", log_file)
    logger.info("started")
    logger.info("processed %s", {"rid": "r1", "rows": 5})
    with open(log_file, "a", encoding="utf-8") as f:
        f.write("NOT JSON AT ALL\n")

    df = read_log_df(spark, log_file)
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0].message == "started" and rows[0].level == "INFO"
    extras = json.loads(rows[1].extras)
    assert extras == {"rid": "r1", "rows": 5}
    assert rows[2].raw == "NOT JSON AT ALL" and rows[2].message is None


def test_cli_state_roundtrip(tmp_path, capsys):
    catalog = [
        {"id": "r1", "last_modified": "2025-01-01T00:00:00Z", "size": 1,
         "url": "u1", "format": "CSV"},
        {"id": "r2", "last_modified": "2025-01-02T00:00:00Z", "size": 2,
         "url": "u2", "format": "XLSX"},
    ]
    cat_path = tmp_path / "catalog.json"
    cat_path.write_text(json.dumps(catalog))
    state_path = str(tmp_path / "state.json")

    assert cli_main(["state", "seed", state_path, str(cat_path)]) == 0
    capsys.readouterr()

    assert cli_main(["state", "show", state_path]) == 0
    shown = json.loads(capsys.readouterr().out)
    assert set(shown["resources"]) == {"r1", "r2"}

    catalog[1]["size"] = 99
    cat_path.write_text(json.dumps(catalog + [dict(catalog[0], id="r3")]))
    assert cli_main(["state", "diff", state_path, str(cat_path)]) == 0
    diff = json.loads(capsys.readouterr().out)
    assert diff["unchanged"] == ["r1"]
    assert set(diff["to_process"]) == {"r2", "r3"}
    assert diff["reasons"] == {"r2": ["size"], "r3": ["new"]}


def test_cli_pull_atomic(tmp_path):
    """`pull` downloads with the retrying session and promotes via
    tmp+rename (reference get_status object/compose semantics)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from gov_ec_pipeline_etl_spark.cli import main

    blob = b"y" * 4096

    class H(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def log_message(self, *a):
            pass

    httpd = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        dest = str(tmp_path / "obj.bin")
        rc = main(
            ["pull", f"http://127.0.0.1:{httpd.server_port}/obj", dest]
        )
        assert rc == 0
        assert open(dest, "rb").read() == blob
        assert not (tmp_path / "obj.bin.tmp").exists()
    finally:
        httpd.shutdown()


def test_cli_pull_cleans_tmp_on_failure(tmp_path, monkeypatch):
    """A failed download must not litter the destination with .tmp
    partials (ADVICE r3): the tmp file written mid-stream is removed
    before the error propagates."""
    import os

    import pytest

    import gov_ec_pipeline_etl_spark.sources.catalog as catalog

    dest = str(tmp_path / "out.bin")

    def boom(url, path, **kw):
        with open(path, "wb") as f:
            f.write(b"partial")
        raise OSError("connection dropped mid-stream")

    monkeypatch.setattr(catalog, "download_resource", boom)
    with pytest.raises(OSError, match="mid-stream"):
        cli_main(["pull", "http://x/f", dest])
    assert not os.path.exists(dest)
    assert not os.path.exists(dest + ".tmp")
