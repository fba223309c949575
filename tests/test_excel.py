"""Excel ingest end-to-end with the stdlib OOXML reader/writer:
the FIXTURES.md §A multi-sheet scenario — `Contenido` blacklisted,
numeric sheets `1`/`2` concatenated, `Notas` ignored — plus header
repair inside a sheet."""

from __future__ import annotations

from gov_ec_pipeline_etl_spark.sources.xlsx_lite import (
    read_sheet,
    sheet_names,
    write_xlsx,
)


def _fixture(path: str) -> None:
    header = ["Código ICCS", "Presunta Infracción", "Edad"]
    write_xlsx(
        path,
        {
            "Contenido": [["Índice del archivo"], ["hoja 1: datos"]],
            "1": [header, ["0101", "ROBO", "34"], ["0102", "HURTO", "41"]],
            "2": [
                ["Código ICCS", "Presunta Infracción", "Sexo"],
                ["0201", "ASALTO", "M"],
            ],
            "Notas": [["nota interna"], ["no es data"]],
        },
    )


def test_xlsx_lite_roundtrip(tmp_path):
    p = str(tmp_path / "f.xlsx")
    _fixture(p)
    assert sheet_names(p) == ["Contenido", "1", "2", "Notas"]
    pdf = read_sheet(p, "1")
    assert list(pdf.columns) == ["Código ICCS", "Presunta Infracción", "Edad"]
    assert pdf.iloc[0].tolist() == ["0101", "ROBO", "34"]
    assert len(pdf) == 2


def test_read_excel_resource_multi_sheet(spark, tmp_path):
    p = str(tmp_path / "f.xlsx")
    _fixture(p)
    from gov_ec_pipeline_etl_spark.sources.ingest import read_excel_resource

    df = read_excel_resource(spark, p)
    # sheets 1 and 2 unioned by name with null fill; Contenido/Notas skipped
    assert set(df.columns) == {
        "codigo_iccs",
        "presunta_infraccion",
        "edad",
        "sexo",
    }
    rows = {r.codigo_iccs: r for r in df.collect()}
    assert set(rows) == {"0101", "0102", "0201"}
    assert rows["0101"].edad == "34" and rows["0101"].sexo is None
    assert rows["0201"].sexo == "M" and rows["0201"].edad is None


def test_read_excel_resource_offset_header(spark, tmp_path):
    """Junk rows above the real header inside a sheet → promoted."""
    p = str(tmp_path / "g.xlsx")
    write_xlsx(
        p,
        {
            "1": [
                ["REPORTE", None, None],
                ["Código ICCS", "Presunta Infracción", "Edad"],
                ["0301", "ROBO", "22"],
            ],
        },
    )
    from gov_ec_pipeline_etl_spark.sources.ingest import read_excel_resource

    df = read_excel_resource(spark, p)
    assert df.columns == ["codigo_iccs", "presunta_infraccion", "edad"]
    assert df.first().codigo_iccs == "0301"


def test_pipeline_with_xlsx_resource(spark, tmp_path):
    """Full run_etl over an XLSX resource (multi-sheet, blacklisted
    Contenido) through contract transform and upsert."""
    import os

    from gov_ec_pipeline_etl_spark.etl_pipeline import run_etl
    from gov_ec_pipeline_etl_spark.sources.xlsx_lite import write_xlsx

    p = str(tmp_path / "r1.xlsx")
    header = [
        "Código ICCS", "Fecha Detención Aprehensión", "Presunta Infracción",
        "Nombre Provincia", "Código Provincia", "Código Cantón",
    ]
    write_xlsx(
        p,
        {
            "Contenido": [["índice"]],
            "1": [header, ["0101", "2024-01-01", "ROBO", "Azuay", "01", "0101"]],
            "2": [header, ["0102", "2024-01-02", "HURTO", "Guayas", "09", "0901"]],
        },
    )
    cfg = os.path.join(
        os.path.dirname(__file__), "..", "configs", "detenidos.yaml"
    )
    res = [{"id": "x1", "path": p, "last_modified": "2025-01-01T00:00:00Z",
            "size": 1, "url": "file://x1", "format": "XLSX"}]
    r = run_etl(spark, cfg, res, str(tmp_path / "work"))
    assert r.status == "ok"
    assert r.reports["x1"]["rows_in"] == 2
    assert r.upsert_metrics["x1"]["rows_inserted"] == 2


def test_openpyxl_primary_branch_executes(spark, tmp_path, monkeypatch):
    """The openpyxl-primary backend (reference extract.py:276-286) must
    execute end-to-end, not just the stdlib fallback. openpyxl isn't in
    this container, so a pandas-level double stands in for the library:
    every ENGINE line of the primary branch (backend selection, sheet
    enumeration, dtype=str parse wiring, union) runs for real."""
    import sys
    import types

    import pandas as pd

    from gov_ec_pipeline_etl_spark.sources import ingest, xlsx_lite

    p = str(tmp_path / "f.xlsx")
    _fixture(p)

    class FakeExcelFile:
        """pd.ExcelFile test double backed by the stdlib reader."""

        def __init__(self, path):
            self._path = path
            self.sheet_names = xlsx_lite.sheet_names(path)

        def parse(self, sheet, dtype=None):
            assert dtype is str  # the branch must request string cells
            return xlsx_lite.read_sheet(self._path, sheet)

    monkeypatch.setitem(sys.modules, "openpyxl", types.ModuleType("openpyxl"))
    monkeypatch.setattr(pd, "ExcelFile", FakeExcelFile)
    # selection must now choose the primary backend
    names, _parse = ingest._pick_excel_backend(p)
    assert names == ["Contenido", "1", "2", "Notas"]

    primary = ingest.read_excel_resource(spark, p)
    monkeypatch.delitem(sys.modules, "openpyxl")
    monkeypatch.setattr(
        pd, "ExcelFile", pd.ExcelFile, raising=True
    )  # restore for clarity; monkeypatch undoes at teardown anyway
    rows = {r.codigo_iccs: r for r in primary.collect()}
    assert set(rows) == {"0101", "0102", "0201"}
    assert rows["0201"].sexo == "M" and rows["0201"].edad is None


def test_backend_selection_falls_back_without_openpyxl(tmp_path, monkeypatch):
    """With openpyxl unimportable the stdlib backend is chosen (this is
    the branch every other Excel test exercises end-to-end)."""
    import builtins

    from gov_ec_pipeline_etl_spark.sources import ingest

    p = str(tmp_path / "f.xlsx")
    _fixture(p)
    real_import = builtins.__import__

    def no_openpyxl(name, *a, **k):
        if name == "openpyxl":
            raise ImportError("not installed")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_openpyxl)
    names, parse = ingest._pick_excel_backend(p)
    assert names == ["Contenido", "1", "2", "Notas"]
    assert parse("1").iloc[0].tolist() == ["0101", "ROBO", "34"]
