"""CKAN-style catalog client (SURVEY.md §2.1 S1-S3, §2.4 F5).

Driver-side by design: catalog metadata is tiny (one JSON document per
dataset) and the reference's semantics are metadata-level — fetch the
package, validate success, filter resources by normalized name/id prefix
(startswith, then contains fallback), and stream-download changed files.
The data path stays in Spark; only cataloging is HTTP.

Retry posture mirrors the reference (5 attempts, exponential backoff,
retry on 429/5xx — etl/extract.py:51-67) via urllib3's Retry when
``requests`` is present.
"""

from __future__ import annotations

import os
from typing import Any

from gov_ec_pipeline_etl_spark.functions.text import norm_text_py


class CatalogError(RuntimeError):
    pass


def build_session(
    total_retries: int = 5,
    backoff_factor: float = 0.6,
    status_forcelist: tuple[int, ...] = (429, 500, 502, 503, 504),
):
    import requests
    from requests.adapters import HTTPAdapter
    from urllib3.util.retry import Retry

    session = requests.Session()
    retry = Retry(
        total=total_retries,
        backoff_factor=backoff_factor,
        status_forcelist=status_forcelist,
        allowed_methods=("GET",),
    )
    adapter = HTTPAdapter(max_retries=retry)
    session.mount("https://", adapter)
    session.mount("http://", adapter)
    return session


def filter_resources_by_prefix(
    resources: list[dict[str, Any]], prefix: str
) -> list[dict[str, Any]]:
    """Normalized startswith on name or id; empty → contains fallback
    (reference F5 semantics, etl/extract.py:133-148)."""
    p = norm_text_py(prefix)

    def fields(r: dict[str, Any]) -> list[str]:
        return [norm_text_py(str(r.get(k, "") or "")) for k in ("name", "id")]

    starts = [r for r in resources if any(f.startswith(p) for f in fields(r))]
    if starts:
        return starts
    return [r for r in resources if any(p in f for f in fields(r))]


def fetch_package(
    base_url: str,
    package_id: str,
    prefix: str | None = None,
    session=None,
    timeout: tuple[float, float] = (10.0, 60.0),
) -> list[dict[str, Any]]:
    """GET ``{base_url}/api/3/action/package_show?id=…`` → resource list
    (optionally prefix-filtered). Raises CatalogError on HTTP failure or
    ``success: false``."""
    session = session or build_session()
    url = f"{base_url.rstrip('/')}/api/3/action/package_show"
    resp = session.get(url, params={"id": package_id}, timeout=timeout)
    if resp.status_code != 200:
        raise CatalogError(f"catalog HTTP {resp.status_code} for {package_id}")
    payload = resp.json()
    if not payload.get("success"):
        raise CatalogError(f"catalog success=false for {package_id}")
    resources = payload.get("result", {}).get("resources", [])
    if prefix:
        resources = filter_resources_by_prefix(resources, prefix)
    return resources


def download_resource(
    url: str,
    dest_path: str,
    session=None,
    chunk_bytes: int = 1 << 20,
    timeout: tuple[float, float] = (10.0, 180.0),
) -> int:
    """Streamed chunked download (constant memory); returns bytes written."""
    session = session or build_session()
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    n = 0
    with session.get(url, stream=True, timeout=timeout) as resp:
        if resp.status_code != 200:
            raise CatalogError(f"download HTTP {resp.status_code}: {url}")
        with open(dest_path, "wb") as f:
            for chunk in resp.iter_content(chunk_size=chunk_bytes):
                if chunk:
                    f.write(chunk)
                    n += len(chunk)
    return n
