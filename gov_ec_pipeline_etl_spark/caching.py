"""One obvious tool for the persisted-input handle convention.

Several bucketed operators (LSH band tables, DF-cut inverted indexes)
persist an intermediate DataFrame so the candidate self-join reads a
cached leaf instead of re-evaluating an expensive kernel. The persisted
frame outlives the call — Spark caching is session-scoped — so the
operator attaches the handles to the *returned* DataFrame and the
caller releases them after its consuming action.

Operators call :func:`hold`; consumers call :func:`unpersist_inputs`
or wrap the consumption in :func:`released`. The attribute itself
(``_persisted_inputs``) is a plain Python attribute on the DataFrame
wrapper object: it is LOST on any further DataFrame transformation
(``df.where(...)`` returns a new wrapper), so callers must release
before transforming, or keep their own reference to the handle list.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

_ATTR = "_persisted_inputs"


def hold(out: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Attach persisted-input handles to a result DataFrame (returns it)."""
    setattr(out, _ATTR, list(persisted))
    return out


def unpersist_inputs(df: DataFrame) -> None:
    """Release every persisted input attached to ``df`` (idempotent)."""
    for p in getattr(df, _ATTR, []):
        with contextlib.suppress(Exception):
            p.unpersist()
    with contextlib.suppress(AttributeError):
        delattr(df, _ATTR)


@contextlib.contextmanager
def released(df: DataFrame) -> Iterator[DataFrame]:
    """``with released(op(...)) as result: result.collect()`` — consume a
    bucketed operator's result and release its cached inputs on exit."""
    try:
        yield df
    finally:
        unpersist_inputs(df)
