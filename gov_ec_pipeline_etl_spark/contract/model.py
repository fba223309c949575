"""Contract model: typed view over the declarative config.

Capability-parity with the reference contract
(configs/detenidos_aprehendidos.yaml:27-177 — type groups, rename,
critical/recommended, categories, numeric rules, id strategy, dedup,
derive, drift policy, load policy) in an engine-native shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# type groups → Spark types (SURVEY.md §1.2)
TYPE_GROUPS = {
    "datetime": TimestampType(),
    "numeric": DoubleType(),
    "category": StringType(),
    "string_codes": StringType(),  # never numeric — preserves leading zeros
    "time": StringType(),
    "string": StringType(),
}


class TransformHardFail(RuntimeError):
    """Raised when a fail-fast quality/drift gate trips (reference
    TransformHardFail, etl/transform.py:41-43)."""


@dataclass
class CategoryRule:
    mapping: dict[str, str] = field(default_factory=dict)
    allowed: list[str] | None = None
    coerce_to: str | None = None


@dataclass
class NumericRule:
    lo: float | None = None
    hi: float | None = None


@dataclass
class Contract:
    dataset: str
    columns: dict[str, str]  # name → type group
    order: list[str] = field(default_factory=list)
    rename: dict[str, str] = field(default_factory=dict)
    critical: list[Any] = field(default_factory=list)  # str | {any_of: [...]}
    recommended: list[Any] = field(default_factory=list)
    categories: dict[str, CategoryRule] = field(default_factory=dict)
    numeric_rules: dict[str, NumericRule] = field(default_factory=dict)
    # normalize
    na_tokens: list[str] | None = None
    trim_strings: bool = True
    drop_all_null_rows: bool = True
    # ids
    key_fields: list[str] = field(default_factory=list)
    key_allow_nulls: bool = True
    surrogate_method: str = "sha256"  # sha256 | uuid5
    surrogate_namespace: str = ""
    # dedup
    enforce_unique_key: bool = True
    dedup_keep: str = "latest"  # latest | first
    dedup_order_by: str | None = None
    # unique column breaking order_by ties — without one, keep-latest on
    # duplicate order values is engine-internal nondeterminism
    dedup_tiebreak: str | None = None
    # derive
    derive_year: dict[str, str] = field(default_factory=dict)  # col → date col
    # schema drift policy
    pad_missing: bool = True
    fail_on_missing_expected: bool = False
    fail_on_extra_columns: bool = False
    allowed_schema_diffs: list[str] = field(default_factory=list)
    # load
    load_key: str = "surrogate_id"
    extras_column: str | None = "extras"
    load_partition_by: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, cfg: dict[str, Any]) -> "Contract":
        schema = cfg.get("schema", {})
        ids = cfg.get("ids", {})
        bk = ids.get("business_key", {})
        sur = ids.get("surrogate", {})
        dedup = cfg.get("dedup", {})
        norm = cfg.get("normalize", {})
        quality = cfg.get("quality", {})
        load = cfg.get("load", {})
        cats = {
            col: CategoryRule(
                mapping=dict(r.get("map", {})),
                allowed=list(r["allowed"]) if "allowed" in r else None,
                coerce_to=r.get("coerce_to"),
            )
            for col, r in cfg.get("categories", {}).items()
        }
        nums = {
            col: NumericRule(lo=r.get("min"), hi=r.get("max"))
            for col, r in cfg.get("numeric_rules", {}).items()
        }
        derive = {
            col: spec["year_of"]
            for col, spec in cfg.get("derive", {}).items()
            if isinstance(spec, dict) and "year_of" in spec
        }
        return cls(
            dataset=cfg.get("dataset", "dataset"),
            columns=dict(schema.get("columns", {})),
            order=list(schema.get("order", [])),
            rename=dict(cfg.get("rename", {})),
            critical=list(quality.get("critical", [])),
            recommended=list(quality.get("recommended", [])),
            categories=cats,
            numeric_rules=nums,
            na_tokens=norm.get("na_tokens"),
            trim_strings=norm.get("trim_strings", True),
            drop_all_null_rows=norm.get("drop_all_null_rows", True),
            key_fields=list(bk.get("fields", [])),
            key_allow_nulls=bk.get("allow_nulls", True),
            surrogate_method=sur.get("method", "sha256"),
            surrogate_namespace=sur.get("namespace", cfg.get("dataset", "")),
            enforce_unique_key=dedup.get("enforce_unique", True),
            dedup_keep=dedup.get("keep", "latest"),
            dedup_order_by=dedup.get("order_by"),
            dedup_tiebreak=dedup.get("tiebreak"),
            derive_year=derive,
            pad_missing=schema.get("pad_missing", True),
            fail_on_missing_expected=schema.get("fail_on_missing_expected", False),
            fail_on_extra_columns=schema.get("fail_on_extra_columns", False),
            allowed_schema_diffs=list(schema.get("allowed_schema_diffs", [])),
            load_key=load.get("key", "surrogate_id"),
            extras_column=load.get("extras_column", "extras"),
            load_partition_by=list(load.get("partition_by", [])),
        )

    def expected_columns(self) -> set[str]:
        """Union algebra over contract sections (reference semantics,
        etl/transform.py:188-231): declared ∪ order ∪ critical ∪
        recommended ∪ rename targets ∪ derived."""
        cols: set[str] = set(self.columns)
        cols.update(self.order)
        for item in list(self.critical) + list(self.recommended):
            if isinstance(item, str):
                cols.add(item)
            elif isinstance(item, dict) and "any_of" in item:
                cols.update(item["any_of"])
        cols.update(self.rename.values())
        cols.update(self.derive_year)
        return cols

    def spark_type(self, col: str):
        return TYPE_GROUPS.get(self.columns.get(col, "string"), StringType())

    def to_struct_type(self, include_ids: bool = True) -> StructType:
        fields = []
        if include_ids:
            fields += [
                StructField("surrogate_id", StringType()),
                StructField("business_key", StringType()),
            ]
        ordered = list(self.order) + sorted(
            c for c in self.expected_columns() if c not in self.order
        )
        for c in ordered:
            fields.append(StructField(c, self.spark_type(c)))
        return StructType(fields)
