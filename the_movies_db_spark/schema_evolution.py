"""Schema-drift detection & evolution (SURVEY §1.3 — the reference's core idea).

Reference behavior re-expressed structurally (no probe temp tables, no
``information_schema`` round-trips):

- ``check_schema_drift`` ≈ ``SchemaDriftHandle.check_schema_drift``
  (/root/reference/utilities/etl.py:191-236): set-compare incoming vs
  destination columns → new columns + same-name/different-type columns.
- ``apply_drift`` ≈ ``handle_schema_drift`` (etl.py:238-277): a type
  change is NEVER an in-place cast — the incoming column is renamed to
  ``{col}_{type}`` (spaces → ``_``, etl.py:263) and lives alongside the
  original. Added columns extend the destination schema.

Two reference bugs are fixed by design (SURVEY §2.13.2–3): no
``details["dest_table"]`` KeyError path exists, and ALL type-changed
columns are handled (the reference ``return``-ed inside the loop and
only processed the first).

Scale notes: drift handling is pure metadata (``StructType`` diffing)
plus column renames — zero data movement. The write path relies on
Parquet ``mergeSchema`` / ``unionByName(allowMissingColumns=True)``,
both of which are scan-time concerns, so evolving a 100 TB table costs
nothing beyond the normal write.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


@dataclass(frozen=True)
class ModifiedColumn:
    name: str
    dest_type: str  # simpleString of the destination's type
    incoming_type: str  # simpleString of the incoming type
    renamed_to: str  # {name}_{incoming_type}, spaces → "_"


@dataclass
class SchemaDrift:
    columns_to_add: list[StructField] = field(default_factory=list)
    modified_cols: list[ModifiedColumn] = field(default_factory=list)

    @property
    def has_drift(self) -> bool:
        return bool(self.columns_to_add or self.modified_cols)


def _suffixed_name(col: str, incoming_type: str) -> str:
    # parity with etl.py:263: f"{col}_{data_type}".replace(" ", "_")
    return f"{col}_{incoming_type}".replace(" ", "_")


def check_schema_drift(incoming: StructType, dest: StructType) -> SchemaDrift:
    """Diff an incoming batch schema against the destination schema.

    Returns the columns the destination must gain (new names) and the
    same-name columns whose types differ (structural comparison on
    Spark ``DataType``, not string names — nested/array types compare
    correctly).
    """
    dest_by_name = {f.name: f for f in dest.fields}
    drift = SchemaDrift()
    for f in incoming.fields:
        if f.name not in dest_by_name:
            drift.columns_to_add.append(f)
        elif f.dataType != dest_by_name[f.name].dataType:
            drift.modified_cols.append(
                ModifiedColumn(
                    name=f.name,
                    dest_type=dest_by_name[f.name].dataType.simpleString(),
                    incoming_type=f.dataType.simpleString(),
                    renamed_to=_suffixed_name(f.name, f.dataType.simpleString()),
                )
            )
    return drift


def evolve_schema(dest: StructType, drift: SchemaDrift) -> StructType:
    """Destination schema after applying drift: original columns, then
    added columns, then the suffixed columns for type changes (all
    drift-born columns are nullable — history rows lack them)."""
    fields = list(dest.fields)
    fields.extend(StructField(f.name, f.dataType, True) for f in drift.columns_to_add)
    for m in drift.modified_cols:
        # incoming type looked up from the add-list? No — suffixed col
        # carries the incoming type; find it via name in columns_to_add
        # is not possible (it's a type change), so re-parse from the
        # simpleString via the batch at apply time. Here we only need
        # the name slot; apply_batch aligns actual types.
        fields.append(StructField(m.renamed_to, _parse_type(m.incoming_type), True))
    return StructType(fields)


def _parse_type(simple_string: str):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(simple_string)


def apply_drift(batch: DataFrame, dest: StructType) -> DataFrame:
    """Rewrite an incoming batch so it is union-compatible with the
    evolved destination: every type-changed column is renamed to its
    ``{col}_{type}`` slot (ALL of them — reference bug §2.13.3 fixed);
    added columns pass through; unchanged columns untouched.
    """
    drift = check_schema_drift(batch.schema, dest)
    out = batch
    for m in drift.modified_cols:
        out = out.withColumnRenamed(m.name, m.renamed_to)
    return out


def align_to(df: DataFrame, evolved: StructType) -> DataFrame:
    """Project ``df`` onto the evolved schema, filling missing columns
    with typed NULLs — the engine-side analog of ``ALTER TABLE ADD
    COLUMN`` on existing data (etl.py:285-290)."""
    have = {f.name for f in df.schema.fields}
    cols = [
        F.col(f.name) if f.name in have else F.lit(None).cast(f.dataType).alias(f.name)
        for f in evolved.fields
    ]
    return df.select(*cols)


def reconcile(target: DataFrame, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full drift pipeline: detect drift of ``batch`` vs ``target``,
    evolve the target schema, and return both sides projected onto the
    evolved schema (ready for union/merge)."""
    drift = check_schema_drift(batch.schema, target.schema)
    evolved = evolve_schema(target.schema, drift)
    return align_to(target, evolved), align_to(apply_drift(batch, target.schema), evolved)
