"""Metadata table/database specs — the engine's data model.

Same JSON shape as the reference's etl_manager specs
(reference: meta_data/curated/random_postcodes.json, meta_data/curated/
database.json): a table is ``{name, description, data_format,
columns: [{name, type, description}], location, partitions}`` and a
database is ``{name, description, bucket, base_folder}``.

The ``type`` vocabulary is etl_manager's (R-flavoured: ``character`` for
string); we map it onto Spark's type system so every downstream read/write
is schema-first — at 100 TB, schema-on-read inference is both slow (a full
pass to infer) and unsafe (a late file can silently widen a column).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import types as T

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "character": T.StringType(),
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")
_ARRAY_RE = re.compile(r"^array<(.+)>$")


def parse_type(type_str: str) -> T.DataType:
    """Map an etl_manager-style type string to a Spark DataType."""
    s = type_str.strip().lower()
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    m = _DECIMAL_RE.match(s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = _ARRAY_RE.match(s)
    if m:
        return T.ArrayType(parse_type(m.group(1)))
    raise ValueError(f"unsupported metadata type: {type_str!r}")


@dataclass
class ColumnSpec:
    name: str
    type: str
    description: str = ""

    @property
    def spark_type(self) -> T.DataType:
        return parse_type(self.type)


@dataclass
class TableSpec:
    name: str
    columns: list[ColumnSpec]
    data_format: str = "parquet"
    description: str = ""
    location: str = ""
    partitions: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> TableSpec:
        return cls(
            name=d["name"],
            columns=[
                ColumnSpec(c["name"], c["type"], c.get("description", ""))
                for c in d["columns"]
            ],
            data_format=d.get("data_format", "parquet"),
            description=d.get("description", ""),
            location=d.get("location", d["name"]),
            partitions=list(d.get("partitions", [])),
        )

    @classmethod
    def from_json(cls, path: str | Path) -> TableSpec:
        return cls.from_dict(json.loads(Path(path).read_text()))

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "data_format": self.data_format,
            "columns": [
                {"name": c.name, "type": c.type, "description": c.description}
                for c in self.columns
            ],
            "location": self.location,
            "partitions": self.partitions,
        }

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]


def spark_schema_for(spec: TableSpec, exclude: list[str] | None = None) -> T.StructType:
    """StructType for a table spec, optionally excluding columns (e.g. partitions)."""
    excl = set(exclude or [])
    return T.StructType(
        [T.StructField(c.name, c.spark_type, True) for c in spec.columns if c.name not in excl]
    )


@dataclass
class DatabaseSpec:
    """Database spec + its table specs, loaded from a metadata folder.

    Mirrors the reference's metadata folder convention
    (reference: python_scripts/create_database_schema.py:4 reads the whole
    ``meta_data/curated/`` folder): ``database.json`` describes the db, every
    other ``*.json`` is a table.
    """

    name: str
    bucket: str = ""
    base_folder: str = ""
    description: str = ""
    tables: list[TableSpec] = field(default_factory=list)

    @classmethod
    def from_folder(cls, folder: str | Path) -> DatabaseSpec:
        folder = Path(folder)
        db_file = folder / "database.json"
        d = json.loads(db_file.read_text()) if db_file.exists() else {"name": folder.name}
        tables = [
            TableSpec.from_json(p)
            for p in sorted(folder.glob("*.json"))
            if p.name != "database.json"
        ]
        return cls(
            name=d["name"],
            bucket=d.get("bucket", ""),
            base_folder=d.get("base_folder", ""),
            description=d.get("description", ""),
            tables=tables,
        )

    def table(self, name: str) -> TableSpec:
        for t in self.tables:
            if t.name == name:
                return t
        raise KeyError(name)

    def table_root(self, spec: TableSpec) -> str:
        """Storage root for a table: <bucket>/<base_folder>/<location>."""
        parts = [p for p in (self.bucket, self.base_folder, spec.location or spec.name) if p]
        return "/".join(parts)
