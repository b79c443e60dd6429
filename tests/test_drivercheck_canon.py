"""Unit tests for the drivercheck type canonicalizer.

The canonicalizer is the local stand-in for the driver's Arrow-level
hash compare; a traceback here means the tool reports nothing instead of
a type mismatch, so the parser must degrade to "raw string" on anything
it can't split — never raise.
"""

from __future__ import annotations

import pyarrow as pa

from tools.drivercheck import _split_top, canon_arrow_type, canon_spark_type


def test_split_top_tracks_angle_depth():
    assert _split_top("int,array<struct<a:int,b:string>>,date") == [
        "int",
        "array<struct<a:int,b:string>>",
        "date",
    ]


def test_split_top_tracks_paren_depth():
    # the ADVICE repro: decimal's (precision,scale) comma is NOT a field split
    assert _split_top("a:decimal(10,2),b:int") == ["a:decimal(10,2)", "b:int"]


def test_struct_with_decimal_params_canonicalizes():
    got = canon_spark_type("struct<a:decimal(10,2),b:int>")
    assert got == "struct<a:decimal(10,2),b:int>"


def test_struct_with_nested_array_and_decimal():
    got = canon_spark_type("struct<xs:array<decimal(38,0)>,n:bigint>")
    assert got == "struct<xs:list<decimal(38,0)>,n:int>"


def test_map_with_decimal_value():
    assert canon_spark_type("map<string,decimal(10,2)>") == "map<string,decimal(10,2)>"


def test_unparseable_struct_falls_through_not_raises():
    # a field with no name:type colon — degrade to the raw string
    raw = "struct<justatypename>"
    assert canon_spark_type(raw) == raw


def test_canonical_collapse_matrix():
    # integer widths collapse, decimal-vs-int must NOT
    assert canon_spark_type("bigint") == canon_arrow_type(pa.int32()) == "int"
    assert canon_spark_type("double") == canon_arrow_type(pa.float64()) == "float"
    assert canon_arrow_type(pa.decimal128(38, 0)) == "decimal(38,0)"
    assert canon_spark_type("bigint") != canon_arrow_type(pa.decimal128(38, 0))
    # timestamp tz-ness collapses deliberately
    assert (
        canon_spark_type("timestamp")
        == canon_arrow_type(pa.timestamp("us", tz="UTC"))
        == "timestamp"
    )


def test_arrow_struct_with_decimal_matches_spark_side():
    at = pa.struct([("a", pa.decimal128(10, 2)), ("b", pa.int64())])
    assert canon_arrow_type(at) == canon_spark_type("struct<a:decimal(10,2),b:bigint>")


def test_float_sort_key_ties_break_deterministically():
    """Rows that tie on the rounded float key must order by the
    full-precision repr on BOTH sides — engine input order deciding the
    pairing would turn sub-tolerance diffs into spurious FAILs."""
    from tools.drivercheck import normalize, values_equal

    a_rows = [(0.3, "x"), (0.30000000000000004, "y")]
    b_rows = [(0.30000000000000004, "y"), (0.3, "x")]  # reversed input order
    na = normalize(a_rows, ["v", "tag"])
    nb = normalize(b_rows, ["v", "tag"])
    # same pairing regardless of input order: tags align row-for-row
    assert [r[0] for r in na] == [r[0] for r in nb]
    # and the aligned float values compare equal under tolerance
    assert all(values_equal(x[1], y[1]) for x, y in zip(na, nb))


def test_none_sorts_before_values():
    from tools.drivercheck import normalize

    rows = [(1.5,), (None,), (0.5,)]
    out = normalize(rows, ["v"])
    assert out[0] == (None,)
