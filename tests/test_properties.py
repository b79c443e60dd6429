"""Property-based tests (hypothesis) for the pure-Python primitives."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_example_spark.pipeline.extract import unpack_record

# nested dicts of scalars, up to 3 levels
scalars = st.one_of(st.integers(), st.text(max_size=8), st.booleans(), st.none())
keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=6
)
nested = st.recursive(
    st.dictionaries(keys, scalars, max_size=4),
    lambda children: st.dictionaries(keys, st.one_of(scalars, children), max_size=4),
    max_leaves=20,
)


@given(nested)
@settings(max_examples=200, deadline=None)
def test_unpack_preserves_every_leaf(record):
    flat = unpack_record(record)

    def leaves(d, prefix=""):
        for k, v in d.items():
            name = f"{prefix}{k}"
            if isinstance(v, dict):
                yield from leaves(v, prefix=f"{name}_")
            else:
                yield name, v

    expected = list(leaves(record))
    # every leaf value survives under its parent_child name; nothing is
    # invented. (Distinct nests can alias to the same flat key — e.g.
    # {'a': {'b': 1}} and {'a_b': 2} — last-write-wins like the
    # reference's unpack_data; so compare as dict, built in order.)
    assert flat == dict(expected)
    assert all(not isinstance(v, dict) for v in flat.values())


@given(st.dictionaries(keys, scalars, max_size=6))
@settings(max_examples=100, deadline=None)
def test_unpack_flat_record_is_identity(record):
    assert unpack_record(record) == record


def test_tokenizer_contract_is_cross_engine_identical(spark, duck):
    """Every dedup/text operator assumes ``spark_tokens`` and
    ``duck_tokens`` produce the SAME token stream; a divergence silently
    shifts shingles and flips candidate generation. One batch of
    adversarial strings through both engines, compared row by row."""
    import random

    from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens

    rng = random.Random(20260813)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n.,;:!?-_()[]{}'\"/\\@#$%^&*+=<>~`|"
    )
    cases = [
        "",
        " ",
        "\t\n",
        "a",
        "A B C",
        "--already--tokenized--",
        "x" * 500,
        "word " * 50,
        "123abc 456def",
        "punct!!!runs???between###words",
        "trailing space ",
        " leading space",
        "MiXeD CaSe ToKeNs",
    ] + ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80))) for _ in range(200)]
    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, text string")
    srows = {
        r["i"]: list(r["tk"])
        for r in sdf.selectExpr("i", f"{spark_tokens('text')} AS tk").collect()
    }
    duck.sql("CREATE OR REPLACE TABLE tok_cases(i int, text varchar)")
    duck.executemany("INSERT INTO tok_cases VALUES (?, ?)", [(i, c) for i, c in enumerate(cases)])
    drows = {
        i: list(tk)
        for i, tk in duck.sql(
            f"SELECT i, {duck_tokens('text')} AS tk FROM tok_cases"
        ).fetchall()
    }
    for i, case in enumerate(cases):
        assert srows[i] == drows[i], f"tokenizer diverged on {case!r}: {srows[i]} vs {drows[i]}"


@given(
    st.integers(min_value=1, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_png_header_roundtrip(width, height):
    from etl_pipeline_example_spark.operators.mediahdr import (
        parse_media_header,
        synth_png,
    )

    meta = parse_media_header(synth_png(width, height))
    assert (meta["width"], meta["height"]) == (width, height)


@given(
    st.integers(min_value=1, max_value=384000),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=10_000_000),
)
@settings(max_examples=200, deadline=None)
def test_wav_header_roundtrip(rate, channels, n_samples):
    from etl_pipeline_example_spark.operators.mediahdr import (
        parse_media_header,
        synth_wav,
    )

    meta = parse_media_header(synth_wav(rate, channels, n_samples))
    assert (meta["sample_rate"], meta["channels"]) == (rate, channels)
    assert meta["duration_ms"] == n_samples * 1000 // rate
