"""Property-based tests (hypothesis) for the round-16 byte codecs.

The planted-pattern oracles certify the codecs on structured inputs;
these properties drive RANDOM inputs through the same arithmetic —
the Avro encode→decode pair on arbitrary flat records, and the
progressive-JPEG AC scan layers (EOBRUN, ZRL, refinement correction
bits) on arbitrary sparse coefficient blocks, where the adversarial
cases (long zero runs straddling windows, all-zero bands, every-cell
bands, |v| = 1 newly-nonzero floods) occur far more often than any
hand plant would put them."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- Avro

_scalar_types = [
    ("int", st.integers(-(2**31), 2**31 - 1)),
    ("long", st.integers(-(2**63), 2**63 - 1)),
    ("string", st.text(max_size=20)),
    ("boolean", st.booleans()),
    (
        "double",
        st.floats(allow_nan=False, allow_infinity=True, width=64),
    ),
    ("bytes", st.binary(max_size=16)),
]


@st.composite
def avro_schema_and_rows(draw):
    n_fields = draw(st.integers(1, 5))
    fields = []
    gens = []
    for i in range(n_fields):
        t, gen = _scalar_types[
            draw(st.integers(0, len(_scalar_types) - 1))
        ]
        nullable = draw(st.booleans())
        if nullable:
            fields.append({"name": f"f{i}", "type": ["null", t]})
            gens.append(st.one_of(st.none(), gen))
        else:
            fields.append({"name": f"f{i}", "type": t})
            gens.append(gen)
    # one array and one map field to exercise block framing
    fields.append(
        {"name": "arr", "type": {"type": "array", "items": "long"}}
    )
    gens.append(st.lists(st.integers(-(2**40), 2**40), max_size=6))
    fields.append(
        {"name": "mp", "type": {"type": "map", "values": "int"}}
    )
    gens.append(
        st.dictionaries(
            st.text(max_size=6), st.integers(-1000, 1000), max_size=4
        )
    )
    schema = {"type": "record", "name": "t", "fields": fields}
    n_rows = draw(st.integers(0, 8))
    rows = [
        {f["name"]: draw(g) for f, g in zip(fields, gens)}
        for _ in range(n_rows)
    ]
    return schema, rows


@given(avro_schema_and_rows())
@settings(max_examples=150, deadline=None)
def test_avro_write_read_roundtrip(sr):
    from etl_pipeline_example_spark.pipeline.avroread import read_avro_ocf
    from etl_pipeline_example_spark.pipeline.avrowrite import write_avro_ocf

    schema, rows = sr
    got_schema, got = read_avro_ocf(write_avro_ocf(schema, rows))
    assert got_schema["fields"] == schema["fields"]
    assert got == rows


# ------------------------------------------------ progressive JPEG ACs

def _block(draw, st_mod):
    """One 64-entry zigzag block, sparse by default, |v| <= 15 (the
    prog table codes first-scan magnitudes up to size 3 = 7, so at
    Al=1 full values up to 15)."""
    zz = [0] * 64
    n = draw(st_mod.integers(0, 12))
    for _ in range(n):
        pos = draw(st_mod.integers(1, 63))
        v = draw(st_mod.integers(-15, 15))
        zz[pos] = v
    return zz


@st.composite
def blocks_and_band(draw):
    n_blocks = draw(st.integers(1, 10))
    blocks = [_block(draw, st) for _ in range(n_blocks)]
    ss = draw(st.integers(1, 40))
    se = draw(st.integers(ss, 63))
    return blocks, ss, se


@given(blocks_and_band())
@settings(max_examples=150, deadline=None)
def test_jpegprog_ac_scan_pair_roundtrips_random_blocks(bb):
    """Encode a first (Ah=0, Al=1) scan and its refinement (Ah=1,
    Al=0) over random sparse blocks, decode both, and require: the
    post-first-scan state is exactly the truncated-toward-zero
    values, and the post-refinement state is exactly the input."""
    from etl_pipeline_example_spark.operators.jpegdecode import (
        _BitReader,
        _dec_table,
        _enc_table,
    )
    from etl_pipeline_example_spark.operators.jpegprog import (
        _ACP_BITS,
        _ACP_VALS_LUMA,
        _AcScanState,
        _BitWriter,
        _decode_ac_first_block,
        _decode_ac_refine_block,
        _ProgStats,
        _encode_ac_first,
        _encode_ac_refine,
    )

    blocks, ss, se = bb
    enc = _enc_table(_ACP_BITS, _ACP_VALS_LUMA)
    dec = _dec_table(_ACP_BITS, _ACP_VALS_LUMA)
    al = 1

    bw1 = _BitWriter()
    st1 = _AcScanState(bw1, enc)
    for zz in blocks:
        _encode_ac_first(st1, zz, ss, se, al)
    st1.flush_eobrun()
    # the writer emits the ON-WIRE stuffed form (T.81 B.1.1.5: ff -> ff00);
    # destuff before the bit reader exactly as the scan decoder does
    # (jpegprog.decode_progressive strips ff00 before _BitReader)
    data1 = bw1.flush().replace(b"\xff\x00", b"\xff")

    state = {"eobrun": 0}
    br = _BitReader(data1)
    decoded = [[0] * 64 for _ in blocks]
    stats = _ProgStats()
    for zz in decoded:
        _decode_ac_first_block(br, zz, dec, ss, se, al, state, stats)
    for zz, src in zip(decoded, blocks):
        for k in range(ss, se + 1):
            v = src[k]
            trunc = -((-v) >> al) if v < 0 else v >> al
            assert zz[k] == trunc << al, (ss, se, k, v, zz[k])

    bw2 = _BitWriter()
    st2 = _AcScanState(bw2, enc)
    for zz in blocks:
        _encode_ac_refine(st2, zz, ss, se, 0)
    st2.flush_eobrun()
    data2 = bw2.flush().replace(b"\xff\x00", b"\xff")

    state2 = {"eobrun": 0}
    br2 = _BitReader(data2)
    stats2 = _ProgStats()
    for zz in decoded:
        _decode_ac_refine_block(br2, zz, dec, ss, se, 0, state2, stats2)
    for zz, src in zip(decoded, blocks):
        for k in range(ss, se + 1):
            assert zz[k] == src[k], (ss, se, k, src[k], zz[k])
