"""Round-16 hand-computed unit tests (new/changed operators this round)."""

from __future__ import annotations

import struct

import numpy as np


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


def test_jpegprog_roundtrip_matches_planted_and_baseline():
    """The 10-scan progressive file must decode to EXACTLY the planted
    quantized coefficients — and to exactly what the baseline (SOF0)
    codec produces for the same doc_id, pixel planes included. Two
    independently-written decoders agreeing on the same coefficient
    tensor is the strongest in-repo check the entropy layers are
    right."""
    from etl_pipeline_example_spark.operators.jpegdecode import (
        _grid,
        decode_jpeg,
        encode_jpeg,
    )
    from etl_pipeline_example_spark.operators.jpegprog import (
        _planted_zz,
        decode_progressive,
        encode_progressive,
    )

    for doc_id in (0, 3, 17, 41, 254):
        planes, quant, st = decode_progressive(encode_progressive(doc_id))
        bplanes, bquant = decode_jpeg(encode_jpeg(doc_id))
        nbx, nby = _grid(doc_id)
        assert quant.shape == (nby, nbx, 3, 64)
        for by in range(nby):
            for bx in range(nbx):
                for c in range(3):
                    assert (
                        quant[by, bx, c]
                        == np.array(_planted_zz(doc_id, bx, by, c))
                    ).all(), (doc_id, bx, by, c)
        assert (quant == bquant).all()
        for c in range(3):
            assert (planes[c] == bplanes[c]).all()
        assert st.n_scans == 10


def test_jpegprog_refinement_diagnostics_hand_computed():
    """doc_id=2 (grid 4x2): AC-bearing blocks have (bx+by) odd parity.
    Per such block the planted values are v1 = 1+(2+bx+by)%9 and
    v2 = -(1+(14+bx)%9); the successive-approximation diagnostics are
    pure arithmetic over them — hand-folded here, then asserted
    against what the DECODER measured while reading the bitstream."""
    from etl_pipeline_example_spark.operators.jpegdecode import planted_acs
    from etl_pipeline_example_spark.operators.jpegprog import (
        decode_progressive,
        encode_progressive,
    )

    doc_id = 2
    nbx, nby = 4, 2  # _grid(2) = (2 + 2 % 6, 2 + 6 % 6)
    exp_first = exp_new = exp_corr = 0
    for by in range(nby):
        for bx in range(nbx):
            for _pos, v in planted_acs(doc_id, bx, by):
                a = abs(v)
                exp_first += (1 if v > 0 else -1) * (a // 2) * 2
                exp_new += a == 1
                exp_corr += a > 1 and a % 2 == 1
    # same AC plant in all 3 components
    exp_first, exp_new, exp_corr = 3 * exp_first, 3 * exp_new, 3 * exp_corr
    _planes, _quant, st = decode_progressive(encode_progressive(doc_id))
    assert st.sum_ac_first == exp_first
    assert st.n_new_nonzero == exp_new
    assert st.n_corr_one == exp_corr


def test_jpegprog_scan_structure_and_rare_codes_exercised():
    """Parse the emitted markers: SOF2 (not SOF0), exactly 10 SOS
    segments whose (Ss, Se, Ah, Al) match the declared plan, every
    first scan before every refinement scan per coefficient. And the
    hard arms really fire: EOBn with n >= 1 (multi-block EOB runs with
    appended length bits) and ZRL (16-zero runs) are both decoded a
    nonzero number of times across a doc_id spread."""
    from etl_pipeline_example_spark.operators.jpegprog import (
        _SCAN_PLAN,
        decode_progressive,
        encode_progressive,
    )

    payload = encode_progressive(7)
    markers = []
    sos_params = []
    pos = 2
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF or payload[pos + 1] == 0x00:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:
            markers.append(marker)
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        markers.append(marker)
        if marker == 0xDA:
            ns = body[0]
            ss, se, aa = body[1 + 2 * ns : 4 + 2 * ns]
            sos_params.append((ss, se, aa >> 4, aa & 0xF))
            # skip entropy data to the next marker
            end = pos + 2 + length
            while True:
                end = payload.index(b"\xff", end)
                if payload[end + 1] != 0x00:
                    break
                end += 2
            pos = end
            continue
        pos += 2 + length
    assert 0xC2 in markers and 0xC0 not in markers
    assert markers.count(0xDA) == 10
    assert sos_params == [(ss, se, ah, al) for _c, ss, se, ah, al in _SCAN_PLAN]

    eobn_hi = zrl = 0
    for doc_id in range(12):
        _p, _q, st = decode_progressive(encode_progressive(doc_id))
        eobn_hi += st.n_eobn_hi
        zrl += st.n_zrl
    assert eobn_hi > 0 and zrl > 0


def test_jpegprog_and_baseline_reject_each_other():
    """Loud-failure contract both ways: the progressive decoder refuses
    a baseline (SOF0) file and the baseline decoder refuses a
    progressive (SOF2) file — no silent wrong-path decode."""
    import pytest

    from etl_pipeline_example_spark.operators.jpegdecode import (
        decode_jpeg,
        encode_jpeg,
    )
    from etl_pipeline_example_spark.operators.jpegprog import (
        decode_progressive,
        encode_progressive,
    )

    with pytest.raises(ValueError, match="not progressive"):
        decode_progressive(encode_jpeg(5))
    with pytest.raises(ValueError, match="not baseline"):
        decode_jpeg(encode_progressive(5))


def test_jpegprog_operator_matches_oracle(spark, duck, sf_dir):
    from etl_pipeline_example_spark.operators.jpegprog import (
        JPEGPROG_ORACLES,
        multimodal_decode_jpeg2,
    )
    from tests.oracle_util import assert_matches_oracle

    df = multimodal_decode_jpeg2(spark, sf_dir)
    assert_matches_oracle(df, duck, JPEGPROG_ORACLES["multimodal_decode_jpeg2"])
