"""Unit tests for the Goertzel tone probe: the closed-form samples the
oracle assumes really are what the wave-module decode produces, the
integer recurrence agrees with a pure-Python reference, and resonance
behaves like tone detection."""

from __future__ import annotations

import sparkroach.queries.llm_ops17 as m
from sparkroach.functions.media import (
    decode_wav_samples,
    encode_wav,
    wav_params,
)


def _closed_form_samples(doc_id: int, n: int) -> list[int]:
    """The oracle's doc_id arithmetic, evaluated directly."""
    p = wav_params(doc_id)
    amp, nch = p["amplitude"], p["n_channels"]
    return [amp * (1 - 2 * ((i // nch) % 2)) for i in range(n)]


def test_oracle_closed_form_matches_real_decode():
    """The gate's oracle derives samples from doc_id arithmetic; this
    pins that arithmetic to the REAL encode→decode chain, so the oracle
    is not a copy of a shared mistake."""
    for doc_id in [1, 4, 7, 10, 13, 100, 1003, 4999]:
        if doc_id % 3 != 1:
            continue
        real = decode_wav_samples(encode_wav(doc_id), m._GZ_N)
        assert real == _closed_form_samples(doc_id, m._GZ_N), doc_id


def _py_goertzel(xs: list[int], k: int) -> int:
    q = m._GZ_Q

    def fd(a: int) -> int:
        return (a - (a % q + q) % q) // q

    s1 = s2 = 0
    for x in xs:
        s1, s2 = fd(k * s1) - s2 + x, s1
    return s1 * s1 + s2 * s2 - fd(k * s1 * s2)


def test_resonance_separates_matching_bin(spark, monkeypatch):
    """Mono docs alternate every sample (the fs/2 bin, K=-2048); stereo
    docs alternate every two samples (fs/4, K=0).  Each population's
    energy at ITS bin must dominate the off-bin control (K=1448) by
    orders of magnitude — the detection claim, not just arithmetic."""
    mono_id, stereo_id = 1, 4  # (doc_id//3)%2 = 0 → mono; 1 → stereo
    assert wav_params(mono_id)["n_channels"] == 1
    assert wav_params(stereo_id)["n_channels"] == 2
    for doc_id, res_k in ((mono_id, -2048), (stereo_id, 0)):
        xs = decode_wav_samples(encode_wav(doc_id), m._GZ_N)
        e_res = _py_goertzel(xs, res_k)
        e_off = _py_goertzel(xs, 1448)
        assert e_res > 100 * max(e_off, 1), (doc_id, e_res, e_off)


def test_spark_fold_matches_python_reference(spark):
    """The one-expression aggregate() fold is the implementation; pin it
    against the step-by-step Python reference on real decoded samples."""
    xs = decode_wav_samples(encode_wav(7), m._GZ_N)
    for k in m._GZ_PROBES:
        step = m._spark_fd(f"{k} * acc.s1")
        fold = (
            f"aggregate(xs, named_struct('s1', CAST(0 AS BIGINT), "
            f"'s2', CAST(0 AS BIGINT)), (acc, x) -> "
            f"named_struct('s1', {step} - acc.s2 + x, 's2', acc.s1))"
        )
        energy = m._spark_fd(f"{k} * st.s1 * st.s2")
        got = (
            spark.createDataFrame([(xs,)], "xs array<long>")
            .selectExpr(f"{fold} AS st")
            .selectExpr(
                f"CAST(st.s1 * st.s1 + st.s2 * st.s2 - {energy} AS BIGINT)"
                " AS e"
            )
            .collect()[0]["e"]
        )
        assert got == _py_goertzel(xs, k), k


def test_decode_wav_samples_is_strict():
    import pytest

    with pytest.raises(ValueError, match="need"):
        decode_wav_samples(encode_wav(1), 10**6)