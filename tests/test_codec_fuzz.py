"""Property-based fuzz for the two REAL pure-Python codecs (BMP, WAV):
encode → decode must be exact for ARBITRARY payload content, not just the
affine-formula fixtures — hypothesis drives shapes, channel counts,
sample rates and raw values, plus a junk-prefix property for the WAV
chunk walk. Driver-free (no Spark): the codecs are plain functions, so
these run in milliseconds and shrink to minimal counterexamples."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dmp_crawler_spark.operators import multimodal


@settings(max_examples=120, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    top_down=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_fuzz(w, h, top_down, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = multimodal.decode_bmp(multimodal.encode_bmp(px, top_down=top_down))
    assert np.array_equal(out, px)


@settings(max_examples=120, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=600),
    nch=st.integers(min_value=1, max_value=4),
    sr=st.sampled_from([8000, 11025, 16000, 22050, 44100]),
    junk=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_fuzz(n, nch, sr, junk, seed):
    rng = np.random.default_rng(seed)
    smp = rng.integers(-32768, 32768, size=(n, nch), dtype=np.int64).astype(
        np.int16
    )
    payload = multimodal.encode_wav(smp, sr, junk_chunk=junk)
    out, sr2, bits = multimodal.decode_wav(payload)
    assert (sr2, bits) == (sr, 16)
    assert np.array_equal(out, smp.astype(np.int32))


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_wav_decoder_never_silently_succeeds_on_noise(data):
    """Arbitrary non-RIFF bytes must raise, never return wrong samples.
    (A valid WAV needs the RIFF/WAVE magic plus a well-formed chunk list;
    random short noise prefixed with neither must be rejected.)"""
    if data[:4] == b"RIFF":
        return  # astronomically unlikely, but not this property's subject
    try:
        multimodal.decode_wav(data)
        raise AssertionError("decode_wav accepted non-RIFF noise")
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_bmp_decoder_never_silently_succeeds_on_noise(data):
    if data[:2] == b"BM":
        return
    try:
        multimodal.decode_bmp(data)
        raise AssertionError("decode_bmp accepted non-BMP noise")
    except ValueError:
        pass
