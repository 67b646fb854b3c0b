"""Property-based robustness: the functions that eat raw web input must be
total (never raise) and canonicalization must be idempotent."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from obp_search_engine_spark.functions.extract import extract_links, extract_text
from obp_search_engine_spark.functions.robots import disallowed, parse_robots
from obp_search_engine_spark.functions.tokenize import process_text
from obp_search_engine_spark.functions.urls import canonicalize_url


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_canonicalize_total_and_idempotent(s):
    c = canonicalize_url(s)
    if c is not None:
        assert canonicalize_url(c) == c  # idempotence
        assert "#" not in c
        assert "://" in c


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_extractors_total_on_garbage_bytes(b):
    links = extract_links(b)
    assert isinstance(links, list)
    t = extract_text(b)
    assert t is None or isinstance(t, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_robots_parser_total(s):
    rules = parse_robots(s)
    assert isinstance(rules, str)
    assert isinstance(disallowed("/any/path", rules), bool)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_process_text_total(s):
    toks = process_text(s)
    assert all(" " not in t and t for t in toks)


# ---------------------------------------------------------------------------
# stdlib PNG/WAV codec properties (round 5): encode->decode round-trips
# exactly for EVERY image shape, channel count, and scanline filter type
# ---------------------------------------------------------------------------
@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ch=st.integers(1, 4),
    filt=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_exact(w, h, ch, filt, seed):
    import numpy as np

    from obp_search_engine_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    dec = decode_png(encode_png(img, filter_type=filt))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)


@settings(max_examples=20, deadline=None)
@given(
    sr=st.sampled_from([8000, 16000, 44100]),
    n=st.integers(1, 4000),
    nch=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_exact(sr, n, nch, seed):
    import io
    import wave

    import numpy as np

    from obp_search_engine_spark.operators.multimodal import decode_wav

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=n * nch, dtype=np.int64).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())
    srr, nchr, nfr, dur, rms = decode_wav(buf.getvalue())
    assert (srr, nchr, nfr) == (sr, nch, n)
    assert dur == n / sr
    exp = float(np.sqrt(np.mean((x.astype(np.float64) / 32768.0) ** 2)))
    assert abs(rms - exp) < 1e-12
