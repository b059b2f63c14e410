"""Property tests: the three media codecs are exact inverses over
arbitrary shapes/values (hypothesis; no Ray needed — pure kernels)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from techtalk_data_pipeline_snowpark_ray.functions import (
    audiocodec, imagecodec, videocodec)


@st.composite
def gray_images(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(gray_images())
def test_png_bmp_roundtrip(img):
    assert (imagecodec.decode_png(imagecodec.encode_png_gray8(img))
            == img).all()
    assert (imagecodec.decode_bmp(imagecodec.encode_bmp_gray8(img))
            == img).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 2000),
       st.sampled_from([8000, 16000, 44100]),
       st.integers(1, 3))
def test_wav_roundtrip(seed, n, rate, channels):
    rng = np.random.default_rng(seed)
    shape = (n,) if channels == 1 else (n, channels)
    s = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
    dec, r = audiocodec.decode_wav(audiocodec.encode_wav_pcm16(s, rate))
    assert r == rate
    assert dec.shape == s.shape and (dec == s).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 12),
       st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([24, 25, 30, 60]))
def test_y4m_roundtrip(seed, n, h, w, fps):
    rng = np.random.default_rng(seed)
    f = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    dec, r = videocodec.decode_y4m(videocodec.encode_y4m_mono(f, fps=fps))
    assert r == fps
    assert dec.shape == (n, h, w) and (dec == f).all()
