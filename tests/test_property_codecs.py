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


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**31 - 1), st.sampled_from(["wav", "y4m", "png"]))
def test_corrupt_payloads_fail_loudly_not_weirdly(seed, kind):
    """Random byte mutations / truncations / appends on a valid payload
    must either decode or raise ValueError (or the documented
    NotImplementedError for valid-but-unsupported headers) -- never a
    struct/zlib/index error leaking out of the codec boundary."""
    import random

    from techtalk_data_pipeline_snowpark_ray.functions import (
        audiocodec as ac, imagecodec as ic, videocodec as vc)
    base = {
        "wav": (ac.encode_wav_pcm16(np.arange(100, dtype=np.int16), 8000),
                ac.decode_wav),
        "y4m": (vc.encode_y4m_mono(np.zeros((3, 4, 5), np.uint8)),
                vc.decode_y4m),
        "png": (ic.encode_png_gray8(np.arange(20, dtype=np.uint8)
                                    .reshape(5, 4)), ic.decode_image),
    }
    payload, dec = base[kind]
    rng = random.Random(seed)
    b = bytearray(payload)
    for _ in range(rng.randint(1, 6)):
        if len(b) < 2:
            break
        op = rng.random()
        if op < 0.5:
            b[rng.randrange(len(b))] = rng.randrange(256)
        elif op < 0.8:
            del b[rng.randrange(1, len(b)):]
        else:
            b += bytes([rng.randrange(256)])
    try:
        dec(bytes(b))
    except (ValueError, NotImplementedError):
        pass
