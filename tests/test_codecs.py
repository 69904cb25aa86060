"""Real PNG/WAV codecs (ops/codecs.py): round-trips through every PNG
filter type and channel count, real features through the Spark
multimodal operators, poison-pill behavior on corrupt payloads."""

import numpy as np
import pytest

from gojsonschema_spark.ops.codecs import (decode_png, decode_wav,
                                           encode_png, encode_wav,
                                           png_feature_decoder, png_resizer,
                                           wav_feature_decoder)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type, channels):
    """encode(filter=f) -> decode must reproduce the array exactly for
    every scanline filter (None/Sub/Up/Average/Paeth) and color type
    (grey, grey+alpha, RGB, RGBA) — the forward filter and the decoder's
    reconstruction are independent implementations, so the round-trip
    genuinely exercises each unfilter path."""
    rng = np.random.RandomState(7 * filter_type + channels)
    arr = rng.randint(0, 256, size=(13, 9, channels), dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a not a png")
    # valid signature, truncated body
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(good[:20])


def test_png_feature_decoder_values():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    arr[0, 0] = 255  # one white pixel
    w, h, c, mean, std, mn, mx, edge = png_feature_decoder(encode_png(arr))
    assert (w, h, c) == (2.0, 2.0, 3.0)
    assert mn == 0.0 and mx == 1.0
    assert abs(mean - 0.25) < 1e-12
    assert edge > 0.0  # white-black boundary has gradient energy


def test_png_resizer_nearest():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    small = decode_png(png_resizer(encode_png(arr), width=3, height=2))
    ys = (np.arange(2) * 4) // 2
    xs = (np.arange(3) * 6) // 3
    assert np.array_equal(small, arr[ys][:, xs])


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(rate) / rate                      # 1 second
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(sig, rate=rate)
    data, got_rate = decode_wav(payload)
    assert got_rate == rate and data.shape == (rate, 1)
    assert np.abs(data[:, 0] - sig).max() < 1.0 / 32000  # 16-bit quantization

    dur, r, ch, rms, peak, zcr = wav_feature_decoder(payload)
    assert (dur, r, ch) == (1.0, float(rate), 1.0)
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3       # sine RMS = A/sqrt(2)
    assert abs(peak - 0.5) < 1e-3
    assert abs(zcr - 2 * 440 / rate) < 1e-3         # 2 crossings per cycle


def test_real_codecs_through_spark_multimodal(spark):
    """The mapInPandas plumbing runs the REAL codecs end to end: feature
    extraction returns genuine image statistics, corrupt payloads
    poison-pill to NULL, and resized payloads decode to the target
    shape on the driver."""
    from gojsonschema_spark.ops.multimodal import (extract_features,
                                                   resize_images)

    rng = np.random.RandomState(11)
    imgs = {f"k{i}": rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
            for i in range(4)}
    rows = [(k, bytearray(encode_png(v))) for k, v in imgs.items()]
    rows.append(("bad", bytearray(b"not an image at all")))
    df = spark.createDataFrame(rows, "key string, payload binary")

    feats = {r.key: r.feature for r in
             extract_features(df, decoder=png_feature_decoder).collect()}
    assert feats["bad"] is None
    for k, arr in imgs.items():
        f = arr.astype(np.float64) / 255.0
        got = feats[k]
        assert got is not None and len(got) == 8
        assert abs(got[3] - f.mean()) < 1e-6        # float32 column
        assert (got[0], got[1], got[2]) == (8.0, 8.0, 3.0)

    resized = {r.key: r for r in
               resize_images(df, width=4, height=4,
                             resizer=png_resizer).collect()}
    assert resized["bad"].payload is None
    out = decode_png(bytes(resized["k0"].payload))
    assert out.shape == (4, 4, 3)
