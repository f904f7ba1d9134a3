"""Stdlib media decode tests: REAL WAV/BMP decode paths with no codec
libraries (trustgraph_spark.multimodal stdlib decoders), verified against
independent analytic derivations of the synthesized signals."""

import math

import numpy as np
import pytest

from trustgraph_spark.multimodal import (
    decode_bmp_rgb,
    decode_wav_pcm,
    stdlib_decode,
    synth_bmp_payload,
    synth_wav_payload,
)


class TestWavDecode:
    def test_roundtrip_exact_samples(self):
        # independent replay of the integer sawtooth formula
        payload = synth_wav_payload(6)
        samples, sr = decode_wav_pcm(payload)
        assert sr == 8000 and len(samples) == 4000
        f = 200 + (6 % 8) * 100
        expected = [((i * f) % 8000) * 65535 // 8000 - 32768
                    for i in range(4000)]
        assert samples.tolist() == expected

    def test_wave_header_is_real(self):
        payload = synth_wav_payload(0)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"

    def test_rms_features_match_analytic(self):
        payload = synth_wav_payload(2)
        feats = stdlib_decode(payload, "audio")
        assert len(feats) == 16
        f = 200 + (2 % 8) * 100
        for k in (0, 7, 15):
            seg = [(((i * f) % 8000) * 65535 // 8000 - 32768) / 32768.0
                   for i in range(k * 250, (k + 1) * 250)]
            rms = math.sqrt(sum(x * x for x in seg) / 250)
            assert feats[k] == pytest.approx(rms, abs=1e-12)

    def test_rejects_non_mono(self):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"\0\0\0\0" * 4)
        with pytest.raises(ValueError, match="mono 16-bit"):
            decode_wav_pcm(buf.getvalue())


class TestBmpDecode:
    def test_pixels_match_formula(self):
        payload = synth_bmp_payload(5)
        rgb = decode_bmp_rgb(payload)
        assert rgb.shape == (8, 8, 3)
        for x, y in [(0, 0), (3, 4), (7, 7)]:
            luma = (x * 16 + y * 2 + (5 % 7) * 3) % 256
            assert tuple(rgb[y, x]) == (luma, luma, luma)

    def test_bottom_up_row_order_decoded(self):
        # scanline 0 in the FILE is the bottom row; the decoder must
        # restore top-down orientation
        payload = synth_bmp_payload(0)
        rgb = decode_bmp_rgb(payload)
        assert rgb[0, 0, 0] == 0        # luma(0,0) = 0
        assert rgb[7, 0, 0] == 14       # luma(0,7) = 14

    def test_histogram_features(self):
        payload = synth_bmp_payload(0)
        feats = stdlib_decode(payload, "image")
        assert len(feats) == 16
        assert feats.sum() == pytest.approx(1.0)
        # analytic histogram
        bins = np.zeros(16)
        for x in range(8):
            for y in range(8):
                bins[((x * 16 + y * 2) % 256) // 16] += 1
        assert np.allclose(feats, bins / 64.0)

    def test_rejects_non_bmp(self):
        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp_rgb(b"\x89PNG1234")


def test_unknown_format_raises_declared_stub_error():
    with pytest.raises(NotImplementedError, match="codec libraries"):
        stdlib_decode(b"\x89PNG....", "image")


class TestSparkSeam:
    def test_mixed_media_features_end_to_end(self, spark):
        from pyspark.sql import functions as F

        from trustgraph_spark.multimodal import (
            extract_media_features,
            stdlib_decode,
            synth_stdlib_media,
        )

        docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        media = synth_stdlib_media(docs)
        feats = extract_media_features(media, decode_fn=stdlib_decode)
        pdf = feats.toPandas()
        assert len(pdf) == 10
        assert set(pdf.kind) == {"audio", "image"}
        audio = pdf[pdf.media_id == "m2"].feature.iloc[0]
        expected = stdlib_decode(synth_wav_payload(2), "audio")
        assert np.allclose(audio, expected, atol=1e-6)  # float32 schema
        image = pdf[pdf.media_id == "m3"].feature.iloc[0]
        expected = stdlib_decode(synth_bmp_payload(3), "image")
        assert np.allclose(image, expected, atol=1e-6)


def test_short_and_ragged_wavs_decode_without_nan():
    # review fix: clips shorter than n_bands produce 0.0 for empty bands
    # (not NaN), and non-divisible lengths keep their tail samples
    import io
    import wave

    def pcm(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
        return buf.getvalue()

    short = stdlib_decode(pcm([16384] * 5), "audio")
    assert len(short) == 16
    assert not np.isnan(short).any()
    assert (short > 0).sum() == 5  # one band per real sample, rest 0.0

    ragged = stdlib_decode(pcm([32767] * 4007), "audio")
    assert not np.isnan(ragged).any()
    # every sample identical -> every band RMS equals |x|/32768 exactly,
    # which only holds if the tail samples were not dropped
    assert np.allclose(ragged, 32767 / 32768.0)
