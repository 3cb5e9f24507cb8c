"""Audio host-path tests: PCM conversion, WAV IO, resampling, crossfade,
container encoders (WAV header bytes, FFmpeg argv contracts)."""
import asyncio
import struct

import numpy as np
import pytest

from chatterbox_tpu.audio import (
    AudioEncoder,
    AudioFormat,
    CrossfadeStitcher,
    equal_power_curves,
    float_to_pcm16,
    make_wav_header,
    read_wav,
    resample,
)
from chatterbox_tpu.audio.crossfade import trim_leading, trim_trailing
from chatterbox_tpu.audio.pcm import pcm16_to_float, write_wav


# ----------------------------------------------------------------------- PCM
def test_float_to_pcm16_roundtrip(rng):
    x = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    data = float_to_pcm16(x)
    assert len(data) == 2000
    y = pcm16_to_float(data)
    assert np.allclose(x, y, atol=2.0 / 32768)


def test_float_to_pcm16_clamps():
    x = np.array([-2.0, 2.0], dtype=np.float32)
    vals = np.frombuffer(float_to_pcm16(x), dtype="<i2")
    assert vals[0] == -32767 and vals[1] == 32767


def test_wav_header_bytes():
    h = make_wav_header(24000, 1, 16)
    assert h[:4] == b"RIFF"
    assert h[8:12] == b"WAVE"
    assert struct.unpack_from("<L", h, 4)[0] == 0xFFFFFFFF  # streaming size
    fmt = struct.unpack_from("<HHLLHH", h, 20)
    assert fmt == (1, 1, 24000, 48000, 2, 16)
    assert h[36:40] == b"data"
    assert struct.unpack_from("<L", h, 40)[0] == 0xFFFFFFFF


def test_wav_write_read_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.5, 0.5, 24000).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 24000)
    y, sr = read_wav(p)
    assert sr == 24000
    assert y.shape == x.shape
    assert np.allclose(x, y, atol=2.0 / 32768)


def test_resample_tone_frequency_preserved():
    sr_in, sr_out = 24000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 2
    # Dominant FFT bin should still be ~440 Hz
    spec = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spec) * sr_out / len(y)
    assert abs(peak_hz - 440) < 5


# ------------------------------------------------------------------ crossfade
def test_equal_power_curves_sum_of_squares():
    fo, fi = equal_power_curves(720)
    assert np.allclose(fo**2 + fi**2, 1.0, atol=1e-5)
    assert fo[0] == pytest.approx(1.0) and fi[0] == pytest.approx(0.0)


def test_stitcher_preserves_total_length():
    fl = 100
    st = CrossfadeStitcher(fl)
    chunks = [np.ones(500, np.float32) * k for k in (1, 2, 3)]
    out = [st.push(c) for c in chunks] + [st.flush()]
    total = sum(len(o) for o in out)
    # Each seam replaces fl+fl samples with fl mixed samples → lose fl per seam.
    assert total == 1500 - fl * (len(chunks) - 1)


def test_stitcher_exact_mix_math():
    # Seam samples must equal prev_tail*cos + head*sin exactly.
    fl = 64
    st = CrossfadeStitcher(fl)
    a = np.full(300, 2.0, np.float32)
    b = np.full(300, 4.0, np.float32)
    first = st.push(a)
    assert np.array_equal(first, a[:-fl])
    second = st.push(b)
    fo, fi = equal_power_curves(fl)
    expected_mix = a[-fl:] * fo + b[:fl] * fi
    assert np.allclose(second[:fl], expected_mix, atol=1e-6)
    # Body after the mix is the middle of b
    assert np.array_equal(second[fl:], b[fl:-fl])
    assert np.allclose(st.flush(), b[-fl:])


def test_stitcher_zero_fade_passthrough():
    st = CrossfadeStitcher(0)
    a, b = np.arange(5, dtype=np.float32), np.arange(5, 10, dtype=np.float32)
    out = np.concatenate([st.push(a), st.push(b), st.flush()])
    assert np.array_equal(out, np.concatenate([a, b]))


def test_stitcher_short_chunk_fallback_conserves_samples():
    """Chunks shorter than fade_len must not lose or duplicate audio (the
    reference's fallback drops the new chunk's body; ours must not)."""
    fl = 100
    st = CrossfadeStitcher(fl)
    outs = [st.push(np.ones(50, np.float32)), st.push(np.ones(300, np.float32)),
            st.push(np.ones(30, np.float32)), st.flush()]
    total_in = 50 + 300 + 30
    total_out = sum(len(o) for o in outs)
    assert total_out == total_in  # no fade was possible → pure pass-through


def test_stitcher_between_fl_and_2fl_no_duplication():
    """A chunk with fl < len <= 2*fl must not double-play its overlap."""
    fl = 100
    st = CrossfadeStitcher(fl)
    a = st.push(np.arange(500, dtype=np.float32))
    b = st.push(np.arange(150, dtype=np.float32))  # between fl and 2fl
    tail = st.flush()
    # one seam faded: total out = 500 + 150 - fl
    assert len(a) + len(b) + len(tail) == 500 + 150 - fl


def test_trim_helpers():
    x = np.arange(24000, dtype=np.float32)
    assert len(trim_leading(x, 100, 24000)) == 24000 - 2400
    assert len(trim_trailing(x, 100, 24000)) == 24000 - 2400
    # No-op when trim longer than the audio
    assert len(trim_leading(x[:100], 100, 24000)) == 100


# ------------------------------------------------------------------- encoders
def _collect(coro_gen):
    async def run():
        return [c async for c in coro_gen]

    return asyncio.run(run())


async def _agen(chunks):
    for c in chunks:
        yield c


def test_raw_pcm_passthrough():
    chunks = [b"abc", b"def"]
    enc = AudioEncoder("raw_pcm", 24000)
    out = _collect(enc.encode(_agen(chunks)))
    assert out == chunks


def test_wav_stream_has_header_then_data():
    enc = AudioEncoder("wav", 24000)
    out = _collect(enc.encode(_agen([b"\x01\x02", b"\x03\x04"])))
    assert out[0][:4] == b"RIFF" and len(out[0]) == 44
    assert out[1:] == [b"\x01\x02", b"\x03\x04"]


def test_mime_types_and_extensions():
    cases = {
        "wav": ("audio/wav", ".wav"),
        "raw_pcm": ("audio/pcm", ".pcm"),
        "fmp4": ("audio/mp4", ".mp4"),
        "mp3": ("audio/mpeg", ".mp3"),
        "webm": ("audio/webm", ".webm"),
    }
    for fmt, (mime, ext) in cases.items():
        enc = AudioEncoder(fmt, 24000)
        assert enc.get_mime_type() == mime
        assert enc.get_file_extension() == ext


def test_invalid_format_raises():
    with pytest.raises(ValueError):
        AudioEncoder("ogg", 24000)


def test_ffmpeg_argv_contracts():
    fmp4 = AudioEncoder("fmp4", 24000).ffmpeg_argv()
    assert fmp4[0] == "ffmpeg" and "aac" in fmp4 and "mp4" in fmp4
    assert "frag_keyframe+empty_moov+default_base_moof+dash" in fmp4
    assert "500000" in fmp4  # 500 ms fragments

    mp3 = AudioEncoder("mp3", 24000).ffmpeg_argv()
    assert "libmp3lame" in mp3 and "128k" in mp3

    webm = AudioEncoder("webm", 24000).ffmpeg_argv()
    assert "libopus" in webm and "-cluster_time_limit" in webm and "50" in webm
    for argv in (fmp4, mp3, webm):
        assert argv[argv.index("-ar") + 1] == "24000"
        assert "pipe:0" in argv and "pipe:1" in argv
