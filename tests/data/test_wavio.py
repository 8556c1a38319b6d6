import numpy as np

from audiogan_tpu.data import read_wav, write_wav


def test_round_trip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, size=4000).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, 16000, x)
    rate, y = read_wav(p)
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 16000)


def test_matches_scipy_reader(tmp_path, rng):
    import scipy.io.wavfile as sw
    x = (rng.uniform(-1, 1, size=1000) * 32000).astype(np.int16)
    p = tmp_path / "b.wav"
    sw.write(p, 22050, x)
    rate, y = read_wav(p)
    assert rate == 22050
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_scipy_reads_ours(tmp_path, rng):
    import scipy.io.wavfile as sw
    x = rng.uniform(-0.5, 0.5, size=777).astype(np.float32)
    p = tmp_path / "c.wav"
    write_wav(p, 44100, x)
    rate, y = sw.read(p)
    assert rate == 44100
    np.testing.assert_allclose(y.astype(np.float32) / 32768.0, x, atol=1e-4)


def test_stereo_mono_mix(tmp_path):
    import scipy.io.wavfile as sw
    x = np.stack([np.ones(100), -np.ones(100)], axis=1)
    x16 = (x * 16000).astype(np.int16)
    p = tmp_path / "d.wav"
    sw.write(p, 8000, x16)
    _, y = read_wav(p, mono=True)
    np.testing.assert_allclose(y, 0.0, atol=1e-6)


def _write_extensible(path, rate, x32, subformat):
    """Hand-rolled WAVE_FORMAT_EXTENSIBLE wav: 40-byte fmt chunk with the
    real format code in the SubFormat GUID (like ffmpeg/Audacity emit)."""
    import struct
    raw = x32.tobytes()
    guid = struct.pack("<H", subformat) + b"\x00\x00" + \
        b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, rate, rate * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 4) + guid
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    hdr = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE"
    path.write_bytes(hdr + body)


def test_extensible_float32_reads_as_float(tmp_path, rng):
    """r3 review: EXTENSIBLE wavs must be classified by the SubFormat
    GUID, not bit depth — extensible float32 was decoded as int32 PCM."""
    x = rng.uniform(-0.5, 0.5, size=512).astype("<f4")
    p = tmp_path / "ext_f32.wav"
    _write_extensible(p, 16000, x, subformat=3)      # IEEE float
    rate, y = read_wav(p)
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_extensible_int32_reads_as_pcm(tmp_path, rng):
    x = (rng.uniform(-1, 1, size=512) * 2**30).astype("<i4")
    p = tmp_path / "ext_i32.wav"
    _write_extensible(p, 16000, x, subformat=1)      # PCM
    rate, y = read_wav(p)
    np.testing.assert_allclose(y, x.astype(np.float32) / 2**31, atol=1e-7)
