"""YouTube streaming-source dataloader (SimulEval parity, periphery).

Reference: `SimulEval/simuleval/data/dataloader/s2t_dataloader.py:25-56,114-140`.
The download itself is gated on yt_dlp (absent here); everything around it —
URL parsing, caching, mono-16k conversion — is tested with an injected
downloader.
"""

import wave

import numpy as np
import pytest

from streamspeech_tpu.data.youtube import (
    get_video_id,
    is_youtube_url,
    resolve_youtube_source,
    to_mono_16k,
)


def write_wav(path, sr=48000, ch=2, seconds=0.25, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    data = np.stack([x] * ch, axis=1)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(data.tobytes())


def test_url_detection_and_video_id():
    assert is_youtube_url("https://www.youtube.com/watch?v=dQw4w9WgXcQ")
    assert is_youtube_url("https://youtu.be/dQw4w9WgXcQ")
    assert not is_youtube_url("https://example.com/watch?v=x")
    assert not is_youtube_url("audio/utt1.wav")
    assert get_video_id(
        "https://www.youtube.com/watch?v=dQw4w9WgXcQ&t=10") == "dQw4w9WgXcQ"
    assert get_video_id("https://youtu.be/abc123_-") == "abc123_-"
    with pytest.raises(ValueError):
        get_video_id("https://www.youtube.com/playlist?list=PL1")


def test_to_mono_16k(tmp_path):
    p = tmp_path / "in.wav"
    write_wav(p, sr=48000, ch=2, seconds=0.25)
    out = to_mono_16k(str(p), str(tmp_path / "out.wav"))
    with wave.open(out, "rb") as f:
        assert f.getnchannels() == 1
        assert f.getframerate() == 16000
        n = f.getnframes()
    assert abs(n - 4000) <= 1  # 0.25 s at 16 kHz


def test_resolve_downloads_once_then_caches(tmp_path):
    calls = []

    def fake_dl(url, out_base):
        calls.append(url)
        write_wav(out_base + ".wav", sr=22050, ch=1)
        return out_base + ".wav"

    url = "https://www.youtube.com/watch?v=vid42"
    p1 = resolve_youtube_source(url, cache_dir=str(tmp_path),
                                downloader=fake_dl)
    p2 = resolve_youtube_source(url, cache_dir=str(tmp_path),
                                downloader=fake_dl)
    assert p1 == p2 and p1.endswith("vid42.wav")
    assert calls == [url]  # second hit served from cache
    with wave.open(p1, "rb") as f:
        assert f.getframerate() == 16000 and f.getnchannels() == 1


def test_missing_ytdlp_raises_actionable_error(tmp_path):
    with pytest.raises(RuntimeError, match="yt_dlp"):
        resolve_youtube_source("https://youtu.be/nope", cache_dir=str(tmp_path))
