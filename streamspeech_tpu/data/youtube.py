"""YouTube streaming-source dataloading (SimulEval parity, periphery).

Behavioral reference `SimulEval/simuleval/data/dataloader/s2t_dataloader.py:25-56,114-140`
(YoutubeToTextDataloader / YoutubeToSpeechDataloader): resolve a YouTube URL
to a cached `<video_id>.wav`, downloading the bestaudio stream via yt_dlp and
converting to mono 16 kHz. Here the download is GATED on yt_dlp being
importable (this environment has no network egress and no yt_dlp/pydub/ffmpeg)
— URL parsing, caching, and the mono-16k conversion are pure stdlib/numpy and
fully tested; the downloader is injectable for tests.

`cli.simuleval` routes source lines that look like YouTube URLs through
`resolve_youtube_source`, the equivalent of the reference's
`--dataloader youtube-to-{text,speech}` selection.
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

YOUTUBE_HOSTS = ("youtube.com", "www.youtube.com", "m.youtube.com",
                 "youtu.be", "www.youtu.be")


def is_youtube_url(ref: str) -> bool:
    if not ref.startswith(("http://", "https://")):
        return False
    return urlparse(ref).netloc.lower() in YOUTUBE_HOSTS


def get_video_id(url: str) -> str:
    """`?v=` query param (reference semantics, s2t_dataloader.py:26-32), plus
    the youtu.be/<id> short form the reference chokes on."""
    u = urlparse(url)
    video = parse_qs(u.query).get("v", [])
    if video:
        return video[0]
    if u.netloc.lower().endswith("youtu.be") and len(u.path) > 1:
        return u.path.lstrip("/").split("/")[0]
    raise ValueError(f"unrecognized youtube url format: {url}")


def to_mono_16k(path: str, out_path: Optional[str] = None) -> str:
    """Convert a wav to mono 16 kHz in place (the reference's pydub
    set_channels(1).set_frame_rate(16000)); linear resample, stdlib wave IO."""
    p = Path(path)
    with wave.open(str(p), "rb") as f:
        ch, sw, sr, n = (f.getnchannels(), f.getsampwidth(),
                         f.getframerate(), f.getnframes())
        raw = f.readframes(n)
    if sw != 2:
        raise ValueError(f"unsupported sample width {sw} in {path}")
    pcm = np.frombuffer(raw, dtype="<i2").reshape(-1, ch).astype(np.float32)
    mono = pcm.mean(axis=1)
    if sr != 16000:
        t_out = np.arange(int(round(len(mono) * 16000 / sr)),
                          dtype=np.float64) * (sr / 16000.0)
        mono = np.interp(t_out, np.arange(len(mono), dtype=np.float64), mono)
    out = Path(out_path) if out_path else p
    data = np.clip(mono, -32768, 32767).astype("<i2")
    with wave.open(str(out), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(data.tobytes())
    return str(out)


def _default_downloader(url: str, out_base: str) -> str:
    """bestaudio → wav via yt_dlp (reference ydl_opts,
    s2t_dataloader.py:38-50). Raises ImportError when yt_dlp is absent."""
    import yt_dlp  # gated: not installed in zero-egress environments

    opts = {
        "format": "bestaudio/best",
        "postprocessors": [{"key": "FFmpegExtractAudio",
                            "preferredcodec": "wav",
                            "preferredquality": "192"}],
        "outtmpl": out_base,
    }
    with yt_dlp.YoutubeDL(opts) as ydl:
        ydl.download([url])
    return out_base + ".wav"


def resolve_youtube_source(url: str, cache_dir: str = ".",
                           downloader: Optional[Callable[[str, str], str]]
                           = None) -> str:
    """URL → local mono-16k `<video_id>.wav`, cached (reference caches on
    `Path(name).exists()`, s2t_dataloader.py:37)."""
    vid = get_video_id(url)
    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    wav = cache / f"{vid}.wav"
    if wav.exists():
        return str(wav)
    dl = downloader or _default_downloader
    try:
        got = dl(url, str(cache / vid))
    except ImportError as e:
        raise RuntimeError(
            "youtube source requires yt_dlp, which is not available in this "
            "environment (no network egress); pre-download the audio to "
            f"{wav} instead") from e
    return to_mono_16k(got, str(wav))
