"""Dependency-free tfevents writer (fairseq --tensorboard-logdir analogue,
`fairseq/fairseq/logging/progress_bar.py:282-299`)."""

import glob
import struct

from streamspeech_tpu.utils.tensorboard import (
    TensorboardWriter,
    _masked_crc,
    crc32c,
    read_scalars,
)


def test_crc32c_known_vectors():
    # RFC 3720 / tensorflow crc32c test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = TensorboardWriter(str(tmp_path))
    w.add_scalar("train/loss", 3.25, step=1)
    w.add_scalar("train/loss", 2.5, step=2)
    w.add_scalars("valid", {"loss": 1.125, "skip_nan": float("nan")}, step=3)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    recs = read_scalars(files[0])
    assert (1, "train/loss", 3.25) in recs
    assert (2, "train/loss", 2.5) in recs
    assert (3, "valid/loss", 1.125) in recs
    assert not any(t == "valid/skip_nan" for _, t, _ in recs)


def test_tfrecord_framing(tmp_path):
    """First record is the brain.Event:2 file-version event with valid CRCs —
    what stock TensorBoard checks before reading anything else."""
    w = TensorboardWriter(str(tmp_path))
    w.close()
    data = open(w.path, "rb").read()
    (length,) = struct.unpack("<Q", data[:8])
    (hcrc,) = struct.unpack("<I", data[8:12])
    assert hcrc == _masked_crc(data[:8])
    payload = data[12:12 + length]
    (pcrc,) = struct.unpack("<I", data[12 + length:16 + length])
    assert pcrc == _masked_crc(payload)
    assert b"brain.Event:2" in payload


def test_train_cli_tensorboard(tmp_path):
    from streamspeech_tpu.cli.train import main as train_main

    train_main(["--synthetic", "--max-update", "2", "--log-interval", "1",
                "--save-dir", str(tmp_path / "ck"),
                "--tensorboard-logdir", str(tmp_path / "tb")])
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert files
    recs = read_scalars(files[0])
    assert any(tag == "train/loss" for _, tag, _ in recs), recs[:5]
