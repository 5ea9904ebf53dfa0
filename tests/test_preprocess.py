import wave

import numpy as np

from streamspeech_tpu.cli.preprocess import main as pp_main
from streamspeech_tpu.data.dataset import load_audio_or_features


def write_wav(path, samples):
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())


def test_preprocess_pipeline(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(3):
        write_wav(tmp_path / f"u{i}.wav", rng.uniform(-0.4, 0.4, 16000 + i * 800))
    (tmp_path / "wav_list.txt").write_text(
        "\n".join(str(tmp_path / f"u{i}.wav") for i in range(3)))

    out = tmp_path / "fbank"
    pp_main(["extract-fbank", "--wav-list", str(tmp_path / "wav_list.txt"),
             "--output", str(out), "--zip"])
    manifest = out / "manifest.tsv"
    lines = manifest.read_text().splitlines()
    assert len(lines) == 4
    # zip-offset refs load correctly
    _, ref, n = lines[1].split("\t")
    feats = load_audio_or_features(ref, out)
    assert feats.shape == (int(n), 80)

    pp_main(["gcmvn", "--manifest", str(manifest), "--output",
             str(tmp_path / "gcmvn.npz")])
    stats = np.load(tmp_path / "gcmvn.npz")
    assert stats["mean"].shape == (80,) and (stats["std"] > 0).all()

    # kmeans train + quantize on the fbank features themselves
    feat_list = tmp_path / "feats.txt"
    feat_list.write_text("\n".join(str(p) for p in sorted(out.glob("*.npy"))))
    pp_main(["kmeans-train", "--feature-list", str(feat_list), "--clusters",
             "8", "--iterations", "5", "--output", str(tmp_path / "km.npy")])
    km = np.load(tmp_path / "km.npy")
    assert km.shape == (8, 80)
    pp_main(["kmeans-quantize", "--feature-list", str(feat_list),
             "--centroids", str(tmp_path / "km.npy"), "--output",
             str(tmp_path / "units.txt"), "--dedup"])
    units = (tmp_path / "units.txt").read_text().splitlines()
    assert len(units) == 3
    assert all(0 <= int(u) < 8 for u in units[0].split())

    pp_main(["make-manifest", "--fbank-manifest", str(manifest), "--units",
             str(tmp_path / "units.txt"), "--output",
             str(tmp_path / "train.tsv")])
    rows = (tmp_path / "train.tsv").read_text().splitlines()
    assert rows[0].startswith("id\t") and len(rows) == 4


def test_spm_train_unigram(tmp_path):
    """SPM unigram training (`preprocess_scripts/` spm_train stage): trained
    vocab respects size, round-trips text, and the saved binary .model loads
    back identically through the protobuf parser."""
    from streamspeech_tpu.tokenizer import SentencePieceUnigram, train_unigram

    corpus = ["the cat sat on the mat", "the dog sat on the log",
              "a cat and a dog played", "the mat and the log moved",
              "dogs chase cats on mats"] * 4
    spm = train_unigram(corpus, vocab_size=48, max_piece_len=6)
    assert len(spm.pieces) <= 48
    assert spm.pieces[0][0] == "<unk>" and spm.pieces[0][2] == 2  # UNKNOWN
    assert spm.pieces[1][0] == "<s>" and spm.pieces[2][0] == "</s>"
    # full char coverage: every training sentence must round-trip exactly
    for s in corpus[:5]:
        assert spm.decode_pieces(spm.encode_as_pieces(s)) == s
    # encode() returns in-vocab ids
    ids = spm.encode("the cat sat")
    assert ids and all(0 <= i < len(spm.pieces) for i in ids)
    # multi-char merges were actually learned (not a char-level fallback)
    assert any(len(p) > 2 for p, _, t in spm.pieces if t == 1)

    # binary round-trip through the reference wire format
    spm.save(str(tmp_path / "spm.model"))
    spm2 = SentencePieceUnigram.load(str(tmp_path / "spm.model"))
    assert [p for p, _, _ in spm2.pieces] == [p for p, _, _ in spm.pieces]
    assert spm2.encode_as_pieces("the cat sat") == spm.encode_as_pieces("the cat sat")


def test_spm_train_rejects_tiny_vocab():
    """vocab_size smaller than the corpus character set must raise up front
    instead of looping forever (pruning keeps all single characters)."""
    import pytest

    from streamspeech_tpu.tokenizer import train_unigram

    corpus = ["abcdefghijklmnop qrstuvwxyz0123"] * 3
    with pytest.raises(ValueError, match="distinct characters"):
        train_unigram(corpus, vocab_size=10, max_piece_len=4)


def test_spm_train_cli(tmp_path):
    corpus = tmp_path / "text.txt"
    corpus.write_text("\n".join(["ab ab ba", "ba ab ab", "ab ba ba"] * 3))
    pp_main(["spm-train", "--input", str(corpus),
             "--model-prefix", str(tmp_path / "spm_unigram_16"),
             "--vocab-size", "16", "--max-piece-len", "4"])
    assert (tmp_path / "spm_unigram_16.model").exists()
    vocab = (tmp_path / "spm_unigram_16.txt").read_text().splitlines()
    assert vocab[0].split("\t")[0] == "<unk>"
    from streamspeech_tpu.tokenizer import SentencePieceUnigram
    spm = SentencePieceUnigram.load(str(tmp_path / "spm_unigram_16.model"))
    assert spm.decode_pieces(spm.encode_as_pieces("ab ba")) == "ab ba"


def test_kmeans_quantize_matches_released_km1000(tmp_path):
    """Released-artifact numerics: the ACTUAL mHuBERT km1000 layer-11
    quantizer shipped with the reference (`preprocess_scripts/
    mhubert.km1000.layer11.pt`, sklearn MiniBatchKMeans 1000x768) quantized
    through our JAX nearest-centroid path must reproduce sklearn's own
    `predict` on the same features (`quantize_with_kmeans.py` semantics)."""
    import os

    import pytest

    path = "/root/reference/preprocess_scripts/mhubert.km1000.layer11.pt"
    if not os.path.exists(path):
        pytest.skip("released km1000 quantizer not available")
    import warnings

    import joblib

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        km = joblib.load(path)
    assert km.cluster_centers_.shape == (1000, 768)

    rng = np.random.RandomState(0)
    # features in the centroid neighborhood so argmin is non-degenerate
    base = km.cluster_centers_[rng.randint(0, 1000, size=200)]
    feats = (base + rng.randn(200, 768) * base.std() * 0.5).astype(np.float32)
    np.save(tmp_path / "f0.npy", feats)
    (tmp_path / "feat_list.txt").write_text(str(tmp_path / "f0.npy"))

    pp_main(["kmeans-quantize", "--feature-list", str(tmp_path / "feat_list.txt"),
             "--centroids", path, "--output", str(tmp_path / "units.txt")])
    ours = np.asarray(
        (tmp_path / "units.txt").read_text().split(), np.int64)
    ref = km.predict(feats.astype(km.cluster_centers_.dtype))
    assert ours.shape == ref.shape
    # identical up to exact distance ties (none expected at fp32 scale)
    assert (ours == ref).mean() > 0.999, (ours != ref).sum()
