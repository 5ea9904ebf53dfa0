import numpy as np

from streamspeech_tpu.data.batching import batch_by_size, _batch_by_size_py, _load_native
from streamspeech_tpu.data.dataset import SpeechToSpeechDataset
from streamspeech_tpu.dictionary import Dictionary


def test_native_batcher_matches_python():
    rng = np.random.RandomState(0)
    n = 500
    num_tokens = rng.randint(10, 400, size=n).astype(np.int64)
    indices = np.argsort(num_tokens).astype(np.int64)
    for max_tokens, max_sent, mult in [(2000, 0, 8), (1000, 16, 8), (0, 4, 1)]:
        a = batch_by_size(indices, num_tokens, max_tokens, max_sent, mult)
        b = _batch_by_size_py(indices, num_tokens, max_tokens, max_sent, mult)
        if _load_native() is not None:
            assert [x.tolist() for x in a] == [x.tolist() for x in b]
        # coverage: every index exactly once
        flat = np.concatenate(a)
        assert sorted(flat.tolist()) == sorted(indices.tolist())
        # constraint: padded token budget respected
        for batch in a:
            if max_tokens and len(batch) > 1:
                assert len(batch) * num_tokens[batch].max() <= max_tokens * 2
            if max_sent:
                assert len(batch) <= max_sent


def make_manifest(tmp_path, n=6):
    rng = np.random.RandomState(0)
    lines = ["id\tsrc_audio\tsrc_n_frames\ttgt_audio\ttgt_n_frames"]
    for i in range(n):
        t = int(rng.randint(40, 120))
        feats = rng.randn(t, 80).astype(np.float32)
        np.save(tmp_path / f"utt{i}.npy", feats)
        units = " ".join(str(int(u)) for u in rng.randint(0, 100, size=10))
        lines.append(f"utt{i}\tutt{i}.npy\t{t}\t{units}\t10")
    (tmp_path / "train.tsv").write_text("\n".join(lines))
    mt_lines = ["id\ttgt_text"]
    for i in range(n):
        mt_lines.append(f"utt{i}\t▁a ▁b ▁c")
    (tmp_path / "train_mt.tsv").write_text("\n".join(mt_lines))


def test_dataset_collation(tmp_path):
    make_manifest(tmp_path)
    unit_dict = Dictionary.units(100)
    unit_dict.add_blank()
    text_dict = Dictionary()
    for s in ["▁a", "▁b", "▁c"]:
        text_dict.add_symbol(s)
    mt = SpeechToSpeechDataset.load_multitask_targets(
        str(tmp_path / "train_mt.tsv"), text_dict)
    assert mt["utt0"] == [4, 5, 6]
    ds = SpeechToSpeechDataset(
        str(tmp_path / "train.tsv"), unit_dict,
        multitask_targets={"target_unigram": mt, "source_unigram": mt,
                           "ctc_target_unigram": mt})
    assert len(ds) == 6
    batches = ds.batches(max_tokens=300, bsz_mult=2)
    assert sum(len(b) for b in batches) == 6
    batch = ds.collate(batches[0])
    b = len(batches[0])
    assert batch["src_tokens"].shape[0] == b
    assert batch["src_tokens"].shape[1] % 32 == 0
    assert batch["prev_output_tokens_mt"][0, 0] == 2  # eos-prefixed
    assert batch["target_units"].shape[1] == 11  # 10 units + eos
    assert (batch["target_unit_lengths"] == 11).all()


def test_dataset_stacked_units(tmp_path):
    """n_frames_per_step > 1, reference `_collate_target` semantics
    (speech_to_speech_dataset.py:154-176): the CTC/CE TARGET stays RAW
    (:156-162 — the unit decoders emit n raw-vocab frames per position, so a
    packed target would be out of logits range); only the AR teacher input
    `prev_output_tokens_unit` is packed (:164-171, pack_units :88 first-unit-
    most-significant base-V digits, collate_tokens move_eos_to_beginning=True
    so EOS leads), and unpack_units inverts the packing."""
    from streamspeech_tpu.models.transformer import unpack_units

    make_manifest(tmp_path)
    unit_dict = Dictionary.units(100)
    unit_dict.add_blank()
    raw_ds = SpeechToSpeechDataset(str(tmp_path / "train.tsv"), unit_dict)
    ds2 = SpeechToSpeechDataset(str(tmp_path / "train.tsv"), unit_dict,
                                n_frames_per_step=2)
    v = len(unit_dict) - 4
    # items keep RAW units regardless of n_frames_per_step
    for it_raw, it_p in zip(raw_ds.items, ds2.items):
        assert it_p.units == it_raw.units

    idx = np.arange(len(ds2))
    batch = ds2.collate(idx)
    raw_batch = raw_ds.collate(idx)
    # target side identical to the unpacked dataset (raw ids + eos)
    assert batch["target_units"].tolist() == raw_batch["target_units"].tolist()
    assert (batch["target_unit_lengths"]
            == raw_batch["target_unit_lengths"]).all()
    assert "prev_output_tokens_unit" not in raw_batch
    prev = batch["prev_output_tokens_unit"]
    assert (prev[:, 0] == 2).all()                    # EOS moved to beginning
    for i, it in enumerate(ds2.items):
        raw = np.asarray(it.units[:-1]) - 4           # 10 units, even count
        expect = raw.reshape(-1, 2)[:, 0] * v + raw.reshape(-1, 2)[:, 1] + 4
        assert prev[i, 1:1 + len(expect)].tolist() == expect.tolist()
        # decode side: unpack restores the original unit stream
        import jax.numpy as jnp
        un = unpack_units(jnp.asarray(prev[i, 1:1 + len(expect)]), 2, v)
        assert np.asarray(un).tolist() == (raw + 4).tolist()
    # odd tail: 3 raw units with n=2 -> tail padded by repeating the last
    (tmp_path / "odd.tsv").write_text(
        "id\tsrc_audio\tsrc_n_frames\ttgt_audio\ttgt_n_frames\n"
        "utt0\tutt0.npy\t40\t7 8 9\t3")
    ds3 = SpeechToSpeechDataset(str(tmp_path / "odd.tsv"), unit_dict,
                                n_frames_per_step=2)
    assert ds3.items[0].units == [7 + 4, 8 + 4, 9 + 4, 2]
    p = ds3.collate(np.arange(1))["prev_output_tokens_unit"]
    assert p[0].tolist() == [2, 7 * v + 8 + 4, 9 * v + 9 + 4]
