"""Token-block indexing: native C++ == python fallback == reference semantics.

Reference: fairseq/fairseq/data/token_block_utils_fast.pyx:52-138 (break modes
none/complete/complete_doc/eos and block->dataset index triples).
"""

import numpy as np
import pytest

from streamspeech_tpu.data import token_blocks as tb


def _both(sizes, mode, block_size, sep=1):
    native = tb.slice_indices(sizes, mode, block_size, sep)
    py = tb._slice_indices_py(np.asarray(sizes, np.int64), mode, block_size,
                              sep)
    np.testing.assert_array_equal(native, py)
    return native


def test_none_mode_partitions_stream():
    sizes = np.array([3, 5, 2, 7], dtype=np.int64)
    blocks = _both(sizes, "none", 4)
    # 17 tokens -> ceil(17/4)=5 blocks; exact cover, last one short
    np.testing.assert_array_equal(
        blocks, [[0, 4], [4, 8], [8, 12], [12, 16], [16, 17]])


def test_eos_mode_one_block_per_sentence():
    sizes = np.array([3, 1, 4], dtype=np.int64)
    blocks = _both(sizes, "eos", 999)
    np.testing.assert_array_equal(blocks, [[0, 3], [3, 4], [4, 8]])


def test_complete_packs_whole_sentences():
    sizes = np.array([3, 3, 3, 10, 2], dtype=np.int64)
    blocks = _both(sizes, "complete", 7)
    # 3+3<=7 but +3 overflows -> [0,6]; 3 alone -> [6,9]; 10 oversize alone
    # (curr==0 admits anything) -> [9,19]; 2 -> [19,21]
    np.testing.assert_array_equal(
        blocks, [[0, 6], [6, 9], [9, 19], [19, 21]])


def test_complete_doc_breaks_at_separator_and_drops_singletons():
    # doc sep = sentence of exactly 1 token; sep tokens skipped, 1-token
    # blocks dropped (token_block_utils_fast.pyx:88 keeps only curr > 1)
    sizes = np.array([3, 1, 4, 2, 1, 1], dtype=np.int64)
    blocks = _both(sizes, "complete_doc", 10, sep=1)
    # doc1 = [3] -> block [0,3); sep at tok 3; doc2 = [4,2] -> [4,10); sep at
    # 10; trailing sep-only doc -> nothing
    np.testing.assert_array_equal(blocks, [[0, 3], [4, 10]])


@pytest.mark.parametrize("mode", [None, "none", "complete", "eos"])
def test_blocks_cover_stream_exactly(mode):
    rng = np.random.default_rng(0)
    sizes = rng.integers(1, 20, size=200).astype(np.int64)
    blocks = _both(sizes, mode, 32)
    assert blocks[0, 0] == 0
    assert blocks[-1, 1] == sizes.sum()
    assert np.all(blocks[1:, 0] == blocks[:-1, 1])  # contiguous
    assert np.all(blocks[:, 1] > blocks[:, 0])


def test_randomized_native_matches_python_all_modes():
    rng = np.random.default_rng(1)
    for trial in range(20):
        sizes = rng.integers(1, 15, size=int(rng.integers(1, 80)))
        for mode in [None, "complete", "complete_doc", "eos"]:
            _both(sizes.astype(np.int64), mode, int(rng.integers(4, 40)))


def test_block_to_dataset_index():
    sizes = np.array([3, 5, 2], dtype=np.int64)
    blocks = np.array([[0, 4], [4, 8], [8, 10]], dtype=np.int64)
    idx = tb.block_to_dataset_index(sizes, blocks)
    # block [0,4): starts sent0 off0, token 3 is in sent1 -> end sent1
    # block [4,8): starts sent1 off1, token 7 in sent1 -> end sent1
    # block [8,10): starts sent2 off0 -> end sent2
    np.testing.assert_array_equal(idx, [[0, 0, 1], [1, 1, 1], [2, 0, 2]])
    np.testing.assert_array_equal(
        idx, tb._block_to_dataset_index_py(sizes, blocks))


def test_block_to_dataset_index_randomized_roundtrip():
    rng = np.random.default_rng(2)
    for trial in range(10):
        sizes = rng.integers(1, 12, size=int(rng.integers(2, 60))).astype(
            np.int64)
        blocks = tb.slice_indices(sizes, "none", int(rng.integers(3, 25)))
        idx = tb.block_to_dataset_index(sizes, blocks)
        np.testing.assert_array_equal(
            idx, tb._block_to_dataset_index_py(sizes, blocks))
        # reconstruct each block from the triples and check the tokens line up
        corpus = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])
        starts = np.concatenate([[0], np.cumsum(sizes)])
        for (s, e), (ds, off, de) in zip(blocks, idx):
            assert corpus[s] == ds and starts[ds] + off == s
            assert corpus[e - 1] == de


def test_invalid_mode_raises():
    with pytest.raises(ValueError):
        tb.slice_indices(np.array([1], np.int64), "bogus", 4)
