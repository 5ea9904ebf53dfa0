import numpy as np

from streamspeech_tpu.ops.masks import (
    causal_allowed,
    chunk_allowed,
    lengths_to_mask,
    streaming_allowed_from_ctc,
    waitk_allowed,
)


def ref_chunk_mask(dim, chunk_size):
    """Direct transcription of the reference torch code (bool: True = masked)."""
    chunk_size = max(chunk_size, 1)
    idx = (np.arange(dim)[:, None] // chunk_size + 1) * chunk_size
    idx = np.clip(idx, 1, dim)
    tmp = np.tile(np.arange(dim)[None, :], (dim, 1))
    return idx <= tmp


def test_chunk_mask_matches_reference():
    for t, c in [(16, 4), (17, 4), (5, 8), (32, 1), (12, 999)]:
        allowed = np.asarray(chunk_allowed(t, c))
        masked = ref_chunk_mask(t, c)
        np.testing.assert_array_equal(allowed, ~masked)


def test_causal():
    a = np.asarray(causal_allowed(4))
    assert a[0, 0] and not a[0, 1]
    assert a[3].all()


def ref_waitk(tgt_len, src_len, src_wait, src_step, tgt_step):
    idx = (np.arange(tgt_len)[:, None] // tgt_step + 1) * src_step + src_wait
    idx = np.clip(idx, 1, src_len)
    tmp = np.tile(np.arange(src_len)[None, :], (tgt_len, 1))
    return tmp >= idx  # True = masked


def test_waitk_matches_reference():
    for tgt, src, k, n, ts in [(10, 20, 3, 1, 1), (7, 5, 0, 2, 2), (50, 8, 1, 1, 25)]:
        allowed = np.asarray(waitk_allowed(tgt, src, k, n, ts))
        np.testing.assert_array_equal(allowed, ~ref_waitk(tgt, src, k, n, ts))


def test_waitk_negative_step_allows_all():
    assert np.asarray(waitk_allowed(5, 7, 0, -1, -25)).all()


def ref_streaming_mask(asr, st, tgt_len, src_wait, src_step, tgt_step, chunk_size):
    """Transcription of StreamSpeechModel.build_streaming_mask (torch semantics)."""
    bsz, src_len = st.shape
    idx = (np.arange(tgt_len)[None, :, None] // tgt_step + 1) * src_step + src_wait
    idx = np.clip(idx, 1, src_len)
    tmp = np.cumsum(st, axis=-1)[:, None, :]
    mask = tmp >= idx
    tmp2 = mask.astype(np.int64) * np.round(asr)[:, None, :].astype(np.int64)
    tmp2[:, :, -1] = 1
    idx2 = np.clip(np.argmax(tmp2, axis=-1)[..., None], 1, src_len)
    if chunk_size is not None:
        idx2 = np.clip((idx2 // chunk_size + 1) * chunk_size, 1, src_len)
    tmp3 = np.arange(src_len)[None, None, :]
    return tmp3 >= idx2  # True = masked


def test_streaming_mask_matches_reference():
    rng = np.random.RandomState(0)
    for chunk in [None, 4]:
        asr = rng.rand(3, 24).astype(np.float32)
        st = rng.rand(3, 24).astype(np.float32)
        allowed = np.asarray(
            streaming_allowed_from_ctc(asr, st, tgt_len=9, src_wait=0, src_step=1,
                                       tgt_step=1, chunk_size=chunk)
        )
        ref = ref_streaming_mask(asr, st, 9, 0, 1, 1, chunk)
        np.testing.assert_array_equal(allowed, ~ref)


def test_lengths_to_mask():
    m = np.asarray(lengths_to_mask(np.array([2, 4]), 5))
    np.testing.assert_array_equal(m[0], [True, True, False, False, False])
    np.testing.assert_array_equal(m[1], [True, True, True, True, False])
