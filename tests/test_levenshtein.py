"""Device Levenshtein ops vs a line-faithful python port of the reference C++.

Reference: fairseq/fairseq/clib/libnat/edit_dist.cpp:23-113 and its consumers
fairseq/fairseq/models/nat/levenshtein_utils.py:36-140.
"""

import numpy as np

import jax.numpy as jnp

from streamspeech_tpu.ops.levenshtein import (
    edit_ops,
    get_del_targets,
    get_ins_targets,
    levenshtein_distance,
)

PAD, UNK = 1, 3


def _dp_ref(x, y):
    """edit_distance2_with_dp (edit_dist.cpp:23-43), sub cost 2."""
    lx, ly = len(x), len(y)
    d = np.zeros((lx + 1, ly + 1), np.int64)
    d[:, 0] = np.arange(lx + 1)
    d[0, :] = np.arange(ly + 1)
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            d[i][j] = min(min(d[i - 1][j], d[i][j - 1]) + 1,
                          d[i - 1][j - 1] + 2 * (x[i - 1] != y[j - 1]))
    return d


def _backtrack_ref(d, x, y):
    """edit_distance2_backtracking (edit_dist.cpp:45-113) -> per-slot
    insertions + delete labels + target-insertion mask."""
    lx, ly = len(x), len(y)
    ins = [0] * (lx + 1)
    dels = [0] * lx
    ymask = [0] * ly
    i, j = lx, ly
    while not (i == 0 and j == 0):
        if j > 0 and d[i][j - 1] < d[i][j]:
            ins[i] += 1
            ymask[j - 1] = 1
            j -= 1
        elif i > 0 and d[i - 1][j] < d[i][j]:
            dels[i - 1] = 1
            i -= 1
        else:
            i -= 1
            j -= 1
    return ins, dels, ymask


def _rand_batch(rng, B, N, M, vocab=6):
    src = np.full((B, N), PAD, np.int32)
    tgt = np.full((B, M), PAD, np.int32)
    sl = rng.randint(0, N + 1, B)
    tl = rng.randint(0, M + 1, B)
    for b in range(B):
        src[b, :sl[b]] = rng.randint(4, 4 + vocab, sl[b])
        tgt[b, :tl[b]] = rng.randint(4, 4 + vocab, tl[b])
    return src, tgt, sl, tl


def test_distance_matches_reference_dp():
    rng = np.random.RandomState(0)
    src, tgt, sl, tl = _rand_batch(rng, 12, 9, 11)
    got = np.asarray(levenshtein_distance(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(sl), jnp.asarray(tl)))
    for b in range(12):
        want = _dp_ref(src[b, :sl[b]].tolist(), tgt[b, :tl[b]].tolist())
        assert got[b] == want[sl[b], tl[b]], b


def test_edit_ops_match_reference_backtrace():
    rng = np.random.RandomState(1)
    src, tgt, sl, tl = _rand_batch(rng, 16, 8, 10)
    dels, ins, mask, dist = (np.asarray(a) for a in edit_ops(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(sl), jnp.asarray(tl)))
    for b in range(16):
        x = src[b, :sl[b]].tolist()
        y = tgt[b, :tl[b]].tolist()
        d = _dp_ref(x, y)
        w_ins, w_dels, w_mask = _backtrack_ref(d, x, y)
        assert dist[b] == d[len(x), len(y)]
        np.testing.assert_array_equal(ins[b, :sl[b] + 1], w_ins, err_msg=str(b))
        np.testing.assert_array_equal(dels[b, :sl[b]], w_dels, err_msg=str(b))
        np.testing.assert_array_equal(mask[b, :tl[b]].astype(int), w_mask,
                                      err_msg=str(b))


def test_del_targets_identity_and_full_delete():
    src = jnp.asarray([[5, 6, 7, PAD]], jnp.int32)
    # identical target -> no deletions
    d = get_del_targets(src, jnp.asarray([[5, 6, 7, PAD]], jnp.int32), PAD)
    np.testing.assert_array_equal(np.asarray(d), [[0, 0, 0, 0]])
    # target drops the middle token -> delete label on it
    d = get_del_targets(src, jnp.asarray([[5, 7, PAD, PAD]], jnp.int32), PAD)
    np.testing.assert_array_equal(np.asarray(d), [[0, 1, 0, 0]])


def test_ins_targets_simple_gap():
    # src = [a, c], tgt = [a, b, c]: one insertion in the gap after token 0
    src = jnp.asarray([[5, 7, PAD]], jnp.int32)
    tgt = jnp.asarray([[5, 6, 7]], jnp.int32)
    mask, masked_tgt, ins = get_ins_targets(src, tgt, PAD, UNK)
    np.testing.assert_array_equal(np.asarray(ins), [[1, 0]])
    np.testing.assert_array_equal(np.asarray(mask), [[False, True, False]])
    np.testing.assert_array_equal(np.asarray(masked_tgt), [[5, UNK, 7]])


def test_empty_source_all_insertions():
    src = jnp.asarray([[PAD, PAD]], jnp.int32)
    tgt = jnp.asarray([[5, 6, PAD]], jnp.int32)
    dels, ins, mask, dist = edit_ops(src, tgt, jnp.asarray([0]),
                                     jnp.asarray([2]))
    assert int(dist[0]) == 2
    np.testing.assert_array_equal(np.asarray(ins[0]), [2, 0, 0])
    np.testing.assert_array_equal(np.asarray(mask[0]), [True, True, False])
