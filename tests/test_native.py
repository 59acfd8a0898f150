"""Native (C++) host kernels: build + parity with the python fallbacks."""
import numpy as np

from openvslam_tpu.utils import native


def test_native_builds():
    assert native.available(), "g++ build of native/map_core.cpp failed"


def test_min_median_hamming_parity(rng):
    d = rng.integers(0, 2**32, (17, 8), dtype=np.uint32)
    got = native.min_median_hamming(d)
    x = np.bitwise_count(d[:, None, :] ^ d[None, :, :]).sum(-1)
    # medians can tie; require the native pick's median equals the true min
    meds = np.median(x, axis=1)
    assert meds[got] == meds.min()


def test_covis_count_parity(rng):
    lm_ids = rng.integers(0, 50, 30)
    obs_lm = rng.integers(0, 50, 200)
    obs_kf = rng.integers(0, 10, 200)
    ks, vs = native.covis_count(lm_ids, obs_lm, obs_kf, exclude_kf=3)
    # python reference
    from collections import defaultdict
    by_lm = defaultdict(list)
    for l, k in zip(obs_lm, obs_kf):
        by_lm[l].append(k)
    ref = defaultdict(int)
    for l in lm_ids:
        for k in by_lm.get(l, ()):
            if k != 3:
                ref[k] += 1
    got = dict(zip(ks.tolist(), vs.tolist()))
    assert got == dict(ref)


def test_bow_shared_words_parity(rng):
    n_words = 64
    lists = [sorted(set(rng.integers(0, 20, rng.integers(0, 6)).tolist()))
             for _ in range(n_words)]
    offsets = np.zeros(n_words + 1, np.int64)
    for w, s in enumerate(lists):
        offsets[w + 1] = offsets[w] + len(s)
    inv = np.concatenate([np.array(s, np.int64) for s in lists if s] or
                         [np.zeros(0, np.int64)])
    words = rng.integers(-1, n_words, 40).astype(np.int32)
    ks, vs = native.bow_shared_words(words, offsets, inv)
    from collections import defaultdict
    ref = defaultdict(int)
    for w in np.unique(words[words >= 0]):
        for k in lists[w]:
            ref[k] += 1
    assert dict(zip(ks.tolist(), vs.tolist())) == dict(ref)
