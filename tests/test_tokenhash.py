"""tokenhash construction units: edge cases the corpus oracles can't
reach (empty docs, docs shorter than the window), plus a naive-Python
cross-check of the vectorized paths."""

import hashlib

import numpy as np

from uniparser_ray.stages import tokenhash as th

P = int(th.P31)
B = int(th.HB)


def _tok(t):
    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % P


def _naive_shingles(text, k=3, base=B):
    ids = [_tok(w) for w in text.split()]
    if not ids:
        return []
    if len(ids) < k:
        acc = 0
        for v in ids:
            acc = (acc * base + v) % P
        return [acc]
    out = []
    for i in range(len(ids) - k + 1):
        acc = 0
        for v in ids[i:i + k]:
            acc = (acc * base + v) % P
        out.append(acc)
    return out


def test_shingle_hashes_match_naive():
    texts = ["the quick brown fox jumps", "a b", "x", "",
             "one two three four"]
    sh, counts = th.shingle_hashes(texts, k=3)
    assert counts.tolist() == [3, 1, 1, 0, 2]
    pos = 0
    for t, c in zip(texts, counts):
        assert sh[pos:pos + c].tolist() == _naive_shingles(t), t
        pos += c


def test_minhash_signature_naive_cross_check():
    texts = ["w1 w2 w3 w4 w5", ""]
    sh, counts = th.shingle_hashes(texts, k=3)
    sig = th.minhash_signatures(sh, counts, num_perm=8)
    a, b = th.affine_params(8, th.MINHASH_SEED)
    naive = [min((int(a[i]) * s + int(b[i])) % P
                 for s in _naive_shingles(texts[0]))
             for i in range(8)]
    assert sig[0].tolist() == naive
    assert sig[1].tolist() == [0] * 8  # empty doc -> all-zero signature


def test_simhash_and_rolling_edges():
    texts = ["", "solo", "two words",
             "a longer doc with enough tokens for an eight wide window"]
    sh, counts = th.shingle_hashes(texts, k=3)
    sims = th.simhash_values(sh, counts)
    rolls = th.rolling_fingerprints(texts, window=8)
    assert sims[0] == 0 and rolls[0] == 0  # empty doc
    # short docs still produce deterministic non-degenerate values
    assert rolls[1] == _tok("solo")
    assert rolls[2] == (_tok("two") * B + _tok("words")) % P
    # batching must not change per-doc values
    sh1, c1 = th.shingle_hashes([texts[3]], k=3)
    assert th.simhash_values(sh1, c1)[0] == sims[3]
    assert th.rolling_fingerprints([texts[3]])[0] == rolls[3]


def test_shingle_hashes62_distinct_bases():
    texts = ["a b c d"]
    s62, _ = th.shingle_hashes62(texts)
    s31, _ = th.shingle_hashes(texts)
    # high 31 bits carry the base-B hash, low 31 the base-B2 hash
    assert [int(v) >> 31 for v in s62] == [int(v) for v in s31]
    lo = [int(v) & ((1 << 31) - 1) for v in s62]
    assert lo != [int(v) for v in s31]  # second base is independent


def test_to_int64_round_trip():
    u = np.array([0, 1, (1 << 63) + 5, (1 << 64) - 1], np.uint64)
    i = th.to_int64(u)
    assert i.dtype == np.int64
    assert i.view(np.uint64).tolist() == u.tolist()
