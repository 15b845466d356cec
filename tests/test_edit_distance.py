"""edit_distance_pairs (r11): PassJoin-style segment-blocked
Levenshtein join vs brute force — the blocking must be COMPLETE
(pigeonhole over D+1 segments, shift window +-D), the verification
exact, the output canonical (id_a < id_b)."""

from __future__ import annotations

import itertools
import random

import pytest

from dask_grblas_spark.functions.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        dist = _lev(ta, tb)
        if dist <= d:
            out[(min(ia, ib), max(ia, ib))] = dist
    return out


def _run(spark, rows, d, cap=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = edit_distance_pairs(df, max_dist=d,
                              max_bucket_size=cap).collect()
    return {(r["id_a"], r["id_b"]): r["dist"] for r in got}


def test_typo_families_and_exact_dups(spark):
    rows = [(1, "supplier#0001"), (2, "supplier#0002"),
            (3, "supplier#0102"), (4, "supplier#0001"),   # exact dup
            (5, "suppliar#00012"),                        # sub + insert
            (6, "completely different"), (7, "")]
    assert _run(spark, rows, 2) == _brute(rows, 2)


def test_short_strings_and_empties(spark):
    # lengths 0..4 straddle the D+1 segment minimum (D=2 -> min len 3)
    rows = [(i, s) for i, s in enumerate(
        ["", "a", "b", "ab", "ba", "abc", "abcd", "xy", "", "ac"])]
    assert _run(spark, rows, 2) == _brute(rows, 2)
    assert _run(spark, rows, 1) == _brute(rows, 1)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_randomized_vs_bruteforce(spark, d):
    rng = random.Random(100 + d)
    alpha = "abc"
    rows = [(i, "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(0, 9))))
            for i in range(60)]
    assert _run(spark, rows, d) == _brute(rows, d)


def test_bucket_cap_star_recall_tradeoff(spark):
    # a constant prefix makes one hot index bucket; the cap keeps the
    # smallest ids, so recall inside the bucket is reduced but every
    # SURVIVING pair must still be a true <=D pair
    rows = [(i, f"prefix-{i:03d}") for i in range(30)]
    full = _run(spark, rows, 2)
    capped = _run(spark, rows, 2, cap=5)
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert full[k] == v


# ---------------------------------------------------------------------------
# hamming_pairs (r11): banded Hamming join vs brute force
# ---------------------------------------------------------------------------

def test_hamming_pairs_vs_bruteforce(spark):
    from dask_grblas_spark.functions.dedup import hamming_pairs
    rng = random.Random(42)
    rows = [(i, rng.getrandbits(16)) for i in range(80)]
    # plant near-dups: ids 100+ flip <=2 bits of their base
    for i in range(0, 80, 7):
        h = rows[i][1] ^ (1 << rng.randrange(16))
        rows.append((100 + i, h))
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    for d in (1, 3):
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in hamming_pairs(df, bits=16, max_dist=d,
                                      max_bucket_size=None).collect()}
        want = {}
        for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
            dist = bin(ha ^ hb).count("1")
            if dist <= d:
                want[(min(ia, ib), max(ia, ib))] = dist
        assert got == want, d


def test_hamming_pairs_guards(spark):
    from dask_grblas_spark.functions.dedup import hamming_pairs
    df = spark.createDataFrame([(1, 5)], "media_id long, dhash long")
    with pytest.raises(ValueError):
        hamming_pairs(df, bits=64, max_dist=3)     # 64 > 63
    with pytest.raises(ValueError):
        hamming_pairs(df, bits=8, max_dist=9)      # bands > bits
