"""Microbench: batched vs per-row fuzzy candidate scoring (round-4 item 3).

Times the two codepaths the round-3 verdict flagged as interpreter loops —
candidate-pair Jaccard scoring (pipeline._cand_score_udf's kernel) — over a
synthetic fuzzy-heavy batch of N distinct (surface, alias) pairs:
  - loop:  per-row Python gram-set builds + set intersection (historical)
  - batch: textops.batch_jaccard_pairs (packed gram codes, sorted-array ops)

Prints one JSON line with both timings and the speedup. No Spark needed —
both kernels are pure Python/NumPy; this is exactly the per-Arrow-batch work.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from char_ner_spark.textops import (  # noqa: E402
    batch_jaccard_pairs,
    char_ngrams,
    jaccard,
)


def main(n: int = 100_000) -> None:
    rng = np.random.RandomState(20160731)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    words = [
        "".join(alphabet[rng.randint(len(alphabet) - 1)] for _ in range(4 + rng.randint(8)))
        for _ in range(5000)
    ]
    left, right = [], []
    for _ in range(n):
        a = f"{words[rng.randint(len(words))]} {words[rng.randint(len(words))]}"
        b = list(a)
        b[rng.randint(len(b))] = alphabet[rng.randint(len(alphabet) - 1)]  # typo
        left.append(a)
        right.append("".join(b))

    # warm the numpy arena at full size first (first-touch cost, see
    # the in-place-`%` note in textops.minhash_bands_batch)
    batch_jaccard_pairs(left, right, already_norm=True)

    t0 = time.perf_counter()
    got_batch = batch_jaccard_pairs(left, right, already_norm=True)
    t_batch = time.perf_counter() - t0

    t0 = time.perf_counter()
    got_loop = [
        jaccard(char_ngrams(a), char_ngrams(b)) for a, b in zip(left, right)
    ]
    t_loop = time.perf_counter() - t0

    assert all(x == y for x, y in zip(got_loop, got_batch)), "parity violated"
    print(json.dumps({
        "metric": "fuzzy_jaccard_batch_speedup",
        "n_pairs": n,
        "loop_sec": round(t_loop, 3),
        "batch_sec": round(t_batch, 3),
        "speedup": round(t_loop / t_batch, 2),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
