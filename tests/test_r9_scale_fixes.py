"""Pins for the round-9 sf1 full-registry sweep catches.

Two defect classes the sf1 decade exposed get permanent fixtures here:

1. ``dedup_phonetic_block_join``'s candidate count was rewritten from a
   within-block pair self-join (quadratic in block size — ~5e9 rows
   materialized at sf1 just to be counted) to the closed form
   ``C(N,2) - sum_w C(c_w,2)`` over per-(key, word) counts. The test
   checks the closed form against an O(n^2) Python brute force on an
   adversarial block layout (skewed block, all-same-word block,
   singleton block), using the module's own consonant-class table so
   the reference key function cannot drift from the engine's.

2. ``text_cooccurrence_pmi``'s micro-ratio used float division: exact
   below 2^53, silently off-by-one above (sf1's n_tok ~ 3e7 pushed
   1e6*nxy*n_tok past it; 4/50 driver-hash rows diverged). The fix is
   integral ``div``. The test drives the exact expression shape with a
   numerator > 2^53 where the float path provably rounds wrong and
   asserts Spark matches Python's exact ``//``.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from dmi_ingestor_spark.queries.dedup import _PH_FROM, _PH_TO
from dmi_ingestor_spark.registry import load_all

REGISTRY = load_all()

_PH_MAP = str.maketrans(_PH_FROM, _PH_TO)


def _py_phonetic_key(w: str) -> str:
    """Python twin of the engine's Soundex-family key, built from the
    SAME _PH_FROM/_PH_TO table (imported, not copied)."""
    head = w[:1].upper()
    digits = "".join(c for c in w[1:].translate(_PH_MAP) if c in "123456")
    collapsed = []
    for c in digits:
        if not collapsed or collapsed[-1] != c:
            collapsed.append(c)
    return head + ("".join(collapsed) + "000")[:3]


@pytest.fixture(scope="module")
def phonetic_parts(spark, tmp_path_factory):
    """A part table engineered for block-shape edge cases:

    - 'robert'/'rupert'/'rubird' share key R163 (classic Soundex pair),
      40+30+2 rows -> a skewed block with three word groups;
    - 'aaa' alone forms an all-same-word block (0 candidate pairs from
      25 rows -- the closed form's subtraction term must cancel fully);
    - 'qzx' appears once (singleton block, 0 pairs);
    - 'lily'/'lola' share key L400 with 1 row each (pure cross pair).
    """
    words = (
        ["robert"] * 40 + ["rupert"] * 30 + ["rubird"] * 2
        + ["aaa"] * 25 + ["qzx"] + ["lily", "lola"]
    )
    rows = [
        (k, f"Brand#{k % 3}", f"{w} powder trim")
        for k, w in enumerate(words)
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_brand string, p_name string")
    d = tmp_path_factory.mktemp("phparts")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "part.parquet"))
    return str(d), words


def test_phonetic_closed_form_matches_bruteforce(spark, phonetic_parts):
    sf_dir, words = phonetic_parts
    # O(n^2) reference: different-word pairs within each phonetic block
    keyed = [(k, _py_phonetic_key(w), w) for k, w in enumerate(words)]
    expected: dict[str, int] = {}
    for (ka, pa, wa), (kb, pb, wb) in itertools.combinations(keyed, 2):
        if pa == pb and wa != wb:
            expected[pa] = expected.get(pa, 0) + 1
    expected_blocks = {p for _, p, _ in keyed}

    out = {
        r["pkey"]: r["n_candidate_pairs"]
        for r in REGISTRY["dedup_phonetic_block_join"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(out) == expected_blocks
    for pkey in expected_blocks:
        assert out[pkey] == expected.get(pkey, 0), pkey
    # shape sanity: the skewed R16 block is 40*30 + 40*2 + 30*2 = 1340
    assert out[_py_phonetic_key("robert")] == 1340
    assert out[_py_phonetic_key("aaa")] == 0


def test_pmi_integral_div_exact_beyond_2_53(spark):
    # The divergence lives in a narrow arithmetic regime (the sf1 one):
    # num = 1e6 * nxy * n_tok JUST above 2^53, where float(num)'s
    # representation error is a full half-ulp of the bottom of the
    # binade — then the float quotient lands a hair below the exact
    # integer and the long cast truncates it down by one (the observed
    # sf1 signature: spark = duckdb - 1 on 4/50 rows). Far above 2^53
    # the division's round-to-nearest usually repairs the offset (the
    # max representation error e/den tracks ulp(q)/2), so naive "huge
    # numerator" fixtures do NOT reproduce it — the magnitudes below
    # mirror sf1's n_tok ~ 3.5e7 and unigram-count products ~ 3.4e9.
    # Scan a deterministic range for the first counterexample so the
    # guard below cannot silently pick a value that rounds correctly.
    nx, ny = 58_057, 58_061
    den = nx * ny
    nxy = 299
    for n_tok in range(35_000_007, 35_000_507):
        num = 1_000_000 * nxy * n_tok
        if num > 2**53 and int(float(num - num % den) / den) != num // den:
            break
    else:
        pytest.fail("no counterexample in range — widen the scan")
    exact = num // den
    # guard: this fixture only pins the defect if the float path is
    # actually wrong on it (trailing bits of num are lost)
    assert int(float(num - num % den) / den) != exact
    row = spark.createDataFrame(
        [(nxy, n_tok, nx, ny)], "nxy long, n_tok long, nx long, ny long"
    ).select(
        F.expr(
            "(CAST(1000000 AS BIGINT) * nxy * n_tok) div (nx * ny)"
        ).alias("q")
    ).collect()[0]
    assert row["q"] == exact
