"""Adversarial unit test for the round-8 sorted-score-grain rewrite of
``ml_propensity_caliper_matching`` (SURVEY.md §2.10 / queries/mllib.py).

The oracle-parity harness proves equivalence on the driver fixtures; this
test pins the TIE-BREAK semantics on a hand-built fixture engineered to
hit every branch the fixtures may miss by luck:

- equal-gap tie between the nearest control BELOW and ABOVE a treated
  score (must resolve by min uid across the two);
- several controls sharing one score (the per-score representative must
  be the min-uid one);
- a control at exactly the caliper distance (inclusive <=);
- a control one cent beyond the caliper (excluded -> unmatched treated);
- a treated unit with controls on one side only.

The expected summary comes from an independent brute-force matcher over
the same deterministic md5 treatment split.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from dmi_ingestor_spark.registry import load_all

CALIPER = 5_000


def _treated(uid: int) -> int:
    return int(hashlib.md5(f"psm-{uid}".encode()).hexdigest()[:8], 16) % 2


def _brute_force(units):
    """units: list of (uid, treated, score, outcome) -> summary tuple."""
    controls = [(u, s, o) for u, t, s, o in units if t == 0]
    treated = [(u, s, o) for u, t, s, o in units if t == 1]
    n_matched = total_gap = att = 0
    for _, ts, to in treated:
        cands = [
            (abs(ts - cs), cu, co)
            for cu, cs, co in controls
            if abs(ts - cs) <= CALIPER
        ]
        if not cands:
            continue
        gap, _cu, co = min(cands)
        n_matched += 1
        total_gap += gap
        att += to - co
    n_treated = len(treated)
    return (
        n_treated,
        n_matched,
        (1000 * n_matched) // n_treated,
        total_gap,
        att,
    )


def test_caliper_matching_tiebreaks(spark, tmp_path):
    # Partition uids by treatment so scenarios can be assigned exactly.
    t_uids = [u for u in range(1, 400) if _treated(u) == 1]
    c_uids = [u for u in range(1, 400) if _treated(u) == 0]
    assert len(t_uids) >= 7 and len(c_uids) >= 10

    units = []  # (uid, treated, score_cents, outcome_cents)
    # S1: equal-gap tie — controls at 10_000 and 14_000, treated at 12_000.
    units += [
        (c_uids[0], 0, 10_000, 111_00),
        (c_uids[1], 0, 14_000, 222_00),
        (t_uids[0], 1, 12_000, 999_00),
    ]
    # S2: duplicate control score — three controls at 50_000 (min uid must
    # represent), treated 1 cent above.
    units += [
        (c_uids[2], 0, 50_000, 10_00),
        (c_uids[3], 0, 50_000, 20_00),
        (c_uids[4], 0, 50_000, 30_00),
        (t_uids[1], 1, 50_001, 40_00),
    ]
    # S3: control at exactly the caliper (inclusive).
    units += [
        (c_uids[5], 0, 80_000, 5_00),
        (t_uids[2], 1, 80_000 + CALIPER, 6_00),
    ]
    # S4: nearest control one cent beyond the caliper -> unmatched.
    units += [
        (c_uids[6], 0, 120_000, 7_00),
        (t_uids[3], 1, 120_000 + CALIPER + 1, 8_00),
    ]
    # S5: controls on one side only (below).
    units += [
        (c_uids[7], 0, 200_000, 9_00),
        (t_uids[4], 1, 203_000, 12_00),
    ]
    # S6: treated exactly on a control score (gap 0).
    units += [(t_uids[5], 1, 50_000, 77_00)]
    # S7: equal-gap tie where the ABOVE control has the smaller uid —
    # exercises the tie resolving toward next, not prev.
    units += [
        (c_uids[9], 0, 300_000, 13_00),
        (c_uids[8], 0, 304_000, 14_00),
        (t_uids[6], 1, 302_000, 15_00),
    ]

    # Materialize as the customer/orders shape the query reads. acctbal
    # carries score/100; outcomes ride one order of totalprice/100 each.
    cust = pd.DataFrame(
        {
            "c_custkey": [u for u, _, _, _ in units],
            "c_acctbal": [s / 100.0 for _, _, s, _ in units],
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": [u for u, _, _, _ in units],
            "o_totalprice": [o / 100.0 for _, _, _, o in units],
        }
    )
    cust.to_parquet(tmp_path / "customer.parquet", index=False)
    orders.to_parquet(tmp_path / "orders.parquet", index=False)

    builder = load_all()["ml_propensity_caliper_matching"].builder
    row = builder(spark, str(tmp_path)).collect()[0]

    exp = _brute_force(units)
    got = (
        row.n_treated,
        row.n_matched,
        row.match_permille,
        row.total_gap,
        row.att_cents_sum,
    )
    assert got == exp, (got, exp)
    # The engineered scenarios themselves:
    # 6 matched of 7 treated (S4 unmatched), S3 contributes gap == CALIPER.
    assert row.n_treated == 7 and row.n_matched == 6
    assert row.total_gap == 2_000 + 1 + CALIPER + 3_000 + 0 + 2_000
