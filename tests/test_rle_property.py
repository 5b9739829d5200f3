"""Property test for the RLE UDTF's Python core (no Spark needed):
encode/decode round-trips and structural invariants over random token
streams — the same class Spark executes via LATERAL."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from dmi_ingestor_spark.queries.reshape import _RunLengthUDTF

tokens = st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=200)


@given(tokens)
def test_rle_roundtrip(toks):
    runs = list(_RunLengthUDTF().eval(list(toks)))
    # decode reproduces the input exactly
    decoded = [tok for tok, n, _ in runs for _ in range(n)]
    assert decoded == list(toks)
    # run indices are 0..k-1 in order; adjacent runs differ
    assert [r[2] for r in runs] == list(range(len(runs)))
    for (t1, _, _), (t2, _, _) in zip(runs, runs[1:]):
        assert t1 != t2
    assert all(n >= 1 for _, n, _ in runs)


def test_rle_none_and_empty():
    assert list(_RunLengthUDTF().eval(None) or []) == []
    assert list(_RunLengthUDTF().eval([])) == []
