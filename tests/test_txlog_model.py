"""Model-based property test for the transaction log: a random
sequence of append / remove / compact operations must leave every
HISTORICAL version's row count equal to an in-memory model's replay —
the snapshot-resolution logic is exercised over arbitrary op
interleavings, not just the handwritten scenarios in test_txlog.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dmi_ingestor_spark.ingest.txlog import TxLog

# op codes: ("append", n_rows) | ("remove", pick) | ("compact",)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(min_value=1, max_value=7)),
        st.tuples(st.just("remove"), st.integers(min_value=0, max_value=10)),
        st.tuples(st.just("compact"), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_random_op_sequences_match_model(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("txmodel")
    tx = TxLog(spark, str(root / "tbl"))
    # model: history[v] = {unit: n_rows} live at version v
    live: dict[str, int] = {}
    history: list[dict[str, int]] = []
    n_appended = 0

    for op, arg in ops:
        if op == "append":
            name = f"u{n_appended}"
            n_appended += 1
            tx.append(spark.range(arg).toDF("id"), name)
            live[f"data/{name}"] = arg
        elif op == "remove":
            if not live:
                continue
            unit = sorted(live)[arg % len(live)]
            tx.remove_units([unit])
            del live[unit]
        else:  # compact
            if not live:
                continue
            name = f"c{n_appended}"
            n_appended += 1
            tx.compact(name)
            live = {f"data/{name}": sum(live.values())}
        history.append(dict(live))

    # every historical version must replay to the model's row count
    for v, snapshot_model in enumerate(history):
        expected = sum(snapshot_model.values())
        snap = tx.snapshot(version=v)
        assert sorted(snap.add_units) == sorted(snapshot_model), (
            v,
            snap.add_units,
            snapshot_model,
        )
        if expected:
            assert tx.read(version=v).count() == expected
