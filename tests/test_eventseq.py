"""Event-sequence analytics (operators/eventseq.py): transition
counts/probabilities per actor, cross-actor isolation, deterministic
tie-breaks, n-gram chains, and the one-Exchange plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.eventseq import (
    event_ngrams,
    transition_counts,
)


@pytest.fixture()
def stream(spark):
    # user 1: a b a b ; user 2: a a c ; user 3: b (no transitions)
    rows = [
        (1, 1, "a", 10),
        (1, 2, "b", 11),
        (1, 3, "a", 12),
        (1, 4, "b", 13),
        (2, 1, "a", 14),
        (2, 2, "a", 15),
        (2, 3, "c", 16),
        (3, 1, "b", 17),
    ]
    return spark.createDataFrame(rows, "u long, t long, e string, id long")


class TestTransitions:
    def test_counts_and_probabilities(self, spark, stream):
        got = {
            (r["prev_state"], r["state"]): (r["cnt"], r["p"])
            for r in transition_counts(stream, "u", "t", "e").collect()
        }
        # a→b twice (user 1), a→a once, a→c once; b→a once
        assert got[("a", "b")][0] == 2
        assert got[("a", "a")][0] == 1
        assert got[("a", "c")][0] == 1
        assert got[("b", "a")][0] == 1
        # row-conditional: from 'a' there are 4 departures
        assert got[("a", "b")][1] == 2.0 / 4.0
        assert got[("b", "a")][1] == 1.0
        # user 3 has a single event: contributes nothing
        assert sum(c for c, _ in got.values()) == 5

    def test_no_cross_actor_transitions(self, spark, stream):
        got = {
            (r["prev_state"], r["state"])
            for r in transition_counts(stream, "u", "t", "e").collect()
        }
        # last event of user 1 is 'b', first of user 2 is 'a' — a
        # cross-actor b→a leak would add a second (b, a) count
        rows = transition_counts(stream, "u", "t", "e").collect()
        ba = [r for r in rows if (r["prev_state"], r["state"]) == ("b", "a")]
        assert ba[0]["cnt"] == 1
        assert ("c", "b") not in got  # user2 end → user3 start

    def test_tie_break_determinism(self, spark):
        # two events share t=1; the id tie-break fixes the order
        rows = [(1, 1, "x", 1), (1, 1, "y", 2), (1, 2, "z", 3)]
        df = spark.createDataFrame(rows, "u long, t long, e string, id long")
        got = {
            (r["prev_state"], r["state"])
            for r in transition_counts(
                df, "u", "t", "e", tie_cols=["id"]
            ).collect()
        }
        assert got == {("x", "y"), ("y", "z")}

    def test_single_exchange(self, stream):
        plan = (
            transition_counts(stream, "u", "t", "e")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one Exchange for the actor-key window over the facts; the
        # (prev, state) aggregate and the per-prev normalization
        # window shuffle only the |states|²-row matrix — never more
        assert plan.count("Exchange hashpartitioning") <= 3
        # the facts are shuffled exactly once (on the actor key)
        assert plan.count("Exchange hashpartitioning(u#") == 1


class TestNgrams:
    def test_trigram_counts(self, spark, stream):
        got = {
            r["gram"]: r["cnt"]
            for r in event_ngrams(stream, "u", "t", "e", n=3).collect()
        }
        assert got == {"a>b>a": 1, "b>a>b": 1, "a>a>c": 1}

    def test_bigram_equals_transitions(self, spark, stream):
        bi = {
            r["gram"]: r["cnt"]
            for r in event_ngrams(stream, "u", "t", "e", n=2).collect()
        }
        tr = {
            f'{r["prev_state"]}>{r["state"]}': r["cnt"]
            for r in transition_counts(stream, "u", "t", "e").collect()
        }
        assert bi == tr

    def test_n_validation(self, stream):
        with pytest.raises(ValueError):
            event_ngrams(stream, "u", "t", "e", n=1)


class TestFunnelSteps:
    def test_staged_minima_and_monotonicity(self, spark):
        from harness_aws_etl_pipeline_spark.operators.eventseq import (
            funnel_steps,
        )

        rows = [
            # u1 completes all three in order
            (1, 1, "signup"), (1, 2, "click"), (1, 3, "buy"),
            # u2 clicks BEFORE signup — click doesn't count, no buy
            (2, 1, "click"), (2, 2, "signup"),
            # u3 signs up only
            (3, 1, "signup"),
            # u4 never signs up
            (4, 1, "click"), (4, 2, "buy"),
        ]
        df = spark.createDataFrame(rows, "u long, t long, e string")
        got = {
            r["step"]: (r["name"], r["actors"])
            for r in funnel_steps(
                df, "u", "t", "e", ["signup", "click", "buy"]
            ).collect()
        }
        assert got == {
            1: ("signup", 3),
            2: ("click", 1),
            3: ("buy", 1),
        }

    def test_same_timestamp_counts_and_empty_guard(self, spark):
        from harness_aws_etl_pipeline_spark.operators.eventseq import (
            funnel_steps,
        )

        # at-or-after: a click AT the signup instant counts
        df = spark.createDataFrame(
            [(1, 5, "signup"), (1, 5, "click")], "u long, t long, e string"
        )
        got = {
            r["step"]: r["actors"]
            for r in funnel_steps(df, "u", "t", "e", ["signup", "click"]).collect()
        }
        assert got == {1: 1, 2: 1}
        with pytest.raises(ValueError):
            funnel_steps(df, "u", "t", "e", [])


class TestSessionize:
    def test_gap_splits_and_ties(self, spark):
        import datetime

        from harness_aws_etl_pipeline_spark.operators.eventseq import (
            sessionize,
        )

        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

        def at(s):
            return t0 + datetime.timedelta(seconds=s)

        rows = [
            (1, at(0), 1), (1, at(100), 2),          # session 1
            (1, at(100 + 1801), 3),                  # gap > 1800 → 2
            (1, at(100 + 1801 + 1800), 4),           # gap == 1800 → same
            (2, at(0), 5),                           # own actor → 1
        ]
        df = spark.createDataFrame(rows, "u long, ts timestamp, id long")
        got = {
            r["id"]: r["session_id"]
            for r in sessionize(df, "u", "ts", 1800, tie_cols=["id"]).collect()
        }
        assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}

    def test_guard(self, spark):
        from harness_aws_etl_pipeline_spark.operators.eventseq import (
            sessionize,
        )

        df = spark.createDataFrame([(1,)], "u long")
        with pytest.raises(ValueError):
            sessionize(df, "u", "u", 0)
