"""Tied-timestamp parity fuzz for the events-family gates.

The driver fixture has ZERO (user_id, ts) ties, so every window's
tie behavior — the class that produced the span_coverage cross-engine
flake — is untested by the driver gate. This corpus is built around
ties: bursts of events at the SAME instant per user, duplicate
(user, ts, type) rows, single-event users, sub-second gaps straddling
the session threshold, and value extremes. Every events-only gate
must still hash-match its DuckDB twin."""

import datetime
import random

import duckdb
import pytest

from test_entry_parity import assert_gate_on

EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]

EVENTS_GATES = [
    "events_hourly",
    "sessionize",
    "asof_attribution",
    "range_join_followups",
    "events_rollup",
    "user_moving_avg",
    "value_percentiles",
    "funnel_conversion",
    "cohort_retention",
    "top_event_types",
    "events_pivot",
    "events_cube",
    "cumulative_users",
    "user_sliding_avg",
    "events_daily_anomaly",
    # CUSUM: integer prefix windows are association-proof; tied
    # timestamps collapse into the same day bucket identically
    "events_cusum",
    # integer micro-credits (1e6 DIV n) — tied conv/touch timestamps
    # exercise the strict tus < cus exclusion identically
    "multitouch_attribution",
    # median of integer-ratio slopes via the exact percentile kernel;
    # single-day types exercise the zero-pair NULL-slope branch
    "daily_trend",
    # integer sketch over the portable hash + round6 estimate — the
    # randomized corpus exercises the not-full-sketch exact fallback
    # and the hash tie-break identically in both engines
    "kmv_distinct_users",
    "kmv_distinct_maintained",
    # bottom-k sample quantiles: the fuzz corpus's duplicate/tied rows
    # exercise the (hash, id) total order and the NULL-id exclusion
    "value_quantiles_sketch",
    "value_quantiles_maintained",
    "value_outliers",
    # epoch-anchored integer weekday + exact-integer-ratio shares —
    # aggregation-only, so tied timestamps are a pure no-op
    "events_seasonality",
    # all-integer span/moment aggregates, one division — tie-proof by
    # design; the fuzz span exercises the zero-filled-day contract
    "events_burstiness",
    # per-user type-count entropy (the doc_entropy integer-count
    # shape); NULL user/type rows pin the exclusion contract on both
    # the batch and maintained (shared-kernel) paths
    "user_event_entropy",
    "user_event_entropy_maintained",
    # the shared zipf kernel over per-user counts — tie blocks have
    # constant y so the regression sums are permutation-invariant
    "user_activity_zipf",
    # distinct-count aggregates over epoch-anchored integer day/week
    # keys — tied timestamps collapse into the same buckets identically
    "active_users_weekly",
    # lag-pair gates: the fuzz corpus's tied timestamps exercise the
    # (epoch_us, event_id) total-order contract in both windows
    "event_transitions",
    "event_transitions_maintained",
    # power iteration over the gated matrix: round-first layering means
    # tied-timestamp lag flakes would surface here too if they existed
    "transition_stationary",
    "event_interarrival",
    # the k-cut total-orders on (count, path); tied timestamps exercise
    # the session-boundary and within-session ordering contracts
    "session_paths",
    # integer basket counts over the same session boundaries + one
    # round6 division; NULL event types drop from the pair join by
    # construction in both engines
    "session_event_affinity",
    # quartile-threshold scoring over integers/round6 values only; the
    # fuzz corpus's NULL values exercise the NULL-monetary score class
    "user_rfm",
    # JSON extraction: the hostile props rotation (malformed / missing /
    # float / string / bool / overflow / NULL) pins the regex-gated
    # integer contract on every divergence class
    "props_field_stats",
    # gini over hot-user counts: the fuzz's hot user + single-event
    # users create the tie blocks the permutation-invariance relies on
    "key_skew_report",
    # aggregation-only integer moments (tie-proof BY DESIGN); the fuzz
    # corpus's short irregular day span exercises the missing-day gap
    # semantics and the zero-variance NULL branch
    "event_autocorrelation",
    # exact percentiles over integer counts (medians land on integers
    # or x.5 — exact dyadic); the fuzz bursts exercise the MAD-0 NULL
    # branch when a type's counts are all equal
    "events_daily_anomaly_robust",
    # all-integer Fano moments per user; the fuzz's hot user / burst
    # days exercise the span zero-fill and single-active-day cases
    "user_burstiness",
    # exact percentiles over integer counts / integer-micros-derived
    # durations; ties pin the shared (us, event_id) session order
    "session_stats",
    # entry-type argmin over the SAME total order; tied timestamps pin
    # the struct-MIN vs ROW_NUMBER rk=1 equivalence
    "session_bounce",
    # tied daily counts exercise the τ-b tie corrections (Tx/Ty) and
    # the integer-valued-double sqrt tail
    "daily_kendall_tau",
    # duplicate same-type events per user must collapse to one basket
    # row; NULL user/type rows drop
    "event_type_lift",
    # exact-median days drop; the sign lag runs over the per-type day
    # total order
    "daily_runs_test",
]


def _fuzz_events(seed: int = 42, n_users: int = 40):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0

    # hostile props rotation keyed off eid (NOT the rng stream, which
    # the engineered tie structure depends on): malformed JSON, NULL,
    # missing key, float / string / bool / null / overflow values —
    # props_field_stats must treat every class identically cross-engine
    HOSTILE_PROPS = {
        0: None,
        1: "not json",
        2: '{"x": 1}',
        3: '{"k": 87.5}',
        4: '{"k": "12"}',
        5: '{"k": "abc"}',
        6: '{"k": null}',
        7: '{"k": -5}',
        8: '{"k": 99999999999999999999}',
        9: '{"k": true}',
        # the three PROBED parser-leniency divergence classes — the
        # flat-object envelope must reject each on BOTH sides
        10: '{"k": 3}junk',  # Spark-lenient, DuckDB-invalid
        11: "{'k': 4}",  # Spark-lenient, DuckDB-invalid
        12: '{"k": 6,}',  # DuckDB-lenient, Spark-invalid
        # inside the envelope: comma within a string value
        13: '{"k": "x,y", "m": "z"}',
        # valid JSON but OUTSIDE the flat-scalar envelope (nested)
        14: '{"k": 1, "m": [1, 2]}',
        15: '{"k": 01}',  # leading zero: strict-number reject
        # trailing newline: Java's ^..$ would pass where RE2 rejects —
        # the \A..\z anchors must reject in BOTH engines
        16: '{"k": 7}\n',
    }

    def add(user, ts, etype=None, value=None):
        nonlocal eid
        eid += 1
        k = rng.randint(0, 99)  # always drawn — keeps the stream stable
        rows.append(
            (
                eid,
                ts,
                user,
                etype or rng.choice(EVENT_TYPES),
                value if value is not None else round(rng.uniform(0.01, 300), 2),
                HOSTILE_PROPS.get(eid % 17, '{"k": %d}' % k),
            )
        )

    for u in range(1, n_users + 1):
        t = base + datetime.timedelta(
            seconds=rng.randint(0, 20 * 86400), microseconds=rng.randint(0, 999999)
        )
        n_ev = rng.choice([1, 1, 2, rng.randint(3, 25)])
        for _ in range(n_ev):
            add(u, t)
            # burst of TIED instants (the untested class)
            for _ in range(rng.randint(0, 3)):
                add(u, t)
            # occasionally a tied DUPLICATE (same user, ts, type)
            if rng.random() < 0.3:
                add(u, t, etype=rng.choice(EVENT_TYPES))
            gap = rng.choice(
                [0, 1, 1_799_999_999, 1_800_000_000, 1_800_000_001,
                 rng.randint(1, 4 * 3600 * 1_000_000)]
            )
            t = t + datetime.timedelta(microseconds=gap)
        # guarantee funnel-relevant sequences for some users
        if u % 5 == 0:
            t2 = t + datetime.timedelta(seconds=1)
            for step in ("view", "click", "purchase"):
                add(u, t2, etype=step)
                if rng.random() < 0.5:  # tied duplicate of the step
                    add(u, t2, etype=step)
    rng.shuffle(rows)
    return rows


@pytest.fixture(scope="module")
def fuzz_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_events_sf")
    df = spark.createDataFrame(
        _fuzz_events(),
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def fuzz_events_ddb(fuzz_events_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{fuzz_events_dir}/events.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENTS_GATES)
def test_events_gate_matches_oracle_on_tied_corpus(
    spark, fuzz_events_dir, fuzz_events_ddb, name
):
    assert_gate_on(spark, fuzz_events_ddb, name, fuzz_events_dir)
