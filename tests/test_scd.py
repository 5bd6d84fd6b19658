"""SCD tests on the reference's `customers` fixture (FIXTURES.md §2;
ref tests/tables/test_Dimension.py:1023-1052)."""

import datetime

import pytest

from pygrametl_spark.operators.scd import (
    SlowlyChangingDimension,
    TypeOneSlowlyChangingDimension,
    scd2_from_history,
)
from tests.conftest import assert_df_set_equal

D = datetime.datetime


@pytest.fixture()
def scd(spark):
    # Ann has a closed version (Aalborg) and a current one (Copenhagen).
    df = spark.createDataFrame(
        [
            (1, "Ann", 20, "Aalborg", D(2020, 1, 1), D(2021, 6, 1), 1),
            (2, "Ann", 20, "Copenhagen", D(2021, 6, 1), None, 2),
            (3, "Bob", 31, "Odense", D(2020, 5, 1), None, 1),
        ],
        "id long, name string, age int, city string, fromdate timestamp, todate timestamp, version long",
    )
    return SlowlyChangingDimension(
        "customers", "id", ["name", "age", "city", "fromdate", "todate", "version"],
        ["name"], versionatt="version", fromatt="fromdate", toatt="todate",
        srcdateatt="changedate", type1atts=["age"], df=df,
    )


def test_lookup_returns_newest_version(spark, scd):
    batch = spark.createDataFrame([("Ann",)], ["name"])
    assert scd.lookup(batch).first()["id"] == 2


def test_scdensure_new_member(spark, scd):
    batch = spark.createDataFrame(
        [("Cat", 25, "Aarhus", D(2022, 1, 1))], ["name", "age", "city", "changedate"]
    )
    scd.scdensure(batch)
    row = scd.df.filter("name = 'Cat'").first()
    assert row["version"] == 1 and row["todate"] is None
    assert row["fromdate"] == D(2022, 1, 1)
    assert row["id"] == 4  # max+1


def test_scdensure_changed_member_versions(spark, scd):
    batch = spark.createDataFrame(
        [("Bob", 31, "Esbjerg", D(2022, 3, 1))], ["name", "age", "city", "changedate"]
    )
    scd.scdensure(batch)
    rows = {r["version"]: r for r in scd.df.filter("name = 'Bob'").collect()}
    assert len(rows) == 2
    assert rows[1]["todate"] == D(2022, 3, 1)  # closed
    assert rows[2]["city"] == "Esbjerg" and rows[2]["todate"] is None
    assert rows[2]["id"] == 4


def test_scdensure_unchanged_member_noop(spark, scd):
    batch = spark.createDataFrame(
        [("Bob", 31, "Odense", D(2022, 3, 1))], ["name", "age", "city", "changedate"]
    )
    scd.scdensure(batch)
    assert scd.df.filter("name = 'Bob'").count() == 1


def test_scdensure_type1_att_updates_all_versions(spark, scd):
    batch = spark.createDataFrame(
        [("Ann", 21, "Copenhagen", D(2022, 1, 1))], ["name", "age", "city", "changedate"]
    )
    scd.scdensure(batch)
    ann = scd.df.filter("name = 'Ann'")
    assert ann.count() == 2  # city unchanged -> no new version
    assert {r["age"] for r in ann.collect()} == {21}  # type1 applied everywhere


def test_scdensure_multiple_changes_in_one_batch(spark, scd):
    batch = spark.createDataFrame(
        [
            ("Bob", 31, "Esbjerg", D(2022, 3, 1)),
            ("Bob", 31, "Herning", D(2022, 5, 1)),
        ],
        ["name", "age", "city", "changedate"],
    )
    scd.scdensure(batch)
    rows = {r["version"]: r for r in scd.df.filter("name = 'Bob'").collect()}
    assert len(rows) == 3
    assert rows[2]["city"] == "Esbjerg" and rows[2]["todate"] == D(2022, 5, 1)
    assert rows[3]["city"] == "Herning" and rows[3]["todate"] is None


def test_closecurrent(spark, scd):
    members = spark.createDataFrame([("Ann",)], ["name"])
    scd.closecurrent(members, D(2023, 1, 1))
    rows = {r["version"]: r["todate"] for r in scd.df.filter("name = 'Ann'").collect()}
    assert rows[2] == D(2023, 1, 1)
    assert rows[1] == D(2021, 6, 1)  # closed version untouched
    assert scd.df.filter("name = 'Bob'").first()["todate"] is None


def test_lookupasof(spark, scd):
    probe = spark.createDataFrame(
        [("Ann", D(2020, 6, 1)), ("Ann", D(2022, 1, 1)), ("Bob", D(2019, 1, 1))],
        ["name", "when"],
    )
    out = scd.lookupasof(probe, "when")
    got = {(r["name"], r["when"]): r["id"] for r in out.collect()}
    assert got[("Ann", D(2020, 6, 1))] == 1   # old version
    assert got[("Ann", D(2022, 1, 1))] == 2   # current version
    assert got[("Bob", D(2019, 1, 1))] is None  # before first version


def test_lookupasof_bounds(spark, scd):
    # at the exact boundary the *new* version wins (fromincl=True, toincl=False)
    probe = spark.createDataFrame([("Ann", D(2021, 6, 1))], ["name", "when"])
    assert scd.lookupasof(probe, "when").first()["id"] == 2
    # toincl=True keeps the newest matching version (the reference scans to
    # the last version whose interval contains `when`)
    out = scd.lookupasof(probe, "when", toincl=True)
    assert out.first()["id"] == 2


def test_typeone_scdensure(spark):
    df = spark.createDataFrame(
        [(1, "Ann", 20, "X"), (2, "Bob", 30, "Y")], ["id", "name", "age", "grp"]
    )
    dim = TypeOneSlowlyChangingDimension(
        "t1", "id", ["name", "age", "grp"], ["name"], type1atts=["age"], df=df
    )
    batch = spark.createDataFrame([("Ann", 21), ("Cat", 40)], ["name", "age"])
    dim.scdensure(batch)
    assert_df_set_equal(
        dim.df, [(1, "Ann", 21, "X"), (2, "Bob", 30, "Y"), (3, "Cat", 40, None)]
    )


def test_scd2_from_history(spark):
    ev = spark.createDataFrame(
        [
            (1, "u1", "a", D(2024, 1, 1)),
            (2, "u1", "a", D(2024, 1, 2)),  # duplicate state -> suppressed
            (3, "u1", "b", D(2024, 1, 3)),
            (4, "u2", "a", D(2024, 1, 1)),
        ],
        ["event_id", "user", "state", "ts"],
    )
    dim = scd2_from_history(ev, ["user"], ["state"], "ts", tiebreak=["event_id"])
    rows = sorted([tuple(r) for r in dim.collect()])
    assert rows == [
        ("u1", "a", 1, D(2024, 1, 1), D(2024, 1, 3), 1),
        ("u1", "b", 2, D(2024, 1, 3), None, 2),
        ("u2", "a", 1, D(2024, 1, 1), None, 3),
    ]


# -- property-based: batch SCD2 == sequential per-row replay ---------------

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st


def _scd2_reference(events):
    """Sequential replay of the reference's scdensure semantics
    (tables.py:1274-1421): per member in event order, a change opens a
    new version (version+1, fromdate=ts) and closes the predecessor
    (todate=ts); same-state events are suppressed."""
    out = {}
    for eid, user, state, ts in sorted(events, key=lambda e: (e[1], e[3], e[0])):
        versions = out.setdefault(user, [])
        if versions and versions[-1][0] == state:
            continue
        if versions:
            versions[-1] = (versions[-1][0], versions[-1][1], ts)
        versions.append((state, ts, None))
    return {
        (u, s, i + 1, f, t)
        for u, vs in out.items()
        for i, (s, f, t) in enumerate(vs)
    }


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_scd2_from_history_matches_sequential_replay(spark, raw):
    import datetime
    events = [
        (i, u, s, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h))
        for i, (u, s, h) in enumerate(raw)
    ]
    # drop same-member same-ts collisions: the reference's per-row loop
    # orders them by arrival, which a relation cannot observe — the
    # engine requires a total (ts, tiebreak) order per member instead
    seen, uniq = set(), []
    for e in events:
        k = (e[1], e[3])
        if k not in seen:
            seen.add(k)
            uniq.append(e)
    ev = spark.createDataFrame(uniq, ["event_id", "user", "state", "ts"])
    dim = scd2_from_history(ev, ["user"], ["state"], "ts", tiebreak=["event_id"])
    got = {
        (r["user"], r["state"], r["version"], r["fromdate"], r["todate"])
        for r in dim.collect()
    }
    assert got == _scd2_reference(uniq)



def test_version_on_datechange_reference_semantics(spark):
    from pyspark.sql import functions as F

    # ref tables.py:1340-1365: with srcdateatt, a new date ALONE creates a
    # new version; exact (attrs, ts) repeats are suppressed.
    from pygrametl_spark.operators.scd import scd2_from_history

    ev = spark.createDataFrame(
        [
            (1, 10, "a", "2024-01-01 00:00:00"),
            (2, 10, "a", "2024-01-02 00:00:00"),  # same attrs, new date
            (3, 10, "a", "2024-01-02 00:00:00"),  # exact repeat -> suppressed
            (4, 10, "b", "2024-01-03 00:00:00"),  # attr change
        ],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    plain = scd2_from_history(ev, ["user_id"], ["event_type"], "ts", tiebreak=["event_id"])
    assert plain.count() == 2  # change-only: a, b

    dated = scd2_from_history(
        ev, ["user_id"], ["event_type"], "ts",
        tiebreak=["event_id"], version_on_datechange=True,
    )
    rows = sorted(dated.collect(), key=lambda r: r.version)
    assert [r.event_type for r in rows] == ["a", "a", "b"]
    assert [r.version for r in rows] == [1, 2, 3]


def test_scdensure_versionondatechange_merge(spark):
    from pyspark.sql import functions as F

    from pygrametl_spark.operators.scd import SlowlyChangingDimension

    empty = spark.createDataFrame(
        [], "id long, user_id long, event_type string, version long, "
            "fromdate timestamp, todate timestamp"
    )
    scd = SlowlyChangingDimension(
        "t", "id", ["user_id", "event_type", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate", toatt="todate",
        srcdateatt="ts", versionondatechange=True, df=empty,
    )
    batch = spark.createDataFrame(
        [(10, "a", "2024-01-01 00:00:00"), (10, "a", "2024-01-02 00:00:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    scd.scdensure(batch)
    assert scd.df.count() == 2  # same attrs, two dates -> two versions
    # Re-merging the same batch is NOT idempotent in this mode — exactly
    # like the reference: each incoming row is compared against the
    # NEWEST version's fromatt (ref tables.py:1340-1365), so a date that
    # differs from the newest one (even an older date) spawns a version.
    scd.scdensure(batch)
    assert scd.df.count() == 4


# ---------------------------------------------------------------------------
# Property test for the datechange mode (change-only mode is covered by
# test_scd2_from_history_matches_sequential_replay above): version
# boundaries must match a pure-Python sequential replay of the
# reference's srcdateatt rules (ref tables.py:1340-1365), where a
# differing date ALONE opens a version.
# ---------------------------------------------------------------------------

def _replay_datechange(events):
    """Per member in (ts, event_id) order: new version when the type OR
    the date differs from the newest version's; exact repeats suppressed."""
    versions = {}
    for user, etype, ts in events:
        cur = versions.setdefault(user, [])
        if not cur or cur[-1] != (etype, ts):
            cur.append((etype, ts))
    return sorted(
        (u, e, ver, ts)
        for u, vs in versions.items()
        for ver, (e, ts) in enumerate(vs, start=1)
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user_id
            st.sampled_from(["a", "b"]),             # event_type
            st.integers(min_value=0, max_value=4),   # day offset (dup-prone)
        ),
        min_size=1,
        max_size=12,
    )
)
def test_scd2_datechange_matches_sequential_replay(spark, raw):
    from pyspark.sql import functions as F

    rows = [
        (i, user, etype, f"2024-01-0{day + 1} 00:00:00")
        for i, (user, etype, day) in enumerate(raw)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dim = scd2_from_history(
        ev, ["user_id"], ["event_type"], "ts",
        tiebreak=["event_id"], version_on_datechange=True,
    )
    got = sorted(
        (r.user_id, r.event_type, r.version, r.fromdate.strftime("%Y-%m-%d %H:%M:%S"))
        for r in dim.collect()
    )
    # stable sort on ts == the engine's (ts, event_id) ordering, since
    # event_id is the input position
    ordered = sorted(
        ((u, e, f"2024-01-0{d + 1} 00:00:00") for (u, e, d) in raw),
        key=lambda t: t[2],
    )
    assert got == _replay_datechange(ordered)


def test_scdensure_idempotent_replay(spark):
    """idempotent=True makes exact (and partial) batch replay a no-op —
    the at-least-once foreachBatch contract — while plain re-apply of a
    multi-change batch re-appends history (the documented hazard)."""
    import datetime

    from pygrametl_spark.operators.scd import SlowlyChangingDimension

    def ts(d):
        return datetime.datetime(2024, 1, d)

    empty = spark.createDataFrame(
        [], "id long, user_id long, state string, version long, "
            "fromdate timestamp, todate timestamp",
    )
    scd = SlowlyChangingDimension(
        "t", "id", ["user_id", "state", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate",
        toatt="todate", srcdateatt="ts", df=empty,
    )
    batch1 = spark.createDataFrame(
        [(1, "A", ts(1)), (1, "B", ts(2)), (1, "A", ts(3)), (2, "X", ts(1))],
        "user_id long, state string, ts timestamp",
    )
    scd.scdensure(batch1)
    state1 = sorted(tuple(r) for r in scd.df.collect())
    assert len(state1) == 4  # A,B,A for user 1 + X for user 2

    # exact replay: no-op
    scd.scdensure(batch1, idempotent=True)
    assert sorted(tuple(r) for r in scd.df.collect()) == state1

    # at-least-once overlap: old rows filtered, the new change applies
    batch2 = spark.createDataFrame(
        [(1, "A", ts(3)), (1, "C", ts(4)), (2, "X", ts(1))],
        "user_id long, state string, ts timestamp",
    )
    scd.scdensure(batch2, idempotent=True)
    rows = {(r["user_id"], r["state"], r["version"]) for r in scd.df.collect()}
    assert (1, "C", 4) in rows and len(rows) == 5

    # replaying the overlap batch again: still a no-op
    state2 = sorted(tuple(r) for r in scd.df.collect())
    scd.scdensure(batch2, idempotent=True)
    assert sorted(tuple(r) for r in scd.df.collect()) == state2

    # the hazard idempotent= prevents: plain re-apply re-appends
    scd.scdensure(batch1)
    assert scd.df.count() > 5

    # guard: no event-date identity -> refuse
    scd2 = SlowlyChangingDimension(
        "t2", "id", ["user_id", "state", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate",
        toatt="todate", df=empty,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="idempotent"):
        scd2.scdensure(batch1.drop("ts"), idempotent=True)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),            # member
            st.sampled_from("ABC"),       # tracked value
        ),
        min_size=1, max_size=14,
    ),
    st.data(),
)
def test_scdensure_idempotent_property(spark, events, data):
    """Property: for any time-ordered event stream split into arbitrary
    batches, applying the batches with scdensure(idempotent=True) —
    with any batch REPLAYED immediately after itself — yields exactly
    the same (member, value, version, validity) state as the clean
    batched run, which itself equals the one-shot merge."""
    import datetime

    # strictly increasing per-stream timestamps (the time-ordered contract)
    rows = [
        (u, v, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i))
        for i, (u, v) in enumerate(events)
    ]
    cuts = sorted(data.draw(st.sets(
        st.integers(1, max(1, len(rows) - 1)), min_size=0, max_size=2,
    )))
    bounds = [0, *cuts, len(rows)]
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]
    replay_at = data.draw(st.integers(0, len(batches) - 1))

    empty = spark.createDataFrame(
        [], "id long, user_id long, state string, version long, "
            "fromdate timestamp, todate timestamp",
    )

    def run(batch_seq):
        scd = SlowlyChangingDimension(
            "p", "id", ["user_id", "state", "version", "fromdate", "todate"],
            ["user_id"], versionatt="version", fromatt="fromdate",
            toatt="todate", srcdateatt="ts", df=empty,
        )
        for b in batch_seq:
            scd.scdensure(
                spark.createDataFrame(b, "user_id long, state string, ts timestamp"),
                idempotent=True,
            )
        return sorted(
            (r["user_id"], r["state"], r["version"], r["fromdate"], r["todate"])
            for r in scd.df.collect()
        )

    clean = run(batches)
    with_replay = run(
        [b for i, bb in enumerate(batches) for b in ([bb, bb] if i == replay_at else [bb])]
    )
    oneshot = run([rows])
    assert with_replay == clean
    assert clean == oneshot
