"""Checkpoint-recovery failure injection (VERDICT r2 item 9): kill a
streaming maintenance job mid-run — AFTER a batch's external effects are
committed but BEFORE the checkpoint records the batch — restart from the
same checkpoint, and assert the final state equals an uninterrupted run
/ the batch twin. This is the crash window that actually happens in
production (foreachBatch effects are at-least-once), so the merge logic
must be idempotent under exact batch replay.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _run_stream(spark, stage, schema, upsert, ckpt):
    files = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    q = (
        files.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_scd2_stream_recovery_equals_clean_run(spark, tmp_path):
    """SCD2 maintenance: batch 1's merge is persisted, then the job dies
    before the checkpoint commit, so the restart REPLAYS batch 1.

    ``scdensure`` itself is an at-most-once merge (re-stacking an
    already-merged multi-change batch re-appends its intermediate
    versions — the reference's sequential semantics have the same
    property), so the foreachBatch effect is made idempotent the
    standard Structured-Streaming way: state is VERSIONED BY BATCH ID.
    Batch N's snapshot is always computed from batch N-1's snapshot and
    written to its own versioned location, so an exact replay overwrites
    batch N's snapshot with identical content instead of double-merging
    (this is precisely the txn-version guard Delta/Iceberg gives a
    production deployment). Final (member, state, version, validity)
    must equal the uninterrupted run — which the oracle-gated
    scd2_streaming_maintain query pins equal to a one-shot batch replay."""
    from pygrametl_spark.operators.scd import SlowlyChangingDimension
    from pygrametl_spark.streaming.events import _stage_time_sliced

    full, stage, ts_is_long = _stage_time_sliced(spark, SF, 3, "scd_recov3")
    empty_schema = (
        "id long, user_id long, event_type string, version long, "
        "fromdate timestamp, todate timestamp"
    )

    def snapshot_ids(dim_path):
        if not os.path.isdir(dim_path):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(dim_path) if d.startswith("b")
        )

    def make_upsert(dim_path, fail_on_batch=None):
        state = {"tripped": False}

        def upsert(bdf, bid):
            sp = bdf.sparkSession
            prev = [i for i in snapshot_ids(dim_path) if i < bid]
            if prev:
                cur = sp.read.parquet(f"{dim_path}/b{max(prev)}")
            else:
                cur = sp.createDataFrame([], empty_schema)
            scd = SlowlyChangingDimension(
                f"user_scd_recov_{uuid.uuid4().hex[:6]}", "id",
                ["user_id", "event_type", "version", "fromdate", "todate"],
                ["user_id"], versionatt="version", fromatt="fromdate",
                toatt="todate", srcdateatt="ts", df=cur,
            )
            ts_col = (
                F.timestamp_micros(F.expr("ts div 1000"))
                if ts_is_long else F.col("ts")
            )
            scd.scdensure(bdf.select("user_id", "event_type", ts_col.alias("ts")))
            # replay-safe: overwrite THIS batch's own versioned snapshot
            scd.df.write.mode("overwrite").parquet(f"{dim_path}/b{bid}")
            if fail_on_batch == bid and not state["tripped"]:
                state["tripped"] = True
                raise RuntimeError("injected crash after external commit")

        return upsert

    def stable(dim_path):
        latest = max(snapshot_ids(dim_path))
        return {
            tuple(r) for r in spark.read.parquet(f"{dim_path}/b{latest}").select(
                "user_id", "event_type", "version",
                F.date_format("fromdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                F.date_format("todate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            ).collect()
        }

    # clean reference run
    clean_dim = str(tmp_path / "dim_clean")
    _run_stream(spark, stage, full.schema, make_upsert(clean_dim),
                str(tmp_path / "ckpt_clean"))

    # failure-injected run: crash on batch 1, restart from the checkpoint
    crash_dim = str(tmp_path / "dim_crash")
    ckpt = str(tmp_path / "ckpt_crash")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, stage, full.schema,
                    make_upsert(crash_dim, fail_on_batch=1), ckpt)
    assert snapshot_ids(crash_dim) == [0, 1]  # batch 1's effect DID land
    # restart: same checkpoint -> batch 1 replays, then batch 2 runs
    _run_stream(spark, stage, full.schema, make_upsert(crash_dim), ckpt)
    assert snapshot_ids(crash_dim) == [0, 1, 2]

    assert stable(crash_dim) == stable(clean_dim)
    assert len(stable(clean_dim)) > 0


def test_dedup_stream_recovery_equals_batch_twin(spark, tmp_path):
    """Exact-dedup ingest: the accepted-store append for batch 1 lands,
    then the job dies before the checkpoint commit. On restart the batch
    replays — the anti-join against the store drops every already-
    accepted fingerprint, so the store still equals the batch twin
    (global MIN(doc_id) per fingerprint)."""
    from pygrametl_spark.functions.text import fingerprint
    from pygrametl_spark.streaming.corpus import _stage_id_sliced

    full, stage = _stage_id_sliced(spark, SF, 3)
    store = str(tmp_path / "store")
    spark.createDataFrame([], "doc_id long, fp string").write.parquet(store)

    def make_accept(fail_on_batch=None):
        state = {"tripped": False}

        def accept(bdf, bid):
            batch = (
                fingerprint(bdf).groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
            )
            seen = bdf.sparkSession.read.parquet(store).select("fp")
            batch.join(seen, "fp", "left_anti").select("doc_id", "fp").write.mode(
                "append"
            ).parquet(store)
            if fail_on_batch == bid and not state["tripped"]:
                state["tripped"] = True
                raise RuntimeError("injected crash after store append")

        return accept

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, stage, full.schema, make_accept(fail_on_batch=1), ckpt)
    _run_stream(spark, stage, full.schema, make_accept(), ckpt)

    got = {
        (r["fp"], r["doc_id"])
        for r in spark.read.parquet(store).collect()
    }
    want = {
        (r["fp"], r["doc_id"])
        for r in fingerprint(full)
        .groupBy("fp").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert got == want and len(got) > 0


def test_scd2_stream_recovery_idempotent_single_store(spark, tmp_path):
    """The simpler deployment shape: ONE dimension location +
    scdensure(idempotent=True). The replayed batch's rows anti-join
    against the already-merged history, so recovery needs no
    batch-id-versioned snapshots at all."""
    from pygrametl_spark.operators.scd import SlowlyChangingDimension
    from pygrametl_spark.streaming.events import _stage_time_sliced

    full, stage, ts_is_long = _stage_time_sliced(spark, SF, 3, "scd_recov3")
    empty_schema = (
        "id long, user_id long, event_type string, version long, "
        "fromdate timestamp, todate timestamp"
    )

    def make_upsert(dim_path, fail_on_batch=None):
        state = {"tripped": False}

        def upsert(bdf, bid):
            sp = bdf.sparkSession
            if os.path.isdir(dim_path):
                cur = sp.read.parquet(dim_path)
            else:
                cur = sp.createDataFrame([], empty_schema)
            scd = SlowlyChangingDimension(
                f"scd_idem_{uuid.uuid4().hex[:6]}", "id",
                ["user_id", "event_type", "version", "fromdate", "todate"],
                ["user_id"], versionatt="version", fromatt="fromdate",
                toatt="todate", srcdateatt="ts", df=cur,
            )
            ts_col = (
                F.timestamp_micros(F.expr("ts div 1000"))
                if ts_is_long else F.col("ts")
            )
            scd.scdensure(
                bdf.select("user_id", "event_type", ts_col.alias("ts")),
                idempotent=True,
            )
            # materialize BEFORE overwriting the directory being read
            out = scd.df.localCheckpoint(eager=True)
            out.write.mode("overwrite").parquet(dim_path)
            if fail_on_batch == bid and not state["tripped"]:
                state["tripped"] = True
                raise RuntimeError("injected crash after external commit")

        return upsert

    def stable(dim_path):
        return {
            tuple(r) for r in spark.read.parquet(dim_path).select(
                "user_id", "event_type", "version",
                F.date_format("fromdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                F.date_format("todate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            ).collect()
        }

    clean_dim = str(tmp_path / "dim_clean_i")
    _run_stream(spark, stage, full.schema, make_upsert(clean_dim),
                str(tmp_path / "ckpt_clean_i"))

    crash_dim = str(tmp_path / "dim_crash_i")
    ckpt = str(tmp_path / "ckpt_crash_i")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, stage, full.schema,
                    make_upsert(crash_dim, fail_on_batch=1), ckpt)
    _run_stream(spark, stage, full.schema, make_upsert(crash_dim), ckpt)

    assert stable(crash_dim) == stable(clean_dim)
    assert len(stable(clean_dim)) > 0


def test_exactsubstr_stream_recovery_equals_batch_twin(spark, tmp_path):
    """ExactSubstr span-dedup ingest: batch 1's result AND span-store
    appends land, then the job dies before the checkpoint commit. This
    is the window where a naive replay is WRONG — the batch's own spans
    are now in the store, so an unversioned scrub would see every batch
    span as "already in the corpus" and remove first occurrences too.
    The store is versioned by batch id (replays exclude their own
    spans) and the result append anti-joins on doc_id, so the final
    corpus must still equal the batch twin row-for-row."""
    from pygrametl_spark.functions.dedup import exact_substring_dedup
    from pygrametl_spark.streaming.corpus import (
        _stage_id_sliced,
        exactsubstr_accept_fn,
    )

    full, stage = _stage_id_sliced(spark, SF, 3)
    span_store = str(tmp_path / "spans")
    result_store = str(tmp_path / "results")
    spark.createDataFrame([], "_key long, _bid long").write.parquet(span_store)
    spark.createDataFrame(
        [],
        "doc_id long, n_tokens long, n_dup_spans long, n_removed long, "
        "dup_bps long, kept_fp string",
    ).write.parquet(result_store)

    inner = exactsubstr_accept_fn(span_store, result_store, 5)

    def make_accept(fail_on_batch=None):
        state = {"tripped": False}

        def accept(bdf, bid):
            inner(bdf, bid)
            if fail_on_batch == bid and not state["tripped"]:
                state["tripped"] = True
                raise RuntimeError("injected crash after store appends")

        return accept

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, stage, full.schema, make_accept(fail_on_batch=1), ckpt)
    # batch 1's spans DID land before the crash — the poisoned-replay window
    assert spark.read.parquet(span_store).filter("_bid = 1").count() > 0
    _run_stream(spark, stage, full.schema, make_accept(), ckpt)

    got = {
        tuple(r)
        for r in spark.read.parquet(result_store)
        .dropDuplicates(["doc_id"]).collect()
    }
    want = {tuple(r) for r in exact_substring_dedup(full, k=5).collect()}
    assert got == want and len(got) > 0
    # and the result store itself has no duplicate/conflicting doc rows
    n = spark.read.parquet(result_store).count()
    assert n == len(want)


def test_minhash_stream_recovery_equals_batch_twin(spark, tmp_path):
    """Near-dup ingest: batch 1's band-store AND accepted-store appends
    land, then the job dies before the checkpoint commit. On replay the
    batch's own earlier band rows collide with its docs only at EQUAL id
    (excluded by the strict <), so the same ids drop again and the
    duplicate appends collapse under the final distinct — the store
    still equals the batch twin (drop every id_2 of the corpus-wide
    LSH pair relation)."""
    from pygrametl_spark.functions.dedup import minhash_lsh_pairs
    from pygrametl_spark.streaming.corpus import (
        _stage_id_sliced,
        minhash_accept_fn,
    )

    full, stage = _stage_id_sliced(spark, SF, 3)
    band_store = str(tmp_path / "bands")
    accepted_store = str(tmp_path / "accepted")
    spark.createDataFrame(
        [], "doc_id long, sig array<bigint>, bidx int, bhash string"
    ).write.parquet(band_store)
    spark.createDataFrame([], "doc_id long").write.parquet(accepted_store)

    inner = minhash_accept_fn(band_store, accepted_store, 0.5)

    def make_accept(fail_on_batch=None):
        state = {"tripped": False}

        def accept(bdf, bid):
            inner(bdf, bid)
            if fail_on_batch == bid and not state["tripped"]:
                state["tripped"] = True
                raise RuntimeError("injected crash after store appends")

        return accept

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, stage, full.schema, make_accept(fail_on_batch=1), ckpt)
    _run_stream(spark, stage, full.schema, make_accept(), ckpt)

    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(accepted_store).distinct().collect()
    )
    dropped = {
        r["id_2"] for r in minhash_lsh_pairs(full, threshold=0.5).collect()
    }
    want = sorted(
        r["doc_id"] for r in full.select("doc_id").collect()
        if r["doc_id"] not in dropped
    )
    assert got == want and len(got) > 0


def test_ivfpq_stream_recovery_exactly_once(spark, tmp_path):
    """Streaming ANN index maintenance (streaming/ann.py): batch 1's
    (cluster, _bid) partitions are committed, then the job dies before
    the checkpoint commit and the restart REPLAYS batch 1. Dynamic
    partition overwrite makes the replay rewrite exactly its own
    ``_bid=1`` partitions — so (a) no vector is duplicated in the
    streamed tier, and (b) probing the maintained index (ADC and the
    rerank tier) equals a one-shot rebuild over the full corpus with
    the SAME frozen quantizers."""
    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.functions.similarity import _load_books_meta
    from pygrametl_spark.streaming.ann import ivfpq_upsert_fn

    emb = load_catalog(spark, SF).embeddings
    mid = emb.select(F.percentile_approx("vec_id", 0.5, 10000).alias("m")).first()["m"]
    base = emb.filter(F.col("vec_id") <= mid)
    incoming = emb.filter(F.col("vec_id") > mid)

    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path, n_clusters=4, m=8, k=16, iters=2, store_raw=True)

    # stage the incoming half as 3 vec_id-ordered micro-batch files
    stage = str(tmp_path / "slices")
    bounds = incoming.select(
        F.percentile_approx("vec_id", [1 / 3, 2 / 3], 10000).alias("b")
    ).first()["b"]
    cuts = [None, *bounds, None]
    os.makedirs(stage)
    for i in range(3):
        sl = incoming
        if cuts[i] is not None:
            sl = sl.filter(F.col("vec_id") >= cuts[i])
        if cuts[i + 1] is not None:
            sl = sl.filter(F.col("vec_id") < cuts[i + 1])
        sl.coalesce(1).write.mode("overwrite").parquet(f"{stage}/part{i}")
    for i in range(3):
        for f in os.listdir(f"{stage}/part{i}"):
            os.utime(f"{stage}/part{i}/{f}", (1_700_000_000 + i, 1_700_000_000 + i))

    inner = ivfpq_upsert_fn(path)

    def make_upsert(fail_on_batch=None):
        state = {"tripped": False}

        def upsert(bdf, bid):
            inner(bdf, bid)  # external effect lands first
            if fail_on_batch == bid and not state["tripped"]:
                state["tripped"] = True
                raise RuntimeError("injected crash after partition commit")

        return upsert

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, stage, incoming.schema, make_upsert(fail_on_batch=1), ckpt)
    _run_stream(spark, stage, incoming.schema, make_upsert(), ckpt)

    # (a) exactly-once: every streamed vector appears exactly once
    streamed = spark.read.parquet(f"{path}/codes_stream")
    n_in = incoming.count()
    assert streamed.count() == n_in
    assert streamed.select("vec_id").distinct().count() == n_in
    raw_stream = spark.read.parquet(f"{path}/raw_stream")
    assert raw_stream.count() == n_in

    # (b) probe == one-shot rebuild with the same frozen quantizers
    books, _ = _load_books_meta(path)
    cent = spark.read.parquet(f"{path}/centroids")
    full = str(tmp_path / "full")
    sim.ivfpq_write_index(emb, full, centroids=cent, books=books, store_raw=True)
    queries = emb.filter("vec_id IN (1, 7, 23)")
    got = {tuple(r) for r in sim.ivfpq_topk(spark, path, queries, nprobe=2, k=5).collect()}
    want = {tuple(r) for r in sim.ivfpq_topk(spark, full, queries, nprobe=2, k=5).collect()}
    assert got == want and got
    got_rr = {tuple(r) for r in sim.ivfpq_topk(
        spark, path, queries, nprobe=4, k=5, rerank=20).collect()}
    want_rr = {tuple(r) for r in sim.ivfpq_topk(
        spark, full, queries, nprobe=4, k=5, rerank=20).collect()}
    assert got_rr == want_rr and got_rr
    # streamed vectors are actually retrievable through the maintained index
    streamed_ids = {r["vec_id"] for r in incoming.select("vec_id").collect()}
    hit_ids = {r[2] for r in got | got_rr}
    assert hit_ids & streamed_ids


def test_ivfpq_writer_lease_concurrent_and_sequential(spark, tmp_path):
    """The single-live-stream-writer contract is ENFORCED, not just
    documented (VERDICT r6 missing #2): two concurrent streams on one
    IVF-PQ index can resolve the SAME bid offset and then silently
    dynamic-overwrite each other's partitions — so the second writer
    must fail LOUDLY at its first batch. Sequential (quiesced) streams,
    same-namespace restarts, and takeover from a crashed holder (dead
    pid / stale mtime heartbeat) must all still work."""
    import json
    import os

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        _WRITER_LOCK, ivfpq_release_writer, ivfpq_upsert_fn,
    )

    emb = load_catalog(spark, SF).embeddings
    base = emb.filter("vec_id <= 300")
    batch = emb.filter("vec_id > 300 AND vec_id <= 320")
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path, n_clusters=4, m=4, k=8, iters=1)

    # stream A's first batch claims the lease
    a = ivfpq_upsert_fn(path, namespace="ckpt-A")
    a(batch, 0)
    assert os.path.isfile(os.path.join(path, _WRITER_LOCK))

    # a CONCURRENT second stream (distinct namespace) fails loudly at
    # its first batch and writes nothing
    b = ivfpq_upsert_fn(path, namespace="ckpt-B")
    with pytest.raises(RuntimeError, match="live stream writer"):
        b(batch, 0)
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0}
    # ...anonymous concurrent writers conflict too
    with pytest.raises(RuntimeError, match="live stream writer"):
        ivfpq_upsert_fn(path)(batch, 0)

    # same-namespace restart (fresh closure, same checkpoint lineage)
    # RECLAIMS its own lease and keeps writing
    a2 = ivfpq_upsert_fn(path, namespace="ckpt-A")
    a2(batch, 1)
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0, 1}

    # quiesce -> a sequential stream B is unaffected
    assert ivfpq_release_writer(path, namespace="ckpt-A")
    b2 = ivfpq_upsert_fn(path, namespace="ckpt-B")
    b2(batch, 0)  # offset resolves above A's bids: no overwrite
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0, 1, 2}
    assert ivfpq_release_writer(path, namespace="ckpt-B")

    # takeover from a crashed holder: dead pid on THIS host -> immediate
    # break (the pid probe only applies to same-host locks, r8)
    import socket

    host = socket.gethostname()
    lock = os.path.join(path, _WRITER_LOCK)
    with open(lock, "w") as fh:
        json.dump(
            {"namespace": "ghost", "pid": 2**22 + 12345, "host": host}, fh
        )
    c = ivfpq_upsert_fn(path, namespace="ckpt-C")
    c(batch, 0)
    assert ivfpq_release_writer(path, namespace="ckpt-C")

    # takeover from a stalled holder: live pid but mtime heartbeat
    # older than the ttl
    with open(lock, "w") as fh:
        json.dump({"namespace": "ghost2", "pid": os.getpid(), "host": host}, fh)
    os.utime(lock, (1_700_000_000, 1_700_000_000))
    d = ivfpq_upsert_fn(path, namespace="ckpt-D", lease_ttl=60.0)
    d(batch, 1)

    # releasing someone else's lease is refused; the operator override
    # (no namespace) clears anything
    with pytest.raises(RuntimeError, match="held by"):
        ivfpq_release_writer(path, namespace="ckpt-nope")
    assert ivfpq_release_writer(path)
    assert not os.path.isfile(lock)

    # a batch that RAISES before writing (zombie below the watermark is
    # pinned elsewhere; here: torn index) must not leave a stale lock
    bad = ivfpq_upsert_fn(path + "-missing", namespace="ckpt-E")
    with pytest.raises(Exception):
        bad(batch, 0)
    assert not os.path.isfile(os.path.join(path + "-missing", _WRITER_LOCK))


def test_ivfpq_writer_lease_fencing_and_cross_host(spark, tmp_path):
    """The r8 lease hardening (VERDICT r7 missing #1/#2 + ADVICE #1/#2):

    (a) USURPATION fences the old writer out: a holder whose TTL expired
        mid-stall loses the lock to a second stream; the FIRST writer's
        next batch must RAISE (fence-token mismatch), not resume
        co-writing, and must NOT remove or heartbeat the usurper's lock.
    (b) CROSS-HOST liveness: a lock held by a writer on another host has
        a locally-meaningless pid — while its mtime heartbeat is fresh,
        a contender must treat it as LIVE (raise), not break it because
        the pid reads dead here. Stale heartbeat still breaks it.
    (c) EPERM pid probe: os.kill raising PermissionError means the
        process EXISTS (another user's) — reported alive.
    (d) TORN-LOCK GRACE: an unparseable lock younger than the grace
        period is a claim-in-flight (live, raise); older, it is debris
        from a crashed claimant (breakable).
    (e) A batch failure with a meanwhile-usurped lease re-raises the
        ORIGINAL error, not a release-time RuntimeError, and leaves the
        usurper's lock untouched."""
    import json
    import os
    import socket
    import time

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        _WRITER_LOCK, _pid_alive, _read_writer_lock, ivfpq_release_writer,
        ivfpq_upsert_fn,
    )

    emb = load_catalog(spark, SF).embeddings
    base = emb.filter("vec_id <= 300")
    batch = emb.filter("vec_id > 300 AND vec_id <= 320")
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path, n_clusters=4, m=4, k=8, iters=1)
    lock = os.path.join(path, _WRITER_LOCK)

    # (a) usurpation: A claims, stalls past its ttl; B breaks + claims;
    # A's next batch raises and leaves B's lock alone
    a = ivfpq_upsert_fn(path, namespace="ckpt-A", lease_ttl=60.0)
    a(batch, 0)
    os.utime(lock, (1_700_000_000, 1_700_000_000))  # A stalls: ttl expires
    b = ivfpq_upsert_fn(path, namespace="ckpt-B", lease_ttl=60.0)
    b(batch, 0)  # B takes over the expired lease
    held_b, _, _ = _read_writer_lock(lock)
    assert held_b["namespace"] == "ckpt-B"
    with pytest.raises(RuntimeError, match="lease .* was lost|fence"):
        a(batch, 1)  # the resumed zombie is fenced out BEFORE writing
    held_after, _, _ = _read_writer_lock(lock)
    assert held_after == held_b, "usurper's lock must be untouched"
    # ...and A did not write its batch 1: only A's bid 0 and B's bid 1
    # (B's namespace resolved offset 1) exist
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0, 1}
    assert ivfpq_release_writer(path, namespace="ckpt-B")

    # (b) cross-host: fresh-heartbeat foreign lock is LIVE despite a
    # locally-dead pid; stale-heartbeat foreign lock is breakable
    with open(lock, "w") as fh:
        json.dump(
            {
                "namespace": "remote", "pid": 2**22 + 999,
                "host": "some-other-host", "fence": "f-remote",
            },
            fh,
        )
    c = ivfpq_upsert_fn(path, namespace="ckpt-C", lease_ttl=3600.0)
    with pytest.raises(RuntimeError, match="live stream writer"):
        c(batch, 1)
    os.utime(lock, (1_700_000_000, 1_700_000_000))  # remote heartbeat stale
    c2 = ivfpq_upsert_fn(path, namespace="ckpt-C", lease_ttl=60.0)
    c2(batch, 1)
    assert ivfpq_release_writer(path, namespace="ckpt-C")

    # (c) EPERM implies alive
    def _kill_eperm(pid, sig):
        raise PermissionError("operation not permitted")

    real_kill = os.kill
    os.kill = _kill_eperm
    try:
        assert _pid_alive(12345) is True
    finally:
        os.kill = real_kill

    # (d) torn-lock grace: young garbage = live claim; old garbage = debris
    with open(lock, "w") as fh:
        fh.write("{not json")
    d = ivfpq_upsert_fn(path, namespace="ckpt-D")
    with pytest.raises(RuntimeError, match="concurrently"):
        d(batch, 2)
    old = time.time() - 3600
    os.utime(lock, (old, old))
    d2 = ivfpq_upsert_fn(path, namespace="ckpt-D")
    d2(batch, 2)
    assert ivfpq_release_writer(path, namespace="ckpt-D")

    # (e) original batch error propagates even when the lease was
    # usurped mid-failure (release path must not mask it)
    e = ivfpq_upsert_fn(path, namespace="ckpt-E", lease_ttl=60.0)
    e(batch, 3)
    # usurp E's lease behind its back
    with open(lock, "w") as fh:
        json.dump(
            {
                "namespace": "ckpt-F", "pid": os.getpid(),
                "host": socket.gethostname(), "fence": "f-F",
            },
            fh,
        )
    with pytest.raises(RuntimeError) as exc_info:
        e(batch, 4)
    # the fence check fires first and IS the original error; the lock is
    # still the usurper's (not removed by E's failure path)
    assert "lost" in str(exc_info.value) or "fence" in str(exc_info.value)
    held_f, _, _ = _read_writer_lock(lock)
    assert held_f["namespace"] == "ckpt-F"
    assert ivfpq_release_writer(path, namespace="ckpt-F")


def test_writer_lock_break_is_single_winner(tmp_path):
    """ADVICE r7 #1 unit pin: `_break_writer_lock` removes only the
    exact (bytes+mtime-verified) file that was judged dead — a contender
    holding a stale read cannot delete a FRESH claim that re-used the
    path, and a second breaker behind the .breaker guard backs off."""
    import os

    from pygrametl_spark.streaming.ann import (
        _break_writer_lock, _read_writer_lock,
    )

    lock = str(tmp_path / "writer.lock")
    with open(lock, "w") as fh:
        fh.write('{"namespace": "dead", "fence": "x"}')
    _held, _age, ident_dead = _read_writer_lock(lock)

    # the dead lock is broken + immediately re-claimed by someone else
    os.remove(lock)
    with open(lock, "w") as fh:
        fh.write('{"namespace": "fresh", "fence": "y"}')

    # a contender still holding the DEAD inode must not remove the
    # fresh claim
    assert _break_writer_lock(lock, ident_dead) is False
    assert os.path.isfile(lock)
    held, _, ident_fresh = _read_writer_lock(lock)
    assert held["namespace"] == "fresh"

    # with the current inode it does break — exactly once
    assert _break_writer_lock(lock, ident_fresh) is True
    assert not os.path.isfile(lock)
    assert not os.path.isfile(lock + ".breaker")  # guard cleaned up

    # a live .breaker guard makes other breakers back off
    with open(lock, "w") as fh:
        fh.write('{"namespace": "dead2", "fence": "z"}')
    _h, _a, ident2 = _read_writer_lock(lock)
    with open(lock + ".breaker", "w") as fh:
        fh.write("")
    assert _break_writer_lock(lock, ident2) is False
    assert os.path.isfile(lock)
    os.remove(lock + ".breaker")


def test_ivfpq_write_index_refuses_live_writer(spark, tmp_path):
    """ADVICE r7 #4: rebuilding an index in place must not silently
    unlock a LIVE stream writer — raise and direct the operator to
    quiesce; a DEAD holder's lock is cleared like the rest of the
    lifecycle state."""
    import json
    import os
    import socket

    import pytest

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import _WRITER_LOCK

    emb = load_catalog(spark, SF).embeddings.filter("vec_id <= 200")
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(emb, path, n_clusters=4, m=4, k=8, iters=1)
    lock = os.path.join(path, _WRITER_LOCK)

    # live holder (this very process, fresh heartbeat) -> refuse
    with open(lock, "w") as fh:
        json.dump(
            {
                "namespace": "live-stream", "pid": os.getpid(),
                "host": socket.gethostname(), "fence": "f",
            },
            fh,
        )
    with pytest.raises(RuntimeError, match="live stream writer|quiesce|Quiesce"):
        sim.ivfpq_write_index(emb, path, n_clusters=4, m=4, k=8, iters=1)
    assert os.path.isfile(lock), "live lock must survive the refusal"

    # dead holder (crashed pid on this host) -> cleared, rebuild proceeds
    with open(lock, "w") as fh:
        json.dump(
            {
                "namespace": "crashed", "pid": 2**22 + 4242,
                "host": socket.gethostname(), "fence": "f2",
            },
            fh,
        )
    sim.ivfpq_write_index(emb, path, n_clusters=4, m=4, k=8, iters=1)
    assert not os.path.isfile(lock)


def test_ivfpq_auto_compaction_policy(spark, tmp_path):
    """Unattended maintenance (VERDICT r6 missing #3): a stream driven
    with ``compact_every_n_bids`` self-compacts from the foreachBatch
    tail — after N micro-batches the index ends with a bounded live
    ``_bid`` count and at most ``keep_generations`` generation dirs,
    and probes still equal a one-shot rebuild over the full corpus with
    the same frozen quantizers."""
    import os

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import stream_ivfpq_maintain

    path = str(tmp_path / "idx")
    stream_ivfpq_maintain(
        spark, SF, n_files=4, n_clusters=4, index_path=path,
        compact_every_n_bids=2, compact_keep_generations=1,
    )

    # bounded state: the latest batch (which could still replay) plus at
    # most one not-yet-folded predecessor; exactly one generation dir
    live = sim._stream_tier_bids(f"{path}/codes_stream")
    layout = sim._resolve_index_tiers(path)
    assert len([b for b in live if b >= layout["bid_cut"]]) <= 2
    gens = sim._index_generations(path)
    assert len(gens) == 1 and layout["gen"] == max(gens)
    assert not os.path.isdir(f"{path}/codes")  # gen-0 rotated out
    # quiesced stream released its lease
    assert not os.path.isfile(os.path.join(path, "writer.lock"))

    # probes unchanged by the policy: equal a one-shot rebuild with the
    # index's own frozen quantizers
    emb = load_catalog(spark, SF).embeddings
    books, _res = sim._load_books_meta(path)
    cent = spark.read.parquet(f"{path}/centroids")
    full = str(tmp_path / "full")
    sim.ivfpq_write_index(emb, full, centroids=cent, books=books, store_raw=True)
    queries = emb.filter("vec_id IN (1, 400)")

    def probe(p, **kw):
        return sorted(
            tuple(r)
            for r in sim.ivfpq_topk(spark, p, queries, nprobe=3, k=5, **kw).collect()
        )

    assert probe(path) == probe(full)
    assert probe(path, rerank=25) == probe(full, rerank=25)


def test_ivfpq_compact_max_fold_bids_converges(spark, tmp_path):
    """VERDICT r7 ask #5: ``max_fold_bids`` bounds how much ONE
    compaction call folds (the in-line auto-policy stalls ingest for
    the fold's duration), and successive capped calls drain the backlog
    monotonically to the SAME end state as one uncapped fold — same
    watermark, same probe results."""
    import os

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        ivfpq_compact, ivfpq_release_writer, ivfpq_upsert_fn,
    )

    emb = load_catalog(spark, SF).embeddings
    base = emb.filter("vec_id <= 250")

    def build(path):
        sim.ivfpq_write_index(
            base, path, n_clusters=4, m=4, k=8, iters=1, store_raw=True
        )
        fn = ivfpq_upsert_fn(path, namespace=f"{path}-ckpt")
        for i in range(5):
            lo, hi = 250 + i * 30, 250 + (i + 1) * 30
            fn(emb.filter(f"vec_id > {lo} AND vec_id <= {hi}"), i)
        ivfpq_release_writer(path, namespace=f"{path}-ckpt")

    capped, uncapped = str(tmp_path / "capped"), str(tmp_path / "uncapped")
    build(capped)
    build(uncapped)
    queries = emb.filter("vec_id IN (1, 300, 395)")

    def probe(p):
        return sorted(
            tuple(r)
            for r in sim.ivfpq_topk(
                spark, p, queries, nprobe=4, k=5, rerank=25
            ).collect()
        )

    want = probe(uncapped)
    ivfpq_compact(spark, uncapped, include_latest_bid=True)
    want_folded = probe(uncapped)
    assert want_folded == want

    # capped: each call folds at most 2 of the OLDEST bids; the
    # watermark advances 2-2-1 and probes are unchanged at every step
    cuts = []
    for _ in range(3):
        layout = ivfpq_compact(
            spark, capped, include_latest_bid=True, max_fold_bids=2
        )
        cuts.append(layout["bid_cut"])
        assert probe(capped) == want
    assert cuts == [2, 4, 5]
    # converged: nothing foldable remains, stream tiers drained
    assert not os.path.isdir(f"{capped}/codes_stream")
    layout = ivfpq_compact(spark, capped, include_latest_bid=True, max_fold_bids=2)
    assert layout["bid_cut"] == 5  # no-op once drained
    assert probe(capped) == want_folded


def test_ivfpq_async_auto_compaction(spark, tmp_path):
    """r8: ``compact_async=True`` moves the policy fold off the batch
    tail onto a daemon thread — ingest never stalls for the fold. Safe
    by the same arguments as the synchronous policy (new bids land
    strictly above the watermark, the latest replayable bid is excluded,
    the pointer protocol keeps probes resolvable), so the pinned
    contract is: (a) the drained end state still probes identically to
    a one-shot rebuild with the same frozen quantizers and stays
    bounded, (b) at most ONE fold is ever in flight, (c) a fold failure
    is re-raised loudly on the next batch tail and (d) by
    join_compaction at stream end, never swallowed."""
    import threading
    import time

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming import ann
    from pygrametl_spark.streaming.ann import stream_ivfpq_maintain

    # (a) full harness drive, async policy
    path = str(tmp_path / "idx")
    stream_ivfpq_maintain(
        spark, SF, n_files=4, n_clusters=4, index_path=path,
        compact_every_n_bids=2, compact_keep_generations=1,
        compact_async=True,
    )
    layout = sim._resolve_index_tiers(path)
    assert layout["bid_cut"] >= 1  # at least one fold really ran
    live = [
        b for b in sim._stream_tier_bids(f"{path}/codes_stream")
        if b >= layout["bid_cut"]
    ]
    assert len(live) <= 4  # bounded (async tails may skip while folding)
    assert not os.path.isfile(os.path.join(path, "writer.lock"))

    emb = load_catalog(spark, SF).embeddings
    books, _res = sim._load_books_meta(path)
    cent = spark.read.parquet(f"{path}/centroids")
    full = str(tmp_path / "full")
    sim.ivfpq_write_index(
        emb, full, centroids=cent, books=books, store_raw=True
    )
    queries = emb.filter("vec_id IN (1, 400)")

    def probe(p, **kw):
        return sorted(
            tuple(r)
            for r in sim.ivfpq_topk(
                spark, p, queries, nprobe=3, k=5, **kw
            ).collect()
        )

    assert probe(path) == probe(full)
    assert probe(path, rerank=25) == probe(full, rerank=25)

    # (b) single fold in flight: a slow fold makes later eligible tails
    # skip instead of stacking threads
    base = emb.filter("vec_id <= 250")
    slow = str(tmp_path / "slow")
    sim.ivfpq_write_index(
        base, slow, n_clusters=4, m=4, k=8, iters=1, store_raw=True
    )
    state = {"active": 0, "peak": 0, "calls": 0}
    gate = threading.Lock()
    real_compact = ann.ivfpq_compact

    def slow_compact(spark_, p, **kw):
        with gate:
            state["active"] += 1
            state["calls"] += 1
            state["peak"] = max(state["peak"], state["active"])
        time.sleep(0.8)
        try:
            return real_compact(spark_, p, **kw)
        finally:
            with gate:
                state["active"] -= 1

    fn = ann.ivfpq_upsert_fn(
        slow, namespace=f"{slow}-ckpt", compact_every_n_bids=2,
        compact_async=True,
    )
    orig = ann.ivfpq_compact
    ann.ivfpq_compact = slow_compact
    try:
        for i in range(5):
            lo, hi = 250 + i * 30, 250 + (i + 1) * 30
            fn(emb.filter(f"vec_id > {lo} AND vec_id <= {hi}"), i)
        fn.join_compaction()
    finally:
        ann.ivfpq_compact = orig
    assert state["peak"] == 1  # never two folds in flight
    assert state["calls"] >= 1
    ann.ivfpq_release_writer(slow, namespace=f"{slow}-ckpt")
    # end state still probes like the synchronous policy would
    q2 = emb.filter("vec_id IN (1, 300, 395)")
    ref = str(tmp_path / "slowref")
    books2, _ = sim._load_books_meta(slow)
    cent2 = spark.read.parquet(f"{slow}/centroids")
    sim.ivfpq_write_index(
        emb.filter("vec_id <= 400"), ref, centroids=cent2, books=books2,
        store_raw=True,
    )
    got = sorted(
        tuple(r) for r in sim.ivfpq_topk(
            spark, slow, q2, nprobe=4, k=5, rerank=25
        ).collect()
    )
    want = sorted(
        tuple(r) for r in sim.ivfpq_topk(
            spark, ref, q2, nprobe=4, k=5, rerank=25
        ).collect()
    )
    assert got == want

    # (c) fold failure surfaces on the NEXT batch tail, loudly
    bad = str(tmp_path / "bad")
    sim.ivfpq_write_index(
        base, bad, n_clusters=4, m=4, k=8, iters=1, store_raw=True
    )

    def boom(spark_, p, **kw):
        raise ValueError("fold exploded")

    fn2 = ann.ivfpq_upsert_fn(
        bad, namespace=f"{bad}-ckpt", compact_every_n_bids=2,
        compact_async=True,
    )
    ann.ivfpq_compact = boom
    try:
        fn2(emb.filter("vec_id > 250 AND vec_id <= 280"), 0)
        fn2(emb.filter("vec_id > 280 AND vec_id <= 310"), 1)  # triggers
        with pytest.raises(RuntimeError, match="async auto-compaction"):
            # the boom thread parks its error near-instantly; spin a few
            # idempotent replays of bid 2 until a tail re-raises it
            for _ in range(50):
                fn2(emb.filter("vec_id > 310 AND vec_id <= 340"), 2)
                time.sleep(0.1)
    finally:
        ann.ivfpq_compact = orig

    # (d) join_compaction re-raises a parked final-fold error
    bad2 = str(tmp_path / "bad2")
    sim.ivfpq_write_index(
        base, bad2, n_clusters=4, m=4, k=8, iters=1, store_raw=True
    )
    fn3 = ann.ivfpq_upsert_fn(
        bad2, namespace=f"{bad2}-ckpt", compact_every_n_bids=2,
        compact_async=True,
    )
    ann.ivfpq_compact = boom
    try:
        fn3(emb.filter("vec_id > 250 AND vec_id <= 280"), 0)
        fn3(emb.filter("vec_id > 280 AND vec_id <= 310"), 1)  # triggers
        with pytest.raises(RuntimeError, match="async auto-compaction"):
            fn3.join_compaction()
    finally:
        ann.ivfpq_compact = orig


def test_auto_state_partitions_scales_with_input(tmp_path):
    """r8: streaming state/shuffle partitions derive from source size —
    gate-scale inputs keep the measured 4-partition sweet spot, 100x
    inputs fan out toward the core budget instead of serializing the
    whole stateful pipeline into 4 tasks (the K=100 ssjoin crawl)."""
    from pygrametl_spark.streaming.events import _auto_state_partitions

    assert _auto_state_partitions("/root/testdata/sf0.01") == 4
    assert _auto_state_partitions("/root/testdata/sf0.1") == 4

    big = tmp_path / "events.parquet"
    big.write_bytes(b"\0" * (150 << 20))  # ~the K=100 replicated size
    assert _auto_state_partitions(str(tmp_path)) == 32

    mid = tmp_path / "events.parquet"
    mid.write_bytes(b"\0" * (40 << 20))
    assert _auto_state_partitions(str(tmp_path)) == 10

    assert _auto_state_partitions(str(tmp_path / "nope")) == 4

# ---------------------------------------------------------------------------
# Pointer-protocol lease (object-store safe, r9 — VERDICT r8 missing #1):
# the POSIX lease matrix above, re-pinned against the lease-log mode whose
# only storage primitive is a create-if-absent PUT of an immutable key.
# ---------------------------------------------------------------------------


def _lease_head(path):
    from pygrametl_spark.streaming.ann import _read_lease_log

    head, max_seq, _torn = _read_lease_log(path)
    return head, max_seq


def test_ivfpq_pointer_lease_concurrent_and_sequential(spark, tmp_path):
    """lease_protocol="pointer": the full single-live-writer matrix of
    test_ivfpq_writer_lease_concurrent_and_sequential, with every
    transition an append-only immutable log record — no O_EXCL-on-
    mutable-key, no rename, no utime, no mtime reads anywhere."""
    import time

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        _LEASE_LOG, _put_lease_record, ivfpq_release_writer, ivfpq_upsert_fn,
    )

    emb = load_catalog(spark, SF).embeddings
    base = emb.filter("vec_id <= 300")
    batch = emb.filter("vec_id > 300 AND vec_id <= 320")
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path, n_clusters=4, m=4, k=8, iters=1)

    # stream A's first batch claims the lease: head = acquire record
    a = ivfpq_upsert_fn(path, namespace="ckpt-A", lease_protocol="pointer")
    a(batch, 0)
    assert os.path.isdir(os.path.join(path, _LEASE_LOG))
    head, _ = _lease_head(path)
    assert head["namespace"] == "ckpt-A"
    assert head["action"] in ("acquire", "renew")

    # a CONCURRENT second stream fails loudly and writes nothing
    b = ivfpq_upsert_fn(path, namespace="ckpt-B", lease_protocol="pointer")
    with pytest.raises(RuntimeError, match="live stream writer"):
        b(batch, 0)
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0}
    with pytest.raises(RuntimeError, match="live stream writer"):
        ivfpq_upsert_fn(path, lease_protocol="pointer")(batch, 0)

    # same-namespace restart RECLAIMS (fresh fence) and keeps writing
    a2 = ivfpq_upsert_fn(path, namespace="ckpt-A", lease_protocol="pointer")
    a2(batch, 1)
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0, 1}

    # quiesce -> a sequential stream B is unaffected
    assert ivfpq_release_writer(path, namespace="ckpt-A")
    head, _ = _lease_head(path)
    assert head["action"] == "release"
    b2 = ivfpq_upsert_fn(path, namespace="ckpt-B", lease_protocol="pointer")
    b2(batch, 0)  # offset resolves above A's bids: no overwrite
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0, 1, 2}
    assert ivfpq_release_writer(path, namespace="ckpt-B")

    # takeover from a crashed holder: dead pid on THIS host (pid probe
    # applies only to same-host records, as in the POSIX mode)
    import socket

    _head, max_seq = _lease_head(path)
    assert _put_lease_record(path, max_seq + 1, {
        "seq": max_seq + 1, "action": "acquire", "namespace": "ghost",
        "fence": "f-ghost", "pid": 2**22 + 12345,
        "host": socket.gethostname(), "ts": time.time(),
    })
    c = ivfpq_upsert_fn(path, namespace="ckpt-C", lease_protocol="pointer")
    c(batch, 0)
    assert ivfpq_release_writer(path, namespace="ckpt-C")

    # takeover from a stalled holder: live pid but payload-ts heartbeat
    # older than the ttl (NO mtime involved)
    _head, max_seq = _lease_head(path)
    assert _put_lease_record(path, max_seq + 1, {
        "seq": max_seq + 1, "action": "acquire", "namespace": "ghost2",
        "fence": "f-ghost2", "pid": os.getpid(),
        "host": socket.gethostname(), "ts": 1_700_000_000.0,
    })
    d = ivfpq_upsert_fn(
        path, namespace="ckpt-D", lease_ttl=60.0, lease_protocol="pointer"
    )
    d(batch, 1)

    # releasing someone else's lease is refused; the operator override
    # (no namespace) clears anything
    with pytest.raises(RuntimeError, match="held by"):
        ivfpq_release_writer(path, namespace="ckpt-nope")
    assert ivfpq_release_writer(path)
    head, _ = _lease_head(path)
    assert head["action"] == "release"

    # a batch that RAISES before writing must not leave a held lease
    bad = ivfpq_upsert_fn(
        path + "-missing", namespace="ckpt-E", lease_protocol="pointer"
    )
    with pytest.raises(Exception):
        bad(batch, 0)
    head, _ = _lease_head(path + "-missing")
    assert head is None or head["action"] == "release"


def test_ivfpq_pointer_lease_fencing_and_heartbeat(spark, tmp_path):
    """Pointer-mode twins of the r8 fencing rows:

    (a) USURPATION fences the old writer out: a holder whose payload-ts
        ttl expired loses the head to a second stream's acquire record;
        the FIRST writer's next batch RAISES (fence mismatch) and leaves
        the usurper's head untouched.
    (b) CROSS-HOST liveness: a fresh-ts foreign-host record is LIVE
        despite a locally-dead pid; stale-ts is breakable.
    (c) heartbeats append renew records under the same fence and prune
        the tail (the log never grows unbounded).
    (d) TORN-HEAD GRACE: an unparseable head younger than the grace
        period is a claim-in-flight (contend); older, the next claim
        sequences past it.
    (e) a batch failure with a meanwhile-usurped lease re-raises the
        ORIGINAL error path (fence check), never a release-time error,
        and the usurper's head survives."""
    import socket
    import time

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        _LEASE_KEEP, _LEASE_LOG, _lease_rec_name, _put_lease_record,
        _read_lease_log, ivfpq_release_writer, ivfpq_upsert_fn,
    )

    emb = load_catalog(spark, SF).embeddings
    base = emb.filter("vec_id <= 300")
    batch = emb.filter("vec_id > 300 AND vec_id <= 320")
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path, n_clusters=4, m=4, k=8, iters=1)

    # (a) usurpation: A claims; its heartbeat ts "expires" (simulated by
    # a stalled-writer record with an old ts under A's fence); B takes
    # over; A's next batch raises BEFORE writing and B's head survives
    a = ivfpq_upsert_fn(
        path, namespace="ckpt-A", lease_ttl=60.0, lease_protocol="pointer"
    )
    a(batch, 0)
    head_a, max_seq = _lease_head(path)
    assert _put_lease_record(path, max_seq + 1, {
        "seq": max_seq + 1, "action": "renew", "namespace": "ckpt-A",
        "fence": head_a["fence"], "pid": head_a["pid"],
        "host": head_a["host"], "ts": 1_700_000_000.0,
    })  # A stalls: its last heartbeat is ancient
    b = ivfpq_upsert_fn(
        path, namespace="ckpt-B", lease_ttl=60.0, lease_protocol="pointer"
    )
    b(batch, 0)  # B supersedes the expired lease (no removal — a PUT)
    head_b, _ = _lease_head(path)
    assert head_b["namespace"] == "ckpt-B"
    with pytest.raises(RuntimeError, match="lease .* was lost|fence"):
        a(batch, 1)  # the resumed zombie is fenced out BEFORE writing
    head_after, _ = _lease_head(path)
    assert head_after["fence"] == head_b["fence"], "usurper head untouched"
    assert sim._stream_tier_bids(f"{path}/codes_stream") == {0, 1}
    assert ivfpq_release_writer(path, namespace="ckpt-B")

    # (b) cross-host: fresh-ts foreign record is LIVE despite dead pid
    _h, max_seq = _lease_head(path)
    assert _put_lease_record(path, max_seq + 1, {
        "seq": max_seq + 1, "action": "acquire", "namespace": "remote",
        "fence": "f-remote", "pid": 2**22 + 999,
        "host": "some-other-host", "ts": time.time(),
    })
    c = ivfpq_upsert_fn(
        path, namespace="ckpt-C", lease_ttl=3600.0, lease_protocol="pointer"
    )
    with pytest.raises(RuntimeError, match="live stream writer"):
        c(batch, 1)
    # ...stale-ts foreign record is breakable
    _h, max_seq = _lease_head(path)
    assert _put_lease_record(path, max_seq + 1, {
        "seq": max_seq + 1, "action": "renew", "namespace": "remote",
        "fence": "f-remote", "pid": 2**22 + 999,
        "host": "some-other-host", "ts": 1_700_000_000.0,
    })
    c2 = ivfpq_upsert_fn(
        path, namespace="ckpt-C", lease_ttl=60.0, lease_protocol="pointer"
    )
    c2(batch, 1)

    # (c) heartbeats: each batch appended a renew under the same fence,
    # and the log tail is pruned to the keep window
    head_c, max_seq = _lease_head(path)
    assert head_c["action"] == "renew" and head_c["namespace"] == "ckpt-C"
    recs = sorted(os.listdir(os.path.join(path, _LEASE_LOG)))
    assert len(recs) <= _LEASE_KEEP + 1
    assert ivfpq_release_writer(path, namespace="ckpt-C")

    # (d) torn-head grace: young garbage = claim-in-flight; old = debris
    _h, max_seq = _lease_head(path)
    torn = os.path.join(path, _LEASE_LOG, _lease_rec_name(max_seq + 1))
    with open(torn, "w") as fh:
        fh.write("{not json")
    d = ivfpq_upsert_fn(path, namespace="ckpt-D", lease_protocol="pointer")
    with pytest.raises(RuntimeError, match="concurrently"):
        d(batch, 2)
    old = time.time() - 3600
    os.utime(torn, (old, old))  # POSIX-realization detail: torn records
    # cannot exist on a real object store (atomic PUT)
    d2 = ivfpq_upsert_fn(path, namespace="ckpt-D", lease_protocol="pointer")
    d2(batch, 2)
    head_d, seq_d = _lease_head(path)
    assert seq_d > max_seq + 1, "claim sequences PAST the torn debris"
    assert ivfpq_release_writer(path, namespace="ckpt-D")

    # (e) original error propagates when usurped mid-failure
    e = ivfpq_upsert_fn(
        path, namespace="ckpt-E", lease_ttl=60.0, lease_protocol="pointer"
    )
    e(batch, 3)
    _h, max_seq = _lease_head(path)
    assert _put_lease_record(path, max_seq + 1, {
        "seq": max_seq + 1, "action": "acquire", "namespace": "ckpt-F",
        "fence": "f-F", "pid": os.getpid(),
        "host": socket.gethostname(), "ts": time.time(),
    })  # usurp E's lease behind its back
    with pytest.raises(RuntimeError) as exc_info:
        e(batch, 4)
    assert "lost" in str(exc_info.value) or "fence" in str(exc_info.value)
    head_f, _ = _lease_head(path)
    assert head_f["namespace"] == "ckpt-F", "usurper head survives E's failure"
    assert ivfpq_release_writer(path, namespace="ckpt-F")
    # E wrote batch 3 but never batch 4
    assert 4 not in sim._stream_tier_bids(f"{path}/codes_stream")


def test_pointer_lease_break_is_single_winner(tmp_path):
    """The seq-number PUT race IS the breaker serialization: two
    contenders who both judged the same holder dead race the
    create-exclusive PUT of the next record and exactly one wins — the
    pointer-mode analogue of test_writer_lock_break_is_single_winner,
    with no removal step to mis-target."""
    from pygrametl_spark.streaming.ann import (
        _acquire_writer_lease_pointer, _put_lease_record, _read_lease_log,
    )

    path = str(tmp_path / "idx")
    os.makedirs(path)
    # a dead holder (ancient ts, foreign host so no pid probe applies)
    assert _put_lease_record(path, 1, {
        "seq": 1, "action": "acquire", "namespace": "dead", "fence": "x",
        "pid": 1, "host": "elsewhere", "ts": 1_700_000_000.0,
    })

    # contender 1 claims over it
    f1 = _acquire_writer_lease_pointer(path, "one", 60.0)
    head, max_seq, _ = _read_lease_log(path)
    assert head["fence"] == f1 and head["namespace"] == "one"

    # contender 2, racing with a STALE read (it also judged seq-1 dead
    # and computed next=2), loses the PUT — it cannot clobber the fresh
    # claim, and exactly one record occupies each seq
    assert _put_lease_record(path, 2, {
        "seq": 2, "action": "acquire", "namespace": "two", "fence": "y",
        "pid": os.getpid(), "host": "h", "ts": 1_800_000_000.0,
    }) is False
    head2, _, _ = _read_lease_log(path)
    assert head2["fence"] == f1, "stale racer must not displace the winner"

    # a LIVE holder blocks a normal acquire loudly
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="live stream writer"):
        _acquire_writer_lease_pointer(path, "two", 3600.0)


def test_lease_protocols_mutually_visible(spark, tmp_path):
    """A live holder under one lease protocol must block an acquire
    under the other — otherwise a mixed-mode deployment would run two
    unguarded writers on one index."""
    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        ivfpq_release_writer, ivfpq_upsert_fn,
    )

    emb = load_catalog(spark, SF).embeddings
    base = emb.filter("vec_id <= 300")
    batch = emb.filter("vec_id > 300 AND vec_id <= 320")
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path, n_clusters=4, m=4, k=8, iters=1)

    # posix holder live -> pointer acquire refuses
    a = ivfpq_upsert_fn(path, namespace="ckpt-A")  # posix (default)
    a(batch, 0)
    b = ivfpq_upsert_fn(path, namespace="ckpt-B", lease_protocol="pointer")
    with pytest.raises(RuntimeError, match="ONE lease protocol"):
        b(batch, 0)
    assert ivfpq_release_writer(path, namespace="ckpt-A")

    # pointer holder live -> posix acquire refuses
    b2 = ivfpq_upsert_fn(path, namespace="ckpt-B", lease_protocol="pointer")
    b2(batch, 1)
    c = ivfpq_upsert_fn(path, namespace="ckpt-C")  # posix
    with pytest.raises(RuntimeError, match="ONE lease protocol"):
        c(batch, 1)
    assert ivfpq_release_writer(path, namespace="ckpt-B")

    # unknown protocol is rejected at construction
    with pytest.raises(ValueError, match="lease_protocol"):
        ivfpq_upsert_fn(path, lease_protocol="dynamo")


def test_ivfpq_write_index_refuses_live_pointer_writer(spark, tmp_path):
    """In-place rebuild under a LIVE pointer-lease holder raises (the
    ADVICE r7 #4 discipline, extended to the object-store lease mode);
    a released/dead lease log is lifecycle debris the rebuild clears."""
    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        _LEASE_LOG, ivfpq_release_writer, ivfpq_upsert_fn,
    )

    emb = load_catalog(spark, SF).embeddings.filter("vec_id <= 200")
    batch = load_catalog(spark, SF).embeddings.filter(
        "vec_id > 200 AND vec_id <= 220"
    )
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(emb, path, n_clusters=4, m=4, k=8, iters=1)

    a = ivfpq_upsert_fn(path, namespace="live", lease_protocol="pointer")
    a(batch, 0)
    with pytest.raises(RuntimeError, match="pointer lease|live stream writer"):
        sim.ivfpq_write_index(emb, path, n_clusters=4, m=4, k=8, iters=1)
    assert os.path.isdir(os.path.join(path, _LEASE_LOG)), (
        "live lease log must survive the refusal"
    )

    # released -> rebuild proceeds and clears the log with the rest of
    # the lifecycle state
    assert ivfpq_release_writer(path, namespace="live")
    sim.ivfpq_write_index(emb, path, n_clusters=4, m=4, k=8, iters=1)
    assert not os.path.isdir(os.path.join(path, _LEASE_LOG))


def test_ivfpq_stream_pointer_lease_end_to_end(spark, tmp_path):
    """stream_ivfpq_maintain(lease_protocol="pointer") runs the full
    drain + auto-release lifecycle: probes equal the POSIX-mode index
    (the lease never touches data), and the lease log ends released."""
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.streaming.ann import (
        _read_lease_log, stream_ivfpq_maintain,
    )

    p_ptr = stream_ivfpq_maintain(
        spark, SF, n_files=2,
        index_path=str(tmp_path / "ptr"), lease_protocol="pointer",
    )
    head, _seq, _torn = _read_lease_log(p_ptr)
    assert head is not None and head["action"] == "release"

    p_posix = stream_ivfpq_maintain(
        spark, SF, n_files=2, index_path=str(tmp_path / "posix"),
    )
    from pygrametl_spark.catalog import load_catalog

    q = load_catalog(spark, SF).embeddings.filter("vec_id <= 3")
    r_ptr = sim.ivfpq_topk(spark, p_ptr, q, k=5).collect()
    r_posix = sim.ivfpq_topk(spark, p_posix, q, k=5).collect()
    assert sorted(map(tuple, r_ptr)) == sorted(map(tuple, r_posix))


def test_pointer_lease_thread_race_single_winner(tmp_path):
    """TRUE concurrent acquisition race: N threads contend for the
    pointer lease of one index simultaneously (over a dead holder, so
    every contender reaches the PUT). Exactly ONE must win; every loser
    must get the loud live-writer error (having re-read the winner's
    head on its retry), and the final head must carry the winner's
    fence."""
    import threading

    from pygrametl_spark.streaming.ann import (
        _acquire_writer_lease_pointer, _put_lease_record, _read_lease_log,
    )

    path = str(tmp_path / "idx")
    os.makedirs(path)
    assert _put_lease_record(path, 1, {
        "seq": 1, "action": "acquire", "namespace": "dead", "fence": "x",
        "pid": 1, "host": "elsewhere", "ts": 1_700_000_000.0,
    })

    results: dict = {}
    barrier = threading.Barrier(8)

    def contend(i):
        barrier.wait()
        try:
            results[i] = ("won", _acquire_writer_lease_pointer(
                path, f"ns-{i}", 60.0
            ))
        except RuntimeError as e:
            results[i] = ("lost", str(e))

    threads = [
        threading.Thread(target=contend, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    winners = [(i, r[1]) for i, r in results.items() if r[0] == "won"]
    losers = [r[1] for r in results.values() if r[0] == "lost"]
    assert len(winners) == 1, f"exactly one winner required: {results}"
    assert len(losers) == 7
    assert all("live stream writer" in m or "lease race" in m for m in losers)
    head, _seq, _torn = _read_lease_log(path)
    assert head["fence"] == winners[0][1]
    assert head["namespace"] == f"ns-{winners[0][0]}"


def test_ivfpq_writer_status(tmp_path):
    """ivfpq_writer_status reports holder/protocol/liveness under both
    lease protocols and for free/released/dead states — the read half
    of the quiesce workflow."""
    import json
    import socket
    import time

    from pygrametl_spark.streaming.ann import (
        _WRITER_LOCK, _put_lease_record, ivfpq_release_writer,
        ivfpq_writer_status,
    )

    path = str(tmp_path / "idx")
    os.makedirs(path)

    # free index
    s = ivfpq_writer_status(path)
    assert s == {"held": False, "live": False, "protocol": None,
                 "holder": None, "age_sec": None}

    # live posix holder (this pid)
    with open(os.path.join(path, _WRITER_LOCK), "w") as fh:
        json.dump({"namespace": "ns", "pid": os.getpid(),
                   "host": socket.gethostname(), "fence": "f"}, fh)
    s = ivfpq_writer_status(path)
    assert s["held"] and s["live"] and s["protocol"] == "posix"
    assert s["holder"]["namespace"] == "ns" and s["age_sec"] is not None

    # dead posix holder (crashed pid)
    with open(os.path.join(path, _WRITER_LOCK), "w") as fh:
        json.dump({"namespace": "ghost", "pid": 2**22 + 777,
                   "host": socket.gethostname(), "fence": "f"}, fh)
    s = ivfpq_writer_status(path)
    assert s["held"] and not s["live"]
    os.remove(os.path.join(path, _WRITER_LOCK))

    # live pointer holder
    assert _put_lease_record(path, 1, {
        "seq": 1, "action": "acquire", "namespace": "p-ns", "fence": "pf",
        "pid": os.getpid(), "host": socket.gethostname(),
        "ts": time.time(),
    })
    s = ivfpq_writer_status(path)
    assert s["held"] and s["live"] and s["protocol"] == "pointer"
    assert s["holder"]["namespace"] == "p-ns"

    # stale pointer holder -> held but not live
    assert _put_lease_record(path, 2, {
        "seq": 2, "action": "renew", "namespace": "p-ns", "fence": "pf",
        "pid": 2**22 + 5, "host": "elsewhere", "ts": 1_700_000_000.0,
    })
    s = ivfpq_writer_status(path, ttl=60.0)
    assert s["held"] and not s["live"]

    # released -> free
    assert ivfpq_release_writer(path)
    s = ivfpq_writer_status(path)
    assert not s["held"]


def test_ssjoin_file_sink_empty_drain_returns_schema(spark, tmp_path):
    """ADVICE r8 #1 pin: the file-sink path's empty-result fallback
    fires ONLY for a genuinely empty drain (no committed data files).
    A source with no click/purchase events drains zero pairs — the
    result must be an empty DataFrame with the (click_id, buy_id)
    schema, not an error and not a masked read failure."""
    from pygrametl_spark.catalog import read_parquet
    from pygrametl_spark.streaming.events import stream_click_to_purchase_join

    src = tmp_path / "sf"
    src.mkdir()
    ev = read_parquet(spark, f"{SF}/events.parquet").filter(
        "event_type NOT IN ('click', 'purchase')"
    )
    ev.coalesce(1).write.parquet(str(src / "events.parquet"))

    out = stream_click_to_purchase_join(spark, str(src), sink="files")
    assert out.columns == ["click_id", "buy_id"]
    assert out.count() == 0


def test_put_lease_record_atomic_with_payload(tmp_path):
    """Readers racing record PUTs must NEVER observe a torn head: the
    hard-link publish makes every visible l{seq}.json complete (the
    object-store PUT-if-absent contract). 8 writers contend per round
    while a reader thread hammers _read_lease_log; any torn_head_age
    observation = the pre-r9 create-then-write window is back."""
    import threading

    from pygrametl_spark.streaming.ann import (
        _put_lease_record, _read_lease_log,
    )

    path = str(tmp_path / "idx")
    os.makedirs(path)
    stop = threading.Event()
    torn_seen = []

    def reader():
        while not stop.is_set():
            head, _seq, torn = _read_lease_log(path)
            if torn is not None:
                torn_seen.append(torn)
            if head is not None:
                assert "fence" in head  # parsed = complete payload

    rt = threading.Thread(target=reader)
    rt.start()
    try:
        for seq in range(1, 30):
            wins = []
            barrier = threading.Barrier(8)

            def put(i, seq=seq):
                barrier.wait()
                rec = {"seq": seq, "action": "acquire", "namespace": f"n{i}",
                       "fence": f"f{i}", "pid": os.getpid(), "host": "h",
                       "ts": 1_700_000_000.0}
                if _put_lease_record(path, seq, rec):
                    wins.append(i)

            ts = [threading.Thread(target=put, args=(i,)) for i in range(8)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert len(wins) == 1, f"seq {seq}: {wins}"
    finally:
        stop.set()
        rt.join()
    assert torn_seen == []
    # no .tmp- debris survives the successful publishes
    import re
    leftovers = [
        n for n in os.listdir(os.path.join(path, "lease_log"))
        if not re.match(r"^l\d+\.json$", n)
    ]
    assert leftovers == []


def test_url_dedup_stream_recovery_equals_batch_twin(spark, tmp_path):
    """Canonical-URL ingest (r9 stream_dedup_url): batch 1's accepted
    store append lands, then the job dies before the checkpoint commit.
    The replay's anti-join on the canonical string drops every
    already-accepted URL, so the store still equals the batch twin
    (global MIN(doc_id) per canonical URL)."""
    from pygrametl_spark.functions.urls import url_normalize
    from pygrametl_spark.queries_data import _messy_url
    from pygrametl_spark.streaming.corpus import _stage_id_sliced

    full, stage = _stage_id_sliced(spark, SF, 3)
    store = str(tmp_path / "store")
    spark.createDataFrame([], "doc_id long, norm_url string").write.parquet(store)

    def make_accept(fail_on_batch=None):
        state = {"tripped": False}

        def accept(bdf, bid):
            batch = (
                bdf.select("doc_id", url_normalize(_messy_url()).alias("norm_url"))
                .groupBy("norm_url")
                .agg(F.min("doc_id").alias("doc_id"))
            )
            seen = bdf.sparkSession.read.parquet(store).select("norm_url")
            batch.join(seen, "norm_url", "left_anti").select(
                "doc_id", "norm_url"
            ).write.mode("append").parquet(store)
            if fail_on_batch == bid and not state["tripped"]:
                state["tripped"] = True
                raise RuntimeError("injected crash after store append")

        return accept

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, stage, full.schema, make_accept(fail_on_batch=1), ckpt)
    _run_stream(spark, stage, full.schema, make_accept(), ckpt)

    got = {
        (r["norm_url"], r["doc_id"])
        for r in spark.read.parquet(store).collect()
    }
    want = {
        (r["norm_url"], r["doc_id"])
        for r in full.select("doc_id", url_normalize(_messy_url()).alias("norm_url"))
        .groupBy("norm_url").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert got == want and 0 < len(got) < full.count()
