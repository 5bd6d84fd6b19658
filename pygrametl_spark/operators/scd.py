"""Slowly changing dimensions (type 1 and type 2) + as-of lookup.

Reference: ``pygrametl/tables.py`` TypeOneSlowlyChangingDimension
(:689-901), SlowlyChangingDimension (:904-1711) — the flagship operators
of the reference, 800+ LoC of per-row SQL. Batch restatement:

- *newest version per member* = ``row_number()`` over
  ``partitionBy(lookupatts).orderBy(orderingatt DESC)`` with the
  reference's NULL placement (NULL ``toatt`` = current = newest, NULL
  ``fromatt`` = oldest; ref ORDER BY construction tables.py:1104-1109)
  expressed exactly via ``desc_nulls_first``/``desc_nulls_last``.
- *scdensure* (ref :1274-1421) = one merge job per batch: change
  detection via attribute comparison against the current version,
  closing old versions (``toatt`` = effective date), inserting new
  versions (version+1, ``fromatt`` = effective date, ``toatt`` = maxto),
  per-attribute type-1 overrides applied in place across versions
  (``type1atts`` ref :1083-1085).
- *lookupasof* (ref :1596-1711) = an interval join on validity
  ``[fromatt, toatt)`` with the inclusive-bound matrix of ref
  :1686-1711.

Intra-batch ordering: the reference applies changes one row at a time,
so several changes to one member in one batch create several versions.
The batch engine reproduces that with event-time windows over
``srcdateatt`` — see :meth:`SlowlyChangingDimension.scdensure` — under
the standard ETL assumption that incoming changes are not older than the
stored current version.

Scale: the only shuffles are by ``lookupatts`` (window + join), which is
exactly the minimal partitioning the semantics require; AQE skew-join
handles hot members.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pygrametl_spark.operators.dimension import Dimension, apply_namemapping
from pygrametl_spark.plans.keys import assign_dense_keys, max_key

__all__ = ["SlowlyChangingDimension", "TypeOneSlowlyChangingDimension", "scd2_from_history"]


class TypeOneSlowlyChangingDimension(Dimension):
    """SCD type 1: overwrite tracked attributes in place
    (ref tables.py:689-901, scdensure :797-871)."""

    def __init__(self, name, key, attributes, lookupatts, type1atts=None, **kw):
        super().__init__(name, key, attributes, lookupatts, **kw)
        # default: every non-lookup attribute is type-1 maintained (ref :767-771)
        self.type1atts = list(type1atts) if type1atts is not None else [
            a for a in self.attributes if a not in self.lookupatts
        ]

    def scdensure(self, batch: DataFrame, namemapping=None) -> DataFrame:
        """Lookup by business key; miss -> insert; hit -> overwrite changed
        ``type1atts`` in place (ref :797-871). Returns batch with keys."""
        b = apply_namemapping(batch, namemapping)
        from pygrametl_spark.plans.keys import _worth_pinning

        if _worth_pinning(b):
            # the batch feeds BOTH the ensure (anti-join + dense keys)
            # and the type-1 overwrite join — unpinned, a derived batch
            # (window + join chains in the callers) is replayed once per
            # consumer (guide §1.2)
            b = b.localCheckpoint(eager=False)
        keyed = self.ensure(b)  # inserts new members with dense keys
        # overwrite type1atts of existing members with the batch's values
        upd = self._dedup_new(b).select(*self.lookupatts, *self.type1atts)
        dim = self.df.alias("d").join(
            upd.select(*self.lookupatts, *[F.col(a).alias(f"_n_{a}") for a in self.type1atts])
            .withColumn("_hit", F.lit(True)),
            on=self.lookupatts,
            how="left",
        )
        for a in self.type1atts:
            dim = dim.withColumn(
                a, F.when(F.col("_hit").isNotNull(), F.col(f"_n_{a}")).otherwise(F.col(a))
            )
        self._set_state(dim.select(*self.all))
        return keyed


class SlowlyChangingDimension(Dimension):
    """SCD type 2 with optional per-attribute type-1 overrides
    (ref tables.py:904-1528)."""

    def __init__(
        self,
        name,
        key,
        attributes,
        lookupatts,
        versionatt: str | None = None,
        fromatt: str | None = None,
        toatt: str | None = None,
        *,
        srcdateatt: str | None = None,
        type1atts=(),
        maxto=None,
        minfrom=None,
        orderingatt: str | None = None,
        type1attsupdateall: bool = True,
        versionondatechange: bool = False,
        **kw,
    ):
        super().__init__(name, key, attributes, lookupatts, **kw)
        self.versionatt = versionatt
        self.fromatt = fromatt
        self.toatt = toatt
        self.srcdateatt = srcdateatt
        self.type1atts = list(type1atts)
        self.maxto = maxto
        self.minfrom = minfrom
        self.type1attsupdateall = type1attsupdateall
        # Reference parity knob (ref tables.py:1340-1365, the fromatt
        # branch): with srcdateatt set, the reference's scdensure makes
        # a NEW version whenever the incoming source date differs from
        # the newest version's fromatt — even when no tracked attribute
        # changed (observed: every distinctly-dated reading becomes a
        # version, i.e. snapshot-per-date). The engine's default is
        # conventional change-only SCD2; set versionondatechange=True
        # to replicate the reference exactly.
        self.versionondatechange = versionondatechange and srcdateatt is not None
        # ref :1029-1040: ordering defaults to versionatt, else toatt, else fromatt
        self.orderingatt = orderingatt or versionatt or toatt or fromatt
        if self.orderingatt is None:
            raise ValueError("SCD needs one of versionatt/toatt/fromatt for version ordering")
        # tracked (type-2) attributes: everything except bookkeeping + type1
        self.trackedatts = [
            a
            for a in self.attributes
            if a not in {versionatt, fromatt, toatt, *self.type1atts, *self.lookupatts}
        ]

    # -- version ordering -------------------------------------------------
    def _ordering_desc(self) -> Column:
        """Newest-first ordering with the reference's NULLS placement
        (ref tables.py:1104-1109): NULL toatt = current -> first in DESC;
        NULL fromatt = oldest -> last in DESC."""
        c = F.col(self.orderingatt)
        if self.orderingatt == self.toatt:
            return c.desc_nulls_first()
        return c.desc_nulls_last()

    def current_versions(self) -> DataFrame:
        w = Window.partitionBy(*self.lookupatts).orderBy(self._ordering_desc())
        return (
            self.df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def lookup(self, batch: DataFrame, namemapping=None, *, broadcast: bool = False) -> DataFrame:
        """Key of the *newest* version per member (ref lookup :1222-1272)."""
        b = apply_namemapping(batch, namemapping)
        cur = self.current_versions().select(self.key, *self.lookupatts)
        if broadcast:
            cur = F.broadcast(cur)
        out = b.join(cur, on=self.lookupatts, how="left")
        if self.defaultidvalue is not None:
            out = out.withColumn(self.key, F.coalesce(F.col(self.key), F.lit(self.defaultidvalue)))
        return out

    # -- the merge --------------------------------------------------------
    def scdensure(self, batch: DataFrame, namemapping=None, *,
                  idempotent: bool = False) -> None:
        """Batch SCD2 merge (ref scdensure :1274-1421).

        Handles multiple changes per member in one batch by ordering the
        batch on ``srcdateatt`` per member (the reference achieves the
        same by processing rows sequentially). Steps:

        1. effective date per incoming row = srcdateatt (else minfrom/NULL),
        2. stack [current versions] + [incoming changes] per member in
           event order; drop rows whose tracked attributes equal the
           previous row's (no-change suppression, ref :1340-1376),
        3. close each superseded version: ``toatt`` = next ``fromatt``;
           the last version keeps ``toatt`` = maxto (ref :1400-1407),
        4. version numbers continue from the stored maximum (ref :1387-1399),
        5. surviving new versions get dense max+1 surrogate keys,
        6. type-1 attributes: latest incoming value overwrites all (or
           latest) versions in place (ref :1486-1528).

        Like the reference's sequential merge, re-applying an
        ALREADY-MERGED multi-change batch re-appends its intermediate
        versions (the stack orders all incoming rows after all stored
        versions, so a replayed old value compares against the NEWEST
        version, not the one its date belongs to). ``idempotent=True``
        makes exact replay a no-op — the crash-recovery contract an
        at-least-once ``foreachBatch`` deployment needs
        (streaming/events.stream_scd2_maintain) — by interleaving the
        stack by TIME (fromdate/event date; ties: stored version first)
        instead of versions-then-incoming: every replayed row then lands
        directly after the version its date falls in, carries that
        version's own value, and is no-change-suppressed; a genuinely
        new change still differs from its time-predecessor and merges
        normally. Requires ``fromatt`` + ``srcdateatt``, and assumes
        per-member event dates are >= the stored history's (the
        time-ordered-stream contract; with equal-timestamp multi-change
        chains replay ordering is ambiguous, as in the base merge).
        Cost shape is IDENTICAL to the default merge (same one exchange
        on the member key) — only the sort key changes.
        """
        b = apply_namemapping(batch, namemapping)
        from pygrametl_spark.plans.keys import _worth_pinning

        if _worth_pinning(b):
            # the batch feeds the stacked merge AND (with type-1 atts)
            # the latest-value override window — pin derived batches so
            # each consumer reads one materialization (guide §1.2)
            b = b.localCheckpoint(eager=False)
        eff = (
            F.col(self.srcdateatt)
            if self.srcdateatt and self.srcdateatt in b.columns
            else F.lit(self.minfrom)
        )
        incoming = b.withColumn("_eff", eff).select(
            *self.lookupatts, *self.trackedatts, *[c for c in self.type1atts if c in b.columns], "_eff"
        )
        if idempotent and not (self.fromatt and self.srcdateatt):
            raise ValueError(
                "idempotent scdensure requires fromatt and srcdateatt"
            )

        hist = self.df
        w_cur = Window.partitionBy(*self.lookupatts).orderBy(self._ordering_desc())
        hist = hist.withColumn("_is_cur", F.row_number().over(w_cur) == 1)

        # Stack: existing rows keep their key/version/validity; incoming rows
        # are candidates ordered after the current version by event time.
        exist_part = hist.select(
            *self.lookupatts,
            *self.trackedatts,
            *[F.col(a).alias(f"_t1_{a}") for a in self.type1atts],
            F.col(self.key).alias("_key"),
            (F.col(self.versionatt) if self.versionatt else F.lit(None).cast("long")).alias("_ver"),
            (F.col(self.fromatt) if self.fromatt else F.lit(None)).alias("_from"),
            (F.col(self.toatt) if self.toatt else F.lit(None)).alias("_to"),
            F.lit(0).alias("_src"),
            F.col("_is_cur"),
        )
        inc_part = incoming.select(
            *self.lookupatts,
            *self.trackedatts,
            *[
                (F.col(a) if a in incoming.columns else F.lit(None)).alias(f"_t1_{a}")
                for a in self.type1atts
            ],
            F.lit(None).cast("long").alias("_key"),
            F.lit(None).cast("long").alias("_ver"),
            F.col("_eff").alias("_from"),
            F.lit(None).alias("_to"),
            F.lit(1).alias("_src"),
            F.lit(False).alias("_is_cur"),
        )
        stacked = exist_part.unionByName(inc_part)

        # Event order per member: existing versions first (by their version
        # order), then incoming by effective date. _src breaks ties so an
        # incoming change dated equal to the current version lands after it.
        # idempotent mode interleaves by TIME instead: each incoming row
        # lands right after the version covering its date, so a replayed
        # row's predecessor carries its own value -> no-change-suppressed.
        if idempotent:
            order = [
                F.col("_from").asc_nulls_first(), F.col("_src").asc(),
                F.col("_ver").asc_nulls_first(),
            ]
        else:
            order = [F.col("_src").asc(), F.col("_ver").asc_nulls_first(), F.col("_from").asc_nulls_first()]
        w = Window.partitionBy(*self.lookupatts).orderBy(*order)
        cmp_cols = [F.col(a) for a in self.trackedatts]
        if self.versionondatechange:
            # ref :1340-1365: a differing source date alone forces a new
            # version, so the date participates in the change comparison
            cmp_cols.append(F.col("_from"))
        tracked_struct = F.struct(*cmp_cols)
        stacked = stacked.withColumn("_prev", F.lag(tracked_struct).over(w)).withColumn(
            "_changed",
            F.col("_prev").isNull() | ~tracked_struct.eqNullSafe(F.col("_prev")),
        )
        # keep: all existing rows (history is immutable) + incoming rows that
        # differ from their predecessor
        kept = stacked.filter((F.col("_src") == 0) | F.col("_changed"))

        w2 = Window.partitionBy(*self.lookupatts).orderBy(*order)
        kept = kept.withColumn("_rn", F.row_number().over(w2))
        base_ver = F.max(F.when(F.col("_src") == 0, F.coalesce(F.col("_ver"), F.lit(1)))).over(
            Window.partitionBy(*self.lookupatts)
        )
        n_exist = F.sum(F.when(F.col("_src") == 0, 1).otherwise(0)).over(
            Window.partitionBy(*self.lookupatts)
        )
        kept = kept.withColumn(
            "_newver",
            F.when(F.col("_src") == 0, F.col("_ver")).otherwise(
                F.coalesce(base_ver, F.lit(0)) + F.col("_rn") - n_exist
            ),
        )
        # close superseded versions: toatt = fromatt of successor
        nxt_from = F.lead(F.col("_from")).over(w2)
        if self.toatt:
            kept = kept.withColumn(
                "_newto",
                F.when(nxt_from.isNotNull(), nxt_from).otherwise(
                    F.when(F.col("_src") == 0, F.col("_to")).otherwise(F.lit(self.maxto))
                ),
            )
        # Pin the merge output before it fans out: new_rows (counted AND
        # numbered by assign_dense_keys), old_rows, and the final union
        # all read `kept` — unpinned, each action replays the whole
        # stack-window merge from the parquet scans (measured r9: the
        # scd2/snowflake entries spent 60-97% of their wall time in such
        # construction-phase replays; guide §1.2).
        kept = kept.localCheckpoint(eager=False)
        # assign dense keys to the new version rows; offset + the
        # plan-choosing count in ONE action (r9, guide §2.6 — the two
        # scalars are independent single-row aggregates)
        from pygrametl_spark.plans.keys import max_key_and_count

        new_rows = kept.filter(F.col("_src") == 1)
        offset, n_new = max_key_and_count(self.df, self.key, new_rows)
        new_keyed = assign_dense_keys(
            new_rows, [*self.lookupatts, "_newver"], "_assigned", offset,
            approx_count=n_new,
        )
        old_rows = kept.filter(F.col("_src") == 0)
        merged = old_rows.withColumn("_assigned", F.col("_key")).unionByName(new_keyed)

        cols = [F.col("_assigned").alias(self.key)]
        for a in self.attributes:
            if a == self.versionatt:
                cols.append(F.col("_newver").cast("long").alias(a))
            elif a == self.fromatt:
                cols.append(F.col("_from").alias(a))
            elif a == self.toatt:
                cols.append(F.col("_newto").alias(a))
            elif a in self.type1atts:
                cols.append(F.col(f"_t1_{a}").alias(a))
            else:
                cols.append(F.col(a))
        result = merged.select(*cols)

        # type-1 overrides: latest incoming value per member overwrites
        # versions in place (ref :1486-1528)
        t1_present = [a for a in self.type1atts if a in b.columns]
        if t1_present:
            w_last = Window.partitionBy(*self.lookupatts).orderBy(F.col("_eff").desc_nulls_last())
            latest = (
                incoming.withColumn("_r", F.row_number().over(w_last))
                .filter(F.col("_r") == 1)
                .select(*self.lookupatts, *[F.col(a).alias(f"_n_{a}") for a in t1_present])
                .withColumn("_hit", F.lit(True))
            )
            result = result.join(latest, on=self.lookupatts, how="left")
            if self.type1attsupdateall:
                cond = F.col("_hit").isNotNull()
            else:
                w_cur2 = Window.partitionBy(*self.lookupatts).orderBy(self._ordering_desc())
                result = result.withColumn("_rn2", F.row_number().over(w_cur2))
                cond = F.col("_hit").isNotNull() & (F.col("_rn2") == 1)
            for a in t1_present:
                result = result.withColumn(a, F.when(cond, F.col(f"_n_{a}")).otherwise(F.col(a)))
        self._set_state(result.select(*self.all))

    def closecurrent(self, members: DataFrame | None, end) -> None:
        """Set ``toatt`` of the newest version to ``end`` iff it is still
        maxto (ref :1530-1553). ``members=None`` closes every member."""
        if self.toatt is None:
            raise ValueError("closecurrent requires toatt")
        w = Window.partitionBy(*self.lookupatts).orderBy(self._ordering_desc())
        dim = self.df.withColumn("_rn", F.row_number().over(w))
        if members is not None:
            m = members.select(*self.lookupatts).dropDuplicates().withColumn("_m", F.lit(True))
            dim = dim.join(m, on=self.lookupatts, how="left")
        else:
            dim = dim.withColumn("_m", F.lit(True))
        open_cond = (
            F.col(self.toatt).isNull()
            if self.maxto is None
            else F.col(self.toatt).eqNullSafe(F.lit(self.maxto))
        )
        dim = dim.withColumn(
            self.toatt,
            F.when((F.col("_rn") == 1) & F.col("_m").isNotNull() & open_cond, F.lit(end)).otherwise(
                F.col(self.toatt)
            ),
        )
        self._set_state(dim.select(*self.all))

    # -- temporal lookup --------------------------------------------------
    def lookupasof(
        self,
        batch: DataFrame,
        when: str | Column,
        namemapping=None,
        *,
        fromincl: bool = True,
        toincl: bool = False,
        full_row: bool = False,
    ) -> DataFrame:
        """As-of join: the version valid at ``when`` (ref :1596-1711).

        Strategy matrix (ref picks by which validity atts exist,
        :1642-1711): both atts -> interval containment; only fromatt ->
        last version starting at/before ``when``; only toatt -> first
        version ending after ``when``. Bound inclusivity via
        ``fromincl``/``toincl`` (ref inclusive-matrix :1686-1711).

        Implemented as a join on lookupatts with a range predicate; the
        per-member "last matching version" is selected with one window.
        At scale this shuffles on lookupatts only; for sorted inputs
        Spark executes it as a sort-merge join with an interval filter.
        """
        b = apply_namemapping(batch, namemapping)
        wcol = F.col(when) if isinstance(when, str) else when
        dim = self.df
        probe = b.withColumn("_when", wcol)
        sel = [dim[c] for c in self.all] if full_row else [dim[self.key], *[dim[c] for c in self.lookupatts]]
        dimj = dim.select(*sel, *[dim[c] for c in [self.fromatt, self.toatt] if c and c not in ([self.key] + self.lookupatts)])

        conds = [probe[c] == dimj[c] for c in self.lookupatts]
        if self.fromatt:
            fcond = dimj[self.fromatt] <= probe["_when"] if fromincl else dimj[self.fromatt] < probe["_when"]
            conds.append(fcond | dimj[self.fromatt].isNull())
        if self.toatt:
            open_end = (
                dimj[self.toatt].isNull()
                if self.maxto is None
                else dimj[self.toatt].eqNullSafe(F.lit(self.maxto))
            )
            tcond = dimj[self.toatt] >= probe["_when"] if toincl else dimj[self.toatt] > probe["_when"]
            conds.append(open_end | tcond)

        joined = probe.join(dimj, on=_and_all(conds), how="left")
        # several versions can satisfy an open interval matrix -> keep the
        # newest matching one, as the reference's linear scan does (:1649-1711)
        order_col = dimj[self.fromatt] if self.fromatt else dimj[self.toatt]
        wdedup = Window.partitionBy(*[probe[c] for c in b.columns], probe["_when"]).orderBy(
            order_col.desc_nulls_last()
        )
        out = joined.withColumn("_rn", F.row_number().over(wdedup)).filter(F.col("_rn") == 1)
        drop = ["_rn", "_when"]
        keep = [probe[c] for c in b.columns] + (
            [dimj[c] for c in self.all if c not in self.lookupatts]
            if full_row
            else [dimj[self.key]]
        )
        return out.select(*keep)


def _and_all(conds):
    c = conds[0]
    for x in conds[1:]:
        c = c & x
    return c


def scd2_from_history(
    events: DataFrame,
    lookupatts: list[str],
    trackedatts: list[str],
    ts: str,
    *,
    key: str = "id",
    versionatt: str = "version",
    fromatt: str = "fromdate",
    toatt: str = "todate",
    tiebreak: list[str] | None = None,
    version_on_datechange: bool = False,
) -> DataFrame:
    """Build a full SCD2 dimension from a change-event history in one job.

    This is the set-at-a-time equivalent of replaying every event through
    the reference's ``scdensure`` loop (tables.py:1274-1421) starting from
    an empty dimension: consecutive events of one member with unchanged
    tracked attributes are suppressed; each surviving event becomes a
    version with ``fromatt`` = its timestamp, ``toatt`` = the next
    version's timestamp (NULL = current), and a 1-based version counter.
    Surrogate keys are dense over (lookupatts, version).

    ``version_on_datechange=True`` replicates the reference's srcdateatt
    behavior exactly (tables.py:1340-1365): a differing event date alone
    creates a new version even when no tracked attribute changed, so
    only exact (attributes, timestamp) repeats are suppressed.

    One shuffle (by lookupatts) feeds every window; Catalyst reuses the
    sort across lag/row_number/lead.
    """
    order = [F.col(ts).asc(), *[F.col(c).asc() for c in (tiebreak or [])]]
    w = Window.partitionBy(*lookupatts).orderBy(*order)
    cmp = [*trackedatts, ts] if version_on_datechange else trackedatts
    tracked = F.struct(*[F.col(a) for a in cmp])
    changes = (
        events.withColumn("_prev", F.lag(tracked).over(w))
        .filter(F.col("_prev").isNull() | ~tracked.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*lookupatts).orderBy(*order)
    versioned = (
        changes.withColumn(versionatt, F.row_number().over(w2).cast("long"))
        .withColumn(fromatt, F.col(ts))
        .withColumn(toatt, F.lead(F.col(ts)).over(w2))
        .select(*lookupatts, *trackedatts, versionatt, fromatt, toatt)
    )
    return assign_dense_keys(versioned, [*lookupatts, versionatt], key, 0)
