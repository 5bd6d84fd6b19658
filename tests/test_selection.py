"""Data-selection operators: quantile_bucket (CCNet-style NTILE tiers)
and dsir_importance (DSIR hashed-n-gram importance weights)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pygrametl_spark.functions import sampling as sp
from pygrametl_spark.functions import text as tx


def _duck_ntile(rows, k):
    """(id, grp, score) -> {id: bucket} via DuckDB NTILE."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, grp VARCHAR, score BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return dict(
        con.execute(
            f"SELECT id, NTILE({k}) OVER "
            "(PARTITION BY grp ORDER BY score, id) FROM t"
        ).fetchall()
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # id
            st.sampled_from(["a", "b", "c"]),         # group
            st.integers(min_value=0, max_value=9),    # score (ties likely)
        ),
        min_size=1, max_size=60,
        unique_by=lambda t: t[0],
    ),
    k=st.sampled_from([1, 2, 3, 4, 7]),
)
def test_quantile_bucket_paths_match_duckdb_ntile(spark, monkeypatch, rows, k):
    """For ANY grouped scored relation: the window path, the two-phase
    distributed path, and DuckDB NTILE agree bucket-for-bucket."""
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    want = _duck_ntile(rows, k)

    small = sp.quantile_bucket(df, "id", "score", k, by="grp")
    got_small = {r["id"]: r["bucket"] for r in small.collect()}
    assert got_small == want

    monkeypatch.setattr(sp, "_QB_WINDOW_THRESHOLD", 0)
    big = sp.quantile_bucket(df, "id", "score", k, by="grp")
    got_big = {r["id"]: r["bucket"] for r in big.collect()}
    assert got_big == want
    assert set(big.columns) == set(df.columns) | {"bucket"}


def test_quantile_bucket_ungrouped_and_edges(spark, monkeypatch):
    """by=None is global NTILE; k > n puts row i in bucket i; both
    paths agree; k < 1 raises."""
    rows = [(i, None, i % 4) for i in range(10)]
    df = spark.createDataFrame(
        [(i, s) for i, _, s in rows], "id long, score long"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, score BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, s) for i, _, s in rows])
    for k in (3, 25):
        want = dict(
            con.execute(
                f"SELECT id, NTILE({k}) OVER (ORDER BY score, id) FROM t"
            ).fetchall()
        )
        got_w = {r["id"]: r["bucket"]
                 for r in sp.quantile_bucket(df, "id", "score", k).collect()}
        assert got_w == want
        monkeypatch.setattr(sp, "_QB_WINDOW_THRESHOLD", 0)
        got_d = {r["id"]: r["bucket"]
                 for r in sp.quantile_bucket(df, "id", "score", k).collect()}
        monkeypatch.setattr(sp, "_QB_WINDOW_THRESHOLD", 1_000_000)
        assert got_d == want
    with pytest.raises(ValueError):
        sp.quantile_bucket(df, "id", "score", 0)


def test_dsir_importance_ranks_targetlike_docs_higher(spark):
    """Docs sharing the target's vocabulary must outscore disjoint-
    vocabulary docs; output shape and NULL handling hold."""
    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "quick brown fox and lazy dog"),
            (3, "zzz qqq www eee rrr ttt"),
            (4, "aaa bbb ccc ddd"),
        ],
        "doc_id long, text string",
    )
    out = tx.dsir_importance(raw, target, dim=256)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {"doc_id", "n_feats", "dsir_units", "dsir_score"}
    targetlike = min(rows[1]["dsir_score"], rows[2]["dsir_score"])
    alien = max(rows[3]["dsir_score"], rows[4]["dsir_score"])
    assert targetlike > alien
    assert rows[1]["n_feats"] == 11  # 6 unigrams + 5 bigrams


def test_dsir_importance_matches_duckdb_oracle(spark):
    """Bit-exact DuckDB replay of the hashed-feature counts, smoothed
    log-ratio micro-nat weights, and per-doc integer sums."""
    docs = [
        (1, "the cat sat on the mat"),
        (2, "dogs chase cats"),
        (3, "le chat est noir"),
        (4, "the dog sat"),
        (5, "completely unrelated words here"),
    ]
    tgt_pred = "doc_id % 2 = 0"
    raw = spark.createDataFrame(docs, "doc_id long, text string")
    out = tx.dsir_importance(raw, raw.filter(tgt_pred), dim=64)
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_units"], r["dsir_score"])
        for r in out.collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    h32 = "CAST(('0x' || substr(md5({x}),1,8)) AS BIGINT)"
    sql = f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
           FROM documents),
uni AS (SELECT doc_id, unnest(toks) AS f FROM t),
bi AS (
  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS f
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) _
),
feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
b AS (SELECT doc_id, {h32.format(x='f')} % 64 AS bkt FROM feats),
src AS (SELECT bkt, COUNT(*) AS c FROM b GROUP BY bkt),
tgt AS (SELECT bkt, COUNT(*) AS c FROM b WHERE {tgt_pred} GROUP BY bkt),
tot AS (SELECT (SELECT SUM(c) FROM src) AS s_tot,
               (SELECT SUM(c) FROM tgt) AS t_tot),
w AS (
  SELECT src.bkt,
         CAST(ROUND((ln((COALESCE(tgt.c,0) + 1.0) / (tot.t_tot + 64.0))
                   - ln((src.c + 1.0) / (tot.s_tot + 64.0))) * 1e6, 0)
              AS BIGINT) AS w
  FROM src LEFT JOIN tgt USING (bkt), tot
),
agg AS (
  SELECT b.doc_id, COUNT(*) AS n_feats, CAST(SUM(w.w) AS BIGINT) AS units
  FROM b JOIN w USING (bkt) GROUP BY b.doc_id
)
SELECT doc_id, CAST(n_feats AS BIGINT), units,
       ROUND(units / (n_feats * 1e6), 4)
FROM agg
"""
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == want
