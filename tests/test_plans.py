"""Physical-plan assertions: pin the plans we want at 100 TB scale —
pushdown to the scan, column pruning, broadcasts for small dims, bounded
shuffle counts. A regression here is a scale bug even when results stay
correct."""

import pyspark.sql.functions as F

from tests.conftest import SF_ORACLE
from faxe_spark import plans
from faxe_spark.registry import QUERIES


def test_where_filter_pushes_to_scan(spark):
    df = QUERIES["where_filter"].fn(spark, SF_ORACLE)
    plans.assert_filter_pushed(df, "value")
    plans.assert_filter_pushed(df, "event_type")
    # projection only needs 4 columns -> props must be pruned from the scan
    plans.assert_column_pruned(df, "props")


def test_tpch_q1_prunes_and_single_shuffle(spark):
    df = QUERIES["tpch_q1"].fn(spark, SF_ORACLE)
    plans.assert_column_pruned(df, "l_partkey")
    plans.assert_column_pruned(df, "l_suppkey")
    # partial + final hash agg over one group-key shuffle (AQE may add a
    # read-side coalesce but no second Exchange)
    assert plans.count_exchanges(df) <= 1, plans.formatted_plan(df)


def test_tpch_q3_broadcasts_dims(spark):
    df = QUERIES["tpch_q3"].fn(spark, SF_ORACLE)
    assert plans.count_broadcasts(df) >= 2, "orders+customer should broadcast"
    plans.assert_filter_pushed(df, "c_mktsegment")


def test_asof_join_single_shuffle(spark):
    """The union+last_value as-of join must cost ONE shuffle on the key
    (the whole point of the formulation vs a sort-merge interval join)."""
    df = QUERIES["asof_join_nearest"].fn(spark, SF_ORACLE)
    assert plans.count_exchanges(df) <= 1, plans.formatted_plan(df)


def test_aggregate_multi_split_plan(spark):
    # the distinct+imperative mix is deliberately split into two hash-agg
    # passes joined on the keys (see operators/aggregate.py): expect
    # hash aggregation everywhere (no ObjectHashAggregate-through-expand)
    # and at most 3 shuffles (distinct expand pair + imperative pass);
    # the key join itself broadcasts (tiny agg outputs)
    df = QUERIES["aggregate_multi"].fn(spark, SF_ORACLE)
    assert plans.count_exchanges(df) <= 3, plans.formatted_plan(df)
    assert plans.count_hash_aggregates(df) >= 4  # partial+final x 2 passes


def test_win_time_agg_no_extra_shuffles(spark):
    df = QUERIES["win_time_agg"].fn(spark, SF_ORACLE)
    assert plans.count_exchanges(df) <= 1, plans.formatted_plan(df)


def test_jsonsize_and_fields_to_array(spark):
    """jsonsize (esp_jsonsize.erl:22) and fields_to_array
    (esp_fields_to_array.erl:33) kernels — pure projections, no shuffle."""
    from faxe_spark import operators as ops
    from faxe_spark.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events").limit(10)
    sized = ops.jsonsize(ev.select("event_id", "value"), "jsz")
    rows = sized.collect()
    assert all(r.jsz > 0 for r in rows)

    arr = ops.fields_to_array(ev, ["value", "user_id"], alias="kv")
    first = arr.select("kv").first().kv
    assert [e["key"] for e in first] == ["value", "user_id"]
    assert plans.count_exchanges(arr) == 0


def test_top_k_salted_two_phase_exact(spark):
    """salt=S two-phase top_k must equal the single-phase plan exactly
    (strict order via tiebreak), grouped and global."""
    from faxe_spark.operators import top_k
    from faxe_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    for kw in ({"by": ["event_type"]}, {}):
        plain = top_k(ev, "value", 5, tiebreak="event_id", **kw)
        salted = top_k(ev, "value", 5, tiebreak="event_id", salt=8, **kw)
        p = sorted(map(tuple, plain.select("event_id", "rank").collect()))
        s = sorted(map(tuple, salted.select("event_id", "rank").collect()))
        assert p == s


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketing = the pay-once shuffle: two tables bucketed on the
    join key co-locate, and the per-query Exchange disappears."""
    import pyspark.sql.functions as F

    from faxe_spark.plans import count_exchanges, formatted_plan
    from faxe_spark.tables import load_table, stage_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
        b_ev = stage_bucketed(spark, ev.select("event_id", "ts", "user_id", "value"),
                              "b_events", bucket_by="user_id", buckets=8)
        b_users = stage_bucketed(spark, users, "b_users",
                                 bucket_by="user_id", buckets=8)
        joined = b_ev.join(b_users, "user_id")
        assert count_exchanges(joined) == 0, formatted_plan(joined)

        # the unbucketed plan pays the shuffle every time
        plain = ev.join(users, "user_id")
        assert count_exchanges(plain) >= 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_users")


def test_salted_join_matches_plain(spark):
    import pyspark.sql.functions as F

    from faxe_spark.operators.join import salted_join
    from faxe_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    dim = (ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
           .withColumn("grp", F.upper("event_type")))
    plain = sorted(tuple(r) for r in
                   ev.join(dim, "event_type").select("event_id", "grp", "n").collect())
    salted = sorted(tuple(r) for r in
                    salted_join(ev, dim, "event_type", salt=8)
                    .select("event_id", "grp", "n").collect())
    assert plain and plain == salted


def test_sample_stratified_fractions(spark):
    from faxe_spark.operators.filter import sample_stratified
    from faxe_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = sample_stratified(d, "lang", {"en": 1.0, "de": 0.5, "fr": 0.0, "es": 0.25})
    n = {r.lang: r.n for r in
         out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r.lang: r.n for r in
            d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert n.get("en") == full.get("en")          # fraction 1.0 keeps all
    assert "fr" not in n                           # fraction 0 drops all
    if "de" in full and full["de"] >= 20:
        assert 0.2 <= n.get("de", 0) / full["de"] <= 0.8
    # deterministic for a fixed seed
    again = sample_stratified(d, "lang", {"en": 1.0, "de": 0.5, "fr": 0.0, "es": 0.25})
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in again.collect())


def test_state_salted_lane_equivalence(spark):
    """The skew-proof two-phase state_count_duration (salt=S) must be
    row-for-row identical to the plain single-window lane — run ids,
    counts, and durations all stitch exactly across bucket boundaries."""
    import pyspark.sql.functions as F

    from faxe_spark.operators.state import state_count_duration
    from faxe_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    cond = F.col("value") > 50
    cols = ["event_id", "run_id", "state_count", "state_duration"]
    plain = sorted(tuple(r) for r in
                   state_count_duration(ev, cond, by=["user_id"],
                                        tiebreak="event_id", unit_ms=1000)
                   .select(*cols).collect())
    for s in (2, 7):
        salted = sorted(tuple(r) for r in
                        state_count_duration(ev, cond, by=["user_id"],
                                             tiebreak="event_id",
                                             unit_ms=1000, salt=s)
                        .select(*cols).collect())
        assert plain and salted == plain, f"salt={s} diverges"


def test_state_salted_lane_splits_hot_key(spark):
    """The 100 TB hazard local[32] never shows: ONE key holding 10% of
    all rows. The plain lane's window forces that key into a single
    task; the salted lane's phase-A exchange partitions on
    (key, bucket), so the hot key spreads across `salt` buckets — and
    stays exact (checked against the plain lane on the same skewed
    frame)."""
    import pyspark.sql.functions as F

    from faxe_spark.operators.state import state_count_duration

    n, salt = 40_000, 8
    df = (spark.range(n)
          .withColumn("user_id", F.when(F.col("id") % 10 == 0, F.lit(0))
                      .otherwise(F.col("id") % 97 + 1))
          .withColumn("ts", F.timestamp_millis(1_700_000_000_000 + F.col("id") * 250))
          .withColumn("value", (F.col("id") * 37 % 100).cast("double")))
    cond = F.col("value") > 50
    cols = ["id", "run_id", "state_count", "state_duration"]
    plain = sorted(tuple(r) for r in
                   state_count_duration(df, cond, by=["user_id"], ts_col="ts",
                                        tiebreak="id", unit_ms=1000)
                   .select(*cols).collect())
    salted_df = state_count_duration(df, cond, by=["user_id"], ts_col="ts",
                                     tiebreak="id", unit_ms=1000, salt=salt)
    salted = sorted(tuple(r) for r in salted_df.select(*cols).collect())
    assert salted == plain

    # plan assertion: the phase-A exchange over the BIG table hashes on
    # (user_id, _b) — the hot key spreads over salt buckets instead of
    # collapsing to one task. Bare-user_id exchanges remain in the plan
    # but only over the |keys|- and |keys|x salt-sized side tables
    # (min/max probe + boundary stitching), which is the point of the
    # two-phase design: the hot key is only ever windowed in slices.
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    import re
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any(("user_id" in p) and ("_b" in p) for p in parts), parts


def test_state_salted_lane_null_states_and_ts(spark):
    """Round-4 review fixes: NULL condition runs crossing a bucket
    boundary continue (eqNullSafe, like the plain lane's detector),
    and NULL-ts rows land in bucket 0 (plain orderBy sorts nulls
    first) — equivalence must hold on a frame full of both."""
    import pyspark.sql.functions as F

    from faxe_spark.operators.state import state_count_duration

    rows = []
    for uid in range(4):
        for i in range(40):
            # value NULL every 3rd row -> condition NULL runs; a NULL
            # ts sprinkled per user
            ts = None if i == 7 else 1_700_000_000_000 + i * 1000
            val = None if i % 3 == 0 else float((i * 13) % 100)
            rows.append((uid * 1000 + i, uid, ts, val))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ms long, value double"
    ).withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")
    cond = F.col("value") > 50
    cols = ["event_id", "run_id", "state_count", "state_duration"]

    def run(salt):
        return sorted(tuple(r) for r in state_count_duration(
            df, cond, by=["user_id"], tiebreak="event_id",
            unit_ms=1000, salt=salt).select(*cols).collect())

    plain = run(None)
    for s in (2, 5, 16):
        assert run(s) == plain, f"salt={s} diverges on NULL states/ts"


def test_bucketed_events_eliminate_timeseries_shuffle(spark):
    """The time-series family's ONE shuffle is the per-key window
    partition — over an events table bucketed by the series key it
    disappears entirely (the pay-once-at-ingest story at 100 TB: a
    deployment that buckets its hypertable by sensor runs every
    subsequence/motif/discord window build shuffle-free)."""
    from faxe_spark.operators import timeseries as ts
    from faxe_spark.plans import count_exchanges, formatted_plan
    from faxe_spark.tables import load_table, stage_bucketed

    try:
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        b = stage_bucketed(
            spark, ev.select("event_id", "ts", "user_id", "value"),
            "b_ev_ts", bucket_by="user_id", buckets=8)
        out = ts.subsequences(b, key_col="user_id", ts_col="ts",
                              value_col="value", m=4, tiebreak="event_id")
        assert count_exchanges(out) == 0, formatted_plan(out)
        plain = ts.subsequences(ev, key_col="user_id", ts_col="ts",
                                value_col="value", m=4,
                                tiebreak="event_id")
        assert count_exchanges(plain) == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS b_ev_ts")
