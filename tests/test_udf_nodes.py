"""@PythonClass node parity tests (SURVEY §2.13; faxe.py SDK contract)."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE
from faxe_spark.tables import load_table
from faxe_spark.udf import PythonNode, apply_node, apply_node_keyed


class Scaler(PythonNode):
    """Doubles a field — the reference's classic example node."""

    @classmethod
    def options(cls):
        return [("factor", 2.0), ("field", "value")]

    def handle_point(self, point):
        point = dict(point)
        point["scaled"] = point[self.field] * self.factor
        return point


class EWMA(PythonNode):
    """Stateful-within-key smoothing (needs ordered per-key iteration —
    what apply_node_keyed provides)."""

    @classmethod
    def options(cls):
        return [("alpha", 0.5)]

    def init(self, **opts):
        super().init(**opts)
        self.state = None

    def handle_point(self, point):
        v = point["value"]
        self.state = v if self.state is None else self.alpha * v + (1 - self.alpha) * self.state
        return {"user_id": point["user_id"], "event_id": point["event_id"],
                "ewma": self.state}


def test_apply_node_scaler(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    out = apply_node(ev, Scaler, "event_id long, value double, scaled double",
                     factor=3.0)
    rows = {r.event_id: r for r in out.collect()}
    src = {r.event_id: r.value for r in ev.collect()}
    assert len(rows) == len(src)
    for eid, v in src.items():
        assert rows[eid].scaled == pytest.approx(v * 3.0)


def test_apply_node_filtering(spark):
    class Dropper(PythonNode):
        def handle_point(self, point):
            return point if point["value"] > 100 else None

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    out = apply_node(ev, Dropper, "event_id long, value double")
    want = ev.filter(F.col("value") > 100).count()
    assert out.count() == want


def test_unknown_option_rejected(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    with pytest.raises(ValueError, match="Did you mean 'factor'"):
        apply_node(ev, Scaler, "event_id long, value double, scaled double",
                   facter=3.0)


def test_apply_node_keyed_ewma_ordered(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "value")
    out = apply_node_keyed(ev, EWMA, "user_id long, event_id long, ewma double",
                           by=["user_id"], sort_within_key="ts", alpha=0.5)
    got = {r.event_id: r.ewma for r in out.collect()}
    # python-side golden for one key
    one = (ev.filter(F.col("user_id") == 1).orderBy("ts")
           .select("event_id", "value").collect())
    state = None
    for r in one:
        state = r.value if state is None else 0.5 * r.value + 0.5 * state
        assert got[r.event_id] == pytest.approx(state)


def test_apply_node_stateful_persists_across_batches(spark, tmp_path):
    """persist_state parity (SDK faxe.py:140-207): a counting node's
    state survives micro-batches through Spark's state store — the
    second batch resumes from the first batch's persisted count."""
    import pyspark.sql.functions as F

    from faxe_spark.udf import PythonNode, apply_node_stateful

    class Counter(PythonNode):
        def init(self, **opts):
            super().init(**opts)
            self.n = self.get_state_value("n", 0)

        def state_mode(self):
            return self.STATE_MODE_HANDLE

        def handle_point(self, point):
            self.n += 1
            return {"key": point["key"], "running_n": self.n}

    src = str(tmp_path / "stateful_src")
    import os
    os.makedirs(src)
    spark.createDataFrame([(1, 10.0)], "key bigint, v double") \
        .repartition(1).write.mode("overwrite").parquet(src + "/b1")

    schema = spark.read.parquet(src + "/b1").schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1) \
        .parquet(src + "/*")
    out = apply_node_stateful(stream, Counter, "key long, running_n long",
                              by=["key"], ts_col="v")
    q = (out.writeStream.format("memory").queryName("stateful_node")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        import time as _t
        deadline = _t.time() + 30
        while _t.time() < deadline:
            if spark.sql("SELECT count(*) c FROM stateful_node").collect()[0].c >= 1:
                break
            _t.sleep(0.5)
        # second batch arrives later -> must resume the count at 2
        spark.createDataFrame([(1, 20.0)], "key bigint, v double") \
            .repartition(1).write.mode("overwrite").parquet(src + "/b2")
        deadline = _t.time() + 45
        got = []
        while _t.time() < deadline:
            got = sorted(r.running_n for r in
                         spark.sql("SELECT * FROM stateful_node").collect())
            if len(got) >= 2:
                break
            _t.sleep(0.5)
        assert got == [1, 2], f"state did not persist across batches: {got}"
    finally:
        q.stop()


# -- r11 review pins: the Arrow point boundary ------------------------------

class Probe(PythonNode):
    """Records exactly what a node sees at the boundary."""

    @classmethod
    def options(cls):
        return []

    def handle_point(self, point):
        return {"event_id": point.get("event_id"),
                "has_v": "v" in point,
                "v_type": type(point.get("v")).__name__,
                "id_type": type(point.get("event_id")).__name__,
                "arr_type": type(point.get("arr")).__name__}


def test_points_carry_reference_value_model(spark):
    """r11 review: flowdata maps carry no undefined entries and erlport
    delivers native types — so NULL/NaN columns must be ABSENT keys and
    numpy scalars must cross as plain Python values (exact-type checks
    like the SDK's format_state filter misfire on np.int64; NaN passed
    `is None` guards and poisoned arithmetic). Array cells arrive as
    lists."""
    df = spark.createDataFrame(
        [(1, 2.5, [1.0, 2.0]), (2, None, None)],
        "event_id long, v double, arr array<double>")
    out = apply_node(
        df, Probe,
        "event_id long, has_v boolean, v_type string, "
        "id_type string, arr_type string")
    rows = {r.event_id: r for r in out.collect()}
    assert rows[1].has_v and rows[1].v_type == "float"
    assert rows[1].id_type == "int" and rows[1].arr_type == "list"
    assert not rows[2].has_v and rows[2].v_type == "NoneType"


def test_numpy_state_survives_format_state(spark, tmp_path):
    """r11 review: a node accumulating point VALUES (pre-fix: np.float64
    from Arrow) into an attr persisted via state_mode='handle' silently
    lost it — format_state's exact-type filter excluded numpy types, so
    every batch restarted from zero. Points now cross as native floats
    and the running sum survives the micro-batch boundary."""
    import os
    import time as _t

    from faxe_spark.udf import PythonNode, apply_node_stateful

    class Summer(PythonNode):
        def init(self, **opts):
            super().init(**opts)
            self.total = self.get_state_value("total", 0.0)

        def state_mode(self):
            return self.STATE_MODE_HANDLE

        def handle_point(self, point):
            self.total += point.get("v", 0.0)
            return {"key": point["key"], "running_total": self.total,
                    "state_type": type(self.total).__name__}

    src = str(tmp_path / "sum_src")
    os.makedirs(src)
    spark.createDataFrame([(1, 10.0)], "key bigint, v double") \
        .repartition(1).write.parquet(src + "/b1")
    schema = spark.read.parquet(src + "/b1").schema
    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    out = apply_node_stateful(
        stream, Summer, "key long, running_total double, state_type string",
        by=["key"], ts_col="v")
    q = (out.writeStream.format("memory").queryName("np_state")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = _t.time() + 30
        while _t.time() < deadline:
            if spark.sql("SELECT count(*) c FROM np_state").collect()[0].c:
                break
            _t.sleep(0.5)
        spark.createDataFrame([(1, 5.0)], "key bigint, v double") \
            .repartition(1).write.parquet(src + "/b2")
        deadline = _t.time() + 45
        got = []
        while _t.time() < deadline and len(got) < 2:
            got = sorted(
                (r.running_total, r.state_type) for r in
                spark.sql("SELECT * FROM np_state").collect())
            _t.sleep(0.5)
        assert got == [(10.0, "float"), (15.0, "float")], got
    finally:
        q.stop()


def test_all_null_column_passthrough_keeps_schema(spark):
    """r11 review follow-on: with NULL columns absent from points, a
    passthrough node over a batch whose column is ENTIRELY NULL emits
    frames missing that column — the adapter reindexes to the declared
    schema instead of failing the Arrow conversion."""
    class Pass(PythonNode):
        @classmethod
        def options(cls):
            return []

        def handle_point(self, point):
            return point

    df = spark.createDataFrame([(1, None), (2, None)],
                               "event_id long, v double")
    out = apply_node(df, Pass, "event_id long, v double")
    rows = sorted((r.event_id, r.v) for r in out.collect())
    assert rows == [(1, None), (2, None)]
