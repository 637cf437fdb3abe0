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
