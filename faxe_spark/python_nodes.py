"""Built-in example PythonNodes — the reference's user-callback classes
(reference/python/*.py: double, callback, python_time, filter,
less_than) re-implemented on this repo's SDK contract (faxe_spark.udf
.PythonNode), so DFS scripts invoking `@double()` etc. compile through
the mapInPandas adapter exactly like a user's own class would.

Each class declares `added_fields(opts)` — the typed columns it appends
— so the DFS compiler can derive the output schema mechanically.
"""

from __future__ import annotations

from faxe_spark.udf import PythonNode


class Double(PythonNode):
    """reference/python/double.py: as = field * 2."""

    @classmethod
    def options(cls):
        return [("field", None), ("as", None)]

    @classmethod
    def added_fields(cls, opts):
        return [(opts["as"], "double")]

    def handle_point(self, point):
        v = point.get(self.field)
        point[getattr(self, "as")] = None if v is None else float(v) * 2
        return point


class Callback(PythonNode):
    """reference/python/callback.py: no-op passthrough (the smoke-test
    callback); accepts the corpus's stop_on_exit/as options."""

    @classmethod
    def options(cls):
        return [("stop_on_exit", False), ("as", None)]

    @classmethod
    def added_fields(cls, opts):
        return []

    def handle_point(self, point):
        return point


class Mirror(Callback):
    """passthrough used by lambda_test.dfs (@mirror)."""


class PythonTime(PythonNode):
    """reference/python/python_time.py: adds `python.time` = now (ms)."""

    @classmethod
    def options(cls):
        return []

    @classmethod
    def added_fields(cls, opts):
        return [("python.time", "long")]

    def handle_point(self, point):
        import time

        point["python.time"] = int(time.time() * 1000)
        return point


class Filter(PythonNode):
    """reference/python/filter.py shape: drop points where `field` is
    falsy (None/0/'')."""

    @classmethod
    def options(cls):
        return [("field", None)]

    @classmethod
    def added_fields(cls, opts):
        return []

    def handle_point(self, point):
        v = point.get(self.field)
        return None if not v else point


class LessThan(PythonNode):
    """reference/python/less_than.py shape: keep points where
    field < threshold."""

    @classmethod
    def options(cls):
        return [("field", None), ("threshold", 0.0)]

    @classmethod
    def added_fields(cls, opts):
        return []

    def handle_point(self, point):
        v = point.get(self.field)
        return point if v is not None and float(v) < float(self.threshold) else None


class BatchStart(Callback):
    """passthrough for dev/python2.dfs's @batch_start — the class ships
    in no reference python/ dir (the script predates its removal), so a
    no-op callback keeps the corpus script compilable."""

    @classmethod
    def options(cls):
        return [("field", None), ("as", None)]


class DataDemo(Callback):
    """passthrough for the corpus's commented @data_demo examples."""


BUILTIN_PYTHON_NODES = {
    "double": Double,
    "callback": Callback,
    "mirror": Mirror,
    "python_time": PythonTime,
    "filter": Filter,
    "less_than": LessThan,
    "batch_start": BatchStart,
    "data_demo": DataDemo,
}
