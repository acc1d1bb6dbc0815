"""Custom state fold over query results (reference example
db/DatabaseGeneralized.scala:34-44): state is not a time window but a
user-defined cursor — here "last id ingested", advanced from the batch."""

from pyspark.sql import functions as F

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.state import fingerprint

spark = session("database-generalized")
ws = workspace()

spark.createDataFrame(
    [(i, f"name-{i}") for i in range(100)], "id long, name string"
).write.parquet(str(ws / "rows"))


class KeysetPaginatedSource:
    """Keyset pagination: WHERE id > :last ORDER BY id LIMIT :page — the
    generalized tamer Setup: any (initial state, iteration, fold) triple."""

    page = 30

    def initial_state(self):
        return {"last_id": -1}

    def state_fingerprint(self):
        return fingerprint("keyset-example", self.page, -1)

    def iteration(self, state, spark_):
        batch = (
            spark_.read.parquet(str(ws / "rows"))
            .filter(F.col("id") > state["last_id"])
            .orderBy("id")
            .limit(self.page)
        )
        mx = batch.agg(F.max("id")).collect()[0][0]
        if mx is None:
            return None, state  # drained: no progress, engine polls
        return batch, {"last_id": int(mx)}


sink = MemorySink()
Pipeline(KeysetPaginatedSource(), sink, str(ws / "cp"), poll_interval_s=0.0).run(
    spark, max_iterations=6
)
show(sink)
assert [r.id for r in sink.rows] == list(range(100))
