"""JDBC tumbling-window ingestion (reference example
db/DatabaseSimple.scala:35-39): pull `users` rows window by window, 5-day
step, window restarting at the max modified_at seen."""

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import JdbcTumblingSource

spark = session("database-simple")
ws = workspace()

# fixture: the reference's 1000-row users table shape (db/local/data/users.sql)
t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
rows = [(f"{i:032x}", f"user-{i}", None if i % 3 else "note", t0 + timedelta(hours=8 * i)) for i in range(1000)]
spark.createDataFrame(
    rows, "id string, name string, description string, modified_at timestamp"
).write.parquet(str(ws / "users"))


def read_sql(spark_, sql):
    # stand-in for the database: honor the rendered window predicate.
    # against a live DB, drop this seam and pass url/properties instead.
    frm, to = sql.split("'")[1], sql.split("'")[3]
    return spark_.read.parquet(str(ws / "users")).filter(
        (F.col("modified_at") > frm) & (F.col("modified_at") <= to)
    )


source = JdbcTumblingSource(
    url="jdbc:postgresql://localhost:5432/db",
    query_template=(
        "SELECT id, name, description, modified_at FROM users "
        "WHERE modified_at > '{from_ts}' AND modified_at <= '{to_ts}'"
    ),
    ts_column="modified_at",
    from_ts=t0 - timedelta(seconds=1),
    step=timedelta(days=5),  # DatabaseSimple.scala:38
    now_fn=lambda: t0 + timedelta(days=400),
    read_sql=read_sql,
)

sink = MemorySink()
Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0).run(spark, max_iterations=80)
show(sink)
assert len({r.id for r in sink.rows}) == 1000, "every row exactly once"
print("final window:", Pipeline(source, sink, str(ws / 'cp'))._store().load().state)
