"""Numeric-keyed object cursor (reference example s3/S3Generalized.scala:34-82):
keys `myFolder2/myPrefix{N}`, state = last N, next = min N' > N — numeric,
not lexicographic (10 sorts after 9)."""

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import LocalFSLister, ObjectCursorSource

spark = session("s3-generalized")
ws = workspace()

folder = ws / "myBucket" / "myFolder2"
folder.mkdir(parents=True)
for n in range(1, 11):
    (folder / f"myPrefix{n}").write_text(f"payload-{n}\n")

source = ObjectCursorSource(
    lister=LocalFSLister(str(ws / "myBucket")),
    prefix="myFolder2/myPrefix",
    cursor_kind="number",
)

sink = MemorySink()
Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0).run(spark, max_iterations=12)
show(sink)
assert [r.value for r in sink.rows] == [f"payload-{n}" for n in range(1, 11)]
