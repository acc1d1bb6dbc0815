"""Time-keyed object ingestion (reference example s3/S3Simple.scala:35-42):
objects named `myPrefix<instant>`, consumed in strict timestamp order, one
per iteration; content decoded as UTF-8 lines."""

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import LocalFSLister, ObjectCursorSource

spark = session("s3-simple")
ws = workspace()

# fixture: the reference MinIO bucket shape (s3/local/minio/data/myBucket)
folder = ws / "myBucket" / "myFolder"
folder.mkdir(parents=True)
for i in range(1, 11):
    (folder / f"myPrefix2021-01-01T00.{i:02d}.00.log").write_text(
        f"event-{i}-a\nevent-{i}-b\n"
    )

source = ObjectCursorSource(
    lister=LocalFSLister(str(ws / "myBucket")),  # S3Lister(bucket) in production
    prefix="myFolder/myPrefix",
    cursor_kind="instant",
    fmt="%Y-%m-%dT%H.%M.%S",
)

sink = MemorySink()
Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0).run(spark, max_iterations=12)
show(sink)
assert len(sink.rows) == 20, "10 objects x 2 lines, in order, exactly once"
