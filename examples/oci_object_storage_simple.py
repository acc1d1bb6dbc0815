"""OCI object-storage ingestion (reference example
oci/objectstorage/OciObjectStorageSimple.scala:33-46): startAfter-keyed
listing with an ObjectsCursor. OCI exposes an S3-compatible endpoint, so the
production lister is `S3Lister(bucket, endpoint_url="https://<ns>.compat.
objectstorage.<region>.oraclecloud.com")`; cursor logic is identical."""

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import LocalFSLister, ObjectCursorSource

spark = session("oci-object-storage-simple")
ws = workspace()

folder = ws / "ociBucket" / "exports"
folder.mkdir(parents=True)
for n in range(1, 6):
    (folder / f"part{n}").write_text(f"oci-record-{n}\n")

source = ObjectCursorSource(
    lister=LocalFSLister(str(ws / "ociBucket")),
    prefix="exports/part",
    cursor_kind="number",
)

sink = MemorySink()
Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0).run(spark, max_iterations=7)
show(sink)
assert len(sink.rows) == 5
