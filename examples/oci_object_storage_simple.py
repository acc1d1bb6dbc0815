"""OCI object-storage ingestion (reference example
oci/objectstorage/OciObjectStorageSimple.scala:33-46): the ObjectsCursor
state machine — list with startAfter, process the object discovered last
iteration, fold the next discovered name into the state.

Production client: OCI exposes an S3-compatible endpoint, so use
`S3Lister(bucket, endpoint_url=oci_s3_compat_endpoint(namespace, region))`;
the state machine is identical over any Lister."""

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import LocalFSLister, OciObjectStorageSource

spark = session("oci-object-storage-simple")
ws = workspace()

folder = ws / "ociBucket" / "exports"
folder.mkdir(parents=True)
for n in range(1, 6):
    (folder / f"part{n}").write_text(f"oci-record-{n}\n")

source = OciObjectStorageSource(
    lister=LocalFSLister(str(ws / "ociBucket")),
    namespace="mytenancy",
    bucket="ociBucket",
    prefix="exports/part",
)

sink = MemorySink()
# 5 objects + 1 discovery-only first iteration + idle tail
Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0).run(spark, max_iterations=8)
show(sink)
assert len(sink.rows) == 5
