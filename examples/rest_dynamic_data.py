"""Periodic re-scan of mutable REST data (reference example
rest/RESTDynamicData.scala with /dynamic-pagination): the PeriodicOffset
cursor pages through, then resets to page 0 each period, re-ingesting the
(possibly changed) window; downstream dedup is by record key."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import PaginatedRestSource

STATE = {"data": ["a", "b", "c", "d"]}


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        page = int(self.path.split("page=")[1])
        chunk = STATE["data"][page * 2 : page * 2 + 2]
        self.send_response(200)
        self.end_headers()
        self.wfile.write(json.dumps(chunk).encode())

    def log_message(self, *a):
        pass


srv = HTTPServer(("127.0.0.1", 0), Handler)
threading.Thread(target=srv.serve_forever, daemon=True).start()

spark = session("rest-dynamic-data")
ws = workspace()

clock = {"now": 1000.0}
source = PaginatedRestSource(
    base_url=f"http://127.0.0.1:{srv.server_port}/dynamic-pagination",
    page_decoder=lambda body: ([(v,) for v in json.loads(body)], None),
    schema="value string",
    periodic=True,
    min_period_s=5.0,
    max_period_s=60.0,
    now_fn=lambda: clock["now"],
)

sink = MemorySink()
pipe = Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0)
pipe.run(spark, max_iterations=3)  # pages 0,1 then empty
print("first period:", [r.value for r in sink.rows])

# data mutates in place; period expires → cursor resets to page 0
STATE["data"] = ["a", "B", "c", "D"]
clock["now"] += 120.0
pipe2 = Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0)
pipe2.run(spark, max_iterations=3)
show(sink)
assert "B" in {r.value for r in sink.rows}, "re-scan picked up the mutation"
srv.shutdown()
