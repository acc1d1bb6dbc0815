"""Offset-paginated REST ingestion (reference example
rest/RESTSimple.scala:30-43 against /finite-pagination): fixed 3-element
pages; partial pages re-fetched with the seen prefix dropped."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import PaginatedRestSource

DATA = list(range(1, 11))


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        page = int(self.path.split("page=")[1])
        chunk = DATA[page * 3 : page * 3 + 3]
        body = json.dumps(chunk).encode()
        self.send_response(200)
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


srv = HTTPServer(("127.0.0.1", 0), Handler)
threading.Thread(target=srv.serve_forever, daemon=True).start()

spark = session("rest-simple")
ws = workspace()

source = PaginatedRestSource(
    base_url=f"http://127.0.0.1:{srv.server_port}/finite-pagination",
    page_decoder=lambda body: ([(v,) for v in json.loads(body)], None),
    schema="value int",
    fixed_page_element_count=3,  # RESTSimple.scala's partial-page dedup driver
)

sink = MemorySink()
Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0).run(spark, max_iterations=5)
show(sink)
assert [r.value for r in sink.rows] == DATA
srv.shutdown()
