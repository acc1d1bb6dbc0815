"""Basic-auth REST ingestion (reference example rest/RESTBasicAuth.scala):
the Authentication strategy injects the Authorization header; the server
rejects unauthenticated requests."""

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import BasicAuth, PaginatedRestSource

EXPECTED = "Basic " + base64.b64encode(b"user:pass").decode()


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.headers.get("Authorization") != EXPECTED:
            self.send_response(401)
            self.end_headers()
            return
        page = int(self.path.split("page=")[1])
        data = [{"rubbish": "x", "data": str(page * 2 + i)} for i in range(2)] if page < 3 else []
        self.send_response(200)
        self.end_headers()
        self.wfile.write(json.dumps(data).encode())

    def log_message(self, *a):
        pass


srv = HTTPServer(("127.0.0.1", 0), Handler)
threading.Thread(target=srv.serve_forever, daemon=True).start()

spark = session("rest-basic-auth")
ws = workspace()

source = PaginatedRestSource(
    base_url=f"http://127.0.0.1:{srv.server_port}/auth-request-form",
    page_decoder=lambda body: ([(int(d["data"]),) for d in json.loads(body)], None),
    schema="data int",
    auth=BasicAuth("user", "pass"),
)

sink = MemorySink()
Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0).run(spark, max_iterations=4)
show(sink)
assert [r.data for r in sink.rows] == list(range(6))
srv.shutdown()
