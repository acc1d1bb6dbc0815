"""Custom/bearer auth with token rotation (reference example
rest/RESTCustomAuth.scala + the rotating-token fixture RESTServer.scala:48,
64-69): tokens expire server-side; a data request with a stale token gets
403, the strategy refreshes once and retries."""

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer

from _common import session, show, workspace
from tamer_spark.engine import Pipeline
from tamer_spark.sinks import MemorySink
from tamer_spark.sources import BearerAuth, PaginatedRestSource

STATE = {"gen": 0}


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path.startswith("/auth"):
            STATE["gen"] += 1
            self.send_response(200)
            self.end_headers()
            self.wfile.write(f"token-{STATE['gen']}".encode())
            return
        if self.headers.get("Authorization") != f"Bearer token-{STATE['gen']}":
            self.send_response(403)
            self.end_headers()
            return
        page = int(self.path.split("page=")[1])
        data = [page] if page < 4 else []
        self.send_response(200)
        self.end_headers()
        self.wfile.write(json.dumps(data).encode())

    def log_message(self, *a):
        pass


srv = HTTPServer(("127.0.0.1", 0), Handler)
threading.Thread(target=srv.serve_forever, daemon=True).start()
base = f"http://127.0.0.1:{srv.server_port}"

spark = session("rest-custom-auth")
ws = workspace()


def fetch_token() -> str:
    with urllib.request.urlopen(f"{base}/auth") as r:
        return r.read().decode()


source = PaginatedRestSource(
    base_url=f"{base}/data",
    page_decoder=lambda body: ([(v,) for v in json.loads(body)], None),
    schema="value int",
    auth=BearerAuth(fetch_token),
)

sink = MemorySink()
pipe = Pipeline(source, sink, str(ws / "cp"), poll_interval_s=0.0)
pipe.run(spark, max_iterations=2)
STATE["gen"] += 1  # rotate the token mid-run: next fetch 403s, then refreshes
pipe.run(spark, max_iterations=2)
show(sink)
assert [r.value for r in sink.rows] == [0, 1, 2, 3]
srv.shutdown()
