"""REST upload sink tests against a local in-process HTTP server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from tests.conftest import SF_DIR
from whylogs_java_spark.sources.protobuf import decode_dataset_profile
from whylogs_java_spark.sources.rest import upload_message, upload_profiles


class _Recorder(BaseHTTPRequestHandler):
    store: list  # (method, path, body) — class attr set per server
    fail_first: int

    def _read(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n)

    def do_PUT(self):
        body = self._read()
        cls = type(self)
        if cls.fail_first > 0:
            cls.fail_first -= 1
            self.send_response(500)
            self.end_headers()
            return
        cls.store.append(("PUT", self.path, body))
        self.send_response(200)
        self.end_headers()

    def do_POST(self):
        body = self._read()
        cls = type(self)
        if self.path == "/logAsync":
            cls.store.append(("POST", self.path, body))
            resp = json.dumps(
                {"uploadUrl": f"http://127.0.0.1:{self.server.server_port}/upload"}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)
        else:
            self.do_PUT()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture
def http_server():
    handler = type("H", (_Recorder,), {"store": [], "fail_first": 0})
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, handler
    srv.shutdown()


def test_upload_message_direct_and_retry(http_server):
    srv, handler = http_server
    url = f"http://127.0.0.1:{srv.server_port}/profiles"
    upload_message(b"hello-profile", url, backoff_s=0.01)
    assert handler.store == [("PUT", "/profiles", b"hello-profile")]

    # two 500s then success — within the 3-try envelope
    handler.store.clear()
    handler.fail_first = 2
    upload_message(b"retry-me", url, backoff_s=0.01)
    assert handler.store == [("PUT", "/profiles", b"retry-me")]

    # three failures exhaust the retries
    handler.store.clear()
    handler.fail_first = 3
    with pytest.raises(Exception):
        upload_message(b"nope", url, backoff_s=0.01)


def test_upload_message_presigned_flow(http_server):
    srv, handler = http_server
    upload_message(
        b"presigned-bytes",
        f"http://127.0.0.1:{srv.server_port}/logAsync",
        presigned=True,
        backoff_s=0.01,
    )
    assert [m for m, _, _ in handler.store] == ["POST", "PUT"]
    assert handler.store[1] == ("PUT", "/upload", b"presigned-bytes")


def test_upload_profiles_from_executors(spark, http_server):
    srv, handler = http_server
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = upload_profiles(
        li,
        f"http://127.0.0.1:{srv.server_port}/profiles",
        group_by=["l_returnflag"],
        include_sketches=False,
        frequent_items_k=0,
        backoff_s=0.01,
    )
    assert n == 3  # A / N / R
    assert len(handler.store) == 3
    tags = set()
    for _, _, body in handler.store:
        prof = decode_dataset_profile(body)
        tags.add(prof["properties"]["tags"]["whylogs.tag.l_returnflag"])
        assert prof["columns"]["l_quantity"]["count"] > 0
    assert tags == {"A", "N", "R"}
