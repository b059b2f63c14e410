"""Socket-level HTTP ingestion e2e (S1-S3 parity with the reference's
servlet-backed fetch, `HttpClientUtils.scala:24-75` /
`PipelineServlet.scala:8-55`): a real loopback `http.server` serves
JSON; `fetch_to_stage` lands it in the stage; the stage-stream tail
reads it exactly once. No network egress — 127.0.0.1 only.

Also pins the retry policy: 4xx is a hard failure re-raised
immediately (no backoff), 5xx/connection errors retry with backoff.
"""

import http.server
import json
import threading
import time
import urllib.error

import pytest

from techtalk_data_pipeline_snowpark_ray.sources import http_fetch
from techtalk_data_pipeline_snowpark_ray.sources.staged_json import (
    list_staged_files, read_staged_json)

#: the typed rows the pipeline should end up with
RECORDS = [{"event_id": i, "user_id": i % 3, "event_type": "view",
            "value": round(1.5 * i, 2),
            "ts": f"2026-01-02T03:04:{i:02d}.000000"} for i in range(9)]
#: what the REST endpoint serves: the reference's envelope shape — a
#: JSON array of {n, payload} records, payload a JSON-array string
#: (PipelineServlet.scala:8-55); fetch_to_stage lands one NDJSON line
#: per record and read_staged_json explodes + projects the payloads
PAYLOAD = [{"n": 4, "payload": json.dumps(RECORDS[:4])},
           {"n": 5, "payload": json.dumps(RECORDS[4:])}]


class _Handler(http.server.BaseHTTPRequestHandler):
    """Deterministic loopback endpoints:
      /events/<n>   -> 200, JSON array payload
      /missing      -> 404
      /flaky        -> 500 twice, then 200 (per-server counter)
    """

    def do_GET(self):  # noqa: N802 -- BaseHTTPRequestHandler API
        self.server.calls.append(self.path)
        if self.path.startswith("/events/"):
            body = json.dumps(PAYLOAD).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path.startswith("/flaky"):
            self.server.flaky_failures -= 1
            if self.server.flaky_failures >= 0:
                self.send_error(500, "transient")
            else:
                body = b'{"ok": true}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        else:
            self.send_error(404, "no such resource")

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def loopback():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.calls = []
    srv.flaky_failures = 2
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_loopback_fetch_to_stage_to_dataset_e2e(loopback, tmp_path):
    """Full S1-S3 seam over a real socket: GET (templated URL) ->
    atomically-staged NDJSON -> stage-stream read -> Dataset rows equal
    the served payload, exactly once."""
    srv, base = loopback
    stage = str(tmp_path / "stage")
    url = base + "/events/{{n}}"
    staged = http_fetch.fetch_to_stage(url, stage, key="000001",
                                       params={"n": 3})
    assert [f.path for f in list_staged_files(stage)] == [staged]

    ds, marker = read_staged_json(stage)
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    import pandas as pd
    want = pd.DataFrame(RECORDS)
    want["ts"] = pd.to_datetime(want["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want)

    # re-fetch of the identical body republishes the SAME digest name
    # (no duplicate delivery), and the marker tail sees nothing new
    again = http_fetch.fetch_to_stage(url, stage, key="000001",
                                      params={"n": 3})
    assert again == staged
    ds2, _ = read_staged_json(stage, after=marker)
    assert ds2 is None or ds2.count() == 0
    assert srv.calls == ["/events/3", "/events/3"]


def test_4xx_fails_fast_without_retry(loopback):
    """A 404 is not transient: it must re-raise the real HTTPError
    immediately — one request, no backoff schedule, no masking behind
    a generic ConnectionError."""
    srv, base = loopback
    t0 = time.monotonic()
    with pytest.raises(urllib.error.HTTPError) as ei:
        http_fetch.fetch_text(base + "/missing", retries=5,
                              backoff_s=30.0)
    assert ei.value.code == 404
    assert time.monotonic() - t0 < 5.0        # never slept the backoff
    assert srv.calls == ["/missing"]          # exactly one attempt


def test_5xx_retries_with_backoff_then_succeeds(loopback):
    """Server errors ARE transient: the backoff schedule retries
    through them and returns the eventual 200 body."""
    srv, base = loopback
    body = http_fetch.fetch_text(base + "/flaky", retries=3,
                                 backoff_s=0.01)
    assert json.loads(body) == {"ok": True}
    assert srv.calls == ["/flaky"] * 3        # 500, 500, 200


def test_5xx_exhaustion_raises_connection_error(loopback):
    srv, base = loopback
    srv.flaky_failures = 99
    with pytest.raises(ConnectionError):
        http_fetch.fetch_text(base + "/flaky", retries=1, backoff_s=0.01)
    assert len(srv.calls) == 2
