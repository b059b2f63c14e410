"""HTTP source connector: the literal S1-S3/S6 ingest boundary.

Reference parity (`tt-dps-pipeline-rest/.../utils/HttpClientUtils.scala`):

  * ``render_url``      -- `{{param}}` URL templating (`:15-22`)
  * ``fetch_text``      -- GET returning the body string
    (`performGetJson`, `:24-35`)
  * ``fetch_json``      -- GET + parse (`performGet[T]`, `:37-44`)
  * ``fetch_to_stage``  -- GET + land the payload in the stage
    directory as an atomically-published NDJSON file
    (`performGetAndWrite` `:59-75` + `stageRestCallFromLocal`,
    `utils/package.scala:14-40`), from which the stage-stream tail
    (`staged_json.list_staged_files` -> `read_staged_json`) ingests it
    exactly once.

The connector is a DRIVER-side (or per-segment Ray task) step, not a
per-record transform: one fetch produces one staged file, and all
heavy parsing happens downstream in the Dataset pipeline
(`jsonops.explode_json_array`). stdlib urllib only -- works against
http(s) endpoints and, for hermetic tests, ``file://`` URLs. Retries
with exponential backoff on transient errors; the staged name is a
content digest, so a retried PUT after a half-delivered fetch is a
no-op rather than a duplicate (same rule as `stage_put`).
"""

from __future__ import annotations

import json
import re
import time
import urllib.error
import urllib.request

_PARAM = re.compile(r"\{\{(\w+)\}\}")


def render_url(template: str, params: dict | None = None) -> str:
    """`{{param}}` substitution; unknown placeholders raise (a typo'd
    param silently fetching the literal braces is a data bug). Values
    are percent-encoded: a raw space makes an invalid request line and
    a raw '&'/'#' silently injects extra query parameters."""
    from urllib.parse import quote
    params = params or {}

    def sub(m: re.Match) -> str:
        k = m.group(1)
        if k not in params:
            raise KeyError(f"URL template parameter {{{{{k}}}}} not "
                           f"provided (have {sorted(params)})")
        return quote(str(params[k]), safe="")

    return _PARAM.sub(sub, template)


def fetch_text(url_template: str, params: dict | None = None,
               timeout_s: float = 30.0, retries: int = 3,
               backoff_s: float = 0.5) -> str:
    """GET the rendered URL, return the body as text; exponential
    backoff on transient errors only (URLError/timeout/5xx). A 4xx is
    a hard failure — the URL or request is wrong, and retrying would
    just delay it by the full backoff schedule while masking the real
    status — so HTTPError with status < 500 re-raises immediately."""
    url = render_url(url_template, params)
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as r:
                return r.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            if e.code < 500:
                raise                              # 4xx: not transient
            last = e
            if attempt < retries:
                time.sleep(backoff_s * (2 ** attempt))
        except Exception as e:                     # URLError, timeout, OS
            last = e
            if attempt < retries:
                time.sleep(backoff_s * (2 ** attempt))
    raise ConnectionError(
        f"GET {url} failed after {retries + 1} attempts") from last


def fetch_json(url_template: str, params: dict | None = None,
               **kw) -> object:
    """GET + json parse (the typed-bean fetch, minus the bean)."""
    return json.loads(fetch_text(url_template, params, **kw))


def fetch_to_stage(url_template: str, stage_dir: str, key: str,
                   params: dict | None = None, **kw) -> str:
    """GET the rendered URL and land the payload in the stage as one
    atomically-published NDJSON file in the STAGED ENVELOPE layout
    (every line ``{"n", "payload"}`` — the shape `read_staged_json`
    parses). Accepted bodies: a JSON array of envelope records (the
    reference's PipelineServlet shape, passed through), a JSON array
    of raw record objects or a single object (wrapped into envelope
    lines), anything else raises ValueError — a body the stage tail
    cannot parse must fail at the fetch, not crash the downstream
    reader. Returns the staged path; the normal stage-stream tail
    picks it up exactly once."""
    from .staged_json import PAYLOAD_RECORDS, stage_put
    body = fetch_text(url_template, params, **kw)
    try:
        parsed = json.loads(body)
    except json.JSONDecodeError as e:
        raise ValueError(
            f"fetch_to_stage: response body is not JSON ({e}); the "
            f"stage stream only carries JSON record payloads") from e
    if isinstance(parsed, dict):
        parsed = [parsed]
    if not isinstance(parsed, list):
        raise ValueError(
            f"fetch_to_stage: response body is JSON "
            f"{type(parsed).__name__}, not an array of records")
    if parsed and all(isinstance(r, dict) and set(r) == {"n", "payload"}
                      for r in parsed):
        # already enveloped: pass through line-per-record
        lines = [json.dumps(rec, separators=(",", ":")) for rec in parsed]
    else:
        lines = [json.dumps({"n": len(chunk),
                             "payload": json.dumps(chunk)})
                 for lo in range(0, len(parsed), PAYLOAD_RECORDS)
                 for chunk in [parsed[lo:lo + PAYLOAD_RECORDS]]]
    return stage_put(lines, stage_dir, key)
