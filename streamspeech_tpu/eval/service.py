"""Remote evaluation: agent-as-a-service + client-side remote agent.

Rebuild of `SimulEval/simuleval/agents/service.py:15-40` (tornado server exposing
PUT /input, GET /output, POST /reset) and `simuleval/evaluator/remote.py` (the
client that drives a remote agent), on stdlib HTTP. This is the `--standalone` /
`--remote-eval` surface of the reference CLI.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from streamspeech_tpu.agents.base import GenericAgent, Segment


class AgentService:
    """Serve one agent over HTTP."""

    def __init__(self, agent: GenericAgent, host: str = "0.0.0.0",
                 port: int = 7861):
        self.agent = agent
        self.host, self.port = host, port
        self.httpd: Optional[ThreadingHTTPServer] = None

    def handler(self):
        service = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code, body=b"", ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

            def do_PUT(self):
                if self.path != "/input":
                    return self._send(404)
                n = int(self.headers.get("Content-Length", 0))
                segment = Segment.from_json(self.rfile.read(n).decode())
                service.agent.push(segment)
                self._send(200, b"{}")

            def do_GET(self):
                if self.path != "/output":
                    return self._send(404)
                out = service.agent.pop()
                self._send(200, out.json().encode())

            def do_POST(self):
                if self.path != "/reset":
                    return self._send(404)
                service.agent.reset()
                self._send(200, b"{}")

        return Handler

    def start(self, background: bool = True) -> int:
        self.httpd = ThreadingHTTPServer((self.host, self.port), self.handler())
        port = self.httpd.server_address[1]
        if background:
            threading.Thread(target=self.httpd.serve_forever,
                             daemon=True).start()
        else:
            self.httpd.serve_forever()
        return port

    def stop(self):
        if self.httpd:
            self.httpd.shutdown()


class RemoteAgent(GenericAgent):
    """Client-side proxy: a GenericAgent whose push/pop go over HTTP, usable
    directly with SentenceLevelEvaluator (remote evaluation mode)."""

    def __init__(self, url: str, source_type: str = "speech",
                 target_type: str = "speech"):
        self.url = url.rstrip("/")
        self.source_type = source_type
        self.target_type = target_type
        super().__init__()

    def reset(self):
        super().reset()
        if hasattr(self, "url"):
            req = urllib.request.Request(self.url + "/reset", data=b"",
                                         method="POST")
            urllib.request.urlopen(req, timeout=60).read()

    def push(self, segment: Segment) -> None:
        self.states.update_source(segment)
        req = urllib.request.Request(self.url + "/input",
                                     data=segment.json().encode(),
                                     method="PUT")
        urllib.request.urlopen(req, timeout=600).read()

    def pop(self) -> Segment:
        body = urllib.request.urlopen(self.url + "/output", timeout=600).read()
        segment = Segment.from_json(body.decode())
        self.states.update_target(segment)
        if segment.finished:
            self.states.target_finished = True
        return segment

    def policy(self):  # pragma: no cover - remote agents have no local policy
        raise RuntimeError("RemoteAgent delegates policy to the server")
