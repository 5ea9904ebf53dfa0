"""Web demo — stdlib-HTTP rebuild of the reference Flask GUI (`demo/app.py:879-934`):
upload a wav, a background thread runs the streaming agent chunk by chunk, the
frontend polls time-indexed intermediate ASR / translation results synced to
playback and fetches the stitched output audio.

Routes (reference-compatible surface):
  GET  /                     HTML page
  POST /upload               multipart wav (+ ?segment_size=ms) → starts a run
  GET  /asr/<ms>             ASR text up to stream time ms
  GET  /translation/<ms>     translation text up to stream time ms
  GET  /status               {"progress_ms": ..., "done": bool}
  GET  /output.wav           stitched output audio so far
  POST /reset
"""

from __future__ import annotations

import io
import json
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

PAGE = """<!doctype html>
<html><head><title>StreamSpeech-TPU demo</title></head>
<body style="font-family:sans-serif;max-width:720px;margin:2em auto">
<h2>StreamSpeech-TPU: simultaneous speech-to-speech translation</h2>
<input type="file" id="wav" accept=".wav"/>
<select id="seg"><option>320</option><option>640</option><option>960</option>
<option>1280</option><option>2560</option></select> ms
<button onclick="up()">Translate</button>
<h3>Streaming ASR</h3><pre id="asr"></pre>
<h3>Simultaneous translation</h3><pre id="st"></pre>
<h3>Output speech</h3><audio id="out" controls></audio>
<script>
let timer=null;
async function up(){
  const f=document.getElementById('wav').files[0];
  const seg=document.getElementById('seg').value;
  await fetch('/upload?segment_size='+seg,{method:'POST',body:f});
  let t=0;
  timer=setInterval(async()=>{
    t+=200;
    document.getElementById('asr').textContent=await (await fetch('/asr/'+t)).text();
    document.getElementById('st').textContent=await (await fetch('/translation/'+t)).text();
    const s=await (await fetch('/status')).json();
    if(s.done){clearInterval(timer);
      document.getElementById('out').src='/output.wav?'+Date.now();}
  },200);
}
</script></body></html>"""


def stitch_on_source_timeline(pieces: List[np.ndarray], delays_ms: List[int],
                              sample_rate: int = 16000) -> np.ndarray:
    """Place each emitted piece at max(previous end, its source delay),
    inserting silence at discontinuities — the evaluator's stitching
    (`eval/instance.py` SpeechOutputInstance.summarize, reference
    `SimulEval/simuleval/evaluator/instance.py:344-371`). Plain
    concatenation plays laggy streams too early."""
    out: List[np.ndarray] = []
    prev_end = float(delays_ms[0]) if delays_ms else 0.0
    for piece, delay in zip(pieces, delays_ms):
        start = max(prev_end, float(delay))
        gap = start - prev_end
        if gap > 0:
            out.append(np.zeros(int(sample_rate * gap / 1000), np.float32))
        out.append(piece)
        prev_end = start + 1000.0 * len(piece) / sample_rate
    return np.concatenate(out) if out else np.zeros((0,), np.float32)


class DemoState:
    def __init__(self):
        self.reset()

    def reset(self):
        self.asr: Dict[int, str] = {}
        self.st: Dict[int, str] = {}
        self.out_wav = np.zeros((0,), np.float32)
        self.progress_ms = 0
        self.done = False

    def text_until(self, d: Dict[int, str], t: int) -> str:
        keys = [k for k in sorted(d) if k <= t]
        return d[keys[-1]] if keys else ""


class DemoServer:
    def __init__(self, agent, host="0.0.0.0", port=7860):
        self.agent = agent
        self.state = DemoState()
        self.host, self.port = host, port
        self._lock = threading.Lock()

    def run_stream(self, samples: np.ndarray, segment_ms: int):
        """Chop into segments and drive the agent (reference `demo/app.py:825-877`)."""
        from streamspeech_tpu.agents.base import SpeechSegment

        st = self.state
        self.agent.cfg.source_segment_size = segment_ms
        self.agent.reset()
        seg_len = int(16000 * segment_ms / 1000)
        pieces: List[np.ndarray] = []
        delays: List[int] = []  # source ms at which each piece was emitted
        for start in range(0, len(samples), seg_len):
            chunk = samples[start: start + seg_len]
            finished = start + seg_len >= len(samples)
            seg = SpeechSegment(content=list(chunk), sample_rate=16000,
                                finished=finished)
            out = self.agent.pushpop(seg)
            t = min(start + seg_len, len(samples)) * 1000 // 16000
            with self._lock:
                st.progress_ms = t
                st.asr[t] = getattr(self.agent, "asr_text", "")
                st.st[t] = getattr(self.agent, "st_text",
                                   getattr(self.agent, "emitted_text", ""))
                if out.data_type == "speech" and not out.is_empty and out.content:
                    pieces.append(np.asarray(out.content, np.float32))
                    delays.append(t)
                    st.out_wav = stitch_on_source_timeline(pieces, delays)
            if getattr(out, "finished", False) and finished:
                break
        with self._lock:
            st.done = True

    def handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code, body, ctype="text/plain"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                st = server.state
                if path == "/":
                    self._send(200, PAGE.encode(), "text/html")
                elif path.startswith("/asr/"):
                    t = int(path.rsplit("/", 1)[1])
                    self._send(200, st.text_until(st.asr, t).encode())
                elif path.startswith("/translation/"):
                    t = int(path.rsplit("/", 1)[1])
                    self._send(200, st.text_until(st.st, t).encode())
                elif path == "/status":
                    self._send(200, json.dumps(
                        {"progress_ms": st.progress_ms,
                         "done": st.done}).encode(), "application/json")
                elif path == "/output.wav":
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as f:
                        f.setnchannels(1)
                        f.setsampwidth(2)
                        f.setframerate(16000)
                        pcm = np.clip(st.out_wav, -1, 1)
                        f.writeframes((pcm * 32767).astype("<i2").tobytes())
                    self._send(200, buf.getvalue(), "audio/wav")
                else:
                    self._send(404, b"not found")

            def do_POST(self):
                path = self.path.split("?")[0]
                if path == "/upload":
                    n = int(self.headers.get("Content-Length", 0))
                    data = self.rfile.read(n)
                    with wave.open(io.BytesIO(data), "rb") as f:
                        pcm = np.frombuffer(f.readframes(f.getnframes()),
                                            dtype="<i2")
                        sr = f.getframerate()
                    samples = pcm.astype(np.float32) / 32768.0
                    if sr != 16000:  # crude resample via linear interp
                        t_new = np.arange(int(len(samples) * 16000 / sr))
                        samples = np.interp(t_new * sr / 16000,
                                            np.arange(len(samples)), samples
                                            ).astype(np.float32)
                    seg = 320
                    if "segment_size=" in self.path:
                        seg = int(self.path.split("segment_size=")[1].split("&")[0])
                    server.state.reset()
                    threading.Thread(target=server.run_stream,
                                     args=(samples, seg), daemon=True).start()
                    self._send(200, b"ok")
                elif path == "/reset":
                    server.state.reset()
                    self._send(200, b"ok")
                else:
                    self._send(404, b"not found")

        return Handler

    def serve(self):
        httpd = ThreadingHTTPServer((self.host, self.port), self.handler())
        print(f"demo listening on http://{self.host}:{self.port}")
        httpd.serve_forever()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", type=str, default="0.0.0.0")
    # model loading flags shared with the simuleval CLI
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--fairseq-checkpoint", type=str, default=None)
    p.add_argument("--src-dict", type=str, default=None)
    p.add_argument("--tgt-dict", type=str, default=None)
    p.add_argument("--target-code-size", type=int, default=1000)
    p.add_argument("--gcmvn", type=str, default=None)
    p.add_argument("--vocoder", type=str, default=None)
    p.add_argument("--vocoder-cfg", type=str, default=None)
    args = p.parse_args(argv)

    from streamspeech_tpu.agents.streamspeech import (
        StreamSpeechAgentConfig,
        StreamSpeechS2STAgent,
    )
    from streamspeech_tpu.cli.generate import load_model
    from streamspeech_tpu.dictionary import Dictionary
    from streamspeech_tpu.ops.cmvn import GlobalCMVN
    from streamspeech_tpu.runtime.session import StreamSpeechEngine

    model, variables, cfg = load_model(args)
    vocoder = voc_vars = None
    if args.vocoder:
        from streamspeech_tpu.models.vocoder import CodeGenerator
        from streamspeech_tpu.train.checkpoint import import_hifigan_vocoder

        voc_vars, voc_cfg = import_hifigan_vocoder(args.vocoder, args.vocoder_cfg)
        vocoder = CodeGenerator(voc_cfg)
    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars)
    src_dict = Dictionary.load(args.src_dict) if args.src_dict else Dictionary()
    tgt_dict = Dictionary.load(args.tgt_dict) if args.tgt_dict else src_dict
    unit_dict = Dictionary.units(args.target_code_size)
    unit_dict.add_blank()
    gcmvn = GlobalCMVN.from_npz(args.gcmvn) if args.gcmvn else None
    agent = StreamSpeechS2STAgent(engine, StreamSpeechAgentConfig(), src_dict,
                                  tgt_dict, unit_dict, gcmvn)
    DemoServer(agent, args.host, args.port).serve()


if __name__ == "__main__":
    main()
