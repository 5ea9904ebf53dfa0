import http.client
import io
import threading
import time
import wave
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from streamspeech_tpu.agents.streamspeech import StreamSpeechAgentConfig
from streamspeech_tpu.agents.waitk import WaitkS2STAgent, WaitkS2TTAgent
from streamspeech_tpu.cli.demo import DemoServer
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from tests.test_agent_e2e import stack  # noqa: F401 (fixture)


def test_waitk_agents(stack):  # noqa: F811
    cfg, engine, src_dict, tgt_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=320)
    rng = np.random.RandomState(0)
    src = [list(rng.uniform(-0.3, 0.3, 16000))]
    a1 = WaitkS2TTAgent(engine, agent_cfg, src_dict, tgt_dict, waitk=2)
    ev = SentenceLevelEvaluator(a1, quality_metrics=["BLEU"])
    ev(src, ["a b"])
    assert ev.instances[0].finish_prediction
    # wait-k must not emit before k chunks: first delay >= k * segment
    if ev.instances[0].delays:
        assert ev.instances[0].delays[0] >= 2 * 320

    a2 = WaitkS2STAgent(engine, agent_cfg, src_dict, tgt_dict, unit_dict,
                        waitk=2)
    ev2 = SentenceLevelEvaluator(a2, quality_metrics=[])
    ev2(src, ["a b"])
    assert ev2.instances[0].finish_prediction


def test_demo_server_routes(stack):  # noqa: F811
    cfg, engine, src_dict, tgt_dict, unit_dict = stack
    from streamspeech_tpu.agents.streamspeech import StreamSpeechS2STAgent

    agent = StreamSpeechS2STAgent(engine,
                                  StreamSpeechAgentConfig(source_segment_size=320),
                                  src_dict, tgt_dict, unit_dict)
    server = DemoServer(agent, host="127.0.0.1", port=0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), server.handler())
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/")
        assert b"StreamSpeech" in conn.getresponse().read()

        rng = np.random.RandomState(0)
        pcm = (rng.uniform(-0.3, 0.3, 16000) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(pcm.tobytes())
        conn.request("POST", "/upload?segment_size=320", body=buf.getvalue())
        assert conn.getresponse().read() == b"ok"

        deadline = time.time() + 120
        done = False
        while time.time() < deadline and not done:
            conn.request("GET", "/status")
            import json

            status = json.loads(conn.getresponse().read())
            done = status["done"]
            time.sleep(0.3)
        assert done
        conn.request("GET", "/asr/99999")
        conn.getresponse().read()
        conn.request("GET", "/output.wav")
        wav_bytes = conn.getresponse().read()
        assert wav_bytes[:4] == b"RIFF"
    finally:
        httpd.shutdown()


def test_demo_stitch_inserts_silence_at_gaps():
    """Demo playback must match the evaluator's source-timeline stitching
    (`eval/instance.py` summarize): a piece emitted at delay t starts at
    max(prev_end, t), with zeros filling the gap."""
    import numpy as np

    from streamspeech_tpu.cli.demo import stitch_on_source_timeline

    sr = 16000
    a = np.full(int(0.1 * sr), 0.5, np.float32)   # 100 ms at t=320
    b = np.full(int(0.1 * sr), -0.5, np.float32)  # 100 ms at t=960
    out = stitch_on_source_timeline([a, b], [320, 960], sr)
    # piece a spans [320, 420) ms; gap [420, 960) is silence; b at 960 ms
    assert len(out) == int(sr * (960 + 100 - 320) / 1000)
    gap = out[int(0.1 * sr): int((960 - 320) / 1000 * sr)]
    assert np.all(gap == 0.0) and len(gap) > 0
    assert out[0] == 0.5 and out[-1] == -0.5

    # contiguous writes (delay earlier than prev end) concatenate directly
    out2 = stitch_on_source_timeline([a, b], [320, 330], sr)
    assert np.array_equal(out2, np.concatenate([a, b]))
