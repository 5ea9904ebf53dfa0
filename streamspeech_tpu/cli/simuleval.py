"""Streaming evaluation CLI — the `simuleval` equivalent
(`SimulEval/simuleval/cli.py:34-98`): wav list + target file → agent → quality +
latency scores, instances.log, scores.tsv, emitted wavs.

Example:
  python -m streamspeech_tpu.cli.simuleval \
      --source wav_list.txt --target target.txt \
      --checkpoint ckpts/checkpoint_100 --agent s2st \
      --source-segment-size 320 --output res/ \
      --vocoder g_00500000 --vocoder-cfg config.json \
      --src-dict spm_unigram_fr.txt --tgt-dict spm_unigram_en.txt
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from streamspeech_tpu.agents.streamspeech import (
    StreamSpeechAgentConfig,
    StreamSpeechASRAgent,
    StreamSpeechS2STAgent,
    StreamSpeechS2TTAgent,
)
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.ops.cmvn import GlobalCMVN
from streamspeech_tpu.runtime.session import StreamSpeechEngine


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source", type=str, required=True,
                   help="newline-separated wav paths")
    p.add_argument("--target", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--fairseq-checkpoint", type=str, default=None)
    p.add_argument("--agent",
                   choices=["s2st", "s2tt", "asr", "t2t-waitk", "t2t-hmt",
                            "t2t-hmt-beam"],
                   default="s2st")
    p.add_argument("--waitk", type=int, default=3,
                   help="k for the t2t-waitk agent")
    p.add_argument("--source-segment-size", type=int, default=320)
    p.add_argument("--src-dict", type=str, default=None)
    p.add_argument("--tgt-dict", type=str, default=None)
    p.add_argument("--target-code-size", type=int, default=1000)
    p.add_argument("--gcmvn", type=str, default=None)
    p.add_argument("--vocoder", type=str, default=None)
    p.add_argument("--vocoder-cfg", type=str, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--lagging-k1", type=int, default=0)
    p.add_argument("--stride-n", type=int, default=1)
    p.add_argument("--continue-unfinished", action="store_true", default=False)
    p.add_argument("--batch", type=int, default=1,
                   help="evaluate N instances concurrently through one lockstep"
                        " batched session (per-instance results are identical"
                        " to --batch 1, wall-clock is ~N× better)")
    p.add_argument("--score-only", action="store_true", default=False,
                   help="re-score a previous run from output/instances.log")
    p.add_argument("--latency-metrics", nargs="*", default=None)
    p.add_argument("--quality-metrics", nargs="*", default=None)
    p.add_argument("--standalone", action="store_true", default=False,
                   help="serve the agent over HTTP (PUT /input, GET /output, "
                        "POST /reset) instead of evaluating")
    p.add_argument("--remote-eval", action="store_true", default=False,
                   help="evaluate a REMOTE agent (no local model); pair with "
                        "--remote-address of a --standalone server")
    p.add_argument("--remote-address", type=str, default="http://127.0.0.1:7861")
    p.add_argument("--remote-port", type=int, default=7861)
    p.add_argument("--slurm", action="store_true", default=False,
                   help="submit this evaluation as a slurm job instead of "
                        "running it (writes output/script.sh, runs sbatch)")
    p.add_argument("--slurm-partition", type=str, default="learnaccel",
                   help="slurm partition (`simuleval/options.py` default)")
    p.add_argument("--slurm-time", type=str, default="2:00:00")
    p.add_argument("--slurm-job-name", type=str, default="simuleval")
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU backend (must run before backend "
                        "init; this environment's sitecustomize otherwise "
                        "force-selects the remote TPU)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.slurm:
        submit_slurm_job(args, argv)
        return

    if args.score_only:
        from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator as SE
        from streamspeech_tpu.agents.base import SpeechToTextAgent

        class _Null(SpeechToTextAgent):
            def policy(self):
                from streamspeech_tpu.agents.base import ReadAction
                return ReadAction()

        ev = SE(_Null(), output_dir=args.output,
                latency_metrics=args.latency_metrics,
                quality_metrics=args.quality_metrics or [])
        for k, v in ev.score_only().items():
            print(f"{k}\t{v:.3f}" if v == v else f"{k}\tnan")
        return

    def load_corpus():
        from streamspeech_tpu.data.dataset import load_audio_or_features
        from streamspeech_tpu.data.youtube import (
            is_youtube_url,
            resolve_youtube_source,
        )

        src_root = Path(args.source).parent
        srcs = []
        for line in Path(args.source).read_text().splitlines():
            if not line.strip():
                continue
            ref = line.strip()
            if is_youtube_url(ref):
                # youtube-to-{text,speech} dataloader equivalence
                # (`SimulEval/simuleval/data/dataloader/s2t_dataloader.py:114`)
                ref = resolve_youtube_source(
                    ref, cache_dir=args.output or ".")
            wav = load_audio_or_features(ref, src_root)
            srcs.append(list(np.asarray(wav, np.float32)))
        return srcs, list(Path(args.target).read_text().splitlines())

    if args.agent.startswith("t2t-"):
        _run_t2t(args)
        return

    if args.remote_eval:
        # evaluate an agent served elsewhere (`--standalone`) — no local model
        from streamspeech_tpu.eval.service import RemoteAgent

        tt = "speech" if args.agent == "s2st" else "text"
        agent = RemoteAgent(args.remote_address, target_type=tt)
        sources, references = load_corpus()
        ev = SentenceLevelEvaluator(
            agent, source_segment_size=args.source_segment_size,
            latency_metrics=args.latency_metrics,
            quality_metrics=args.quality_metrics, output_dir=args.output)
        for k, v in ev(sources, references,
                       continue_unfinished=args.continue_unfinished).items():
            print(f"{k}\t{v:.3f}" if v == v else f"{k}\tnan")
        return

    from streamspeech_tpu.cli.generate import load_model

    model, variables, cfg = load_model(args)

    vocoder = voc_vars = None
    if args.vocoder:
        from streamspeech_tpu.models.vocoder import CodeGenerator
        from streamspeech_tpu.train.checkpoint import import_hifigan_vocoder

        voc_vars, voc_cfg = import_hifigan_vocoder(args.vocoder,
                                                   args.vocoder_cfg)
        vocoder = CodeGenerator(voc_cfg)

    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars)
    src_dict = Dictionary.load(args.src_dict) if args.src_dict else Dictionary()
    tgt_dict = Dictionary.load(args.tgt_dict) if args.tgt_dict else src_dict
    unit_dict = Dictionary.units(args.target_code_size)
    unit_dict.add_blank()
    gcmvn = GlobalCMVN.from_npz(args.gcmvn) if args.gcmvn else None

    agent_cfg = StreamSpeechAgentConfig(
        source_segment_size=args.source_segment_size,
        lagging_k1=args.lagging_k1, stride_n=args.stride_n,
        whole_word=args.source_segment_size >= 640)
    if args.agent == "s2st":
        agent = StreamSpeechS2STAgent(engine, agent_cfg, src_dict, tgt_dict,
                                      unit_dict, gcmvn)
    elif args.agent == "s2tt":
        agent = StreamSpeechS2TTAgent(engine, agent_cfg, src_dict, tgt_dict,
                                      gcmvn)
    else:
        agent = StreamSpeechASRAgent(engine, agent_cfg, src_dict, gcmvn)

    if args.standalone:
        # agent-as-a-service (`simuleval --standalone`): serve this agent over
        # HTTP for a `--remote-eval` client; blocks until killed.
        from streamspeech_tpu.eval.service import AgentService

        print(f"serving {args.agent} agent on port {args.remote_port}",
              flush=True)
        AgentService(agent, port=args.remote_port).start(background=False)
        return

    sources, references = load_corpus()

    if args.batch > 1:
        from streamspeech_tpu.eval.batched_evaluator import (
            BatchedASREvaluator,
            BatchedS2STEvaluator,
            BatchedS2TTEvaluator,
        )

        kw = dict(batch=args.batch, latency_metrics=args.latency_metrics,
                  quality_metrics=args.quality_metrics,
                  output_dir=args.output)
        if args.agent == "s2st":
            ev = BatchedS2STEvaluator(engine, agent_cfg, src_dict, tgt_dict,
                                      unit_dict, gcmvn, **kw)
        elif args.agent == "s2tt":
            ev = BatchedS2TTEvaluator(engine, agent_cfg, src_dict, tgt_dict,
                                      gcmvn, **kw)
        else:
            ev = BatchedASREvaluator(engine, agent_cfg, src_dict, src_dict,
                                     gcmvn, **kw)
    else:
        ev = SentenceLevelEvaluator(
            agent, source_segment_size=args.source_segment_size,
            latency_metrics=args.latency_metrics,
            quality_metrics=args.quality_metrics, output_dir=args.output)
    scores = ev(sources, references,
                continue_unfinished=args.continue_unfinished)
    for k, v in scores.items():
        print(f"{k}\t{v:.3f}" if v == v else f"{k}\tnan")


def submit_slurm_job(args, argv=None) -> str:
    """Generate and submit an sbatch script re-invoking this CLI without
    `--slurm` (`SimulEval/simuleval/utils/slurm.py:31-121` semantics: strip
    the slurm flags, force `--output` to the absolute results dir, write
    `output/script.sh`, run `sbatch`). One TPU host per job replaces the
    reference's one-GPU-per-task layout. Returns the script path; a missing
    `sbatch` binary is reported but does not fail (so the script can be
    generated on a login-less box and submitted elsewhere)."""
    import os
    import re
    import subprocess
    import sys

    out = os.path.abspath(args.output or "simuleval_results")
    os.makedirs(out, exist_ok=True)

    cli = argv if argv is not None else sys.argv[1:]
    # strip --slurm and the --slurm-* option values, pin --output
    kept, skip = [], False
    for tok in cli:
        if skip:
            skip = False
            continue
        if tok == "--slurm":
            continue
        if tok.startswith("--slurm-"):
            skip = "=" not in tok
            continue
        kept.append(tok if tok.startswith("--") or str(tok).isdigit()
                    else f'"{tok}"')
    command = f"{sys.executable} -m streamspeech_tpu.cli.simuleval " + \
        " ".join(kept)
    if "--output" in command:
        command = re.sub(r"--output\s+\S+", f'--output "{out}"', command)
    else:
        command += f' --output "{out}"'
    command = command.replace(" --", " \\\n\t--")

    script = f"""#!/bin/bash
#SBATCH --time={args.slurm_time}
#SBATCH --partition={args.slurm_partition}
#SBATCH --nodes=1
#SBATCH --ntasks-per-node=1
#SBATCH --output="{out}/slurm-%j.log"
#SBATCH --job-name="{args.slurm_job_name}"

cd {out}

{command}
"""
    script_file = os.path.join(out, "script.sh")
    with open(script_file, "w") as f:
        f.write(script)
    try:
        proc = subprocess.run(["sbatch", script_file], capture_output=True)
        print(f"sbatch stdout: {proc.stdout.decode().strip()}")
        if proc.stderr:
            print(f"sbatch stderr: {proc.stderr.decode().strip()}")
    except FileNotFoundError:
        print(f"sbatch not found; job script written to {script_file}")
    return script_file


if __name__ == "__main__":
    main()


def _run_t2t(args):
    """Text-to-text simultaneous evaluation (the reference's t2t dataloader +
    TextToTextInstance path, `SimulEval/simuleval/data/dataloader/
    t2t_dataloader.py` + `evaluator/instance.py:426`): source/target are text
    files, one token is sent per read, AL/AP are measured in tokens."""
    import json

    import jax

    from streamspeech_tpu.config import DecoderConfig
    from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator

    sources = [line for line in Path(args.source).read_text().splitlines()
               if line.strip()]
    references = [line for line in Path(args.target).read_text().splitlines()]

    if args.src_dict:
        src_dict = Dictionary.load(args.src_dict)
    else:
        src_dict = Dictionary()
        for line in sources:
            for w in line.split():
                src_dict.add_symbol(w)
    if args.tgt_dict:
        tgt_dict = Dictionary.load(args.tgt_dict)
    else:
        tgt_dict = Dictionary()
        for line in references:
            for w in line.split():
                tgt_dict.add_symbol(w)

    restored = cfg_raw = None
    if args.checkpoint:
        from streamspeech_tpu.train.checkpoint import load_checkpoint

        restored = load_checkpoint(args.checkpoint)
        cfg_path = Path(args.checkpoint).parent / "config.json"
        cfg_raw = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    dec_raw = (cfg_raw or {}).get("decoder", {})
    dec = DecoderConfig(vocab_size=len(tgt_dict))
    for k, v in dec_raw.items():
        if hasattr(dec, k):
            setattr(dec, k, v)
    enc_layers = (cfg_raw or {}).get("encoder_layers", 6)

    if args.agent in ("t2t-hmt", "t2t-hmt-beam"):
        from streamspeech_tpu.models.hmt import (HMTAgent, HMTModel,
                                                 HMTSimBeamAgent)

        model = HMTModel(len(src_dict), dec, encoder_layers=enc_layers,
                         first_read=(cfg_raw or {}).get("first_read", 3),
                         cands_per_token=(cfg_raw or {}).get(
                             "cands_per_token", 4))
        variables = restored and {"params": restored["params"]}
        if variables is None:
            import jax.numpy as jnp
            variables = jax.jit(lambda r: model.init(
                r, jnp.full((1, 8), 4, jnp.int32), jnp.full((1,), 8, jnp.int32),
                jnp.full((1, 4), 4, jnp.int32)))(jax.random.PRNGKey(0))
        if args.agent == "t2t-hmt-beam":
            agent = HMTSimBeamAgent(model, variables, src_dict, tgt_dict,
                                    beam_size=5)
        else:
            agent = HMTAgent(model, variables, src_dict, tgt_dict)
    else:
        from streamspeech_tpu.models.text_mt import TextMTModel, WaitkTextAgent

        model = TextMTModel(len(src_dict), dec, encoder_layers=enc_layers)
        variables = restored and {"params": restored["params"]}
        if variables is None:
            import jax.numpy as jnp
            variables = jax.jit(lambda r: model.init(
                r, jnp.full((1, 8), 4, jnp.int32),
                jnp.full((1, 4), 4, jnp.int32)))(jax.random.PRNGKey(0))
        agent = WaitkTextAgent(model, variables, src_dict, tgt_dict,
                               waitk=args.waitk)

    ev = SentenceLevelEvaluator(
        agent, source_segment_size=args.source_segment_size,
        latency_metrics=args.latency_metrics,
        quality_metrics=args.quality_metrics, output_dir=args.output)
    for k, v in ev(sources, references,
                   continue_unfinished=args.continue_unfinished).items():
        print(f"{k}\t{v:.3f}" if v == v else f"{k}\tnan")
