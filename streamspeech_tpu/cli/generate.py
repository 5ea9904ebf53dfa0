"""Offline batch inference CLI — the fairseq-generate equivalent
(`fairseq_cli/generate.py:28-201` driving `CTCMultiDecoderSequenceGenerator`).

Reads a manifest (or wav list), loads a native orbax checkpoint or a reference
fairseq .pt, and writes per-utterance A- (ASR), D- (MT), U- (units) lines plus
optional vocoded wavs — the same output surface the reference's
`pred.offline-s2st.sh` postprocesses.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from streamspeech_tpu.config import StreamSpeechConfig
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.generation import OfflineGenerator
from streamspeech_tpu.models.streamspeech import StreamSpeechModel


def load_model(args):
    from streamspeech_tpu.train.synthetic import full_config

    cfg = full_config()
    if args.fairseq_checkpoint:
        from streamspeech_tpu.train.checkpoint import (
            import_fairseq_streamspeech,
            infer_config_from_params,
        )

        params, batch_stats, _ = import_fairseq_streamspeech(
            args.fairseq_checkpoint)
        variables = {"params": params, "batch_stats": batch_stats}
        cfg = infer_config_from_params(params, batch_stats)
        model = StreamSpeechModel(cfg)
        return model, variables, cfg
    elif args.checkpoint:
        from streamspeech_tpu.train.checkpoint import load_model_ensemble

        # comma-separated paths = ensemble decoding (fairseq-generate --path
        # a.pt:b.pt, `fairseq/fairseq/checkpoint_utils.py:288`)
        paths = [p for p in args.checkpoint.split(",") if p]
        members = load_model_ensemble(paths)
        variables = members if len(members) > 1 else members[0]
        cfg_path = Path(paths[0]).parent / "config.json"
        if cfg_path.exists():
            raw = json.loads(cfg_path.read_text())
            cfg = StreamSpeechConfig.simul_s2st()
            for section in ("encoder", "mt_decoder", "unit_decoder"):
                for k, v in raw.get(section, {}).items():
                    if hasattr(getattr(cfg, section), k):
                        setattr(getattr(cfg, section), k, v)
            for k in ("synthesizer_encoder_layers", "translation_decoder_layers",
                      "target_code_size", "source_unigram_vocab",
                      "ctc_target_unigram_vocab"):
                if k in raw:
                    setattr(cfg, k, raw[k])
    else:
        raise SystemExit("need --checkpoint or --fairseq-checkpoint")
    model = StreamSpeechModel(cfg)
    return model, variables, cfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--fairseq-checkpoint", type=str, default=None)
    p.add_argument("--model-config", type=str, default=None)
    p.add_argument("--manifest", type=str, required=True,
                   help="tsv manifest or newline list of wav/npy paths")
    p.add_argument("--src-dict", type=str, default=None)
    p.add_argument("--tgt-dict", type=str, default=None)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=1,
                   help="batched greedy decoding (beam must be 1)")
    p.add_argument("--max-len", type=int, default=200)
    p.add_argument("--lenpen", type=float, default=1.0)
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU backend (before backend init)")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--vocoder", type=str, default=None)
    p.add_argument("--vocoder-cfg", type=str, default=None)
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    model, variables, cfg = load_model(args)
    if isinstance(variables, list):
        from streamspeech_tpu.generation import EnsembleGenerator

        gen = EnsembleGenerator(model, variables, beam=args.beam,
                                max_len=args.max_len, len_penalty=args.lenpen)
    else:
        gen = OfflineGenerator(model, variables, beam=args.beam,
                               max_len=args.max_len, len_penalty=args.lenpen)
    src_dict = Dictionary.load(args.src_dict) if args.src_dict else None
    tgt_dict = Dictionary.load(args.tgt_dict) if args.tgt_dict else None

    vocoder = voc_vars = None
    if args.vocoder:
        from streamspeech_tpu.models.vocoder import CodeGenerator
        from streamspeech_tpu.train.checkpoint import import_hifigan_vocoder

        voc_vars, voc_cfg = import_hifigan_vocoder(args.vocoder,
                                                   args.vocoder_cfg)
        vocoder = CodeGenerator(voc_cfg)

    from streamspeech_tpu.data.dataset import load_audio_or_features
    from streamspeech_tpu.ops.fbank import logmelfbank

    out_dir = Path(args.output) if args.output else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)
    unit_f = open(out_dir / "units.txt", "w") if out_dir else None

    manifest = Path(args.manifest)
    refs = []
    if manifest.suffix == ".tsv":
        with open(manifest) as f:
            header = f.readline().rstrip().split("\t")
            col = {n: i for i, n in enumerate(header)}
            for line in f:
                row = line.rstrip("\n").split("\t")
                refs.append((row[col["id"]], row[col["src_audio"]]))
    else:
        for i, line in enumerate(manifest.read_text().splitlines()):
            if line.strip():
                refs.append((str(i), line.strip()))

    def emit_result(utt_id, out):
        asr = src_dict.string(out["asr_tokens"], spm_to_text=True) \
            if src_dict else " ".join(map(str, out["asr_tokens"]))
        mt = tgt_dict.string(out["mt_tokens"], spm_to_text=True) \
            if tgt_dict else " ".join(map(str, out["mt_tokens"]))
        units = [u - 4 for u in out["units"]]
        print(f"A-{utt_id}\t{asr}")
        print(f"D-{utt_id}\t{mt}")
        print(f"U-{utt_id}\t{' '.join(map(str, units))}")
        if unit_f:
            unit_f.write(" ".join(map(str, units)) + "\n")
        if vocoder is not None and units and out_dir:
            import jax.numpy as jnp

            wav, n, dur = vocoder.apply(voc_vars, jnp.asarray([units]),
                                        max_frames=4 * len(units))
            from streamspeech_tpu.eval.instance import write_wav

            write_wav(out_dir / f"{utt_id}_pred.wav",
                      np.asarray(wav[0][: int(n[0])]), 16000)

    def load_feats(ref):
        x = load_audio_or_features(ref, manifest.parent)
        return np.asarray(logmelfbank(x)) if x.ndim == 1 else x

    if args.batch_size > 1 and args.beam == 1:
        for i in range(0, len(refs), args.batch_size):
            chunk = refs[i: i + args.batch_size]
            outs = gen.generate_batch_greedy([load_feats(r) for _, r in chunk],
                                             max_tokens=min(args.max_len, 64))
            for (utt_id, _), out in zip(chunk, outs):
                emit_result(utt_id, out)
    else:
        for utt_id, ref in refs:
            emit_result(utt_id, gen.generate(load_feats(ref)))
    if unit_f:
        unit_f.close()


if __name__ == "__main__":
    main()
