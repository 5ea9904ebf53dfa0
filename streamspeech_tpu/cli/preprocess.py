"""Preprocess pipeline — native rebuild of `preprocess_scripts/` (10 stages).

Subcommands:
  extract-fbank   wav list → per-utterance fbank80 .npy + zip packing + tsv manifest
  gcmvn           manifest → global CMVN stats npz (`prep_global_cmvn.py`)
  kmeans-quantize target-speech features → unit sequences via k-means centroids
                  (`quantize_with_kmeans.py`; accepts a raw [K, D] .npy centroid
                  matrix or the released sklearn .bin via joblib)
  kmeans-train    learn K centroids from features (JAX k-means — replaces the
                  sklearn MiniBatchKMeans stage for from-scratch pipelines)
  make-manifest   join source fbank manifest + unit sequences + multitask texts
                  into the train/dev/test tsv set consumed by the dataset

The mHuBERT feature-extraction stage needs the released mHuBERT torch checkpoint;
`hubert-features` is gated behind its presence (this environment has no network
egress to fetch it).
"""

from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

import numpy as np


def cmd_extract_fbank(args):
    from streamspeech_tpu.data.dataset import load_audio_or_features
    from streamspeech_tpu.ops.fbank import logmelfbank

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    rows = ["id\tsrc_audio\tsrc_n_frames"]
    wavs = [ln.strip() for ln in Path(args.wav_list).read_text().splitlines()
            if ln.strip()]
    root = Path(args.wav_list).parent
    for i, ref in enumerate(wavs):
        utt_id = Path(ref).stem
        wav = load_audio_or_features(ref, root)
        feats = np.asarray(logmelfbank(wav)).astype(np.float32)
        np.save(out / f"{utt_id}.npy", feats)
        rows.append(f"{utt_id}\t{utt_id}.npy\t{feats.shape[0]}")
    (out / "manifest.tsv").write_text("\n".join(rows) + "\n")
    if args.zip:
        zip_path = out / "fbank80.zip"
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
            for p in sorted(out.glob("*.npy")):
                zf.write(p, arcname=p.name)
        # rewrite manifest with zip offsets (fairseq packing format)
        offsets = {}
        with zipfile.ZipFile(zip_path) as zf:
            for info in zf.infolist():
                offsets[info.filename] = (info.header_offset + 30 +
                                          len(info.filename), info.file_size)
        rows2 = ["id\tsrc_audio\tsrc_n_frames"]
        for row in rows[1:]:
            utt_id, npy, n = row.split("\t")
            off, size = offsets[npy]
            rows2.append(f"{utt_id}\tfbank80.zip:{off}:{size}\t{n}")
        (out / "manifest.tsv").write_text("\n".join(rows2) + "\n")
    print(f"wrote {len(wavs)} utterances to {out}")


def cmd_gcmvn(args):
    from streamspeech_tpu.data.dataset import load_audio_or_features

    total = None
    total_sq = None
    n = 0
    manifest = Path(args.manifest)
    with open(manifest) as f:
        header = f.readline().rstrip().split("\t")
        col = {name: i for i, name in enumerate(header)}
        for line in f:
            row = line.rstrip("\n").split("\t")
            feats = load_audio_or_features(row[col["src_audio"]], manifest.parent)
            if total is None:
                total = feats.sum(0).astype(np.float64)
                total_sq = (feats ** 2).sum(0).astype(np.float64)
            else:
                total += feats.sum(0)
                total_sq += (feats ** 2).sum(0)
            n += feats.shape[0]
    mean = total / n
    std = np.sqrt(np.maximum(total_sq / n - mean ** 2, 1e-8))
    np.savez(args.output, mean=mean.astype(np.float32),
             std=std.astype(np.float32))
    print(f"gcmvn over {n} frames → {args.output}")


def _load_centroids(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    import joblib

    km = joblib.load(path)  # sklearn MiniBatchKMeans (released km1000 .bin)
    return np.asarray(km.cluster_centers_, np.float32)


def cmd_kmeans_quantize(args):
    import jax.numpy as jnp

    centroids = jnp.asarray(_load_centroids(args.centroids))
    out_lines = []
    for line in Path(args.feature_list).read_text().splitlines():
        if not line.strip():
            continue
        feats = jnp.asarray(np.load(line.strip()))
        d = (jnp.sum(feats ** 2, 1, keepdims=True)
             - 2 * feats @ centroids.T
             + jnp.sum(centroids ** 2, 1)[None, :])
        units = np.asarray(jnp.argmin(d, axis=1))
        # collapse consecutive duplicates (reduce-unit convention)
        if args.dedup:
            units = units[np.insert(units[1:] != units[:-1], 0, True)]
        out_lines.append(" ".join(map(str, units.tolist())))
    Path(args.output).write_text("\n".join(out_lines) + "\n")
    print(f"quantized {len(out_lines)} utterances")


def cmd_kmeans_train(args):
    """Plain Lloyd k-means on device (replaces sklearn MiniBatchKMeans)."""
    import jax
    import jax.numpy as jnp

    feats = []
    for line in Path(args.feature_list).read_text().splitlines():
        if line.strip():
            feats.append(np.load(line.strip()))
    x = jnp.asarray(np.concatenate(feats, 0).astype(np.float32))
    k = args.clusters
    rng = np.random.RandomState(0)
    centroids = x[rng.choice(x.shape[0], k, replace=False)]

    @jax.jit
    def step(c):
        d = (jnp.sum(x ** 2, 1, keepdims=True) - 2 * x @ c.T
             + jnp.sum(c ** 2, 1)[None, :])
        assign = jnp.argmin(d, 1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        counts = one_hot.sum(0)
        sums = one_hot.T @ x
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], c)
        return new_c, jnp.mean(jnp.min(d, 1))

    for it in range(args.iterations):
        centroids, inertia = step(centroids)
        if it % 10 == 0:
            print(f"iter {it}: inertia {float(inertia):.4f}")
    np.save(args.output, np.asarray(centroids))
    print(f"saved [{k}, {x.shape[1]}] centroids to {args.output}")


def cmd_hubert_features(args):
    """Extract (m)HuBERT layer features for unit learning/quantization —
    replaces the reference's torch hubert_feature_reader stage. Requires the
    released checkpoint (pretrain_models/README.md download instructions)."""
    import jax
    import jax.numpy as jnp

    from streamspeech_tpu.data.dataset import load_audio_or_features
    from streamspeech_tpu.models.hubert import HubertModel
    from streamspeech_tpu.train.checkpoint import import_hubert

    model = HubertModel()
    variables = import_hubert(args.checkpoint)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    import functools

    @functools.partial(jax.jit, static_argnames=("layer",))
    def extract(v, wav, layer):
        return model.apply(v, wav, output_layer=layer)

    feat_list = []
    root = Path(args.wav_list).parent
    for line in Path(args.wav_list).read_text().splitlines():
        if not line.strip():
            continue
        wav = load_audio_or_features(line.strip(), root)
        n = (len(wav) // 320) * 320  # bucket to the model's total stride
        feats = np.asarray(extract(variables, jnp.asarray(wav[None, :n]),
                                   args.layer))[0]
        out = out_dir / (Path(line.strip()).stem + ".npy")
        np.save(out, feats.astype(np.float32))
        feat_list.append(str(out))
    (out_dir / "feature_list.txt").write_text("\n".join(feat_list) + "\n")
    print(f"extracted {len(feat_list)} feature files (layer {args.layer})")


def cmd_make_manifest(args):
    src = {r.split("\t")[0]: r for r in
           Path(args.fbank_manifest).read_text().splitlines()[1:] if r}
    units = Path(args.units).read_text().splitlines()
    ids = list(src)
    rows = ["id\tsrc_audio\tsrc_n_frames\ttgt_audio\ttgt_n_frames"]
    for utt_id, unit_line in zip(ids, units):
        _, audio, n = src[utt_id].split("\t")
        rows.append(f"{utt_id}\t{audio}\t{n}\t{unit_line}\t{len(unit_line.split())}")
    Path(args.output).write_text("\n".join(rows) + "\n")
    print(f"wrote {len(rows) - 1} rows to {args.output}")


def cmd_spm_train(args):
    """Train an SPM unigram vocab — the reference's
    ``spm_train --model_type unigram --vocab_size N`` preprocess stage
    (`preprocess_scripts/`; output layout
    ``configs/*/{src,tgt}_unigram6000/spm_unigram_*.{model,txt}``)."""
    from streamspeech_tpu.tokenizer import train_unigram

    sentences = []
    for path in args.input:
        sentences += [ln for ln in Path(path).read_text().splitlines() if ln]
    spm = train_unigram(sentences, vocab_size=args.vocab_size,
                        max_piece_len=args.max_piece_len)
    out = Path(args.model_prefix)
    out.parent.mkdir(parents=True, exist_ok=True)
    spm.save(str(out) + ".model")
    spm.save_vocab(str(out) + ".txt")
    print(f"trained {len(spm.pieces)} pieces from {len(sentences)} sentences "
          f"→ {out}.model")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("spm-train")
    s.add_argument("--input", nargs="+", required=True)
    s.add_argument("--model-prefix", required=True)
    s.add_argument("--vocab-size", type=int, default=6000)
    s.add_argument("--max-piece-len", type=int, default=16)
    s.set_defaults(fn=cmd_spm_train)

    s = sub.add_parser("extract-fbank")
    s.add_argument("--wav-list", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--zip", action="store_true")
    s.set_defaults(fn=cmd_extract_fbank)

    s = sub.add_parser("gcmvn")
    s.add_argument("--manifest", required=True)
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_gcmvn)

    s = sub.add_parser("kmeans-quantize")
    s.add_argument("--feature-list", required=True)
    s.add_argument("--centroids", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--dedup", action="store_true")
    s.set_defaults(fn=cmd_kmeans_quantize)

    s = sub.add_parser("kmeans-train")
    s.add_argument("--feature-list", required=True)
    s.add_argument("--clusters", type=int, default=1000)
    s.add_argument("--iterations", type=int, default=50)
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_kmeans_train)

    s = sub.add_parser("hubert-features")
    s.add_argument("--wav-list", required=True)
    s.add_argument("--checkpoint", required=True,
                   help="released mHuBERT .pt (see pretrain_models/README.md)")
    s.add_argument("--layer", type=int, default=11)
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_hubert_features)

    s = sub.add_parser("make-manifest")
    s.add_argument("--fbank-manifest", required=True)
    s.add_argument("--units", required=True)
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_make_manifest)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
