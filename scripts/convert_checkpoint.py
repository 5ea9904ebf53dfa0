"""Checkpoint conversion CLI: reference fairseq .pt ↔ native orbax.

  # import a released StreamSpeech checkpoint into a native checkpoint dir
  python scripts/convert_checkpoint.py import --pt streamspeech.simul.fr-en.pt \
      --out ckpts/fr-en

  # export a native checkpoint back to a fairseq-layout .pt
  python scripts/convert_checkpoint.py export --checkpoint ckpts/fr-en/checkpoint_0 \
      --out model.pt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def cmd_import(args):
    import jax.numpy as jnp

    from streamspeech_tpu.config import to_dict
    from streamspeech_tpu.train.checkpoint import (
        import_fairseq_streamspeech,
        infer_config_from_params,
        save_checkpoint,
    )
    from streamspeech_tpu.train.trainer import TrainState

    params, batch_stats, _ = import_fairseq_streamspeech(args.pt)
    cfg = infer_config_from_params(params, batch_stats)

    class _S:
        pass

    state = _S()
    state.params = params
    state.batch_stats = batch_stats
    state.opt_state = {}
    state.step = jnp.zeros((), jnp.int32)
    path = save_checkpoint(args.out, 0, state, config=to_dict(cfg),
                           keep_last=1000)
    print(f"imported → {path} (config.json written alongside)")


def cmd_export(args):
    import numpy as np
    import torch

    from streamspeech_tpu.train.checkpoint import (
        export_fairseq_streamspeech,
        load_checkpoint,
    )

    restored = load_checkpoint(args.checkpoint)
    sd = export_fairseq_streamspeech(restored["params"],
                                     restored.get("batch_stats", {}))
    torch.save({"model": {k: torch.tensor(np.asarray(v))
                          for k, v in sd.items()},
                "cfg": {"arch": "streamspeech"}}, args.out)
    print(f"exported {len(sd)} tensors → {args.out}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("import")
    s.add_argument("--pt", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_import)
    s = sub.add_parser("export")
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_export)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
