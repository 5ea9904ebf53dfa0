"""Checkpoint averaging CLI — `fairseq/scripts/average_checkpoints.py` equivalent
over native orbax checkpoints.

python -m streamspeech_tpu.cli.average_checkpoints \
    --inputs /ck/checkpoint_10 /ck/checkpoint_20 --output /ck/averaged
python -m streamspeech_tpu.cli.average_checkpoints \
    --inputs /ck --num-last 5 --output /ck/averaged
"""

import argparse
from pathlib import Path


def collect_inputs(inputs, num_last=None):
    if len(inputs) == 1 and Path(inputs[0]).is_dir() and \
            not (Path(inputs[0]) / "_METADATA").exists():
        d = Path(inputs[0])
        ckpts = sorted(d.glob("checkpoint_*"),
                       key=lambda p: int(p.name.split("_")[-1]))
        if not ckpts:
            raise FileNotFoundError(f"no checkpoint_* under {d}")
        if num_last:
            ckpts = ckpts[-num_last:]
        return [str(p) for p in ckpts]
    return list(inputs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inputs", nargs="+", required=True,
                   help="checkpoint paths, or one save dir (see --num-last)")
    p.add_argument("--num-last", type=int, default=None,
                   help="with a single save-dir input: average the last N")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")  # host-side averaging only
    except Exception:
        pass
    import orbax.checkpoint as ocp

    from streamspeech_tpu.train.checkpoint import average_checkpoints

    paths = collect_inputs(args.inputs, args.num_last)
    print(f"averaging {len(paths)} checkpoints:")
    for path in paths:
        print(f"  {path}")
    payload = average_checkpoints(paths)
    out = Path(args.output).absolute()
    ocp.PyTreeCheckpointer().save(out, payload, force=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
