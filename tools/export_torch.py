"""Export a framework checkpoint as a reference PyTorch checkpoint.

    python tools/export_torch.py --checkpoint checkpoints/run/best_model.ckpt \
        --output best_model.pth

The output is a reference-trainer-schema `torch.save` file (epoch,
model_state_dict, best_loss, config, ema_model_state_dict when present)
that the reference's `sample.py` / `evaluate.py` consume directly — the
inverse of importing reference `.pth` files into this framework
(utils/torch_import.py). Migration works in both directions.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diffusion_models_collection_tpu.utils.checkpoint import load_checkpoint
from diffusion_models_collection_tpu.utils.torch_export import (
    save_reference_checkpoint,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="framework checkpoint (.ckpt or orbax dir)")
    ap.add_argument("--output", required=True,
                    help="output .pth path (reference torch.save format)")
    ap.add_argument("--allow_unsafe_pickle", action="store_true",
                    help="load checkpoints with types outside the "
                         "restricted allowlist")
    args = ap.parse_args()

    payload = load_checkpoint(args.checkpoint,
                              allow_unsafe=args.allow_unsafe_pickle)
    config = payload.get("config")
    if not config:
        raise SystemExit("checkpoint has no embedded config — cannot "
                         "reconstruct the torch module layout")
    save_reference_checkpoint(
        args.output,
        params=payload["model_state_dict"],
        config=config,
        ema_params=payload.get("ema_model_state_dict"),
        epoch=payload.get("epoch", 0),
        best_loss=payload.get("best_loss", float("inf")),
    )
    print(f"Wrote {args.output} "
          f"({'with' if payload.get('ema_model_state_dict') is not None else 'no'} EMA)")


if __name__ == "__main__":
    main()
