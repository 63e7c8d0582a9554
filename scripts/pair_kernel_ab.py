"""In-train A/B of the pair-domain DMA compositor (round 4).

Trains the bundled scan for a few epochs with the shipped ABC config vs
the same config + ``tile_pair_kernel: true`` and reports steady-state
ms/view from the trainer's per-epoch px/s log — the in-program
counterpart of bench.py's standalone render A/B (remote-dispatch
overhead cancels; axon memoization does not apply across real epochs).

Usage (TPU): python scripts/pair_kernel_ab.py [--epochs 12]
"""

import argparse
import json

from epoch_ab import run_variant


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out_root", default="/tmp/pair_kernel_ab")
    args = ap.parse_args()

    def base(raw):
        raw["model"]["tile_pair_kernel"] = False

    def pairk(raw):
        raw["model"]["tile_pair_kernel"] = True

    def segk(raw):
        raw["model"]["tile_pair_kernel"] = "seg"

    t_base = run_variant("dense", base, args.epochs, args.out_root)
    t_pair = run_variant("pairk", pairk, args.epochs, args.out_root)
    t_seg = run_variant("segk", segk, args.epochs, args.out_root)
    print(json.dumps({
        "t_dense_ms_per_view": round(t_base, 3),
        "t_pair_kernel_ms_per_view": round(t_pair, 3),
        "t_seg_kernel_ms_per_view": round(t_seg, 3),
        "speedup_pair": round(t_base / t_pair, 3),
        "speedup_seg": round(t_base / t_seg, 3),
        "in_train_px_s_pair": round(800 * 800 / (t_pair * 1e-3), 1),
        "in_train_px_s_seg": round(800 * 800 / (t_seg * 1e-3), 1)}))


if __name__ == "__main__":
    main()
