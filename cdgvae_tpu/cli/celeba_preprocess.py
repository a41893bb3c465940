"""CelebAMask-HQ preprocessing entry point (reference celeba/preprocess.py):
convert the raw corpus into per-sample [H, W, 3+5] npy files + labels."""
from __future__ import annotations

import argparse

from ..data.celeba import preprocess


def main(argv=None):
    parser = argparse.ArgumentParser("parameters")
    parser.add_argument("--base_dir", type=str, default="./CelebAMask-HQ",
                        help="directory with CelebA-HQ-img/, "
                             "CelebAMask-HQ-mask-anno/, attribute anno txt")
    parser.add_argument("--out_dir", type=str, default="./data")
    parser.add_argument("--causal_structure", type=str, default="smile",
                        help="smile or attractive")
    parser.add_argument("--img_size", type=int, default=128)
    parser.add_argument("--test", action="store_true",
                        help="write the test split instead of train")
    args = parser.parse_args(argv)
    preprocess(args.base_dir, args.out_dir, args.causal_structure,
               args.img_size, train=not args.test)


if __name__ == "__main__":
    main()
