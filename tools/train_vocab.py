"""Train an ORB bag-of-words vocabulary from a directory of images.

The reference ecosystem trains its DBoW2 vocabulary offline from dataset
frames (the shipped ``orb_vocab.dbow2``); this is the equivalent CLI.  Trains
either the flat FBoW-style vocabulary (default; exact MXU quantization) or
the reference-faithful hierarchical tree (``--tree k L``), and writes an
``.npz`` loadable by every runner via ``--vocab``.

Usage:
  python tools/train_vocab.py -i /data/frames -o my_vocab.npz --words 1024
  python tools/train_vocab.py -i /data/frames -o tree.npz --tree 10 3
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--image-dir", required=True)
    p.add_argument("-o", "--out", required=True, help="output .npz path")
    p.add_argument("--ext", default="png")
    p.add_argument("--words", type=int, default=1024,
                   help="flat vocabulary size")
    p.add_argument("--tree", nargs=2, type=int, metavar=("K", "L"),
                   help="train a hierarchical tree (branching K, L levels) "
                        "instead of a flat vocabulary")
    p.add_argument("--max-images", type=int, default=200)
    p.add_argument("--max-keypts", type=int, default=1000)
    p.add_argument("--num-levels", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp

    from openvslam_tpu.data.bow import TreeVocabulary, Vocabulary
    from openvslam_tpu.models.frontend import OrbFrontend
    from openvslam_tpu.utils.datasets import _imread_gray

    files = sorted(glob.glob(os.path.join(args.image_dir, f"*.{args.ext}")))
    if not files:
        p.error(f"no *.{args.ext} images under {args.image_dir}")
    step = max(1, len(files) // args.max_images)
    files = files[::step][:args.max_images]

    fe = None
    descs = []
    for i, f in enumerate(files):
        img = _imread_gray(f)
        if fe is None:
            fe = OrbFrontend(rows=img.shape[0], cols=img.shape[1],
                             max_keypts=args.max_keypts,
                             num_levels=args.num_levels)
        kp = fe.extract(jnp.asarray(img))
        v = np.asarray(kp.valid)
        descs.append(np.asarray(kp.desc_i8)[v])
        if (i + 1) % 20 == 0:
            print(f"  extracted {i + 1}/{len(files)} images "
                  f"({sum(len(d) for d in descs)} descriptors)")
    descs = np.concatenate(descs, 0)
    print(f"training on {len(descs)} descriptors from {len(files)} images")

    if args.tree:
        k, levels = args.tree
        vocab = TreeVocabulary.train(descs, k=k, levels=levels,
                                     iters=args.iters, seed=args.seed)
        print(f"tree vocabulary: k={k} L={levels} "
              f"({vocab.num_words} leaf words)")
    else:
        vocab = Vocabulary.train(descs, num_words=args.words,
                                 iters=args.iters, seed=args.seed)
        print(f"flat vocabulary: {vocab.num_words} words")
    vocab.save(args.out)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
