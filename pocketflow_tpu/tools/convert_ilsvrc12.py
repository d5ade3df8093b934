"""ILSVRC-12 converter: ImageFolder (or npz) -> .npy shards for Ilsvrc12Dataset.

The reference consumes TFRecords produced by the classic TF tooling
(/root/reference/datasets/ilsvrc12_dataset.py:39-127); this framework reads
plain pre-decoded `.npy` shards instead (no TF dependency).  This converter
produces them from a torchvision-style ImageFolder tree:

    python -m pocketflow_tpu.tools.convert_ilsvrc12 \
        --src_dir=/data/imagenet/train --dst_dir=/data/ilsvrc12 \
        --subset=train --resize=256 --shard_size=8192

Images are resized so the short side equals --resize (the on-device pipeline
does the random/center crop to 224), stored uint8 NHWC.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import List, Tuple

import numpy as np


def _load_image(path: str, resize: int) -> np.ndarray:
    from PIL import Image
    return process_pil_image(Image.open(path), resize)


def process_pil_image(img, resize: int) -> np.ndarray:
    """Short-side resize + square center crop -> uint8 HWC (shared with the
    TFRecord migration converter, tools/convert_tfrecord.py)."""
    from PIL import Image
    img = img.convert('RGB')
    w, h = img.size
    scale = resize / min(w, h)
    img = img.resize((max(resize, int(round(w * scale))),
                      max(resize, int(round(h * scale)))), Image.BILINEAR)
    # center-crop to a square `resize` so shards are uniform
    w, h = img.size
    left, top = (w - resize) // 2, (h - resize) // 2
    img = img.crop((left, top, left + resize, top + resize))
    return np.asarray(img, np.uint8)


def convert_imagefolder(src_dir: str, dst_dir: str, subset: str,
                        resize: int = 256, shard_size: int = 8192) -> int:
    classes = sorted(d for d in os.listdir(src_dir)
                     if os.path.isdir(os.path.join(src_dir, d)))
    class_to_idx = {c: i + 1 for i, c in enumerate(classes)}  # 0 = background
    samples: List[Tuple[str, int]] = []
    for cls in classes:
        for path in sorted(glob.glob(os.path.join(src_dir, cls, '*'))):
            samples.append((path, class_to_idx[cls]))
    os.makedirs(dst_dir, exist_ok=True)

    shard_idx, buf_imgs, buf_lbls, total = 0, [], [], 0
    for path, label in samples:
        try:
            buf_imgs.append(_load_image(path, resize))
            buf_lbls.append(label)
        except Exception as exc:  # unreadable image: skip, keep converting
            print('skip %s: %s' % (path, exc), file=sys.stderr)
            continue
        if len(buf_imgs) >= shard_size:
            _flush(dst_dir, subset, shard_idx, buf_imgs, buf_lbls)
            total += len(buf_imgs)
            shard_idx += 1
            buf_imgs, buf_lbls = [], []
    if buf_imgs:
        _flush(dst_dir, subset, shard_idx, buf_imgs, buf_lbls)
        total += len(buf_imgs)
    return total


def _flush(dst_dir, subset, shard_idx, images, labels):
    np.save(os.path.join(dst_dir, '%s_images_%05d.npy' % (subset, shard_idx)),
            np.stack(images))
    np.save(os.path.join(dst_dir, '%s_labels_%05d.npy' % (subset, shard_idx)),
            np.asarray(labels, np.int32))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--src_dir', required=True)
    parser.add_argument('--dst_dir', required=True)
    parser.add_argument('--subset', default='train', choices=('train', 'val'))
    parser.add_argument('--resize', type=int, default=256)
    parser.add_argument('--shard_size', type=int, default=8192)
    args = parser.parse_args(argv)
    total = convert_imagefolder(args.src_dir, args.dst_dir, args.subset,
                                args.resize, args.shard_size)
    print('converted %d images to %s' % (total, args.dst_dir))


if __name__ == '__main__':
    main()
