"""Resize dataset images in place to a target size.

Equivalent of the reference's scripts/preprocess_data.py:1-23 (LANCZOS
resize of every scene frame to 640x480).
"""

from __future__ import annotations

import argparse
import os

from PIL import Image


def resize_images(root: str, size=(640, 480)) -> int:
    n = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            p = os.path.join(dirpath, f)
            with Image.open(p) as im:
                if im.size != size:
                    im.resize(size, Image.LANCZOS).save(p)
                    n += 1
    return n


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="data/processed")
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    args = parser.parse_args(argv)
    n = resize_images(args.root, (args.width, args.height))
    print(f"resized {n} images under {args.root}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
