#!/usr/bin/env python
"""Host-side A/B of the input pipeline engines: Python thread pool vs the
native C++ async executor (t2igan/native/image_exec.cc).

Fabricates an on-disk COCO-layout dataset of real JPEGs (decode cost is the
point), then measures epoch throughput in images/sec through
``t2igan.data.pipeline.DataLoader`` with each engine.  Pure host work — no
TPU needed.

  python tools/microbench_loader.py --n 512 --batch 32 --size 360 --workers 6
"""

import argparse
import os
import pickle
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fabricate(root: str, n: int, size: int):
    from PIL import Image

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "train2014"), exist_ok=True)
    rng = np.random.default_rng(0)
    names, caps = [], []
    for i in range(n):
        h = size + (i % 7) * 8
        img = (rng.random((h, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "train2014", f"img_{i}.jpg"), quality=92)
        names.append(f"img_{i}")
        caps += [f"a bird with colorful wings number {i}",
                 f"small bird {i} with a long tail"]
    with open(os.path.join(root, "captions.pickle"), "wb") as f:
        pickle.dump([caps, []], f, protocol=2)
    with open(os.path.join(root, "train", "filenames.pickle"), "wb") as f:
        pickle.dump(names, f, protocol=2)
    with open(os.path.join(root, "train", "class_info.pickle"), "wb") as f:
        pickle.dump(list(range(n)), f, protocol=2)


def run(engine: str, data_dir: str, batch: int, workers: int,
        epochs: int = 2) -> float:
    from t2igan.config import Config, cfg_replace
    from t2igan.data.dataset import TextImageDataset
    from t2igan.data.pipeline import DataLoader
    from t2igan.data.tokenizer import ClipTokenizer

    cfg = cfg_replace(Config(), DATA_DIR=data_dir, DATASET_NAME="coco",
                      TEXT={"CAPTIONS_PER_IMAGE": 2})
    ds = TextImageDataset(cfg, "train")
    tok = ClipTokenizer.fallback()
    loader = DataLoader(ds, tok, batch_size=batch, words_num=77,
                        num_workers=workers, engine=engine)
    # warm epoch (page cache, lib build), then timed epochs
    n_imgs = 0
    for b in loader:
        n_imgs += len(b.keys)
    t0 = time.perf_counter()
    total = 0
    for _ in range(epochs):
        for b in loader:
            total += len(b.keys)
    dt = time.perf_counter() - t0
    return total / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=360)
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from t2igan import native

    root = tempfile.mkdtemp(prefix="t2i_loaderbench_")
    try:
        print(f"fabricating {args.n} JPEGs (~{args.size}px) ...", flush=True)
        fabricate(root, args.n, args.size)
        results = {}
        for engine in ("thread", "native"):
            if engine == "native" and not native.exec_available():
                print("native exec library unavailable; skipping")
                continue
            ips = run(engine, root, args.batch, args.workers)
            results[engine] = ips
            print(f"engine={engine:7s}  {ips:8.1f} images/sec "
                  f"(batch {args.batch}, {args.workers} workers)", flush=True)
        if len(results) == 2:
            print(f"native/thread speedup: "
                  f"{results['native'] / results['thread']:.2f}x")
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
