"""Generate ModelNet few-shot split pickles (reference datasets/generate_few_shot_data.py).

Creates data/ModelNetFewshot/{way}way_{shot}shot/{fold}.pkl files from the cached
ModelNet .dat archives: each fold samples `way` classes, `shot` train instances
per class and 20 test instances per class.

Usage: python tools/generate_few_shot_data.py --data_path data/ModelNet/modelnet40_normal_resampled
"""
import argparse
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_dat(data_path: str, split: str, npoints: int = 8192):
    cache = os.path.join(data_path, f"modelnet40_{split}_{npoints}pts_fps.dat")
    if not os.path.exists(cache):
        raise FileNotFoundError(
            f"{cache} not found — run a ModelNet job once to build the FPS cache")
    with open(cache, "rb") as f:
        points, labels = pickle.load(f)
    return points, [int(l[0]) for l in labels]


def generate_fewshot_data(data_path: str, out_root: str, way: int, shot: int,
                          num_folds: int = 10, eval_shot: int = 20, seed: int = 0):
    train_pts, train_lab = load_dat(data_path, "train")
    test_pts, test_lab = load_dat(data_path, "test")
    train_by_class = {}
    test_by_class = {}
    for p, l in zip(train_pts, train_lab):
        train_by_class.setdefault(l, []).append(p)
    for p, l in zip(test_pts, test_lab):
        test_by_class.setdefault(l, []).append(p)

    rng = random.Random(seed)
    out_dir = os.path.join(out_root, f"{way}way_{shot}shot")
    os.makedirs(out_dir, exist_ok=True)
    for fold in range(num_folds):
        classes = rng.sample(sorted(train_by_class), way)
        dataset = {"train": [], "test": []}
        for new_label, cls in enumerate(classes):
            tr = rng.sample(train_by_class[cls], shot)
            te = rng.sample(test_by_class[cls],
                            min(eval_shot, len(test_by_class[cls])))
            dataset["train"] += [(p, new_label, cls) for p in tr]
            dataset["test"] += [(p, new_label, cls) for p in te]
        with open(os.path.join(out_dir, f"{fold}.pkl"), "wb") as f:
            pickle.dump(dataset, f)
        print(f"wrote {out_dir}/{fold}.pkl "
              f"({len(dataset['train'])} train / {len(dataset['test'])} test)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path",
                        default="data/ModelNet/modelnet40_normal_resampled")
    parser.add_argument("--out_root", default="data/ModelNetFewshot")
    parser.add_argument("--folds", type=int, default=10)
    args = parser.parse_args()
    for way in (5, 10):
        for shot in (10, 20):
            generate_fewshot_data(args.data_path, args.out_root, way, shot,
                                  args.folds)


if __name__ == "__main__":
    main()
