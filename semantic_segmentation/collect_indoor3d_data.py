"""Convert raw Stanford3dDataset (S3DIS) annotations into per-room npy files
(reference semantic_segmentation/data_utils/collect_indoor3d_data.py +
indoor3d_util.py).

Each room becomes one ``Area-N_room.npy`` of shape (M, 7): xyz rgb label, where
label indexes the 13 S3DIS classes. Output feeds S3DISDataset / WholeSceneDataset.

Usage: python semantic_segmentation/collect_indoor3d_data.py \
    --data_root data/Stanford3dDataset_v1.2_Aligned_Version --out data/stanford_indoor3d
"""
import argparse
import glob
import os
import sys

import numpy as np

CLASS_NAMES = ["ceiling", "floor", "wall", "beam", "column", "window", "door",
               "table", "chair", "sofa", "bookcase", "board", "clutter"]
CLASS_TO_LABEL = {c: i for i, c in enumerate(CLASS_NAMES)}


def collect_room(anno_path: str, out_file: str):
    """Concatenate all annotated object point files of one room."""
    points_list = []
    for f in sorted(glob.glob(os.path.join(anno_path, "*.txt"))):
        cls = os.path.basename(f).split("_")[0]
        if cls not in CLASS_TO_LABEL:
            cls = "clutter"
        pts = np.loadtxt(f)  # (n, 6) xyzrgb
        labels = np.full((pts.shape[0], 1), CLASS_TO_LABEL[cls])
        points_list.append(np.concatenate([pts, labels], axis=1))
    data = np.concatenate(points_list, axis=0)
    # shift to min corner (reference indoor3d_util.collect_point_label)
    data[:, 0:3] -= data[:, 0:3].min(axis=0)
    np.save(out_file, data.astype(np.float32))
    print(f"wrote {out_file}: {data.shape}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True,
                        help="Stanford3dDataset_v1.2_Aligned_Version dir")
    parser.add_argument("--out", default="data/stanford_indoor3d")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    annos = sorted(glob.glob(os.path.join(args.data_root, "Area_*", "*",
                                          "Annotations")))
    for anno in annos:
        parts = anno.split(os.sep)
        out_name = f"{parts[-3]}_{parts[-2]}.npy"
        try:
            collect_room(anno, os.path.join(args.out, out_name))
        except Exception as e:  # some rooms in the release have known glitches
            print(f"SKIP {anno}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
