"""Whole-scene S3DIS voting evaluation CLI (reference semantic_segmentation/main_test.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser("semantic segmentation whole-scene test")
    parser.add_argument("--npoint", type=int, default=2048)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                        help="matmul/conv activation dtype (stats/losses f32)")
    parser.add_argument("--test_area", type=int, default=5)
    parser.add_argument("--log_dir", type=str, default="act_semseg")
    parser.add_argument("--ckpts", type=str, default=None)
    parser.add_argument("--root", type=str, default="data/stanford_indoor3d")
    parser.add_argument("--num_votes", type=int, default=3)
    parser.add_argument("--eval_batch_size", type=int, default=16,
                        help="sliding-window blocks batched per forward "
                             "(votes numerically identical up to float "
                             "reassociation from XLA batch tiling)")
    parser.add_argument("--smoke", action="store_true")
    return parser.parse_args()


def main():
    args = parse_args()
    args.experiment_path = os.path.join("./work_dirs/sem_seg", args.log_dir)
    os.makedirs(args.experiment_path, exist_ok=True)
    from act_tpu.utils.logger import get_root_logger
    logger = get_root_logger(
        log_file=os.path.join(args.experiment_path, "test.log"), name="SemSeg")
    from act_tpu.engine.runner_segmentation import whole_scene_eval
    whole_scene_eval(args, logger=logger,
                     vote_num=1 if args.smoke else args.num_votes)


if __name__ == "__main__":
    main()
