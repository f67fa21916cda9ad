"""S3DIS semantic-segmentation CLI (reference semantic_segmentation/main.py:49-68)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser("semantic segmentation")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epoch", type=int, default=60)
    parser.add_argument("--learning_rate", type=float, default=0.0002)
    parser.add_argument("--weight_decay", type=float, default=5e-2)
    parser.add_argument("--npoint", type=int, default=2048)
    parser.add_argument("--test_area", type=int, default=5)
    parser.add_argument("--log_dir", type=str, default="act_semseg")
    parser.add_argument("--ckpts", type=str, default=None)
    parser.add_argument("--root", type=str, default="data/stanford_indoor3d")
    parser.add_argument("--num_group", type=int, default=128)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                        help="matmul/conv activation dtype (stats/losses f32)")
    parser.add_argument("--scan_steps", type=int, default=1,
                        help="train steps fused per host dispatch via "
                             "lax.scan (amortizes dispatch latency)")
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--mesh_model_parallel", type=int, default=1,
                        help="tensor-parallel mesh axis (like main.py)")
    return parser.parse_args()


def main():
    args = parse_args()
    args.experiment_path = os.path.join("./work_dirs/sem_seg", args.log_dir)
    os.makedirs(args.experiment_path, exist_ok=True)
    from act_tpu.utils.logger import get_root_logger
    logger = get_root_logger(
        log_file=os.path.join(args.experiment_path, "train.log"),
        name="SemSeg")
    from act_tpu.engine.runner_segmentation import run_semseg
    run_semseg(args, logger=logger)


if __name__ == "__main__":
    main()
