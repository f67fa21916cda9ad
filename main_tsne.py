"""t-SNE visualization entry point (reference main_tsne.py)."""
import os

from act_tpu.utils.parser import get_args
from act_tpu.utils.config import get_config, log_args_to_file, log_config_to_file
from act_tpu.utils.logger import get_root_logger
from act_tpu.utils.misc import set_random_seed
from act_tpu.parallel import initialize_distributed, process_count, process_index


def main():
    args = get_args()
    initialize_distributed()
    args.distributed = process_count() > 1
    args.local_rank = process_index()
    timestamp = __import__("time").strftime("%Y%m%d_%H%M%S")
    logger = get_root_logger(
        log_file=os.path.join(args.experiment_path, f"{timestamp}.log"),
        name=args.log_name)
    config = get_config(args, logger=logger)
    log_args_to_file(args, "args", logger=logger)
    if args.seed is not None:
        set_random_seed(args.seed, rank_shift=True)
    from act_tpu.engine import runner_tsne
    runner_tsne.tsne_net(args, config,
                         max_batches=2 if getattr(args, "smoke", False) else None)


if __name__ == "__main__":
    main()
