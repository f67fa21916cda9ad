"""Stage-I autoencoder entry point (reference main_autoencoder.py)."""
import os

from act_tpu.utils.parser import get_args
from act_tpu.utils.config import get_config, log_args_to_file, log_config_to_file
from act_tpu.utils.logger import get_root_logger
from act_tpu.utils.misc import set_random_seed
from act_tpu.parallel import initialize_distributed, process_count, process_index


def main():
    args = get_args()
    # graceful preemption: SIGTERM -> mid-epoch checkpoint + clean exit
    from act_tpu.engine.preemption import GUARD
    GUARD.install()
    initialize_distributed()
    args.distributed = process_count() > 1
    args.local_rank = process_index()

    timestamp = __import__("time").strftime("%Y%m%d_%H%M%S")
    log_file = os.path.join(args.experiment_path, f"{timestamp}.log")
    logger = get_root_logger(log_file=log_file, name=args.log_name)
    from act_tpu.utils.writer import get_writer, basic_log
    train_writer = get_writer(os.path.join(args.tfboard_path, "train"))
    val_writer = get_writer(os.path.join(args.tfboard_path, "test"))
    config = get_config(args, logger=logger)
    log_args_to_file(args, "args", logger=logger)
    log_config_to_file(config, "config", logger=logger)
    if args.seed is not None:
        set_random_seed(args.seed, rank_shift=True)

    from act_tpu.engine import runner_autoencoder
    if args.test:
        runner_autoencoder.test_net(args, config)
    elif args.val:
        runner_autoencoder.validate_net(args, config)
    else:
        runner_autoencoder.run_net(args, config, train_writer, val_writer)


if __name__ == "__main__":
    main()
