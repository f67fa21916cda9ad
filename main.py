"""Entry point: pretrain / finetune / test dispatch (reference main.py).

Same flags, same experiment-dir layout, same config YAMLs; process/device wiring is
jax.distributed + a device mesh instead of torch.distributed/NCCL.
"""
import os

from act_tpu.utils.parser import get_args
from act_tpu.utils.config import get_config, log_args_to_file, log_config_to_file
from act_tpu.utils.logger import get_root_logger
from act_tpu.utils.misc import set_random_seed
from act_tpu.parallel import initialize_distributed, process_count, process_index


def main():
    args = get_args()
    # graceful preemption: SIGTERM -> mid-epoch checkpoint + clean exit
    # (runners poll the guard at step boundaries; engine/preemption.py)
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
    # per-process batch size: config.total_bs stays global; the DataLoader shards
    # the index space per process and the mesh shards each global batch (the
    # reference divides bs per rank at main.py:44-58)
    log_args_to_file(args, "args", logger=logger)
    log_config_to_file(config, "config", logger=logger)

    if getattr(args, "sync_bn", False):
        # SyncBN is implicit here: batches are sharded over the data mesh axis
        # inside one jitted program, so BatchNorm statistics are computed over
        # the GLOBAL batch (GSPMD inserts the cross-chip reduction). The flag
        # is accepted for CLI parity with the reference (--sync_bn wraps the
        # model in torch SyncBatchNorm, runner_pretrain.py:86-88).
        from act_tpu.utils.logger import print_log
        print_log("[ARGS] --sync_bn: BatchNorm stats are global-batch by "
                  "construction under GSPMD data parallelism; flag is a no-op",
                  logger=logger)

    if args.seed is not None:
        set_random_seed(args.seed, rank_shift=True)
    if args.way != -1 and args.shot != -1:
        config.dataset.train.others.way = args.way
        config.dataset.train.others.shot = args.shot
        config.dataset.train.others.fold = args.fold
        config.dataset.val.others.way = args.way
        config.dataset.val.others.shot = args.shot
        config.dataset.val.others.fold = args.fold

    if args.test:
        from act_tpu.engine import runner_finetune
        runner_finetune.test_net(args, config)
    elif args.finetune_model or args.scratch_model:
        from act_tpu.engine import runner_finetune
        runner_finetune.run_net(args, config, train_writer, val_writer)
    else:
        from act_tpu.engine import runner_pretrain
        runner_pretrain.run_net(args, config, train_writer, val_writer)


if __name__ == "__main__":
    main()
