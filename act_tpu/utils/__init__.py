from act_tpu.utils.registry import Registry, build_from_cfg
from act_tpu.utils.config import (ConfigDict, cfg_from_yaml_file, get_config,
                                  merge_new_config, log_args_to_file, log_config_to_file)
from act_tpu.utils.logger import get_logger, get_root_logger, print_log
from act_tpu.utils.meters import AverageMeter
