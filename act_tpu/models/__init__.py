from act_tpu.models.build import MODELS, build_model_from_cfg
from act_tpu.models import common, teacher
from act_tpu.models.dvae import (DiscreteVAE, ACTPromptedDiscreteVAEwithVIT,
                                 ACTPromptedDiscreteVAEwithBERT)
from act_tpu.models.act import (VisableOnlyMaskTransformer, MaskTransformer,
                                ACT_PointDistillation, ACT_PointBERT)
from act_tpu.models.point_transformer import (PointTransformer, get_loss_acc,
                                              trainable_mask)
from act_tpu.models.segmentation import (PartSegTransformer, SemSegTransformer,
                                         nll_seg_loss)
