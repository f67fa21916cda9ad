"""Convert reference PyTorch checkpoints (.pth) into act_tpu flax param trees.

Covers the released ACT checkpoints (model_zoo: dVAE, pretrain, finetune) and the
key surgery the reference applies on load (strip ``module.`` / ``ACT_encoder.`` /
``base_model.`` — models/act.py:829-867, part_segmentation/models/pt.py:250-276).

Layout translations torch -> flax (channels-last design):
- Linear:            weight (out,in)      -> kernel (in,out) = W.T
- Conv1d k=1:        weight (out,in,1)    -> kernel (in,out)
- Conv2d k=1x1:      weight (out,in,1,1)  -> kernel (in,out)
- BatchNorm/GroupNorm/LayerNorm: weight/bias -> scale/bias (+ running stats into
  the batch_stats collection for BN)
- qkv fused Dense: same transpose (head layout matches: reshape(3, H, hd) row-major)

Usage::

    sd = load_torch_state_dict('ckpt_act_dvae.pth')
    params, batch_stats = convert_state_dict(sd, DVAE_RULES)
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from act_tpu.utils.logger import print_log


def load_torch_state_dict(path: str, key: str = "base_model") -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    for k in (key, "state_dict", "model_state_dict", "model"):
        if isinstance(sd, dict) and k in sd:
            sd = sd[k]
            break
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# rule engine: (regex, flax-path-template, transform)
# transform: 'linear' (transpose), 'conv1d', 'conv2d', 'none'
# ---------------------------------------------------------------------------

def _xform(arr: np.ndarray, how: str) -> np.ndarray:
    if how == "linear":
        return arr.T
    if how == "conv1d":
        return arr[:, :, 0].T
    if how == "conv2d":
        return arr[:, :, 0, 0].T
    return arr


def fold_encoder_conv_bias(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold the bias of a conv that is immediately followed by a BatchNorm
    into that BN's running_mean (rm' = rm - b) and drop the bias key.

    Our GroupEncoder's conv1/conv3 carry no bias (BN mean subtraction absorbs
    it; see models/common.py) — eval outputs through converted stats stay
    exact. Applied automatically by :func:`convert_state_dict`."""
    out = dict(sd)
    # (bn_running_mean_pattern, conv_bias_index_offset): first/second_conv
    # pair conv .0 with bn .1; the FoldingNet final stack pairs .0->.1 and
    # .3->.4 (reference Decoder final_conv, models/dvae.py:252-259)
    pairs = [
        (r"^(.*\.(?:first|second)_conv)\.1\.running_mean$", "0"),
        (r"^(.*\.final_conv)\.1\.running_mean$", "0"),
        (r"^(.*\.final_conv)\.4\.running_mean$", "3"),
    ]
    for k in list(sd):
        for pat, conv_idx in pairs:
            m = re.match(pat, k)
            if not m:
                continue
            bias_key = f"{m.group(1)}.{conv_idx}.bias"
            if bias_key in sd:
                out[k] = np.asarray(out[k]) - np.asarray(sd[bias_key])
                out.pop(bias_key, None)
    return out


# rules shared by every model that embeds the mini-PointNet group encoder
def encoder_rules(src: str, dst: str) -> List[Tuple[str, str, str]]:
    """torch ``{src}.first_conv/second_conv`` -> flax ``{dst}/conv*/bn*``.

    conv1/conv3 (first_conv.0 / second_conv.0) biases are folded into the BN
    running means by :func:`fold_encoder_conv_bias`, not mapped."""
    R = []
    conv_map = [("first_conv.0", "conv1", "conv1d"), ("first_conv.3", "conv2", "conv1d"),
                ("second_conv.0", "conv3", "conv1d"), ("second_conv.3", "conv4", "conv1d")]
    for tsrc, tdst, how in conv_map:
        R.append((rf"^{src}\.{tsrc}\.weight$", f"{dst}/{tdst}/kernel", how))
        if tdst in ("conv2", "conv4"):
            R.append((rf"^{src}\.{tsrc}\.bias$", f"{dst}/{tdst}/bias", "none"))
    for tsrc, tdst in [("first_conv.1", "bn1"), ("second_conv.1", "bn2")]:
        R.append((rf"^{src}\.{tsrc}\.weight$", f"{dst}/{tdst}/scale", "none"))
        R.append((rf"^{src}\.{tsrc}\.bias$", f"{dst}/{tdst}/bias", "none"))
        R.append((rf"^{src}\.{tsrc}\.running_mean$", f"BS:{dst}/{tdst}/mean", "none"))
        R.append((rf"^{src}\.{tsrc}\.running_var$", f"BS:{dst}/{tdst}/var", "none"))
    return R


def dgcnn_rules(src: str, dst: str) -> List[Tuple[str, str, str]]:
    R = [(rf"^{src}\.input_trans\.weight$", f"{dst}/input_trans/kernel", "conv1d"),
         (rf"^{src}\.input_trans\.bias$", f"{dst}/input_trans/bias", "none")]
    for i in range(1, 6):
        how = "conv1d" if i == 5 else "conv2d"
        R.append((rf"^{src}\.layer{i}\.0\.weight$", f"{dst}/layer{i}/conv/kernel", how))
        R.append((rf"^{src}\.layer{i}\.1\.weight$", f"{dst}/layer{i}/gn/scale", "none"))
        R.append((rf"^{src}\.layer{i}\.1\.bias$", f"{dst}/layer{i}/gn/bias", "none"))
    return R


def vit_block_rules(src: str, dst: str) -> List[Tuple[str, str, str]]:
    """timm/our transformer Block: ``{src}.N.*`` -> ``{dst}/blocks_N/*``."""
    N = r"(\d+)"
    return [
        (rf"^{src}\.{N}\.norm1\.weight$", f"{dst}/blocks_\\1/norm1/scale", "none"),
        (rf"^{src}\.{N}\.norm1\.bias$", f"{dst}/blocks_\\1/norm1/bias", "none"),
        (rf"^{src}\.{N}\.norm2\.weight$", f"{dst}/blocks_\\1/norm2/scale", "none"),
        (rf"^{src}\.{N}\.norm2\.bias$", f"{dst}/blocks_\\1/norm2/bias", "none"),
        (rf"^{src}\.{N}\.attn\.qkv\.weight$", f"{dst}/blocks_\\1/attn/qkv/kernel", "linear"),
        (rf"^{src}\.{N}\.attn\.qkv\.bias$", f"{dst}/blocks_\\1/attn/qkv/bias", "none"),
        (rf"^{src}\.{N}\.attn\.proj\.weight$", f"{dst}/blocks_\\1/attn/proj/kernel", "linear"),
        (rf"^{src}\.{N}\.attn\.proj\.bias$", f"{dst}/blocks_\\1/attn/proj/bias", "none"),
        (rf"^{src}\.{N}\.mlp\.fc1\.weight$", f"{dst}/blocks_\\1/mlp/fc1/kernel", "linear"),
        (rf"^{src}\.{N}\.mlp\.fc1\.bias$", f"{dst}/blocks_\\1/mlp/fc1/bias", "none"),
        (rf"^{src}\.{N}\.mlp\.fc2\.weight$", f"{dst}/blocks_\\1/mlp/fc2/kernel", "linear"),
        (rf"^{src}\.{N}\.mlp\.fc2\.bias$", f"{dst}/blocks_\\1/mlp/fc2/bias", "none"),
    ]


def pos_embed_rules(src: str, dst: str) -> List[Tuple[str, str, str]]:
    return [
        (rf"^{src}\.0\.weight$", f"{dst}/fc1/kernel", "linear"),
        (rf"^{src}\.0\.bias$", f"{dst}/fc1/bias", "none"),
        (rf"^{src}\.2\.weight$", f"{dst}/fc2/kernel", "linear"),
        (rf"^{src}\.2\.bias$", f"{dst}/fc2/bias", "none"),
    ]


def folding_decoder_rules(src: str, dst: str) -> List[Tuple[str, str, str]]:
    R = []
    for tsrc, tdst, how in [("mlp.0", "mlp1", "linear"), ("mlp.2", "mlp2", "linear"),
                            ("mlp.4", "mlp3", "linear"),
                            ("final_conv.0", "final1", "conv1d"),
                            ("final_conv.3", "final2", "conv1d"),
                            ("final_conv.6", "final3", "conv1d")]:
        R.append((rf"^{src}\.{tsrc}\.weight$", f"{dst}/{tdst}/kernel", how))
        if tdst not in ("final1", "final2"):
            # final1/final2 biases are folded into fbn running_mean by
            # fold_encoder_conv_bias (the flax modules carry no bias)
            R.append((rf"^{src}\.{tsrc}\.bias$", f"{dst}/{tdst}/bias", "none"))
    for tsrc, tdst in [("final_conv.1", "fbn1"), ("final_conv.4", "fbn2")]:
        R.append((rf"^{src}\.{tsrc}\.weight$", f"{dst}/{tdst}/scale", "none"))
        R.append((rf"^{src}\.{tsrc}\.bias$", f"{dst}/{tdst}/bias", "none"))
        R.append((rf"^{src}\.{tsrc}\.running_mean$", f"BS:{dst}/{tdst}/mean", "none"))
        R.append((rf"^{src}\.{tsrc}\.running_var$", f"BS:{dst}/{tdst}/var", "none"))
    return R


def clip_block_rules(src: str, dst: str) -> List[Tuple[str, str, str]]:
    """CLIP ResidualAttentionBlock: ``{src}.N.*`` -> ``{dst}/blocks_N/*``.

    torch layout (clip visual.transformer.resblocks.N): ln_1/ln_2, fused
    attn.in_proj_{weight,bias} + attn.out_proj, mlp.c_fc/mlp.c_proj."""
    N = r"(\d+)"
    return [
        (rf"^{src}\.{N}\.ln_1\.weight$", f"{dst}/blocks_\\1/ln_1/scale", "none"),
        (rf"^{src}\.{N}\.ln_1\.bias$", f"{dst}/blocks_\\1/ln_1/bias", "none"),
        (rf"^{src}\.{N}\.ln_2\.weight$", f"{dst}/blocks_\\1/ln_2/scale", "none"),
        (rf"^{src}\.{N}\.ln_2\.bias$", f"{dst}/blocks_\\1/ln_2/bias", "none"),
        (rf"^{src}\.{N}\.attn\.in_proj_weight$",
         f"{dst}/blocks_\\1/attn/qkv/kernel", "linear"),
        (rf"^{src}\.{N}\.attn\.in_proj_bias$",
         f"{dst}/blocks_\\1/attn/qkv/bias", "none"),
        (rf"^{src}\.{N}\.attn\.out_proj\.weight$",
         f"{dst}/blocks_\\1/attn/proj/kernel", "linear"),
        (rf"^{src}\.{N}\.attn\.out_proj\.bias$",
         f"{dst}/blocks_\\1/attn/proj/bias", "none"),
        (rf"^{src}\.{N}\.mlp\.c_fc\.weight$",
         f"{dst}/blocks_\\1/c_fc/kernel", "linear"),
        (rf"^{src}\.{N}\.mlp\.c_fc\.bias$", f"{dst}/blocks_\\1/c_fc/bias", "none"),
        (rf"^{src}\.{N}\.mlp\.c_proj\.weight$",
         f"{dst}/blocks_\\1/c_proj/kernel", "linear"),
        (rf"^{src}\.{N}\.mlp\.c_proj\.bias$",
         f"{dst}/blocks_\\1/c_proj/bias", "none"),
    ]


def _teacher_shared_rules(p: str, dst: str) -> List[Tuple[str, str, str]]:
    """proj_pre/proj_post/pos-embed/prompt params common to every teacher arch
    (reference dvae.py:412-437; siblings of visual_embed in torch, children of
    our PromptedTeacher in flax)."""
    R = [
        (rf"^{p}proj_pre\.weight$", f"{dst}/proj_pre/kernel", "linear"),
        (rf"^{p}proj_pre\.bias$", f"{dst}/proj_pre/bias", "none"),
        (rf"^{p}proj_post\.weight$", f"{dst}/proj_post/kernel", "linear"),
        (rf"^{p}proj_post\.bias$", f"{dst}/proj_post/bias", "none"),
        (rf"^{p}visual_prompt_token$", f"{dst}/visual_prompt_token", "none"),
        (rf"^{p}visual_prompt_pos$", f"{dst}/visual_prompt_pos", "none"),
        (rf"^{p}deep_prompt_tokens$", f"{dst}/deep_prompt_tokens", "none"),
        (rf"^{p}deep_prompt_pos$", f"{dst}/deep_prompt_pos", "none"),
        (rf"^{p}visual_pos_embed\.0\.weight$", f"{dst}/pos_fc1/kernel", "linear"),
        (rf"^{p}visual_pos_embed\.0\.bias$", f"{dst}/pos_fc1/bias", "none"),
        (rf"^{p}visual_pos_embed\.2\.weight$", f"{dst}/pos_fc2/kernel", "linear"),
        (rf"^{p}visual_pos_embed\.2\.bias$", f"{dst}/pos_fc2/bias", "none"),
    ]
    return R


def clip_teacher_rules(src_prefix: str, dst: str) -> List[Tuple[str, str, str]]:
    """CLIP teacher inside an ACT checkpoint: visual_embed = Sequential(
    ln_pre=0, resblocks=1, ln_post=2) — reference dvae.py:396-403."""
    p = rf"{src_prefix}" if not src_prefix else rf"{src_prefix}\."
    R = _teacher_shared_rules(p, dst)
    R += [
        (rf"^{p}visual_embed\.0\.weight$", f"{dst}/ln_pre/scale", "none"),
        (rf"^{p}visual_embed\.0\.bias$", f"{dst}/ln_pre/bias", "none"),
        (rf"^{p}visual_embed\.2\.weight$", f"{dst}/ln_post/scale", "none"),
        (rf"^{p}visual_embed\.2\.bias$", f"{dst}/ln_post/bias", "none"),
    ]
    R += clip_block_rules(rf"{p}visual_embed\.1".replace("\\.\\.", "\\."), dst)
    return R


def fuse_bert_qkv(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pre-pass for HuggingFace BERT layouts: concatenate the separate
    query/key/value projections of every ``*.attention.self`` into one fused
    ``*.attention.self.qkv`` tensor (rows stay torch (out,in); the 'linear'
    transform then yields our (in, 3C) qkv kernel with columns q|k|v, matching
    Attention's reshape(B,N,3,H,hd) layout)."""
    out = dict(sd)
    for k in list(sd):
        m = re.match(r"^(.*\.attention\.self)\.query\.(weight|bias)$", k)
        if not m:
            continue
        base, kind = m.groups()
        parts = [sd.get(f"{base}.{n}.{kind}") for n in ("query", "key", "value")]
        if any(p is None for p in parts):
            continue
        out[f"{base}.qkv.{kind}"] = np.concatenate(
            [np.asarray(p) for p in parts], axis=0)
        for n in ("query", "key", "value"):
            out.pop(f"{base}.{n}.{kind}", None)
    return out


def bert_block_rules(src: str, dst: str) -> List[Tuple[str, str, str]]:
    """HF BertLayer: ``{src}.N.*`` -> ``{dst}/blocks_N/*`` (PostLNBlock).

    torch layout (transformers BertModel.encoder.layer.N, reference
    dvae.py:652-663): attention.self.{query,key,value} (fused by
    :func:`fuse_bert_qkv` first), attention.output.dense + LayerNorm,
    intermediate.dense, output.dense + LayerNorm."""
    N = r"(\d+)"
    return [
        (rf"^{src}\.{N}\.attention\.self\.qkv\.weight$",
         f"{dst}/blocks_\\1/attn/qkv/kernel", "linear"),
        (rf"^{src}\.{N}\.attention\.self\.qkv\.bias$",
         f"{dst}/blocks_\\1/attn/qkv/bias", "none"),
        (rf"^{src}\.{N}\.attention\.output\.dense\.weight$",
         f"{dst}/blocks_\\1/attn/proj/kernel", "linear"),
        (rf"^{src}\.{N}\.attention\.output\.dense\.bias$",
         f"{dst}/blocks_\\1/attn/proj/bias", "none"),
        (rf"^{src}\.{N}\.attention\.output\.LayerNorm\.weight$",
         f"{dst}/blocks_\\1/norm1/scale", "none"),
        (rf"^{src}\.{N}\.attention\.output\.LayerNorm\.bias$",
         f"{dst}/blocks_\\1/norm1/bias", "none"),
        (rf"^{src}\.{N}\.intermediate\.dense\.weight$",
         f"{dst}/blocks_\\1/mlp/fc1/kernel", "linear"),
        (rf"^{src}\.{N}\.intermediate\.dense\.bias$",
         f"{dst}/blocks_\\1/mlp/fc1/bias", "none"),
        (rf"^{src}\.{N}\.output\.dense\.weight$",
         f"{dst}/blocks_\\1/mlp/fc2/kernel", "linear"),
        (rf"^{src}\.{N}\.output\.dense\.bias$",
         f"{dst}/blocks_\\1/mlp/fc2/bias", "none"),
        (rf"^{src}\.{N}\.output\.LayerNorm\.weight$",
         f"{dst}/blocks_\\1/norm2/scale", "none"),
        (rf"^{src}\.{N}\.output\.LayerNorm\.bias$",
         f"{dst}/blocks_\\1/norm2/bias", "none"),
    ]


def bert_teacher_rules(src_prefix: str, dst: str) -> List[Tuple[str, str, str]]:
    """BERT teacher inside an ACT checkpoint: visual_embed = Sequential(
    BertModel.encoder) so blocks live at visual_embed.0.layer.N
    (reference dvae.py:660-663). Run :func:`fuse_bert_qkv` on the state dict
    first. BERT has no final LN after the encoder."""
    p = rf"{src_prefix}" if not src_prefix else rf"{src_prefix}\."
    R = _teacher_shared_rules(p, dst)
    R += bert_block_rules(
        rf"{p}visual_embed\.0\.layer".replace("\\.\\.", "\\."), dst)
    return R


def load_hf_bert(sd: Dict[str, np.ndarray], dst: str = "visual_embed",
                 logger=None) -> Tuple[dict, dict]:
    """Convert a raw HuggingFace bert-base state_dict's encoder layers into the
    teacher subtree (ingesting an official bert-base-uncased checkpoint file,
    the reference's BertModel.from_pretrained path, dvae.py:660)."""
    sd = {k[len("bert."):] if k.startswith("bert.") else k: v
          for k, v in sd.items()}
    sd = fuse_bert_qkv(sd)
    return convert_state_dict(sd, bert_block_rules(r"encoder\.layer", dst),
                              logger=logger)


def load_clip_visual(sd: Dict[str, np.ndarray], dst: str = "visual_embed",
                     logger=None) -> Tuple[dict, dict]:
    """Convert a raw CLIP model state_dict's visual transformer (ln_pre,
    resblocks, ln_post) into the teacher subtree (the reference's
    clip.load(...).visual path, dvae.py:394-403)."""
    rules = clip_block_rules(r"visual\.transformer\.resblocks", dst) + [
        (r"^visual\.ln_pre\.weight$", f"{dst}/ln_pre/scale", "none"),
        (r"^visual\.ln_pre\.bias$", f"{dst}/ln_pre/bias", "none"),
        (r"^visual\.ln_post\.weight$", f"{dst}/ln_post/scale", "none"),
        (r"^visual\.ln_post\.bias$", f"{dst}/ln_post/bias", "none")]
    return convert_state_dict(sd, rules, logger=logger)


def teacher_rules(src_prefix: str, dst: str) -> List[Tuple[str, str, str]]:
    """Prompted teacher of the dVAE: proj/pos/prompts + timm blocks.

    torch layout (dvae.py:405-437): visual_embed.0 = timm blocks (Sequential idx),
    visual_embed.1 = final norm; proj_pre/proj_post/visual_pos_embed/prompts are
    siblings of visual_embed in the torch module, but children of ``visual_embed``
    in our flax tree (PromptedTeacher owns them).
    """
    p = rf"{src_prefix}" if not src_prefix else rf"{src_prefix}\."
    R = _teacher_shared_rules(p, dst)
    R += [
        (rf"^{p}visual_embed\.1\.weight$", f"{dst}/norm/scale", "none"),
        (rf"^{p}visual_embed\.1\.bias$", f"{dst}/norm/bias", "none"),
    ]
    R += vit_block_rules(rf"{p}visual_embed\.0".replace("\\.\\.", "\\."), dst)
    return R


def dvae_rules(prefix: str = "", teacher_arch: str = "vit"
               ) -> List[Tuple[str, str, str]]:
    """Full (prompted) DiscreteVAE. ``prefix``: torch prefix like
    'dvae_tokenizer'. ``teacher_arch``: 'vit' (timm), 'clip', or 'bert' —
    selects the visual_embed key layout (reference dvae.py:394-410,652-663)."""
    p = rf"{re.escape(prefix)}\." if prefix else ""
    d = f"{prefix}/" if prefix else ""
    R = []
    R += encoder_rules((prefix + "." if prefix else "") + "encoder", f"{d}encoder")
    R += dgcnn_rules((prefix + "." if prefix else "") + "dgcnn_1", f"{d}dgcnn_1")
    R += dgcnn_rules((prefix + "." if prefix else "") + "dgcnn_2", f"{d}dgcnn_2")
    R += [(rf"^{p}codebook$", f"{d}codebook", "none")]
    R += folding_decoder_rules((prefix + "." if prefix else "") + "decoder",
                               f"{d}decoder")
    if teacher_arch == "clip":
        R += clip_teacher_rules(prefix, f"{d}visual_embed")
    elif teacher_arch == "bert":
        R += bert_teacher_rules(prefix, f"{d}visual_embed")
    else:
        R += teacher_rules(prefix, f"{d}visual_embed")
    return R


def student_rules(prefix: str = "ACT_encoder") -> List[Tuple[str, str, str]]:
    """VisableOnlyMaskTransformer / PointTransformer trunk."""
    p = rf"{re.escape(prefix)}\." if prefix else ""
    d = f"{prefix}/" if prefix else ""
    R = []
    R += encoder_rules((prefix + "." if prefix else "") + "encoder", f"{d}encoder")
    R += [
        (rf"^{p}cls_token$", f"{d}cls_token", "none"),
        (rf"^{p}cls_pos$", f"{d}cls_pos", "none"),
        (rf"^{p}reduce_dim\.weight$", f"{d}reduce_dim/kernel", "linear"),
        (rf"^{p}reduce_dim\.bias$", f"{d}reduce_dim/bias", "none"),
        (rf"^{p}norm\.weight$", f"{d}norm/scale", "none"),
        (rf"^{p}norm\.bias$", f"{d}norm/bias", "none"),
        (rf"^{p}lm_head\.weight$", f"{d}lm_head/kernel", "linear"),
        (rf"^{p}lm_head\.bias$", f"{d}lm_head/bias", "none"),
        (rf"^{p}cls_head\.0\.weight$", f"{d}cls_head/layers_0/kernel", "linear"),
        (rf"^{p}cls_head\.0\.bias$", f"{d}cls_head/layers_0/bias", "none"),
        (rf"^{p}cls_head\.2\.weight$", f"{d}cls_head/layers_2/kernel", "linear"),
        (rf"^{p}cls_head\.2\.bias$", f"{d}cls_head/layers_2/bias", "none"),
    ]
    R += pos_embed_rules((prefix + "." if prefix else "") + "pos_embed",
                         f"{d}pos_embed")
    R += vit_block_rules(rf"{p}blocks\.blocks".replace("\\.\\.", "\\."),
                         f"{d}blocks")
    return R


def point_transformer_rules(head: str = "mlp-3") -> List[Tuple[str, str, str]]:
    """Finetune PointTransformer. ``head``: 'mlp-3' (default head) or 'linear'
    — the reference's linear head is Sequential(Linear) so its keys are also
    cls_head_finetune.0.* and only the head type disambiguates
    (models/act.py:772-788)."""
    R = student_rules(prefix="")
    if head == "linear":
        R.append((r"^cls_head_finetune\.0\.weight$",
                  "cls_head_finetune/kernel", "linear"))
        R.append((r"^cls_head_finetune\.0\.bias$",
                  "cls_head_finetune/bias", "none"))
        return R
    # mlp-3 head: Sequential 0/1/4/5/8 -> fc1/bn1/fc2/bn2/fc3
    for tsrc, tdst, how in [("0", "fc1", "linear"), ("4", "fc2", "linear"),
                            ("8", "fc3", "linear")]:
        R.append((rf"^cls_head_finetune\.{tsrc}\.weight$",
                  f"cls_head_finetune/{tdst}/kernel", how))
        R.append((rf"^cls_head_finetune\.{tsrc}\.bias$",
                  f"cls_head_finetune/{tdst}/bias", "none"))
    for tsrc, tdst in [("1", "bn1"), ("5", "bn2")]:
        R.append((rf"^cls_head_finetune\.{tsrc}\.weight$",
                  f"cls_head_finetune/{tdst}/scale", "none"))
        R.append((rf"^cls_head_finetune\.{tsrc}\.bias$",
                  f"cls_head_finetune/{tdst}/bias", "none"))
        R.append((rf"^cls_head_finetune\.{tsrc}\.running_mean$",
                  f"BS:cls_head_finetune/{tdst}/mean", "none"))
        R.append((rf"^cls_head_finetune\.{tsrc}\.running_var$",
                  f"BS:cls_head_finetune/{tdst}/var", "none"))
    return R


def act_distillation_rules(teacher_arch: str = "vit"
                           ) -> List[Tuple[str, str, str]]:
    R = student_rules("ACT_encoder")
    R += dvae_rules("dvae_tokenizer", teacher_arch=teacher_arch)
    R += [
        (r"^mask_token$", "mask_token", "none"),
        (r"^proj_head\.weight$", "proj_head/kernel", "linear"),
        (r"^proj_head\.bias$", "proj_head/bias", "none"),
        (r"^cls_pos$", "cls_pos", "none"),
    ]
    R += pos_embed_rules("decoder_pos_embed", "decoder_pos_embed")
    R += vit_block_rules(r"ACT_decoder\.blocks", "ACT_decoder")
    R += [(r"^ACT_decoder\.norm\.weight$", "ACT_decoder/norm/scale", "none"),
          (r"^ACT_decoder\.norm\.bias$", "ACT_decoder/norm/bias", "none")]
    return R


def seg_rules(with_label: bool) -> List[Tuple[str, str, str]]:
    """Part/semantic segmentation get_model -> {Part,Sem}SegTransformer
    (reference part_segmentation/models/pt.py:178-355 and
    semantic_segmentation/models/pt.py:178-350; one shared flax head,
    models/segmentation.py). Head keys accept BOTH the current ``*_cls``
    names and the pre-rename released-checkpoint names (the reference's
    load_model_from_ckpt_withrename maps between them,
    semantic_segmentation/models/pt.py:280-300)."""
    C = r"(?:_cls)?"
    R = []
    R += encoder_rules("encoder", "backbone/encoder")
    R += pos_embed_rules("pos_embed", "backbone/pos_embed")
    R += vit_block_rules(r"blocks\.blocks", "backbone/blocks")
    R += [(r"^norm\.weight$", "backbone/norm/scale", "none"),
          (r"^norm\.bias$", "backbone/norm/bias", "none")]
    # 3-NN propagation MLP: Conv1d(k=1) + BN pairs
    for i in (0, 1):
        R += [
            (rf"^propagation_0{C}\.mlp_convs\.{i}\.weight$",
             f"head/propagation_0/conv{i}/kernel", "conv1d"),
            (rf"^propagation_0{C}\.mlp_convs\.{i}\.bias$",
             f"head/propagation_0/conv{i}/bias", "none"),
            (rf"^propagation_0{C}\.mlp_bns\.{i}\.weight$",
             f"head/propagation_0/bn{i}/scale", "none"),
            (rf"^propagation_0{C}\.mlp_bns\.{i}\.bias$",
             f"head/propagation_0/bn{i}/bias", "none"),
            (rf"^propagation_0{C}\.mlp_bns\.{i}\.running_mean$",
             f"BS:head/propagation_0/bn{i}/mean", "none"),
            (rf"^propagation_0{C}\.mlp_bns\.{i}\.running_var$",
             f"BS:head/propagation_0/bn{i}/var", "none"),
        ]
    for j in (1, 2, 3):
        R += [(rf"^convs{j}{C}\.weight$", f"head/convs{j}/kernel", "conv1d"),
              (rf"^convs{j}{C}\.bias$", f"head/convs{j}/bias", "none")]
    for j in (1, 2):
        R += [(rf"^bns{j}{C}\.weight$", f"head/bns{j}/scale", "none"),
              (rf"^bns{j}{C}\.bias$", f"head/bns{j}/bias", "none"),
              (rf"^bns{j}{C}\.running_mean$", f"BS:head/bns{j}/mean", "none"),
              (rf"^bns{j}{C}\.running_var$", f"BS:head/bns{j}/var", "none")]
    if with_label:
        R += [
            (rf"^label_conv{C}\.0\.weight$", "head/label_conv/kernel",
             "conv1d"),
            (rf"^label_conv{C}\.1\.weight$", "head/label_bn/scale", "none"),
            (rf"^label_conv{C}\.1\.bias$", "head/label_bn/bias", "none"),
            (rf"^label_conv{C}\.1\.running_mean$", "BS:head/label_bn/mean",
             "none"),
            (rf"^label_conv{C}\.1\.running_var$", "BS:head/label_bn/var",
             "none"),
        ]
    return R


def act_pointbert_rules(teacher_arch: str = "vit"
                        ) -> List[Tuple[str, str, str]]:
    """ACT_PointBERT: MoCo q/k MaskTransformers + frozen prompted dVAE
    (reference models/act.py:913-1095; MaskTransformer :532-723). The q/k
    trunks are student_rules plus the BERT mask_token; the MoCo queue buffers
    are extracted separately (``pointbert_buffers`` — they live in the flax
    'buffers' collection, not params)."""
    R = []
    for name in ("transformer_q", "transformer_k"):
        R += student_rules(name)
        R.append((rf"^{name}\.mask_token$", f"{name}/mask_token", "none"))
    R += dvae_rules("dvae", teacher_arch=teacher_arch)
    return R


def pointbert_buffers(sd: Dict[str, np.ndarray]) -> dict:
    """MoCo queue state from a torch ACT_PointBERT checkpoint: the reference
    registers queue (cls_dim, K) and queue_ptr (1,) long as buffers
    (models/act.py:958-961); flax keeps them in the 'buffers' collection
    (queue_ptr as a scalar int32)."""
    out = {}
    if "queue" in sd:
        out["queue"] = np.asarray(sd["queue"], np.float32)
    if "queue_ptr" in sd:
        out["queue_ptr"] = np.asarray(sd["queue_ptr"]).reshape(()).astype(
            np.int32)
    return out


def convert_state_dict(sd: Dict[str, np.ndarray],
                       rules: List[Tuple[str, str, str]],
                       logger=None) -> Tuple[dict, dict]:
    """Apply rules; returns (params_tree, batch_stats_tree)."""
    sd = fold_encoder_conv_bias(sd)
    params: dict = {}
    batch_stats: dict = {}
    unmatched = []
    for key, arr in sd.items():
        hit = False
        for pattern, template, how in rules:
            m = re.match(pattern, key)
            if m:
                path = m.expand(template.replace("\\1", "\\g<1>")) \
                    if "\\" in template else template
                target = batch_stats if path.startswith("BS:") else params
                path = path[3:] if path.startswith("BS:") else path
                node = target
                parts = path.split("/")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = _xform(np.asarray(arr), how)
                hit = True
                break
        if not hit and ("running" not in key) and ("num_batches" not in key):
            unmatched.append(key)
    if unmatched:
        print_log(f"[CONVERT] {len(unmatched)} unmatched torch keys "
                  f"(first 10): {unmatched[:10]}", logger=logger)
    return params, batch_stats


def load_timm_vit(sd: Dict[str, np.ndarray], dst: str = "visual_embed",
                  logger=None) -> Tuple[dict, dict]:
    """Convert a raw timm ViT state_dict's blocks+norm into the teacher subtree
    (for loading an official vit_base_patch16_384 checkpoint file directly)."""
    rules = vit_block_rules(r"blocks", dst) + [
        (r"^norm\.weight$", f"{dst}/norm/scale", "none"),
        (r"^norm\.bias$", f"{dst}/norm/bias", "none")]
    return convert_state_dict(sd, rules, logger=logger)
