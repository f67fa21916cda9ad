"""Convert a reference ACT PyTorch checkpoint (.pth) to an orbax checkpoint.

Usage:
    python tools/convert_checkpoint.py --src ckpt_act_dvae.pth \
        --model ACTPromptedDiscreteVAEwithVIT --dst model_zoo/ckpt_act_dvae.orbax

The converted tree matches act_tpu model param layouts (see
act_tpu/engine/torch_convert.py for the per-layer translations and the
reference's key surgery). Loadable via --ckpts / dvae_config.ckpt.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


RULES = {
    "ACTPromptedDiscreteVAEwithVIT":
        lambda tc, a: tc.dvae_rules("", teacher_arch=a.teacher_arch),
    "ACTPromptedDiscreteVAEwithBERT":
        lambda tc, a: tc.dvae_rules("", teacher_arch="bert"),
    "DiscreteVAE": lambda tc, a: tc.dvae_rules(""),
    "ACT_PointDistillation":
        lambda tc, a: tc.act_distillation_rules(teacher_arch=a.teacher_arch),
    "ACT_PointBERT":
        lambda tc, a: tc.act_pointbert_rules(teacher_arch=a.teacher_arch),
    "PointTransformer": lambda tc, a: tc.point_transformer_rules(head=a.head),
    "PartSegTransformer": lambda tc, a: tc.seg_rules(with_label=True),
    "SemSegTransformer": lambda tc, a: tc.seg_rules(with_label=False),
}


def convert(src: str, dst: str, model: str, state_key: str = "base_model",
            teacher_arch: str = "vit", head: str = "mlp-3") -> None:
    """Convert one ``.pth`` to an orbax checkpoint at ``dst``. The single
    conversion pipeline — the CLI below and tools/parity_protocol.py both
    call this, so BERT qkv fusion / teacher_arch handling cannot drift."""
    from act_tpu.engine import torch_convert as tc
    import orbax.checkpoint as ocp

    args = argparse.Namespace(teacher_arch=teacher_arch, head=head)
    sd = tc.load_torch_state_dict(src, key=state_key)
    print(f"loaded {len(sd)} torch tensors from {src}")
    if teacher_arch == "bert" or model.endswith("withBERT"):
        sd = tc.fuse_bert_qkv(sd)
    buffers = {}
    if model == "ACT_PointBERT":
        buffers = tc.pointbert_buffers(sd)
        sd = {k: v for k, v in sd.items()
              if k not in ("queue", "queue_ptr")}
    params, batch_stats = tc.convert_state_dict(sd, RULES[model](tc, args))

    payload = {"params": params, "batch_stats": batch_stats,
               "buffers": buffers, "opt_state": None, "step": 0, "epoch": 0,
               "metrics": {}, "best_metrics": {}}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(dst), payload, force=True)
    print(f"wrote {dst}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help=".pth checkpoint")
    parser.add_argument("--dst", required=True, help="output orbax dir")
    parser.add_argument("--model", required=True, choices=sorted(RULES))
    parser.add_argument("--state_key", default="base_model",
                        help="top-level key in the torch ckpt")
    parser.add_argument("--teacher_arch", default="vit",
                        choices=["vit", "clip", "bert"],
                        help="visual_embed layout inside the ckpt")
    parser.add_argument("--head", default="mlp-3", choices=["mlp-3", "linear"],
                        help="PointTransformer head variant")
    args = parser.parse_args()
    convert(args.src, args.dst, args.model, state_key=args.state_key,
            teacher_arch=args.teacher_arch, head=args.head)


if __name__ == "__main__":
    main()
