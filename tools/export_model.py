#!/usr/bin/env python
"""Export a finetuned classifier to a self-contained serving artifact.

Beyond the reference (which has no deployment path): the eval forward is
AOT-lowered and serialized via jax.export — weights baked in, optionally a
symbolic batch dimension — and reloads anywhere jax runs without model code
or checkpoints on the serving side.

  # export (CPU host -> portable pure-XLA artifact; --platforms to cross-lower)
  python tools/export_model.py export --config cfgs/finetune_classification/full/finetune_scan_hardest.yaml \
      --ckpts work_dirs/.../ckpt-best --dst model.actx

  # serve-side smoke: load the artifact and run a batch
  python tools/export_model.py run --src model.actx --batch 4
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_export(args):
    from act_tpu.utils.config import cfg_from_yaml_file
    from act_tpu.engine import export as ex

    batch = None if args.batch in (None, "sym") else int(args.batch)
    platforms = args.platforms.split(",") if args.platforms else None
    if args.kind == "segmentation":
        # seg models are argparse-configured (no yaml, like the seg CLIs);
        # --config is unused here
        npoint = int(args.npoint)
        num_group = int(args.num_group)
        if args.smoke:
            npoint, num_group = min(npoint, 128), min(num_group, 16)
        exp = ex.export_segmentation(
            args.seg_task, npoint=npoint, ckpt_path=args.ckpts, batch=batch,
            num_group=num_group, dtype=args.dtype, platforms=platforms,
            seed=args.seed)
        meta = {"config": None, "ckpts": args.ckpts, "kind": "segmentation",
                "seg_task": args.seg_task, "npoints": npoint, "n_in": npoint}
        ex.save_exported(exp, args.dst, meta=meta)
        print(f"wrote {args.dst} (+.json); inputs "
              f"{[a.shape for a in exp.in_avals]} -> "
              f"output {exp.out_avals[0].shape}; platforms {list(exp.platforms)}")
        return
    if not args.config:
        raise SystemExit(f"--config is required for --kind {args.kind}")
    config = cfg_from_yaml_file(args.config)
    if "npoints" not in config:  # pretrain yamls carry it per dataset split
        config.npoints = int(config.dataset.val.others.npoints)
    if args.smoke:
        # reuse the runners' smoke shrinks so the tiny dims stay consistent
        if args.kind == "classifier":
            from act_tpu.engine.runner_finetune import _apply_smoke
        elif args.kind in ("dvae", "tokenize"):
            from act_tpu.engine.runner_autoencoder import _apply_smoke
        else:
            from act_tpu.engine.runner_pretrain import _apply_smoke
        config = _apply_smoke(config)
        config.npoints = min(int(config.npoints), 256)
    if args.kind == "classifier":
        exp = ex.export_classifier(config, ckpt_path=args.ckpts, batch=batch,
                                   n_in=args.n_in, with_fps=not args.no_fps,
                                   platforms=platforms, seed=args.seed)
        n_in = int(args.n_in or config.npoints)
    elif args.kind == "features":
        exp = ex.export_features(config, ckpt_path=args.ckpts, batch=batch,
                                 n_in=args.n_in, platforms=platforms,
                                 seed=args.seed)
        n_in = int(args.n_in or config.npoints)
    elif args.kind == "tokenize":
        exp = ex.export_dvae_tokenize(config, ckpt_path=args.ckpts,
                                      batch=batch, platforms=platforms,
                                      seed=args.seed)
        n_in = int(config.npoints)
    else:
        exp = ex.export_dvae_recon(config, ckpt_path=args.ckpts, batch=batch,
                                   platforms=platforms, seed=args.seed)
        n_in = int(config.npoints)
    meta = {"config": args.config, "ckpts": args.ckpts, "kind": args.kind,
            "npoints": int(config.npoints), "n_in": n_in}
    if args.kind == "classifier":
        meta["with_fps"] = not args.no_fps
    elif args.kind == "features":
        # features always FPS-resample when n_in != npoints (--no-fps n/a)
        meta["with_fps"] = n_in != int(config.npoints)
    ex.save_exported(exp, args.dst, meta=meta)
    print(f"wrote {args.dst} (+.json); input {exp.in_avals[0].shape} -> "
          f"output {exp.out_avals[0].shape}; platforms {list(exp.platforms)}")


def cmd_run(args):
    import numpy as np
    from act_tpu.engine.export import load_exported

    fn = load_exported(args.src)
    with open(args.src + ".json") as f:
        meta = json.load(f)
    n = args.n_in or int(meta.get("n_in") or meta.get("npoints", 1024))
    pts = np.random.default_rng(0).normal(size=(args.batch, n, 3))
    pts /= np.abs(pts).max()
    kind = meta.get("kind", "classifier")
    extra = ()
    if kind == "segmentation" and len(meta.get("in_shapes", [])) > 1:
        # partseg: object-category one-hot second input
        n_cat = int(meta["in_shapes"][1][-1])
        extra = (np.eye(n_cat, dtype=np.float32)[
            np.arange(args.batch) % n_cat],)
    t0 = time.time()
    out = np.asarray(fn(pts, *extra))
    dt = time.time() - t0
    if kind == "classifier" and out.ndim == 2:
        print(f"logits {out.shape}  argmax {out.argmax(-1).tolist()}  "
              f"({dt:.2f}s incl. compile)")
    elif kind == "features":
        print(f"features {out.shape}  finite={bool(np.isfinite(out).all())}  "
              f"({dt:.2f}s incl. compile)")
    elif kind == "tokenize":
        print(f"tokens {out.shape}  vocab-range=[{out.min()}, {out.max()}]  "
              f"({dt:.2f}s incl. compile)")
    elif kind == "segmentation":
        labels = out.argmax(-1)
        print(f"log_probs {out.shape}  labels-range=[{labels.min()}, "
              f"{labels.max()}]  finite={bool(np.isfinite(out).all())}  "
              f"({dt:.2f}s incl. compile)")
    else:  # dvae reconstruction cloud
        print(f"recon {out.shape}  finite={bool(np.isfinite(out).all())}  "
              f"({dt:.2f}s incl. compile)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("export")
    e.add_argument("--config", default=None,
                   help="task yaml (required for every kind except "
                        "segmentation, which is argparse-configured)")
    e.add_argument("--kind", default="classifier",
                   choices=["classifier", "features", "tokenize", "dvae",
                            "segmentation"],
                   help="classifier logits, pretrain embedding features "
                        "(SVM-probe forward), discrete dVAE codebook ids, "
                        "the Stage-I dVAE reconstruction forward, or "
                        "per-point segmentation log-probs")
    e.add_argument("--seg_task", default="semseg",
                   choices=["partseg", "semseg"],
                   help="segmentation variant (partseg additionally takes a "
                        "(B, 16) object-category one-hot input)")
    e.add_argument("--npoint", type=int, default=2048,
                   help="segmentation input point count (seg CLIs' default)")
    e.add_argument("--num_group", type=int, default=128,
                   help="segmentation backbone group count")
    e.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                   help="segmentation compute dtype (stats/log-probs f32)")
    e.add_argument("--ckpts", default=None, help="orbax checkpoint dir")
    e.add_argument("--dst", required=True)
    e.add_argument("--batch", default="sym",
                   help="'sym' (default: symbolic batch dim) or a fixed int")
    e.add_argument("--n_in", type=int, default=None,
                   help="input point count (default: config.npoints)")
    e.add_argument("--no-fps", action="store_true",
                   help="skip the eval-protocol FPS resample")
    e.add_argument("--platforms", default=None,
                   help="comma list to cross-lower, e.g. 'cpu,tpu'")
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--smoke", action="store_true",
                   help="tiny model for pipeline checks")
    e.set_defaults(fn=cmd_export)

    r = sub.add_parser("run")
    r.add_argument("--src", required=True)
    r.add_argument("--batch", type=int, default=2)
    r.add_argument("--n_in", type=int, default=None)
    r.set_defaults(fn=cmd_run)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
