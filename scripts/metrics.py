#!/usr/bin/env python
"""Offline metric harness over rendered splits.

Reference-parity (`metrics.py:36-103`): walks `<model>/<split>/<method>/
{renders,gt}`, computes PSNR / SSIM / LPIPS (LPIPS only when weights are
available, see `gaussianavatars_tpu/metrics/lpips.py`), and writes
`results.json` + `per_view.json` in the model dir.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    p.add_argument("--splits", nargs="+", default=["test"])
    p.add_argument("--lpips_weights", type=str,
                   default=os.environ.get("GSAVATARS_LPIPS_WEIGHTS", ""))
    return p.parse_args(argv)


def _load_dir(path):
    from PIL import Image

    names = sorted(n for n in os.listdir(path) if n.endswith(".png"))
    for n in names:
        yield n, np.asarray(Image.open(os.path.join(path, n)).convert("RGB"),
                            np.float32) / 255.0


def evaluate_model(model_path: str, splits, lpips_params=None) -> dict:
    import jax.numpy as jnp

    from gaussianavatars_tpu.metrics import lpips as lpips_fn, psnr, ssim

    results, per_view = {}, {}
    for split in splits:
        split_dir = os.path.join(model_path, split)
        if not os.path.isdir(split_dir):
            continue
        for method in sorted(os.listdir(split_dir)):
            rdir = os.path.join(split_dir, method, "renders")
            gdir = os.path.join(split_dir, method, "gt")
            if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
                continue
            rows = {"psnr": {}, "ssim": {}, "lpips": {}}
            gts = dict(_load_dir(gdir))
            for name, img in _load_dir(rdir):
                if name not in gts:
                    continue
                gt = gts[name]
                img_j, gt_j = jnp.asarray(img), jnp.asarray(gt)
                rows["psnr"][name] = float(psnr(img_j, gt_j))
                rows["ssim"][name] = float(ssim(
                    jnp.transpose(img_j, (2, 0, 1)), jnp.transpose(gt_j, (2, 0, 1))
                ))
                if lpips_params is not None:
                    rows["lpips"][name] = float(lpips_fn(lpips_params, img_j, gt_j))
            key = f"{split}/{method}"
            results[key] = {
                m: float(np.mean(list(v.values()))) for m, v in rows.items() if v
            }
            per_view[key] = rows
            print(f"{model_path} {key}: " + "  ".join(
                f"{m.upper()}={v:.4f}" for m, v in results[key].items()
            ))
    return {"results": results, "per_view": per_view}


def main(argv=None):
    a = parse_args(argv)
    lp = None
    if a.lpips_weights and os.path.exists(a.lpips_weights):
        from gaussianavatars_tpu.metrics import load_lpips_weights

        lp = load_lpips_weights(a.lpips_weights)
    else:
        print("[info] no LPIPS weights (set --lpips_weights or "
              "$GSAVATARS_LPIPS_WEIGHTS) — reporting PSNR/SSIM only")
    for mp in a.model_paths:
        try:
            out = evaluate_model(mp, a.splits, lp)
            with open(os.path.join(mp, "results.json"), "w") as f:
                json.dump(out["results"], f, indent=2)
            with open(os.path.join(mp, "per_view.json"), "w") as f:
                json.dump(out["per_view"], f, indent=2)
        except Exception as e:
            print(f"[error] {mp}: {e}")


if __name__ == "__main__":
    main()
