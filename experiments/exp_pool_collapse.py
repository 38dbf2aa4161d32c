#!/usr/bin/env python3
"""Root-cause record for the tiny@720 flatline: init-time feature collapse
at the global-pool + final-LN boundary (CPU-runnable, no chip).

Round-5 chain of evidence:
  1. tiny@720 training is flat at blr 1.5e-4 AND 1.5e-3 (both stages) —
     not an lr/step-count problem alone.
  2. The trained pretrain encoder's features for 24 family-diverse hd
     images: pairwise cos 1.0000, ridge regression on them cannot fit the
     labels (pred std 0.03) — the encoder output is input-independent.
  3. This script: at INIT, per-layer cosine between very different inputs
     stays ~0.86 through every ConvNeXt stage (inputs distinguishable),
     then jumps to ~0.99 at the head LayerNorm — i.e. after global MEAN
     POOL.  At 720px the pool averages 529 patch vectors (~44%
     background); the shared component dominates and the per-object
     signal dilutes below what 90-sample training escapes.  At 180px
     (36 patches) the same architecture demonstrably escapes (r3 atto:
     val corr 0.73) — which is why the tuned arm trains convnextv2_tiny
     at 180 on the qcam dataset instead of retrying 720 hotter.

Faithful-architecture note: the pool+LN order matches the upstream
ConvNeXtV2 (and the reference consumed timm weights, i.e. encoders
already far from this init pathology — their protocol never had to
escape it from scratch).

  python experiments/exp_pool_collapse.py          # writes the artifact
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def cos_between(F):
    Fn = F / (np.linalg.norm(F, axis=1, keepdims=True) + 1e-12)
    iu = np.triu_indices(len(F), 1)
    return float((Fn @ Fn.T)[iu].mean())


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.prvnet.convnextv2 import ConvNeXtV2

    out = {}
    rng = np.random.default_rng(0)
    for size in (180, 720):
        model = ConvNeXtV2(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                           num_classes=1000)
        x = np.stack([
            rng.uniform(0, 1, (size, size, 3)),
            np.ones((size, size, 3)) * 0.9,
            np.clip(rng.normal(0.5, 0.3, (size, size, 3)), 0, 1),
        ]).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 3)))["params"]
        _, state = model.apply(
            {"params": params}, jnp.asarray(x),
            capture_intermediates=True, mutable=["intermediates"])
        ints = state["intermediates"]

        def get(path):
            d = ints
            for k in path.split("/"):
                d = d[k]
            return np.asarray(d["__call__"][0]).reshape(len(x), -1)

        last_stage = get("stage3_block2")
        pooled_ln = get("head_norm")
        out[f"size{size}"] = {
            "cos_last_stage_spatial": round(cos_between(last_stage), 4),
            "cos_after_pool_ln": round(cos_between(pooled_ln), 4),
            "n_pool_positions": (size // 32) ** 2,
        }
        print(size, out[f"size{size}"], flush=True)

    with open(os.path.join(ART, "pool_collapse.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
