"""Linear-probe oracle for the frozen-trunk ceiling question.

Round 3 measured that CDG-VAE(celeba) with a FROZEN trunk (pretrained or
random features) plateaus at 4-5/6 aligned attributes on the v2 synthetic
corpus however large λ gets, while the trained trunk reaches 6/6
(docs/RESULTS.md "CelebA pretrained-encoder regime"). It then *asserted*
the explanation — "a linear head on any fixed 512-d feature cannot
separate all 6 correlated attributes on this corpus" — without running
the experiment that decides it.

This script runs that experiment: per-attribute logistic-regression
probes fit directly on the frozen trunk's 512-d pooled features
(models/resnet.py::ResNetEncoder.features — exactly what the model's fc
head consumes, reference celeba/module/model.py:117-125):

* probe accuracy ≈ 1.0 on attributes where the alignment plateaus
  ⇒ the features ARE linearly separable and the plateau is an
  OPTIMIZATION artifact of the joint ELBO objective (ceiling claim
  falsified — attack the optimization);
* probe accuracy low on the same attributes the alignment fails
  ⇒ the ceiling is real (claim proven).

Corpus: identical to the λ-sweep studies (synthetic_celeba, train
seed=data_seed, test seed=data_seed+1 — scripts/celeba_study.py
write_corpus). Trunks: the offline-pretrained torchvision-layout resnet18
(scripts/celeba_pretrain_torch.py output, imported+frozen like
``--torch_weights``) and the frozen-random trunk (init seed matching the
studies). Writes docs/results/celeba_probe.json.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cdgvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def extract_features(encoder, params, x, batch=64):
    import jax
    import jax.numpy as jnp
    feats_fn = jax.jit(encoder.features)
    out = []
    for i in range(0, len(x), batch):
        out.append(np.asarray(feats_fn(params,
                                       jnp.asarray(x[i: i + batch]))))
    return np.concatenate(out)


def probe(feats_tr, y_tr, feats_te, y_te, nodes):
    """Per-attribute logistic probes; returns per-attribute train/test
    accuracy. High C + many iterations: we want the linear-separability
    ORACLE, not a regularized classifier."""
    from sklearn.linear_model import LogisticRegression
    res = {}
    for j, name in enumerate(nodes):
        yj_tr, yj_te = y_tr[:, j], y_te[:, j]
        if len(np.unique(yj_tr)) < 2:
            res[name] = {"train_acc": None, "test_acc": None,
                         "note": "degenerate label"}
            continue
        clf = LogisticRegression(C=1e4, max_iter=5000)
        clf.fit(feats_tr, yj_tr)
        res[name] = {
            "train_acc": round(float(clf.score(feats_tr, yj_tr)), 4),
            "test_acc": round(float(clf.score(feats_te, yj_te)), 4),
        }
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=256,
                    help="match the λ-sweep protocol (256-image corpus)")
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--data_seed", type=int, default=1)
    ap.add_argument("--init_seed", type=int, default=1,
                    help="random-trunk init seed (studies trained seed 1)")
    ap.add_argument("--torch_weights",
                    default="/tmp/celeba_pretrained_resnet18.pt",
                    help="torchvision-layout resnet18 state dict "
                         "(scripts/celeba_pretrain_torch.py output)")
    ap.add_argument("--out", default="docs/results/celeba_probe.json")
    from cdgvae_tpu.cli.common import _platform_arg
    ap.add_argument("--platform", default="", type=_platform_arg)
    args = ap.parse_args()

    import jax
    from cdgvae_tpu.data.celeba import synthetic_celeba
    from cdgvae_tpu.models.celeba import SMILE_NODES
    from cdgvae_tpu.models.resnet import ResNetEncoder

    x_tr, y_tr = synthetic_celeba(args.n_train, args.img_size,
                                  seed=args.data_seed)
    x_te, y_te = synthetic_celeba(args.n_test, args.img_size,
                                  seed=args.data_seed + 1)
    # the encoder consumes the RGB channels (model.get_posterior)
    x_tr, x_te = x_tr[..., :3], x_te[..., :3]

    # out_dim matches the celeba model head (2*node + 2*latent_dim) but is
    # irrelevant here — probes read the pooled features under it
    encoder = ResNetEncoder(out_dim=24, freeze_trunk=True)
    results = {"protocol": {"n_train": args.n_train, "n_test": args.n_test,
                            "img_size": args.img_size,
                            "data_seed": args.data_seed,
                            "init_seed": args.init_seed,
                            "torch_weights": args.torch_weights},
               "nodes": list(SMILE_NODES)}

    base = encoder.init(jax.random.key(args.init_seed))

    trunks = {"random": base}
    if args.torch_weights and os.path.exists(args.torch_weights):
        import torch
        sd = torch.load(args.torch_weights, map_location="cpu")
        trunks["pretrained"] = encoder.load_torch_weights(base, sd)
    else:
        print(f"NOTE: no pretrained weights at {args.torch_weights} — "
              "probing the random trunk only")

    for name, params in trunks.items():
        ftr = extract_features(encoder, params, x_tr)
        fte = extract_features(encoder, params, x_te)
        results[name] = probe(ftr, y_tr, fte, y_te, SMILE_NODES)
        accs = [v["test_acc"] for v in results[name].values()
                if v["test_acc"] is not None]
        results[name]["_summary"] = {
            "mean_test_acc": round(float(np.mean(accs)), 4),
            "min_test_acc": round(float(np.min(accs)), 4),
            "n_separable_at_0.95": int(sum(a >= 0.95 for a in accs)),
        }
        print(f"{name}: {json.dumps(results[name], indent=1)}")

    out = args.out if os.path.isabs(args.out) else os.path.join(REPO,
                                                                args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
