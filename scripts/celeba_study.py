"""CelebA-family quality study on the synthetic corpus.

The reference's CelebA entry point is a notebook-style script with no model
save and no quantitative metric beyond the "active units" diagnostic
(celeba/main.py, celeba/module/train.py:60-63), so there is no paper number
to match. This study establishes OUR measured evidence that the dual-latent
masked-GAM architecture trains and disentangles end-to-end:

1. writes a synthetic face corpus in the reference's npy tree layout
   (``<dir>/{train,test}/smile/<i>.npy`` + ``label/<i>.npy`` — the format
   ``celeba/preprocess.py`` produces), so the study exercises the real
   file-loading path of ``cli.celeba_main --data_dir``;
2. trains CDG-VAE(celeba) at the reference protocol (100 epochs, batch 16,
   lr 1e-3, beta=0.1, lambda=5 — celeba/main.py defaults);
3. measures on the held-out test split: recon L1, per-attribute
   latent-label correlation (diag vs max off-diag — the quantitative
   disentanglement check);
4. renders a 6xV do-intervention grid over the causal attributes via the
   serving API (docs/results/celeba_do.png);
5. measures **do-intervention leakage outside the masks**: the celeba
   analog of the pendulum CDM structural zeros — do(z_j) may only change
   pixels inside the union of segmentation masks of the decoder blocks
   whose parent group contains j or a causal descendant of j
   (models/celeba.py BLOCK_GROUPS == the reference's hand wiring,
   celeba/module/model.py:189-195). The masked-GAM sum makes this
   exactly zero by construction; measured here as max |pixel delta|
   outside the allowed region over a 7-value sweep.

Multi-seed: ``--seed 1 2 3`` trains one model per seed on a shared corpus
(keyed on ``--data_seed``) and reports per-seed metrics plus mean/std
attribute-correlation diagonals. Writes docs/results/celeba_study.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cdgvae_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from cdgvae_tpu.data.celeba import synthetic_celeba  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_corpus(base: str, n_train: int, n_test: int, img_size: int,
                 seed: int) -> None:
    """Reference npy tree: <base>/{train,test}/{smile,label}/<i>.npy."""
    for tag, n, s in (("train", n_train, seed), ("test", n_test, seed + 1)):
        x, y = synthetic_celeba(n, img_size, seed=s)
        img_dir = os.path.join(base, tag, "smile")
        lab_dir = os.path.join(base, tag, "label")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        for i in range(n):
            np.save(os.path.join(img_dir, f"{i}.npy"), x[i])
            np.save(os.path.join(lab_dir, f"{i}.npy"), y[i])


def run_seed(args, corpus: str, seed: int):
    """Train (or reuse) one seed's model and return its metrics dict.

    Training runs as a SUBPROCESS with crash-retry: the axon TPU worker can
    die mid-run (observed on ~250 s dispatches), and a crashed worker
    poisons the in-process jax client — only a fresh process can reattach.
    celeba_main checkpoints every 10 epochs, so each retry resumes from the
    last boundary (--resume) instead of restarting the seed."""
    import subprocess

    assets = os.path.join(args.workdir, f"assets_s{seed}")
    ckpt_dir = os.path.join(assets, "celeba_CDGVAE_linear")
    if args.eval_only and os.path.isdir(ckpt_dir):
        return ckpt_dir, None

    argv = [sys.executable, "-m", "cdgvae_tpu.cli.celeba_main",
            "--data_dir", corpus, "--assets_dir", assets,
            "--epochs", str(args.epochs),
            "--img_size", str(args.img_size),
            "--seed", str(seed), "--lambda", str(args.lam),
            "--conv_dim", str(args.conv_dim),
            "--chunk", str(args.chunk),
            "--ckpt_every", str(args.ckpt_every)]
    if args.platform:
        argv += ["--platform", args.platform]
    if args.bf16:
        argv.append("--bf16")
    if args.train_trunk:
        argv.append("--train_trunk")
    if args.torch_weights:
        argv += ["--torch_weights", args.torch_weights]
    if args.align_warmup:
        argv += ["--align_warmup", str(args.align_warmup)]
    t0 = time.time()
    for attempt in range(args.max_retries + 1):
        cmd = list(argv)
        resumable = os.path.isdir(ckpt_dir)
        if attempt and resumable:
            cmd += ["--resume", ckpt_dir]
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode == 0:
            return ckpt_dir, time.time() - t0
        print(f"seed {seed}: training attempt {attempt} exited "
              f"{r.returncode}; retrying"
              f"{' with --resume' if resumable else ''}", flush=True)
        time.sleep(args.retry_wait)
    raise RuntimeError(f"seed {seed}: training failed after "
                       f"{args.max_retries + 1} attempts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, dest="seeds", nargs="+",
                    default=[1], help="training seeds; the corpus is "
                    "shared across seeds (keyed on --data_seed)")
    ap.add_argument("--data_seed", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--train_trunk", action="store_true",
                    help="train the ResNet trunk end-to-end (without "
                         "ImageNet weights, frozen random features cannot "
                         "support the alignment loss)")
    ap.add_argument("--torch_weights", default="",
                    help="torchvision-layout resnet18 state dict to import "
                         "+ freeze (the reference's pretrained-encoder "
                         "regime; produce one with "
                         "scripts/celeba_pretrain_torch.py)")
    ap.add_argument("--lam", type=float, default=5.0)
    ap.add_argument("--align_warmup", type=int, default=0,
                    help="celeba_main --align_warmup passthrough "
                         "(alignment-first warmup epochs; round-4 probe "
                         "follow-up)")
    ap.add_argument("--conv_dim", type=int, default=32,
                    help="SAGAN generator base width (celeba_main "
                         "--conv_dim); shrink for smoke runs")
    ap.add_argument("--tag", default="",
                    help="suffix for the output json/png filenames")
    ap.add_argument("--eval_only", action="store_true",
                    help="reuse the workdir checkpoints, skip training")
    ap.add_argument("--ckpt_every", type=int, default=10,
                    help="mid-run checkpoint cadence (epochs). Each save "
                         "pulls ~590 MB through the tunnel (~25 s); raise "
                         "on multi-hundred-epoch arms where the default "
                         "cadence would dominate wall time")
    ap.add_argument("--chunk", type=int, default=2,
                    help="epochs per device dispatch (keep dispatches "
                         "under ~1 min; see celeba_main --chunk)")
    ap.add_argument("--max_retries", type=int, default=8,
                    help="per-seed crash retries (each resumes from the "
                         "last 10-epoch checkpoint)")
    ap.add_argument("--retry_wait", type=float, default=180.0,
                    help="seconds to wait before a retry (a crashed TPU "
                         "worker takes minutes to come back)")
    ap.add_argument("--workdir", default="/tmp/celeba_study")
    # the shared hook normalizes the value (strip/lower) and applies the
    # in-process jax.config update at parse time, so the parent's eval and
    # the training subprocesses see the same backend for the same flag value
    from cdgvae_tpu.cli.common import _platform_arg
    ap.add_argument("--platform", default="", type=_platform_arg,
                    help="force the JAX backend for the training "
                         "subprocesses AND this process's eval (e.g. "
                         "'cpu' while the TPU is busy/down)")
    args = ap.parse_args()

    corpus = os.path.join(args.workdir, "corpus")
    # corpus reuse is keyed on the generation settings, not bare existence
    # (a stale corpus at a different img_size would otherwise be silently
    # fed to a model built for the new size)
    meta_path = os.path.join(corpus, "meta.json")
    meta = {"n_train": args.n_train, "n_test": args.n_test,
            "img_size": args.img_size, "seed": args.data_seed}
    existing = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f)
    if existing != meta:
        if os.path.isdir(corpus):
            import shutil
            shutil.rmtree(corpus)
        write_corpus(corpus, args.n_train, args.n_test, args.img_size,
                     args.data_seed)
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    # Train ALL seeds first, evaluate after: evaluate() attaches this
    # parent process to the TPU and never releases it, so interleaving
    # eval with the next seed's training SUBPROCESS would contend for the
    # (single-client) device. Sequencing all subprocesses before the
    # parent's first jax touch keeps exactly one client alive at a time.
    trained = [(seed,) + run_seed(args, corpus, seed)
               for seed in args.seeds]
    per_seed = [evaluate(args, corpus, ckpt_dir, train_s,
                         seed == args.seeds[0])
                for seed, ckpt_dir, train_s in trained]

    report(args, per_seed)


def evaluate(args, corpus, ckpt_dir, train_s, render_grid):

    from cdgvae_tpu.api import LoadedModel
    from cdgvae_tpu.data.celeba import CelebADataset
    m = LoadedModel.load(ckpt_dir)
    test = CelebADataset(data_dir=corpus, train=False,
                         img_size=args.img_size)
    x_t, y_t = test.x_data, test.y_data

    # held-out recon L1 (the training loss's recon term, celeba L1 recon)
    xhat = m.reconstruct(x_t)
    target = x_t[..., :3] * 2.0 - 1.0
    recon_l1 = float(np.abs(xhat - target).mean())

    # latent-attribute correlation: causal latent j should track its
    # assigned attribute and no other
    lat = m.encode(x_t)
    node = lat.shape[1]
    corr = np.zeros((node, node))
    for i in range(node):
        for j in range(node):
            corr[i, j] = np.corrcoef(lat[:, i], y_t[:, j])[0, 1]
    corr = np.nan_to_num(corr)
    diag = np.abs(np.diag(corr))
    offdiag = np.abs(corr - np.diag(np.diag(corr))).max(axis=1)

    # do-intervention grid: sweep each causal node over its observed
    # latent range on one fixed test image (reference inference.py:298-334
    # semantics via the serving do-operator)
    n_vals = 7
    base_x = x_t[:1]
    rows = []
    for j in range(node):
        lo, hi = float(lat[:, j].min()), float(lat[:, j].max())
        row = [m.counterfactual(base_x, j, v)[0]
               for v in np.linspace(lo, hi, n_vals)]
        rows.append(np.stack(row))
    grid = np.stack(rows)  # [node, n_vals, H, W, 3]

    # do-intervention leakage outside the allowed masks: the do-operator
    # re-propagates causal descendants, so do(j) may touch exactly the
    # blocks whose parent group intersects {j} U descendants(j); every
    # other pixel must be bit-unchanged (masked-GAM structural property)
    from cdgvae_tpu.models.celeba import BLOCK_GROUPS
    B = np.asarray(m.model.graph.B)
    reach = (np.abs(B) > 0).astype(int)
    for _ in range(node):  # transitive closure
        reach = ((reach + reach @ reach) > 0).astype(int)
    base_masks = base_x[0, ..., 3: 3 + len(BLOCK_GROUPS) + 1]
    leakage = []
    for j in range(node):
        affected = {j} | {k for k in range(node) if reach[j, k]}
        allowed = np.zeros(base_masks.shape[:2], bool)
        for b, g in enumerate(BLOCK_GROUPS):
            if affected & set(g):
                allowed |= base_masks[..., b] > 0
        spread = grid[j].max(axis=0) - grid[j].min(axis=0)  # [H, W, 3]
        leakage.append(float(spread.max(axis=-1)[~allowed].max()))

    if render_grid:
        from cdgvae_tpu.utils.viz import viz_do_grid
        out_png = os.path.join(REPO, "docs", "results",
                               f"celeba_do{args.tag}.png")
        viz_do_grid(grid, out_png, row_names=test.nodes)
        print(f"do-grid -> {out_png}")

    # report the checkpoint's own embedded config for the training
    # hyperparameters — under --eval_only the CLI args may not match the
    # run that produced the checkpoint
    ck_cfg = m.config
    return {
        "seed": ck_cfg["seed"],
        "epochs": ck_cfg["epochs"], "bf16": ck_cfg.get("bf16"),
        "train_trunk": bool(ck_cfg.get("train_trunk")),
        "pretrained_trunk": bool(ck_cfg.get("torch_weights")),
        "conv_dim": ck_cfg.get("conv_dim"),
        "lambda": ck_cfg["lambda"],
        "align_warmup": ck_cfg.get("align_warmup", 0),
        "train_wall_s": None if train_s is None else round(train_s, 1),
        "test_recon_l1": round(recon_l1, 4),
        "latent_attr_corr_diag": [round(float(v), 3) for v in diag],
        "latent_attr_corr_max_offdiag": [round(float(v), 3)
                                         for v in offdiag],
        "do_leakage_outside_masks": leakage,
        "nodes": test.nodes,
    }


def report(args, per_seed):
    diags = np.array([s["latent_attr_corr_diag"] for s in per_seed])
    offd = np.array([s["latent_attr_corr_max_offdiag"] for s in per_seed])
    out = {
        "protocol": {"n_train": args.n_train, "n_test": args.n_test,
                     "img_size": args.img_size, "epochs": args.epochs,
                     "seeds": args.seeds, "data_seed": args.data_seed,
                     "bf16": args.bf16, "train_trunk": args.train_trunk,
                     "torch_weights": args.torch_weights,
                     "conv_dim": args.conv_dim, "lambda": args.lam,
                     "align_warmup": args.align_warmup},
        "nodes": per_seed[0]["nodes"],
        "diag_mean": [round(float(v), 3) for v in diags.mean(0)],
        "diag_std": [round(float(v), 3) for v in diags.std(0)],
        "max_offdiag_mean": [round(float(v), 3) for v in offd.mean(0)],
        "do_leakage_max": max(max(s["do_leakage_outside_masks"])
                              for s in per_seed),
        "per_seed": per_seed,
    }
    path = os.path.join(REPO, "docs", "results",
                        f"celeba_study{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, allow_nan=False)
    print(json.dumps({k: v for k, v in out.items() if k != "per_seed"},
                     indent=1))


if __name__ == "__main__":
    main()
