"""Multi-arm CelebA study driver with a PERSISTENT WORKER (round-5).

`scripts/celeba_study.py` runs every training arm as its own subprocess,
so each arm pays the full ~5.6 min imports + device init + compile
startup — which dwarfs training for short arms (0.65 s/epoch at the
study protocol; docs/PERF.md round 4). This driver amortizes startup:

1. the parent writes the shared corpus (same meta-keyed reuse as
   celeba_study) and a JSON arm list;
2. ONE worker subprocess (this script with ``--worker``) imports jax
   once and trains ALL arms sequentially by calling
   ``cli.celeba_main.main(argv)`` in-process — arm 2+ pay zero startup
   and reuse the in-memory compile cache where shapes repeat;
3. the worker writes a ``done_<tag>.json`` marker (with wall times)
   after each arm, so a crash-retry relaunches the worker, skips
   completed arms, and ``--resume``s the in-flight one — the same
   crash-isolation celeba_study's per-arm subprocesses provided, at
   worker granularity;
4. the parent then evaluates every arm in-process (reusing
   celeba_study.evaluate/report, one JSON + do-grid per arm in the
   format the round artifacts already use) and writes a timing summary
   proving the startup amortization.

Arm spec (JSON list, ``--arms`` inline or ``@file``): each item is a
dict with ``tag`` (output suffix) and any of ``seed`` (default 1),
``lam`` (5.0), ``align_warmup`` (0), ``epochs`` (100), ``ckpt_every``
(50), ``conv_dim`` (32), ``bf16`` (false), ``train_trunk`` (false),
``torch_weights`` ("").
"""
import argparse
import json
import os
import sys
import time

_T0 = time.time()  # process birth: lets the worker report startup cost

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM_DEFAULTS = {"seed": 1, "lam": 5.0, "align_warmup": 0, "epochs": 100,
                "ckpt_every": 50, "conv_dim": 32, "bf16": False,
                "train_trunk": False, "torch_weights": "", "chunk": 2}


def arm_paths(workdir: str, arm: dict):
    assets = os.path.join(workdir, f"assets{arm['tag']}")
    ckpt = os.path.join(assets, "celeba_CDGVAE_linear")
    marker = os.path.join(workdir, f"done{arm['tag']}.json")
    return assets, ckpt, marker


def _arm_argv(arm: dict, corpus: str, assets: str, img_size: int,
              platform: str, resume: str = ""):
    a = {**ARM_DEFAULTS, **arm}
    argv = ["--data_dir", corpus, "--assets_dir", assets,
            "--epochs", str(a["epochs"]), "--img_size", str(img_size),
            "--seed", str(a["seed"]), "--lambda", str(a["lam"]),
            "--conv_dim", str(a["conv_dim"]), "--chunk", str(a["chunk"]),
            "--ckpt_every", str(a["ckpt_every"]),
            "--align_warmup", str(a["align_warmup"])]
    if platform:
        argv += ["--platform", platform]
    if a["bf16"]:
        argv.append("--bf16")
    if a["train_trunk"]:
        argv.append("--train_trunk")
    if a["torch_weights"]:
        argv += ["--torch_weights", a["torch_weights"]]
    argv += a.get("extra_args", [])  # free-form celeba_main flags
    if resume:
        argv += ["--resume", resume]
    return argv


def worker(args, arms):
    """Train all unfinished arms in THIS process (one startup for all)."""
    from cdgvae_tpu.cli import celeba_main
    import_done = time.time()
    for i, arm in enumerate(arms):
        assets, ckpt, marker = arm_paths(args.workdir, arm)
        if os.path.exists(marker):
            print(f"[worker] {arm['tag']}: done marker present, skipping",
                  flush=True)
            continue
        resume = ""
        epochs = {**ARM_DEFAULTS, **arm}["epochs"]
        if os.path.isdir(ckpt):
            # resume the in-flight arm; a checkpoint already at its final
            # epoch means only the marker write was lost — don't retrain
            from cdgvae_tpu.utils.checkpoint import load_checkpoint
            step = int(load_checkpoint(ckpt)["step"])
            if step >= epochs:
                with open(marker, "w") as f:
                    json.dump({"tag": arm["tag"], "wall_s": None,
                               "recovered": True}, f)
                continue
            resume = ckpt
        t0 = time.time()
        print(f"[worker] {arm['tag']}: training "
              f"({'resume @' + str(step) if resume else 'fresh'})",
              flush=True)
        celeba_main.main(_arm_argv(arm, args.corpus, assets,
                                   args.img_size, args.platform, resume))
        with open(marker, "w") as f:
            json.dump({"tag": arm["tag"],
                       "wall_s": round(time.time() - t0, 1),
                       "startup_s": round(import_done - _T0, 1)
                       if i == 0 else 0.0,
                       "resumed": bool(resume)}, f)
    print(f"[worker] all arms done in {time.time() - _T0:.1f}s "
          f"(startup {import_done - _T0:.1f}s, paid once)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", required=True,
                    help="JSON list of arm dicts, inline or @file")
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--data_seed", type=int, default=1)
    ap.add_argument("--workdir", default="/tmp/celeba_arms")
    ap.add_argument("--summary_tag", default="",
                    help="suffix for docs/results/celeba_arms<tag>.json")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--no_eval", action="store_true",
                    help="train + timing summary only (e.g. wall-clock "
                         "A/B arms where quality eval is irrelevant)")
    ap.add_argument("--max_retries", type=int, default=8)
    ap.add_argument("--retry_wait", type=float, default=180.0)
    ap.add_argument("--worker", action="store_true",
                    help="internal: run the training worker in-process")
    from cdgvae_tpu.cli.common import _platform_arg
    ap.add_argument("--platform", default="", type=_platform_arg)
    args = ap.parse_args()

    spec = args.arms
    if spec.startswith("@"):
        with open(spec[1:]) as f:
            spec = f.read()
    arms = json.loads(spec)
    assert isinstance(arms, list) and all("tag" in a for a in arms)
    args.corpus = os.path.join(args.workdir, "corpus")

    if args.worker:
        worker(args, arms)
        return

    # ---- parent: corpus (meta-keyed reuse, as celeba_study) ----
    from scripts.celeba_study import write_corpus
    os.makedirs(args.workdir, exist_ok=True)
    meta_path = os.path.join(args.corpus, "meta.json")
    meta = {"n_train": args.n_train, "n_test": args.n_test,
            "img_size": args.img_size, "seed": args.data_seed}
    existing = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f)
    if existing != meta:
        if os.path.isdir(args.corpus):
            import shutil
            shutil.rmtree(args.corpus)
        write_corpus(args.corpus, args.n_train, args.n_test,
                     args.img_size, args.data_seed)
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    # ---- one worker subprocess for ALL arms, with crash-retry ----
    t_train0 = time.time()
    if not args.eval_only:
        import subprocess
        argv = [sys.executable, os.path.abspath(__file__), "--worker",
                "--arms", json.dumps(arms), "--workdir", args.workdir,
                "--img_size", str(args.img_size),
                "--n_train", str(args.n_train),
                "--n_test", str(args.n_test),
                "--data_seed", str(args.data_seed)]
        if args.platform:
            argv += ["--platform", args.platform]
        for attempt in range(args.max_retries + 1):
            r = subprocess.run(argv, cwd=REPO)
            if r.returncode == 0:
                break
            print(f"[parent] worker attempt {attempt} exited "
                  f"{r.returncode}; retrying (completed arms are "
                  f"skipped, the in-flight arm resumes)", flush=True)
            time.sleep(args.retry_wait)
        else:
            raise RuntimeError("worker failed after all retries")
    train_wall = time.time() - t_train0

    # ---- evaluate every arm in-process (startup paid once here too) ----
    from scripts.celeba_study import evaluate, report
    timing = []
    for arm in arms:
        a = {**ARM_DEFAULTS, **arm}
        assets, ckpt, marker = arm_paths(args.workdir, arm)
        wall = None
        if os.path.exists(marker):
            with open(marker) as f:
                mk = json.load(f)
            wall = mk.get("wall_s")
            timing.append(mk)
        if args.no_eval:
            continue
        ns = argparse.Namespace(
            n_train=args.n_train, n_test=args.n_test,
            img_size=args.img_size, epochs=a["epochs"],
            seeds=[a["seed"]], data_seed=args.data_seed,
            bf16=a["bf16"], train_trunk=a["train_trunk"],
            torch_weights=a["torch_weights"], conv_dim=a["conv_dim"],
            lam=a["lam"], align_warmup=a["align_warmup"], tag=arm["tag"])
        per_seed = [evaluate(ns, args.corpus, ckpt, wall, True)]
        report(ns, per_seed)

    summary = {
        "arms": [a["tag"] for a in arms],
        "train_wall_s": round(train_wall, 1),
        "per_arm": timing,
        "note": "persistent worker: startup_s is paid by the first arm "
                "only; under scripts/celeba_study.py every arm paid it "
                "(docs/PERF.md round-4 decomposition: ~5.6 min/arm)",
    }
    out = os.path.join(REPO, "docs", "results",
                       f"celeba_arms{args.summary_tag}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
