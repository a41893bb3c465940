"""CelebA CDG-VAE training entry point (reference celeba/main.py).

Unlike the reference (which never saves the celeba model), this writes a
full checkpoint at the end.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.celeba import CelebADataset
from ..models.celeba import CelebACDGVAE, celeba_B
from ..ops.causal import CausalGraph
from ..train.celeba_steps import make_celeba_step, celeba_unjitted_step
from ..train.loop import train_epoch, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint, AsyncCheckpointer
from ..utils.logging import MetricLogger
from ..utils.viz import viz_recon_grid
from .common import (arg_as_bool,
                     add_infra_args, resolve_mesh,
                     add_resume_arg, apply_resume)


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    # parity with reference celeba/main.py:20-56
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--model", type=str, default="CDGVAE")
    parser.add_argument("--causal_structure", default=0, type=int,
                        help="0: smile, 1: attractive")
    parser.add_argument("--node", default=6, type=int)
    parser.add_argument("--latent_dim", default=6, type=int)
    parser.add_argument("--scm", default="linear", type=str)
    parser.add_argument("--flow_num", default=1, type=int)
    parser.add_argument("--inverse_loop", default=100, type=int)
    parser.add_argument("--labeled_ratio", default=1, type=float)
    parser.add_argument("--label_normalization", default=True, type=arg_as_bool)
    parser.add_argument("--adjacency_scaling", default=True, type=arg_as_bool)
    parser.add_argument("--img_size", default=128, type=int)
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--beta", default=0.1, type=float)
    parser.add_argument("--lambda", default=5, type=float)
    parser.add_argument("--data_dir", default="./data", type=str)
    parser.add_argument("--conv_dim", default=32, type=int)
    parser.add_argument("--train_trunk", action="store_true",
                        help="train the encoder trunk end-to-end instead of "
                             "freezing it (reference freezes a pretrained "
                             "resnet18; no pretrained weights offline)")
    parser.add_argument("--torch_weights", default="", type=str,
                        help="path to a torchvision-layout resnet18 state "
                             "dict (torch.save) to import into the encoder "
                             "trunk before training — restores the "
                             "reference's frozen-pretrained-encoder regime "
                             "(celeba/module/model.py:117-125); BN running "
                             "stats are honored (eval-mode normalization)")
    parser.add_argument("--stacked_decoder", default=False, type=arg_as_bool,
                        help="evaluate the 5 SAGAN generators as one "
                             "vmapped stacked program (functionally "
                             "identical — models/sagan.py::StackedGenerator"
                             " — but A/B'd ~8-10%% slower on-chip: XLA's "
                             "grouped-conv lowering loses more than the "
                             "DMA batching wins, docs/PERF.md). Checkpoints "
                             "from either format load under either setting")
    parser.add_argument("--align_warmup", default=0, type=int,
                        help="opt-in ALIGNMENT-FIRST WARMUP: train the "
                             "first N epochs on the alignment BCE alone "
                             "(loss = lambda*align), then switch to the "
                             "reference objective. Motivated by the "
                             "round-4 linear-probe oracle: frozen-trunk "
                             "features separate all 6 attributes "
                             "linearly, but joint training from scratch "
                             "plateaus at 4-5/6 — the 49152-pixel recon "
                             "gradient drowns the 6-term BCE before "
                             "alignment forms (docs/results/celeba_probe"
                             ".json). Default 0 = reference protocol")
    parser.add_argument("--packed_params", default=True, type=arg_as_bool,
                        help="train on the packed params layout: the "
                             "~1000 small leaves (biases, BN scales, SN "
                             "u/v, noise weights) of the SAGAN+ResNet "
                             "tree ride as one flat buffer per dtype, and "
                             "the Adam moments follow (ops/packing.py). "
                             "On-chip A/B: +1-2% in both dtypes via the "
                             "per-buffer mixed-precision pre-cast the "
                             "layout enables — the original "
                             "DMA-descriptor theory was falsified by the "
                             "trace (docs/PERF.md round 4). Same math; "
                             "checkpoints are always saved in the "
                             "canonical unpacked layout, so runs with "
                             "either setting resume each other")
    parser.add_argument("--bf16", action="store_true",
                        help="run the network in bfloat16 (params/losses "
                             "stay f32) — pays on this conv/MXU-bound "
                             "family, unlike the pendulum MLPs")
    parser.add_argument("--chunk", default=10, type=int,
                        help="epochs per scanned device dispatch. Lower it "
                             "for large corpora: a single dispatch that "
                             "runs for minutes can exceed the TPU "
                             "transport's tolerance (observed: a ~250 s "
                             "dispatch at 5k imgs killed the worker; 1-2 "
                             "epoch chunks of ~25-50 s are safe)")
    parser.add_argument("--ckpt_every", default=10, type=int,
                        help="epochs between mid-run checkpoint+viz saves; "
                             "<=0 disables mid-run saves (the final save "
                             "always runs). "
                             "(default 10, the reference's tmp_image "
                             "cadence, celeba/main.py:134-140). Each save "
                             "pulls the ~590 MB params+Adam tree through "
                             "the device tunnel (~25 s) — raise this on "
                             "multi-hundred-epoch runs where 40 saves "
                             "would dominate wall time (docs/PERF.md "
                             "round 4)")
    parser.add_argument("--async_ckpt", default=False, type=arg_as_bool,
                        help="overlap mid-run checkpoint saves with "
                             "training: snapshot the state on device (one "
                             "jitted copy, ~ms) and pull+pickle in a "
                             "background thread (utils/checkpoint.py::"
                             "AsyncCheckpointer). Same on-disk layout as "
                             "sync saves; at most one save in flight; "
                             "the final save is always synchronous. "
                             "DEFAULT OFF on this dev setup: the round-5 "
                             "A/B measured the device->host transfer "
                             "serializing with execution on the tunnel "
                             "transport (no hideable time beyond the "
                             "host-side pickle) and 2/4 runs hit a "
                             "multi-minute transport stall on the first "
                             "concurrent pull (docs/PERF.md round 5). On "
                             "a standard PCIe-attached TPU host the "
                             "overlap design applies; flip on there")
    add_resume_arg(parser)
    add_infra_args(parser)
    if debug:
        return parser.parse_args(args=[])
    return parser.parse_args(argv)


def main(argv=None):
    config = vars(get_args(argv=argv))
    set_random_seed(config["seed"])
    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"], tags=["CelebA"],
                          config=config)

    dataset = CelebADataset(data_dir=config["data_dir"],
                            causal_structure=config["causal_structure"],
                            train=True, img_size=config["img_size"],
                            seed=config["seed"])
    x_data = jax.device_put(dataset.x_data)
    y_data = jax.device_put(dataset.y_data)

    B = celeba_B(dataset.nodes, config["causal_structure"],
                 config["adjacency_scaling"])
    graph = CausalGraph(B, scm=config["scm"], flow_num=config["flow_num"],
                        inverse_loop=config["inverse_loop"])
    model = CelebACDGVAE(graph, latent_dim=config["latent_dim"],
                         image_size=config["img_size"],
                         conv_dim=config["conv_dim"],
                         freeze_trunk=not config["train_trunk"],
                         stacked=config["stacked_decoder"])
    key = jax.random.key(config["seed"])
    k_model, k_train = jax.random.split(key)
    params = model.init(k_model)
    if config["torch_weights"]:
        import torch
        sd = torch.load(config["torch_weights"], map_location="cpu")
        params["encoder"] = model.encoder.load_torch_weights(
            params["encoder"], sd)
        print(f"imported torchvision trunk from "
              f"{config['torch_weights']}")

    mesh = resolve_mesh(config)
    optimizer = optax.adam(config["lr"])
    compute_dtype = jnp.bfloat16 if config["bf16"] else None
    state = (params, optimizer.init(params))
    state, start_epoch = apply_resume(config, state)
    # decode dispatches on the params format, so a resumed checkpoint keeps
    # its own decoder layout regardless of --stacked_decoder (auto-converting
    # would desync the loaded opt_state) — tell the operator which path runs
    loaded_stacked = "stacked" in state[0]["decoder"]
    if config["resume"] and loaded_stacked != config["stacked_decoder"]:
        print(f"WARNING: resumed checkpoint stores a "
              f"{'stacked' if loaded_stacked else 'per-generator'} decoder; "
              f"--stacked_decoder {config['stacked_decoder']} is ignored — "
              f"training continues in the checkpoint's format")

    # packed params layout (ops/packing.py): runtime-only re-layout — the
    # checkpoint format stays canonical (unpacked), converted at the
    # boundaries here, so either --packed_params setting resumes the other
    packer = None
    if config["packed_params"]:
        from ..ops.packing import Packer, adam_state_map
        packer = Packer(state[0])
        state = (packer.pack(state[0]),
                 adam_state_map(state[1], packer.pack))

    def canonical(state):
        """(params, opt_state) in the checkpoint (unpacked) layout."""
        if packer is None:
            return state
        from ..ops.packing import adam_state_map
        return (packer.unpack(state[0]),
                adam_state_map(state[1], packer.unpack))

    os.makedirs(config["assets_dir"], exist_ok=True)
    # jit the recon viz: the SAGAN forward is hundreds of ops — run
    # eagerly, each would be its own device dispatch
    n_viz = min(9, len(x_data))
    x_viz = x_data[:n_viz]
    viz_fwd = jax.jit(lambda p, x, r: model(
        p if packer is None else packer.unpack(p), x, rng=r).xhat)

    def on_epoch(epoch, metrics):
        print(format_epoch(epoch, metrics))
        logger.log(metrics, step=epoch)

    ckpt = os.path.join(config["assets_dir"],
                        f"celeba_{config['model']}_{config['scm']}")
    saver = AsyncCheckpointer() if config["async_ckpt"] else None

    def post_epoch(state, epoch):
        xhat = viz_fwd(state[0], x_viz,
                       jax.random.fold_in(k_train, 2**31))
        viz_recon_grid(np.asarray(xhat),
                       f"{config['assets_dir']}/tmp_image_{epoch}.png",
                       n=n_viz)
        # mid-run checkpoint: long 128px runs are crash-resumable via
        # --resume (the reference never saves the celeba model at all).
        # Async (default): a device-side snapshot frees the train loop
        # immediately; the ~25 s device->host pull of the 590 MB tree
        # rides a background thread and overlaps the next chunk's epochs
        c_params, c_opt = canonical(state)
        if saver is not None:
            saver.save(ckpt, c_params, opt_state=c_opt,
                       step=epoch + 1, config=config)
        else:
            save_checkpoint(ckpt, c_params, opt_state=c_opt,
                            step=epoch + 1, config=config)

    if not config["eager"]:
        # dataset is device-resident -> scan-compile whole epoch chunks
        # (one dispatch per <=10 epochs; drop_last matches the reference,
        # celeba/main.py:70-72); recon viz at every chunk boundary. Under
        # --dp the shared driver swaps in the shard_map trainer with the
        # dual-latent L1 loss — the one family big enough (49M params,
        # convs) that DP over ICI genuinely pays. The driver takes
        # ownership of the data list: at 128px the corpus is GBs, so
        # nulling our locals releases the unsharded copy after the dp
        # reshard (viz keeps only the n_viz-row slice).
        from ..models.sagan import sn_refresh
        from ..train.celeba_steps import make_celeba_loss_fn
        from .common import run_scanned_training
        def make_loss_for(align_only):
            def make_loss():
                return make_celeba_loss_fn(model, config["beta"],
                                           config["lambda"],
                                           compute_dtype=compute_dtype,
                                           align_only=align_only,
                                           packer=packer)
            return make_loss

        # alignment-first warmup (--align_warmup N): phase 1 trains the
        # first N epochs on the alignment objective alone, phase 2 the
        # rest on the reference objective; 0 = single reference phase
        warm = min(config["align_warmup"], config["epochs"])
        phases = []
        if warm > start_epoch:
            phases.append((start_epoch, warm, True))
        if config["epochs"] > max(start_epoch, warm):
            phases.append((max(start_epoch, warm), config["epochs"],
                           False))
        for i, (e0, e1, align_only) in enumerate(phases):
            raw = celeba_unjitted_step(model, optimizer, config["beta"],
                                       config["lambda"],
                                       compute_dtype=compute_dtype,
                                       packer=packer,
                                       align_only=align_only)
            data = [x_data, y_data]
            if i == len(phases) - 1:
                # last phase: release our refs so the driver's ownership
                # frees the unsharded copy after a dp reshard (the 128px
                # corpus is GBs; viz keeps only the n_viz-row slice)
                x_data = y_data = None
            state = run_scanned_training(
                {**config, "epochs": e1}, raw_step=raw, state=state,
                data=data, k_train=k_train,
                mesh=mesh,
                make_loss=make_loss_for(align_only),
                # dp path: the sharded runner applies the optimizer
                # itself — the SN (u, v) state refresh rides as its
                # post-update hook (through the packed view when
                # --packed_params)
                post_update=sn_refresh if packer is None else
                (lambda pp: packer.map_unpacked(sn_refresh, pp)),
                optimizer=optimizer, chunk=config["chunk"],
                start_epoch=e0,
                on_epoch=on_epoch, post_epoch=post_epoch,
                # viz/checkpoint cadence independent of the dispatch
                # chunking (default 10 = the reference's tmp_image cadence;
                # <=0 disables mid-run saves — the final save still runs)
                post_epoch_pred=lambda e:
                config["ckpt_every"] > 0
                and (e + 1) % config["ckpt_every"] == 0)
    else:
        step = make_celeba_step(model, optimizer, config["beta"],
                                config["lambda"], mesh=mesh,
                                compute_dtype=compute_dtype, packer=packer)
        warm = min(config["align_warmup"], config["epochs"])
        step_warm = None if warm <= start_epoch else make_celeba_step(
            model, optimizer, config["beta"], config["lambda"], mesh=mesh,
            compute_dtype=compute_dtype, packer=packer, align_only=True)
        shuffle_rng = np.random.default_rng(config["seed"] + start_epoch)
        for epoch in range(start_epoch, config["epochs"]):
            active_step = step_warm if epoch < warm else step
            state, metrics = train_epoch(
                active_step, state, x_data, y_data, config["batch_size"],
                k_train, epoch, shuffle_rng, drop_remainder=True)
            on_epoch(epoch, metrics)
            # same (e+1) % N cadence as the scanned path: one flag value,
            # one set of save epochs (and no wasted epoch-0 pull)
            if (config["ckpt_every"] > 0
                    and (epoch + 1) % config["ckpt_every"] == 0):
                post_epoch(state, epoch)

    if saver is not None:
        saver.wait()  # drain the in-flight mid-run save (and its errors)
    state = canonical(state)
    save_checkpoint(ckpt, state[0], opt_state=state[1],
                    step=config["epochs"], config=config)
    print(f"checkpoint saved to {ckpt}")
    from .common import publish_model_artifact
    publish_model_artifact(logger, ckpt, config, model,
                           entry_file=__file__)
    logger.finish()
    return state


if __name__ == "__main__":
    main()
