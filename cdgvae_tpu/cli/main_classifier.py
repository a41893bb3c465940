"""Train the masked per-node factor classifier used by the CDM metric
(reference main_classifier.py). Masks: light, angle, shadow, shadow — both
shadow factors share the bottom band (main_classifier.py:126-139)."""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.pendulum import PendulumDataset
from ..models.vae import pendulum_masks
from ..models.classifier import FactorClassifier
from ..ops.losses import alignment_bce
from ..train.loop import Averager, batch_indices, format_epoch
from ..utils.simulation import set_random_seed
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from .common import add_infra_args, add_png_data_dir_arg, arg_as_bool


def classifier_masks(image_size: int = 64, node: int = 4) -> np.ndarray:
    m3 = pendulum_masks(image_size, k=3)
    return np.concatenate([m3, np.repeat(m3[-1:], node - 3, axis=0)], axis=0)


def get_args(debug: bool = False, argv=None):
    parser = argparse.ArgumentParser("parameters")
    # parity with reference main_classifier.py:40-76
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--node", default=4, type=int)
    parser.add_argument("--image_size", default=64, type=int)
    parser.add_argument("--labeled_ratio", default=1, type=float)
    parser.add_argument("--label_normalization", default=True, type=arg_as_bool)
    parser.add_argument("--epochs", default=50, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    add_png_data_dir_arg(parser)
    add_infra_args(parser)
    if debug:
        return parser.parse_args(args=[])
    return parser.parse_args(argv)


def main(argv=None):
    config = vars(get_args(argv=argv))
    set_random_seed(config["seed"])
    logger = MetricLogger(logdir=config["assets_dir"],
                          use_wandb=config["wandb"],
                          tags=["Classifier"], config=config)

    dataset = PendulumDataset(data_dir=config.get("data_dir") or None,
        image_size=config["image_size"], train=True,
                              seed=config["seed"], n=config["n_samples"])
    x_data = jax.device_put(dataset.x_data)
    y_data = jax.device_put(dataset.y_data)

    masks = classifier_masks(config["image_size"], config["node"])
    clf = FactorClassifier(masks, config["node"], config["image_size"])
    params = clf.init(jax.random.key(config["seed"]))
    opt = optax.adam(config["lr"])
    opt_state = opt.init(params)
    node = config["node"]

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return alignment_bce(clf(p, x), y[:, :node])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, {
            "loss": loss}

    shuffle_rng = np.random.default_rng(config["seed"])
    os.makedirs(config["assets_dir"], exist_ok=True)
    for epoch in range(config["epochs"]):
        avg = Averager()
        for idx in batch_indices(len(dataset), config["batch_size"],
                                 shuffle_rng):
            params, opt_state, m = step(params, opt_state, x_data[idx],
                                        y_data[idx])
            avg.add(m)
        metrics = avg.result()
        print(format_epoch(epoch, metrics))
        logger.log(metrics, step=epoch)

    ckpt = os.path.join(config["assets_dir"], "CDMClassifier")
    save_checkpoint(ckpt, params, opt_state=opt_state,
                    step=config["epochs"], config=config)
    print(f"checkpoint saved to {ckpt}")
    from .common import publish_model_artifact
    publish_model_artifact(logger, ckpt, config, None,
                           entry_file=__file__)
    logger.finish()
    return params


if __name__ == "__main__":
    main()
