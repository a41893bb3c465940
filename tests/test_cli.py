"""CLI integration smoke tests: every entry point runs end-to-end at toy
sizes (16px, 200 DGP samples, 1-2 epochs), chained through real checkpoints
like a user would run them."""
import json
import os

import numpy as np

import pytest

pytestmark = pytest.mark.slow

SMALL = ["--image_size", "16", "--n_samples", "200", "--epochs", "2",
         "--batch_size", "32"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


@pytest.fixture(scope="module")
def pendulum_ckpt(workdir):
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "pend")
    main.main(SMALL + ["--model", "CDGVAE", "--scm", "linear",
                       "--assets_dir", out])
    return os.path.join(out, "model_CDGVAE_linear")


@pytest.fixture(scope="module")
def classifier_ckpt(workdir):
    from cdgvae_tpu.cli import main_classifier
    out = os.path.join(workdir, "clf")
    main_classifier.main(["--image_size", "16", "--n_samples", "200",
                          "--epochs", "1", "--batch_size", "32",
                          "--assets_dir", out])
    return os.path.join(out, "CDMClassifier")


def test_main_writes_checkpoint(pendulum_ckpt):
    assert os.path.exists(os.path.join(pendulum_ckpt, "state.pkl"))
    cfg = json.load(open(os.path.join(pendulum_ckpt, "config.json")))
    assert cfg["model"] == "CDGVAE" and cfg["image_size"] == 16


@pytest.mark.slow
def test_main_vae_and_infomax(workdir):
    from cdgvae_tpu.cli import main
    main.main(SMALL + ["--model", "VAE", "--epochs", "1",
                       "--assets_dir", os.path.join(workdir, "vae")])
    main.main(SMALL + ["--model", "InfoMax", "--epochs", "1",
                       "--assets_dir", os.path.join(workdir, "infomax")])


def test_main_semi(workdir):
    from cdgvae_tpu.cli import main_semi
    main_semi.main(SMALL + ["--labeled_ratio", "0.3", "--batch_sizeL", "8",
                            "--epochs", "1",
                            "--assets_dir", os.path.join(workdir, "semi")])


@pytest.mark.slow
def test_inference_cli(pendulum_ckpt, workdir):
    from cdgvae_tpu.cli import inference
    out = os.path.join(workdir, "inf")
    grid = inference.main(["--checkpoint", pendulum_ckpt,
                           "--assets_dir", out])
    assert grid.shape == (4, 7, 16, 16, 3)
    assert os.path.exists(os.path.join(out, "do.png"))


def test_metric_cli(pendulum_ckpt, classifier_ckpt, workdir):
    from cdgvae_tpu.cli import metric
    out = os.path.join(workdir, "cdm")
    lower, upper = metric.main([
        "--checkpoint", pendulum_ckpt,
        "--classifier_checkpoint", classifier_ckpt,
        "--assets_dir", out])
    assert lower.shape == (4, 4)
    # structural zeros survive through the full CLI path
    assert upper[2, 0] == 0.0 and upper[3, 1] == 0.0


def test_sample_efficiency_cli(pendulum_ckpt, workdir):
    from cdgvae_tpu.cli import sample_efficiency
    res = sample_efficiency.main(["--checkpoint", pendulum_ckpt,
                                  "--repeats", "1",
                                  "--assets_dir",
                                  os.path.join(workdir, "se")])
    assert 0 < res["sample_efficiency"]


def test_dr_cli_chain(workdir):
    from cdgvae_tpu.cli import dr_main, dr_robustness
    out = os.path.join(workdir, "dr")
    dr_main.main(SMALL + ["--epochs", "1", "--assets_dir", out])
    ckpt = os.path.join(out, "model_DR_CDGVAE_linear")
    res = dr_robustness.main(["--checkpoint", ckpt, "--repeats", "1",
                              "--epochs", "5",
                              "--assets_dir", os.path.join(workdir, "rob")])
    assert 0 <= res["worst_group_accuracy"] <= res["avg_accuracy"] <= 1


def test_toy_dr_cli():
    from cdgvae_tpu.cli import toy_dr
    results = toy_dr.main(["--n", "1000"])
    assert set(results) == {"Disentangled", "ERM", "Entangled"}


@pytest.mark.slow
def test_tabular_cli_chain(workdir):
    from cdgvae_tpu.cli import tabular_main, tabular_inference
    out = os.path.join(workdir, "tab")
    tabular_main.main(["--dataset", "loan", "--epochs", "2",
                       "--batch_size", "128", "--assets_dir", out,
                       "--data_dir", "/nonexistent"])
    ckpt = os.path.join(out, "tabular_CDGVAE_loan")
    res = tabular_inference.main(["--checkpoint", ckpt,
                                  "--data_dir", "/nonexistent",
                                  "--assets_dir",
                                  os.path.join(workdir, "tabinf")])
    assert "SHD (Sample)" in res


@pytest.mark.slow
def test_tabular_tvae_cli(workdir):
    from cdgvae_tpu.cli import tabular_main_tvae, tabular_inference_tvae
    out = os.path.join(workdir, "tvae")
    tabular_main_tvae.main(["--dataset", "loan", "--epochs", "2",
                            "--assets_dir", out,
                            "--data_dir", "/nonexistent"])
    ckpt = os.path.join(out, "tabular_TVAE_loan")
    res = tabular_inference_tvae.main(["--checkpoint", ckpt,
                                       "--data_dir", "/nonexistent",
                                       "--assets_dir",
                                       os.path.join(workdir, "tvinf")])
    assert "SHD (Sample)" in res


def test_dag_discovery_cli(workdir):
    from cdgvae_tpu.cli import dag_discovery
    G_raw, G_label = dag_discovery.main(
        ["--dataset", "loan", "--data_dir", "/nonexistent",
         "--assets_dir", os.path.join(workdir, "dag")])
    assert G_raw.shape == (5, 5)
    assert G_label.shape == (3, 3)


@pytest.mark.slow
def test_celeba_cli(workdir):
    from cdgvae_tpu.cli import celeba_main
    out = os.path.join(workdir, "celeba")
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--epochs", "1",
                      "--batch_size", "4", "--data_dir", "/nonexistent",
                      "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "celeba_CDGVAE_linear",
                                       "state.pkl"))


def test_celeba_chunk_cadence(workdir):
    """--chunk sets dispatch granularity only: the every-10-epoch
    viz/mid-run-checkpoint cadence must hold regardless of chunking, and
    the mid-run checkpoint must be resumable (the crash-retry path)."""
    from cdgvae_tpu.cli import celeba_main
    from cdgvae_tpu.utils.checkpoint import load_checkpoint
    out = os.path.join(workdir, "celeba_chunk")
    args = ["--img_size", "32", "--conv_dim", "4", "--batch_size", "4",
            "--data_dir", "/nonexistent", "--assets_dir", out]
    celeba_main.main(args + ["--epochs", "12", "--chunk", "3"])
    # viz fired exactly at the 10-epoch boundary (epoch index 9), not at
    # every 3-epoch chunk end
    viz = sorted(f for f in os.listdir(out) if f.startswith("tmp_image"))
    assert viz == ["tmp_image_9.png"]
    ckpt = os.path.join(out, "celeba_CDGVAE_linear")
    assert load_checkpoint(ckpt)["step"] == 12
    # resume from the final checkpoint and continue to 14
    celeba_main.main(args + ["--epochs", "14", "--chunk", "3",
                             "--resume", ckpt])
    assert load_checkpoint(ckpt)["step"] == 14


def test_celeba_ckpt_every_disable(workdir):
    """--ckpt_every 0 disables mid-run viz/checkpoint saves entirely (no
    modulo-by-zero), while the final checkpoint still lands — the setting
    long study arms use to keep multi-hundred-epoch runs off the ~25 s/save
    device->host pull (docs/PERF.md round 4)."""
    from cdgvae_tpu.cli import celeba_main
    from cdgvae_tpu.utils.checkpoint import load_checkpoint
    out = os.path.join(workdir, "celeba_ck0")
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--batch_size",
                      "4", "--data_dir", "/nonexistent", "--assets_dir", out,
                      "--epochs", "12", "--chunk", "3", "--ckpt_every", "0"])
    assert [f for f in os.listdir(out) if f.startswith("tmp_image")] == []
    ckpt = os.path.join(out, "celeba_CDGVAE_linear")
    assert load_checkpoint(ckpt)["step"] == 12


def test_celeba_torch_weights(workdir):
    """--torch_weights imports a torchvision-layout trunk before training;
    with the default frozen trunk the imported weights (incl. BN running
    stats) must survive training bit-exactly into the checkpoint."""
    torch = pytest.importorskip("torch")
    from cdgvae_tpu.cli import celeba_main
    from cdgvae_tpu.utils.checkpoint import load_checkpoint
    from test_celeba import _random_resnet18_state_dict

    sd = _random_resnet18_state_dict(np.random.default_rng(3))
    sd_path = os.path.join(workdir, "trunk.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, sd_path)

    out = os.path.join(workdir, "celeba_tw")
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--epochs",
                      "1", "--batch_size", "4", "--data_dir",
                      "/nonexistent", "--assets_dir", out,
                      "--torch_weights", sd_path])
    ck = load_checkpoint(os.path.join(out, "celeba_CDGVAE_linear"))
    enc = ck["params"]["encoder"]
    np.testing.assert_array_equal(
        np.asarray(enc["stem_conv"]["w"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0))  # OIHW -> HWIO
    # running stats imported -> eval-mode BN in the frozen trunk
    np.testing.assert_array_equal(np.asarray(enc["stem_bn"]["mean"]),
                                  sd["bn1.running_mean"])
    assert ck["config"]["torch_weights"] == sd_path


def test_main_resume(workdir, pendulum_ckpt):
    """--resume restores params+opt+epoch and continues to the target."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "resumed")
    state = main.main(SMALL + ["--model", "CDGVAE", "--epochs", "3",
                               "--resume", pendulum_ckpt,
                               "--assets_dir", out])
    cfg = json.load(open(os.path.join(out, "model_CDGVAE_linear",
                                      "config.json")))
    assert cfg["epochs"] == 3
    assert state is not None


def test_main_dp_mesh_scanned(workdir):
    """--dp 8 routes through the shard_map scanned trainer (per-shard
    shuffle + per-step gradient pmean) and writes a working checkpoint."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "dp")
    main.main(SMALL + ["--model", "CDGVAE", "--epochs", "2",
                       "--batch_size", "16", "--dp", "8",
                       "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_CDGVAE_linear",
                                       "state.pkl"))


def test_dr_dp_mesh_scanned(workdir):
    """DR family rides the shard_map scanned trainer under --dp too."""
    from cdgvae_tpu.cli import dr_main
    out = os.path.join(workdir, "dr_dp")
    dr_main.main(SMALL + ["--epochs", "2", "--batch_size", "16",
                          "--dp", "8", "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_DR_CDGVAE_linear",
                                       "state.pkl"))


def test_main_online_single_device(workdir):
    """cli.main --online --dp 1 pins the single-device online branch
    (no dataset is built; viz comes from a device draw)."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "online_1dev")
    main.main(SMALL + ["--model", "CDGVAE", "--epochs", "2",
                       "--batch_size", "16", "--dp", "1", "--online",
                       "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_CDGVAE_linear",
                                       "state.pkl"))
    assert os.path.exists(os.path.join(out, "recon.png"))


def test_main_online_infomax(workdir):
    """cli.main --online --model InfoMax: the pair loss + fused pair
    optimizer ride the online runner (single-device and dp-mesh)."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "online_infomax")
    main.main(SMALL + ["--model", "InfoMax", "--epochs", "2",
                       "--batch_size", "16", "--dp", "1", "--online",
                       "--assets_dir", out])
    out2 = os.path.join(workdir, "online_infomax_dp")
    main.main(SMALL + ["--model", "InfoMax", "--epochs", "2",
                       "--batch_size", "16", "--dp", "8", "--online",
                       "--assets_dir", out2])
    for o in (out, out2):
        assert os.path.exists(os.path.join(o, "model_InfoMax_linear",
                                           "state.pkl"))


def test_main_online_dp_mesh_scanned(workdir):
    """--online --dp 8: multi-chip fresh-data-per-step training (per-device
    on-chip DGP+rasterizer, gradient pmean) writes a working checkpoint."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "online_dp")
    main.main(SMALL + ["--model", "CDGVAE", "--epochs", "2",
                       "--batch_size", "16", "--dp", "8", "--online",
                       "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_CDGVAE_linear",
                                       "state.pkl"))


def test_dr_online_dp_mesh_scanned(workdir):
    """DR family --online --dp: the spurious-background DGP runs per
    device inside the sharded scan."""
    from cdgvae_tpu.cli import dr_main
    out = os.path.join(workdir, "dr_online_dp")
    dr_main.main(SMALL + ["--epochs", "2", "--batch_size", "16",
                          "--dp", "8", "--online", "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_DR_CDGVAE_linear",
                                       "state.pkl"))


def test_semi_online(workdir):
    """main_semi --online: infinite unlabeled stream from the device DGP,
    fixed labeled subset subsampled on device per step. --dp 1 pins the
    SINGLE-device branch (the 8-device conftest would otherwise
    auto-activate the mesh)."""
    from cdgvae_tpu.cli import main_semi
    out = os.path.join(workdir, "semi_online")
    main_semi.main(SMALL + ["--epochs", "2", "--batch_size", "16",
                            "--batch_sizeL", "8", "--online", "--dp", "1",
                            "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_CDGVAEsemi_nonlinear",
                                       "state.pkl"))


def test_dr_semi_online_dp_mesh_scanned(workdir):
    """dr_main_semi --online --dp 8: per-device DR DGP draws + per-shard
    labeled subsampling."""
    from cdgvae_tpu.cli import dr_main_semi
    out = os.path.join(workdir, "dr_semi_online_dp")
    dr_main_semi.main(SMALL + ["--epochs", "2", "--batch_size", "16",
                               "--batch_sizeL", "8", "--dp", "8",
                               "--online", "--assets_dir", out])
    assert os.path.exists(os.path.join(
        out, "model_DR_CDGVAEsemi_nonlinear", "state.pkl"))


def test_tabular_dp_mesh_scanned(workdir):
    """Tabular family under --dp: shard_map scanned trainer with the
    dataset-specific loss."""
    from cdgvae_tpu.cli import tabular_main
    out = os.path.join(workdir, "tab_dp")
    tabular_main.main(["--dataset", "loan", "--epochs", "2",
                       "--batch_size", "128", "--dp", "8",
                       "--assets_dir", out, "--data_dir", "/nonexistent"])
    assert os.path.exists(os.path.join(out, "tabular_CDGVAE_loan",
                                       "state.pkl"))


def test_tvae_dp_mesh_scanned(workdir):
    """CDG-TVAE under --dp: sharded scanned trainer with the span-walking
    loss; the post-update sigma clamp holds on the final params."""
    import pickle
    from cdgvae_tpu.cli import tabular_main_tvae
    out = os.path.join(workdir, "tvae_dp")
    tabular_main_tvae.main(["--dataset", "loan", "--epochs", "2",
                            "--batch_size", "128", "--dp", "8",
                            "--assets_dir", out,
                            "--data_dir", "/nonexistent"])
    ckpt = os.path.join(out, "tabular_TVAE_loan")
    with open(os.path.join(ckpt, "state.pkl"), "rb") as f:
        state = pickle.load(f)
    sigma = np.asarray(state["params"]["sigma"])
    assert np.all(sigma >= 0.01 - 1e-7) and np.all(sigma <= 0.1 + 1e-7)


def test_semi_dp_mesh_scanned(workdir):
    """Semi-supervised under --dp: both streams sharded, per-shard labeled
    cycling, gradient pmean per step."""
    from cdgvae_tpu.cli import main_semi
    out = os.path.join(workdir, "semi_dp")
    main_semi.main(SMALL + ["--labeled_ratio", "0.3", "--batch_sizeL", "8",
                            "--epochs", "2", "--batch_size", "16",
                            "--dp", "8", "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_CDGVAEsemi_nonlinear",
                                       "state.pkl"))


def test_dr_semi_dp_mesh_scanned(workdir):
    """DR semi-supervised under --dp."""
    from cdgvae_tpu.cli import dr_main_semi
    out = os.path.join(workdir, "dr_semi_dp")
    dr_main_semi.main(SMALL + ["--labeled_ratio", "0.3",
                               "--batch_sizeL", "8", "--epochs", "2",
                               "--batch_size", "16", "--dp", "8",
                               "--assets_dir", out])
    assert os.path.exists(os.path.join(
        out, "model_DR_CDGVAEsemi_nonlinear", "state.pkl"))


@pytest.mark.slow
def test_celeba_dp_mesh_scanned(workdir):
    """CelebA under --dp: sharded scanned trainer with the dual-latent L1
    loss (the family where DP genuinely pays)."""
    from cdgvae_tpu.cli import celeba_main
    out = os.path.join(workdir, "celeba_dp")
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--epochs", "2",
                      "--batch_size", "8", "--dp", "8",
                      "--data_dir", "/nonexistent", "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "celeba_CDGVAE_linear",
                                       "state.pkl"))


def test_infomax_dp_mesh_scanned(workdir):
    """InfoMax under --dp: joint (γ+1)·MI loss over the pair pytree with
    the fused pair optimizer on the sharded scanned trainer."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "infomax_dp")
    main.main(SMALL + ["--model", "InfoMax", "--epochs", "2",
                       "--batch_size", "16", "--dp", "8",
                       "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_InfoMax_linear",
                                       "state.pkl"))


def test_dr_infomax_scanned(workdir):
    """DR InfoMax now rides the scanned pair trainer (was eager-only)."""
    from cdgvae_tpu.cli import dr_main
    out = os.path.join(workdir, "dr_infomax")
    dr_main.main(SMALL + ["--model", "InfoMax", "--epochs", "2",
                          "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_DR_InfoMax_linear",
                                       "state.pkl"))


def test_tabular_infomax_scanned_and_dp(workdir):
    """Tabular InfoMax rides the scanned pair trainer, incl. under --dp."""
    from cdgvae_tpu.cli import tabular_main
    out = os.path.join(workdir, "tab_infomax")
    tabular_main.main(["--dataset", "loan", "--model", "InfoMax",
                       "--epochs", "2", "--batch_size", "128",
                       "--assets_dir", out, "--data_dir", "/nonexistent"])
    assert os.path.exists(os.path.join(out, "tabular_InfoMax_loan",
                                       "state.pkl"))
    out = os.path.join(workdir, "tab_infomax_dp")
    tabular_main.main(["--dataset", "loan", "--model", "InfoMax",
                       "--epochs", "2", "--batch_size", "128", "--dp", "8",
                       "--assets_dir", out, "--data_dir", "/nonexistent"])
    assert os.path.exists(os.path.join(out, "tabular_InfoMax_loan",
                                       "state.pkl"))


def test_dp_smoke_batch_clamp(workdir):
    """--dp with a smaller-than-batch dataset clamps the batch like the
    single-device path instead of failing at trace time."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "dp_clamp")
    main.main(["--image_size", "16", "--n_samples", "100", "--epochs", "2",
               "--batch_size", "128", "--dp", "8", "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "model_CDGVAE_linear",
                                       "state.pkl"))


@pytest.mark.slow
def test_resume_all_families(workdir):
    """--resume (restores params+opt+epoch) now works on every training
    CLI, not just cli.main."""
    from cdgvae_tpu.cli import (dr_main, tabular_main, tabular_main_tvae,
                                celeba_main, main_semi)
    out = os.path.join(workdir, "res_dr")
    dr_main.main(SMALL + ["--epochs", "1", "--assets_dir", out])
    dr_main.main(SMALL + ["--epochs", "2", "--assets_dir", out,
                          "--resume",
                          os.path.join(out, "model_DR_CDGVAE_linear")])

    out = os.path.join(workdir, "res_tab")
    tabular_main.main(["--dataset", "loan", "--epochs", "1",
                       "--batch_size", "128", "--assets_dir", out,
                       "--data_dir", "/nonexistent"])
    tabular_main.main(["--dataset", "loan", "--epochs", "2",
                       "--batch_size", "128", "--assets_dir", out,
                       "--data_dir", "/nonexistent", "--resume",
                       os.path.join(out, "tabular_CDGVAE_loan")])

    out = os.path.join(workdir, "res_tvae")
    tabular_main_tvae.main(["--dataset", "loan", "--epochs", "1",
                            "--assets_dir", out,
                            "--data_dir", "/nonexistent"])
    tabular_main_tvae.main(["--dataset", "loan", "--epochs", "2",
                            "--assets_dir", out,
                            "--data_dir", "/nonexistent", "--resume",
                            os.path.join(out, "tabular_TVAE_loan")])

    out = os.path.join(workdir, "res_celeba")
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--epochs",
                      "1", "--batch_size", "4",
                      "--data_dir", "/nonexistent", "--assets_dir", out])
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--epochs",
                      "2", "--batch_size", "4",
                      "--data_dir", "/nonexistent", "--assets_dir", out,
                      "--resume",
                      os.path.join(out, "celeba_CDGVAE_linear")])

    out = os.path.join(workdir, "res_semi")
    main_semi.main(SMALL + ["--labeled_ratio", "0.3", "--batch_sizeL", "8",
                            "--epochs", "1", "--assets_dir", out])
    main_semi.main(SMALL + ["--labeled_ratio", "0.3", "--batch_sizeL", "8",
                            "--epochs", "2", "--assets_dir", out,
                            "--resume",
                            os.path.join(out,
                                         "model_CDGVAEsemi_nonlinear")])


def test_infomax_resume(workdir):
    """InfoMax checkpoints carry the discriminator params/opt state in
    extras, so --resume restores the full 4-tuple and continues."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "res_infomax")
    main.main(SMALL + ["--model", "InfoMax", "--epochs", "1",
                       "--assets_dir", out])
    state = main.main(SMALL + ["--model", "InfoMax", "--epochs", "2",
                               "--assets_dir", out, "--resume",
                               os.path.join(out, "model_InfoMax_linear")])
    assert len(state) == 4


def test_resume_past_epochs_rejected(workdir, pendulum_ckpt):
    """Resuming a checkpoint whose epoch is already >= --epochs is refused
    (running on would zero-train and overwrite the step metadata)."""
    from cdgvae_tpu.cli import main
    with pytest.raises(ValueError, match="already >="):
        main.main(SMALL + ["--model", "CDGVAE", "--epochs", "2",
                           "--resume", pendulum_ckpt,
                           "--assets_dir", os.path.join(workdir, "rpe")])


@pytest.mark.slow
def test_celeba_dp_bf16(workdir):
    """bf16 mixed precision composes with the sharded scanned trainer
    (the celeba loss casts network compute, keeps f32 params/losses)."""
    from cdgvae_tpu.cli import celeba_main
    out = os.path.join(workdir, "celeba_dp_bf16")
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--epochs",
                      "2", "--batch_size", "8", "--dp", "8", "--bf16",
                      "--data_dir", "/nonexistent", "--assets_dir", out])
    assert os.path.exists(os.path.join(out, "celeba_CDGVAE_linear",
                                       "state.pkl"))


@pytest.mark.slow
def test_profile_flag_writes_trace(workdir):
    """--profile DIR writes a jax.profiler trace of the scanned training
    drive (the SURVEY §5 tracing subsystem, reachable from every training
    CLI via add_infra_args)."""
    from cdgvae_tpu.cli import main
    out = os.path.join(workdir, "prof_run")
    trace_dir = os.path.join(workdir, "trace")
    main.main(SMALL + ["--model", "CDGVAE", "--epochs", "1",
                       "--assets_dir", out, "--profile", trace_dir])
    profiles = []
    for root, _, files in os.walk(trace_dir):
        profiles.extend(f for f in files if f.endswith(".xplane.pb"))
    assert profiles, f"no .xplane.pb written under {trace_dir}"


def test_log_artifact_publishes_checkpoint(workdir, monkeypatch):
    """MetricLogger.log_artifact mirrors reference main.py:233-240: the
    checkpoint directory plus source files land in a wandb Artifact with
    the config as metadata. Exercised against a stub wandb module (the
    real one is optional); without wandb the call is a silent no-op."""
    import sys
    import types
    from cdgvae_tpu.utils.logging import MetricLogger

    ckpt = os.path.join(workdir, "model_X")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "state.pkl"), "wb") as f:
        f.write(b"x")

    published = []

    class FakeArtifact:
        def __init__(self, name, type=None, metadata=None):
            self.name, self.type, self.metadata = name, type, metadata
            self.dirs, self.files = [], []

        def add_dir(self, d):
            self.dirs.append(d)

        def add_file(self, p):
            self.files.append(p)

    class FakeRun:
        def log(self, *a, **k):
            pass

        def log_artifact(self, art):
            published.append(art)

        def finish(self):
            pass

    fake = types.ModuleType("wandb")
    fake.Artifact = FakeArtifact
    fake.init = lambda **k: FakeRun()
    monkeypatch.setitem(sys.modules, "wandb", fake)

    logger = MetricLogger(use_wandb=True, config={"model": "X"})
    logger.log_artifact("model_X", ckpt, metadata={"model": "X"},
                        sources=[__file__, "/nonexistent.py"])
    logger.finish()

    assert len(published) == 1
    art = published[0]
    assert art.name == "model_X" and art.type == "model"
    assert art.metadata == {"model": "X"}
    assert art.dirs == [ckpt]
    assert art.files == [__file__]  # missing sources are skipped

    # no wandb requested -> no-op, no error
    MetricLogger().log_artifact("m", ckpt)


def test_celeba_align_warmup_phases(workdir):
    """--align_warmup N: phase-1 epochs train on the alignment objective
    alone, then the reference objective resumes; the run completes and
    checkpoints normally (metrics keys unchanged across the phase
    boundary)."""
    from cdgvae_tpu.cli import celeba_main
    from cdgvae_tpu.utils.checkpoint import load_checkpoint
    out = os.path.join(workdir, "celeba_warm")
    celeba_main.main(["--img_size", "32", "--conv_dim", "4", "--epochs",
                      "2", "--batch_size", "4", "--data_dir",
                      "/nonexistent", "--assets_dir", out,
                      "--align_warmup", "1", "--chunk", "1"])
    ck = load_checkpoint(os.path.join(out, "celeba_CDGVAE_linear"))
    assert ck["step"] == 2
    assert ck["config"]["align_warmup"] == 1
    # metrics logged for both epochs (phase boundary did not skip any)
    import json
    lines = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl"))]
    assert [l["step"] for l in lines] == [0, 1]
