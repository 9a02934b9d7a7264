"""End-to-end test of tools/validate_reference_parity.py (VERDICT r3 #4):
fake torchvision checkpoint + synthetic fixture → convert → encoder
overlay → CV loss sweep → side-by-side table + report, one command."""

import json
import os
import sys

import numpy as np
import pytest

from segtpu.data.io import make_synthetic_dataset

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    return make_synthetic_dataset(str(root), n_images=8, image_type="W")


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    from validate_reference_parity import make_fake_torchvision_checkpoint
    p = str(tmp_path_factory.mktemp("ckpt") / "resnet34_fake.pth")
    return make_fake_torchvision_checkpoint(p, seed=0)


def test_fake_checkpoint_is_torchvision_layout(fake_ckpt):
    import torch
    sd = torch.load(fake_ckpt, map_location="cpu", weights_only=True)
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["layer4.0.downsample.0.weight"].shape == (512, 256, 1, 1)
    assert "layer3.5.bn2.running_var" in sd  # resnet34 layer3 has 6 blocks


def test_quick_parity_run(data_dir, fake_ckpt, tmp_path):
    from validate_reference_parity import run
    out = run(data_dir, fake_ckpt, quick=True, seed=42,
              save_root=str(tmp_path), test_size=0.25,
              augmentations_per_image=0,
              base_overrides={"img_size": (32, 32), "num_epochs": 1})
    assert out["verdict"] == "plumbing-ok"
    assert {r["loss"] for r in out["rows"]} == {"BCE Loss", "Combo Loss"}
    for r in out["rows"]:
        assert np.isfinite(r["cv_iou"])
        assert np.isfinite(r["cv_iou_delta"])
        assert r["test_iou"] is None or np.isfinite(r["test_iou"])
    report = os.path.join(out["results"]["save_dir"], "parity_report.json")
    assert os.path.exists(report)
    with open(report) as f:
        rep = json.load(f)
    assert rep["verdict"] == "plumbing-ok"


def test_encoder_checkpoint_flows_into_train_model(data_dir, fake_ckpt):
    """config['encoder_checkpoint'] must actually change the initial
    weights train_model trains from (vs the fresh seed init)."""
    import jax
    from segtpu.models.torch_convert import load_pretrained
    from segtpu.train.engine import get_engine

    engine = get_engine({"backbone": "resnet34", "use_attention": False,
                         "loss_fn": "combo"})
    p_ckpt, _ = load_pretrained(engine.model, jax.random.key(0),
                                (1, 32, 32, 1), fake_ckpt)
    fresh = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 1e-5)
    got = np.asarray(p_ckpt["encoder"]["input_conv"]["kernel"])
    ref = np.asarray(fresh.params["encoder"]["input_conv"]["kernel"])
    assert not np.allclose(got, ref)  # overlay took effect


def test_cli_entry_parses():
    from validate_reference_parity import main
    with pytest.raises(SystemExit):
        main(["--help"])


@pytest.mark.parametrize("arch,probe_key,probe_shape", [
    ("resnet50", "layer1.0.downsample.0.weight", (256, 64, 1, 1)),
    ("densenet121", "features.denseblock4.denselayer16.conv2.weight",
     (32, 128, 3, 3)),
])
def test_fake_checkpoint_other_archs_convert(tmp_path, arch, probe_key,
                                             probe_shape):
    """VERDICT r4 #8: resnet50/densenet121 fake checkpoints are real
    torchvision layouts AND flow through load_pretrained into a model of
    that backbone."""
    import jax
    import torch
    from segtpu.models.torch_convert import load_pretrained
    from segtpu.train.engine import get_engine
    from validate_reference_parity import make_fake_torchvision_checkpoint

    p = make_fake_torchvision_checkpoint(
        str(tmp_path / f"{arch}_fake.pth"), seed=1, arch=arch)
    sd = torch.load(p, map_location="cpu", weights_only=True)
    assert tuple(sd[probe_key].shape) == probe_shape

    engine = get_engine({"backbone": arch, "use_attention": False,
                         "loss_fn": "combo"})
    params, stats = load_pretrained(engine.model, jax.random.key(0),
                                    (1, 32, 32, 1), p)
    fresh = engine.init_state(jax.random.key(0), (1, 32, 32, 1), 1e-3, 1e-5)
    got = np.asarray(params["encoder"]["input_conv"]["kernel"])
    ref = np.asarray(fresh.params["encoder"]["input_conv"]["kernel"])
    assert got.shape == ref.shape and not np.allclose(got, ref)


def test_encoder_checkpoint_mapping_resolves_per_backbone(fake_ckpt):
    from segtpu.models.torch_convert import resolve_encoder_checkpoint
    m = {"resnet34": fake_ckpt}
    assert resolve_encoder_checkpoint(m, "resnet34") == fake_ckpt
    assert resolve_encoder_checkpoint(m, "resnet50") is None
    assert resolve_encoder_checkpoint(fake_ckpt, "resnet50") == fake_ckpt


@pytest.mark.slow
def test_quick_aug_amount_table(data_dir, fake_ckpt, tmp_path):
    from validate_reference_parity import run_aug_amount
    out = run_aug_amount(
        data_dir, fake_ckpt, quick=True, save_root=str(tmp_path),
        base_overrides={"img_size": (32, 32), "num_epochs": 1})
    assert out["verdict"] == "plumbing-ok"
    assert [r["row"] for r in out["rows"]] == [1, 4]
    for r in out["rows"]:
        assert np.isfinite(r["cv_iou"]) and np.isfinite(r["efficiency"])


@pytest.mark.slow
def test_quick_config_grid_table(data_dir, fake_ckpt, tmp_path):
    """Multi-backbone grid: resnet34 rows use the checkpoint mapping,
    resnet50 rows (no entry) fall back to fresh init — both complete."""
    from validate_reference_parity import run_config_grid
    out = run_config_grid(
        data_dir, {"resnet34": fake_ckpt}, quick=True,
        save_root=str(tmp_path),
        base_overrides={"img_size": (32, 32), "num_epochs": 1})
    assert out["verdict"] == "plumbing-ok"
    names = {r["row"] for r in out["rows"]}
    assert names == {"backbone_resnet34_att_False_bs_4",
                     "backbone_resnet50_att_False_bs_4"}
    for r in out["rows"]:
        assert np.isfinite(r["cv_iou"])
