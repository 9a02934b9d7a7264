"""Differential parity vs the reference's OWN code (/root/reference).

Round-1 verdict item #1: every parity claim must be proven by differencing
against the reference's importable modules, not our re-derivations. These
tests import the actual ``losses.py``, ``utils.py``, ``advanced_models.py``
and ``train.py`` (via tools/reference_shim.py: albumentations stub +
torchvision-exact shim) and assert numerical agreement with segtpu.

Documented reference defect verified here: the reference's densenet121
U-Net cannot run forward at all — ``_extract_densenet_features``
(advanced_models.py:207-262) yields x4 = denseblock3 output with 1024
channels, but attention4/decoder4 are built for 512 (advanced_models.py:
145-146, 187) — so full-forward parity is only possible for resnet34/50;
for densenet121 we difference the encoder feature extraction (which works)
and assert the reference's decoder crash.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from reference_shim import import_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return SimpleNamespace(
        losses=import_reference("losses"),
        utils=import_reference("utils"),
        models=import_reference("advanced_models"),
        train=import_reference("train"),
    )


def _rand_logits_targets(rng, shape=(3, 1, 16, 16), all_zero_slice=True):
    """Random logits + blobby binary targets (NCHW torch / NHWC jax)."""
    logits = rng.normal(0.0, 2.0, shape).astype(np.float32)
    base = rng.random(shape)
    targets = (base > 0.7).astype(np.float32)
    if all_zero_slice:
        targets[1] = 0.0  # exercise the empty-foreground EDT paths
    t_logits = torch.from_numpy(logits)
    t_targets = torch.from_numpy(targets)
    j_logits = jnp.asarray(np.transpose(logits, (0, 2, 3, 1)))
    j_targets = jnp.asarray(np.transpose(targets, (0, 2, 3, 1)))
    return (t_logits, t_targets), (j_logits, j_targets)


ALL_KEYS = [
    "dice", "bce", "weighted_bce", "balanced_bce", "focal",
    "tversky", "tversky_balanced", "tversky_recall", "focal_tversky",
    "sensitivity_specificity", "log_cosh_dice", "combo", "triple_combo",
    "exponential_logarithmic", "distance_map_bce", "hausdorff", "boundary",
]

# Non-default hyperparameters: exercises every config knob the reference's
# get_loss_function reads (losses.py:345-397).
CUSTOM_CFG = {
    "smooth": 2.0, "beta": 3.0, "focal_alpha": 0.4, "focal_gamma": 1.5,
    "loss_alpha": 0.3, "alpha_dice": 0.2, "alpha_bce": 0.5,
    "alpha_focal": 0.3, "tversky_alpha": 0.3, "tversky_beta": 0.7,
    "focal_tversky_gamma": 1.33, "sensitivity_weight": 0.7,
    "w_dice": 0.4, "w_cross": 0.6, "gamma_dice": 0.5, "gamma_cross": 0.4,
    "distance_alpha": 2.0, "hausdorff_alpha": 1.0,
    "boundary_theta0": 5, "boundary_theta": 7,
}


@pytest.mark.parametrize("cfg_kind", ["default", "custom"])
@pytest.mark.parametrize("key", ALL_KEYS)
def test_loss_parity_vs_reference(ref, rng, key, cfg_kind):
    """Each registry loss == the reference's own nn.Module on the same
    data, under default AND custom hyperparameters (losses.py:13-342)."""
    from segtpu.losses import get_loss_function

    config = {"loss_fn": key}
    if cfg_kind == "custom":
        config.update(CUSTOM_CFG)
    (tl, tt), (jl, jt) = _rand_logits_targets(rng)

    ref_loss = ref.losses.get_loss_function(dict(config))
    with torch.no_grad():
        want = float(ref_loss(tl, tt))
    got = float(get_loss_function(dict(config))(jl, jt))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_unknown_loss_fallback_parity(ref, rng):
    """Unknown key → warn + ComboLoss in both (losses.py:399-403)."""
    from segtpu.losses import get_loss_function

    (tl, tt), (jl, jt) = _rand_logits_targets(rng)
    cfg = {"loss_fn": "does_not_exist", "loss_alpha": 0.25}
    with torch.no_grad():
        want = float(ref.losses.get_loss_function(dict(cfg))(tl, tt))
    got = float(get_loss_function(dict(cfg))(jl, jt))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_utils_dice_combo_parity(ref, rng):
    """utils.dice_loss / utils.combo_loss (utils.py:26-56)."""
    from segtpu.losses import functional as F

    (tl, tt), (jl, jt) = _rand_logits_targets(rng)
    np.testing.assert_allclose(
        float(F.dice_loss(jl, jt, smooth=1.0)),
        float(ref.utils.dice_loss(tl, tt, smooth=1.0)), rtol=3e-5)
    np.testing.assert_allclose(
        float(F.combo_loss(jl, jt, alpha=0.4)),
        float(ref.utils.combo_loss(tl, tt, alpha=0.4)), rtol=3e-5)


def test_calculate_metrics_parity(ref, rng):
    """calculate_metrics over probabilities (utils.py:120-151)."""
    from segtpu.metrics import calculate_metrics

    probs = rng.random((2, 1, 32, 32)).astype(np.float32)
    targets = (rng.random((2, 1, 32, 32)) > 0.6).astype(np.float32)
    want = ref.utils.calculate_metrics(torch.from_numpy(probs),
                                       torch.from_numpy(targets))
    got = calculate_metrics(jnp.asarray(probs), jnp.asarray(targets))
    for k, v in want.items():
        np.testing.assert_allclose(float(got[k]), v, rtol=1e-5, atol=1e-7,
                                   err_msg=k)


def test_post_process_parity(ref, rng):
    """Small-object removal (utils.py:58-84)."""
    from segtpu.metrics import post_process

    probs = (rng.random((64, 64)) > 0.8).astype(np.float32) * 0.9
    for min_size in (1, 5, 15, 100):
        np.testing.assert_array_equal(
            post_process(probs, min_size=min_size),
            ref.utils.post_process(probs, min_size=min_size))


def test_iou_score_parity(ref, rng):
    """iou_score with and without post-processing (utils.py:86-118)."""
    from segtpu.metrics import iou_score

    logits = rng.normal(0, 2, (2, 1, 32, 32)).astype(np.float32)
    targets = (rng.random((2, 1, 32, 32)) > 0.6).astype(np.float32)
    tl, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    jl = jnp.asarray(np.transpose(logits, (0, 2, 3, 1)))
    jt = jnp.asarray(np.transpose(targets, (0, 2, 3, 1)))
    for post in (False, True):
        want = ref.utils.iou_score(tl, tt, apply_post_processing=post,
                                   min_size=3)
        got = iou_score(jl, jt, apply_post_processing=post, min_size=3)
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=str(post))


def test_early_stopping_parity(ref, rng):
    """EarlyStopping state machine vs utils.py:174-190 over random score
    walks: identical stop epoch, best score and counter."""
    from segtpu.train.optim import EarlyStopping

    for trial in range(20):
        patience = int(rng.integers(1, 5))
        min_delta = float(rng.choice([0.0, 0.001, 0.01]))
        theirs = ref.utils.EarlyStopping(patience=patience,
                                         min_delta=min_delta)
        ours = EarlyStopping(patience=patience, min_delta=min_delta)
        scores = rng.normal(0.5, 0.2, 30).tolist()
        for ep, s in enumerate(scores):
            a = theirs.step(s)
            b = ours.step(s)
            assert a == b, f"trial {trial} epoch {ep}"
            assert theirs.counter == ours.counter
            if a:
                break
        assert theirs.best_score == pytest.approx(ours.best_score)


# ---------------------------------------------------------------- models

def _convert_and_compare(ref_model, backbone, use_attention, atol=2e-4,
                         size=64):
    """Run the reference torch model and the converted Flax model on the
    same input; assert output agreement."""
    from segtpu.models import UNetWithBackbone
    from segtpu.models.torch_convert import load_reference_checkpoint

    ref_model = ref_model.eval()
    with torch.no_grad():
        for mod in ref_model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
    x = torch.randn(2, 1, size, size)
    with torch.no_grad():
        want = ref_model(x).numpy()

    params, stats = load_reference_checkpoint(
        ref_model.state_dict(), backbone=backbone,
        use_attention=use_attention)
    model = UNetWithBackbone(backbone=backbone, use_attention=use_attention)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = model.apply({"params": jax.tree.map(jnp.asarray, params),
                       "batch_stats": jax.tree.map(jnp.asarray, stats)},
                      xj, train=False)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("use_attention", [False, True])
@pytest.mark.parametrize("backbone", ["resnet34", "resnet50"])
def test_forward_parity_reference_model(ref, backbone, use_attention):
    """Full-model forward parity against the reference's own
    UNetWithBackbone (advanced_models.py:64-357), converted weights."""
    torch.manual_seed(hash((backbone, use_attention)) % (2**31))
    m = ref.models.UNetWithBackbone(backbone=backbone, pretrained=False,
                                    use_attention=use_attention)
    _convert_and_compare(m, backbone, use_attention)


@pytest.mark.parametrize("use_attention", [False, True])
def test_densenet_reference_forward_is_broken(ref, use_attention):
    """The reference's densenet121 U-Net crashes forward: x4 has 1024
    channels but attention4/decoder4 expect 512 (advanced_models.py:
    145-146, 187 vs the true denseblock3 width). segtpu uses the real
    channel widths, so only the encoder can be differenced."""
    m = ref.models.UNetWithBackbone(backbone="densenet121",
                                    pretrained=False,
                                    use_attention=use_attention).eval()
    with torch.no_grad(), pytest.raises(RuntimeError):
        m(torch.randn(1, 1, 64, 64))


def test_densenet_encoder_feature_parity(ref):
    """DenseNet 5-feature extraction (advanced_models.py:207-262 — SURVEY
    §7 hard part 2) vs our DenseNetEncoder with converted weights: all 5
    skip features match."""
    from segtpu.models.backbones import make_encoder
    from segtpu.models.torch_convert import load_reference_checkpoint

    torch.manual_seed(7)
    m = ref.models.UNetWithBackbone(backbone="densenet121",
                                    pretrained=False,
                                    use_attention=False).eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
    x = torch.randn(2, 1, 64, 64)
    with torch.no_grad():
        want = [f.numpy() for f in m._extract_densenet_features(x)]

    params, stats = load_reference_checkpoint(
        m.state_dict(), backbone="densenet121", use_attention=False)
    enc = make_encoder("densenet121")
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    feats = enc.apply({"params": jax.tree.map(jnp.asarray, params["encoder"]),
                       "batch_stats": jax.tree.map(jnp.asarray,
                                                   stats["encoder"])},
                      xj, train=False)
    assert len(feats) == 5
    for i, (got, ref_f) in enumerate(zip(feats, want)):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, ref_f, atol=2e-4,
                                   err_msg=f"feature x{i+1}")


@pytest.mark.parametrize("backbone", ["resnet34", "resnet50", "densenet121"])
def test_torchvision_pretrained_path_parity(ref, backbone, monkeypatch):
    """The pretrained=True path: the reference grabs a torchvision model
    and sums its first conv to grayscale (advanced_models.py:73-139);
    load_torchvision_encoder must reproduce the identical encoder from the
    torchvision state_dict alone."""
    import torchvision  # the shim, installed by reference_shim

    from segtpu.models import UNetWithBackbone, create_model_state
    from segtpu.models.backbones import make_encoder
    from segtpu.models.torch_convert import (
        jax_tree_to_py, load_torchvision_encoder, merge_encoder)

    torch.manual_seed(11)
    tv_model = getattr(torchvision.models, backbone)()
    with torch.no_grad():
        for mod in tv_model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
    # the reference constructs the torchvision model internally; pin it
    monkeypatch.setattr(torchvision.models, backbone, lambda **k: tv_model)
    ref_model = ref.models.UNetWithBackbone(
        backbone=backbone, pretrained=True, use_attention=False).eval()

    x = torch.randn(2, 1, 64, 64)
    with torch.no_grad():
        if backbone == "densenet121":
            want = [f.numpy()
                    for f in ref_model._extract_densenet_features(x)]
        else:
            # reference encoder path, advanced_models.py:266-276
            x1 = ref_model.relu(ref_model.bn1(ref_model.input_conv(x)))
            x2 = ref_model.enc1(ref_model.maxpool(x1))
            x3 = ref_model.enc2(x2)
            x4 = ref_model.enc3(x3)
            x5 = ref_model.enc4(x4)
            want = [f.numpy() for f in (x1, x2, x3, x4, x5)]

    ep, es = load_torchvision_encoder(tv_model.state_dict(), backbone)
    model = UNetWithBackbone(backbone=backbone, use_attention=False)
    params, stats = create_model_state(model, jax.random.key(0),
                                       (1, 32, 32, 1))
    params, stats = merge_encoder(jax_tree_to_py(params),
                                  jax_tree_to_py(stats), ep, es)
    enc = make_encoder(backbone)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    feats = enc.apply(
        {"params": jax.tree.map(jnp.asarray, params["encoder"]),
         "batch_stats": jax.tree.map(jnp.asarray, stats["encoder"])},
        xj, train=False)
    for i, (got, ref_f) in enumerate(zip(feats, want)):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, ref_f, atol=2e-4,
                                   err_msg=f"feature x{i+1}")


# ---------------------------------------------------------------- train

def test_train_epoch_differential(ref):
    """One training epoch, reference train_epoch (train.py:17-68) vs
    engine.run_train_epoch, starting from converted-identical weights on
    identical batches (combo loss, torch-Adam lr 1e-3 / wd 1e-5).

    Strictness is matched to what fp32 makes meaningful:
    - full GRADIENT tree parity (continuous → tight);
    - epoch LOSS parity (continuous → tight);
    - thresholded metrics (iou etc.) only loosely — an untrained net's
      logits sit at ~0, i.e. sigmoid ≈ the 0.5 threshold, so 1e-6 output
      noise flips pixels discretely;
    - updated params within Adam-step bounds — at t=1 Adam's update is
      ~lr·sign(g), so components whose true gradient is below fp noise
      legitimately move ±lr in either framework.
    """
    import copy

    from segtpu.data.loader import DeviceDataLoader
    from segtpu.losses import get_loss_function
    from segtpu.models import UNetWithBackbone
    from segtpu.models.torch_convert import (conv_kernel,
                                             load_reference_checkpoint)
    from segtpu.train.engine import TrainEngine

    torch.manual_seed(3)
    tm = ref.models.UNetWithBackbone(backbone="resnet34", pretrained=False,
                                     use_attention=False)
    np_rng = np.random.default_rng(5)
    images = np_rng.random((4, 1, 32, 32)).astype(np.float32)
    masks = (np_rng.random((4, 1, 32, 32)) > 0.6).astype(np.float32)
    criterion = ref.losses.get_loss_function({"loss_fn": "combo"})

    # ---- segtpu side (convert BEFORE torch mutates its weights)
    params, stats = load_reference_checkpoint(
        tm.state_dict(), backbone="resnet34", use_attention=False)
    jparams = jax.tree.map(jnp.asarray, params)
    jstats = jax.tree.map(jnp.asarray, stats)
    model = UNetWithBackbone(backbone="resnet34", use_attention=False)
    loss_fn = get_loss_function({"loss_fn": "combo"})

    # ---- full-gradient differential on the first batch.
    # Run it with eval-mode BN (fixed running stats): with train-mode BN
    # an UNTRAINED net has channels whose batch variance ≈ 0, and the
    # 1/sqrt(var+eps) normalization chaotically amplifies fp32 noise
    # (measured: x5 features diverge by 0.7 while x4 agrees to 9e-5).
    # Eval-mode still differentiates the entire conv/BN/attention/decoder
    # backward path, just not through the batch statistics (covered at
    # unit level: BN train-mode input-grad parity holds to 5e-7).
    tg = copy.deepcopy(tm)  # keep tm pristine for the epoch differential
    tg.eval()
    out = tg(torch.from_numpy(images[:2]))
    loss_t = criterion(out, torch.from_numpy(masks[:2]))
    tg.zero_grad()
    loss_t.backward()
    grad_sd = {n: p.grad.detach().clone() for n, p in tg.named_parameters()}
    for n, buf in tg.named_buffers():  # converter reads running stats
        grad_sd[n] = torch.zeros_like(buf, dtype=torch.float32)
    want_grads, _ = load_reference_checkpoint(grad_sd, "resnet34",
                                              use_attention=False)

    ji = jnp.asarray(np.transpose(images[:2], (0, 2, 3, 1)))
    jm = jnp.asarray(np.transpose(masks[:2], (0, 2, 3, 1)))

    def loss_f(p):
        logits = model.apply({"params": p, "batch_stats": jstats}, ji,
                             train=False)
        return loss_fn(logits, jm)

    got_loss, got_grads = jax.value_and_grad(loss_f)(jparams)
    np.testing.assert_allclose(float(got_loss), float(loss_t.detach()),
                               rtol=1e-5)
    flat_w = jax.tree_util.tree_flatten_with_path(want_grads)[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got_grads)[0])
    assert len(flat_w) == len(flat_g) > 100
    for path, w in flat_w:
        g = np.asarray(flat_g[path])
        np.testing.assert_allclose(g, np.asarray(w), rtol=2e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))

    # ---- epoch differential
    engine = TrainEngine(model, loss_fn)
    state = engine.init_state(jax.random.key(0), (2, 32, 32, 1),
                              learning_rate=1e-3, weight_decay=1e-5)
    state = state.replace(params=jparams, batch_stats=jstats)
    loader = DeviceDataLoader.from_arrays(
        jnp.asarray(np.transpose(images, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(masks, (0, 2, 3, 1))),
        batch_size=2, shuffle=False)
    state, got_metrics = engine.run_train_epoch(state, loader, lr=1e-3)

    tm.train()
    loader_t = [(torch.from_numpy(images[i:i + 2]),
                 torch.from_numpy(masks[i:i + 2])) for i in (0, 2)]
    optimizer = torch.optim.Adam(tm.parameters(), lr=1e-3, weight_decay=1e-5)
    want_metrics = ref.train.train_epoch(tm, loader_t, optimizer, criterion,
                                         torch.device("cpu"))

    np.testing.assert_allclose(got_metrics["loss"], want_metrics["loss"],
                               rtol=1e-4)
    for k in ("iou", "precision", "recall", "f1", "accuracy"):
        np.testing.assert_allclose(got_metrics[k], want_metrics[k],
                                   atol=6e-3, err_msg=k)

    # updated params within the 2-step Adam bound (≤ 2 epochs · 2·lr)
    np.testing.assert_allclose(
        np.asarray(state.params["encoder"]["input_conv"]["kernel"]),
        conv_kernel(tm.input_conv.weight), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(state.params["conv_final"]["kernel"]),
        conv_kernel(tm.conv_final.weight), atol=1e-3)

    # evaluate() differential on the (slightly divergent) updated models
    tm.eval()
    want_eval = ref.train.evaluate(tm, loader_t, torch.device("cpu"),
                                   criterion)
    got_eval = engine.run_eval_epoch(state, loader)
    np.testing.assert_allclose(got_eval["loss"], want_eval["loss"],
                               rtol=5e-3)
    np.testing.assert_allclose(got_eval["iou"], want_eval["iou"], atol=6e-3)


# ---------------------------------------------------------------- data

def test_dataset_getitem_differential(ref, tmp_path):
    """End-to-end data-layer parity vs the reference's OWN
    CellSegmentationDataset.__getitem__ (dataset.py:44-66): cv2 decode →
    INTER_AREA/INTER_NEAREST resize → percentile clip → CLAHE → min-max,
    mask binarization, (1,H,W) float tensors."""
    pytest.importorskip("cv2")
    ref_dataset = import_reference("dataset")
    from segtpu.data.io import make_synthetic_dataset
    from segtpu.data.discovery import load_original_data
    from segtpu.data.preprocess import (load_canonical, normalize_canonical,
                                        normalize_microscopy_image)

    root = make_synthetic_dataset(str(tmp_path / "d"), n_images=3,
                                  image_type="W", seed=3)
    d = load_original_data(root, image_type="W")
    ips, mps = d["image_paths"], d["mask_paths"]

    rds = ref_dataset.CellSegmentationDataset(ips, mps, img_size=(128, 128))
    ci, cm = load_canonical(ips, mps, (128, 128))
    ours_imgs = np.asarray(normalize_canonical(jnp.asarray(ci)))

    for i in range(len(ips)):
        want_img, want_mask = rds[i]
        want_img = want_img.numpy()[0]          # (H, W) float32
        want_mask = want_mask.numpy()[0]
        got_img = ours_imgs[i, :, :, 0]
        got_mask = (cm[i] > 0).astype(np.float32)
        # Masks: INTER_NEAREST parity is exact (tests/test_ops.py), so the
        # binarized masks must match bit-for-bit.
        np.testing.assert_array_equal(got_mask, want_mask)
        # Images: the canonical uint8 resize may differ ±1 from cv2's
        # fixed-point INTER_AREA, which perturbs percentiles/CLAHE bins.
        assert np.abs(got_img - want_img).max() < 0.05
        assert np.abs(got_img - want_img).mean() < 0.005


def test_normalize_microscopy_differential_same_input(ref, rng):
    """On IDENTICAL canonical uint8 input, our normalization must match
    the reference's normalize_microscopy_image (dataset.py:30-42) almost
    exactly (CLAHE is bit-exact on 8-divisible tiles; percentiles in
    float)."""
    pytest.importorskip("cv2")
    ref_dataset = import_reference("dataset")
    rds = ref_dataset.CellSegmentationDataset([], [])
    img = np.clip(rng.normal(110, 35, (128, 128)), 0,
                  255).astype(np.uint8)
    want = rds.normalize_microscopy_image(img)
    got = np.asarray(normalize_microscopy_image_jax(jnp.asarray(img)))
    assert np.abs(got - want).max() < 2e-2, np.abs(got - want).max()
    assert (got != want).mean() < 0.02 or np.abs(got - want).max() < 5e-3


from segtpu.data.preprocess import (  # noqa: E402
    normalize_microscopy_image as normalize_microscopy_image_jax)


# ------------------------------------------------------- orchestration

def test_train_model_differential(ref, tmp_path):
    """Multi-epoch ORCHESTRATION differential: the reference's own
    train_model (train.py:115-244) vs segtpu's, from converted-identical
    weights on the same image files, 4 epochs.

    Design notes: batch_size == n_train gives one batch/epoch so torch's
    shuffled loader and our PRNG loader see numerically identical batches
    (BN statistics and mean loss are order-invariant within a batch); the
    canonical uint8 resize differs from cv2 by ±1 LSB, so per-epoch loss
    tolerances are loose-compounding rather than fp-tight (the tight
    single-step claims live in test_train_epoch_differential)."""
    import copy

    from segtpu.data.io import make_synthetic_dataset
    from segtpu.data.discovery import load_original_data
    from segtpu.losses import get_loss_function
    from segtpu.models import UNetWithBackbone
    from segtpu.models.torch_convert import load_reference_checkpoint
    from segtpu.train.engine import TrainEngine
    from segtpu.train.loop import train_model
    from segtpu.train.optim import ReduceLROnPlateau

    root = make_synthetic_dataset(str(tmp_path / "d"), n_images=6,
                                  image_type="W", seed=11)
    d = load_original_data(root, image_type="W")
    tr_i, tr_m = d["image_paths"][:4], d["mask_paths"][:4]
    va_i, va_m = d["image_paths"][4:], d["mask_paths"][4:]

    cfg = {"batch_size": 4, "img_size": (32, 32), "verbose": False,
           "early_stopping_patience": 10, "early_stopping_min_delta": 0.001,
           "num_epochs": 4, "seed": 0, "loss_fn": "combo",
           "save_plots": False}

    torch.manual_seed(7)
    tmodel = ref.models.UNetWithBackbone(backbone="resnet34",
                                         pretrained=False,
                                         use_attention=False)
    params, stats = load_reference_checkpoint(
        tmodel.state_dict(), backbone="resnet34", use_attention=False)

    # ---- reference side
    criterion = ref.losses.get_loss_function({"loss_fn": "combo"})
    optimizer = torch.optim.Adam(tmodel.parameters(), lr=1e-3,
                                 weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, mode="max", factor=0.5, patience=3)
    want = ref.train.train_model(
        tmodel, tr_i, tr_m, va_i, va_m, criterion, optimizer, sched,
        num_epochs=4, device=torch.device("cpu"),
        config={**cfg, "verbose": False}, augmentations_per_image=0,
        save_plots=False)

    # ---- segtpu side
    model = UNetWithBackbone(backbone="resnet34", use_attention=False)
    engine = TrainEngine(model, get_loss_function({"loss_fn": "combo"}))
    state0 = engine.init_state(jax.random.key(0), (1, 32, 32, 1),
                               learning_rate=1e-3, weight_decay=1e-5)
    state0 = state0.replace(params=jax.tree.map(jnp.asarray, params),
                            batch_stats=jax.tree.map(jnp.asarray, stats))

    # train_model builds its own engine/state from config; use the engine
    # path directly by passing the prepared engine and pre-set state via
    # the public contract: train_model(model=engine, ...) reinitializes
    # state, so instead drive the same orchestration with quick_train's
    # underlying loop pieces — the public train_model with a fresh seed-0
    # init would NOT share weights with torch. We therefore call
    # train_model's engine loop manually here, mirroring loop.py.
    got = train_model(
        model=engine, train_images=tr_i, train_masks=tr_m,
        val_images=va_i, val_masks=va_m,
        scheduler=ReduceLROnPlateau(1e-3, mode="max", factor=0.5,
                                    patience=3),
        num_epochs=4, config=cfg, augmentations_per_image=0,
        save_plots=False, initial_state=state0)

    # schema: every reference result key exists here with the same types
    for k in want:
        assert k in got, f"missing result key {k}"
    assert len(got["train_metrics"]) == len(want["train_metrics"]) == 4
    assert len(got["lr_history"]) == len(want["lr_history"]) == 4
    np.testing.assert_allclose(got["lr_history"], want["lr_history"])

    # per-epoch loss trajectories agree within compounding tolerance
    for e in range(4):
        np.testing.assert_allclose(
            got["train_metrics"][e]["loss"], want["train_metrics"][e]["loss"],
            rtol=0.05, err_msg=f"train loss epoch {e}")
        np.testing.assert_allclose(
            got["val_metrics"][e]["loss"], want["val_metrics"][e]["loss"],
            rtol=0.05, err_msg=f"val loss epoch {e}")
    # both learn
    assert got["train_metrics"][3]["loss"] < got["train_metrics"][0]["loss"]
    assert want["train_metrics"][3]["loss"] < want["train_metrics"][0]["loss"]
