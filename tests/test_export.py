"""AOT serving export (segtpu/infer/export.py): the serialized StableHLO
artifact must reproduce the live model's predictions exactly, accept any
batch size through the symbolic batch dimension, and round-trip through
disk + the Segmenter.export high-level path."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.infer.export import (ServingModel, export_serving, load_serving,
                                 save_serving)
from segtpu.models import UNetWithBackbone, create_model_state

SIZE = 32


@pytest.fixture(scope="module")
def small_model():
    model = UNetWithBackbone(backbone="resnet34", use_attention=True)
    params, batch_stats = create_model_state(
        model, jax.random.key(0), (1, SIZE, SIZE, 1))
    return model, params, batch_stats


def _live_probs(model, params, batch_stats, x):
    logits = model.apply({"params": params, "batch_stats": batch_stats},
                         x, train=False)
    return np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))


def test_export_matches_live_model_any_batch(small_model, tmp_path):
    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    sm = load_serving(path)

    rng = np.random.default_rng(0)
    for batch in (1, 3, 5):
        x = rng.random((batch, SIZE, SIZE, 1), np.float32)
        got = sm.predict_proba(x)
        want = _live_probs(model, params, batch_stats, jnp.asarray(x))
        assert got.shape == (batch, SIZE, SIZE, 1)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_artifact_is_self_contained(small_model, tmp_path):
    """The artifact loads and serves through jax.export alone — no flax
    model reconstruction (weights are baked-in constants)."""
    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    from jax import export as jax_export
    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exp = jax_export.deserialize(f.read())
    x = np.full((2, SIZE, SIZE, 1), 0.5, np.float32)
    out = np.asarray(jax.jit(exp.call)(x))
    np.testing.assert_allclose(
        out, _live_probs(model, params, batch_stats, jnp.asarray(x)),
        atol=1e-6)
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta["img_size"] == [SIZE, SIZE]
    assert meta["format_version"] >= 1


def test_serving_model_validates_input(small_model, tmp_path):
    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    sm = ServingModel(path)
    with pytest.raises(ValueError, match="resize"):
        sm.predict_proba(np.zeros((1, SIZE * 2, SIZE * 2, 1), np.float32))
    with pytest.raises(ValueError, match="1-channel"):
        sm.predict_proba(np.zeros((1, SIZE, SIZE, 3), np.float32))  # RGB
    # 3-D input grows a channel axis; binary predict thresholds at 0.5
    masks = sm.predict(np.zeros((2, SIZE, SIZE), np.float32))
    assert masks.dtype == np.uint8 and set(np.unique(masks)) <= {0, 1}


def test_multiplatform_export_runs_on_cpu(tmp_path):
    """platforms=("tpu","cpu") lowers for both at export time — no TPU
    needed to produce the artifact — and the CPU side executes it and
    matches the live model (the 'TPU pods and CPU canaries serve the same
    bytes' property, docs/DEPLOYMENT.md)."""
    model = UNetWithBackbone(backbone="resnet_tiny", use_attention=False)
    params, batch_stats = create_model_state(
        model, jax.random.key(0), (1, SIZE, SIZE, 1))
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE), platforms=("tpu", "cpu"))
    sm = load_serving(path)
    assert sm.meta["platforms"] == ["tpu", "cpu"]
    x = np.random.default_rng(5).random((2, SIZE, SIZE, 1), np.float32)
    np.testing.assert_allclose(
        sm.predict_proba(x),
        _live_probs(model, params, batch_stats, jnp.asarray(x)), atol=1e-6)


def test_fixed_batch_export(small_model, tmp_path):
    model, params, batch_stats = small_model
    exp = export_serving(model, params, batch_stats, (SIZE, SIZE), batch=2)
    x = np.zeros((2, SIZE, SIZE, 1), np.float32)
    out = np.asarray(exp.call(x))
    assert out.shape == (2, SIZE, SIZE, 1)
    with pytest.raises(Exception):
        exp.call(np.zeros((3, SIZE, SIZE, 1), np.float32))


def test_http_serving_roundtrip(small_model, tmp_path):
    """The stdlib HTTP server (segtpu/infer/serve.py) serves the artifact:
    health check exposes the meta, /predict round-trips .npy bodies and
    matches the in-process ServingModel exactly, thresholded masks and
    malformed requests behave."""
    import json as _json
    import threading
    from urllib.request import urlopen
    from urllib.error import HTTPError

    from segtpu.infer.serve import client_predict, make_server

    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    server = make_server(path)  # port 0 → ephemeral
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        health = _json.load(urlopen(f"{url}/health", timeout=30))
        assert health["status"] == "ok" and health["img_size"] == [SIZE, SIZE]

        x = np.random.default_rng(2).random((3, SIZE, SIZE, 1), np.float32)
        got = client_predict(url, x)
        want = ServingModel(path).predict_proba(x)
        np.testing.assert_allclose(got, want, atol=1e-6)

        masks = client_predict(url, x, threshold=0.5)
        assert masks.dtype == np.uint8
        np.testing.assert_array_equal(masks, (want > 0.5).astype(np.uint8))

        with pytest.raises(HTTPError) as ei:
            client_predict(url, np.zeros((1, 7, 7, 1), np.float32))
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_exported_artifact_composes_with_tiled_inference(small_model,
                                                         tmp_path):
    """Large-image serving without model code: a logits artifact (export
    with_sigmoid=False at the tile size) plugs straight into the tiled
    sliding-window predictor and matches the live-model tiled path."""
    from segtpu.infer.export import export_serving
    from segtpu.infer.tiled import make_tiled_predictor

    model, params, batch_stats = small_model
    exp = export_serving(model, params, batch_stats, (SIZE, SIZE),
                         with_sigmoid=False)
    served = jax.jit(exp.call)

    big = jnp.asarray(
        np.random.default_rng(3).random((3 * SIZE, 2 * SIZE, 1), np.float32))

    def live_apply(x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)

    kw = dict(tile=SIZE, overlap=8, batch_tiles=4)
    want = np.asarray(make_tiled_predictor(live_apply, **kw)(big))
    got = np.asarray(make_tiled_predictor(served, **kw)(big))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_serving_model_tiled_matches_live_halo(small_model, tmp_path):
    """ServingModel.predict_proba_tiled (halo mode) equals the library
    halo predictor run over the live model's probabilities — whole-slide
    serving composes EXACTLY, ragged sizes included (the artifact's fixed
    spatial size pins the model input; the output grid is derived)."""
    from segtpu.infer.tiled import _make_halo_predictor

    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    sm = ServingModel(path)
    rng = np.random.default_rng(5)
    big = rng.random((2, SIZE + 20, 2 * SIZE + 5), np.float32)
    got = sm.predict_proba_tiled(big, overlap=16)  # halo 8 → tile 16

    def live_probs_fn(x):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    single = _make_halo_predictor(live_probs_fn, SIZE - 16, 8, None, None)
    want = np.asarray(jax.vmap(single)(jnp.asarray(big)[..., None]))
    assert got.shape == (2, SIZE + 20, 2 * SIZE + 5, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # blend mode: full-size tiles, cosine overlap-add over PROBABILITIES
    from segtpu.infer.tiled import make_tiled_predictor
    got_b = sm.predict_proba_tiled(big, overlap=8, mode="blend")
    single_b = make_tiled_predictor(live_probs_fn, tile=SIZE, overlap=8)
    want_b = np.asarray(jax.vmap(single_b)(jnp.asarray(big)[..., None]))
    np.testing.assert_allclose(got_b, want_b, atol=1e-5)

    # geometry validation: overlap too large for the exported size
    with pytest.raises(ValueError, match="halo overlap"):
        sm.predict_proba_tiled(big, overlap=SIZE)
    with pytest.raises(ValueError, match="mode"):
        sm.predict_proba_tiled(big, mode="mosaic")


def test_http_serving_tiled_whole_slide(small_model, tmp_path):
    """A --tiled server routes non-exported-size images through tiled
    inference on the artifact; exported-size inputs keep the exact direct
    path; /health advertises the tiling config."""
    import json as _json
    import threading
    from urllib.request import urlopen

    from segtpu.infer.serve import client_predict, make_server

    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    sm = ServingModel(path)
    server = make_server(path, tiled=True, tile_overlap=16)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        health = _json.load(urlopen(f"{url}/health", timeout=30))
        assert health["tiled"]["enabled"] is True
        assert health["tiled"]["mode"] == "halo"

        rng = np.random.default_rng(9)
        big = rng.random((1, 2 * SIZE, SIZE + 8, 1), np.float32)
        got = client_predict(url, big)
        want = sm.predict_proba_tiled(big, overlap=16)
        np.testing.assert_allclose(got, want, atol=1e-6)

        masks = client_predict(url, big, threshold=0.5)
        assert masks.dtype == np.uint8
        np.testing.assert_array_equal(masks, (want > 0.5).astype(np.uint8))

        # exported-size input: still the direct (single-forward) path
        x = rng.random((2, SIZE, SIZE, 1), np.float32)
        np.testing.assert_allclose(client_predict(url, x),
                                   sm.predict_proba(x), atol=1e-6)
    finally:
        server.shutdown()
        server.server_close()


def test_segmenter_export_roundtrip(tmp_path):
    """High-level path: fit-free Segmenter state → export → serve."""
    import segtpu

    seg = segtpu.Segmenter(backbone="resnet34", use_attention=False,
                           config={"img_size": (SIZE, SIZE)})
    # install a fresh state without training (export needs only weights)
    params, batch_stats = create_model_state(
        seg.engine.model, jax.random.key(1), (1, SIZE, SIZE, 1))
    from segtpu.train.engine import TrainState
    seg.state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=None)
    path = seg.export(str(tmp_path / "served"))
    sm = load_serving(path)
    x = np.random.default_rng(1).random((4, SIZE, SIZE, 1), np.float32)
    np.testing.assert_allclose(
        sm.predict_proba(x), np.asarray(seg.predict_proba(x)), atol=1e-6)


def test_multiclass_export_roundtrip(tmp_path):
    """A softmax-trained (n_classes=3) model must export with the channel
    softmax baked in: artifact probabilities sum to 1 over channels,
    ServingModel.predict returns argmax class ids, and meta records the
    activation (VERDICT r4 #5 closed through the AOT path too)."""
    import jax
    from segtpu.models import UNetWithBackbone, create_model_state

    m = UNetWithBackbone(backbone="resnet_tiny", use_attention=False,
                         n_classes=3)
    params, bs = create_model_state(m, jax.random.key(0), (1, SIZE, SIZE, 1))
    path = save_serving(str(tmp_path / "mc"), m, params, bs, (SIZE, SIZE))
    sm = ServingModel(path)
    assert sm.meta["activation"] == "softmax"
    assert sm.meta["n_classes"] == 3
    x = np.random.default_rng(7).random((2, SIZE, SIZE, 1), np.float32)
    probs = sm.predict_proba(x)
    assert probs.shape == (2, SIZE, SIZE, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    masks = sm.predict(x)
    assert masks.shape == (2, SIZE, SIZE, 1) and masks.max() <= 2
    np.testing.assert_array_equal(
        masks[..., 0], np.argmax(probs, axis=-1).astype(np.uint8))


def test_http_serving_concurrent_clients(small_model, tmp_path):
    """VERDICT r4 #7: N threads POSTing simultaneously must all get the
    correct answer (single-flight lock serializes device work; the HTTP
    layer stays concurrent)."""
    import threading
    from segtpu.infer.serve import client_predict, make_server

    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    server = make_server(path)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{port}"
        rng = np.random.default_rng(4)
        inputs = [rng.random((2, SIZE, SIZE, 1), np.float32)
                  for _ in range(8)]
        sm = ServingModel(path)
        wants = [sm.predict_proba(x) for x in inputs]
        results = [None] * len(inputs)
        errs = []

        def worker(i):
            try:
                results[i] = client_predict(url, inputs[i], timeout=120)
            except Exception as e:  # pragma: no cover - fail loudly below
                errs.append((i, e))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(inputs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(180)
        assert not errs, errs
        for got, want in zip(results, wants):
            np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        server.shutdown()
        server.server_close()


def test_http_serving_payload_cap(small_model, tmp_path):
    """Oversized Content-Length is rejected with 413 BEFORE the body is
    read; normal requests still work on the same server."""
    from urllib.error import HTTPError
    from segtpu.infer.serve import client_predict, make_server
    import threading

    model, params, batch_stats = small_model
    path = save_serving(str(tmp_path / "art"), model, params, batch_stats,
                        (SIZE, SIZE))
    cap = 2 * SIZE * SIZE * 4 + 1024  # fits a 2-image batch, not a 4-image
    server = make_server(path, max_body_bytes=cap)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{port}"
        x_ok = np.zeros((2, SIZE, SIZE, 1), np.float32)
        assert client_predict(url, x_ok).shape == (2, SIZE, SIZE, 1)
        with pytest.raises(HTTPError) as ei:
            client_predict(url, np.zeros((4, SIZE, SIZE, 1), np.float32))
        assert ei.value.code == 413
        assert "max_body_bytes" in ei.value.read().decode()
        # server still alive after the rejection
        assert client_predict(url, x_ok).shape == (2, SIZE, SIZE, 1)
    finally:
        server.shutdown()
        server.server_close()
