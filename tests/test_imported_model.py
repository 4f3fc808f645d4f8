"""Imported .tflite/.onnx models through the Classifier interface."""

import numpy as np

from birdnet_go_tpu.inference.backend import JaxClassifier
from birdnet_go_tpu.inference.loader import ImportedModel, load_model
from birdnet_go_tpu.inference.tflite_import import Op, load_tflite
from tests.tflite_builder import ModelBuilder, fully_connected_options


def _toy_classifier_tflite(num_in=16, num_species=5):
    mb = ModelBuilder()
    rng = np.random.default_rng(0)
    w = rng.standard_normal((num_species, num_in)).astype(np.float32)
    x_t = mb.add_tensor([1, num_in], "pcm_input")
    w_t = mb.add_tensor([num_species, num_in], "w", w)
    y_t = mb.add_tensor([1, num_species], "logits")
    mb.add_op(Op.FULLY_CONNECTED, [x_t, w_t, -1], [y_t],
              lambda b: fully_connected_options(b))
    mb.inputs = [x_t]
    mb.outputs = [y_t]
    return mb.finish(), w


def test_imported_model_through_classifier(tmp_path):
    buf, w = _toy_classifier_tflite()
    path = tmp_path / "toy.tflite"
    path.write_bytes(buf)

    model, params = load_model("Toy_Model", checkpoint=str(path))
    assert isinstance(model, ImportedModel)
    assert model.num_species == 5

    clf = JaxClassifier(model, params)
    x = np.random.default_rng(1).standard_normal((3, 16)).astype(np.float32)
    vals, idx = clf.predict_topk(x, sensitivity=1.0, k=3)
    assert vals.shape == (3, 3) and idx.shape == (3, 3)
    # parity: sigmoid of logits, top-3
    logits = x @ w.T
    conf = 1 / (1 + np.exp(-logits))
    ref_idx = np.argsort(-conf, axis=1)[:, :3]
    np.testing.assert_array_equal(idx, ref_idx)


def test_imported_model_registry_spec(tmp_path):
    buf, _ = _toy_classifier_tflite(num_species=6522)
    path = tmp_path / "birdnet.tflite"
    path.write_bytes(buf)
    model, _ = load_model("BirdNET_V2.4", checkpoint=str(path))
    assert model.spec.model_id == "BirdNET_V2.4"
    assert model.spec.clip_samples == 144000
    assert model.num_species == 6522


def test_imported_onnx_through_loader(tmp_path):
    from tests import onnx_builder as ob

    rng = np.random.default_rng(2)
    w = rng.standard_normal((8, 4)).astype(np.float32)
    buf = ob.model([ob.node("MatMul", ["x", "w"], ["y"])],
                   [ob.tensor_proto("w", w)], ["x"], ["y"])
    path = tmp_path / "toy.onnx"
    path.write_bytes(buf)
    model, params = load_model("Toy_Onnx", checkpoint=str(path))
    out = model.apply(params, np.ones((2, 8), np.float32))
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.ones((2, 8)) @ w, rtol=1e-5)
