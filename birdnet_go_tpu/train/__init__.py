"""Custom-classifier training (the reference's "custom classifier" capability,
internal/inference/backend.go CustomClassifier / onnx/custom_classifier.go,
rebuilt as native JAX training instead of importing externally-trained heads).
"""

from birdnet_go_tpu.train.trainer import TrainState, make_train_step, multilabel_loss

__all__ = ["TrainState", "make_train_step", "multilabel_loss"]
