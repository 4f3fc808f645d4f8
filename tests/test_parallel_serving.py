"""Multi-chip serving on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdnet_go_tpu.inference.backend import JaxClassifier
from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
from birdnet_go_tpu.models.efficientnet import BlockSpec, EfficientNetConfig
from birdnet_go_tpu.ops.melspec import MelConfig
from birdnet_go_tpu.parallel.mesh import make_mesh, param_pspec_tree
from birdnet_go_tpu.parallel.serving import ShardedClassifier


def _tiny(num_species=256):
    m = BirdNETv24(num_species=num_species,
                   mel=MelConfig(sample_rate=48000, n_fft=256, hop=8192,
                                 n_mels=16),
                   compute_dtype=jnp.float32)
    m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                               embedding_dim=64, num_classes=num_species)
    return m


def test_sharded_matches_single_device():
    model = _tiny()
    params = model.init(jax.random.PRNGKey(0))
    single = JaxClassifier(model, params)
    mesh = make_mesh(8)
    sharded = ShardedClassifier(model, params, mesh=mesh)
    assert mesh.shape == {"data": 4, "model": 2}

    pcm = np.random.default_rng(0).standard_normal(
        (8, 144000)).astype(np.float32) * 0.1
    v1, i1 = single.predict_topk(pcm, k=5)
    v2, i2 = sharded.predict_topk(pcm, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=2e-4, atol=2e-5)


def test_sharded_pads_ragged_batch():
    model = _tiny()
    sharded = ShardedClassifier(model, model.init(jax.random.PRNGKey(0)),
                                mesh=make_mesh(8))
    pcm = np.zeros((5, 144000), np.float32)      # 5 not divisible by 4
    vals, idx = sharded.predict_topk(pcm, k=3)
    assert vals.shape == (5, 3)


def test_head_params_are_tensor_parallel():
    model = _tiny()
    params = model.init(jax.random.PRNGKey(0))
    specs = param_pspec_tree(params)
    from jax.sharding import PartitionSpec as P

    assert specs["classifier"]["w"] == P(None, "model")
    assert specs["classifier"]["b"] == P("model")
    assert specs["stem_conv"]["w"] == P()

    mesh = make_mesh(8)
    sharded = ShardedClassifier(model, params, mesh=mesh)
    w = sharded.params["classifier"]["w"]
    # species axis physically split over the 2-way model axis
    assert w.sharding.spec == P(None, "model")
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(64, 128)}           # 256 species / 2


def test_mesh_odd_counts_and_overcommit():
    """Verify-skill probes: odd device counts build valid meshes (6 →
    3×2, 1 → 1×1, 5 → 5×1), requesting more devices than visible raises,
    and an impossible explicit split raises."""
    import pytest

    m6 = make_mesh(6)
    assert m6.devices.size == 6
    assert dict(zip(m6.axis_names, m6.devices.shape)) == {"data": 3,
                                                          "model": 2}
    m1 = make_mesh(1)
    assert dict(zip(m1.axis_names, m1.devices.shape)) == {"data": 1,
                                                          "model": 1}
    m5 = make_mesh(5)
    assert dict(zip(m5.axis_names, m5.devices.shape)) == {"data": 5,
                                                          "model": 1}
    with pytest.raises(ValueError, match="only"):
        make_mesh(64)
    with pytest.raises(ValueError, match="mesh"):
        make_mesh(6, data_axis=4, model_axis=2)
