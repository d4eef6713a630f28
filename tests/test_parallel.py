"""Sharding seam tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from voxtral_tpu.parallel import make_mesh, param_shardings, shard_params

requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def tiny_model():
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel

    return VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )


@requires_8_devices
def test_make_mesh():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(n_data=16, n_model=2)


@requires_8_devices
def test_param_sharding_specs():
    model = tiny_model()
    mesh = make_mesh(n_data=1, n_model=2)
    sh = param_shardings(model.params, mesh)

    dec = sh["decoder"]
    assert dec["tok_embeddings"].spec == P("model", None)
    # Stacked layer leaves: layer axis unsharded, column/row parallel tails.
    assert dec["layers"]["attention"]["wq"].spec == P(None, None, "model")
    assert dec["layers"]["attention"]["wo"].spec == P(None, "model", None)
    assert dec["layers"]["ffn"]["w1"].spec == P(None, None, "model")
    assert dec["layers"]["ffn"]["w2"].spec == P(None, "model", None)
    # Norms / ada / conv replicated.
    assert dec["layers"]["attention_norm"].spec == P()
    assert dec["layers"]["ada"]["w0"].spec == P()
    assert sh["encoder"]["conv"]["conv1"].spec == P()
    assert sh["adapter"]["w1"].spec == P(None, "model")


@requires_8_devices
def test_sharded_forward_matches_single_device():
    """TP-sharded forward must be numerically equal to the unsharded one."""
    from voxtral_tpu.models.voxtral import forward_streaming_fn

    model = tiny_model()
    cfg = model.config
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 16 * 8), jnp.float32)
    token_ids = jnp.full((1, 8), 32, jnp.int32)
    t_embed = model.t_embed(6.0)

    ref = forward_streaming_fn(model.params, mel, token_ids, t_embed, cfg)

    mesh = make_mesh(n_data=1, n_model=2)
    sharded_params = shard_params(model.params, mesh)
    got = forward_streaming_fn(sharded_params, mel, token_ids, t_embed, cfg)

    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=1e-4, atol=1e-4
    )


@requires_8_devices
def test_sharded_transcribe_matches_single_device():
    """The whole greedy decode scan must produce identical tokens under TP."""
    import numpy as np

    model = tiny_model()
    mel = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 41 * 16), jnp.float32) * 0.3
    ref = model.transcribe_streaming(mel)

    mesh = make_mesh(n_data=1, n_model=2)
    from voxtral_tpu.models.voxtral import VoxtralModel

    sharded = VoxtralModel(
        shard_params(model.params, mesh), model.config,
        compute_dtype=jnp.float32,
    )
    got = sharded.transcribe_streaming(mel)
    np.testing.assert_array_equal(ref, got)


@requires_8_devices
def test_dryrun_multichip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@requires_8_devices
def test_quantized_param_shardings():
    """w8 dict leaves must get real TP specs (q4 PACKED leaves stay
    replicated — Pallas kernels can't be auto-partitioned)."""
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    w8 = quantize_params_w8(model.params, to_device=False)
    mesh = make_mesh(n_data=1, n_model=2)
    sh = param_shardings(w8, mesh)

    dec = sh["decoder"]
    # Column-parallel: out dim sharded.
    assert dec["layers"]["attention"]["wq"]["w8"]["codes"].spec == P(None, "model", None)
    assert dec["layers"]["attention"]["wq"]["w8"]["scale"].spec == P(None, "model")
    assert dec["tok_embeddings"]["w8"]["codes"].spec == P("model", None)
    assert dec["tok_embeddings"]["w8"]["scale"].spec == P("model")
    # Row-parallel: in dim sharded, scale replicated.
    assert dec["layers"]["ffn"]["w2"]["w8"]["codes"].spec == P(None, None, "model")
    assert dec["layers"]["ffn"]["w2"]["w8"]["scale"].spec == P()
    # ADA replicated.
    assert dec["layers"]["ada"]["w0"]["w8"]["codes"].spec == P()


@requires_8_devices
def test_sharded_w8_transcribe_matches_single_device():
    """TP-sharded W8 model must produce identical tokens."""
    import numpy as np

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    w8_model = VoxtralModel(quantize_params_w8(model.params), model.config)
    mel = jax.random.normal(jax.random.PRNGKey(4), (1, 128, 41 * 16), jnp.float32) * 0.3
    ref = w8_model.transcribe_streaming(mel)

    mesh = make_mesh(n_data=1, n_model=2)
    sharded = VoxtralModel(shard_params(w8_model.params, mesh), model.config)
    got = sharded.transcribe_streaming(mel)
    np.testing.assert_array_equal(ref, got)
