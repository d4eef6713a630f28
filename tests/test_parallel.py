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


@requires_8_devices
def test_dp_decode_stack_step_matches_unsharded():
    """Stack-kernel decode sharded over the data axis (shard_map,
    interpret mode) must match the single-shard kernel bitwise-closely
    on every row — the multi-chip pooled-serving path."""
    from tests.test_decode_megakernel import (
        B, D, EPS, HEAD_DIM, HIDDEN, N_HEADS, N_KV, OFFSET, S,
    )
    from tests.test_decode_megakernel import setup as _setup_fixture  # noqa: F401
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        decode_stack_step,
        fuse_decode_weights,
        rope_pair_vectors,
    )
    from voxtral_tpu.parallel.dp_decode import dp_decode_stack_step

    # Build the same tiny stacked-weight model the megakernel tests use
    # (call the fixture's factory directly to avoid fixture plumbing).
    import tests.test_decode_megakernel as mk

    rng = np.random.default_rng(0)
    nq, nkv = N_HEADS * HEAD_DIM, N_KV * HEAD_DIM
    params = {
        "layers": {
            "ada": {
                "w0": jnp.asarray(rng.normal(size=(mk.L, D, mk.T_COND)) * 0.05,
                                  jnp.float32),
                "w2": jnp.asarray(rng.normal(size=(mk.L, mk.T_COND, D)) * 0.05,
                                  jnp.float32),
            },
            "attention_norm": jnp.asarray(
                1.0 + rng.normal(size=(mk.L, D)) * 0.1, jnp.float32),
            "attention": {
                "wq": mk._w8_stack(rng, nq, D),
                "wk": mk._w8_stack(rng, nkv, D),
                "wv": mk._w8_stack(rng, nkv, D),
                "wo": mk._w8_stack(rng, D, nq),
            },
            "ffn_norm": jnp.asarray(
                1.0 + rng.normal(size=(mk.L, D)) * 0.1, jnp.float32),
            "ffn": {
                "w1": mk._w8_stack(rng, HIDDEN, D),
                "w2": mk._w8_stack(rng, D, HIDDEN),
                "w3": mk._w8_stack(rng, HIDDEN, D),
            },
        },
    }
    t_embed = jnp.asarray(rng.normal(size=(1, 1, D)) * 0.3, jnp.float32)
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    lyr = params["layers"]

    BB = 4  # batch sharded 4-ways over data
    kc = jnp.asarray(rng.normal(size=(mk.L, BB, N_KV, S, HEAD_DIM)) * 0.4,
                     jnp.float32)
    vc = jnp.asarray(rng.normal(size=(mk.L, BB, N_KV, S, HEAD_DIM)) * 0.4,
                     jnp.float32)
    x = jnp.asarray(rng.normal(size=(BB, D)) * 0.5, jnp.float32)
    offs = jnp.asarray([OFFSET, 3, 9, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], HEAD_DIM, theta=1e6) for b in range(BB)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])

    # Folded final-norm + tied w8 lm_head (the production configuration).
    from voxtral_tpu.ops.w8 import quantize_w8_rowwise

    V = 1024
    lm_w8 = quantize_w8_rowwise(
        (rng.normal(size=(V, D)) * 0.05).astype(np.float32))["w8"]
    lm_kw = dict(final_norm=jnp.ones((D,), jnp.float32),
                 lm_codes=jnp.asarray(lm_w8["codes"]),
                 lm_scale=jnp.asarray(lm_w8["scale"]))

    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True, window=8)
    ref = decode_stack_step(
        x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kc, vc,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        **lm_kw, **common)

    mesh = make_mesh(n_data=4, n_model=1)
    out = dp_decode_stack_step(
        mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kc, vc,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        **lm_kw, **common)

    assert len(out) == 4  # x, k_new, v_new, logits
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=2e-3, atol=2e-3)
    # Per-row argmax identity — the decision that reaches users.
    assert (np.argmax(np.asarray(ref[3]), -1)
            == np.argmax(np.asarray(out[3]), -1)).all()

    # HBM-chunked cache + in-kernel argmax fold through the DP wrapper
    # (the statics the DP-pooled serving path forwards).
    out_c = dp_decode_stack_step(
        mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kc, vc,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        lm_argmax=True, cache_chunk=8, **lm_kw, **common)
    np.testing.assert_allclose(np.asarray(out_c[0]), np.asarray(ref[0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(out_c[3])[:, 0], np.argmax(np.asarray(ref[3]), -1))


@requires_8_devices
def test_tp_decode_step_matches_stack_kernel():
    """Tensor-parallel half-kernels under shard_map (tp=2, interpret)
    must match the single-chip whole-stack kernel: per-chip weight
    traffic halves, with one psum after WO and one after W2."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        decode_stack_step,
        fuse_decode_weights,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_shard_fused_weights,
    )

    params, t_embed, k_cache, v_cache, x = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offs = jnp.asarray([mk.OFFSET, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], mk.HEAD_DIM, theta=1e6)
          for b in range(mk.B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))  # head-major
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))

    ref_x, ref_k, ref_v = decode_stack_step(
        x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kt, vt,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
        eps=mk.EPS, interpret=True, window=4)

    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=1, n_model=2)
    out_x, kn, vn = tp_decode_step(
        mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        tp_w, cos_b, sin_b, kt, vt,
        n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
        eps=mk.EPS, interpret=True, window=4)

    # Layer 0's K/V come from a QKV matmul whose activation quant is
    # IDENTICAL across shards (x is replicated) — tight tolerance.
    # Deeper layers inherit the residual stream's per-shard quant drift.
    np.testing.assert_allclose(np.asarray(kn[0]), np.asarray(ref_k[0]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(vn[0]), np.asarray(ref_v[0]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(ref_k),
                               rtol=0.05, atol=0.15)
    np.testing.assert_allclose(np.asarray(vn), np.asarray(ref_v),
                               rtol=0.05, atol=0.15)
    # The residual stream accumulates per-shard activation-quant noise
    # (each shard scales attn/hmid by its LOCAL absmax — a finer, not
    # identical, quantization).  Bound the drift well below any
    # wrong-slice/wrong-mask failure mode (those are O(1)).
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=0.05, atol=0.15)
    assert float(jnp.max(jnp.abs(out_x - ref_x))) < 0.15


@requires_8_devices
def test_dptp_decode_step_matches_stack_kernel():
    """DP x TP composition on one mesh (2 data x 2 model): batch rows
    shard over data WHILE weights shard over model — must match the
    single-chip stack kernel (psums stay model-axis-only)."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        decode_stack_step,
        fuse_decode_weights,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_lm_head_token,
        tp_shard_fused_weights,
        tp_shard_lm_head,
    )
    from voxtral_tpu.ops.w8 import quantize_w8_rowwise

    params, t_embed, *_ = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)

    BB = 4
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(BB, mk.D)) * 0.5, jnp.float32)
    offs = jnp.asarray([mk.OFFSET, 3, 9, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], mk.HEAD_DIM, theta=1e6)
          for b in range(BB)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    kt = jnp.asarray(rng.normal(
        size=(mk.L, BB, mk.N_KV, mk.S, mk.HEAD_DIM)) * 0.4, jnp.float32)
    vt = jnp.asarray(rng.normal(
        size=(mk.L, BB, mk.N_KV, mk.S, mk.HEAD_DIM)) * 0.4, jnp.float32)

    common = dict(n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
                  eps=mk.EPS, interpret=True, window=8)
    ref_x, ref_k, ref_v = decode_stack_step(
        x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kt, vt,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"], **common)

    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=2, n_model=2)
    out_x, kn, vn = tp_decode_step(
        mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        tp_w, cos_b, sin_b, kt, vt, data_axis="data", **common)

    np.testing.assert_allclose(np.asarray(kn[0]), np.asarray(ref_k[0]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=0.05, atol=0.15)

    # And the greedy lm_head fold with batch rows data-sharded too.
    V = 1024
    lm_w8 = quantize_w8_rowwise(
        (rng.normal(size=(V, mk.D)) * 0.05).astype(np.float32))["w8"]
    from voxtral_tpu.models.layers import rms_norm
    from voxtral_tpu.ops.w8 import w8_matmul

    fnorm = jnp.ones((mk.D,), jnp.float32)
    logits = w8_matmul(rms_norm(out_x, fnorm, mk.EPS),
                       {"codes": jnp.asarray(lm_w8["codes"]),
                        "scale": jnp.asarray(lm_w8["scale"])})
    lm_tp = tp_shard_lm_head({"codes": jnp.asarray(lm_w8["codes"]),
                              "scale": jnp.asarray(lm_w8["scale"])}, tp=2)
    tok = tp_lm_head_token(mesh, out_x, fnorm, lm_tp["codes"],
                           lm_tp["scale"], eps=mk.EPS, interpret=True,
                           data_axis="data")
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.argmax(np.asarray(logits), -1))


@requires_8_devices
def test_dptp_fused_transcribe_token_identity(monkeypatch, tmp_path):
    """Batched transcription on a COMBINED (2 data x 2 model) mesh —
    rows dp-sharded, weights tp-sharded, vocab-sharded lm fold — must
    match the single-chip fused batch token-for-token."""
    from tests.test_golden_full_model import golden_mel

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = _tp_cfg()
    mel = golden_mel()
    mel2 = np.concatenate([mel, mel], axis=0)

    ref_model = _w8_checkpoint_model(cfg, tmp_path, seed=11)
    ref = ref_model.transcribe_streaming_batch(mel2)

    mesh = make_mesh(n_data=2, n_model=2)
    m = _w8_checkpoint_model(cfg, tmp_path, mesh=mesh, seed=11)
    assert m.fused_tp is not None and "lm_codes" in m.fused_tp
    got = m.transcribe_streaming_batch(mel2)
    assert got.tolist() == ref.tolist()


@requires_8_devices
def test_tp_lm_head_token_matches_argmax():
    """Vocab-sharded greedy lm_head (per-shard Pallas (max, argmax) fold
    + pmax/pmin resolution, tp=2 interpret) must equal argmax over the
    full XLA w8 lm_head — including a tie ACROSS shards, which must
    resolve to the lowest global index (jnp.argmax semantics)."""
    from voxtral_tpu.models.layers import rms_norm
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_lm_head_token,
        tp_shard_lm_head,
    )
    from voxtral_tpu.ops.w8 import quantize_w8_rowwise, w8_matmul

    rng = np.random.default_rng(3)
    B, D, V = 2, 256, 1024
    w = (rng.normal(size=(V, D)) * 0.05).astype(np.float32)
    # Cross-shard tie: make one row of shard 0 and one of shard 1
    # bitwise identical and dominant for batch row 1.
    w[700] = np.abs(w[700]) * 4.0
    w[135] = w[700]
    w8 = quantize_w8_rowwise(w)["w8"]
    x = jnp.asarray(rng.normal(size=(B, D)) * 0.5, jnp.float32)
    x = x.at[1].set(jnp.abs(x[1]))  # row 1: positive query -> tie rows win
    fnorm = jnp.asarray(1.0 + rng.normal(size=(D,)) * 0.1, jnp.float32)

    hidden = rms_norm(x, fnorm, 1e-5)
    logits = w8_matmul(hidden, {"codes": jnp.asarray(w8["codes"]),
                                "scale": jnp.asarray(w8["scale"])})
    ref = np.argmax(np.asarray(logits), axis=-1)
    assert ref[1] == 135  # the tie really is a cross-shard tie

    mesh = make_mesh(n_data=1, n_model=2)
    lm_tp = tp_shard_lm_head(
        {"codes": jnp.asarray(w8["codes"]),
         "scale": jnp.asarray(w8["scale"])}, tp=2)
    tok = tp_lm_head_token(mesh, x, fnorm, lm_tp["codes"], lm_tp["scale"],
                           eps=1e-5, interpret=True)
    assert tok.shape == (B,) and tok.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(tok), ref)


@requires_8_devices
def test_tp_decode_step_ring_matches_stack_kernel():
    """Ring-mode TP attention halves (head+ring cache past the wrap
    point, per-row offsets) must match the single-chip stack kernel's
    ring mask — the unbounded-stream layout under tensor parallelism."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        decode_stack_step,
        fuse_decode_weights,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_shard_fused_weights,
    )

    params, t_embed, k_cache, v_cache, x = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    # Row 0 sits past the ring wrap (offs > S); row 1 mid-fill.
    offs = jnp.asarray([20, 13], jnp.int32)
    cs = [rope_pair_vectors(offs[b], mk.HEAD_DIM, theta=1e6)
          for b in range(mk.B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    rng = np.random.default_rng(5)
    # Fully-populated random cache (ring slots all live past the wrap).
    kt = jnp.asarray(rng.normal(
        size=(mk.L, mk.B, mk.N_KV, mk.S, mk.HEAD_DIM)) * 0.4, jnp.float32)
    vt = jnp.asarray(rng.normal(
        size=(mk.L, mk.B, mk.N_KV, mk.S, mk.HEAD_DIM)) * 0.4, jnp.float32)

    common = dict(n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
                  eps=mk.EPS, interpret=True, window=8, ring=(4, 8))
    ref_x, ref_k, ref_v = decode_stack_step(
        x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kt, vt,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"], **common)

    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=1, n_model=2)
    out_x, kn, vn = tp_decode_step(
        mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        tp_w, cos_b, sin_b, kt, vt, **common)

    np.testing.assert_allclose(np.asarray(kn[0]), np.asarray(ref_k[0]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(vn[0]), np.asarray(ref_v[0]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=0.05, atol=0.15)


def _tp_cfg():
    """Tiny config whose KV heads / hidden divide by tp=2 (the TP-fused
    half-kernels need n_kv % tp == 0, decode_tp_pallas.py)."""
    from voxtral_tpu.config import (
        AdapterConfig,
        AudioEncoderConfig,
        AudioInputConfig,
        LanguageModelConfig,
        VoxtralConfig,
    )

    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=64, n_layers=2, n_heads=2, n_kv_heads=2, head_dim=32,
            hidden_dim=128, sliding_window=64,
        ),
        language_model=LanguageModelConfig(
            dim=64, n_layers=2, n_heads=4, n_kv_heads=2, head_dim=32,
            hidden_dim=128, vocab_size=1280, sliding_window=64,
        ),
        adapter=AdapterConfig(input_dim=256, hidden_dim=64, output_dim=64),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=8,
        downsample_factor=4,
    )


def _w8_checkpoint_model(cfg, tmp_path, mesh=None, seed=42):
    from safetensors.numpy import save_file

    from tests.test_safetensors_loader import synth_checkpoint
    from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8

    tensors = synth_checkpoint(cfg, np.random.default_rng(seed))
    tensors = {k: (v * 0.25).astype(np.float32) for k, v in tensors.items()}
    path = tmp_path / "consolidated.safetensors"
    save_file(tensors, str(path))
    dense = load_voxtral_params(str(path), cfg, dtype="float32",
                                to_device=False)
    return VoxtralModel(quantize_params_w8(dense), cfg, mesh=mesh)


@requires_8_devices
def test_tp_fused_transcribe_token_identity(monkeypatch, tmp_path):
    """End-to-end TP-FUSED transcription (half-kernels + psum under
    shard_map on the virtual mesh, interpret mode) must produce the same
    tokens as the single-chip fused stack-kernel path — the user-surface
    proof behind CLI ``--tp``."""
    from tests.test_golden_full_model import golden_mel

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = _tp_cfg()
    mel = golden_mel()

    # Seed note: TP shards quantize attn/SwiGLU activations with their
    # LOCAL absmax (decode_tp_pallas.py docstring), so logits agree to
    # quant noise, not bitwise — on a degenerate synthetic checkpoint a
    # near-tie argmax can flip (seeds 42/7 flip one of 18 tokens).  Seed
    # 11 has robust margins; structural bugs (wrong slice/mask/psum)
    # would break EVERY position, which this still catches.
    ref_model = _w8_checkpoint_model(cfg, tmp_path, seed=11)
    assert ref_model.fused_decode is not None
    ref = ref_model.transcribe_streaming(mel)

    mesh = make_mesh(n_data=1, n_model=2)
    tp_model = _w8_checkpoint_model(cfg, tmp_path, mesh=mesh, seed=11)
    assert tp_model.fused_tp is not None  # TP half-kernel path is active
    assert tp_model.fused_decode is None  # streaming rides XLA under TP
    got = tp_model.transcribe_streaming(mel)
    assert got.tolist() == ref.tolist(), (got.tolist(), ref.tolist())


@requires_8_devices
def test_dp_fused_transcribe_token_identity(monkeypatch, tmp_path):
    """Batched transcription through the DP-sharded stack kernel
    (dp=4, batch padded 2 -> 4) must match the single-chip fused batch."""
    from tests.test_golden_full_model import golden_cfg, golden_mel

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = golden_cfg()
    mel = golden_mel()
    mel2 = np.concatenate([mel, mel], axis=0)

    ref_model = _w8_checkpoint_model(cfg, tmp_path)
    ref = ref_model.transcribe_streaming_batch(mel2)

    mesh = make_mesh(n_data=4, n_model=1)
    dp_model = _w8_checkpoint_model(cfg, tmp_path, mesh=mesh)
    assert dp_model.fused_decode is not None
    got = dp_model.transcribe_streaming_batch(mel2)
    assert got.shape == ref.shape  # padded rows trimmed
    assert got.tolist() == ref.tolist()


@requires_8_devices
def test_tp_streaming_session_matches_single_device(monkeypatch, tmp_path):
    """StreamingSession on a mesh-sharded model riding the
    auto-partitioned XLA streaming path (megakernel pinned OFF — with
    fused weights a TP-mesh session would take the TP half-kernels,
    whose per-shard activation quant is equivalence- not
    identity-matched) must produce the same tokens as a single-device
    session."""
    from voxtral_tpu.streaming import StreamingSession

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    cfg = _tp_cfg()
    rng = np.random.default_rng(4)
    sig = (0.4 * np.sin(2 * np.pi * 300 * np.arange(48000) / 16000)
           + 0.05 * rng.normal(size=48000)).astype(np.float32)

    ref_model = _w8_checkpoint_model(cfg, tmp_path, seed=11)
    ref = StreamingSession(ref_model, step_positions=8, max_duration_s=10)
    for i in range(0, len(sig), 8000):
        ref.feed(sig[i:i + 8000])
    ref.finish()

    mesh = make_mesh(n_data=1, n_model=2)
    tp_model = _w8_checkpoint_model(cfg, tmp_path, mesh=mesh, seed=11)
    assert tp_model.fused_decode is None  # streaming rides XLA under TP
    sess = StreamingSession(tp_model, step_positions=8, max_duration_s=10)
    for i in range(0, len(sig), 8000):
        sess.feed(sig[i:i + 8000])
    sess.finish()

    assert sess.tokens == ref.tokens


@requires_8_devices
def test_dp_pooled_streaming_matches_solo(monkeypatch):
    """StreamPool on a data-parallel mesh routes the decode half through
    dp_decode_stack_step (rows sharded over data, weights replicated) —
    pooled tokens must equal solo sessions on the single-device generic
    path, including staggered progress."""
    import dataclasses

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)

    rng = np.random.default_rng(21)
    audio_a = rng.normal(size=16000 * 6).astype(np.float32) * 0.25
    audio_b = rng.normal(size=16000 * 4).astype(np.float32) * 0.3

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo_a = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_b.feed(audio_b)
    solo_b.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=2, n_model=1)
    dmodel = VoxtralModel(w8, cfg, mesh=mesh)
    assert dmodel.fused_decode is not None
    pool = StreamPool(dmodel, max_streams=2, step_positions=8,
                      max_duration_s=30)
    assert pool._fused is not None and pool._dp_mesh is not None
    pa = StreamingSession(dmodel, step_positions=8, pool=pool)
    pb = StreamingSession(dmodel, step_positions=8, pool=pool)
    pieces_a = np.array_split(audio_a, 3)
    pieces_b = np.array_split(audio_b, 2)
    pa.feed(pieces_a[0])
    pb.feed(pieces_b[0])
    pa.feed(pieces_a[1])
    pa.feed(pieces_a[2])
    pb.feed(pieces_b[1])
    pa.finish()
    pb.finish()

    assert pa.tokens == solo_a.tokens, (pa.tokens, solo_a.tokens)
    assert pb.tokens == solo_b.tokens, (pb.tokens, solo_b.tokens)


def test_dp_pooled_speculative_matches_solo(monkeypatch):
    """StreamPool(speculative=K) on a data-parallel mesh: each shard
    verifies its own streams' K draft rows (whole streams per shard,
    zero collectives) — tokens must equal solo sessions on the
    single-device generic path, including staggered progress, and the
    int8-KV spec variant must equal the single-device SEQUENTIAL int8
    pool (same quantization ladder).

    Config/seeds follow test_spec_decode._spec_env: the spec step is a
    DIFFERENT XLA program from the sequential one (while-loop vs scan,
    K-row vs 1-row kernel batch), so equivalent math rounds ~1 ULP
    apart; random-weight models need robust argmax margins for the
    token-identity contract to be testable (the tiny_config/seed-31
    combination flips one razor-thin token — wer_eval_work/r04/
    repro_margin.py)."""
    import dataclasses

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = VoxtralConfig.from_file("tests/fixtures/params_tiny.json")
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)

    rng = np.random.default_rng(11)
    audio_a = np.concatenate([
        rng.normal(size=16000 * 3).astype(np.float32) * 0.25,
        np.zeros(16000 * 2, np.float32)])
    audio_b = np.concatenate([
        rng.normal(size=16000 * 2).astype(np.float32) * 0.3,
        np.zeros(16000 * 2, np.float32)])

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo_a = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_b.feed(audio_b)
    solo_b.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=2, n_model=1)
    dmodel = VoxtralModel(w8, cfg, mesh=mesh)

    def run_pool(model, kv, spec):
        pool = StreamPool(model, max_streams=2, step_positions=8,
                          max_duration_s=30, kv_dtype=kv,
                          speculative=spec)
        assert pool._fused is not None
        if model is dmodel:
            assert pool._dp_mesh is not None
        pa = StreamingSession(model, step_positions=8, pool=pool)
        pb = StreamingSession(model, step_positions=8, pool=pool)
        pieces_a = np.array_split(audio_a, 3)
        pieces_b = np.array_split(audio_b, 2)
        pa.feed(pieces_a[0])
        pb.feed(pieces_b[0])
        pa.feed(pieces_a[1])
        pa.feed(pieces_a[2])
        pb.feed(pieces_b[1])
        pa.finish()
        pb.finish()
        return pa.tokens, pb.tokens

    ta, tb = run_pool(dmodel, "model", 4)
    assert ta == solo_a.tokens, (ta, solo_a.tokens)
    assert tb == solo_b.tokens, (tb, solo_b.tokens)

    # int8 ladder: the DP spec pool must equal the single-device
    # sequential int8 pool token-for-token.
    smodel = VoxtralModel(w8, cfg)
    ref_a, ref_b = run_pool(smodel, "int8", 0)
    ia, ib = run_pool(dmodel, "int8", 4)
    assert ia == ref_a, (ia, ref_a)
    assert ib == ref_b, (ib, ref_b)


def test_dp_pooled_speculative_guards(monkeypatch):
    """Spec pools refuse stream counts that do not shard in whole
    streams over the data axis."""
    import dataclasses

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")

    dmodel = VoxtralModel(w8, cfg, mesh=make_mesh(n_data=2, n_model=1))
    with pytest.raises(ValueError, match="divisible|fused stack"):
        StreamPool(dmodel, max_streams=3, step_positions=8,
                   max_duration_s=30, speculative=4)


def _tp_spec_rope(K, B, head_dim, off):
    from voxtral_tpu.ops.decode_step_pallas import rope_pair_vectors

    cs = [rope_pair_vectors(jnp.asarray(off + j, jnp.int32), head_dim,
                            theta=1e6) for j in range(K)]
    cos_r = jnp.tile(jnp.stack([c for c, _ in cs]), (B, 1))
    sin_r = jnp.tile(jnp.stack([s for _, s in cs]), (B, 1))
    return cos_r, sin_r


@pytest.mark.parametrize("window", [None, 4])
def test_tp_spec_decode_step_matches_sequential(window):
    """tp_decode_step(spec=K) == K sequential tp_decode_step calls with
    cache appends (tp=2, interpret), arbitrary inputs, with and without
    a binding sliding window — the TP port of the stack kernel's spec
    contract (rows (stream, draft) share the stream's cache; row j
    attends fresh rows i <= j in-register on each head shard)."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        fuse_decode_weights,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_shard_fused_weights,
    )

    params, t_embed, k_cache, v_cache, _ = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=1, n_model=2)

    OFF, K = 5, 3
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.normal(size=(mk.B, K, mk.D)) * 0.5, jnp.float32)
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    mask = (np.arange(mk.S) < OFF)[None, None, None, :, None]
    kt, vt = kt * mask, vt * mask

    common = dict(n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
                  eps=mk.EPS, interpret=True, window=window)

    def append(kc, vc, kn, vn, off):
        z = jnp.zeros((), jnp.int32)
        o = jnp.asarray(off, jnp.int32)
        kc = jax.lax.dynamic_update_slice(
            kc, kn[:, :, :, None].astype(kc.dtype), (z, z, z, o, z))
        vc = jax.lax.dynamic_update_slice(
            vc, vn[:, :, :, None].astype(vc.dtype), (z, z, z, o, z))
        return kc, vc

    kc, vc = kt, vt
    ref_x, ref_k, ref_v = [], [], []
    for j in range(K):
        cos, sin = rope_pair_vectors(
            jnp.asarray(OFF + j, jnp.int32), mk.HEAD_DIM, theta=1e6)
        ox, kn, vn = tp_decode_step(
            mesh, xs[:, j], OFF + j, lyr["attention_norm"],
            lyr["ffn_norm"], adav, tp_w, cos, sin, kc, vc, **common)
        ref_x.append(ox)
        ref_k.append(kn)
        ref_v.append(vn)
        kc, vc = append(kc, vc, kn, vn, OFF + j)

    cos_r, sin_r = _tp_spec_rope(K, mk.B, mk.HEAD_DIM, OFF)
    sx, skn, svn = tp_decode_step(
        mesh, xs.reshape(mk.B * K, mk.D), jnp.full((mk.B,), OFF, jnp.int32),
        lyr["attention_norm"], lyr["ffn_norm"], adav, tp_w,
        cos_r, sin_r, kt, vt, spec=K, **common)

    for j in range(K):
        np.testing.assert_allclose(
            np.asarray(sx.reshape(mk.B, K, mk.D)[:, j]),
            np.asarray(ref_x[j]), rtol=2e-3, atol=2e-3, err_msg=f"x j={j}")
        np.testing.assert_allclose(
            np.asarray(skn.reshape(mk.L, mk.B, K, mk.N_KV,
                                   mk.HEAD_DIM)[:, :, j]),
            np.asarray(ref_k[j]), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(svn.reshape(mk.L, mk.B, K, mk.N_KV,
                                   mk.HEAD_DIM)[:, :, j]),
            np.asarray(ref_v[j]), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [None, 32])
def test_tp_spec_decode_step_int8_matches_sequential(window):
    """tp_decode_step(spec=K) with the int8 KV cache == K sequential
    int8 TP steps: fresh rows i<j roundtrip through the bf16 output
    dtype + the quantize_kv append quantization and join the cache
    slots' requant group on each head shard — the stack kernel's int8
    spec contract applied per shard."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        fuse_decode_weights,
        quantize_kv,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_shard_fused_weights,
    )

    params, t_embed, k_cache, v_cache, _ = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=1, n_model=2)

    OFF, K = 5, 3
    rng = np.random.default_rng(9)
    xs = jnp.asarray(rng.normal(size=(mk.B, K, mk.D)) * 0.5, jnp.float32)
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    mask = (np.arange(mk.S) < OFF)[None, None, None, :, None]
    kq0, ks0 = quantize_kv(kt * mask)
    vq0, vs0 = quantize_kv(vt * mask)

    common = dict(n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
                  eps=mk.EPS, interpret=True, window=window)

    def append_q(kc, ks, kn, off):
        kq, ksc = quantize_kv(kn)
        z = jnp.zeros((), jnp.int32)
        o = jnp.asarray(off, jnp.int32)
        kc = jax.lax.dynamic_update_slice(
            kc, kq[:, :, :, None], (z, z, z, o, z))
        ks = jax.lax.dynamic_update_slice(
            ks, ksc[:, :, :, None], (z, z, z, o))
        return kc, ks

    kc, ks, vc, vs = kq0, ks0, vq0, vs0
    ref_x, ref_k, ref_v = [], [], []
    for j in range(K):
        cos, sin = rope_pair_vectors(
            jnp.asarray(OFF + j, jnp.int32), mk.HEAD_DIM, theta=1e6)
        ox, kn, vn = tp_decode_step(
            mesh, xs[:, j], OFF + j, lyr["attention_norm"],
            lyr["ffn_norm"], adav, tp_w, cos, sin, kc, vc,
            k_scales=ks, v_scales=vs, **common)
        ref_x.append(ox)
        ref_k.append(kn)
        ref_v.append(vn)
        kc, ks = append_q(kc, ks, kn, OFF + j)
        vc, vs = append_q(vc, vs, vn, OFF + j)

    cos_r, sin_r = _tp_spec_rope(K, mk.B, mk.HEAD_DIM, OFF)
    sx, skn, svn = tp_decode_step(
        mesh, xs.reshape(mk.B * K, mk.D), jnp.full((mk.B,), OFF, jnp.int32),
        lyr["attention_norm"], lyr["ffn_norm"], adav, tp_w,
        cos_r, sin_r, kq0, vq0, k_scales=ks0, v_scales=vs0,
        spec=K, **common)

    for j in range(K):
        np.testing.assert_allclose(
            np.asarray(sx.reshape(mk.B, K, mk.D)[:, j]),
            np.asarray(ref_x[j]), rtol=2e-3, atol=2e-3, err_msg=f"x j={j}")
        np.testing.assert_allclose(
            np.asarray(skn.reshape(mk.L, mk.B, K, mk.N_KV, mk.HEAD_DIM)
                       [:, :, j]).astype(np.float32),
            np.asarray(ref_k[j]).astype(np.float32), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(svn.reshape(mk.L, mk.B, K, mk.N_KV, mk.HEAD_DIM)
                       [:, :, j]).astype(np.float32),
            np.asarray(ref_v[j]).astype(np.float32), rtol=2e-3, atol=2e-3)


def test_tp_spec_rejects_chunked():
    """spec + cache_chunk is refused on the TP path too (per-chunk
    requant groups cannot be joined exactly)."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        fuse_decode_weights,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_shard_fused_weights,
    )

    params, t_embed, k_cache, v_cache, _ = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=1, n_model=2)
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    cos_r, sin_r = _tp_spec_rope(2, mk.B, mk.HEAD_DIM, 5)
    with pytest.raises(ValueError, match="cache_chunk"):
        tp_decode_step(
            mesh, jnp.zeros((mk.B * 2, mk.D), jnp.float32),
            jnp.full((mk.B,), 5), lyr["attention_norm"],
            lyr["ffn_norm"], adav, tp_w, cos_r, sin_r, kt, kt,
            spec=2, cache_chunk=8, n_heads=mk.N_HEADS, n_kv=mk.N_KV,
            head_dim=mk.HEAD_DIM, eps=mk.EPS, interpret=True)


def test_tp_pooled_speculative_matches_solo(monkeypatch):
    """StreamPool(speculative=K) on a TENSOR-parallel mesh: each pass
    verifies streams*K rows through the spec-capable TP half-kernels +
    the vocab-sharded lm fold.  Tokens must equal solo sessions on the
    single-device generic path, and the int8-KV spec variant must equal
    the TP SEQUENTIAL int8 pool (same quant ladder AND the same
    per-shard activation quant).  Margin-robust config per the DP spec
    test above."""
    import dataclasses

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = VoxtralConfig.from_file("tests/fixtures/params_tiny.json")
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)

    rng = np.random.default_rng(11)
    audio_a = np.concatenate([
        rng.normal(size=16000 * 3).astype(np.float32) * 0.25,
        np.zeros(16000 * 2, np.float32)])
    audio_b = np.concatenate([
        rng.normal(size=16000 * 2).astype(np.float32) * 0.3,
        np.zeros(16000 * 2, np.float32)])

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo_a = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_b.feed(audio_b)
    solo_b.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=1, n_model=2)
    tmodel = VoxtralModel(w8, cfg, mesh=mesh)
    assert tmodel.fused_tp is not None and "lm_codes" in tmodel.fused_tp

    def run_pool(kv, spec):
        pool = StreamPool(tmodel, max_streams=2, step_positions=8,
                          max_duration_s=30, kv_dtype=kv,
                          speculative=spec)
        assert pool._fused is not None and pool._tp_mesh is not None
        pa = StreamingSession(tmodel, step_positions=8, pool=pool)
        pb = StreamingSession(tmodel, step_positions=8, pool=pool)
        pieces_a = np.array_split(audio_a, 3)
        pieces_b = np.array_split(audio_b, 2)
        pa.feed(pieces_a[0])
        pb.feed(pieces_b[0])
        pa.feed(pieces_a[1])
        pa.feed(pieces_a[2])
        pb.feed(pieces_b[1])
        pa.finish()
        pb.finish()
        return pa.tokens, pb.tokens

    ta, tb = run_pool("model", 4)
    assert ta == solo_a.tokens, (ta, solo_a.tokens)
    assert tb == solo_b.tokens, (tb, solo_b.tokens)

    # int8 ladder: the TP spec pool must equal the TP sequential int8
    # pool token-for-token (same per-shard quant + same int8 ladder).
    ref_a, ref_b = run_pool("int8", 0)
    ia, ib = run_pool("int8", 4)
    assert ia == ref_a, (ia, ref_a)
    assert ib == ref_b, (ib, ref_b)


@requires_8_devices
def test_dptp_pooled_speculative_matches_solo(monkeypatch):
    """Speculative pool on a COMBINED (2 data x 2 model) mesh: the
    (stream, draft) rows shard over data in whole streams while the
    spec TP halves shard weights over model — tokens must equal solo
    single-device generic sessions."""
    import dataclasses

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = VoxtralConfig.from_file("tests/fixtures/params_tiny.json")
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    rng = np.random.default_rng(11)
    audio = np.concatenate([
        rng.normal(size=16000 * 3).astype(np.float32) * 0.25,
        np.zeros(16000 * 2, np.float32)])

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo.feed(audio)
    solo.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=2, n_model=2)
    m = VoxtralModel(w8, cfg, mesh=mesh)
    pool = StreamPool(m, max_streams=2, step_positions=8,
                      max_duration_s=30, speculative=4)
    assert pool._tp_mesh is not None and pool._pool_data_axis == "data"
    sess = StreamingSession(m, step_positions=8, pool=pool)
    StreamingSession(m, step_positions=8, pool=pool)  # second slot idle
    for piece in np.array_split(audio, 3):
        sess.feed(piece)
    sess.finish()
    assert sess.tokens == solo.tokens, (sess.tokens, solo.tokens)


def test_tp_solo_speculative_matches_generic(monkeypatch):
    """SOLO sessions with speculative=K on a TP mesh ride the spec TP
    half-kernels + lm fold — token-identical to the single-device
    generic path."""
    import dataclasses

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = VoxtralConfig.from_file("tests/fixtures/params_tiny.json")
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    rng = np.random.default_rng(11)
    audio = np.concatenate([
        rng.normal(size=16000 * 3).astype(np.float32) * 0.25,
        np.zeros(16000 * 2, np.float32)])

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    ref = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    tmodel = VoxtralModel(w8, cfg, mesh=make_mesh(n_data=1, n_model=2))
    sess = StreamingSession(tmodel, step_positions=8, max_duration_s=30,
                            speculative=4)
    assert sess._fused is not None and sess._fused.get("tp") == 2
    for piece in np.array_split(audio, 3):
        sess.feed(piece)
    sess.finish()
    assert sess.tokens == ref.tokens, (sess.tokens, ref.tokens)


@requires_8_devices
def test_dp_pooled_unbounded_int8_matches_solo(monkeypatch):
    """The richest pooled variant on a DP mesh — unbounded (head+ring
    caches) with int8 KV — must still match an unbounded solo session on
    the single-device generic path (ring slots shard over data)."""
    import dataclasses

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(5), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    rng = np.random.default_rng(13)
    audio = rng.normal(size=16000 * 10).astype(np.float32) * 0.25

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, unbounded=True)
    for piece in np.array_split(audio, 8):
        solo.feed(piece)
    solo.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=2, n_model=1)
    dmodel = VoxtralModel(w8, cfg, mesh=mesh)
    pool = StreamPool(dmodel, max_streams=2, step_positions=8,
                      unbounded=True, kv_dtype="int8")
    assert pool._fused is not None and pool._dp_mesh is not None
    assert pool.cache_int8
    sess = StreamingSession(dmodel, step_positions=8, pool=pool)
    StreamingSession(dmodel, step_positions=8, pool=pool)  # occupy slot 2
    for piece in np.array_split(audio, 8):
        sess.feed(piece)
    sess.finish()
    # Ring must actually wrap for this to test eviction under DP.
    assert sess.positions_done > cfg.language_model.sliding_window

    stream = np.asarray(sess.tokens)
    ref = np.asarray(solo.tokens)
    n = min(len(stream), len(ref))
    assert n >= len(ref) - 1
    assert (stream[:n] == ref[:n]).all(), (stream[:n], ref[:n])


@requires_8_devices
def test_tp_pooled_streaming_matches_solo(monkeypatch):
    """StreamPool on a tensor-parallel mesh routes its decode half
    through the TP half-kernels + vocab-sharded lm fold — pooled tokens
    must equal solo sessions on the single-device generic path.  (TP
    shards quantize activations with their LOCAL absmax, so a
    degenerate near-tie argmax could flip; the fixed seed has robust
    margins — structural bugs break every position.)"""
    import dataclasses

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)

    rng = np.random.default_rng(31)
    audio_a = rng.normal(size=16000 * 5).astype(np.float32) * 0.25
    audio_b = rng.normal(size=16000 * 3).astype(np.float32) * 0.3

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo_a = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_b.feed(audio_b)
    solo_b.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=1, n_model=2)
    tmodel = VoxtralModel(w8, cfg, mesh=mesh)
    assert tmodel.fused_tp is not None and "lm_codes" in tmodel.fused_tp
    pool = StreamPool(tmodel, max_streams=2, step_positions=8,
                      max_duration_s=30)
    assert pool._fused is not None and pool._tp_mesh is not None
    assert pool._fused["fold"]
    pa = StreamingSession(tmodel, step_positions=8, pool=pool)
    pb = StreamingSession(tmodel, step_positions=8, pool=pool)
    pieces_a = np.array_split(audio_a, 3)
    pieces_b = np.array_split(audio_b, 2)
    pa.feed(pieces_a[0])
    pb.feed(pieces_b[0])
    pa.feed(pieces_a[1])
    pa.feed(pieces_a[2])
    pb.feed(pieces_b[1])
    pa.finish()
    pb.finish()

    assert pa.tokens == solo_a.tokens, (pa.tokens, solo_a.tokens)
    assert pb.tokens == solo_b.tokens, (pb.tokens, solo_b.tokens)


@requires_8_devices
def test_dptp_pooled_streaming_matches_solo(monkeypatch):
    """Pooled streaming on a COMBINED (2 data x 2 model) mesh: pool rows
    shard over data while the TP halves shard weights over model —
    tokens must equal solo single-device sessions."""
    import dataclasses

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    rng = np.random.default_rng(41)
    audio = rng.normal(size=16000 * 4).astype(np.float32) * 0.25

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo.feed(audio)
    solo.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=2, n_model=2)
    m = VoxtralModel(w8, cfg, mesh=mesh)
    pool = StreamPool(m, max_streams=2, step_positions=8,
                      max_duration_s=30)
    assert pool._tp_mesh is not None and pool._pool_data_axis == "data"
    sess = StreamingSession(m, step_positions=8, pool=pool)
    StreamingSession(m, step_positions=8, pool=pool)  # second slot idle
    for piece in np.array_split(audio, 3):
        sess.feed(piece)
    sess.finish()
    assert sess.tokens == solo.tokens, (sess.tokens, solo.tokens)


@requires_8_devices
def test_tp_solo_streaming_fused_matches_generic(monkeypatch):
    """SOLO sessions on a TP mesh ride the TP half-kernels + lm fold
    (round-4 candidate #3 closed): tokens must equal a solo session on
    the single-device generic path, bounded AND unbounded (ring)."""
    import dataclasses

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    rng = np.random.default_rng(51)
    audio = rng.normal(size=16000 * 6).astype(np.float32) * 0.25

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=1, n_model=2)
    tmodel = VoxtralModel(w8, cfg, mesh=mesh)

    for unbounded in (False, True):
        ref = StreamingSession(gmodel, step_positions=8,
                               max_duration_s=30, unbounded=unbounded)
        for piece in np.array_split(audio, 4):
            ref.feed(piece)
        ref.finish()

        sess = StreamingSession(tmodel, step_positions=8,
                                max_duration_s=30, unbounded=unbounded)
        assert sess._fused is not None and sess._fused.get("tp") == 2
        for piece in np.array_split(audio, 4):
            sess.feed(piece)
        sess.finish()
        assert sess.tokens == ref.tokens, (unbounded, sess.tokens,
                                           ref.tokens)


@requires_8_devices
def test_tp_decode_step_int8_cache_matches_stack_kernel():
    """TP half-kernels with the int8 KV cache (per-vector scales sharded
    on the head axis, both attention dots on the int8 MXU) must match
    the single-chip stack kernel's int8 mode, and k_new/v_new must come
    back bf16 for the caller's quantize+append."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        decode_stack_step,
        fuse_decode_weights,
        quantize_kv,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_shard_fused_weights,
    )

    params, t_embed, k_cache, v_cache, x = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offs = jnp.asarray([mk.OFFSET, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], mk.HEAD_DIM, theta=1e6)
          for b in range(mk.B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))  # head-major
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    kq, ks = quantize_kv(kt)
    vq, vs = quantize_kv(vt)

    common = dict(n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
                  eps=mk.EPS, interpret=True, window=8)
    ref_x, ref_k, ref_v = decode_stack_step(
        x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kq, vq,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        k_scales=ks, v_scales=vs, **common)

    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=1, n_model=2)
    out_x, kn, vn = tp_decode_step(
        mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
        tp_w, cos_b, sin_b, kq, vq, k_scales=ks, v_scales=vs, **common)

    assert kn.dtype == jnp.bfloat16 and vn.dtype == jnp.bfloat16
    # Layer 0's K/V come from the same pre-cache QKV matmul (identical
    # activation quant across shards) — only bf16 rounding separates it.
    np.testing.assert_allclose(np.asarray(kn[0], np.float32),
                               np.asarray(ref_k[0], np.float32),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=0.05, atol=0.15)


@requires_8_devices
def test_tp_decode_step_chunked_matches_resident():
    """TP attention halves with the HBM-chunked cache (double-buffered
    S-chunks + online softmax inside the half-kernel) must match the
    resident TP path — bf16 cache and int8-cache variants, bounded and
    ring layouts."""
    import tests.test_decode_megakernel as mk
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        fuse_decode_weights,
        quantize_kv,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        tp_decode_step,
        tp_shard_fused_weights,
    )

    params, t_embed, k_cache, v_cache, x = mk.build_setup()
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offs = jnp.asarray([mk.OFFSET, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], mk.HEAD_DIM, theta=1e6)
          for b in range(mk.B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    tp_w = tp_shard_fused_weights(
        fused, mk.N_HEADS, mk.N_KV, mk.HEAD_DIM, mk.HIDDEN, tp=2)
    mesh = make_mesh(n_data=1, n_model=2)
    base = (mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
            tp_w, cos_b, sin_b)
    common = dict(n_heads=mk.N_HEADS, n_kv=mk.N_KV, head_dim=mk.HEAD_DIM,
                  eps=mk.EPS, interpret=True, window=8)

    ref_x, ref_k, ref_v = tp_decode_step(*base, kt, vt, **common)
    out_x, kn, vn = tp_decode_step(*base, kt, vt, cache_chunk=8, **common)
    # Same shard quantization on both sides; only the online-softmax
    # accumulation order differs.
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               rtol=2e-3, atol=2e-3)

    # int8 cache + chunks (chunked int8 requantizes softmax weights per
    # chunk — finer-grained, so quantization-noise tolerance).
    kq, ks = quantize_kv(kt)
    vq, vs = quantize_kv(vt)
    ref8 = tp_decode_step(*base, kq, vq, k_scales=ks, v_scales=vs,
                          **common)
    out8 = tp_decode_step(*base, kq, vq, k_scales=ks, v_scales=vs,
                          cache_chunk=8, **common)
    np.testing.assert_allclose(np.asarray(out8[0]), np.asarray(ref8[0]),
                               rtol=2e-2, atol=2e-2)

    # Ring layout (head+ring slot map) with chunks, offsets past wrap.
    rng = np.random.default_rng(7)
    kr = jnp.asarray(rng.normal(
        size=(mk.L, mk.B, mk.N_KV, mk.S, mk.HEAD_DIM)) * 0.4, jnp.float32)
    vr = jnp.asarray(rng.normal(
        size=(mk.L, mk.B, mk.N_KV, mk.S, mk.HEAD_DIM)) * 0.4, jnp.float32)
    offs_r = jnp.asarray([20, 13], jnp.int32)
    csr = [rope_pair_vectors(offs_r[b], mk.HEAD_DIM, theta=1e6)
           for b in range(mk.B)]
    base_r = (mesh, x, offs_r, lyr["attention_norm"], lyr["ffn_norm"],
              adav, tp_w, jnp.stack([c for c, _ in csr]),
              jnp.stack([s for _, s in csr]))
    ring_kw = dict(common, ring=(4, 8))
    ref_r = tp_decode_step(*base_r, kr, vr, **ring_kw)
    out_r = tp_decode_step(*base_r, kr, vr, cache_chunk=8, **ring_kw)
    np.testing.assert_allclose(np.asarray(out_r[0]), np.asarray(ref_r[0]),
                               rtol=2e-3, atol=2e-3)


@requires_8_devices
def test_tp_pooled_unbounded_int8_chunked_matches_solo(monkeypatch):
    """The richest pooled variant on a TP mesh — unbounded (head+ring)
    int8 KV streamed through the HBM-chunked attention halves (the
    resident rungs are gated off to force the chunked ladder rung) —
    must match an unbounded solo session on the single-device generic
    path."""
    import dataclasses

    import voxtral_tpu.ops.decode_tp_pallas as tpk
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(5), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    rng = np.random.default_rng(17)
    audio = rng.normal(size=16000 * 10).astype(np.float32) * 0.25

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, unbounded=True)
    for piece in np.array_split(audio, 8):
        solo.feed(piece)
    solo.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    # Fail the VMEM gate for resident rungs so the kv_dtype="int8"
    # ladder lands on its chunked rung (tiny configs always fit VMEM,
    # so the chunked pooled path can't be reached by geometry alone).
    real_need = tpk.tp_vmem_need

    def need_resident_too_big(*a, **kw):
        if kw.get("cache_chunk") is None:
            return tpk.TP_VMEM_CAP + 1
        return real_need(*a, **kw)

    monkeypatch.setattr(tpk, "tp_vmem_need", need_resident_too_big)
    mesh = make_mesh(n_data=1, n_model=2)
    tmodel = VoxtralModel(w8, cfg, mesh=mesh)
    pool = StreamPool(tmodel, max_streams=2, step_positions=8,
                      unbounded=True, kv_dtype="int8")
    assert pool._fused is not None and pool._tp_mesh is not None
    assert pool.cache_int8 and pool._cache_chunk is not None
    sess = StreamingSession(tmodel, step_positions=8, pool=pool)
    StreamingSession(tmodel, step_positions=8, pool=pool)  # occupy slot 2
    for piece in np.array_split(audio, 8):
        sess.feed(piece)
    sess.finish()
    # Ring must actually wrap for this to test eviction under TP.
    assert sess.positions_done > cfg.language_model.sliding_window

    stream = np.asarray(sess.tokens)
    ref = np.asarray(solo.tokens)
    n = min(len(stream), len(ref))
    assert n >= len(ref) - 1
    assert (stream[:n] == ref[:n]).all(), (stream[:n], ref[:n])


@requires_8_devices
def test_tp_pooled_int8_resident_matches_solo(monkeypatch):
    """Bounded TP pool with the int8 KV cache on the resident rung —
    tokens must equal a solo generic session (per-vector scales shard
    over the KV-head axis with the caches)."""
    import dataclasses

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    rng = np.random.default_rng(23)
    audio = rng.normal(size=16000 * 5).astype(np.float32) * 0.25

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo.feed(audio)
    solo.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=1, n_model=2)
    tmodel = VoxtralModel(w8, cfg, mesh=mesh)
    pool = StreamPool(tmodel, max_streams=2, step_positions=8,
                      max_duration_s=30, kv_dtype="int8")
    assert pool._tp_mesh is not None and pool.cache_int8
    assert pool._cache_chunk is None
    sess = StreamingSession(tmodel, step_positions=8, pool=pool)
    StreamingSession(tmodel, step_positions=8, pool=pool)
    for piece in np.array_split(audio, 3):
        sess.feed(piece)
    sess.finish()
    assert sess.tokens == solo.tokens, (sess.tokens, solo.tokens)
