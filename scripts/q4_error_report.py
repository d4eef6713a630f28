"""Quantify the Q4 accuracy ladder on the fused decode path (VERDICT r4 #1).

The reference's flagship path computes with exact in-kernel Q4_0 dequant
and f32 activations (/root/reference/src/gguf/shader.wgsl:90-124,
op.rs:79-137).  This repo's fast paths re-quantize:

  q4_perop  exact Q4_0 weights, float activations  (XLA per-op; the
            reference-numerics stand-in)
  q4g       exact Q4_0 weights, A8 dynamic int8 activations (the g32
            stack-kernel mode — weight error ZERO by construction)
  w8        rowwise-int8 re-quantized weights + A8 activations (the
            r2-r4 fast path; loaders/gguf_loader.py:80-89)

This script measures, on a synthetic checkpoint + deterministic audio:

  A. greedy token divergence of each variant vs q4_perop over full
     transcriptions (the end-to-end effect), and
  B. per-step decode logits deltas (max/mean abs, argmax flip rate)
     with teacher-forced q4_perop tokens — isolating the step-level
     numerics of the actual kernels (interpret mode off-TPU).

Output: JSON report (stdout or --out).  Run:
    python scripts/q4_error_report.py                  # CPU, small cfg
    python scripts/q4_error_report.py --steps 40 --out wer_eval_work/r05/q4_error_report.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def error_cfg():
    """Small but q4g-qualifying config (every contraction dim % 128)."""
    from voxtral_tpu.config import (
        AdapterConfig,
        AudioEncoderConfig,
        AudioInputConfig,
        LanguageModelConfig,
        VoxtralConfig,
    )

    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=2, head_dim=64,
            hidden_dim=256, sliding_window=64,
        ),
        language_model=LanguageModelConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, head_dim=64,
            hidden_dim=256, vocab_size=1280, sliding_window=64,
        ),
        adapter=AdapterConfig(input_dim=512, hidden_dim=128,
                              output_dim=128),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=8,
        downsample_factor=4,
    )


def make_audio(kind: str, seconds: float, seed: int = 0):
    import numpy as np

    from voxtral_tpu.audio import (
        AudioBuffer,
        MelSpectrogram,
        PadConfig,
        pad_audio,
    )

    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    rng = np.random.default_rng(seed)
    if kind == "dual_tone":
        sig = (0.4 * np.sin(2 * np.pi * 440 * t)
               + 0.2 * np.sin(2 * np.pi * 1320 * t))
    elif kind == "am_noise":
        # Speech-shaped-ish: low-pass noise with 4 Hz amplitude modulation.
        n = rng.standard_normal(t.size)
        k = np.hanning(129)
        n = np.convolve(n, k / k.sum(), mode="same")
        sig = n * (0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * t))
        sig /= max(1e-9, np.abs(sig).max())
        sig *= 0.7
    else:
        raise ValueError(kind)
    buf = AudioBuffer(sig.astype(np.float32), sr)
    buf.peak_normalize(0.95)
    padded = pad_audio(buf, PadConfig.voxtral())
    return MelSpectrogram.voxtral().compute_log_batch(padded.samples)


def build_variants(cfg, seed: int):
    """Three VoxtralModels over the SAME Q4_0 artifact."""
    import numpy as np

    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.ops.q4 import dequantize_q4_0  # noqa: F401 (doc)
    from voxtral_tpu.utils.quantize import quantize_params_q4

    os.environ["VOXTRAL_MEGAKERNEL"] = "0"
    key = __import__("jax").random.PRNGKey(seed)
    dense = VoxtralModel.init_random(key, cfg, dtype=np.float32).params
    q4_params = quantize_params_q4(
        __import__("jax").tree_util.tree_map(np.asarray, dense),
        pack=False, to_device=False)

    def w8_from_q4(node):
        """Exactly the gguf_loader w8 path: dequant Q4 -> rowwise int8."""
        from voxtral_tpu.ops.w8 import quantize_w8_rowwise

        if isinstance(node, dict) and "q4" in node:
            q4 = node["q4"]
            codes = np.asarray(q4["codes"], np.float32)
            scales = np.asarray(q4["scales"], np.float32)
            deq = codes * np.repeat(scales, 32, axis=-1)
            if deq.ndim == 3:
                per = [quantize_w8_rowwise(deq[i])["w8"]
                       for i in range(deq.shape[0])]
                return {"w8": {
                    "codes": np.stack([p["codes"] for p in per]),
                    "scale": np.stack([p["scale"] for p in per]),
                }}
            return quantize_w8_rowwise(deq)
        if isinstance(node, dict):
            return {k: w8_from_q4(v) for k, v in node.items()}
        return node

    w8_params = w8_from_q4(q4_params)

    def dev(p):
        import jax
        import jax.numpy as jnp

        return jax.tree_util.tree_map(jnp.asarray, p)

    os.environ["VOXTRAL_MEGAKERNEL"] = "0"
    m_perop = VoxtralModel(dev(q4_params), cfg)
    assert m_perop.fused_decode is None
    os.environ["VOXTRAL_MEGAKERNEL"] = "force"
    m_q4g = VoxtralModel(dev(q4_params), cfg)
    assert m_q4g.megakernel_weights == "q4g", m_q4g.megakernel_weights
    m_w8 = VoxtralModel(dev(w8_params), cfg)
    assert m_w8.megakernel_weights == "w8"
    os.environ["VOXTRAL_MEGAKERNEL"] = "0"
    return {"q4_perop": m_perop, "q4g": m_q4g, "w8": m_w8}


def token_divergence(models, mel):
    ref = models["q4_perop"].transcribe_streaming(mel).tolist()
    out = {"n_tokens": len(ref)}
    for name in ("q4g", "w8"):
        toks = models[name].transcribe_streaming(mel).tolist()
        diff = [i for i, (a, b) in enumerate(zip(ref, toks)) if a != b]
        out[name] = {
            "diverged": len(diff),
            "rate": round(len(diff) / max(1, len(ref)), 4),
            "first_divergence": diff[0] if diff else None,
        }
    return out


def step_logit_deltas(models, cfg, mel, n_steps: int):
    """Teacher-forced per-step decode logits for each variant.

    Prefill + encode run on each variant's own weights (per-op XLA);
    the decode steps run through each variant's ACTUAL step math
    (per-op XLA for q4_perop; the stack kernel in interpret mode for
    q4g/w8), teacher-forced with q4_perop's greedy tokens so the
    activation trajectories stay comparable.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxtral_tpu.models.decoder import (
        create_cache,
        decoder_forward_hidden_with_cache,
        embed_tokens,
        lm_head,
    )
    from voxtral_tpu.models.layers import rope_tables, rms_norm
    from voxtral_tpu.models.voxtral import PREFIX_LEN, make_prefix_ids
    from voxtral_tpu.ops.decode_step_pallas import (
        ada_vectors,
        decode_stack_step,
        rope_pair_vectors,
    )

    lm_cfg = cfg.language_model
    interpret = jax.default_backend() != "tpu"

    def encode_prefill(model):
        params = model.params
        audio = model.encode_audio(mel.astype(jnp.bfloat16))
        audio = audio.astype(jnp.float32)
        b, seq = audio.shape[0], audio.shape[1]
        prefix = jnp.tile(jnp.asarray(make_prefix_ids())[None], (b, 1))
        t_embed = model.t_embed(6.0).astype(jnp.float32)
        inputs = audio[:, :PREFIX_LEN] + embed_tokens(params["decoder"],
                                                      prefix)
        cache = create_cache(lm_cfg, b, seq, dtype=jnp.float32)
        rope = rope_tables(lm_cfg.head_dim, seq, lm_cfg.rope_theta)
        hidden, cache = decoder_forward_hidden_with_cache(
            params["decoder"], inputs, t_embed, cache, lm_cfg, rope)
        logits0 = lm_head(params["decoder"], hidden[:, -1, :])
        return audio, t_embed, cache, rope, logits0

    # Reference trajectory: q4_perop greedy tokens.
    ref = models["q4_perop"]
    audio_r, t_embed_r, cache_r, rope_r, logits0 = encode_prefill(ref)
    steps = min(n_steps, audio_r.shape[1] - PREFIX_LEN - 1)
    tokens = [int(jnp.argmax(logits0[0]))]
    ref_logits = [np.asarray(logits0[0], np.float64)]
    for i in range(steps):
        pos = PREFIX_LEN + i
        x = (audio_r[:, pos:pos + 1]
             + embed_tokens(ref.params["decoder"],
                            jnp.asarray([[tokens[-1]]])))
        hidden, cache_r = decoder_forward_hidden_with_cache(
            ref.params["decoder"], x, t_embed_r, cache_r, lm_cfg, rope_r)
        lg = lm_head(ref.params["decoder"], hidden[:, 0])
        ref_logits.append(np.asarray(lg[0], np.float64))
        tokens.append(int(jnp.argmax(lg[0])))

    out = {"steps": steps + 1}
    for name in ("q4g", "w8"):
        model = models[name]
        fused = model.fused_decode
        params = model.params
        audio, t_embed, cache, rope, lgf = encode_prefill(model)
        adav = ada_vectors(params["decoder"], t_embed)
        # Head-major bf16 cache for the stack kernel (production layout).
        k_c = jnp.transpose(cache.k, (0, 1, 3, 2, 4)).astype(jnp.bfloat16)
        v_c = jnp.transpose(cache.v, (0, 1, 3, 2, 4)).astype(jnp.bfloat16)
        deltas, flips = [np.abs(np.asarray(lgf[0], np.float64)
                                - ref_logits[0])], 0
        if int(jnp.argmax(lgf[0])) != tokens[0]:
            flips += 1
        off = jnp.asarray(PREFIX_LEN, jnp.int32)
        for i in range(steps):
            pos = PREFIX_LEN + i
            x = (audio[:, pos]
                 + embed_tokens(params["decoder"],
                                jnp.asarray([[tokens[i]]]))[:, 0]
                 ).astype(jnp.float32)
            cos_p, sin_p = rope_pair_vectors(off, lm_cfg.head_dim,
                                             lm_cfg.rope_theta)
            xo, k_new, v_new = decode_stack_step(
                x, off,
                fused["attn_norm"], fused["ffn_norm"], adav,
                fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                cos_p, sin_p, k_c, v_c,
                fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                window=lm_cfg.sliding_window, interpret=interpret,
            )
            zero = jnp.zeros((), jnp.int32)
            k_c = jax.lax.dynamic_update_slice(
                k_c, k_new[:, :, :, None].astype(k_c.dtype),
                (zero, zero, zero, off, zero))
            v_c = jax.lax.dynamic_update_slice(
                v_c, v_new[:, :, :, None].astype(v_c.dtype),
                (zero, zero, zero, off, zero))
            off = off + 1
            hid = rms_norm(xo, params["decoder"]["norm"], lm_cfg.norm_eps)
            lg = lm_head(params["decoder"], hid)
            deltas.append(np.abs(np.asarray(lg[0], np.float64)
                                 - ref_logits[i + 1]))
            if int(jnp.argmax(lg[0])) != tokens[i + 1]:
                flips += 1
        dmat = np.stack(deltas)
        # Scale-free: relative to the reference logits' dynamic range.
        rng_ref = float(np.stack(ref_logits).max()
                        - np.stack(ref_logits).min())
        out[name] = {
            "logit_max_abs": round(float(dmat.max()), 6),
            "logit_mean_abs": round(float(dmat.mean()), 6),
            "logit_max_rel_range": round(float(dmat.max()) / rng_ref, 6),
            "argmax_flips": flips,
            "flip_rate": round(flips / (steps + 1), 4),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg = error_cfg()
    models = build_variants(cfg, args.seed)

    report = {"config": "error_cfg(d=128,L=2)", "seed": args.seed,
              "audio": {}}
    for kind, secs in (("dual_tone", 1.5), ("dual_tone_4s", 4.0),
                       ("am_noise", 3.0)):
        mel = make_audio(kind.replace("_4s", ""), secs, args.seed)
        entry = {"tokens": token_divergence(models, mel)}
        if kind == "dual_tone":
            entry["step_logits"] = step_logit_deltas(
                models, cfg, mel, args.steps)
        report["audio"][kind] = entry

    js = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")
        print(f"wrote {args.out}")
    print(js)


if __name__ == "__main__":
    main()
